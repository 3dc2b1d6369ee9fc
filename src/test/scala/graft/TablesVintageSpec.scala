package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The events table has shipped in two generator vintages: parquet
  * TIMESTAMP(NANOS) (read as long nanos under
  * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (read as TIMESTAMP_NTZ). [[sources.Tables.load]]
  * must normalize BOTH to the session-zone TimestampType the query
  * surface was written against, with identical field values — pinned
  * here so a future vintage change fails one focused test instead of
  * five downstream suites.
  */
class TablesVintageSpec extends SparkSpec {

  test("long-nanos and NTZ-micros events vintages load identically") {
    val s = spark
    import s.implicits._

    // One instant with sub-microsecond detail: 2024-03-01 12:34:56.789012345
    // The nanos vintage must truncate (not round) to micros — the same
    // truncation DuckDB applies casting TIMESTAMP_NS down.
    val micros = 1709296496789012L
    val nanos  = micros * 1000L + 345L

    val nanosDir = Files.createTempDirectory("graft_vintage_nanos_").toString
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    val ntzDir = Files.createTempDirectory("graft_vintage_ntz_").toString
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    // Precondition: the NTZ fixture really reads back as NTZ (otherwise
    // this test would not exercise the dispatch arm it claims to).
    assert(spark.read.parquet(s"$ntzDir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)

    val fromNanos = sources.Tables.load(spark, nanosDir, "events")
    val fromNtz   = sources.Tables.load(spark, ntzDir, "events")

    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNtz.schema("ts").dataType == TimestampType)

    val a = fromNanos.select(unix_micros(col("ts"))).as[Long].head()
    val b = fromNtz.select(unix_micros(col("ts"))).as[Long].head()
    assert(a == micros, s"nanos vintage must truncate to $micros, got $a")
    assert(b == micros, s"NTZ vintage must preserve $micros, got $b")
  }
}
