package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table catalog over the driver-generated parquet directory layout
  * (`/root/testdata/sf{N}/{table}.parquet`, see TESTDATA.md).
  *
  * Mirrors the reference's parquet-scan entry point
  * (`dags/tutorial_objectstorage.py:118` — DuckDB `read_parquet(path)`),
  * re-expressed as `spark.read.parquet` so Catalyst owns predicate
  * pushdown / column pruning / partition pruning on every downstream
  * query. At 100 TB these would be partitioned directories or catalog
  * tables; the accessor shape is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$table.parquet")
    // events.ts has shipped as parquet TIMESTAMP(NANOS) (reads as long
    // nanos under spark.sql.legacy.parquet.nanosAsLong) and, in newer
    // generator vintages, TIMESTAMP(MICROS) isAdjustedToUTC=false (reads
    // as TIMESTAMP_NTZ). Normalize BOTH to the session-zone TimestampType
    // every downstream query was written against:
    //  - long nanos → truncate to micros, the same truncation DuckDB
    //    applies casting TIMESTAMP_NS down. `div` is exact integer
    //    division; `/` would promote to DOUBLE whose 2^53 mantissa cannot
    //    represent 2024-epoch nanos (~1.7e18) exactly.
    //  - NTZ → plain cast; the session pins UTC (Session.scala), so the
    //    wall-clock field values are unchanged and DuckDB (which reads
    //    the same file as a naive TIMESTAMP) agrees exactly.
    // Dispatch on the observed dtype so all generator vintages load
    // identically.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (table == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(TimestampType))
      case TimestampType => df // already session-zone micros
      case other => sys.error(
        s"events.ts arrived as unrecognized type ${other.sql} — a new " +
          "generator vintage; teach Tables.load its normalization " +
          "rather than letting values drift past the oracle silently")
    } else df
  }

  /** Register every table as a temp view named after itself, so both the
    * DataFrame API and `spark.sql` surfaces see the same catalog that the
    * DuckDB oracle does. Idempotent per session.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
