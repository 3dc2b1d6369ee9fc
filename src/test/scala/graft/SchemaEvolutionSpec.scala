package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Schema evolution on the parquet read path: batches written with
  * different column sets union into one schema with NULLs for the
  * missing columns — the append-only ingestion reality of a long-lived
  * dataset (new fields appear, old files stay untouched). */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unifies heterogeneous batches; absent columns read NULL") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_evolve_").toString

    // v1 batch: (id, value)
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "value")
      .write.mode("append").parquet(dir)
    // v2 batch adds a column: (id, value, source)
    Seq((3L, 30.0, "api")).toDF("id", "value", "source")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("id", "source", "value"))

    val rows = merged.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("source"))),
      "v1 rows must read NULL for the later-added column")
    assert(rows(2).getAs[String]("source") == "api")

    // aggregates treat the absent column as NULL, not as an error
    val bySource = merged.groupBy(coalesce(col("source"), lit("legacy")).as("src"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("legacy" -> 2L, "api" -> 1L))
  }
}
