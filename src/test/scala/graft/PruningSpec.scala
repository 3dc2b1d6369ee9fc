package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** Read-path scale proofs: static partition pruning on the partitioned
  * parquet layout, and the CSV source/sink round-trip. */
class PruningSpec extends SparkSpec {

  test("partitioned layout prunes to one directory for an equality predicate") {
    val dir = Files.createTempDirectory("graft_prune_").toString
    val o = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    Sinks.parquetPartitioned(o, dir, "o_year")

    val years = o.select("o_year").distinct().count()
    assert(years > 1, "need multiple partitions for the test to mean anything")

    val q = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val scan = q.queryExecution.executedPlan.toString
    // the year predicate must land in PartitionFilters (directory
    // pruning), not PushedFilters (row-group filtering after listing)
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("o_year"),
      s"year predicate did not reach PartitionFilters:\n$scan")
    // and it still returns exactly the right rows
    assert(q.count() ==
      o.filter(col("o_year") === 1995).count())
  }

  test("csv sink/source round-trip preserves rows under an explicit schema") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    val c = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    c.write.mode("overwrite").option("header", "true").csv(dir)

    val back = spark.read
      .schema("c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.count() == c.count())
    val a = c.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
