package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** Proves the bucketing write path delivers its scale promise: a join
  * of two tables bucketed on the join key runs WITHOUT any shuffle
  * exchange, and the result matches the plain (shuffling) join. */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans no exchange and matches the shuffled join") {
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    Sinks.writeBucketed(orders, "orders_b", buckets = 8, keys = Seq("o_orderkey"))
    Sinks.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", buckets = 8, keys = Seq("o_orderkey"))

    // tiny test data would broadcast — disable it so the test exercises
    // the shuffle path bucketing is designed to eliminate
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (rows, plan) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        // force the final adaptive plan, then inspect it
        val r = joined.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        (r, joined.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // the join must consume the bucket layout directly: a sort-merge
    // join whose inputs carry NO exchange (the only allowed exchange is
    // the one AFTER the join, for the groupBy re-key)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join:\n$plan")
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").last
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"join inputs were re-shuffled despite bucketing:\n$plan")

    // and it computes the same result as the un-bucketed join
    val expect = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == expect)
  }

  test("qualified db.tbl names resolve via the catalog and replace cleanly") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bdb")
    val orders = Tables.load(spark, sfDir, "orders")
    Sinks.writeBucketed(orders.select("o_orderkey", "o_orderpriority"),
      "graft_bdb.orders_q", buckets = 4, keys = Seq("o_orderkey"))
    assert(spark.table("graft_bdb.orders_q").count() == orders.count())
    // the data must live under the DATABASE location (db.db dir), which
    // the old warehouseDir/<name> string-glue got wrong for db.tbl
    val dbLoc = new java.net.URI(spark.catalog.getDatabase("graft_bdb").locationUri).getPath
    val dataDir = new java.io.File(dbLoc, "orders_q")
    assert(dataDir.isDirectory, s"no data at db location $dataDir")
    // replace semantics: a second write with a different schema wins
    Sinks.writeBucketed(orders.select("o_orderkey"),
      "graft_bdb.orders_q", buckets = 4, keys = Seq("o_orderkey"))
    assert(spark.table("graft_bdb.orders_q").columns.toSeq == Seq("o_orderkey"))
  }

  test("malformed table identifiers are rejected, not interpolated into DDL") {
    val orders = Tables.load(spark, sfDir, "orders")
    intercept[IllegalArgumentException] {
      Sinks.writeBucketed(orders, "x; DROP TABLE y", 4, Seq("o_orderkey"))
    }
    intercept[IllegalArgumentException] {
      Sinks.writeBucketed(orders, "a.b.c", 4, Seq("o_orderkey"))
    }
  }
}
