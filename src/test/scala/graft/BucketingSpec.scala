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

  test("bucketed dedup index probes exchange-free in the incremental anti-join") {
    // PLANS.md claims the 100 TB form of exactAgainstIndex keeps the
    // billions-row (content_hash, keep_id) index bucketed on
    // content_hash so each incremental batch anti-joins against it
    // WITHOUT re-shuffling the index. Pin it: only the batch side
    // (whose groupBy needs the hash partitioning anyway) may exchange.
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val index = graft.operators.Dedup.exact(d.filter(col("doc_id") < 300), "doc_id", "text")
      .select(col("content_hash"), col("keep_id"))
    // bucket count == spark.sql.shuffle.partitions so the batch side's
    // aggregate exchange lands on the index's exact partitioning
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Sinks.writeBucketed(index, "dedup_index_b", buckets, Seq("content_hash"))
    val batch = d.filter(col("doc_id") >= 300)
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    val (survivors, plan) =
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val (s, _) = graft.operators.Dedup.exactAgainstIndex(
          batch, "doc_id", "text", spark.table("dedup_index_b"))
        (s.count(), s.queryExecution.executedPlan)
      } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    assert(survivors == batch.count(), "all post-300 docs are novel here")
    val anti = plan.collectFirst {
      case j: BaseJoinExec if j.joinType == LeftAnti => j
    }.getOrElse(fail(s"no anti-join in plan:\n$plan"))
    val indexSideShuffles = anti.right.collect { case e: ShuffleExchangeLike => e }
    assert(indexSideShuffles.isEmpty,
      s"bucketed index side was re-shuffled:\n$plan")
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
