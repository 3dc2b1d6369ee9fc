package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Scale probe for the PageRank iteration (PLANS.md q125): measures
  * the actual shuffle-exchange volumes of ONE power-iteration round on
  * deterministic synthetic graphs, pinning the two scale claims with
  * SQLMetrics instead of prose:
  *
  *  1. the CONTRIBUTION-AGGREGATE exchange is node-bounded, not
  *     edge-bounded — map-side combine collapses each partition to its
  *     distinct dst set, so quadrupling edges over a fixed node set
  *     leaves the aggregate exchange EXACTLY flat (measured: 10000
  *     records / 234 KiB at both m = 1.28M and m = 5.12M);
  *  2. in the probed regime the mass table broadcasts (localCheckpoint
  *     stats are known), so a round's ONLY exchange is that node-sized
  *     aggregate — no join exchange at all. When the node table
  *     outgrows the broadcast threshold, the join degrades to SMJ with
  *     an edge-sized exchange per round, which is why the operator
  *     scaladoc says to bucket the staged edge table by src on a
  *     cluster (restoring the zero-join-exchange shape at any scale).
  *
  * Graph shape per (n, m): src = id % n, dst = (id·31 + 7) % n —
  * arithmetic-deterministic, ~m/n out-degree everywhere, no RNG.
  * AQE is disabled so the executed plan's exchanges are concrete.
  *
  * Usage: `runMain graft.GraphProbe [n m]...` (pairs); default
  * n=10000 with m = 1.28M then 5.12M (128 vs 512 edges/node — the
  * combine-friendly regime a real link graph's hubs live in).
  */
object GraphProbe {

  def main(args: Array[String]): Unit = {
    val pairs: Seq[(Long, Long)] =
      if (args.nonEmpty) args.map(_.toLong).grouped(2).map(a => (a(0), a(1))).toSeq
      else Seq((10000L, 1280000L), (10000L, 5120000L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder("graft-graphprobe", cpus).getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")

    pairs.foreach { case (n, m) =>
      val edges = spark.range(m).select(
        (col("id") % n).as("src"),
        ((col("id") * 31 + 7) % n).as("dst"))
      val ranks = PageRank.ranks(edges, iters = 1)
      val vols = ShuffleProbe.exchangeVolumes(ranks)
      println(s"GRAPHPROBE n=$n m=$m " +
        s"exchanges=[${ShuffleProbe.fmtVolumes(vols)}] " +
        s"maxRecords=${if (vols.isEmpty) 0L else vols.map(_._1).max}")
    }

    // Registered-layout probe (the q125/q126 spelling): with the mass
    // side too big to broadcast (threshold forced off — the regime a
    // 100 TB graph's node table is ALWAYS in), BOTH spellings must
    // keep every per-round exchange NODE-bounded — no edge-sized
    // (≈m-record) exchange anywhere in the 5-round lineage. The raw
    // path earns this through the staging barrier (localCheckpoint
    // preserves the staging join's hash(src) partitioning, paid once
    // as an in-run shuffle its metrics don't show); the bucketed
    // registered path earns it from the LAYOUT — a plain bucket scan,
    // no staging shuffle, no materialization job at serve time, which
    // is both the cross-run persistence story and the smaller
    // scheduler surface that removed the r10 q126 stamp variance.
    // Printed: max exchange record count for each (both ≈2n), plus
    // the bucketed path's full exchange list — exactly the five
    // node-sized aggregates and nothing else (the mass side's groupBy
    // partitioning is reused round-over-round, so not even the mass
    // join side re-exchanges).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (n, m) = pairs.last
    val edges = spark.range(m).select(
      (col("id") % n).as("src"),
      ((col("id") * 31 + 7) % n).as("dst"))
    val rawVols = ShuffleProbe.exchangeVolumes(
      PageRank.ranks(edges, iters = 5, checkpointEvery = 100))
    graft.sources.Sinks.writeBucketed(PageRank.stageEdges(edges),
      "graphprobe_edges_b", buckets = 32, keys = Seq("src"))
    val stagedVols = ShuffleProbe.exchangeVolumes(
      PageRank.ranksStaged(spark.table("graphprobe_edges_b"), iters = 5,
        checkpointEvery = 100))
    println(s"GRAPHPROBE-BUCKETED n=$n m=$m iters=5 noBroadcast " +
      s"rawMaxRecords=${if (rawVols.isEmpty) 0L else rawVols.map(_._1).max} " +
      s"bucketedMaxRecords=${if (stagedVols.isEmpty) 0L else stagedVols.map(_._1).max} " +
      s"bucketedExchanges=[${ShuffleProbe.fmtVolumes(stagedVols)}]")
    spark.stop()
  }
}
