package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.operators.{CountMin, HeavyHitters}

/** Scale probe for the heavy-hitter top-k path (PLANS.md q110): builds
  * deterministic key streams whose DISTINCT space grows with n and
  * records the actual shuffle-exchange volume of the exact
  * `groupBy.count.orderBy.limit` spelling vs
  * [[HeavyHitters.topKExact]] — pinning "the exchange is
  * summary-sized, never distinct-key-sized" with executed-plan
  * SQLMetrics instead of prose.
  *
  * Stream shape per size n (arithmetic-deterministic, no RNG): every
  * 97th id collapses onto one of 100 heavy keys (the findable head —
  * each ≈ n/97/100 occurrences, far above the N/(m+1) evasion bound);
  * every other id is a unique singleton (the adversarial tail: the
  * distinct count is ≈ n and the exact plan must shuffle all of it).
  *
  * AQE is disabled for the probe so the executed plan is concrete and
  * its exchanges are directly enumerable; the volumes measured are
  * partial-aggregate outputs, which AQE coalescing does not change.
  *
  * Usage: `runMain graft.ShuffleProbe 1000000 4000000`. One line per
  * (size, plan): records + bytes for every exchange in the plan.
  */
object ShuffleProbe {

  /** (records, bytes) for every shuffle exchange in the executed plan.
    * A Spark version that renames either metric key must fail loudly
    * here, not print a silent -1 that reads like a real volume when a
    * future reader reproduces the PLANS.md numbers. Shared with
    * [[GraphProbe]]. */
  private[graft] def exchangeVolumes(df: DataFrame): Seq[(Long, Long)] = {
    df.collect() // populate SQLMetrics
    volumesOfExecuted(df)
  }

  /** Exchange volumes of an ALREADY-EXECUTED frame (caller kept the
    * collected rows) — same loud-on-missing-metric contract. */
  private[graft] def volumesOfExecuted(df: DataFrame): Seq[(Long, Long)] =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike =>
        def metric(key: String): Long =
          e.metrics.get(key).map(_.value).getOrElse(sys.error(
            s"SQLMetric '$key' missing on ${e.nodeName} — metric renamed " +
              s"in this Spark version? available: ${e.metrics.keys.mkString(",")}"))
        (metric("shuffleRecordsWritten"), metric("dataSize"))
    }

  private[graft] def fmtVolumes(vols: Seq[(Long, Long)]): String =
    vols.map { case (r, b) => s"${r}r/${b / 1024}KiB" }.mkString(" + ")

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder("graft-shuffleprobe", cpus).getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")
    val k = 50
    val m = 16384

    sizes.foreach { n =>
      val items = spark.range(n).select(
        when(col("id") % 97 === 0,
          concat(lit("heavy_"), (col("id") % 100).cast("string")))
          .otherwise(concat(lit("noise_"), col("id"))).as("key"))

      val exact = items.groupBy(col("key")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("key")).limit(k)
      val sketch = HeavyHitters.topKExact(items, "key", k, m)

      val exactVols = exchangeVolumes(exact)
      val sketchVols = exchangeVolumes(sketch)
      val cert = HeavyHitters.certificate(items, sketch, k, m).collect()(0)

      // Count-Min point-query path (q148): the global sketch aggregate
      // ships one fixed-size (depth×width longs, kryo) buffer per
      // partition — records = #partitions, bytes ≈ partitions × 64 KiB,
      // CONSTANT in both n and distinct-key count, vs the exact
      // spelling's distinct-key-sized exchange above
      val (cmW, cmD) = (2048, 4)
      val cmAgg = org.apache.spark.sql.functions.udaf(
        new CountMin.CountMinAgg(cmW, cmD),
        org.apache.spark.sql.Encoders.STRING)
      val cmDf = items.agg(cmAgg(col("key")).as("s"))
        .select(col("s.width"), col("s.depth"), col("s.n"), col("s.counts"))
      // ONE execution serves both the metrics and the sketch value —
      // read the collected row back instead of re-running the full
      // n-row aggregation through CountMin.sketch
      val cmRow = cmDf.collect()(0)
      val cmVols = volumesOfExecuted(cmDf)
      val sk = CountMin.Sketch(cmRow.getInt(0), cmRow.getInt(1),
        cmRow.getLong(2), cmRow.getSeq[Long](3).toArray)
      val heavy0 = items.where(col("key") === "heavy_0").count()
      val est = sk.estimate("heavy_0")
      val bracketed = est >= heavy0 && est <= heavy0 + sk.errorBound

      println(s"SHUFFLEPROBE n=$n distinct~${n - n / 97 + 100} " +
        s"exact=[${fmtVolumes(exactVols)}] sketch=[${fmtVolumes(sketchVols)}] " +
        s"proven=${cert.getAs[Boolean]("proven")} " +
        s"cm=[${fmtVolumes(cmVols)}] cm_bracket(heavy_0: est=$est exact=$heavy0)=$bracketed")
    }
    spark.stop()
  }
}
