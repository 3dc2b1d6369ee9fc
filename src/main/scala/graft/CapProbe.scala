package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale probe for the containment df-cap (PLANS.md q164): builds
  * deterministic boilerplate-planted corpora of growing size and
  * records the shingle self-join's actual exchange volumes for the
  * UNCAPPED vs maxDocFreq-CAPPED spellings of
  * [[Dedup.containmentPairs]] — pinning "a corpus-wide hot shingle
  * makes the posting self-join df², and the prefix filter removes
  * that term from the cost function" with executed-plan SQLMetrics
  * instead of prose (the ShuffleProbe discipline).
  *
  * Corpus shape per size n (arithmetic-deterministic, no RNG): doc i
  * carries 12 unique tokens `u<i>w<j>` plus a SHARED 13-token
  * boilerplate tail (df = n on every boilerplate shingle — the
  * site-footer pathology q164 plants); every 20th doc also exists as
  * a half-truncation (unique prefix only, new id) — the true
  * containment pairs both spellings must output identically. The
  * uncapped self-join's pair-aggregate input is Σ_sh df² ≈ 13·n²
  * rows; capped at 100 it is bounded by the planted overlaps — the
  * probe prints both so the quadratic-vs-linear separation is a
  * measured number.
  *
  * AQE is disabled so the executed plan's exchanges are directly
  * enumerable. Usage: `runMain graft.CapProbe 1000 2000`.
  */
object CapProbe {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000L, 2000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder("graft-capprobe", cpus).getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")

    val boiler = (1 to 13).map(j => s"boil$j").mkString(" ")

    sizes.foreach { n =>
      val id = col("id").cast("string")
      val uniq = (1 to 12).map(j => concat(lit("u"), id, lit(s"w$j")))
      val base = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", uniq :+ lit(boiler): _*).as("text"))
      val trunc = spark.range(n).filter(col("id") % 20 === 0)
        .select((col("id") + 10L * n).as("doc_id"),
          concat_ws(" ", uniq.take(6): _*).as("text"))
      val corpus = base.unionByName(trunc)

      val cap = 100L

      def run(maxDocFreq: Option[Long]): (Long, Seq[(Long, Long)], Double) = {
        // t0 BEFORE construction: the capped spelling runs its
        // hot-shingle df aggregate eagerly inside a Barrier at
        // DataFrame-construction time — timing only the collect would
        // silently exclude the capped plan's largest upstream job and
        // overstate the ratio
        val t0 = System.nanoTime()
        val df = Dedup.containmentPairs(corpus, "doc_id", "text",
          n = 3, tau = 0.9, maxDocFreq = maxDocFreq)
        // collect executes THIS frame's plan, so its SQLMetrics are
        // the ones read back (count() would execute a different
        // QueryExecution and leave these at zero); the result is
        // pair-sized, bounded
        val rows = df.collect().length.toLong
        val wall = (System.nanoTime() - t0) / 1e9
        (rows, ShuffleProbe.volumesOfExecuted(df), wall)
      }

      // The capped run's in-Barrier df aggregate lives in its own
      // QueryExecution, invisible to volumesOfExecuted above — measure
      // the equivalent aggregate explicitly so the capped exchange
      // account is COMPLETE: its partial-agg output is distinct-
      // shingle-sized (≈ 13n + boilerplate), i.e. LINEAR in n, so it
      // cannot change the quadratic-vs-linear conclusion, but it must
      // be on the table, not omitted. Built from the SAME
      // Dedup.docShingles staging the operator uses (tokens bound to
      // their own projection — the unstaged tokens(text) spelling
      // re-runs its regex per shingle position) and the shared `cap`,
      // so the probe cannot drift from what it claims to measure.
      val hotAggVols = {
        val hot = Dedup.docShingles(corpus, "doc_id", "text", 3)
          .groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("sh"))
        hot.collect()
        ShuffleProbe.volumesOfExecuted(hot)
      }

      val (unRows, unVols, unWall) = run(None)
      val (capRows, capVols, capWall) = run(Some(cap))
      val unMax = unVols.map(_._1).max
      val capMax = (capVols ++ hotAggVols).map(_._1).max
      println(s"CAPPROBE n=$n " +
        s"uncapped=[rows=$unRows wall=${f"$unWall%.1f"}s " +
        s"maxExchange=${unMax}r all=${ShuffleProbe.fmtVolumes(unVols)}] " +
        s"capped=[rows=$capRows wall=${f"$capWall%.1f"}s " +
        s"maxExchange=${capMax}r all=${ShuffleProbe.fmtVolumes(capVols)} " +
        s"hotAgg=${ShuffleProbe.fmtVolumes(hotAggVols)}] " +
        s"ratio=${f"${unMax.toDouble / math.max(capMax, 1)}%.1f"}x " +
        s"pairs_equal=${unRows == capRows}")
    }
    spark.stop()
  }
}
