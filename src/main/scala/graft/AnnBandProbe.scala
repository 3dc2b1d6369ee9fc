package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, IvfPq, Pq, Similarity}
import graft.sources.Tables

/** Measurement harness behind the upper calibrated ANN contract bands
  * (`Contracts.floorAt`): the tight recall floors were measured at the
  * bench corpus (nEmb = 2000) and deliberately do NOT extend upward —
  * recall at fixed nprobe/nCand falls as the corpus grows (the
  * shortlist covers a shrinking fraction), so a larger corpus crossing
  * a plain size gate would inherit uncalibrated floors and fail
  * healthy code. This probe builds a `copies`× corpus (default 5 →
  * 10,000 vectors; 3 → 6,000 — both bands are measured) that
  * PRESERVES the real embeddings' cluster geometry — every real vector
  * plus deterministically jittered copies (±0.05/dim, xxhash64-
  * keyed, ≈13° angular displacement: inside-cluster, outside-top-k) —
  * and measures every registered ANN configuration's recall@10 against
  * brute force on it. The printed values, minus a margin, are the
  * per-band floors recorded in `Contracts.floorAt` and PLANS.md;
  * rerun after a testdata regeneration to re-calibrate.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.AnnBandProbe [copies]`
  */
object AnnBandProbe {

  /** The jitter-extended corpus: copy 0 is the original vector under
    * its original id; further copies ride collision-safe id offsets
    * (10^6 per copy — far above any sf's id range) with a
    * deterministic per-(id, copy, dim) perturbation in [−0.05, 0.05]. */
  def jittered(emb: DataFrame, copies: Int = 5): DataFrame = {
    val c = emb.sparkSession.range(copies).toDF("copy")
    emb.crossJoin(broadcast(c))
      .select(
        (col("vec_id") + col("copy") * lit(1000000L)).as("vec_id"),
        when(col("copy") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            sequence(lit(0), lit(63)).cast("array<long>"),
            (x, j) => (x.cast("double") +
              (pmod(xxhash64(col("vec_id"), col("copy"), j), lit(2001))
                - lit(1000)).cast("double") / lit(1000.0) * lit(0.05))
              .cast("float"))).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val copies = if (args.nonEmpty) args(0).toInt else 5
    val spark = Session.builder("graft-annbandprobe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = jittered(Tables.load(spark, sfDir, "embeddings"), copies).cache()
    val n = big.count()
    val q10 = big.filter(col("vec_id") < 10)
    println(s"ANNBAND corpus n=$n (${copies}x jittered, geometry-preserving)")

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(big, q10, 10))
    def recall(name: String, df: DataFrame): Unit = {
      val got = pairs(df)
      println(f"ANNBAND config=$name recall@10=${
        brute.count(got.contains).toDouble / brute.size}%.4f")
    }

    // every REGISTERED configuration, the exact shipped spellings
    recall("lsh_q38", Similarity.annTopK(big, q10, 10))

    val cents = Ivf.trainCentroids(big, 16, iters = 3, trainFraction = 0.25)
    recall("ivf_q52_nprobe4", Ivf.ivfTopKWithCentroids(big, q10, 10,
      cents, nprobe = 4))

    val cbs = Pq.trainCodebooks(big, dim = 64, m = 8, k = 16, iters = 2,
      trainFraction = 0.5)
    recall("pq_q138_ncand100", Pq.adcPrefilterTopK(big, q10, k = 10,
      nCand = 100, cbs))

    val ivfpqPath = queries.scratchPath("annband_ivfpq")
    IvfPq.writeIndex(big, ivfpqPath, cents, cbs)
    recall("ivfpq_q171_np4_nc100", IvfPq.probeIndex(spark, ivfpqPath, big,
      cents, cbs, q10, k = 10, nprobe = 4, nCand = 100))

    val resCbs = IvfPq.trainResidualCodebooks(big, cents, dim = 64, m = 8,
      k = 16, iters = 2, trainFraction = 0.5)
    val adcPath = queries.scratchPath("annband_ivfadc")
    IvfPq.writeIndexResidual(big, adcPath, cents, resCbs)
    recall("ivfadc_q173_np4_nc20", IvfPq.probeIndexResidual(spark, adcPath,
      big, cents, resCbs, q10, k = 10, nprobe = 4, nCand = 20))

    big.unpersist()
    spark.stop()
  }
}
