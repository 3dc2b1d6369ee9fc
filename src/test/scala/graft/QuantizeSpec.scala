package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantize

/** Edge semantics of the uint8 quantizer that the synthetic embeddings
  * never hit: constant vectors (scale 0), the reconstruction-error
  * bound, and code-range containment.
  */
class QuantizeSpec extends SparkSpec {

  private def staged(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec").as("vec"))
      .select(col("vec"),
        array_min(col("vec")).cast("double").as("mn"),
        Quantize.scale(col("vec")).as("s"))
      .select(col("vec"), col("mn"), col("s"),
        Quantize.codes(col("vec"), col("mn"), col("s")).as("codes"))

  test("constant and empty-range vectors code to zeros with zero error") {
    val s = spark
    import s.implicits._
    val df = staged(Seq(
      Tuple1(Array(0.5f, 0.5f, 0.5f)),   // constant, nonzero
      Tuple1(Array(0.0f, 0.0f))          // constant zero
    ).toDF("vec"))
    val rows = df.select(col("codes"),
        Quantize.maxAbsError(col("vec"), col("codes"), col("mn"), col("s"))
          .as("err"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0).forall(_ == 0), "constant vector must code to 0s")
      assert(r.getDouble(1) == 0.0)
    }
  }

  test("codes stay in [0, 255] and reconstruction error within scale/2") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random vectors spanning varied ranges
    val vecs = (0 until 50).map { i =>
      Tuple1(Array.tabulate(16) { d =>
        (math.sin(i * 31 + d * 7).toFloat * (1 + i % 5)) })
    }
    val df = staged(vecs.toDF("vec"))
    val rows = df.select(col("codes"), col("s"),
        Quantize.maxAbsError(col("vec"), col("codes"), col("mn"), col("s"))
          .as("err"))
      .collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      assert(codes.forall(c => c >= 0 && c <= 255),
        s"code out of uint8 range: ${codes.min}..${codes.max}")
      val halfStep = r.getDouble(1) / 2.0
      // float→double noise allowance: one part in 2^20 of the step
      assert(r.getDouble(2) <= halfStep * (1.0 + 1e-6),
        s"err ${r.getDouble(2)} exceeds half-step $halfStep")
    }
  }

  test("JL projection matches the hand-computed seeded sign matrix") {
    val s = spark
    import s.implicits._
    // 4-dim codes projected to 2 dims: recompute each coordinate from
    // jlSign directly — the projection must be EXACTLY Σ ±code (pure
    // integer arithmetic, no scaling, no floats)
    val codes = Seq(7, 255, 0, 12)
    val df = Seq(Tuple1(codes)).toDF("codes")
    val got = df.select(Quantize.jlProject(col("codes"), dim = 4,
        outDim = 2, seed = "t:"): _*).head()
    (0 until 2).foreach { j =>
      val expect = codes.zipWithIndex
        .map { case (c, i) => c.toLong * Quantize.jlSign("t:", j, i) }.sum
      assert(got.getLong(j) == expect, s"p$j: got ${got.getLong(j)} want $expect")
    }
    // the sign matrix is genuinely mixed (not all +1/-1) over a real
    // span — a degenerate hash parity would make the projection a
    // near-copy of the code sum
    val signs = for (j <- 0 until 8; i <- 0 until 64) yield Quantize.jlSign("jl7:", j, i)
    assert(signs.contains(1) && signs.contains(-1))
    val plusFrac = signs.count(_ == 1).toDouble / signs.size
    assert(plusFrac > 0.35 && plusFrac < 0.65, s"sign balance $plusFrac")
  }

  test("JL projection is deterministic and seed-sensitive") {
    val s = spark
    import s.implicits._
    val vecs = (0 until 20).map(i =>
      Tuple1(Array.tabulate(16)(d => ((i * 31 + d * 7) % 97).toFloat)))
    val df = staged(vecs.toDF("vec"))
    def proj(seed: String) =
      df.select(Quantize.jlProject(col("codes"), 16, 4, seed): _*)
        .collect().map(_.toSeq).toSeq
    assert(proj("a:") == proj("a:"))
    assert(proj("a:") != proj("b:"))
  }

  test("JL prefilter ANN: recall vs exact brute force on the real embeddings") {
    // everything in the prefilter is deterministic (seeded signs +
    // integer distances), so this recall is a FIXED number per
    // (corpus, seed, nCand) — the floor pins the quality contract the
    // way SimilaritySpec does for LSH
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.operators.Similarity.bruteForceTopK(e, q, k = 10))
    val approx = pairs(graft.operators.Similarity.jlPrefilterTopK(
      e, q, k = 10, nCand = 100, dim = 64, outDim = 16, seed = "jl7:"))
    val recall = (exact & approx).size.toDouble / exact.size
    // the synthetic near-random embeddings are the PATHOLOGICAL case
    // for any projection (cosine concentration of measure), so the
    // contract is relative: the prefilter must carry real signal —
    // comfortably above the random-candidate baseline nCand/(N-1) —
    // plus an absolute floor at the observed level (deterministic:
    // 0.44 at this corpus/seed/config)
    val corpusN = e.count().toDouble
    val baseline = 100.0 / (corpusN - 1)
    info(f"JL prefilter recall@10 (nCand=100, 64->16 dims): $recall%.3f" +
      f" vs random-candidate baseline $baseline%.3f")
    assert(recall >= 1.8 * baseline, f"recall $recall%.3f under 1.8x baseline $baseline%.3f")
    assert(recall >= 0.35, f"recall $recall%.3f under absolute floor")
  }
}
