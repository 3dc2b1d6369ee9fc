package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, IvfPq, Pq}
import graft.sources.Tables

/** Pins the native ANN kernels ([[graft.functions.CentroidSims]],
  * [[graft.functions.PqEncode]], [[graft.functions.AdcDotExpr]],
  * [[graft.functions.CentroidResidual]]) BIT-IDENTICAL to the retained
  * HigherOrderFunction reference forms, on the real corpus and on
  * adversarial fixtures (exact ties, zero vectors) — the optimization
  * is only valid if no query's result can move. */
class AnnKernelsSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  private lazy val centroids =
    Ivf.trainCentroids(emb, k = 8, iters = 2, trainFraction = 0.5)
  private lazy val codebooks =
    Pq.trainCodebooks(emb, dim = 64, m = 8, k = 16, iters = 2,
      trainFraction = 0.5)

  /** Collect (id, value) maps for an expression under both forms and
    * assert exact equality — doubles compared by exact bits via
    * toString of the full row. */
  private def assertIdentical(df: DataFrame, native: Column, ref: Column,
      what: String): Unit = {
    val rows = df.select(col("vec_id"), native.as("a"), ref.as("b")).collect()
    assert(rows.nonEmpty, s"$what: empty comparison set")
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"$what: mismatch at vec_id=${r.get(0)}: ${r.get(1)} vs ${r.get(2)}")
    }
  }

  test("centroid sims: native == HOF reference on the corpus (float input)") {
    assertIdentical(emb,
      Ivf.simsToCentroids(centroids, col("embedding")),
      Ivf.simsToCentroidsRef(centroids, col("embedding")),
      "sims/float")
  }

  test("centroid sims: native == HOF reference on double-cast input") {
    val d = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    assertIdentical(d,
      Ivf.simsToCentroids(centroids, col("v")),
      Ivf.simsToCentroidsRef(centroids, col("v")),
      "sims/double")
  }

  test("centroid sims: zero vector scores 0.0 to every centroid") {
    val z = spark.range(1).select(col("id").as("vec_id"),
      typedlit(Seq.fill(64)(0.0f)).as("embedding"))
    val sims = z.select(Ivf.simsToCentroids(centroids, col("embedding"))
      .as("s")).collect().head.getSeq[Double](0)
    assert(sims.forall(_ == 0.0))
    assertIdentical(z,
      Ivf.simsToCentroids(centroids, col("embedding")),
      Ivf.simsToCentroidsRef(centroids, col("embedding")),
      "sims/zero")
  }

  test("pq encode: native == HOF reference on the corpus (float input)") {
    assertIdentical(emb,
      Pq.encode(codebooks, col("embedding")),
      Pq.encodeRef(codebooks, col("embedding")),
      "encode/float")
  }

  test("pq encode: native == HOF reference on double-cast input") {
    val d = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    assertIdentical(d,
      Pq.encode(codebooks, col("v")),
      Pq.encodeRef(codebooks, col("v")),
      "encode/double")
  }

  test("pq encode: exact-tie codebook entries break to the FIRST index") {
    // two identical codes per subspace: dist ties exactly, the
    // reference's array_position(array_min) picks the first
    val dup: Seq[Seq[Seq[Double]]] =
      (0 until 8).map(_ => Seq(Seq.fill(8)(0.5), Seq.fill(8)(0.5),
        Seq.fill(8)(9.9)))
    val v = spark.range(3).select(col("id").as("vec_id"),
      typedlit(Seq.fill(64)(0.5f)).as("embedding"))
    val codes = v.select(Pq.encode(dup, col("embedding")).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(_.forall(_ == 0)), "tie must pick code 0")
    assertIdentical(v,
      Pq.encode(dup, col("embedding")),
      Pq.encodeRef(dup, col("embedding")),
      "encode/tie")
  }

  test("adc dot: native == HOF reference over real codes and queries") {
    val coded = emb.select(col("vec_id"),
      Pq.encode(codebooks, col("embedding")).as("codes"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pairs = coded.crossJoin(broadcast(q))
    val rows = pairs.select(col("vec_id"), col("qid"),
        Pq.adcDot(codebooks, col("qvec"), col("codes")).as("a"),
        Pq.adcDotRef(codebooks, col("qvec"), col("codes")).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"adc mismatch at (${r.get(0)}, ${r.get(1)}): " +
          s"${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("residual: native == HOF reference over assigned clusters") {
    val assigned = emb.select(col("vec_id"), col("embedding"),
      Ivf.assignCluster(centroids, col("embedding")).as("cluster"))
    assertIdentical(assigned,
      IvfPq.residualCol(centroids, col("embedding"), col("cluster")),
      IvfPq.residualColRef(centroids, col("embedding"), col("cluster")),
      "residual")
  }

  test("ivf top-k end to end is unchanged by the native kernels " +
      "(probe-all == brute force still holds)") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = graft.operators.Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    val ivf = Ivf.ivfTopK(emb, queries, 10, nClusters = 8, nprobe = 8,
        iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    assert(ivf == exact)
  }
}
