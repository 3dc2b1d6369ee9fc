package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Grades the cosine expressions and ANN recall against the exact
  * baseline (multimodal plumbing lives in MultimodalSpec). */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("cosine: orthogonal→0, identical→1, zero-vector→0 (not NaN)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), "ortho"),
      (Array(1f, 2f), Array(1f, 2f), "same"),
      (Array(0f, 0f), Array(1f, 2f), "zero")).toDF("a", "b", "case")
    val got = df.select(col("case"), Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("ortho") == 0.0)
    assert(math.abs(got("same") - 1.0) < 1e-12)
    assert(got("zero") == 0.0)
  }

  test("native cosine_f expression equals the composable form bit-for-bit") {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val mismatches = a.join(b, col("a") < col("b")).limit(5000)
      .select(
        graft.operators.Similarity.cosine(col("va"), col("vb")).as("slow"),
        graft.operators.Similarity.cosineFast(col("va"), col("vb")).as("fast"))
      .filter(col("slow") =!= col("fast"))
      .count()
    assert(mismatches == 0L)
  }

  test("brute-force top-k is exact: matches naive local computation") {
    val local = emb.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val (qid, qv) = local.find(_._1 == 0L).get
    val want = local.filter(_._1 != qid)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val got = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 10)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got == want)
  }

  test("knnClassify: majority wins, exact vote ties go to the smallest label") {
    val s = spark
    import s.implicits._
    // query (1,0); four nearest split 2-2 between labels 7 and 3 at
    // k=4 → tie → smallest label (3) must win deterministically; the
    // far label-9 vector stays outside the neighborhood
    val corpus = Seq(
      (10L, Array(1.0f, 0.1f), 7), (11L, Array(1.0f, -0.1f), 7),
      (12L, Array(1.0f, 0.2f), 3), (13L, Array(1.0f, -0.2f), 3),
      (14L, Array(0.0f, 1.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((0L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val tied = Similarity.knnClassify(corpus, queries, k = 4).head()
    assert(tied.getAs[Long]("query_id") == 0L)
    assert(tied.getAs[Int]("predicted") == 3, "2-2 tie must resolve to min label")
    assert(tied.getAs[Long]("votes") == 2L)
    // k=5 pulls in label 9 but 7/3 still hold 2 votes each → still 3
    val k5 = Similarity.knnClassify(corpus, queries, k = 5).head()
    assert(k5.getAs[Int]("predicted") == 3)
    // k=2 → the two closest are both label 7 → clear majority
    val k2 = Similarity.knnClassify(corpus, queries, k = 2).head()
    assert(k2.getAs[Int]("predicted") == 7 && k2.getAs[Long]("votes") == 2L)
  }

  test("maxCosineAgainst: per-vector max over the probe set, exact") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Array(1f, 0f)),        // hits probe A exactly
      (2L, Array(0f, 1f)),        // hits probe B exactly
      (3L, Array(1f, 1f)),        // cos 1/sqrt(2) to both
      (4L, Array(-1f, 0f))        // anti-aligned: max is 0 vs B
    ).toDF("vec_id", "embedding")
    val probes = Seq(
      (100L, Array(1f, 0f)), (101L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.maxCosineAgainst(corpus, probes)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.0) < 1e-12)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(3L) - 1.0 / math.sqrt(2.0)) < 1e-6)
    assert(got(4L) == 0.0, s"anti-aligned max should be the orthogonal 0, got $got")

    // total over the corpus: an empty probe set means "nothing is
    // contaminated", not "no result" — every vector must still get a
    // row, at the 0.0 no-contamination value
    val empty = Similarity.maxCosineAgainst(
        corpus, probes.filter(col("vec_id") < 0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(empty == Map(1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0),
      s"empty probes must yield one 0.0 row per vector, got $empty")
  }

  test("ANN recall@10 vs brute force is useful (≥ 0.3 on random vectors)") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.annTopK(emb, queries, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    info(s"ANN recall@10 = $recall (candidates=${ann.size})")
    // Uniform random 64-dim vectors are the adversarial case for
    // angle-LSH (no cluster structure); ≥0.3 proves the bucketing is
    // genuinely angle-correlated rather than random (which would give
    // ~tables*k/n ≈ 0.05 here).
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("ANN never returns a pair the brute-force scorer would rank zero-sim") {
    val queries = emb.filter(col("vec_id") < 5)
    val ann = Similarity.annTopK(emb, queries, 10).collect()
    ann.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id"),
        "self-match leaked through")
    }
  }
}
