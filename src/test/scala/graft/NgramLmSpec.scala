package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramLm
import graft.sources.Tables

/** Contracts for bigram-LM perplexity scoring
  * ([[graft.operators.NgramLm]]):
  *   - model probabilities match the hand-computed add-one definition
  *     on a corpus small enough to verify on paper;
  *   - common-sequence documents outscore word-salad built from the
  *     SAME vocabulary (the signal q67's unigram score cannot see);
  *   - sub-bigram documents drop out instead of scoring.
  */
class NgramLmSpec extends SparkSpec {

  test("model matches the hand-computed add-one bigram probabilities") {
    val s = spark
    import s.implicits._
    // corpus "a b a b": bigrams (a b)x2, (b a)x1; c1(a)=2, c1(b)=1; V=2
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = NgramLm.bigramModel(docs, "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set("a b", "b a"))
    assert(math.abs(m("a b") - math.log(3.0 / 4.0)) < 1e-12, s"got $m")
    assert(math.abs(m("b a") - math.log(2.0 / 3.0)) < 1e-12, s"got $m")
    // doc score = mean of its 3 bigram logps
    val score = NgramLm.perplexityScore(docs, "doc_id", "text",
      NgramLm.bigramModel(docs, "text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).head
    val expect = (math.log(3.0 / 4.0) * 2 + math.log(2.0 / 3.0)) / 3
    assert(score._3 == 3L)
    assert(math.abs(score._2 - BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"got $score expect $expect")
  }

  test("word salad from common words ranks below common sequences") {
    val s = spark
    import s.implicits._
    // docs 1-3 repeat the dominant phrasing; doc 4 uses the SAME
    // vocabulary in never-seen orders (unigram-blind, bigram-visible)
    val docs = Seq(
      (1L, "the quick fox jumps high"),
      (2L, "the quick fox jumps high"),
      (3L, "the quick fox jumps high"),
      (4L, "high the jumps quick fox")
    ).toDF("doc_id", "text")
    val scores = NgramLm.perplexityScore(docs, "doc_id", "text",
      NgramLm.bigramModel(docs, "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(4L) < scores(1L),
      s"salad should rank below common phrasing: $scores")
    assert(scores(1L) == scores(2L) && scores(2L) == scores(3L))
  }

  test("two-batch merged counts rebuild the whole-corpus model exactly") {
    // the incremental contract, symmetric with Dsir.mergeCounts: a
    // stream maintaining (bigram, unigram) count tables batch by batch
    // rebuilds the model from model-sized state — never re-reading the
    // corpus — and gets bit-identical log-probs (same (c2, c1, V)
    // inputs, same one double expression)
    val docs = Tables.load(spark, sfDir, "documents")
    val h1 = docs.where(col("doc_id") % 2 === 0)
    val h2 = docs.where(col("doc_id") % 2 === 1)
    val merged = NgramLm.modelFromCounts(
      NgramLm.mergeCounts(
        NgramLm.bigramCounts(h1, "text"), NgramLm.bigramCounts(h2, "text")),
      NgramLm.mergeCounts(
        NgramLm.unigramCounts(h1, "text"), NgramLm.unigramCounts(h2, "text")))
    val whole = NgramLm.bigramModel(docs, "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m(merged) == m(whole))
    // and mismatched schemas are refused, not silently mis-merged
    val e = intercept[IllegalArgumentException] {
      NgramLm.mergeCounts(NgramLm.bigramCounts(h1, "text"),
        NgramLm.unigramCounts(h2, "text"))
    }
    assert(e.getMessage.contains("schema"))
  }

  test("documents with fewer than two tokens drop out") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = NgramLm.perplexityScore(docs, "doc_id", "text",
      NgramLm.bigramModel(docs, "text"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"got $got")
  }

  test("Kneser-Ney model matches the hand-computed interpolated definition") {
    val s = spark
    import s.implicits._
    // corpus "a b a b a c": bigrams (a b)x2 (b a)x2 (a c)x1
    // prefix a: c1=3, n1f=2; prefix b: c1=2, n1f=1
    // continuation counts n1b: a 1, b 1, c 1; T=3 types
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val m = NgramLm.kneserNeyModel(NgramLm.bigramCounts(docs, "text"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set("a b", "b a", "a c"))
    def p(c2: Double, c1: Double, n1f: Double, n1b: Double, t: Double) =
      (c2 - 0.75) / c1 + (0.75 * n1f / c1) * (n1b / t)
    assert(math.abs(m("a b") - math.log(p(2, 3, 2, 1, 3))) < 1e-12, s"got $m")
    assert(math.abs(m("b a") - math.log(p(2, 2, 1, 1, 3))) < 1e-12, s"got $m")
    assert(math.abs(m("a c") - math.log(p(1, 3, 2, 1, 3))) < 1e-12, s"got $m")
  }

  test("Kneser-Ney probabilities conserve mass over the full vocabulary") {
    val s = spark
    import s.implicits._
    // the defining identity of INTERPOLATED KN: for each context w1,
    // Σ over the FULL vocab of p(w2|w1) — observed bigrams at their
    // discounted probability, unseen w2 at backoff·Pcont(w2) — is
    // exactly 1; a discount-arithmetic or continuation-count bug
    // breaks it immediately
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val m = NgramLm.kneserNeyModel(NgramLm.bigramCounts(docs, "text"))
      .collect().map(r => r.getString(0) -> math.exp(r.getDouble(1))).toMap
    // Pcont is uniform 1/3 here (every word continues exactly one
    // distinct context); unseen (a,a): backoff(a)·Pcont(a)
    val sumA = m("a b") + m("a c") + (0.75 * 2 / 3.0) * (1.0 / 3)
    val sumB = m("b a") + (0.75 * 1 / 2.0) * (1.0 / 3) * 2 // unseen b b, b c
    assert(math.abs(sumA - 1.0) < 1e-12, s"sum over context a = $sumA")
    assert(math.abs(sumB - 1.0) < 1e-12, s"sum over context b = $sumB")
  }

  test("Kneser-Ney from two-batch merged counts equals the whole-corpus model") {
    // the incremental contract extends to KN unchanged: every
    // statistic (prefix totals, distinct-continuation counts, type
    // total) derives from the ONE mergeable (bg, c2) table
    // deterministic slice (a bare limit() could pick different rows
    // per action and make merged-vs-whole compare different corpora)
    val docs = Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") < 120)
    val h1 = docs.where(col("doc_id") % 2 === 0)
    val h2 = docs.where(col("doc_id") % 2 === 1)
    val merged = NgramLm.kneserNeyModel(NgramLm.mergeCounts(
      NgramLm.bigramCounts(h1, "text"), NgramLm.bigramCounts(h2, "text")))
    val whole = NgramLm.kneserNeyModel(NgramLm.bigramCounts(docs, "text"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m(merged) == m(whole))
  }
}
