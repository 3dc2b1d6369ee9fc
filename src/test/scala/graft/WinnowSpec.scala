package graft

import org.apache.spark.sql.functions._
import graft.operators.Winnow

/** Winnowing fingerprints ([[operators.Winnow]]): the shared-passage
  * guarantee (a common run of ≥ w+k−1 tokens ⇒ a shared fingerprint),
  * the window-minimum subset invariant, short-document and
  * stop-fingerprint edges, and the pair report.
  */
class WinnowSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private val passage = "alpha beta gamma delta epsilon zeta"

  test("guarantee: docs sharing a >= w+k-1 token passage share a fingerprint") {
    // k=3, w=4 ⇒ threshold t = 6 tokens; the 6-token passage is planted
    // inside otherwise-disjoint documents
    val docs = Seq(
      (1L, s"one two three $passage four five six"),
      (2L, s"seven eight nine ten $passage eleven"),
      (3L, "totally different words with no overlap at all here")).toDF("doc_id", "text")
    val pairs = Winnow.sharedPassagePairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted shared passage must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint doc must not pair")
  }

  test("fingerprints are a subset of the k-gram hashes (window minima)") {
    val docs = Seq((1L, passage + " eta theta iota")).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(_.getLong(1)).toSet
    // w=1 degenerates to "every hash is selected" — the full hash set
    val all = Winnow.fingerprints(docs, "doc_id", "text", k = 3, w = 1)
      .collect().map(_.getLong(1)).toSet
    assert(fps.nonEmpty && fps.subsetOf(all))
    // winnowing compresses: fewer selected than total k-grams
    assert(fps.size < all.size)
  }

  test("short documents (< k+w-1 tokens) yield zero fingerprints, exact n_kgrams") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val rows = Winnow.fingerprintStats(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // doc 1: 5 tokens → 3 trigrams < w → no full window
    assert(rows(1L) === ((0, 3)))
    // doc 2: 2 tokens → no trigram at all
    assert(rows(2L) === ((0, 0)))
  }

  test("stats density: full-window docs score n_fps/n_kgrams, capped at 1") {
    val docs = Seq((1L, passage + " eta theta iota")).toDF("doc_id", "text")
    val r = Winnow.fingerprintStats(docs, "doc_id", "text").collect()(0)
    val (nFps, nKgrams, density) = (r.getInt(1), r.getInt(2), r.getDouble(3))
    assert(nFps >= 1 && nFps <= nKgrams)
    assert(density === BigDecimal.valueOf(nFps.toDouble / nKgrams)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stop-fingerprint cut: ubiquitous fingerprints are dropped from pairing") {
    // the passage appears in ALL three docs → with maxDf=2 its
    // fingerprints are boilerplate and must not produce pairs
    val docs = Seq(
      (1L, s"$passage"), (2L, s"$passage"), (3L, s"$passage"))
      .toDF("doc_id", "text")
    val cut = Winnow.sharedPassagePairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 1, maxDf = 2)
    assert(cut.isEmpty)
    val kept = Winnow.sharedPassagePairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 1, maxDf = 3)
    assert(kept.count() === 3) // all three pairs once boilerplate is allowed
  }

  test("passageOverlap: contaminated corpus docs found, clean docs untouched") {
    val eval = Seq((100L, s"held out benchmark $passage question answer"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"training text containing $passage verbatim inside"),
      (2L, "completely unrelated training material nothing shared here"))
      .toDF("doc_id", "text")
    val hits = Winnow.passageOverlap(corpus, eval, "doc_id", "text",
        k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(1L) && hits(1L) >= 1L,
      "doc quoting >= w+k-1 eval tokens must be flagged")
    assert(!hits.contains(2L), "clean doc must not be flagged")
  }

  test("fingerprinting stays in codegen with only doc-keyed exchanges") {
    // the scaladoc's reason for the explode+window formulation: every
    // per-token expression (tokenize, md5, window min) must run inside
    // whole-stage codegen — the HOF formulation evaluated interpreted
    // and was 100×+ slower at sf0.1
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val df = Winnow.fingerprints(d, "doc_id", "text")
    df.collect() // AQE finalizes (and codegen-annotates) the plan on execution
    val plan = df.queryExecution.executedPlan.toString
    // codegen spans render as "*(n) " prefixes in the final-plan string;
    // the md5/conv hashing projection must carry one
    assert(plan.contains("*(") && plan.contains("md5"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
