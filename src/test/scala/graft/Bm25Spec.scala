package graft

import java.math.RoundingMode
import graft.operators.Bm25

/** BM25 ranked retrieval ([[operators.Bm25]]): exact micro-scores on a
  * hand corpus (replaying the formula with the same HALF_UP fixed-point
  * rounding Spark's `round` applies), ranking semantics (tf saturation,
  * idf rarity, length normalization), the k cut, and the
  * duplicate-query-term contract.
  */
class Bm25Spec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana cherry")).toDF("doc_id", "text")

  /** The operator's per-term double expression, reproduced
    * independently: idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), in
    * micro-score fixed point. */
  private def micro(tf: Long, df: Long, dl: Long, nDocs: Long,
                    avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Long = {
    val s = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl)) * 1e6
    BigDecimal.valueOf(s).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  private def run(qs: Seq[(Long, String)], k: Int = 10) =
    Bm25.topK(docs, "doc_id", "text", qs.toDF("query_id", "qtext"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))

  test("exact micro-scores and ranking on a hand corpus") {
    // N=3, dl: d1=3, d2=2, d3=4, avgdl=3.0
    val rows = run(Seq((1L, "apple"), (2L, "banana cherry")))
    val q1 = rows.filter(_._1 == 1L).sortBy(_._3)
    // df(apple)=2; d1 tf=2 beats d2 tf=1 (tf weighting)
    assert(q1.map(_._2).toSeq === Seq(1L, 2L))
    assert(q1(0)._4 === micro(tf = 2, df = 2, dl = 3, nDocs = 3, avgdl = 3.0))
    assert(q1(1)._4 === micro(tf = 1, df = 2, dl = 2, nDocs = 3, avgdl = 3.0))
    // q2: d3 matches both terms and wins; d1 (banana) and d2 (cherry)
    // trail with single-term scores
    val q2 = rows.filter(_._1 == 2L).sortBy(_._3)
    assert(q2.map(_._2).toSeq === Seq(3L, 2L, 1L))
    val d3 = micro(3, 2, 4, 3, 3.0) + micro(1, 2, 4, 3, 3.0)
    assert(q2(0)._4 === d3)
  }

  test("duplicate query terms count once (bag-of-words probe contract)") {
    val once = run(Seq((1L, "apple")))
    val dup = run(Seq((1L, "apple apple apple")))
    assert(once.toSeq === dup.toSeq)
  }

  test("k cuts the per-query list; queries matching nothing vanish") {
    val rows = run(Seq((1L, "banana"), (2L, "zzz_absent")), k = 1)
    assert(rows.map(_._1).toSet === Set(1L))
    assert(rows.length === 1)
    // banana: d3 (tf 3) outranks d1 (tf 1) — only d3 survives k=1
    assert(rows(0)._2 === 3L)
  }

  test("rm3 expansion: non-query terms of the pseudo-relevant set, exact weights") {
    // query "apple" retrieves d1, d2 (d3 lacks it). Expansion pool:
    // banana (d1: tf 1, dl 3), cherry (d2: tf 1, dl 2); "apple" itself
    // is excluded. weight = round(tf/dl·1e6) · score_fp(doc)
    val exp = Bm25.rm3ExpansionTerms(docs, "doc_id", "text",
        Seq((1L, "apple")).toDF("query_id", "qtext"), kDocs = 2, mTerms = 5)
      .collect().map(r => r.getString(1) -> (r.getInt(2), r.getLong(3))).toMap
    assert(!exp.contains("apple"), "query terms must be excluded")
    val d1Score = micro(tf = 2, df = 2, dl = 3, nDocs = 3, avgdl = 3.0)
    val d2Score = micro(tf = 1, df = 2, dl = 2, nDocs = 3, avgdl = 3.0)
    assert(exp("banana")._2 === 333333L * d1Score)
    assert(exp("cherry")._2 === 500000L * d2Score)
    assert(exp.keySet === Set("banana", "cherry"))
  }

  test("topKFromPostings over a prebuilt index equals topK over the corpus") {
    val idx = Bm25.postings(docs, "doc_id", "text")
    val fromIdx = Bm25.topKFromPostings(idx,
      Seq((1L, "banana cherry")).toDF("query_id", "qtext"), k = 10)
    val direct = run(Seq((1L, "banana cherry")))
    assert(fromIdx.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._3).toSeq === direct.sortBy(_._3).toSeq)
  }

  test("rarer term contributes more than a common one at equal tf") {
    // one doc holds a unique term; idf(unique) > idf(shared)
    val d = Seq(
      (1L, "shared unique"),
      (2L, "shared filler"),
      (3L, "shared filler")).toDF("doc_id", "text")
    val r = Bm25.topK(d, "doc_id", "text",
        Seq((1L, "unique"), (2L, "shared")).toDF("query_id", "qtext"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val uniqueScore = r.filter(x => x._1 == 1L && x._2 == 1L).head._3
    val sharedScore = r.filter(x => x._1 == 2L && x._2 == 1L).head._3
    assert(uniqueScore > sharedScore)
  }
}
