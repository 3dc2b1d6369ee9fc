package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** Contracts for DSIR importance scoring ([[graft.operators.Dsir]]):
  *   - the md5-prefix feature hash matches its externally-computable
  *     definition (the oracle-parity anchor);
  *   - target-vocabulary documents outscore off-target documents, and
  *     a mixed document lands between them (the selection signal DSIR
  *     exists to produce);
  *   - the weight table is closed at `buckets` rows and scoring joins
  *     it as a broadcast (the 100 TB shape).
  */
class DsirSpec extends SparkSpec {

  /** Planted corpus: docs 1–2 speak the target vocabulary, 3–4 an
    * off-target one, 5 mixes both evenly. Target = docs 1–2. */
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha gamma alpha", true),
      (3L, "zork quux blarg zork quux", false),
      (4L, "quux blarg zork blarg quux", false),
      (5L, "alpha beta zork quux", false)
    ).toDF("doc_id", "text", "is_target")
  }

  test("feature hash matches the external md5-prefix definition") {
    val s = spark
    import s.implicits._
    // md5("hello") = 5d41402a... -> 0x5d4140 = 6111552; % 4096 = 320.
    // The same arithmetic a DuckDB oracle runs — pinned as a literal.
    val got = Seq("hello").toDF("t")
      .select(Dsir.bucket(col("t"), 4096)).as[Long].head()
    assert(got == 6111552L % 4096, s"got $got")
    assert(got == 320L)
  }

  test("target-vocabulary docs outscore off-target docs; mixed lands between") {
    val docs = corpus
    val w = Dsir.weights(docs.filter(col("is_target")), docs, "text", 256)
    val scores = Dsir.score(docs, "doc_id", "text", w, 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.size == 5)
    val tgtMin = Seq(1L, 2L).map(scores).min
    val offMax = Seq(3L, 4L).map(scores).max
    assert(tgtMin > scores(5L) && scores(5L) > offMax,
      s"expected target > mixed > off-target, got $scores")
    // n_toks mirrors the space-split token count
    val n = Dsir.score(docs, "doc_id", "text", w, 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(n == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 4L))
  }

  test("one-pass weightsFor equals the general two-corpus weights") {
    val docs = corpus
    val a = Dsir.weights(docs.filter(col("is_target")), docs, "text", 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Dsir.weightsFor(docs, col("is_target"), "text", 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, s"weights diverge: $a vs $b")
  }

  test("counts are additive: batched model equals whole-corpus rebuild") {
    val docs = corpus
    val merged = Dsir.mergeCounts(
      Dsir.countsFor(docs.filter(col("doc_id") <= 2), col("is_target"), "text", 256),
      Dsir.countsFor(docs.filter(col("doc_id") > 2), col("is_target"), "text", 256))
    val inc = Dsir.weightsFromCounts(merged, 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val whole = Dsir.weightsFor(docs, col("is_target"), "text", 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inc == whole, s"incremental model diverged: $inc vs $whole")
  }

  test("weight table is closed at `buckets` rows; scoring joins it broadcast") {
    val docs = corpus
    val buckets = 64
    val w = Dsir.weights(docs.filter(col("is_target")), docs, "text", buckets)
    assert(w.count() <= buckets)
    // distinct planted tokens (6) land in <= 6 buckets
    assert(w.count() <= 6)
    val scored = Dsir.score(docs, "doc_id", "text", w, buckets)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"scoring should broadcast the weight table:\n$plan")
  }
}
