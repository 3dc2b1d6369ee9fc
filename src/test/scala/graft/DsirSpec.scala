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

  test("weight table is dense at exactly `buckets` rows; scoring joins it broadcast") {
    val docs = corpus
    val buckets = 64
    val w = Dsir.weights(docs.filter(col("is_target")), docs, "text", buckets)
    // dense over the closed feature space: unseen cells carry the
    // smoothing floor so scoring's inner join is total
    assert(w.count() == buckets)
    val scored = Dsir.score(docs, "doc_id", "text", w, buckets)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"scoring should broadcast the weight table:\n$plan")
  }

  test("scoring a batch with unseen tokens: nothing drops, floor applies") {
    val s = spark
    import s.implicits._
    val buckets = 256
    // model from the planted corpus; score a LATER batch (the
    // incremental-model case) containing tokens the model never saw
    val w = Dsir.weightsFor(corpus, col("is_target"), "text", buckets)
    val batch = Seq(
      (10L, "xyzzy plugh"),          // fully unseen vocabulary
      (11L, "alpha xyzzy")           // half seen, half unseen
    ).toDF("doc_id", "text")
    val got = Dsir.score(batch, "doc_id", "text", w, buckets)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    // both docs present, true token counts (no silent inner-join drop)
    assert(got.keySet == Set(10L, 11L), s"got $got")
    assert(got(10L)._2 == 2L && got(11L)._2 == 2L)
    // fully-unseen doc scores exactly the smoothing floor:
    // ln((0+1)/(n_t+B)) - ln((0+1)/(n_r+B)); corpus has n_t=10, n_r=24
    // target/raw tokens, and xyzzy/plugh collide with nothing at B=256
    val floor = math.log(1.0 / (10 + 256.0)) - math.log(1.0 / (24 + 256.0))
    assert(math.abs(got(10L)._1 - BigDecimal(floor)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"expected the floor $floor, got ${got(10L)}")
  }
}
