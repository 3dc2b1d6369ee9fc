package graft

import org.apache.spark.sql.functions._
import graft.operators.HashedLr

/** Contracts for the hashed-feature logistic-regression quality
  * classifier ([[graft.operators.HashedLr]]):
  *   - the first gradient step from zero init matches the
  *     hand-computed exact value (errors are exactly ±1/2 there —
  *     the property q103's oracle relies on);
  *   - full training separates a linearly separable planted corpus
  *     and monotonically reduces log-loss;
  *   - the weight table is dense at `buckets` rows.
  */
class HashedLrSpec extends SparkSpec {

  test("one GD step from zero matches the hand computation exactly") {
    val s = spark
    import s.implicits._
    // feats: doc1 {a:2, b:1} y=1; doc2 {c:2, d:1} y=0; n=2, lr=0.1
    // err = ±1/2 exactly, so grad(a)=-1, grad(b)=-1/2, grad(c)=+1,
    // grad(d)=+1/2 and w1 = {a:+0.05, b:+0.025, c:-0.05, d:-0.025}
    val docs = Seq((1L, "a a b", 1.0), (2L, "c c d", 0.0))
      .toDF("doc_id", "text", "y")
    val wDf = HashedLr.train(docs, "doc_id", "text", "y",
      buckets = 256, iters = 1, lr = 0.1)
    val w = wDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 256)
    // buckets: a=117 b=95 c=8 d=224 (md5-prefix % 256, all distinct)
    assert(math.abs(w(117L) - 0.05) < 1e-15, s"w(a)=${w(117L)}")
    assert(math.abs(w(95L) - 0.025) < 1e-15, s"w(b)=${w(95L)}")
    assert(math.abs(w(8L) + 0.05) < 1e-15, s"w(c)=${w(8L)}")
    assert(math.abs(w(224L) + 0.025) < 1e-15, s"w(d)=${w(224L)}")
    assert(w.values.count(_ != 0.0) == 4, "only touched buckets move")
    // scoring under w1 (same trained table): doc1 margin = 0.125
    val p = HashedLr.score(docs, "doc_id", "text", wDf, 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(p(1L) - 1.0 / (1.0 + math.exp(-0.125))) < 1e-6)
    assert(math.abs(p(2L) - 1.0 / (1.0 + math.exp(0.125))) < 1e-6)
  }

  private def planted = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "good text here good", 1.0),
      (2L, "text here good good", 1.0),
      (3L, "good here text", 1.0),
      (4L, "spam junk words spam", 0.0),
      (5L, "junk words spam junk", 0.0),
      (6L, "words junk spam", 0.0)
    ).toDF("doc_id", "text", "y")
  }

  test("training separates a linearly separable corpus; loss decreases") {
    val docs = planted
    def logloss(iters: Int): Double = {
      val scored = HashedLr.score(docs, "doc_id", "text",
        HashedLr.train(docs, "doc_id", "text", "y", 256, iters, lr = 2.0), 256)
      docs.join(scored, "doc_id")
        .select(avg(-col("y") * log(col("p"))
          - (lit(1.0) - col("y")) * log(lit(1.0) - col("p"))).as("l"))
        .collect().head.getDouble(0)
    }
    val l1 = logloss(1); val l10 = logloss(10); val l50 = logloss(50)
    assert(l10 < l1 && l50 < l10,
      s"log-loss must decrease with training: $l1 -> $l10 -> $l50")
    val p = HashedLr.score(docs, "doc_id", "text",
        HashedLr.train(docs, "doc_id", "text", "y", 256, 50, lr = 2.0), 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val posMin = Seq(1L, 2L, 3L).map(p).min
    val negMax = Seq(4L, 5L, 6L).map(p).max
    assert(posMin > negMax,
      s"separable corpus must separate: pos min $posMin vs neg max $negMax")
    assert(posMin > 0.5 && negMax < 0.5, s"got $p")
  }
}
