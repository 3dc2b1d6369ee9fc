package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature logistic regression — the trained quality-classifier
  * filter of web-scale curation (the GPT-3 / PaLM / LLaMA pipelines
  * train exactly this shape: a linear classifier over hashed
  * bag-of-words, scoring the crawl against a "looks like the reference
  * corpus" label). Complements [[Dsir]]: DSIR is the zero-training
  * importance estimate, this is the supervised one; both share the
  * closed md5-prefix feature space ([[Dsir.bucket]]), so both models
  * stay ≤ `buckets` rows and always broadcast.
  *
  * Training is full-batch gradient descent run BY the engine:
  * per-iteration cost is two corpus-feature joins (margins, then
  * gradient) + a ≤ `buckets`-row driver collect for the weight update
  * — the [[Ivf]] k-means pattern (bounded driver state, data never
  * leaves executors). The feature table is built once and barriered
  * across iterations (the k-means cache lesson; the durable
  * [[Barrier]] persistPath form is the 100 TB choice).
  *
  * Determinism: the FIRST step from zero init is exactly
  * order-independent (sigmoid(0) = 1/2 exactly, so every error term
  * is ±1/2 and gradient sums are dyadic rationals — IEEE addition of
  * halves is exact), which is what makes q103's oracle possible.
  * Later iterations sum arbitrary doubles across partitions and are
  * deterministic only to last-ulp merge order — HashedLrSpec grades
  * full training behaviorally (loss decrease, planted separation).
  */
object HashedLr {

  /** Per-document hashed bag-of-words: `(idCol, b, cnt)` — one narrow
    * projection + one (id, bucket)-keyed count. */
  def features(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .select(col(idCol), Dsir.bucket(col("term"), buckets).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("cnt"))

  private def sigmoid(m: Column): Column = lit(1.0d) / (lit(1.0d) + exp(-m))

  /** Train by full-batch GD from zero init; returns the dense weight
    * table `(b, w)` (exactly `buckets` rows). `labelCol` must be
    * 0.0/1.0 doubles. Caches its derived feature/label tables for the
    * iteration loop and releases them before returning (the Ivf
    * cache-then-unpersist discipline); when the caller already has a
    * feature table — e.g. to score with it afterwards without a second
    * corpus pass — use [[trainOnFeatures]] + [[scoreFeatures]] and own
    * the lifecycle.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, buckets: Int, iters: Int,
            lr: Double): DataFrame = {
    val feats = features(docs, idCol, textCol, buckets).cache()
    val labels = docs
      .select(col(idCol), col(labelCol).cast("double").as("y")).cache()
    try trainOnFeatures(feats, labels, idCol, buckets, iters, lr)
    finally { feats.unpersist(false); labels.unpersist(false) }
  }

  /** The GD loop over a caller-owned [[features]] table and `(idCol,
    * y)` label frame. Cache both before calling (every iteration runs
    * two joins against each) — this method does not manage their
    * lifecycle. The returned weight table is fully materialized on
    * the driver (collect + re-create), so it stays valid after the
    * inputs are unpersisted.
    */
  def trainOnFeatures(feats: DataFrame, labels: DataFrame, idCol: String,
                      buckets: Int, iters: Int, lr: Double): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    require(iters >= 1 && lr > 0)
    val n = labels.count()
    val w = Array.fill(buckets)(0.0d)
    for (_ <- 1 to iters) {
      val wDf = w.zipWithIndex.map { case (v, b) => (b.toLong, v) }
        .toSeq.toDF("b", "w")
      val margins = feats.join(broadcast(wDf), "b")
        .groupBy(col(idCol))
        .agg(sum(col("cnt") * col("w")).as("margin"))
      val errs = labels.join(margins, Seq(idCol), "left")
        .select(col(idCol),
          (sigmoid(coalesce(col("margin"), lit(0.0d))) - col("y")).as("err"))
      val grad = feats.join(errs, idCol)
        .groupBy(col("b")).agg(sum(col("cnt") * col("err")).as("g"))
      // bounded driver collect: <= buckets rows, like Ivf's centroids
      grad.collect().foreach { r =>
        val b = r.getLong(0)
        // left-assoc (lr * g) / n — q103's oracle mirrors this order
        w(b.toInt) = w(b.toInt) - lr * r.getDouble(1) / n
      }
    }
    w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toSeq.toDF("b", "w")
  }

  /** Score documents under a trained weight table:
    * `(idCol, p, predicted)` with `p = sigmoid(Σ cnt·w)` rounded to 6
    * digits and `predicted` compared on the ROUNDED p (so a last-ulp
    * margin difference cannot flip it). One corpus-feature pass +
    * broadcast model join + per-document aggregate; to reuse a
    * feature table the trainer already built (skipping that corpus
    * pass), call [[scoreFeatures]] directly.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, buckets: Int,
            threshold: Double = 0.5): DataFrame =
    scoreFeatures(features(docs, idCol, textCol, buckets), idCol,
      weights, threshold)

  /** [[score]] over a caller-owned [[features]] table. */
  def scoreFeatures(feats: DataFrame, idCol: String, weights: DataFrame,
                    threshold: Double = 0.5): DataFrame =
    feats
      .join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(round(sigmoid(sum(col("cnt") * col("w"))), 6).as("p"))
      .withColumn("predicted", col("p") >= threshold)
}
