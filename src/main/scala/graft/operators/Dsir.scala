package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** DSIR-style importance scoring for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its hashed-token
  * profile is under a TARGET corpus's unigram distribution than under
  * the raw corpus's own — the standard cheap proxy for "looks like the
  * high-quality target domain" when curating pre-training data. The
  * selection step (keep top-p by score, or Gumbel-top-k for sampled
  * resampling) composes downstream as a filter / the q72 mixture-
  * sampling idiom / the q95 epoch-shuffle rank, so this operator owns
  * the corpus-heavy part: feature hashing, the two distributions, and
  * per-document scoring.
  *
  * Scale shape (the reason DSIR hashes features at all): the feature
  * space is CLOSED at `buckets` cells regardless of corpus size, so
  * - the two distribution builds partial-aggregate to ≤ `buckets` rows
  *   per task before their exchanges — KB-scale shuffles over a 100 TB
  *   corpus;
  * - the weight table is ≤ `buckets` rows and explicitly broadcast —
  *   scoring is a map-side hash join, the corpus never shuffles to
  *   meet the model;
  * - the only corpus-keyed exchange is the final per-document
  *   aggregate of (sum, count) partials.
  * Raising `buckets` trades collision bias for weight-table size
  * exactly as in the paper (they use 10⁴ for unigrams).
  */
object Dsir {

  /** Deterministic hashed feature bucket for a token: the first 6 hex
    * chars of md5, read as an integer, modulo `buckets`. md5 — not
    * murmur — so external engines can reproduce the bucketing
    * bit-for-bit (DuckDB: `('0x' || substr(md5(t),1,6))::BIGINT % B`);
    * 24 bits of prefix dwarf any practical bucket count. All three
    * pieces (md5, substring, conv) are codegen'd built-ins.
    */
  def bucket(term: Column, buckets: Int): Column =
    conv(substring(md5(term), 1, 6), 16, 10).cast("long") % buckets

  /** Hashed token counts `(b, tf)` of `textCol` split on single
    * spaces — one narrow projection, then a group-by whose partial
    * aggregation caps the exchange at ≤ `buckets` rows per task.
    */
  def hashedCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .select(bucket(col("term"), buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("tf"))

  /** [[weights]] for the common case where the target corpus is a
    * predicate-defined SUBSET of the raw corpus (DSIR's own setup:
    * "target = the Wikipedia-like slice of the crawl"): both
    * distributions come out of ONE corpus pass — a conditional count
    * next to the total count in the same ≤ `buckets`-row aggregate —
    * instead of two scans full-outer-joined. Same weights, half the
    * model-build I/O; at 100 TB this is the form to run.
    */
  def weightsFor(docs: DataFrame, isTarget: Column, textCol: String,
                 buckets: Int): DataFrame =
    weightsFromCounts(countsFor(docs, isTarget, textCol, buckets), buckets)

  /** General two-corpus form of [[weightsFor]]: target and raw are
    * arbitrary frames (target need not be a subset of raw). Builds the
    * full-outer `(b, tf_t, tf_r)` count table and delegates to
    * [[weightsFromCounts]] — one smoothing definition, not two.
    */
  def weights(target: DataFrame, raw: DataFrame, textCol: String,
              buckets: Int): DataFrame = {
    val t = hashedCounts(target, textCol, buckets)
      .withColumnRenamed("tf", "tf_t")
    val r = hashedCounts(raw, textCol, buckets)
      .withColumnRenamed("tf", "tf_r")
    weightsFromCounts(
      t.join(r, Seq("b"), "full_outer")
        .select(col("b"),
          coalesce(col("tf_t"), lit(0L)).as("tf_t"),
          coalesce(col("tf_r"), lit(0L)).as("tf_r")),
      buckets)
  }

  /** The one-pass count table `(b, tf_t, tf_r)` behind [[weightsFor]]:
    * target and raw counts from a single corpus scan via a conditional
    * sum. Exposed because counts are the model's INCREMENTAL form —
    * they add across ingest batches ([[mergeCounts]]), so at 100 TB
    * the model updates per batch by merging ≤ `buckets`-row tables and
    * the corpus is never re-read (the q81/q92 incremental-index
    * story, applied to the selection model).
    */
  def countsFor(docs: DataFrame, isTarget: Column, textCol: String,
                buckets: Int): DataFrame =
    docs
      .select(isTarget.as("is_t"), explode(split(col(textCol), " ")).as("term"))
      .select(col("is_t"), bucket(col("term"), buckets).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("tf_t"),
        count(lit(1)).as("tf_r"))

  /** Merge two [[countsFor]] tables by per-bucket addition — counts
    * are sufficient statistics, so a batched/streamed model equals the
    * whole-corpus rebuild exactly (DsirSpec pins the equality). Both
    * inputs are ≤ `buckets` rows; so is the result.
    */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("b"))
      .agg(sum(col("tf_t")).as("tf_t"), sum(col("tf_r")).as("tf_r"))

  /** Weights from a (possibly merged) [[countsFor]] table — DENSE over
    * the whole closed feature space: exactly `buckets` rows, one per
    * cell, with never-observed cells carrying the smoothing floor
    * `ln(n_r + B) − ln(n_t + B)` instead of being absent. Density is
    * what makes [[score]]'s inner join total — a scoring batch with
    * tokens the model never saw (the incremental-model case) still
    * scores every token instead of silently dropping it. (With
    * add-one smoothing and a target smaller than raw, the floor is
    * slightly positive — the standard artifact; selection ranks
    * relatively, and smoothing exists precisely so unseen mass is
    * finite.) The counts are barriered because totals and weights
    * both read them — and the broadcast-subquery side plans
    * independently, so without the barrier the count derivation (a
    * corpus scan when counts are unmaterialized) would run twice.
    */
  def weightsFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    val c = Barrier.materialize(counts)
    val totals = c.agg(coalesce(sum(col("tf_t")), lit(0L)).as("n_t"),
      coalesce(sum(col("tf_r")), lit(0L)).as("n_r"))
    val dense = c.sparkSession.range(0, buckets)
      .select(col("id").as("b"))
      .join(c, Seq("b"), "left")
      .select(col("b"),
        coalesce(col("tf_t"), lit(0L)).as("tf_t"),
        coalesce(col("tf_r"), lit(0L)).as("tf_r"))
    dense.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("tf_t") + lit(1.0d)) / (col("n_t") + lit(buckets.toDouble)))
          - log((col("tf_r") + lit(1.0d)) / (col("n_r") + lit(buckets.toDouble))))
          .as("w"))
  }

  /** Mean per-token importance weight for every document:
    * `(idCol, dsir_score, n_toks)`, score rounded to 6 digits. The
    * weight table joins as an explicit broadcast (exactly `buckets`
    * rows by construction), so the corpus-side plan is explode →
    * map-side hash join → per-document partial (sum, count) — one
    * document-keyed exchange total. Every token's bucket lies in
    * [0, buckets), and a [[weightsFromCounts]] table is dense over
    * that range, so the inner join is TOTAL — unseen tokens score the
    * smoothing floor and `n_toks` is the true token count. A
    * document's tokens all originate from its single input row, so
    * the pre-shuffle partial sums them in token order — deterministic
    * float summation (the q67 contract).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weightTable: DataFrame, buckets: Int): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .select(col(idCol), bucket(col("term"), buckets).as("b"))
      .join(broadcast(weightTable), "b")
      .groupBy(col(idCol))
      .agg(round(avg(col("w")), 6).as("dsir_score"),
        count(lit(1)).as("n_toks"))
}
