package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Bigram language-model perplexity scoring — the CCNet-style quality
  * filter (Wenzek et al. 2020 score a KenLM 5-gram model; the bigram
  * form keeps the same operator shape with engine-portable
  * arithmetic): score each document by the mean log-probability of its
  * bigrams under an add-one-smoothed bigram model, so documents full
  * of improbable token SEQUENCES (not just rare tokens — q67's unigram
  * score can't see word salad built from common words) rank low.
  *
  * The deliberate contrast with [[Dsir]]: a hashed-feature model is
  * CLOSED and always broadcastable, while a raw bigram table grows
  * with corpus vocabulary² and at 100 TB does NOT fit a broadcast —
  * so scoring here is the shuffle-join form: explode the document
  * bigrams, equi-join the model on the bigram key (sort-merge at
  * scale; AQE picks broadcast only while the model is provably small),
  * re-aggregate per document. The only explicit broadcast is the
  * 1-row vocabulary count. Model building is two corpus passes
  * (bigram counts + unigram vocabulary); the model is a build-once
  * artifact — at scale it persists and amortizes over every scoring
  * run (the [[Barrier]] persistPath form).
  */
object NgramLm {

  /** Bigram counts `(bg, c2)` of `textCol` split on single spaces.
    * Bigrams are formed inside each row's token array (wordNgrams —
    * zero-shuffle), so the only exchange is the ≤ |bigram vocab|
    * partial-aggregated count.
    */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(split(col(textCol), " ").as("toks")) // stage: HOF binding rule
      .select(explode(Text.wordNgrams(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c2"))

  /** Unigram counts `(term, c1u)` — the model's OTHER sufficient
    * statistic: the vocabulary size V is its row count. Maintained
    * alongside [[bigramCounts]] so the whole model is rebuildable from
    * mergeable count tables (the [[Dsir]] incremental contract — see
    * [[mergeCounts]]). */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c1u"))

  /** Merge two count tables with the same `(key, count)` 2-column
    * schema — bigram or unigram alike: union + re-sum, associative and
    * commutative, so batches can fold in any order (a streaming
    * foreachBatch maintains the tables incrementally and the model is
    * rebuilt model-sized from them, never by re-reading the corpus —
    * the symmetric story to Dsir.mergeCounts; NgramLmSpec pins
    * two-batch merge == whole-corpus). */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"count tables must share a schema: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val Array(keyCol, cntCol) = a.columns
    a.unionByName(b).groupBy(col(keyCol)).agg(sum(col(cntCol)).as(cntCol))
  }

  /** Add-one-smoothed bigram model `(bg, logp)`:
    * `p(w2 | w1) = (c2(w1 w2) + 1) / (c1(w1) + V)` with
    * `c1(w1) = Σ_w2 c2(w1 w2)` and `V` = distinct unigram vocabulary
    * size. The prefix aggregate and prefix join are model-sized (never
    * corpus-sized); `bigrams` is barriered because it feeds both —
    * without it its lineage (a corpus pass, when fed from
    * [[bigramCounts]]) would run twice.
    */
  def modelFromCounts(bigrams: DataFrame, unigrams: DataFrame): DataFrame = {
    val counts = Barrier.materialize(bigrams)
    val prefix = counts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val vocab = unigrams.agg(count(lit(1)).as("v"))
    counts
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(prefix, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        log((col("c2") + lit(1.0d)) / (col("c1") + col("v"))).as("logp"))
  }

  /** [[modelFromCounts]] over a corpus's own count passes. */
  def bigramModel(docs: DataFrame, textCol: String): DataFrame =
    modelFromCounts(bigramCounts(docs, textCol), unigramCounts(docs, textCol))

  /** Interpolated Kneser–Ney bigram model `(bg, logp)` — the smoothing
    * KenLM actually ships (Kneser & Ney 1995; the interpolated form is
    * Chen & Goodman 1998's recommendation), upgrading [[modelFromCounts]]'s
    * add-one baseline: the backoff distribution is the CONTINUATION
    * probability (how many distinct contexts a word follows) rather
    * than raw frequency, so "Francisco" — frequent but only ever after
    * "San" — stops inflating unseen-context estimates.
    *
    *   p(w2 | w1) = (c2 − D)/c1 + (D·N1+(w1,·)/c1) · (N1+(·,w2)/T)
    *
    * with `D = 0.75` (Chen & Goodman's fixed discount; a dyadic
    * rational, exactly representable), `N1+(w1,·)`/`N1+(·,w2)` the
    * distinct-continuation counts, and `T` the distinct bigram-type
    * total. Every input is an exact integer; the expression is a fixed
    * dag of IEEE ops mirrored operation-for-operation by the DuckDB
    * twin, and `ln` is the one transcendental (the q101 contract).
    *
    * All statistics derive from the ONE mergeable bigram count table
    * ([[mergeCounts]] — the incremental contract is unchanged), so a
    * stream maintaining `(bg, c2)` rebuilds the KN model model-sized.
    * Scale shape as [[modelFromCounts]]: the prefix/suffix aggregates
    * and joins are model-sized, the type total is a 1-row broadcast,
    * and the model deliberately ships to [[perplexityScore]]'s
    * shuffle-join (vocab² — never assume broadcastable).
    */
  def kneserNeyModel(bigrams: DataFrame, discount: Double = 0.75d): DataFrame = {
    require(discount > 0d && discount < 1d, s"discount must be in (0,1): $discount")
    val counts = Barrier.materialize(bigrams)
    val prefix = counts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val suffix = counts
      .groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n1b"))
    val types = counts.agg(count(lit(1)).as("t"))
    counts
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(prefix, "w1")
      .join(suffix, "w2")
      .crossJoin(broadcast(types))
      .select(col("bg"),
        log((col("c2") - lit(discount)) / col("c1") +
          (lit(discount) * col("n1f") / col("c1")) *
            (col("n1b") / col("t").cast("double"))).as("logp"))
  }

  /** Mean bigram log-probability per document:
    * `(idCol, mean_logp2, n_bigrams)`, rounded to 6 digits. Documents
    * with fewer than two tokens have no bigrams and drop out (both
    * engines agree — explode of an empty array emits nothing). Model
    * bigrams cover every document bigram when the model was built from
    * the same corpus, so the equi-join is inner. A document's bigrams
    * originate from its single input row — the pre-shuffle partial
    * sums in bigram order (the q67 determinism contract).
    */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
                      model: DataFrame, outCol: String = "mean_logp2"): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), explode(Text.wordNgrams(col("toks"), 2)).as("bg"))
      .join(model, "bg")
      .groupBy(col(idCol))
      .agg(round(avg(col("logp")), 6).as(outCol),
        count(lit(1)).as("n_bigrams"))
}
