package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Loss-aware domain-mixture weighting for multi-source training
  * corpora: what fraction of the training batch should each
  * source/domain/language contribute?
  *
  * [[doremiStep]] is one exponentiated-gradient step of DoReMi (Xie et
  * al. 2023, "Doremi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining", §3): upweight domains whose loss under a reference
  * model exceeds the corpus mean ("excess loss" — the domains the model
  * finds hardest gain weight). The published algorithm trains a proxy
  * model per step; the step itself — the part that is a DATA operator —
  * is `w_d ∝ exp(η · max(0, L_d − L̄))`, which this computes with the
  * corpus's own unigram NLL as the loss (the CCNet/q67 surrogate).
  * Complements [[CorpusPrep.temperatureSample]]'s SIZE-based
  * (`n_d^α`) mixing: DoReMi weights by how hard a domain is, α-sampling
  * by how big it is.
  *
  * Reproducibility: all corpus-sized aggregation is INTEGER (token
  * counts; per-term micro-nat log-probs `round(ln(tf/T)·1e6)` summed as
  * BIGINT — the [[UnigramLm]] fixed-point idiom), so domain totals are
  * bit-identical across engines and partitionings. Only the final
  * ≤|domains|-row softmax runs in doubles, with every expression
  * mirrored verbatim by the oracle and rounded to 6 dp.
  *
  * Scale shape ([[doremiStep]]):
  *   - shuffle 1 (the only corpus-sized one): tokens → (domain, term)
  *     counts, map-side combine absorbing the Zipf head.
  *   - everything after is vocabulary-sized (Heaps-bounded): term
  *     totals re-aggregate the (domain, term) table; the scoring join
  *     is vocab ⋈ vocab on term; the corpus total and the final
  *     normalizer are 1-row broadcasts. Unlike q67's token ⋈ vocab
  *     join, the corpus is never joined row-wise — domains×vocab is the
  *     biggest post-shuffle table at any corpus size.
  */
object Mixture {

  /** One DoReMi EG reweighting step from per-domain unigram NLL.
    *
    * @return (domainCol, n_docs, n_tokens, mean_nll, excess, weight) —
    *         weight sums to ~1 across domains, 6-dp rounded
    */
  /** The shared (domain, term) count tables every mixture statistic
    * derives from: Barrier-staged domain-term counts (the only
    * corpus-sized aggregate — two+ consumers, the q105/q111 idiom),
    * vocabulary term totals, and the 1-row corpus total. */
  private def unigramTables(docs: DataFrame, textCol: String,
      domainCol: String): (DataFrame, DataFrame, DataFrame) = {
    val toks = docs.select(col(domainCol).as("domain"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val dtf = Barrier.materialize(
      toks.groupBy(col("domain"), col("term"))
        .agg(count(lit(1)).as("dtf")))
    val tf = dtf.groupBy(col("term")).agg(sum(col("dtf")).as("tf"))
    (dtf, tf, tf.agg(sum(col("tf")).as("corpus_n")))
  }

  def doremiStep(docs: DataFrame, textCol: String, domainCol: String,
                 eta: Double): DataFrame = {
    val (dtf, tf, total) = unigramTables(docs, textCol, domainCol)
    // per-term micro-nat log-prob — ONE double expression, then integer
    val lp = tf.crossJoin(broadcast(total))
      .select(col("term"),
        round(log(col("tf").cast("double") / col("corpus_n")) * lit(1e6), 0)
          .cast("long").as("lp_fp"))
    val byDomain = dtf.join(lp, Seq("term"))
      .groupBy(col("domain"))
      .agg(sum(col("dtf") * col("lp_fp")).as("lp_sum"),
        sum(col("dtf")).as("n_tokens"))
    val nDocs = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val overall = byDomain.agg(sum(col("lp_sum")).as("lp_all"),
      sum(col("n_tokens")).as("n_all"))
    val meanNll = -col("lp_sum").cast("double") / col("n_tokens") / lit(1e6)
    val meanAll = -col("lp_all").cast("double") / col("n_all") / lit(1e6)
    val scored = byDomain.join(nDocs, Seq("domain"))
      .crossJoin(broadcast(overall))
      .select(col("domain").as(domainCol), col("n_docs"), col("n_tokens"),
        round(meanNll, 6).as("mean_nll"),
        round(greatest(lit(0.0), meanNll - meanAll), 6).as("excess"),
        round(exp(lit(eta) * greatest(lit(0.0), meanNll - meanAll)), 6)
          .as("w"))
    scored
      .withColumn("weight",
        round(col("w") / sum(col("w")).over(Window.partitionBy(lit(1))), 6))
      .drop("w")
  }

  /** Per-domain KL divergence from the corpus unigram distribution:
    * `KL(P_d ‖ P) = Σ_t (c_dt/n_d)·ln((c_dt/n_d)/(c_t/T))` — the
    * domain/corpus DRIFT monitor (which sources moved between crawls,
    * which deviate enough to need their own mixture weight; the same
    * statistic DSIR's importance ratios integrate pointwise). Always
    * ≥ 0, 0 iff the domain's token distribution matches the corpus.
    *
    * Fixed point: per (domain, term) the contribution is
    * `c_dt · round((ln(c_dt/n_d) − ln(c_t/T))·1e6)` — the log-ratio as
    * a DIFFERENCE of logs (no integer product `c_dt·T` that would
    * overflow at corpus scale), rounded to micro-nats, multiplied and
    * summed in BIGINT — order-independent, engine-exact. Only the
    * final |domains|-row division runs in doubles.
    *
    * Same scale shape as [[doremiStep]]: one Barrier-staged
    * corpus-sized count, everything after Heaps-bounded.
    *
    * @return (domainCol, n_tokens, kl) — kl in nats, 6-dp rounded
    */
  def domainKl(docs: DataFrame, textCol: String,
               domainCol: String): DataFrame = {
    val (dtf, tf, total) = unigramTables(docs, textCol, domainCol)
    val nd = dtf.groupBy(col("domain")).agg(sum(col("dtf")).as("n_d"))
    dtf.join(tf, Seq("term"))
      .join(nd, Seq("domain"))
      .crossJoin(broadcast(total))
      .select(col("domain"),
        col("n_d"),
        (col("dtf") *
          round((log(col("dtf").cast("double") / col("n_d"))
            - log(col("tf").cast("double") / col("corpus_n"))) * lit(1e6), 0)
            .cast("long")).as("c"))
      .groupBy(col("domain"))
      .agg(first(col("n_d")).as("n_tokens"), sum(col("c")).as("acc"))
      .select(col("domain").as(domainCol), col("n_tokens"),
        round(col("acc").cast("double") / col("n_tokens") / lit(1e6), 6)
          .as("kl"))
  }

  /** UniMax sampling allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a token `budget` as uniformly as possible
    * across sources, subject to a per-source cap of `capEpochs` epochs
    * — small sources are visited at most `capEpochs` times (no
    * over-repetition), the remaining budget waterfills uniformly over
    * the large ones. The third mixing policy beside size-based
    * temperature sampling ([[CorpusPrep.temperatureSample]]) and
    * loss-based DoReMi ([[doremiStep]]).
    *
    * Waterfill, exactly: sort sources by capped mass `c·n` ascending;
    * source i is CAPPED iff its cap fits under the uniform share of
    * what remains, `c·n_i · (S−i+1) ≤ budget − P_{i−1}` (prefix sums
    * P in LONG arithmetic — the condition is prefix-closed for an
    * ascending sort, so the capped set is rows 1..k). Capped sources
    * get exactly `c·n_i`; the rest split `budget − P_k` evenly. Only
    * the final per-row division runs in doubles, mirrored verbatim by
    * the oracle.
    *
    * Scale shape: the corpus contributes ONE tiny aggregation (per-
    * source token totals — zero-shuffle tokenize projection, map-side
    * combined). Every window after that runs over the S-row source
    * table (S = #sources, inherently small); the corpus is never
    * touched again. */
  def unimaxAllocation(docs: DataFrame, textCol: String, sourceCol: String,
      budget: Long, capEpochs: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(capEpochs > 0, s"capEpochs must be positive: $capEpochs")
    val n = docs
      .select(col(sourceCol).as("source"),
        size(graft.functions.Text.tokens(col(textCol))).as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
    val asc = Window.orderBy(col("capped"), col("source"))
    val all = Window.partitionBy() // S rows total — whole-frame is fine
    val scored = n
      .withColumn("capped", col("n_tokens") * capEpochs)
      .withColumn("i", row_number().over(asc).cast("long"))
      .withColumn("p_prev", coalesce(
        sum(col("capped")).over(asc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("s_cnt", count(lit(1)).over(all))
      .withColumn("total_capped", sum(col("capped")).over(all))
      .withColumn("cond",
        col("capped") * (col("s_cnt") - col("i") + 1) <= lit(budget) - col("p_prev"))
      .withColumn("k", max(when(col("cond"), col("i")).otherwise(0L)).over(all))
      .withColumn("p_k", max(when(col("cond"), col("p_prev") + col("capped"))
        .otherwise(0L)).over(all))
    scored
      .withColumn("alloc", when(col("i") <= col("k"), col("capped").cast("double"))
        .otherwise((lit(budget) - col("p_k")).cast("double")
          / (col("s_cnt") - col("k")).cast("double")))
      .withColumn("denom",
        least(lit(budget), col("total_capped")).cast("double"))
      .select(col("source"), col("n_tokens"),
        round(col("alloc"), 6).as("alloc"),
        round(col("alloc") / col("n_tokens"), 6).as("epochs"),
        round(col("alloc") / col("denom"), 6).as("share"))
  }
}
