package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Phrase (collocation) mining — the phrase-vocabulary induction step
  * of a word2vec-style pipeline (Mikolov et al. 2013, "Distributed
  * Representations of Words and Phrases": merge adjacent word pairs
  * whose discounted co-occurrence score clears a threshold, so
  * "new york" becomes one token before embedding/tokenizer training).
  *
  * Score, mirrored verbatim in the DuckDB oracle (all-integer counts,
  * one double expression, rounded for cross-engine stability):
  *
  *   score(a b) = round(N · (c(ab) − δ) / (c(a) · c(b)), 6)
  *
  * with δ the discount that suppresses rare-pair noise and N the total
  * token count (making the score a scaled p(ab)/(p(a)p(b)) — PMI's
  * argument — rather than an unreadably tiny raw ratio).
  *
  * Scale shape (the q106 tokenizer-training family): the corpus
  * crosses exactly two partial-aggregated exchanges — bigram counts
  * and unigram counts, both Heaps-law vocab-sized, never
  * corpus-sized. The bigram→unigram joins are vocab-KEYED but not
  * exchange-free: the bigram table aggregates on `bigram`, so the SMJ
  * path at corpus scale re-exchanges it by w1 and again by w2 — two
  * MORE vocab-sized (min-support-pruned) shuffles, still nothing
  * corpus-sized (AQE broadcasts the unigram side at test scale and
  * skips them). The N total is a 1-row broadcast. Nothing here is
  * proportional to the corpus after the first map-side combine.
  */
object Collocations {

  /** Discounted phrase scores over `textCol`, top `topN` by
    * (score desc, bigram asc) among pairs seen ≥ `minCount` times.
    * Columns: (bigram, c_ab, score). */
  def phraseScores(docs: DataFrame, textCol: String,
      minCount: Long = 5L, delta: Double = 1.0, topN: Int = 40): DataFrame = {
    val toks = docs.select(Text.tokens(col(textCol)).as("toks"))

    val bigrams = toks
      .select(explode(Text.wordNgrams(col("toks"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)

    // Barriered: unigrams has THREE consumers (the 1-row total and the
    // two prefix/suffix joins) — without the barrier each consumer
    // re-executes the corpus tokenization from the scan (the round-8
    // advice finding: 8 parquet scans in the plan; 2 after). The
    // materialized table is Heaps-law vocab-sized, so the barrier
    // state is small at any corpus size.
    val unigrams = Barrier.materialize(toks
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w")))

    val total = unigrams.agg(sum(col("c_w")).as("n_total"))

    bigrams
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(unigrams.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c_a"), "w1")
      .join(unigrams.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c_b"), "w2")
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c_ab"),
        round(col("n_total").cast("double") * (col("c_ab") - delta) /
          (col("c_a").cast("double") * col("c_b").cast("double")), 6).as("score"))
      .orderBy(col("score").desc, col("bigram"))
      .limit(topN)
  }
}
