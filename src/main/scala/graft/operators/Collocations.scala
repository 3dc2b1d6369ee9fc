package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      minCount: Long = 5L, delta: Double = 1.0, topN: Int = 40): DataFrame =
    scoredBigrams(docs.select(Text.tokens(col(textCol)).as("toks")),
        minCount, delta)
      .orderBy(col("score").desc, col("bigram"))
      .limit(topN)

  /** Windowed skip-gram co-occurrence PMI — the distributional
    * statistic behind word2vec/GloVe-style co-occurrence matrices:
    * count UNORDERED token pairs within a ±`win` token window
    * (symmetrized by sorting each pair) and score
    * `round(ln(N·c_ab / (c_a·c_b)), 6)` — PMI up to the
    * window-count normalization constant, ONE double expression
    * mirrored verbatim in the oracle (the q111 idiom; ln is already
    * pinned cross-engine by q67). Top `topN` by (pmi desc, pair asc)
    * at min support `minCount`.
    *
    * Scale: pair generation is `win` `lead()`s over ONE doc-keyed
    * window exchange (the q76/q152 class — bucketing the corpus by
    * id removes it; a self-join spelling would be a range join
    * instead). Counts are pair-vocabulary-sized after map-side
    * combine; the N total is a 1-row broadcast (allowlisted BNLJ).
    */
  def windowedPmi(docs: DataFrame, idCol: String, textCol: String,
      win: Int, minCount: Long = 5L, topN: Int = 40): DataFrame = {
    require(win >= 1, s"need win >= 1, got $win")
    import org.apache.spark.sql.expressions.Window
    val e = docs.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val pairs = e
      .select(col("tok"),
        array((1 to win).map(j => lead(col("tok"), j).over(w)): _*)
          .as("nbrs"))
      .select(col("tok").as("x"), explode(col("nbrs")).as("y"))
      .where(col("y").isNotNull)
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val uni = Barrier.materialize(
      e.groupBy(col("tok")).agg(count(lit(1)).as("c_w")))
    val n = uni.agg(sum(col("c_w")).as("n"))
    pairs
      .join(broadcast(uni.select(col("tok").as("a"), col("c_w").as("c_a"))),
        "a")
      .join(broadcast(uni.select(col("tok").as("b"), col("c_w").as("c_b"))),
        "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"),
        round(log(col("n").cast("double") * col("c_ab") /
          (col("c_a").cast("double") * col("c_b").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(topN)
  }

  /** The full scored-bigram table of a token-array stream (column
    * `toks`), unlimited — [[phraseScores]] tops it, [[iteratePhrases]]
    * thresholds it. Columns: (bigram, c_ab, score). */
  def scoredBigrams(toks: DataFrame,
      minCount: Long, delta: Double): DataFrame = {
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
  }

  /** Greedy left-to-right phrase rewrite of one token array: each
    * adjacent pair present in `phrases` (as `"w1 w2"`) merges to the
    * single token `w1_w2` — word2vec's between-pass token merge, via
    * the native [[graft.functions.MergeTokens]] expression: one O(len)
    * codegen'd pass with an O(1) hash-set probe per adjacent pair. The
    * phrase set compiles into the expression — a thresholded selection
    * is tens-to-hundreds of entries; at a phrase vocabulary too big
    * for an in-expression set, rewrite via an (id, pos) explode +
    * broadcast join instead (the q108 fused-scan idiom). */
  def mergePhrases(toks: Column, phrases: Seq[String]): Column =
    org.apache.spark.sql.GraftColumn.of(graft.functions.MergeTokens(
      org.apache.spark.sql.GraftColumn.expr(toks), phrases))

  /** The retained composable spelling of [[mergePhrases]] — an
    * interpreted `aggregate` HOF whose membership test is an
    * O(|phrases|)-per-token `array_contains` scan and whose
    * accumulator rebuild is O(len²) array copying (the shape the
    * round-8 winnowing rewrite measured at 100×). Kept as the parity
    * reference the CollocationsSpec equivalence proof runs against;
    * the fold is [[Bpe.applyMerge]]'s (the accumulator's LAST token is
    * tested against the incoming one). */
  private[graft] def mergePhrasesComposable(toks: Column, phrases: Seq[String]): Column =
    aggregate(toks, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 &&
          array_contains(typedlit(phrases),
            concat(element_at(acc, -1), lit(" "), s)),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat_ws("_", element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))

  /** Iterated phrase mining — word2vec's actual procedure (Mikolov et
    * al. 2013 run 2–4 passes, decreasing the threshold, so phrases of
    * phrases emerge: "new_york times" → "new_york_times"): score →
    * select (score ≥ `threshold`) → rewrite the token stream →
    * re-score, `rewritePasses` times; returns the scored-bigram table
    * of the FINAL stream (un-limited — callers top it). Each pass's
    * rewritten stream is materialized behind a [[Barrier]] (two
    * consumers next pass: bigram + unigram counts; `persistPath` is
    * the durable form for production corpus sizes). The selected
    * phrase sets are threshold-bounded, so the per-pass collect is
    * small; everything corpus-sized stays one narrow fold per pass. */
  def iteratePhrases(docs: DataFrame, textCol: String, rewritePasses: Int,
      minCount: Long = 5L, delta: Double = 1.0, threshold: Double = 1.4,
      persistPath: Option[String] = None): DataFrame = {
    require(rewritePasses >= 1)
    var toks = docs.select(Text.tokens(col(textCol)).as("toks"))
    for (pass <- 1 to rewritePasses) {
      val phrases = scoredBigrams(toks, minCount, delta)
        .where(col("score") >= threshold)
        .select(col("bigram")).collect().map(_.getString(0)).toSeq
      toks = Barrier.materialize(
        toks.select(mergePhrases(col("toks"), phrases).as("toks")),
        persistPath.map(d => s"$d/pass$pass"))
    }
    scoredBigrams(toks, minCount, delta)
  }
}
