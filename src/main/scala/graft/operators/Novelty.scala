package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Per-document n-gram novelty: what fraction of a document's distinct
  * n-grams does the corpus see HERE FIRST?
  *
  * First-seen attribution (by ascending doc id — ingestion order in a
  * crawl) is the standard "marginal contribution" signal in data
  * curation: a document whose n-grams all first appeared in earlier
  * documents adds little to the training distribution even when no
  * single earlier document is a near-duplicate (boilerplate stitched
  * from many sources defeats pairwise dedup but scores near-zero
  * novelty). Selection-by-contribution recipes (SlimPajama-style
  * global dedup, D4's diversify-then-dedup) rank on exactly this.
  *
  * Scale shape: ONE corpus scan and exactly two fixed-width exchanges.
  * The zero-shuffle shingler's (id, shingle) pairs are partitioned by
  * shingle once, where a min-window attaches each shingle's corpus-wide
  * first id in place (the join-back formulation would scan and explode
  * the corpus twice and add a third exchange — its aggregate and probe
  * subtrees differ, so ReuseExchange cannot dedupe them); the per-id
  * re-aggregation is then map-side combined into the id-keyed exchange.
  * Nothing is all-pairs, nothing is key-space broadcast; NoveltySpec
  * pins the one-scan/two-exchange/no-join plan.
  */
object Novelty {

  /** (id, n_sh, n_novel, novelty) per document: of the document's
    * `n_sh` distinct `n`-gram shingles, `n_novel` have their corpus-wide
    * minimum document id equal to this document — first seen here.
    * Documents shorter than `n` tokens have no shingles and are absent
    * (the [[Dedup]] convention). */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(Text.shingles(col("toks"), n)).as("sh"))
      .withColumn("first_id",
        min(col(idCol)).over(Window.partitionBy(col("sh"))))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_sh"),
        sum(when(col("first_id") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_sh"), 6))

  /** The operator's sufficient statistic: (sh, first_id) — each
    * shingle's corpus-wide minimum document id. Mergeable by
    * [[mergeIndex]] (min is associative/commutative), so a streaming
    * ingest maintains it per batch and the corpus is never re-read —
    * the same incremental contract as the DSIR count model and the
    * minhash signature index (StreamsSpec). */
  def firstSeenIndex(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(Text.shingles(col("toks"), n)).as("sh"))
      .groupBy(col("sh")).agg(min(col(idCol)).as("first_id"))

  /** Merge two first-seen indexes: per shingle, the earlier id wins. */
  def mergeIndex(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("sh")).agg(min(col("first_id")).as("first_id"))

  /** Batch novelty against a stored index: a batch document's shingle
    * is novel iff the index has never seen it AND this document is the
    * batch's own first bearer. Under the ingestion-order invariant
    * (index ids < batch ids) the scores equal [[ngramNovelty]] over
    * the whole corpus, restricted to the batch — without re-reading
    * any earlier document (only the fixed-width index joins in;
    * sort-merge on sh at scale, never corpus-sized on the index side's
    * text). */
  def ngramNoveltyAgainstIndex(batch: DataFrame, idCol: String, textCol: String,
      n: Int, index: DataFrame): DataFrame =
    batch.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(Text.shingles(col("toks"), n)).as("sh"))
      .withColumn("batch_first",
        min(col(idCol)).over(Window.partitionBy(col("sh"))))
      .join(index.select(col("sh"), col("first_id")), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_sh"),
        sum(when(col("first_id").isNull && col("batch_first") === col(idCol),
          1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_sh"), 6))
}
