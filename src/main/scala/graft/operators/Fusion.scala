package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): combine
  * rankings from heterogeneous retrieval systems by summing
  * `1/(c + rank)` per document — the standard hybrid-retrieval merge
  * (BM25 ⊕ dense ANN ⊕ priors) that consistently beats learned fusion
  * on its home turf, and in a curation pipeline the way relevance and
  * quality-prior rankings combine into one candidate ordering.
  *
  * Fixed point: each list contributes `round(1e6/(c + rank))` (ONE
  * rounded division of small constants — bit-identical everywhere) and
  * a document's fused score is the BIGINT sum over lists, so fusion is
  * summation-order-independent and engine-stable. Documents absent
  * from a list simply contribute nothing for it (fusion over the union,
  * the paper's convention).
  *
  * Scale shape: input rankings are already top-k-truncated —
  * queries×k rows each — so fusion is a union + one tiny aggregate +
  * per-query window; nothing here is ever corpus-sized. The heavy
  * lifting happened in the upstream retrievers.
  */
object Fusion {

  /** Fuse rankings (each `(query_id, doc_id, rank)`) into a top-`k`
    * fused list per query.
    *
    * @return (query_id, doc_id, rank, rrf_fp) — rank 1..k by
    *         (fused score desc, doc_id asc)
    */
  def rrf(rankings: Seq[DataFrame], k: Int, c: Long = 60L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      round(lit(1e6) / (lit(c).cast("double") + col("rank")), 0)
        .cast("long").as("c")))
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_fp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_fp").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("rrf_fp"))
  }
}
