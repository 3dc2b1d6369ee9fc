package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.CorpusPrep
import graft.sources.Tables

/** Oracle-checked rows for the corpus-preparation operators
  * ([[graft.operators.CorpusPrep]]): chunking, packing, TF-IDF, and
  * deterministic stratified sampling. Every query here has an exact
  * DuckDB twin — the operators are pure relational programs, so the
  * oracle checks the full semantics, not just row counts.
  */
object Prep {

  val defs: Seq[QueryDef] = Seq(

    // ----- Sliding-window chunking (size 32, stride 24) -----
    QueryDef(
      "q53_chunk_sliding",
      (spark, dir) =>
        CorpusPrep.chunkSliding(Tables.load(spark, dir, "documents"),
          "doc_id", "text", size = 32, stride = 24),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w,
                 len(string_split(text, ' ')) AS n
          FROM documents),
        c AS (
          SELECT doc_id, w, n,
                 CASE WHEN n <= 32 THEN 1
                      ELSE CAST(ceil((n - 32)::DOUBLE / 24) AS INT) + 1 END AS n_chunks
          FROM t)
        SELECT doc_id,
               unnest(range(n_chunks))::INT AS chunk_id,
               array_to_string(w[unnest(range(n_chunks))*24 + 1 :
                                 unnest(range(n_chunks))*24 + 32], ' ') AS chunk_text,
               least(32, n - unnest(range(n_chunks))*24)::INT AS chunk_len
        FROM c""")),

    // ----- Sequential packing into 256-token sequences, 8 shards -----
    QueryDef(
      "q54_pack_sequences",
      (spark, dir) =>
        CorpusPrep.packSequential(Tables.load(spark, dir, "documents"),
          "doc_id", "text", budget = 256,
          shardCol = pmod(col("doc_id"), lit(8))),
      Some("""
        WITH t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 CAST(len(string_split(text, ' ')) AS INT) AS n_toks
          FROM documents),
        c AS (
          SELECT doc_id, shard, n_toks,
                 coalesce(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t)
        SELECT doc_id, shard, n_toks,
               CAST(cum_before // 256 AS BIGINT) AS seq_id,
               CAST(cum_before % 256 AS BIGINT) AS offset
        FROM c""")),

    // ----- TF-IDF top-3 terms per document -----
    QueryDef(
      "q55_tfidf_top_terms",
      (spark, dir) =>
        CorpusPrep.tfidfTopTerms(
          Tables.load(spark, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", k = 3),
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        exploded AS (
          SELECT doc_id, len(string_split(text, ' ')) AS doc_len,
                 unnest(string_split(text, ' ')) AS term
          FROM d),
        tf AS (
          SELECT doc_id, term, doc_len, count(*) AS tf_count
          FROM exploded GROUP BY doc_id, term, doc_len),
        df AS (
          SELECT term, count(DISTINCT doc_id) AS df FROM exploded GROUP BY term),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
        scored AS (
          SELECT doc_id, term,
                 round((tf_count::DOUBLE / doc_len)
                       * ln(n_docs::DOUBLE / df), 6) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
        SELECT doc_id, term, rnk, tfidf FROM ranked WHERE rnk <= 3""")),

    // ----- Deterministic stratified sample: 10 docs per length bucket -----
    // The sort key is md5 of the id — a content-independent deterministic
    // "random" order both engines compute identically, so the sample is
    // reproducible across runs, partitionings, and engines. The window's
    // partial top-k keeps the shuffle at k rows per stratum.
    QueryDef(
      "q56_sample_stratified",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val bucket = floor(size(split(col("text"), " ")) / 20).as("len_bucket")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("len_bucket"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        d.select(col("doc_id"), bucket)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(floor(len(string_split(text, ' ')) / 20) AS BIGINT) AS len_bucket
          FROM documents),
        r AS (
          SELECT doc_id, len_bucket,
                 row_number() OVER (PARTITION BY len_bucket
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM t)
        SELECT doc_id, len_bucket, rn FROM r WHERE rn <= 10"""))
  )
}
