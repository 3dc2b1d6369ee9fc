package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Text
import graft.operators.{Barrier, Bpe, Components, CorpusPrep, Dedup, Dsir, HashedLr, NgramLm, Quantize, UnigramLm, WordPiece}
import graft.sources.Tables

/** Oracle-checked rows for the corpus-preparation operators
  * ([[graft.operators.CorpusPrep]]): chunking, packing, TF-IDF, and
  * deterministic stratified sampling. Every query here has an exact
  * DuckDB twin — the operators are pure relational programs, so the
  * oracle checks the full semantics, not just row counts.
  */
object Prep {

  /** DuckDB CTE chain replaying [[graft.operators.Bpe]] training for
    * `k` merges: word frequencies → char+`</w>` segmentation → per
    * step, pair counts from the current segmentation, a 1-row argmax
    * (the same (cnt desc, l, r) tie-break learnMerges uses), and the
    * greedy left-to-right fold via `list_reduce` over a space-joined
    * symbol string (symbols never contain spaces — words come from a
    * space split; the accumulator's LAST symbol is compared to the
    * merge's left side, exactly the applyMerge array fold). Used by
    * q107 (the merge table) and q108 (tokenize under seg`k`). */
  /** The shared words → word-frequency → char+`</w>` seg0 header of
    * the merge-loop CTE chains ([[bpeSegSql]]/[[wordPieceSegSql]]). */
  private val segHeaderSql: String = """
        WITH words AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        wf AS (
          SELECT w, CAST(count(*) AS BIGINT) AS f
          FROM words WHERE len(w) > 0 GROUP BY w),
        seg0 AS (
          SELECT w, f,
                 array_to_string(list_append(string_split(w, ''), '</w>'), ' ') AS s
          FROM wf)"""

  /** The greedy left-to-right fold applying step-`i`'s 1-row merge
    * `m$i` to seg`i-1` — shared by both merge-loop chains (see
    * [[bpeSegSql]] for the fold's semantics note). */
  private def segFoldSql(i: Int): String = s"""
        seg$i AS (
          SELECT w, f, list_reduce(string_split(s, ' '),
            (acc, x) -> CASE WHEN regexp_extract(acc, '([^ ]+)${"$"}', 1) = m.l AND x = m.r
              THEN regexp_replace(acc, '[^ ]+${"$"}', '') || m.l || m.r
              ELSE acc || ' ' || x END) AS s
          FROM seg${i - 1} LEFT JOIN m$i m ON true)"""

  /** The per-step pair-count → argmax → greedy-fold CTE chain shared
    * by the char-level ([[bpeSegSql]]) and byte-level
    * ([[bpeByteSegSql]]) merge loops — both consume whatever `seg0`
    * the header defined. */
  private def bpeMergeStepsSql(k: Int): String =
    (1 to k).map { i =>
      s""",
        pc$i AS (
          SELECT syms[j] AS l, syms[j+1] AS r, CAST(sum(f) AS BIGINT) AS cnt
          FROM (SELECT f, string_split(s, ' ') AS syms FROM seg${i - 1}),
               unnest(range(1, len(syms))) AS t(j)
          GROUP BY l, r),
        m$i AS (SELECT l, r, cnt FROM pc$i ORDER BY cnt DESC, l, r LIMIT 1),""" +
        segFoldSql(i)
    }.mkString

  private def bpeSegSql(k: Int): String = segHeaderSql + bpeMergeStepsSql(k)

  /** BYTE-level seg0 header: every word as its UTF-8 bytes rendered as
    * fixed-width uppercase hex pairs (DuckDB's `hex(encode(w))` is
    * byte-identical to Spark's `hex(encode(w, 'UTF-8'))`), plus the
    * hexed end-of-word marker `3C2F773E` (=
    * [[graft.operators.Bpe.ByteEndOfWord]]; hexing the marker too is
    * what makes byte-symbol ordering the exact image of char-symbol
    * ordering — see the byteSegment scaladoc) —
    * [[graft.operators.Bpe.byteSegment]] replayed. */
  private val byteSegHeaderSql: String = """
        WITH words AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        wf AS (
          SELECT w, CAST(count(*) AS BIGINT) AS f
          FROM words WHERE len(w) > 0 GROUP BY w),
        seg0 AS (
          SELECT w, f,
                 array_to_string(list_append(
                   [substr(hx, 2*i-1, 2) for i in range(1, len(hx)//2 + 1)],
                   '3C2F773E'), ' ') AS s
          FROM (SELECT w, f, hex(encode(w)) AS hx FROM wf))"""

  private def bpeByteSegSql(k: Int): String =
    byteSegHeaderSql + bpeMergeStepsSql(k)

  /** q165's foreign-apply fold: step `i` replays trained merge `m$i`
    * over the FOREIGN words' byte segmentation `fseg${i-1}` — the
    * [[segFoldSql]] fold without the frequency column (the foreign
    * side prices distinct words, not the training weights). The LEFT
    * JOIN keeps an exhausted-vocabulary step inert, mirroring
    * training's early stop. */
  private def fsegFoldSql(i: Int): String = s""",
        fseg$i AS (
          SELECT w, list_reduce(string_split(s, ' '),
            (acc, x) -> CASE WHEN regexp_extract(acc, '([^ ]+)${"$"}', 1) = m.l AND x = m.r
              THEN regexp_replace(acc, '[^ ]+${"$"}', '') || m.l || m.r
              ELSE acc || ' ' || x END) AS s
          FROM fseg${i - 1} LEFT JOIN m$i m ON true)"""

  /** DuckDB CTE chain replaying [[graft.operators.WordPiece]] training
    * for `k` merges: the [[bpeSegSql]] loop with the argmax swapped to
    * the likelihood score `cnt / (c(l)·c(r))` — ONE IEEE division of
    * ONE IEEE multiplication of integer counts cast to double, so the
    * score doubles are bit-identical to Spark's and the
    * (score desc, l, r) selection cannot drift. Each step therefore
    * also derives the symbol unigram counts `uc$i` the denominator
    * needs. */
  private def wordPieceSegSql(k: Int): String = {
    val steps = (1 to k).map { i =>
      s""",
        pc$i AS (
          SELECT syms[j] AS l, syms[j+1] AS r, CAST(sum(f) AS BIGINT) AS cnt
          FROM (SELECT f, string_split(s, ' ') AS syms FROM seg${i - 1}),
               unnest(range(1, len(syms))) AS t(j)
          GROUP BY l, r),
        uc$i AS (
          SELECT sym, CAST(sum(f) AS BIGINT) AS c
          FROM (SELECT f, unnest(string_split(s, ' ')) AS sym FROM seg${i - 1})
          GROUP BY sym),
        m$i AS (
          SELECT p.l, p.r, p.cnt,
                 CAST(p.cnt AS DOUBLE) / (CAST(ul.c AS DOUBLE) * CAST(ur.c AS DOUBLE)) AS score
          FROM pc$i p JOIN uc$i ul ON ul.sym = p.l JOIN uc$i ur ON ur.sym = p.r
          ORDER BY score DESC, p.l, p.r LIMIT 1),""" +
        segFoldSql(i)
    }.mkString
    segHeaderSql + steps
  }

  /** DuckDB replay of one [[graft.operators.UnigramLm]] hard-EM step:
    * word frequencies → substring seed pieces (minCount-pruned, char
    * floor) → fixed-point micro-nat scores (the ONE double expression,
    * mirrored verbatim) → a chained-CTE Viterbi DP over word positions
    * (per step: extend the per-word best paths ending `maxPieceLen`
    * back, pick max integer score with the lexicographically-smallest
    * path tie-break — exactly `viterbiPath`'s rule) → piece counts
    * along the best paths. The chain has `maxWordLen` steps, so the
    * word-length cap that bounds the Spark DP also bounds the SQL. */
  private def unigramDpSql(maxWordLen: Int, maxPieceLen: Int, minCount: Int): String = {
    val header = s"""
        WITH words AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        wf AS MATERIALIZED (
          SELECT w, CAST(count(*) AS BIGINT) AS f
          FROM words WHERE len(w) > 0 AND len(w) <= $maxWordLen GROUP BY w),
        sub AS (
          SELECT substr(w, s, pl) AS piece, CAST(sum(f) AS BIGINT) AS c
          FROM wf,
               unnest(range(1, len(w) + 1)) AS t1(s),
               unnest(range(1, $maxPieceLen + 1)) AS t2(pl)
          WHERE s + pl - 1 <= len(w)
          GROUP BY piece),
        kept AS MATERIALIZED (
          SELECT piece, c FROM sub WHERE c >= $minCount OR len(piece) = 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM kept),
        pieces AS MATERIALIZED (
          SELECT piece,
                 CAST(round(ln(CAST(c AS DOUBLE) / t) * 1000000) AS BIGINT) AS lp
          FROM kept CROSS JOIN tot),
        dp0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS score, '' AS path FROM wf)"""
    val steps = (1 to maxWordLen).map { j =>
      val cands = (math.max(0, j - maxPieceLen) until j).map { i =>
        s"""
          SELECT d.w, d.score + p.lp AS score,
                 CASE WHEN d.path = '' THEN p.piece
                      ELSE d.path || ' ' || p.piece END AS path
          FROM dp$i d JOIN pieces p ON p.piece = substr(d.w, ${i + 1}, ${j - i})
          WHERE len(d.w) >= $j"""
      }.mkString(" UNION ALL ")
      s""",
        dp$j AS MATERIALIZED (
          SELECT w, score, path FROM (
            SELECT w, score, path,
                   row_number() OVER (PARTITION BY w
                                      ORDER BY score DESC, path) AS rn
            FROM ($cands))
          WHERE rn = 1)"""
    }.mkString
    val viterbi = (1 to maxWordLen)
      .map(j => s"SELECT w, path FROM dp$j WHERE len(w) = $j")
      .mkString(" UNION ALL ")
    header + steps + s""",
        viterbi AS MATERIALIZED ($viterbi)"""
  }

  /** q121's oracle middle: greedy longest-match-first segmentation of
    * an `aw` CTE of (≤16-char) words — THE CALLER DEFINES `aw` before
    * splicing this in — against seg5's piece inventory: the WordPiece
    * RUNTIME algorithm, replayed as a `steps`-step frontier chain
    * (each step advances one greedy piece; pieces are ≥1 char, so
    * word+`</w>` ≤ 20 chars terminates in 20 steps). One active row
    * per word, so the longest-match row_number is deterministic (two
    * distinct pieces cannot match the same position at the same
    * length); a position with NO matching piece collapses the word to
    * '[UNK]' (pos jumps to n — the carry branch then preserves it).
    * MATERIALIZED per the q112 lesson. */
  private def maxMatchSql(steps: Int): String = {
    val chain = (1 to steps).map { j =>
      s""",
        mm$j AS MATERIALIZED (
          SELECT w, s16, n, pos, path FROM mm${j - 1} WHERE pos >= n
          UNION ALL
          SELECT w, s16, n, pos + len(piece) AS pos,
                 CASE WHEN path = '' THEN piece
                      ELSE path || ' ' || piece END AS path
          FROM (
            SELECT m.w, m.s16, m.n, m.pos, m.path, p.piece,
                   row_number() OVER (PARTITION BY m.w
                                      ORDER BY len(p.piece) DESC) AS rn
            FROM mm${j - 1} m
            JOIN inv p ON p.piece = substr(m.s16, m.pos + 1, len(p.piece))
            WHERE m.pos < m.n) x WHERE rn = 1
          UNION ALL
          SELECT m.w, m.s16, m.n, m.n AS pos, '[UNK]' AS path
          FROM mm${j - 1} m
          WHERE m.pos < m.n AND NOT EXISTS (
            SELECT 1 FROM inv p
            WHERE p.piece = substr(m.s16, m.pos + 1, len(p.piece))))"""
    }.mkString
    s""",
        inv AS MATERIALIZED (
          SELECT DISTINCT unnest(string_split(s, ' ')) AS piece FROM seg5),
        mm0 AS MATERIALIZED (
          SELECT w, w || '</w>' AS s16, len(w) + 4 AS n,
                 0 AS pos, '' AS path FROM aw)""" + chain
  }

  /** q112's tail: E-step piece counts along the Viterbi paths. */
  private def unigramEmSql(chain: String): String = chain + s""",
        em AS (
          SELECT pc AS piece, CAST(sum(f) AS BIGINT) AS c
          FROM (SELECT w, unnest(string_split(path, ' ')) AS pc FROM viterbi) s
          JOIN wf USING (w)
          GROUP BY pc)
        SELECT piece, c FROM em ORDER BY c DESC, piece LIMIT 50"""

  /** q114's tail: per-document token pricing under the trained
    * segmentation — q108's join, vocab = the Viterbi table. */
  private def unigramTokenizeSql(chain: String): String = chain + s""",
        vocab AS (
          SELECT w, CAST(len(string_split(path, ' ')) AS BIGINT) AS n_sub
          FROM viterbi),
        dw AS (SELECT doc_id, w FROM words WHERE len(w) > 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens
        FROM dw JOIN vocab USING (w) GROUP BY doc_id"""

  /** q115's tail: the segmented token stream — q109's positioned
    * reassembly, vocab = the Viterbi table. */
  private def unigramEncodeSql(chain: String): String = chain + s""",
        vocab AS (
          SELECT w, path AS sub,
                 CAST(len(string_split(path, ' ')) AS BIGINT) AS n_sub
          FROM viterbi),
        dw AS (
          SELECT doc_id, ws[i] AS w, i AS pos
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               unnest(range(1, len(ws)+1)) AS t(i)
          WHERE len(ws[i]) > 0)
        SELECT doc_id, string_agg(sub, ' ' ORDER BY pos) AS sp_text,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens
        FROM dw JOIN vocab USING (w) GROUP BY doc_id"""

  /** One trained 5-merge BPE vocabulary per (session, sf-dir), shared
    * by the whole q107–q109 family — the production shape: a tokenizer
    * is trained ONCE and applied many times, so tokenize/encode
    * consume the same trained segmentation instead of each rerunning
    * the merge loop (the round-8 finding: q108's cost was dominated by
    * its private retrain). The cached frame is either a local relation
    * (the hybrid driver-side loop — the common case) or a barriered
    * distributed table, so reuse costs no recompute either way;
    * Verify/Bench each construct one session, so each process trains
    * exactly once. */
  private val bpeShared =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String),
             (Seq[(String, String, Long)], org.apache.spark.sql.DataFrame)]

  private def bpeTrained(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(String, String, Long)], org.apache.spark.sql.DataFrame) =
    bpeShared.getOrElseUpdate((spark, dir),
      Bpe.train(Tables.load(spark, dir, "documents"), "text", k = 5))

  /** ONE pair-derivation shared by q168 and q169 (the capstone
    * composes exactly q168's rendered examples — a private copy in
    * each query could drift and silently break that claim):
    * completion-format SFT pairs — prompt = the first 20 tokens,
    * response = the remainder (length bound = size(w), mirroring the
    * oracle's unbounded w[21:len(w)] slice exactly), docs with ≥ 30
    * tokens. */
  private def sftPairs(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 30)
      .select(col("doc_id"),
        array_join(slice(col("w"), lit(1), lit(20)), " ").as("prompt"),
        array_join(slice(col("w"), lit(21), size(col("w"))), " ").as("response"))

  /** One trained 5-merge BYTE-level BPE vocabulary per (session,
    * sf-dir) — the [[bpeTrained]] pattern for the no-UNK production
    * variant (q165). */
  private val bpeBytesShared =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String),
             (Seq[(String, String, Long)], org.apache.spark.sql.DataFrame)]

  private def bpeBytesTrained(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(String, String, Long)], org.apache.spark.sql.DataFrame) =
    bpeBytesShared.getOrElseUpdate((spark, dir),
      Bpe.trainBytes(Tables.load(spark, dir, "documents"), "text", k = 5))

  /** One trained 5-merge WordPiece vocabulary per (session, sf-dir) —
    * the [[bpeTrained]] pattern for the third subword family. */
  private val wpShared =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String),
             (Seq[(String, String, Long, Double)], org.apache.spark.sql.DataFrame)]

  private def wpTrained(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(String, String, Long, Double)], org.apache.spark.sql.DataFrame) =
    wpShared.getOrElseUpdate((spark, dir),
      WordPiece.train(Tables.load(spark, dir, "documents"), "text", k = 5))


  /** One Viterbi-segmented unigram-LM vocabulary per (session, sf-dir)
    * — the q114/q115 application queries consume the same trained
    * segmentation q112 counts over (the [[bpeTrained]] pattern:
    * tokenizers are trained once and applied many times). Materialized
    * so the three consumers share one DP pass. */
  private val unigramShared =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String),
             org.apache.spark.sql.DataFrame]

  private def unigramSegments(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    unigramShared.getOrElseUpdate((spark, dir), {
      val d = Tables.load(spark, dir, "documents")
      val wf = UnigramLm.wordTable(d, "text", maxWordLen = 16)
      val pieces = UnigramLm.quantize(
        UnigramLm.seedPieces(wf, maxPieceLen = 4, minCount = 5L))
      Barrier.materialize(UnigramLm.viterbiSegments(wf, pieces, maxPieceLen = 4))
    })

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
        val w = Window.partitionBy(col("len_bucket"))
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
        SELECT doc_id, len_bucket, rn FROM r WHERE rn <= 10""")),

    // ----- Composed curation pipeline: the north-star end-to-end -----
    // quality-score → language filter → exact dedup (min-id survivor
    // via row_number window) → sliding-window chunking. Every stage is
    // one of the already-proven operators; the oracle checks the
    // COMPOSITION — filter interplay, dedup survivor choice, chunk
    // arithmetic — not just the parts. Plan shape: scan → project
    // (scores) → filter → one dedup shuffle (content_hash window) →
    // narrow chunk generator. At 100 TB: the near-dup stage (q33's
    // MinHash) slots between dedup and chunking — engine-specific, so
    // the oracle-checked composition stops at exact dedup.
    QueryDef(
      "q57_curation",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val scored = d.select(col("doc_id"), col("text"),
          Text.langId(col("text")).as("lang_id"),
          Text.qualityScore(col("text")).as("quality"),
          Text.contentHash(col("text")).as("content_hash"))
        val kept = scored.filter(col("lang_id") === "en" && col("quality") >= 0.72)
        // keep min(doc_id) per content_hash via ONE window pass — the
        // groupBy+semi-join formulation re-evaluates the regex-heavy
        // scoring projection on BOTH join inputs (Spark plans are trees,
        // not DAGs: an unpersisted frame used twice is computed twice)
        // and costs a second shuffle. Same survivor set either way.
        val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
        val deduped = kept
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        CorpusPrep.chunkSliding(deduped, "doc_id", "text", size = 32, stride = 24)
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, text,
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, text, norm, toks,
                 len(list_intersect(toks, ${duckList(Text.StopEn)})) AS s_en,
                 len(list_intersect(toks, ${duckList(Text.StopDe)})) AS s_de,
                 len(list_intersect(toks, ${duckList(Text.StopEs)})) AS s_es,
                 len(list_intersect(toks, ${duckList(Text.StopFr)})) AS s_fr,
                 len(toks) AS n_tokens,
                 length(text) AS n_chars
          FROM t
        ), scored AS (
          SELECT doc_id, text, md5(norm) AS content_hash,
                 CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                      WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
                      WHEN s_es > s_en AND s_es > s_fr THEN 'es'
                      WHEN s_fr > s_en THEN 'fr'
                      WHEN s_en > 0 THEN 'en'
                      ELSE 'und' END AS lang_id,
                 round(
                   least(1.0, (s_en+s_de+s_es+s_fr)::DOUBLE * 3.0 / greatest(n_tokens::DOUBLE, 1.0)) * 0.2
                   + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE / greatest(n_chars::DOUBLE, 1.0) * 0.4
                   + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2
                   + (CASE WHEN n_chars::DOUBLE / greatest(n_tokens::DOUBLE, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
                 , 6) AS quality
          FROM s
        ), kept AS (
          SELECT * FROM scored WHERE lang_id = 'en' AND quality >= 0.72
        ), surv AS (
          SELECT content_hash, min(doc_id) AS doc_id FROM kept GROUP BY 1
        ), ded AS (
          SELECT k.doc_id, k.text FROM kept k JOIN surv USING (content_hash, doc_id)
        ), c AS (
          SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n,
                 CASE WHEN len(string_split(text, ' ')) <= 32 THEN 1
                      ELSE CAST(ceil((len(string_split(text, ' ')) - 32)::DOUBLE / 24) AS INT) + 1 END AS n_chunks
          FROM ded)
        SELECT doc_id,
               unnest(range(n_chunks))::INT AS chunk_id,
               array_to_string(w[unnest(range(n_chunks))*24 + 1 :
                                 unnest(range(n_chunks))*24 + 32], ' ') AS chunk_text,
               least(32, n - unnest(range(n_chunks))*24)::INT AS chunk_len
        FROM c"""))
  )


  /** q75/q80's shared tail: exact dedup (min doc_id per content_hash)
    * → MinHash near-dup pairs → connected components → keep each
    * group's min doc_id → sliding-window chunking. Input needs
    * (doc_id, text, content_hash).
    *
    * Materializes the deduped corpus ONCE: five downstream branches
    * reference it (signature path, two verification joins, the
    * group-id spine, the survivor join), and Spark plans are trees —
    * unmaterialized, the regex-heavy scoring pass would re-run per
    * branch. Real curation pipelines persist exactly this boundary
    * before the near-dup stage; the checkpoint cost is inside the
    * benched region, so the number stays honest. `persistPath` picks
    * the durable parquet form of the barrier (see [[Barrier]]) — the
    * in-suite queries run the local checkpoint form. */
  private def neardupChunkTail(kept: org.apache.spark.sql.DataFrame,
      persistPath: Option[String] = None) = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val ded = Barrier.materialize(
      kept.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("doc_id"), col("text")),
      persistPath)
    val pairs = Dedup.minhashNearDups(ded, "doc_id", "text",
      n = 3, k = 64, bands = 16, tau = 0.8).select(col("a"), col("b"))
    val groups = Components.dedupGroups(ded.select(col("doc_id")), pairs)
    val survivors = ded.join(
      groups.filter(col("doc_id") === col("keep_id")).select(col("doc_id")),
      "doc_id")
    CorpusPrep.chunkSliding(survivors, "doc_id", "text", size = 32, stride = 24)
  }

  val defs2: Seq[QueryDef] = Seq(

    // ----- Unigram log-probability scoring (perplexity-style filter) -----
    // The CCNet-shaped quality signal: score each document by the mean
    // log-probability of its tokens under the corpus's own unigram
    // model. Two shuffles build the model (term counts; corpus total is
    // a 1-row broadcast); scoring joins tokens to the model on term —
    // AQE broadcasts a small vocabulary, sort-merges a large one. Docs
    // full of rare/garbage tokens score low — the filter knob.
    QueryDef(
      "q67_unigram_logprob",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val toks = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        val freqs = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
        val total = freqs.agg(sum(col("tf")).as("corpus_n"))
        toks.join(freqs, "term").crossJoin(broadcast(total))
          .groupBy(col("doc_id"))
          .agg(
            round(avg(log(col("tf").cast("double") / col("corpus_n"))), 6)
              .as("mean_logp"),
            count(lit(1)).as("n_toks"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        freqs AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
        total AS (SELECT sum(tf) AS corpus_n FROM freqs)
        SELECT doc_id,
               round(avg(ln(tf::DOUBLE / corpus_n)), 6) AS mean_logp,
               count(*) AS n_toks
        FROM toks JOIN freqs USING (term) CROSS JOIN total
        GROUP BY doc_id""")),

    // ----- PII pattern scan (email / phone / long digit runs) -----
    // The redaction-precursor pass: count pattern hits per document so
    // a downstream filter or masker can act. Pure narrow projection —
    // regex CPU, linear scan, no shuffle. The synthetic corpus contains
    // no PII, so both engines first plant identical deterministic PII
    // in every 7th document — the scan must find exactly that.
    QueryDef(
      "q68_pii_scan",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val augmented = concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com or 555-123-4567 ref 98765432")))
            .otherwise(lit("")))
        d.select(col("doc_id"), augmented.as("t"))
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("t"),
              lit("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"), lit(0)))
              .as("n_email"),
            size(regexp_extract_all(col("t"),
              lit("\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"), lit(0))).as("n_phone"),
            size(regexp_extract_all(col("t"), lit("\\d{6,}"), lit(0)))
              .as("n_digit_runs"))
          .withColumn("flagged",
            col("n_email") + col("n_phone") + col("n_digit_runs") > 0)
      },
      Some("""
        WITH aug AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || doc_id ||
                        '@example.com or 555-123-4567 ref 98765432'
                   ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_email,
               CAST(len(regexp_extract_all(t,
                 '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')) AS INT) AS n_phone,
               CAST(len(regexp_extract_all(t, '\d{6,}')) AS INT) AS n_digit_runs,
               len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
                 + len(regexp_extract_all(t, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b'))
                 + len(regexp_extract_all(t, '\d{6,}')) > 0 AS flagged
        FROM aug""")),

    // ----- Source-mixture (temperature) sampling -----
    // The data-mixing step of a training pipeline: per-source quotas
    // ∝ n_s^α (α = 0.5 flattens the source distribution — big sources
    // down-weighted, rare sources kept), documents chosen per quota in
    // deterministic md5 order (q56's sampling idiom). Quotas come from
    // a window over the per-source COUNT aggregate (a handful of rows);
    // the double weight is rounded to 6 digits before floor so a
    // last-ulp summation difference between engines cannot flip the
    // integer boundary. The per-source row_number sort is exact-quota
    // semantics; at 100 TB with giant sources you'd trade exactness for
    // a threshold filter on the hash (no sort) — documented tradeoff,
    // same operator family.
    QueryDef(
      "q72_mixture_sample",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        CorpusPrep.temperatureSample(d, "doc_id", "source",
            alpha = 0.5, budget = 200)
          .select(col("doc_id"), col("source"), col("rk"))
      },
      Some("""
        WITH c AS (
          SELECT source, count(*) AS n_s FROM documents GROUP BY source
        ), q AS (
          SELECT source,
                 least(n_s, CAST(floor(round(
                   200 * pow(n_s, 0.5) / sum(pow(n_s, 0.5)) OVER (), 6))
                   AS BIGINT)) AS t_s
          FROM c
        ), r AS (
          SELECT doc_id, source,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
          FROM documents
        )
        SELECT r.doc_id, r.source, r.rk
        FROM r JOIN q USING (source)
        WHERE r.rk <= q.t_s""")),

    // ----- Mixture sampling, hash-threshold form (the giant-source path) -----
    // q72's scale variant as a declared, oracle-checked query: same
    // n_s^α quotas, but membership is a FILTER (accept iff id-hash <
    // per-source rate) — no per-source sort anywhere in the plan, so a
    // 10-billion-row source costs one narrow pass. The uniform here is
    // md5-derived (15 hex digits → [0,1)) so DuckDB reproduces the
    // exact accepted set; the operator's default (xxhash64) is the
    // cheaper production hash, contract-graded in CorpusPrepSpec.
    QueryDef(
      "q78_mixture_threshold",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val u = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").cast("double") / lit(math.pow(2.0, 60))
        CorpusPrep.mixtureSampleThreshold(d, "doc_id", "source",
            alpha = 0.5, budget = 200, uniform = Some(u))
          .select(col("doc_id"), col("source"))
      },
      Some("""
        WITH c AS (
          SELECT source, count(*) AS n_s FROM documents GROUP BY source
        ), r AS (
          SELECT source,
                 round(least(1.0,
                   200 * pow(n_s, 0.5) / sum(pow(n_s, 0.5)) OVER () / n_s), 6) AS rate
          FROM c
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN r USING (source)
        WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)::DOUBLE
                / pow(2, 60) < r.rate""")),

    // ----- Benchmark decontamination: cross-corpus n-gram overlap -----
    // The eval-set hygiene step: flag corpus docs sharing ≥2 distinct
    // trigram shingles with any benchmark doc (here: a deterministic
    // doc_id % 97 slice standing in for an eval set). Inverted-index
    // join with the benchmark side BROADCAST — the corpus is one narrow
    // pass; nothing all-pairs, no corpus shuffle.
    QueryDef(
      "q73_decontaminate",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val bench = d.filter(col("doc_id") % 97 === 0)
        Dedup.crossCorpusOverlap(d, bench, "doc_id", "text",
          n = 3, minCommon = 2L)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in range(1, len(w) - 1)]) AS s
          FROM toks WHERE len(w) >= 3
        ), bench AS (
          SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 97 = 0
        )
        SELECT c.doc_id, b.bench_id,
               CAST(len(list_intersect(c.s, b.s)) AS BIGINT) AS n_common
        FROM sh c JOIN bench b ON c.doc_id <> b.bench_id
        WHERE len(list_intersect(c.s, b.s)) >= 2""")),

    // ----- PII redaction: q68's scan, acted on -----
    // Same planted PII and patterns as q68, but the text is REWRITTEN:
    // emails → [EMAIL], phones → [PHONE], long digit runs → [NUM], in
    // that order (later patterns never match inside earlier
    // placeholders). Narrow projection — regex CPU, no shuffle.
    QueryDef(
      "q74_pii_redact",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val aug = concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com or 555-123-4567 ref 98765432")))
            .otherwise(lit("")))
        val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
        val phone = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"
        val digits = "\\d{6,}"
        d.select(col("doc_id"), aug.as("t"))
          .select(col("doc_id"),
            regexp_replace(
              regexp_replace(
                regexp_replace(col("t"), email, "[EMAIL]"),
                phone, "[PHONE]"),
              digits, "[NUM]").as("redacted"),
            (size(regexp_extract_all(col("t"), lit(email), lit(0)))
              + size(regexp_extract_all(col("t"), lit(phone), lit(0)))
              + size(regexp_extract_all(col("t"), lit(digits), lit(0))))
              .as("n_redactions"))
      },
      Some("""
        WITH aug AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || doc_id ||
                        '@example.com or 555-123-4567 ref 98765432'
                   ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
                   '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '[PHONE]', 'g'),
                 '\d{6,}', '[NUM]', 'g') AS redacted,
               CAST(len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
                 + len(regexp_extract_all(t, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b'))
                 + len(regexp_extract_all(t, '\d{6,}')) AS INT) AS n_redactions
        FROM aug""")),

    // ----- URL/domain filtering + canonical-URL dedup report -----
    // The C4/RefinedWeb front gate this suite lacked: per-domain
    // document counts, canonical-URL dedup (query strings stripped —
    // mirrors/reposts share a canonical URL), and a domain-blocklist
    // flag. The corpus has no URL column, so URLs are planted
    // deterministically like q74 plants PII — doc_id % 400 keys the
    // path so re-crawls (doc_id ≥ 400) mirror earlier URLs exactly,
    // exercising the dedup signal. Mechanics under oracle: native
    // parse_url host extraction (codegen'd; the oracle re-spells it
    // as a regexp), canonical-form regexp, blocklist LEFT broadcast
    // join (blocklists are thousands of domains — always
    // broadcast-sized), per-domain rollup. One corpus scan, one
    // shuffle on host (37 groups, map-side combined); the distinct
    // URL count is the standard two-phase partial distinct.
    QueryDef(
      "q94_url_filter",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val withUrl = d.select(col("doc_id"),
          concat(lit("https://site"),
            (col("doc_id") % 400 % 37).cast("string"),
            lit(".example/p/"), (col("doc_id") % 400).cast("string"),
            lit("?ref=feed")).as("url"))
        val hosts = withUrl.select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          regexp_replace(col("url"), "\\?.*$", "").as("url_norm"))
        val block = spark.range(1)
          .select(explode(typedLit(Seq("site3.example", "site17.example",
            "site29.example"))).as("host"), lit(true).as("blocked"))
        hosts.join(broadcast(block), Seq("host"), "left")
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("url_norm")).as("n_urls"),
            coalesce(max(col("blocked")), lit(false)).as("blocked"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
                 concat('https://site', doc_id % 400 % 37, '.example/p/',
                        doc_id % 400, '?ref=feed') AS url
          FROM documents
        ), h AS (
          SELECT doc_id,
                 regexp_extract(url, 'https?://([^/]+)/', 1) AS host,
                 regexp_replace(url, '\?.*$', '') AS url_norm
          FROM u
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT url_norm) AS BIGINT) AS n_urls,
               host IN ('site3.example', 'site17.example', 'site29.example')
                 AS blocked
        FROM h GROUP BY 1""")),

    // ----- Deterministic epoch shuffle (seeded global ordering) -----
    // The pre-training shuffle: every epoch assigns each document a
    // seeded pseudorandom position (md5 of seed + id), reproducible
    // across runs and engines — [[CorpusPrep.epochShuffle]], with the
    // shard prefix width derived from the corpus size
    // ([[CorpusPrep.shardWidthFor]]; the result is width-independent,
    // pinned in EpochShuffleSpec). The only non-partitioned window in
    // the plan runs over the 16^width aggregate shard counts, like
    // q71/q72's quota windows. The oracle IS the naive
    // single-partition row_number() spelling — fine at DuckDB's scale,
    // and the hash-match proves the distributed decomposition exact.
    QueryDef(
      "q95_epoch_shuffle",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        graft.operators.CorpusPrep.epochShuffle(d, "doc_id", "epoch42:")
      },
      Some("""
        SELECT doc_id,
               row_number() OVER (ORDER BY md5(concat('epoch42:', doc_id)),
                                  doc_id) AS shuffle_pos
        FROM documents""")),

    // ----- Full curation incl. NEAR-dup grouping, oracle-checked -----
    // q57 stops at exact dedup because its oracle predates q69's
    // recursive-CTE components. This is the complete stack under ONE
    // oracle: quality → language → exact dedup (window min-id) →
    // MinHash near-dup pairs → connected components → keep each
    // group's min doc_id → sliding-window chunking. The DuckDB twin
    // recomputes the pair set exactly (all-pairs Jaccard) and resolves
    // groups with recursive label propagation, so the hash-match
    // verifies the ENTIRE composition including the LSH pair recall
    // and the group survivor choice. Scale shape: q57's narrow scoring
    // pass + one window shuffle, q33's banded equi-joins, q69's
    // O(log n) component rounds, then the zero-shuffle chunk generator.
    QueryDef(
      "q75_curation_neardup",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val scored = d.select(col("doc_id"), col("text"),
          Text.langId(col("text")).as("lang_id"),
          Text.qualityScore(col("text")).as("quality"),
          Text.contentHash(col("text")).as("content_hash"))
        val kept = scored.filter(col("lang_id") === "en" && col("quality") >= 0.72)
        neardupChunkTail(kept)
      },
      Some(s"""
        WITH RECURSIVE t AS (
          SELECT doc_id, text,
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, text, norm, toks,
                 len(list_intersect(toks, ${duckList(Text.StopEn)})) AS s_en,
                 len(list_intersect(toks, ${duckList(Text.StopDe)})) AS s_de,
                 len(list_intersect(toks, ${duckList(Text.StopEs)})) AS s_es,
                 len(list_intersect(toks, ${duckList(Text.StopFr)})) AS s_fr,
                 len(toks) AS n_tokens,
                 length(text) AS n_chars
          FROM t
        ), scored AS (
          SELECT doc_id, text, md5(norm) AS content_hash,
                 CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                      WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
                      WHEN s_es > s_en AND s_es > s_fr THEN 'es'
                      WHEN s_fr > s_en THEN 'fr'
                      WHEN s_en > 0 THEN 'en'
                      ELSE 'und' END AS lang_id,
                 round(
                   least(1.0, (s_en+s_de+s_es+s_fr)::DOUBLE * 3.0 / greatest(n_tokens::DOUBLE, 1.0)) * 0.2
                   + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE / greatest(n_chars::DOUBLE, 1.0) * 0.4
                   + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2
                   + (CASE WHEN n_chars::DOUBLE / greatest(n_tokens::DOUBLE, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
                 , 6) AS quality
          FROM s
        ), kept AS (
          SELECT * FROM scored WHERE lang_id = 'en' AND quality >= 0.72
        ), surv AS (
          SELECT content_hash, min(doc_id) AS doc_id FROM kept GROUP BY 1
        ), ded AS (
          SELECT k.doc_id, k.text FROM kept k JOIN surv USING (content_hash, doc_id)
        ), dt AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w2
          FROM ded
        ), dsh AS (
          SELECT doc_id,
                 list_distinct([w2[i] || ' ' || w2[i+1] || ' ' || w2[i+2]
                                for i in range(1, len(w2) - 1)]) AS sgl
          FROM dt WHERE len(w2) >= 3
        ), dpost AS MATERIALIZED (
          SELECT doc_id, len(sgl) AS sz, unnest(sgl) AS g FROM dsh
        ), pairs AS MATERIALIZED (
          -- inverted-index spelling (equi-join on shingle, count
          -- shared): same integers as all-pairs list_intersect at
          -- Σ df² cost instead of n²·|s| — keeps the sf0.1 sweep
          -- tractable (the r10 exclusion this closes)
          SELECT a, b FROM (
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS c,
                   any_value(a.sz) AS sza, any_value(b.sz) AS szb
            FROM dpost a JOIN dpost b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          WHERE c::DOUBLE / (sza + szb - c) >= 0.8
        ), edges AS (
          SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM ded
          UNION
          SELECT e.a AS node, r.lbl FROM reach r JOIN edges e ON e.b = r.node
        ), comp AS (
          SELECT node AS doc_id, min(lbl) AS keep FROM reach GROUP BY node
        ), fin AS (
          SELECT d.doc_id, d.text FROM ded d
          JOIN comp c ON d.doc_id = c.doc_id AND d.doc_id = c.keep
        ), c AS (
          SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n,
                 CASE WHEN len(string_split(text, ' ')) <= 32 THEN 1
                      ELSE CAST(ceil((len(string_split(text, ' ')) - 32)::DOUBLE / 24) AS INT) + 1 END AS n_chunks
          FROM fin)
        SELECT doc_id,
               unnest(range(n_chunks))::INT AS chunk_id,
               array_to_string(w[unnest(range(n_chunks))*24 + 1 :
                                 unnest(range(n_chunks))*24 + 32], ' ') AS chunk_text,
               least(32, n - unnest(range(n_chunks))*24)::INT AS chunk_len
        FROM c""")),

    // ----- q75 under the FULL Gopher gate: signals compose end-to-end -----
    // Identical pipeline to q75 with the quality stage extended by
    // q77's signal battery (both engines): the extra conjuncts prune
    // BEFORE the near-dup stage, so at scale the cheap zero-shuffle
    // gate cuts the corpus ahead of the only shuffling stages. The
    // oracle recomputes every signal and the whole tail, so the
    // hash-match proves the signals compose with exact dedup, LSH
    // near-dup, components, and chunking — not just in isolation (q77).
    QueryDef(
      "q80_curation_gopher",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        // stage toks, then ng/ls, per the HOF binding rule (Text.shingles)
        val staged = d
          .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("text"), col("toks"),
            Text.wordNgrams(col("toks"), 2).as("ng"),
            Text.tokenChunks(col("toks"), 8).as("ls"))
        // The scored table is MATERIALIZED before the gate (see
        // Barrier for why, and for the durable persistPath form a
        // cluster run would pick). Without the barrier, predicate
        // pushdown substitutes each gate conjunct's alias definition
        // below the projection — 8 conjuncts × the full
        // tokenize/ngram/chunk tree, per row, and the lambda-HOF
        // signals are CodegenFallback so no codegen CSE ever
        // deduplicates them (measured 23 s vs ~5 s at sf0.1).
        // Annotate-once-then-gate is also the real pipeline shape:
        // signal tables are persisted for threshold tuning, and the
        // barrier keeps the corpus pass at exactly one.
        val scored = Barrier.materialize(staged.select(col("doc_id"), col("text"),
          Text.langId(col("text"), col("toks")).as("lang_id"),
          Text.qualityScore(col("text"), col("toks")).as("quality"),
          Text.contentHash(col("text")).as("content_hash"),
          round(Text.duplicateLineFraction(col("ls")), 6).as("dup_line_frac"),
          round(Text.topNgramShare(col("ng")), 6).as("top2gram_share"),
          round(Text.symbolToWordRatio(col("text"), col("toks")), 6).as("symbol_ratio"),
          round(Text.stopwordFraction(col("toks")), 6).as("stop_frac"),
          round(Text.meanWordLength(col("toks")), 6).as("mean_word_len"),
          round(Text.alphaTokenFraction(col("toks")), 6).as("alpha_frac")))
        val kept = scored.filter(
          col("lang_id") === "en" && col("quality") >= 0.72 &&
          col("dup_line_frac") <= 0.3 && col("top2gram_share") <= 0.2 &&
          col("symbol_ratio") <= 0.1 && col("stop_frac") >= 0.05 &&
          col("mean_word_len").between(3.0, 10.0) && col("alpha_frac") >= 0.8)
        neardupChunkTail(kept)
      },
      Some(s"""
        WITH RECURSIVE t AS (
          SELECT doc_id, text,
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, text, norm, toks,
                 [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS ng,
                 [array_to_string(toks[(i-1)*8+1 : i*8], ' ')
                  for i in range(1, CAST(ceil(len(toks) / 8.0) AS BIGINT) + 1)] AS ls,
                 len(list_intersect(toks, ${duckList(Text.StopEn)})) AS s_en,
                 len(list_intersect(toks, ${duckList(Text.StopDe)})) AS s_de,
                 len(list_intersect(toks, ${duckList(Text.StopEs)})) AS s_es,
                 len(list_intersect(toks, ${duckList(Text.StopFr)})) AS s_fr,
                 len(toks) AS n_tokens,
                 length(text) AS n_chars
          FROM t
        ), scored AS (
          SELECT doc_id, text, md5(norm) AS content_hash,
                 CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                      WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
                      WHEN s_es > s_en AND s_es > s_fr THEN 'es'
                      WHEN s_fr > s_en THEN 'fr'
                      WHEN s_en > 0 THEN 'en'
                      ELSE 'und' END AS lang_id,
                 round(
                   least(1.0, (s_en+s_de+s_es+s_fr)::DOUBLE * 3.0 / greatest(n_tokens::DOUBLE, 1.0)) * 0.2
                   + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE / greatest(n_chars::DOUBLE, 1.0) * 0.4
                   + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2
                   + (CASE WHEN n_chars::DOUBLE / greatest(n_tokens::DOUBLE, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
                 , 6) AS quality,
                 round(CASE WHEN len(ls) = 0 THEN 0.0
                       ELSE (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls) END, 6) AS dup_line_frac,
                 round(CASE WHEN len(ng) = 0 THEN 0.0
                       ELSE list_max([len(list_filter(ng, x -> x = g))
                                      for g in list_distinct(ng)])::DOUBLE / len(ng) END, 6) AS top2gram_share,
                 round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
                       / greatest(len(toks), 1), 6) AS symbol_ratio,
                 round(CASE WHEN len(toks) = 0 THEN 0.0
                       ELSE len(list_filter(toks, t -> list_contains(${duckList(Text.StopEn ++ Text.StopDe ++ Text.StopEs ++ Text.StopFr)}, t)))::DOUBLE
                            / len(toks) END, 6) AS stop_frac,
                 round(coalesce(list_sum([length(t)::BIGINT for t in toks]), 0)::DOUBLE
                       / greatest(len(toks), 1), 6) AS mean_word_len,
                 round(CASE WHEN len(toks) = 0 THEN 0.0
                       ELSE len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
                            / len(toks) END, 6) AS alpha_frac
          FROM s
        ), kept AS (
          SELECT * FROM scored
          WHERE lang_id = 'en' AND quality >= 0.72
            AND dup_line_frac <= 0.3 AND top2gram_share <= 0.2
            AND symbol_ratio <= 0.1 AND stop_frac >= 0.05
            AND mean_word_len BETWEEN 3.0 AND 10.0 AND alpha_frac >= 0.8
        ), surv AS (
          SELECT content_hash, min(doc_id) AS doc_id FROM kept GROUP BY 1
        ), ded AS (
          SELECT k.doc_id, k.text FROM kept k JOIN surv USING (content_hash, doc_id)
        ), dt AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w2
          FROM ded
        ), dsh AS (
          SELECT doc_id,
                 list_distinct([w2[i] || ' ' || w2[i+1] || ' ' || w2[i+2]
                                for i in range(1, len(w2) - 1)]) AS sgl
          FROM dt WHERE len(w2) >= 3
        ), dpost AS MATERIALIZED (
          SELECT doc_id, len(sgl) AS sz, unnest(sgl) AS g FROM dsh
        ), pairs AS MATERIALIZED (
          -- inverted-index spelling (equi-join on shingle, count
          -- shared): same integers as all-pairs list_intersect at
          -- Σ df² cost instead of n²·|s| — keeps the sf0.1 sweep
          -- tractable (the r10 exclusion this closes)
          SELECT a, b FROM (
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS c,
                   any_value(a.sz) AS sza, any_value(b.sz) AS szb
            FROM dpost a JOIN dpost b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          WHERE c::DOUBLE / (sza + szb - c) >= 0.8
        ), edges AS (
          SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM ded
          UNION
          SELECT e.a AS node, r.lbl FROM reach r JOIN edges e ON e.b = r.node
        ), comp AS (
          SELECT node AS doc_id, min(lbl) AS keep FROM reach GROUP BY node
        ), fin AS (
          SELECT d.doc_id, d.text FROM ded d
          JOIN comp c ON d.doc_id = c.doc_id AND d.doc_id = c.keep
        ), c AS (
          SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n,
                 CASE WHEN len(string_split(text, ' ')) <= 32 THEN 1
                      ELSE CAST(ceil((len(string_split(text, ' ')) - 32)::DOUBLE / 24) AS INT) + 1 END AS n_chunks
          FROM fin)
        SELECT doc_id,
               unnest(range(n_chunks))::INT AS chunk_id,
               array_to_string(w[unnest(range(n_chunks))*24 + 1 :
                                 unnest(range(n_chunks))*24 + 32], ' ') AS chunk_text,
               least(32, n - unnest(range(n_chunks))*24)::INT AS chunk_len
        FROM c""")),

    // ----- DSIR importance scoring (hashed-unigram log-ratio) -----
    // Data selection for pre-training (Xie et al. 2023): score every
    // document by the mean log-ratio of target vs raw hashed-unigram
    // probability — here target = the `lang = 'en'` slice, the "looks
    // like the domain we want" proxy. The feature space is CLOSED at
    // 4096 md5-prefix buckets, so the one-pass model build exchanges
    // ≤ 4096 partial-aggregated rows, the weight table broadcasts,
    // and the corpus's only shuffle is the per-document (sum, count)
    // partial — see [[Dsir]] for the full 100 TB shape. The DuckDB
    // twin reproduces the md5-prefix bucketing bit-for-bit
    // (('0x' || hex)::BIGINT == conv(hex, 16, 10)), so the hash-match
    // proves hashing, smoothing, both totals, and per-doc averaging.
    QueryDef(
      "q100_dsir_importance",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        // target ⊂ raw by predicate -> the one-pass weightsFor form
        // (DsirSpec pins it equal to the general two-corpus weights)
        val w = Dsir.weightsFor(d, col("lang") === "en",
          "text", buckets = 4096)
        Dsir.score(d, "doc_id", "text", w, buckets = 4096)
      },
      Some("""
        WITH toks0 AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
          FROM documents),
        toks AS (
          SELECT doc_id, lang,
                 ('0x' || substr(md5(term), 1, 6))::BIGINT % 4096 AS b
          FROM toks0),
        tgt AS (SELECT b, count(*) AS tf_t FROM toks WHERE lang = 'en' GROUP BY b),
        raw AS (SELECT b, count(*) AS tf_r FROM toks GROUP BY b),
        tot AS (
          SELECT (SELECT sum(tf_t) FROM tgt) AS n_t,
                 (SELECT sum(tf_r) FROM raw) AS n_r),
        w AS (
          SELECT raw.b,
                 ln((coalesce(tgt.tf_t, 0) + 1.0) / (n_t + 4096.0))
                   - ln((tf_r + 1.0) / (n_r + 4096.0)) AS w
          FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot)
        SELECT doc_id, round(avg(w), 6) AS dsir_score, count(*) AS n_toks
        FROM toks JOIN w USING (b)
        GROUP BY doc_id""")),

    // ----- Bigram-LM perplexity scoring (CCNet-style quality filter) -----
    // Score each document by the mean log-probability of its bigrams
    // under the corpus's own add-one-smoothed bigram model — word
    // salad built from common words ranks low even where q67's
    // unigram score is blind. The deliberate scale contrast with
    // q100: a raw bigram table grows with vocabulary² and does NOT
    // broadcast at 100 TB, so scoring is the shuffle-equi-join form
    // (sort-merge at scale, AQE broadcast only while provably small);
    // the only explicit broadcast is the 1-row vocabulary count. See
    // [[NgramLm]]. The DuckDB twin rebuilds the same model, so the
    // hash-match proves counts, prefix totals, smoothing, and per-doc
    // averaging end-to-end.
    QueryDef(
      "q101_bigram_perplexity",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        NgramLm.perplexityScore(d, "doc_id", "text",
          NgramLm.bigramModel(d, "text"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        bgs AS (
          SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
          FROM t WHERE len(w) >= 2),
        c2 AS (SELECT bg, count(*) AS c2 FROM bgs GROUP BY bg),
        c1 AS (
          SELECT string_split(bg, ' ')[1] AS w1, sum(c2) AS c1
          FROM c2 GROUP BY 1),
        v AS (
          SELECT count(DISTINCT term) AS v FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents)),
        m AS (
          SELECT bg, ln((c2 + 1.0) / (c1 + v)) AS logp
          FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1
          CROSS JOIN v)
        SELECT doc_id, round(avg(logp), 6) AS mean_logp2,
               CAST(count(*) AS BIGINT) AS n_bigrams
        FROM bgs JOIN m USING (bg)
        GROUP BY doc_id""")),

    // ----- Trained quality classifier (hashed logistic regression) -----
    // The supervised counterpart of q100: train a hashed-feature LR
    // "looks like English" classifier (label = lang) by one exact
    // full-batch gradient step from zero init, then score the corpus.
    // One step is the oracle-checkable slice of training: at zero
    // init every error is exactly ±1/2 (sigmoid(0) = 1/2), gradient
    // sums are dyadic rationals (order-independent in IEEE), and the
    // weight update (lr·g)/n is mirrored operation-for-operation in
    // the twin — so the hash-match proves features, gradient, update,
    // and scoring end-to-end. Multi-iteration training is
    // HashedLrSpec-graded (float merge order varies at last ulp).
    // Scale shape: see [[HashedLr]] — per-iteration two feature joins
    // + a ≤4096-row driver collect; models always broadcast.
    QueryDef(
      "q103_quality_classifier",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
          .withColumn("y",
            when(col("lang") === "en", 1.0d).otherwise(0.0d))
        // ONE feature pass serves both training and scoring. Barrier,
        // not cache(): CacheManager entries live until an explicit
        // unpersist nobody here can issue (the result is consumed
        // lazily by the harness), whereas localCheckpoint blocks are
        // ContextCleaner-released once this frame is unreferenced —
        // bounded lifecycle, same single computation. Labels are a
        // narrow pushed-down scan — cheap unmaterialized.
        val feats = Barrier.materialize(
          HashedLr.features(d, "doc_id", "text", 4096))
        val w = HashedLr.trainOnFeatures(feats,
          d.select(col("doc_id"), col("y")), "doc_id",
          buckets = 4096, iters = 1, lr = 0.1)
        HashedLr.scoreFeatures(feats, "doc_id", w)
      },
      Some("""
        WITH toks0 AS (
          SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                 unnest(string_split(text, ' ')) AS term
          FROM documents),
        feats AS (
          SELECT doc_id, y,
                 ('0x' || substr(md5(term), 1, 6))::BIGINT % 4096 AS b,
                 count(*) AS cnt
          FROM toks0 GROUP BY doc_id, y, b),
        n AS (SELECT count(*) AS n FROM documents),
        grad AS (SELECT b, sum(cnt * (0.5 - y)) AS g FROM feats GROUP BY b),
        w AS (SELECT b, 0.0 - 0.1 * g / n.n AS w FROM grad CROSS JOIN n),
        m AS (
          SELECT doc_id, sum(cnt * w) AS margin
          FROM feats JOIN w USING (b) GROUP BY doc_id)
        SELECT doc_id,
               round(1.0 / (1.0 + exp(0.0 - margin)), 6) AS p,
               round(1.0 / (1.0 + exp(0.0 - margin)), 6) >= 0.5 AS predicted
        FROM m""")),

    // ----- Training-data recipe: filter → mix → shuffle → pack -----
    // The end-to-end shape a training run actually consumes, composed
    // from four proven stages under ONE oracle (the q75 idiom for the
    // data-recipe side): length gate → per-source temperature quotas
    // (q72, α=0.5, exact-quota md5 rank) → deterministic epoch
    // shuffle over the SELECTED set (q95's distributed rank, explicit
    // width per the derived-input scaladoc) → budget-256 packing in
    // shuffle order across 8 shards (q54's cumsum). The hash-match
    // proves the stages agree on every boundary: quota flooring, rank
    // ties, shuffle position, and packing arithmetic. Scale shape:
    // each stage keeps its own audited plan (q72's aggregate-sized
    // quota window + per-source rank — swap in q78's sort-free
    // threshold for giant sources; q95's shard-decomposed rank; q54's
    // per-shard cumsum — raise the shard count with the corpus).
    QueryDef(
      "q105_data_recipe",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val kept = d.filter(size(split(col("text"), " ")) >= 20)
        // quota-bounded (Σ t_s ≤ 300 rows), and consumed THREE times
        // downstream (epochShuffle's within + offsets, plus the
        // join-back) — barrier it so the corpus-wide filter + quota +
        // rank pipeline executes exactly once (plans are trees, not
        // DAGs: an unpersisted frame used twice is computed twice)
        val sampled = Barrier.materialize(
          CorpusPrep.temperatureSample(kept, "doc_id", "source",
              alpha = 0.5, budget = 300)
            .select(col("doc_id"), col("text")))
        val pos = CorpusPrep.epochShuffle(
          sampled.select(col("doc_id")), "doc_id", "recipe7:", width = 2)
        val ordered = sampled.join(pos, "doc_id")
        CorpusPrep.packSequential(ordered, "shuffle_pos", "text",
          budget = 256, shardCol = pmod(col("shuffle_pos"), lit(8)))
      },
      Some("""
        WITH kept AS (
          SELECT doc_id, source, text FROM documents
          WHERE len(string_split(text, ' ')) >= 20),
        c AS (SELECT source, count(*) AS n_s FROM kept GROUP BY source),
        q AS (
          SELECT source,
                 least(n_s, CAST(floor(round(
                   300 * pow(n_s, 0.5) / sum(pow(n_s, 0.5)) OVER (), 6))
                   AS BIGINT)) AS t_s
          FROM c),
        r AS (
          SELECT doc_id, source, text,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
          FROM kept),
        sampled AS (
          SELECT r.doc_id, r.text FROM r JOIN q USING (source)
          WHERE r.rk <= q.t_s),
        pos AS (
          SELECT doc_id, text,
                 row_number() OVER (ORDER BY md5(concat('recipe7:', doc_id)),
                                    doc_id) AS shuffle_pos
          FROM sampled),
        t AS (
          SELECT shuffle_pos, shuffle_pos % 8 AS shard,
                 CAST(len(string_split(text, ' ')) AS INT) AS n_toks
          FROM pos),
        p AS (
          SELECT shuffle_pos, shard, n_toks,
                 coalesce(sum(n_toks) OVER (PARTITION BY shard
                   ORDER BY shuffle_pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM t)
        SELECT shuffle_pos, shard, n_toks,
               CAST(cum_before // 256 AS BIGINT) AS seq_id,
               CAST(cum_before % 256 AS BIGINT) AS offset
        FROM p""")),

    // ----- BPE vocabulary induction: the first merge's pair table -----
    // Tokenizer training as an engine job ([[Bpe]], Sennrich 2016).
    // The oracle-checkable slice is the FIRST merge decision (the q103
    // idiom): weighted adjacent-pair counts over the char+</w>
    // segmentation are pure integer arithmetic, so the top-20 pair
    // table (deterministic (cnt desc, l, r) tie-break — the same order
    // learnMerges uses for its argmax) hash-matches exactly;
    // multi-merge induction is BpeSpec-graded on the hand-computed
    // Sennrich example. Scale shape: the only corpus-scale operation
    // is the word-frequency aggregate (one map-side-combined shuffle);
    // segmentation and pair counting run over the distinct-word table
    // (Heaps' law: ≪ corpus), and merge iterations collect ONE argmax
    // row each — the Ivf bounded-driver pattern.
    QueryDef(
      "q106_bpe_pairs",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Bpe.pairCounts(Bpe.segment(Bpe.wordFreq(d, "text")))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(20)
      },
      Some("""
        WITH words AS (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        wf AS (
          SELECT w, CAST(count(*) AS BIGINT) AS f
          FROM words WHERE len(w) > 0 GROUP BY w),
        sym AS (
          SELECT w, f, list_append(string_split(w, ''), '</w>') AS syms
          FROM wf),
        pairs AS (
          SELECT syms[i] AS l, syms[i+1] AS r, f
          FROM sym, unnest(range(1, len(syms))) AS t(i)),
        agg AS (
          SELECT l, r, CAST(sum(f) AS BIGINT) AS cnt
          FROM pairs GROUP BY l, r)
        SELECT l, r, cnt FROM agg
        ORDER BY cnt DESC, l, r LIMIT 20""")),

    // ----- BPE training loop: five merges, oracle-checked end-to-end -----
    // The ITERATIVE slice of [[Bpe]] under an exact oracle — stronger
    // than q106's first-step table: the DuckDB twin re-derives its own
    // argmax each step (a 1-row CTE captured into the next fold), so
    // the hash-match proves pair counting, the (cnt desc, l, r)
    // tie-break, AND the greedy left-to-right merge application,
    // k times composed. The twin's fold is `list_reduce` over a
    // space-joined symbol string (symbols never contain spaces — words
    // come from a space split), with the accumulator's LAST symbol
    // compared to the merge's left side — exactly [[Bpe.applyMerge]]'s
    // array fold. Spark-side driver traffic stays one argmax row per
    // step; the toy-corpus merge sequence is additionally pinned in
    // BpeSpec against the hand-computed Sennrich example.
    QueryDef(
      "q107_bpe_train",
      (spark, dir) => {
        val merges = bpeTrained(spark, dir)._1
        import spark.implicits._
        merges.zipWithIndex
          .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
          .toDF("step", "l", "r", "cnt")
      },
      Some(bpeSegSql(5) + """
        SELECT CAST(1 AS BIGINT) AS step, l, r, cnt FROM m1
        UNION ALL SELECT CAST(2 AS BIGINT), l, r, cnt FROM m2
        UNION ALL SELECT CAST(3 AS BIGINT), l, r, cnt FROM m3
        UNION ALL SELECT CAST(4 AS BIGINT), l, r, cnt FROM m4
        UNION ALL SELECT CAST(5 AS BIGINT), l, r, cnt FROM m5""")),

    // ----- BPE tokenization: per-doc token counts under the vocab -----
    // The operation a pipeline runs at corpus scale AFTER training:
    // count each document's BPE tokens under the 5-merge vocabulary —
    // the budgeting input for q54's packing and per-doc cost
    // accounting. The corpus is never re-segmented word by word:
    // subword widths live on the vocab table, the word occurrences
    // meet it in a BROADCAST join fused into the scan stage, and the
    // only exchange carries one partial-aggregated row per document
    // (at a vocab too big to broadcast, swap in the (doc, word)
    // pre-agg + SMJ — Bpe.tokenCounts scaladoc). The oracle extends
    // q107's self-deriving CTE chain with the same join — so the
    // hash also re-proves the trained segmentation the counts came
    // from; its LEFT JOIN per step keeps an exhausted vocabulary
    // segmentation unchanged, mirroring train's early stop.
    QueryDef(
      "q108_bpe_tokenize",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Bpe.tokenCounts(d, "doc_id", "text", bpeTrained(spark, dir)._2)
      },
      Some(bpeSegSql(5) + """,
        vocab AS (
          SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_sub
          FROM seg5),
        dw AS (SELECT doc_id, w FROM words WHERE len(w) > 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens
        FROM dw JOIN vocab USING (w) GROUP BY doc_id""")),

    // ----- BPE encoding: the subword token stream itself -----
    // q108's sibling when downstream wants the tokenized TEXT, not
    // just its price — the tokenizer hand-off artifact. One broadcast
    // vocab join in the scan stage, one id-keyed reassembly shuffle
    // (collect_list bounded by each doc's own word count — the
    // dedupLines reassemble idiom). The oracle re-derives the same
    // vocab through the q107 CTE chain and reassembles with
    // string_agg ORDER BY word position, so the hash proves
    // segmentation, subword order within words, and word order within
    // documents, end-to-end.
    QueryDef(
      "q109_bpe_encode",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Bpe.encode(d, "doc_id", "text", bpeTrained(spark, dir)._2)
      },
      Some(bpeSegSql(5) + """,
        vocab AS (
          SELECT w, s AS sub, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_sub
          FROM seg5),
        dw AS (
          SELECT doc_id, ws[i] AS w, i AS pos
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               unnest(range(1, len(ws)+1)) AS t(i)
          WHERE len(ws[i]) > 0)
        SELECT doc_id, string_agg(sub, ' ' ORDER BY pos) AS bpe_text,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens
        FROM dw JOIN vocab USING (w) GROUP BY doc_id""")),

    // ----- Unigram-LM (SentencePiece) tokenizer: one EM step exact -----
    // The OTHER mainstream subword family, completing the q106–q109
    // tokenizer story ([[graft.operators.UnigramLm]]): substring seed
    // vocabulary → fixed-point micro-nat piece scores → Viterbi-best
    // segmentation of every distinct word → E-step piece counts, top
    // 50 by (count desc, piece). The q103 first-step idiom: the E-step
    // is all-integer (counts weighted by word frequency; the DP
    // compares integer score sums with a lexicographic path
    // tie-break), so ONE hard-EM step is oracle-exact — the DuckDB
    // twin replays seeding, quantization, and the full per-position DP
    // chain; the multi-iteration loop and prune are spec-graded
    // (UnigramLmSpec). Scale: one corpus-sized exchange (word freq);
    // everything else distinct-word- or piece-vocab-sized.
    QueryDef(
      "q112_unigram_lm",
      (spark, dir) =>
        UnigramLm.countsFromSegments(unigramSegments(spark, dir))
          .orderBy(col("c").desc, col("piece")).limit(50),
      Some(unigramEmSql(unigramDpSql(maxWordLen = 16, maxPieceLen = 4,
        minCount = 5)))),

    // ----- Unigram-LM tokenization: per-doc token counts -----
    // The application half of the q112 family, and the point of the
    // (w, f, syms) vocab convention: the two tokenizer families differ
    // in how the segmentation is LEARNED, not in how it is applied —
    // Bpe.tokenCounts runs verbatim on the Viterbi table
    // (UnigramLm.vocabFromSegments), broadcast vocab join fused into
    // the scan, one doc-count-sized exchange. The oracle extends the
    // DP chain with q108's join, so the hash also re-proves the
    // trained segmentation the counts came from.
    QueryDef(
      "q114_unigram_tokenize",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Bpe.tokenCounts(d, "doc_id", "text",
          UnigramLm.vocabFromSegments(unigramSegments(spark, dir)))
      },
      Some(unigramTokenizeSql(unigramDpSql(maxWordLen = 16,
        maxPieceLen = 4, minCount = 5)))),

    // ----- Unigram-LM encoding: the segmented token stream -----
    // q109's sibling for the unigram family: Bpe.encode on the Viterbi
    // vocab emits each document as its subword pieces (one broadcast
    // join + one id-keyed positioned reassembly); the oracle's
    // string_agg ORDER BY position hash-proves piece order within
    // words and word order within documents under the DP-derived
    // segmentation.
    QueryDef(
      "q115_unigram_encode",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Bpe.encode(d, "doc_id", "text",
          UnigramLm.vocabFromSegments(unigramSegments(spark, dir)),
          outCol = "sp_text")
      },
      Some(unigramEncodeSql(unigramDpSql(maxWordLen = 16,
        maxPieceLen = 4, minCount = 5)))),

    // ----- WordPiece training loop: five likelihood merges exact -----
    // The THIRD mainstream subword family ([[WordPiece]], Schuster &
    // Nakajima 2012 — BERT's tokenizer), completing the q106–q115
    // story: BPE's merge loop with the argmax swapped to the
    // likelihood score cnt/(c(l)·c(r)). The q107 self-deriving idiom,
    // strengthened: each oracle step re-derives pair AND symbol
    // counts, recomputes every pair's score as one IEEE division of
    // one IEEE multiplication (bit-identical to Spark by IEEE-754
    // correct rounding — no transcendentals anywhere), picks its own
    // (score desc, l, r) argmax, and folds the merge — so the
    // hash-match proves the scored selection and the greedy
    // application, five times composed. The reported score is rounded
    // to 6 digits on both engines (the one rounded-double output);
    // SELECTION uses the raw double. Scale shape: [[Bpe]]'s verbatim
    // (one corpus-scale word-frequency shuffle; hybrid driver-side
    // loop with delta-maintained pair+symbol counts for production
    // merge counts).
    QueryDef(
      "q116_wordpiece_train",
      (spark, dir) => {
        val merges = wpTrained(spark, dir)._1
        import spark.implicits._
        merges.zipWithIndex
          .map { case ((l, r, c, s), i) =>
            (i + 1L, l, r, c,
              BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          .toDF("step", "l", "r", "cnt", "score_r")
      },
      Some(wordPieceSegSql(5) + """
        SELECT CAST(1 AS BIGINT) AS step, l, r, cnt, round(score, 6) AS score_r FROM m1
        UNION ALL SELECT CAST(2 AS BIGINT), l, r, cnt, round(score, 6) FROM m2
        UNION ALL SELECT CAST(3 AS BIGINT), l, r, cnt, round(score, 6) FROM m3
        UNION ALL SELECT CAST(4 AS BIGINT), l, r, cnt, round(score, 6) FROM m4
        UNION ALL SELECT CAST(5 AS BIGINT), l, r, cnt, round(score, 6) FROM m5""")),

    // ----- WordPiece tokenization: per-doc token counts -----
    // The application half — and the payoff of the (w, f, syms) vocab
    // convention a third time: Bpe.tokenCounts runs verbatim on the
    // WordPiece-trained segmentation (broadcast vocab join fused into
    // the scan, one doc-count-sized exchange). The oracle extends the
    // scored chain with q108's tail, re-proving the trained
    // segmentation the counts came from.
    QueryDef(
      "q117_wordpiece_tokenize",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Bpe.tokenCounts(d, "doc_id", "text", wpTrained(spark, dir)._2)
      },
      Some(wordPieceSegSql(5) + """,
        vocab AS (
          SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_sub
          FROM seg5),
        dw AS (SELECT doc_id, w FROM words WHERE len(w) > 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens
        FROM dw JOIN vocab USING (w) GROUP BY doc_id""")),

    // ----- Greedy max-match tokenization with OOV (BERT runtime) -----
    // The RUNTIME half of the WordPiece story, and the operation the
    // q108/q114/q117 joins cannot express: apply the documents-trained
    // tokenizer to a FOREIGN corpus — the part table's p_name words,
    // every one of them out-of-vocabulary — by greedy
    // longest-match-first over the trained piece inventory (BERT's
    // runtime algorithm). Unseen words segment from pieces instead of
    // dropping; a word with an unmatchable position collapses to one
    // [UNK] token ('gizmo' does here: 'z' never occurs in the
    // documents corpus). Greedy max-match is deliberately NOT a
    // training replay — it can diverge from the merge history even
    // in-vocab — so the oracle replays the greedy loop itself as a
    // 20-step frontier chain over word positions (pure integer/string
    // arithmetic, no floats anywhere). Output per part: word count,
    // max-match token count, OOV-collapse count — the coverage report
    // that decides whether yesterday's tokenizer still fits today's
    // data. Scale shape: the inventory IS the shipped tokenizer
    // (symbol-vocab-sized, collected once, broadcast); segmentation
    // is a per-row function over the distinct-word table (zero
    // shuffle); application is the q108 broadcast join. Words are
    // capped at 16 chars on both engines to bound the oracle chain.
    QueryDef(
      "q121_maxmatch_oov",
      (spark, dir) => {
        val parts = Tables.load(spark, dir, "part")
        val pwords = Bpe.wordFreq(parts, "p_name")
          .where(length(col("w")) <= 16)
        val mm = WordPiece.maxMatchSegments(pwords,
          WordPiece.inventory(wpTrained(spark, dir)._2))
        val v2 = mm.select(col("w"), size(col("syms")).cast("long").as("n_sub"),
          when(col("syms") === array(lit(WordPiece.Unk)), lit(1L))
            .otherwise(lit(0L)).as("is_unk"))
        parts.select(col("p_partkey"), explode(split(col("p_name"), " ")).as("w"))
          .filter(length(col("w")) > 0 && length(col("w")) <= 16)
          .join(broadcast(v2), "w")
          .groupBy(col("p_partkey"))
          .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_tokens"),
            sum(col("is_unk")).as("n_unk"))
      },
      Some(wordPieceSegSql(5) + """,
        pw AS (
          SELECT p_partkey, pn AS w
          FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS pn
                FROM part)
          WHERE len(pn) > 0 AND len(pn) <= 16),
        aw AS (SELECT w FROM pw GROUP BY w)""" + maxMatchSql(20) + """,
        mmv AS (
          SELECT w, CAST(len(string_split(path, ' ')) AS BIGINT) AS n_sub,
                 CASE WHEN path = '[UNK]' THEN 1 ELSE 0 END AS is_unk
          FROM mm20)
        SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens,
               CAST(sum(is_unk) AS BIGINT) AS n_unk
        FROM pw JOIN mmv USING (w) GROUP BY p_partkey""")),

    // ----- Kneser–Ney bigram perplexity (the KenLM smoothing) -----
    // q101's sibling with the smoothing CCNet's filter actually uses
    // ([[NgramLm.kneserNeyModel]], Kneser & Ney 1995 / Chen & Goodman
    // 1998): the backoff mass goes to CONTINUATION counts (distinct
    // left-contexts), not raw frequency, with fixed discount D = 0.75
    // (dyadic — exactly representable). All four statistics (bigram
    // count, prefix total, the two distinct-continuation counts, type
    // total) are exact integers from ONE mergeable count table; the
    // probability is a fixed dag of IEEE ops mirrored op-for-op, ln the
    // only transcendental (the q101 contract). Scale shape unchanged
    // from q101: model-sized aggregates/joins, 1-row type broadcast,
    // deliberately-not-broadcast scoring join (vocab² model).
    QueryDef(
      "q118_kneser_ney",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        NgramLm.perplexityScore(d, "doc_id", "text",
          NgramLm.kneserNeyModel(NgramLm.bigramCounts(d, "text")),
          outCol = "mean_logp_kn")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        bgs AS (
          SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
          FROM t WHERE len(w) >= 2),
        c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgs GROUP BY bg),
        pre AS (
          SELECT string_split(bg, ' ')[1] AS w1, CAST(sum(c2) AS BIGINT) AS c1,
                 CAST(count(*) AS BIGINT) AS n1f
          FROM c2 GROUP BY 1),
        suf AS (
          SELECT string_split(bg, ' ')[2] AS w2, CAST(count(*) AS BIGINT) AS n1b
          FROM c2 GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c2),
        m AS (
          SELECT bg, ln((c2 - 0.75) / c1 +
                        (0.75 * n1f / c1) * (n1b / CAST(t AS DOUBLE))) AS logp
          FROM c2
          JOIN pre ON string_split(c2.bg, ' ')[1] = pre.w1
          JOIN suf ON string_split(c2.bg, ' ')[2] = suf.w2
          CROSS JOIN tot)
        SELECT doc_id, round(avg(logp), 6) AS mean_logp_kn,
               CAST(count(*) AS BIGINT) AS n_bigrams
        FROM bgs JOIN m USING (bg)
        GROUP BY doc_id""")),

    // ----- Weighted sampling without replacement (A-ES) -----
    // Efraimidis & Spirakis 2006: each row draws a deterministic
    // uniform u from an md5-seeded 52-bit hash (exactly representable
    // as a double) and ranks by key = ln(u)/w — a monotone transform of
    // the paper's u^(1/w), so the top-k by key IS a weighted sample
    // without replacement with inclusion probability increasing in w.
    // Deterministic (seeded hash, no RNG state), so re-runs and both
    // engines agree; the reported key is rounded to 6 digits with an
    // id tie-break. Weight here = document token count (sample long
    // documents preferentially — the token-budget-aware sampling a
    // mixture stage wants). Scale shape: zero-shuffle projection into
    // TakeOrderedAndProject — per-partition top-k partials, one
    // k-row-bounded exchange; no full sort anywhere.
    QueryDef(
      "q119_weighted_sample",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        CorpusPrep.weightedSample(
          d.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("w_toks")),
          "doc_id", "w_toks", k = 100, seed = "aes1:")
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS w_toks
          FROM documents),
        keyed AS (
          SELECT doc_id, w_toks,
                 round(ln(CAST(('0x' || substr(md5('aes1:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1 AS DOUBLE)
                          / 4503599627370496.0)
                       / CAST(w_toks AS DOUBLE), 6) AS samp_key
          FROM t)
        SELECT doc_id, w_toks, samp_key FROM keyed
        ORDER BY samp_key DESC, doc_id LIMIT 100""")),

    // ----- Tokenizer evaluation: fertility / compression by language -----
    // The metric report a tokenizer-training run ends with (fertility =
    // subword tokens per word; chars per token = the compression ratio
    // driving context-window cost), per language under the shared
    // 5-merge BPE vocabulary — tokenizers are evaluated per-language
    // because fertility imbalance is the standard multilingual-cost
    // finding. Composes q108's counts with a lang rollup; the oracle
    // re-derives the vocabulary through the q107 chain, so the hash
    // also re-proves the segmentation the metrics summarize. Scale:
    // q108's shape plus a languages-sized aggregate.
    QueryDef(
      "q120_tokenizer_eval",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Bpe.tokenCounts(d, "doc_id", "text", bpeTrained(spark, dir)._2)
          .join(d.select(col("doc_id"), col("lang"),
            length(col("text")).cast("long").as("chars")), "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("n_words"),
            sum(col("n_tokens")).as("n_tokens"),
            round(sum(col("n_tokens")).cast("double") / sum(col("n_words")), 6)
              .as("fertility"),
            round(sum(col("chars")).cast("double") / sum(col("n_tokens")), 6)
              .as("chars_per_token"))
      },
      Some(bpeSegSql(5) + """,
        vocab AS (
          SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_sub
          FROM seg5),
        dw AS (SELECT doc_id, w FROM words WHERE len(w) > 0),
        dc AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(n_sub) AS BIGINT) AS n_tokens
          FROM dw JOIN vocab USING (w) GROUP BY doc_id)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS n_words,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               round(CAST(sum(n_tokens) AS DOUBLE) / sum(n_words), 6) AS fertility,
               round(CAST(sum(chars) AS DOUBLE) / sum(n_tokens), 6) AS chars_per_token
        FROM dc JOIN (SELECT doc_id, lang, CAST(len(text) AS BIGINT) AS chars
                      FROM documents) USING (doc_id)
        GROUP BY lang""")),

    // ----- Johnson–Lindenstrauss projection over quantized codes -----
    // The dimensionality lever beside q86's byte-width lever
    // (Achlioptas 2003: ±1 sign matrices carry the JL
    // distance-preservation guarantee): project each vector's uint8
    // codes down to 8 integer coordinates — the coarse prefilter
    // geometry for ANN (probe the projected space, exact-rescore
    // survivors) — 4× fewer in-flight bytes than the float input,
    // 16× when persisted as int16 (|Σ ±code| ≤ 255·64 = 16320 fits
    // comfortably). Projecting the
    // CODES, not the floats, makes the whole operator exact integer
    // arithmetic — Σ ±code agrees bit-for-bit across engines in any
    // summation order, no float caveats — and the sign matrix is a
    // pure seeded-md5 function of (j, i), never materialized or
    // shipped. Scale shape: one zero-shuffle projection (q86's), the
    // matrix regenerates on every executor from the seed. The input
    // dimension is pinned at 64 on BOTH engines, so a testdata
    // vintage change fails the gate loudly instead of silently
    // zip-padding nulls.
    QueryDef(
      "q122_jl_projection",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val staged = e.select(col("vec_id"), col("embedding").as("vec"))
          .select(col("vec_id"), col("vec"),
            array_min(col("vec")).cast("double").as("mn"),
            Quantize.scale(col("vec")).as("qscale"))
          .select(col("vec_id"),
            Quantize.codes(col("vec"), col("mn"), col("qscale")).as("codes"))
        staged.select(col("vec_id") +:
          Quantize.jlProject(col("codes"), dim = 64, outDim = 8, seed = "jl7:"): _*)
      },
      Some {
        val sums = (0 until 8).map { j =>
          s"""CAST(sum(code * (CASE WHEN ('0x' || substr(md5('jl7:$j:' || CAST(i - 1 AS VARCHAR)), 1, 1))::INT % 2 = 0
                     THEN 1 ELSE -1 END)) AS BIGINT) AS p$j"""
        }.mkString(",\n               ")
        s"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        p AS (
          SELECT vec_id, vec, list_min(vec) AS mn,
                 (list_max(vec) - list_min(vec)) / 255.0 AS s
          FROM v),
        c AS (
          SELECT vec_id,
                 CASE WHEN s = 0 THEN [0 for x in vec]
                      ELSE [CAST(round((x - mn) / s) AS INT) for x in vec]
                 END AS codes
          FROM p),
        x AS (
          SELECT vec_id, codes[i] AS code, i
          FROM c, unnest(range(1, len(codes) + 1)) AS t(i))
        SELECT vec_id,
               $sums
        FROM x GROUP BY vec_id"""
      }),

    // ----- JL-prefiltered ANN: shortlist in int space, exact rescore -----
    // The prefilter→rescore composition production ANN actually runs,
    // and the one ANN variant that is ORACLE-CHECKABLE end-to-end:
    // q122's integer projection shortlists nCand=100 candidates per
    // query by squared L2 in the 16-dim projected space (pure integer
    // arithmetic — bit-reproducible shortlist, unlike hash/cluster
    // ANN whose bucketing is engine-specific), then only the
    // shortlist pays the exact cosine. Scale shape: the distance pass
    // streams the corpus as 16 integers per row (2× fewer in-flight
    // bytes than the floats, 8× when the index is persisted int16;
    // the win compounds with
    // the float vectors) against a broadcast query batch — q37's BNLJ
    // shape over the skinny projection — and the rescore touches
    // nCand × queries vectors; at production scale the projected
    // table is the index artifact (a seed + a parquet of longs),
    // materialized once. Recall vs the exact baseline is graded in
    // QuantizeSpec (deterministic 0.44 on the near-random synthetic
    // embeddings — the pathological case for any projection — at 2.2×
    // the random-candidate baseline; real embedding geometry does
    // far better).
    QueryDef(
      "q123_jl_ann",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        graft.operators.Similarity.jlPrefilterTopK(
          e, e.filter(col("vec_id") < 10), k = 10, nCand = 100,
          dim = 64, outDim = 16, seed = "jl7:")
          .withColumn("cos", round(col("cos"), 6))
      },
      Some {
        val outDim = 16
        val sums = (0 until outDim).map { j =>
          s"""CAST(sum(code * (CASE WHEN ('0x' || substr(md5('jl7:$j:' || CAST(i - 1 AS VARCHAR)), 1, 1))::INT % 2 = 0
                     THEN 1 ELSE -1 END)) AS BIGINT) AS p$j"""
        }.mkString(",\n               ")
        val pd = (0 until outDim)
          .map(j => s"(n.p$j - q.p$j) * (n.p$j - q.p$j)").mkString(" + ")
        s"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        p AS (
          SELECT vec_id, vec, list_min(vec) AS mn,
                 (list_max(vec) - list_min(vec)) / 255.0 AS s
          FROM v),
        c AS (
          SELECT vec_id,
                 CASE WHEN s = 0 THEN [0 for x in vec]
                      ELSE [CAST(round((x - mn) / s) AS INT) for x in vec]
                 END AS codes
          FROM p),
        x AS (
          SELECT vec_id, codes[i] AS code, i
          FROM c, unnest(range(1, len(codes) + 1)) AS t(i)),
        pr AS MATERIALIZED (
          SELECT vec_id,
               $sums
          FROM x GROUP BY vec_id),
        cand AS (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 $pd AS pdist
          FROM pr n JOIN pr q ON n.vec_id <> q.vec_id
          WHERE q.vec_id < 10),
        keep AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY pdist, neighbor_id) AS rn
            FROM cand) WHERE rn <= 100),
        scored AS (
          SELECT query_id, neighbor_id,
                 CASE WHEN list_dot_product(cv.vec, cv.vec) = 0
                        OR list_dot_product(qv.vec, qv.vec) = 0 THEN 0.0
                      ELSE list_dot_product(cv.vec, qv.vec)
                           / (sqrt(list_dot_product(cv.vec, cv.vec))
                              * sqrt(list_dot_product(qv.vec, qv.vec))) END AS cos
          FROM keep
          JOIN v cv ON cv.vec_id = keep.neighbor_id
          JOIN v qv ON qv.vec_id = keep.query_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos
        FROM ranked WHERE rank <= 10"""
      }),

    // ----- Vocabulary coverage curve (tokenizer sizing) -----
    // [[graft.operators.CorpusPrep.vocabCoverage]]: min vocab size
    // reaching {50,90,95,99}% token coverage, frequency-ranked — the
    // Zipf curve every tokenizer-vocab decision reads. Exact from the
    // (count → #terms) histogram alone (within a count class each term
    // adds identical mass), so there is NO ranked global cumsum: one
    // Heaps-bounded term-count exchange, one √N̄-bounded histogram
    // exchange, one tiny driver collect; the 100·cum ≥ N·p comparison
    // stays in long arithmetic, bit-matching the oracle's naive
    // row-by-row ranked scan.
    QueryDef(
      "q143_vocab_coverage",
      (spark, dir) =>
        graft.operators.CorpusPrep.vocabCoverage(
          Tables.load(spark, dir, "documents"), "text"),
      Some("""
        WITH t AS (
          SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), tf AS (
          SELECT term, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(w) AS term FROM t) GROUP BY term
        ), total AS (
          SELECT CAST(sum(c) AS BIGINT) AS n FROM tf
        ), ranked AS (
          SELECT c,
                 row_number() OVER (ORDER BY c DESC, term) AS rk,
                 CAST(sum(c) OVER (ORDER BY c DESC, term
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM tf
        ), tg(target_pct) AS (
          VALUES (50), (90), (95), (99)
        ), hit AS (
          SELECT tg.target_pct, min(r.rk) AS vocab_size
          FROM tg CROSS JOIN total CROSS JOIN ranked r
          WHERE 100 * r.cum >= total.n * tg.target_pct
          GROUP BY tg.target_pct
        )
        SELECT h.target_pct, CAST(h.vocab_size AS BIGINT) AS vocab_size,
               round(r.cum::DOUBLE / total.n, 6) AS covered_share
        FROM hit h
        JOIN ranked r ON r.rk = h.vocab_size
        CROSS JOIN total"""),
      // bench = false: the heavy part (term counts) is exactly the
      // aggregation surface q89/q110 already measure
      bench = false),

    // ----- Greedy NO-SPLIT packing into 256-token bins, 8 shards -----
    // [[graft.operators.CorpusPrep.packGreedy]]: q54's sibling for the
    // SFT regime — a document never straddles two sequences; the bin
    // closes when the next document does not fit. The greedy fold has
    // no prefix-sum form, so the oracle replays it with a recursive
    // CTE walking each shard in document order (state = (bin, fill)).
    QueryDef(
      "q147_pack_greedy",
      (spark, dir) =>
        CorpusPrep.packGreedy(Tables.load(spark, dir, "documents"),
          "doc_id", "text", budget = 256,
          shardCol = pmod(col("doc_id"), lit(8))),
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks,
                 CAST(row_number() OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id) AS BIGINT) AS rn
          FROM documents),
        s AS (
          SELECT doc_id, shard, n_toks, rn,
                 CAST(0 AS BIGINT) AS bin_id,
                 CAST(0 AS BIGINT) AS off,
                 n_toks AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT d.doc_id, d.shard, d.n_toks, d.rn,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.bin_id ELSE s.bin_id + 1 END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill ELSE CAST(0 AS BIGINT) END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill + d.n_toks ELSE d.n_toks END
          FROM t d JOIN s ON d.shard = s.shard AND d.rn = s.rn + 1)
        SELECT doc_id, shard, n_toks, bin_id, off AS offset FROM s""")),

    // ----- Greedy packing priced in TRAINED-BPE tokens -----
    // The production composition: sequence budgets are spent in
    // tokenizer tokens, not whitespace words — so the packer runs on
    // q108's per-doc BPE token counts (one broadcast vocab join from
    // the shared trained vocabulary) instead of re-deriving lengths
    // from text. Same audited pack shape (ONE fixed-width shard
    // exchange); the oracle chains q107's self-deriving vocab CTEs
    // into the q147 recursive greedy replay, so the hash proves the
    // tokenizer, the counting join, and the fold together.
    QueryDef(
      "q150_pack_bpe_budget",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val counts = Bpe.tokenCounts(d, "doc_id", "text",
          bpeTrained(spark, dir)._2)
        CorpusPrep.packGreedyByLen(
          counts.select(col("doc_id"), col("n_tokens")),
          "doc_id", "n_tokens", budget = 512,
          shardCol = pmod(col("doc_id"), lit(8)))
      },
      Some(bpeSegSql(5).replaceFirst("WITH", "WITH RECURSIVE") + """,
        vocab AS (
          SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_sub
          FROM seg5),
        dw AS (SELECT doc_id, w FROM words WHERE len(w) > 0),
        tc AS (
          SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS n_tokens
          FROM dw JOIN vocab USING (w) GROUP BY doc_id),
        o AS (
          SELECT doc_id, doc_id % 8 AS shard, n_tokens,
                 CAST(row_number() OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id) AS BIGINT) AS rn
          FROM tc),
        st AS (
          SELECT doc_id, shard, n_tokens, rn,
                 CAST(0 AS BIGINT) AS bin_id,
                 CAST(0 AS BIGINT) AS off,
                 n_tokens AS fill
          FROM o WHERE rn = 1
          UNION ALL
          SELECT d.doc_id, d.shard, d.n_tokens, d.rn,
                 CASE WHEN s.fill + d.n_tokens <= 512
                      THEN s.bin_id ELSE s.bin_id + 1 END,
                 CASE WHEN s.fill + d.n_tokens <= 512
                      THEN s.fill ELSE CAST(0 AS BIGINT) END,
                 CASE WHEN s.fill + d.n_tokens <= 512
                      THEN s.fill + d.n_tokens ELSE d.n_tokens END
          FROM o d JOIN st s ON d.shard = s.shard AND d.rn = s.rn + 1)
        SELECT doc_id, shard, n_tokens, bin_id, off AS offset FROM st""")),

    // ----- Packing efficiency: the padding-vs-straddling tradeoff -----
    // One row per packer at the same (budget, shards): q54's
    // split-at-boundary form wastes only each shard's tail (but every
    // budget-th document straddles a sequence break), q147's no-split
    // form never splits a document but pays per-bin padding. This
    // query prices that tradeoff on the actual corpus — the number a
    // pipeline owner reads before choosing a packer. All columns are
    // integer arithmetic except the rounded waste fraction; the
    // oracle replays both packers (window cumsum; recursive greedy)
    // and aggregates identically.
    QueryDef(
      "q151_packing_efficiency",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val budget = 256
        val shard = pmod(col("doc_id"), lit(8))
        val lens = docs.select(col("doc_id"),
          coalesce(size(split(col("text"), " ")), lit(0))
            .cast("long").as("n_toks"))
        // ONE waste definition for every bin packer — edit here, every
        // row of the comparison moves together
        def binReport(packed: org.apache.spark.sql.DataFrame,
            label: String) =
          packed.groupBy(col("shard"), col("bin_id"))
            .agg(sum(col("n_toks")).as("fill"))
            .agg(count(lit(1)).as("bins"), sum(col("fill")).as("tokens"),
              sum(greatest(lit(0L), lit(budget.toLong) - col("fill")))
                .as("waste"))
            .select(lit(label).as("packer"), col("bins"),
              col("tokens"), col("waste"))
        val greedy = binReport(
          CorpusPrep.packGreedy(docs, "doc_id", "text", budget, shard),
          "greedy_nosplit")
        val seq = CorpusPrep.packSequential(docs, "doc_id", "text",
            budget, shard)
          .groupBy(col("shard")).agg(sum(col("n_toks")).as("tokens"))
          .agg(sum(ceil(col("tokens").cast("double") / budget).cast("long"))
              .as("bins"),
            sum(col("tokens")).as("tokens"))
          .select(lit("split_sequential").as("packer"), col("bins"),
            col("tokens"),
            (col("bins") * budget - col("tokens")).as("waste"))
        val srt = binReport(
          CorpusPrep.packGreedyByLen(lens, "doc_id", "n_toks", budget,
            shard, sortByLenDesc = true),
          "sorted_nosplit")
        val bfd = binReport(
          CorpusPrep.packBestFitDecreasing(lens, "doc_id", "n_toks",
            budget, shard),
          "bestfit_decreasing")
        greedy.unionByName(seq).unionByName(srt).unionByName(bfd)
          .select(col("packer"), col("bins"), col("tokens"), col("waste"),
            round(col("waste").cast("double") /
              (col("bins") * budget).cast("double"), 6).as("waste_frac"))
      },
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks,
                 CAST(row_number() OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id) AS BIGINT) AS rn
          FROM documents),
        s AS (
          SELECT shard, n_toks, rn, CAST(0 AS BIGINT) AS bin_id, n_toks AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT d.shard, d.n_toks, d.rn,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.bin_id ELSE s.bin_id + 1 END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill + d.n_toks ELSE d.n_toks END
          FROM t d JOIN s ON d.shard = s.shard AND d.rn = s.rn + 1),
        gb AS (
          SELECT shard, bin_id, max(fill) AS fill
          FROM s GROUP BY shard, bin_id),
        greedy AS (
          SELECT 'greedy_nosplit' AS packer,
                 CAST(count(*) AS BIGINT) AS bins,
                 CAST(sum(fill) AS BIGINT) AS tokens,
                 CAST(sum(greatest(0, 256 - fill)) AS BIGINT) AS waste
          FROM gb),
        sq AS (
          SELECT shard, CAST(sum(n_toks) AS BIGINT) AS tokens
          FROM t GROUP BY shard),
        seqp AS (
          SELECT 'split_sequential' AS packer,
                 CAST(sum(CAST(ceil(tokens::DOUBLE / 256) AS BIGINT)) AS BIGINT) AS bins,
                 CAST(sum(tokens) AS BIGINT) AS tokens
          FROM sq),
        seq2 AS (
          SELECT packer, bins, tokens, bins * 256 - tokens AS waste
          FROM seqp),
        t2 AS (
          SELECT shard, n_toks,
                 CAST(row_number() OVER (PARTITION BY shard
                                         ORDER BY n_toks DESC, doc_id)
                      AS BIGINT) AS rn
          FROM t),
        s2 AS (
          SELECT shard, n_toks, rn, CAST(0 AS BIGINT) AS bin_id,
                 n_toks AS fill
          FROM t2 WHERE rn = 1
          UNION ALL
          SELECT d.shard, d.n_toks, d.rn,
                 CASE WHEN s2.fill + d.n_toks <= 256
                      THEN s2.bin_id ELSE s2.bin_id + 1 END,
                 CASE WHEN s2.fill + d.n_toks <= 256
                      THEN s2.fill + d.n_toks ELSE d.n_toks END
          FROM t2 d JOIN s2 ON d.shard = s2.shard AND d.rn = s2.rn + 1),
        gb2 AS (
          SELECT shard, bin_id, max(fill) AS fill
          FROM s2 GROUP BY shard, bin_id),
        srt AS (
          SELECT 'sorted_nosplit' AS packer,
                 CAST(count(*) AS BIGINT) AS bins,
                 CAST(sum(fill) AS BIGINT) AS tokens,
                 CAST(sum(greatest(0, 256 - fill)) AS BIGINT) AS waste
          FROM gb2),
        bfd2 AS (
          SELECT shard, n_toks, rn, [n_toks] AS bins
          FROM t2 WHERE rn = 1
          UNION ALL
          SELECT shard, n_toks, rn,
                 CASE WHEN chosen IS NULL THEN list_append(bins, n_toks)
                      ELSE [CASE WHEN i = chosen THEN bins[i] + n_toks
                                 ELSE bins[i] END
                            for i in range(1, len(bins) + 1)] END AS bins
          FROM (
            SELECT d.shard, d.n_toks, d.rn, s.bins,
                   CASE WHEN len(list_filter(s.bins,
                                             f -> f + d.n_toks <= 256)) = 0
                        THEN NULL
                        ELSE list_position(s.bins,
                               list_max(list_filter(s.bins,
                                        f -> f + d.n_toks <= 256)))
                   END AS chosen
            FROM t2 d JOIN bfd2 s
              ON d.shard = s.shard AND d.rn = s.rn + 1)),
        bfinal AS (
          SELECT shard, bins FROM (
            SELECT shard, bins, rn,
                   max(rn) OVER (PARTITION BY shard) AS mx
            FROM bfd2)
          WHERE rn = mx),
        bfills AS (SELECT shard, unnest(bins) AS fill FROM bfinal),
        bfdrow AS (
          SELECT 'bestfit_decreasing' AS packer,
                 CAST(count(*) AS BIGINT) AS bins,
                 CAST(sum(fill) AS BIGINT) AS tokens,
                 CAST(sum(greatest(0, 256 - fill)) AS BIGINT) AS waste
          FROM bfills),
        unioned AS (
          SELECT * FROM greedy UNION ALL SELECT * FROM seq2
          UNION ALL SELECT * FROM srt UNION ALL SELECT * FROM bfdrow)
        SELECT packer, bins, tokens, waste,
               round(waste::DOUBLE / (bins * 256)::DOUBLE, 6) AS waste_frac
        FROM unioned""")),

    // ----- T5 span corruption: the denoising-objective pair -----
    // [[graft.operators.CorpusPrep.spanCorrupt]]: mask one seeded
    // 2-token span per complete 16-token block (12.5% corruption) and
    // emit (input_text with sentinels, target_text with the hidden
    // spans, n_masked). Deterministic grid placement via the md5-
    // prefix hash the A-ES sampler already pinned cross-engine, so
    // the oracle replays placement, masking, and both reassemblies
    // bit-for-bit.
    QueryDef(
      "q152_span_corrupt",
      (spark, dir) =>
        CorpusPrep.spanCorrupt(Tables.load(spark, dir, "documents"),
          "doc_id", "text", block = 16, spanLen = 2, seed = "sc1:"),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        e AS (
          SELECT doc_id, len(w) AS n, i AS pos, w[i] AS tok,
                 CAST((i - 1) // 16 AS BIGINT) AS blk
          FROM t, unnest(range(1, len(w) + 1)) AS u(i)),
        sp AS (
          SELECT doc_id, blk,
                 ('0x' || substr(md5('sc1:' || CAST(doc_id AS VARCHAR) ||
                     ':' || CAST(blk AS VARCHAR)), 1, 13))::BIGINT
                   % 15 AS off
          FROM (SELECT DISTINCT doc_id, blk FROM e)),
        m AS (
          SELECT e.doc_id, e.pos, e.tok, e.blk,
                 e.blk * 16 + 1 + sp.off AS s_pos,
                 (e.blk + 1) * 16 <= e.n AS complete
          FROM e JOIN sp USING (doc_id, blk)),
        p AS (
          SELECT doc_id, pos,
                 CASE WHEN complete AND pos = s_pos
                      THEN '<extra_id_' || CAST(blk AS VARCHAR) || '>'
                      WHEN complete AND pos >= s_pos AND pos < s_pos + 2
                      THEN NULL
                      ELSE tok END AS in_piece,
                 CASE WHEN complete AND pos = s_pos
                      THEN '<extra_id_' || CAST(blk AS VARCHAR) || '> ' || tok
                      WHEN complete AND pos > s_pos AND pos < s_pos + 2
                      THEN tok
                      ELSE NULL END AS tgt_piece,
                 CASE WHEN complete AND pos >= s_pos AND pos < s_pos + 2
                      THEN 1 ELSE 0 END AS msk
          FROM m)
        SELECT doc_id,
               coalesce(string_agg(in_piece, ' ' ORDER BY pos), '') AS input_text,
               coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target_text,
               CAST(sum(msk) AS BIGINT) AS n_masked
        FROM p GROUP BY doc_id""")),

    // ----- Fill-in-the-middle (PSM) transform -----
    // [[graft.operators.CorpusPrep.fimTransform]]: q152's sibling for
    // the infilling objective — two seeded cuts, emit
    // `<PRE> prefix <SUF> suffix <MID> middle`. A pure zero-shuffle
    // projection (two md5 hashes + three array slices per row);
    // the oracle mirrors the slices with DuckDB list ranges.
    QueryDef(
      "q153_fim_transform",
      (spark, dir) =>
        CorpusPrep.fimTransform(Tables.load(spark, dir, "documents"),
          "doc_id", "text", seed = "fim1:"),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n
          FROM documents),
        c AS (
          SELECT doc_id, w, n,
                 ('0x' || substr(md5('fim1:' || CAST(doc_id AS VARCHAR) ||
                     ':a'), 1, 13))::BIGINT % (n + 1) AS c1,
                 ('0x' || substr(md5('fim1:' || CAST(doc_id AS VARCHAR) ||
                     ':b'), 1, 13))::BIGINT % (n + 1) AS c2
          FROM t),
        lh AS (
          SELECT doc_id, w, n, least(c1, c2) AS lo, greatest(c1, c2) AS hi
          FROM c)
        SELECT doc_id,
               -- an out-of-range slice (empty segment) yields NULL in
               -- DuckDB, not []: guard each segment explicitly
               '<PRE> ' ||
               (CASE WHEN lo <= 0 THEN ''
                     ELSE array_to_string(w[1:lo], ' ') END) ||
               ' <SUF> ' ||
               (CASE WHEN hi >= n THEN ''
                     ELSE array_to_string(w[hi+1:n], ' ') END) ||
               ' <MID> ' ||
               (CASE WHEN hi <= lo THEN ''
                     ELSE array_to_string(w[lo+1:hi], ' ') END) AS fim_text,
               lo AS n_prefix, hi - lo AS n_middle, n - hi AS n_suffix
        FROM lh""")),

    // ----- Exact length quantiles per source (no global sort) -----
    // [[graft.operators.CorpusPrep.lengthQuantiles]]: p50/p90/p99
    // token length per source from the (length → #docs) histogram —
    // the q143 histogram-walk idiom pointed at sequence-length
    // planning (p50 sizes the packing bin, p99 bounds the oversize
    // tail). Integer comparison 100·cum ≥ p·n; the oracle runs the
    // naive per-source ranked scan it bit-matches.
    QueryDef(
      "q155_length_quantiles",
      (spark, dir) =>
        CorpusPrep.lengthQuantiles(Tables.load(spark, dir, "documents"),
          "source", "text", ps = Seq(50, 90, 99)),
      Some("""
        WITH t AS (
          SELECT source,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
                   AS len
          FROM documents),
        ranked AS (
          SELECT source, len,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY len)
                      AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
          FROM t),
        tg(p) AS (VALUES (50), (90), (99))
        SELECT r.source, CAST(tg.p AS INT) AS p, min(r.len) AS q_len
        FROM ranked r CROSS JOIN tg
        WHERE r.rn * 100 >= tg.p * r.n
        GROUP BY r.source, tg.p""")),

    // ----- Per-source datacard (the release report) -----
    // The summary table a dataset release ships, one row per source:
    // volume (docs, tokens), median length (the q155 histogram walk),
    // exact-duplicate rate (q31's content hash), and language-mix
    // entropy. Every column reuses an already-audited idiom; the
    // whole card is joined on the tiny source dimension, so the plan
    // is three bounded aggregates + two broadcast joins — per-source
    // cells never exceed groups × distinct-values rows after the
    // map-side combine.
    QueryDef(
      "q156_source_datacard",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val base = docs.select(col("source"), col("lang"),
          coalesce(size(split(col("text"), " ")), lit(0)).cast("long")
            .as("len"),
          Text.contentHash(col("text")).as("h"))
        val agg = base.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("len")).as("n_tokens"),
          countDistinct(col("h")).as("n_distinct"))
        // base already carries per-doc lengths — feed them in rather
        // than letting lengthQuantiles re-scan and re-tokenize
        val p50 = CorpusPrep.lengthQuantilesByLen(
            base.select(col("source"), col("len")), "source", "len",
            Seq(50))
          .select(col("source"), col("q_len").as("p50_len"))
        val share = col("c").cast("double") / col("n").cast("double")
        // Entropy terms are summed via a SORTED left fold, not sum():
        // Spark's aggregation order is partitioning-dependent and
        // DuckDB's is its own, so a 1-ulp difference in the double Σ
        // could flip the 6dp rounding on a boundary value. Sorting the
        // per-lang terms and folding left-to-right (same 0.0 init as
        // the oracle's list_prepend) makes the Σ bit-identical across
        // engines AND across partitionings of the same corpus.
        val ent = base.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("c"))
          .withColumn("n",
            sum(col("c")).over(Window.partitionBy(col("source"))))
          .groupBy(col("source"))
          .agg(aggregate(sort_array(collect_list(-share * log(share))),
            lit(0.0), (acc, x) => acc + x).as("e"))
        agg.join(p50, "source").join(ent, "source")
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("p50_len"),
            round(lit(1.0) - col("n_distinct").cast("double") /
              col("n_docs").cast("double"), 6).as("dup_rate"),
            round(col("e"), 6).as("lang_entropy"))
      },
      Some("""
        WITH t AS (
          SELECT source, lang,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
                   AS len,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
          FROM documents),
        agg AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len) AS BIGINT) AS n_tokens,
                 CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
          FROM t GROUP BY source),
        ranked AS (
          SELECT source, len,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY len)
                      AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
          FROM t),
        p50 AS (
          SELECT source, min(len) AS p50_len
          FROM ranked WHERE rn * 100 >= 50 * n GROUP BY source),
        lc AS (
          SELECT source, lang, CAST(count(*) AS BIGINT) AS c
          FROM t GROUP BY source, lang),
        lt AS (SELECT source, sum(c) AS n FROM lc GROUP BY source),
        ent AS (
          SELECT lc.source,
                 list_reduce(
                   list_prepend(0.0::DOUBLE, list_sort(
                     list(-(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE)))),
                   (a, b) -> a + b) AS e
          FROM lc JOIN lt USING (source) GROUP BY lc.source)
        SELECT a.source, a.n_docs, a.n_tokens, p.p50_len,
               round(1.0 - a.n_distinct::DOUBLE / a.n_docs::DOUBLE, 6)
                 AS dup_rate,
               round(e, 6) AS lang_entropy
        FROM agg a
        JOIN p50 p USING (source)
        JOIN ent USING (source)""")),

    // ----- BERT MLM masking (80-10-10) -----
    // [[graft.operators.CorpusPrep.mlmMask]]: completes the
    // objective-prep triad (q152 span corruption, q153 FIM) — 15%
    // position selection with the 80% [MASK] / 10% corpus-vocab
    // replacement / 10% keep split, all three draws decimal-field-
    // split from ONE seeded md5 per position. The oracle re-derives
    // the top-16 replacement vocabulary and replays selection,
    // substitution, and both reassemblies.
    QueryDef(
      "q157_mlm_mask",
      (spark, dir) =>
        CorpusPrep.mlmMask(Tables.load(spark, dir, "documents"),
          "doc_id", "text", seed = "mlm1:", vocabK = 16),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        vc AS (
          SELECT vtok,
                 CAST(row_number() OVER (ORDER BY c DESC, vtok) - 1
                      AS BIGINT) AS vidx
          FROM (SELECT tok AS vtok, count(*) AS c
                FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok
                ORDER BY c DESC, vtok LIMIT 16)),
        e AS (
          SELECT doc_id, i AS pos, w[i] AS tok,
                 ('0x' || substr(md5('mlm1:' || CAST(doc_id AS VARCHAR) ||
                     ':' || CAST(i AS VARCHAR)), 1, 13))::BIGINT AS bits
          FROM t, unnest(range(1, len(w) + 1)) AS u(i)),
        d AS (
          SELECT doc_id, pos, tok,
                 bits % 100 < 15 AS sel,
                 (bits // 100) % 10 AS sub,
                 CASE WHEN bits % 100 < 15 AND (bits // 100) % 10 = 8
                      THEN (bits // 1000) % (SELECT count(*) FROM vc)
                 END AS vidx
          FROM e),
        p AS (
          SELECT d.doc_id, d.pos,
                 CASE WHEN NOT sel THEN tok
                      WHEN sub < 8 THEN '[MASK]'
                      WHEN sub = 8 THEN vc.vtok
                      ELSE tok END AS out_tok,
                 CASE WHEN sel THEN tok END AS label_tok,
                 CASE WHEN sel THEN 1 ELSE 0 END AS msk
          FROM d LEFT JOIN vc USING (vidx))
        SELECT doc_id,
               coalesce(string_agg(out_tok, ' ' ORDER BY pos), '')
                 AS mlm_text,
               coalesce(string_agg(label_tok, ' ' ORDER BY pos), '')
                 AS labels_text,
               CAST(sum(msk) AS BIGINT) AS n_masked
        FROM p GROUP BY doc_id""")),

    // ----- Best-fit-decreasing packing (all bins open) -----
    // [[graft.operators.CorpusPrep.packBestFitDecreasing]]: q147
    // taught us a single open bin wastes ~15% at budget 256 and that
    // merely sorting doesn't help (q151's sorted_nosplit row); the
    // real fix is keeping every bin open and placing each doc in the
    // fullest bin that fits. The oracle replays the whole heuristic
    // with a recursive CTE whose state is the per-shard BIN-FILL LIST
    // (best-fit chosen via list_filter/list_max/list_position, the
    // update via an indexed list comprehension) — so the hash pins
    // every placement decision, not just the waste total.
    QueryDef(
      "q154_pack_bestfit",
      (spark, dir) =>
        CorpusPrep.packBestFitDecreasing(
          Tables.load(spark, dir, "documents")
            .select(col("doc_id"),
              coalesce(size(split(col("text"), " ")), lit(0))
                .cast("long").as("n_toks")),
          "doc_id", "n_toks", budget = 256,
          shardCol = pmod(col("doc_id"), lit(8))),
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks
          FROM documents),
        o AS (
          SELECT doc_id, shard, n_toks,
                 CAST(row_number() OVER (PARTITION BY shard
                                         ORDER BY n_toks DESC, doc_id)
                      AS BIGINT) AS rn
          FROM t),
        bfd AS (
          SELECT doc_id, shard, n_toks, rn,
                 CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS off,
                 [n_toks] AS bins
          FROM o WHERE rn = 1
          UNION ALL
          SELECT doc_id, shard, n_toks, rn,
                 CASE WHEN chosen IS NULL THEN CAST(len(bins) AS BIGINT)
                      ELSE CAST(chosen - 1 AS BIGINT) END AS bin_id,
                 CASE WHEN chosen IS NULL THEN CAST(0 AS BIGINT)
                      ELSE bins[chosen] END AS off,
                 CASE WHEN chosen IS NULL THEN list_append(bins, n_toks)
                      ELSE [CASE WHEN i = chosen THEN bins[i] + n_toks
                                 ELSE bins[i] END
                            for i in range(1, len(bins) + 1)] END AS bins
          FROM (
            SELECT d.doc_id, d.shard, d.n_toks, d.rn, s.bins,
                   CASE WHEN len(list_filter(s.bins,
                                             f -> f + d.n_toks <= 256)) = 0
                        THEN NULL
                        ELSE list_position(s.bins,
                               list_max(list_filter(s.bins,
                                        f -> f + d.n_toks <= 256)))
                   END AS chosen
            FROM o d JOIN bfd s
              ON d.shard = s.shard AND d.rn = s.rn + 1))
        SELECT doc_id, shard, n_toks, bin_id, off AS offset FROM bfd""")),

    // ----- Pack materialization: the training-sequence artifact -----
    // q147 assigns; this emits — one row per (shard, bin) with the
    // documents concatenated in offset order, the fill, and the doc
    // count: the actual sequence a trainer consumes (pad fill→budget
    // at tensorization). One id-keyed join back to the text (the
    // assignment table is fixed-width; text joins in ONCE, never
    // crosses the pack exchange) and one (shard, bin)-keyed
    // reassembly. Ties in offset (zero-token docs) order by text —
    // the same rule the struct sort applies — so the oracle's
    // string_agg replays byte-for-byte.
    QueryDef(
      "q158_pack_materialize",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val assign = CorpusPrep.packGreedy(docs, "doc_id", "text",
          budget = 256, shardCol = pmod(col("doc_id"), lit(8)))
        assign.join(docs.select(col("doc_id"), col("text")), "doc_id")
          .groupBy(col("shard"), col("bin_id"))
          .agg(
            array_join(Text.inPositionOrder(
              collect_list(struct(col("offset"), col("text"))), "text"),
              " ").as("seq_text"),
            sum(col("n_toks")).as("fill"),
            count(lit(1)).as("n_docs"))
      },
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id, text, doc_id % 8 AS shard,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks,
                 CAST(row_number() OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id) AS BIGINT) AS rn
          FROM documents),
        s AS (
          SELECT doc_id, text, shard, n_toks, rn,
                 CAST(0 AS BIGINT) AS bin_id,
                 CAST(0 AS BIGINT) AS off,
                 n_toks AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT d.doc_id, d.text, d.shard, d.n_toks, d.rn,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.bin_id ELSE s.bin_id + 1 END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill ELSE CAST(0 AS BIGINT) END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill + d.n_toks ELSE d.n_toks END
          FROM t d JOIN s ON d.shard = s.shard AND d.rn = s.rn + 1)
        SELECT shard, bin_id,
               string_agg(text, ' ' ORDER BY off, text) AS seq_text,
               CAST(sum(n_toks) AS BIGINT) AS fill,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM s GROUP BY shard, bin_id""")),

    // ----- SFT batch recipe flagship: curate → dedup → pack → emit -----
    // q105's sibling for the SFT regime, four stages under ONE
    // oracle: an integer quality gate (length band + the q77
    // chars-per-token band in pure integer arithmetic), exact
    // content-hash dedup (min-id survivor, q31's hash), NO-SPLIT
    // greedy packing of the survivors (q147 — the SFT-correct packer:
    // examples never straddle), and bin materialization (q158). Each
    // stage keeps its audited plan shape; the oracle chains the gate,
    // the hash grouping, the recursive greedy replay, and the ordered
    // string_agg, so one hash proves the whole recipe end-to-end.
    QueryDef(
      "q161_sft_recipe",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val scored = docs.select(col("doc_id"), col("text"),
          col("n_chars"),
          coalesce(size(split(col("text"), " ")), lit(0)).cast("long")
            .as("n_toks"))
        val kept = scored.filter(col("n_toks") >= 20 &&
          col("n_toks") * 3 <= col("n_chars") &&
          col("n_chars") <= col("n_toks") * 10)
        // barriered: TWO consumers (the packer and the join-back) — an
        // unpersisted frame used twice re-runs the gate and the
        // corpus-wide hash window per consumer (the q105 lesson); and
        // the packer takes the ALREADY-computed lengths (ByLen — no
        // re-tokenization)
        val dedup = Barrier.materialize(kept
          .withColumn("content_hash", Text.contentHash(col("text")))
          .withColumn("keep_id",
            min(col("doc_id")).over(Window.partitionBy(col("content_hash"))))
          .filter(col("doc_id") === col("keep_id"))
          .select(col("doc_id"), col("text"), col("n_toks")))
        val assign = CorpusPrep.packGreedyByLen(
          dedup.select(col("doc_id"), col("n_toks")), "doc_id", "n_toks",
          budget = 256, shardCol = pmod(col("doc_id"), lit(8)))
        assign.join(dedup.select(col("doc_id"), col("text")), "doc_id")
          .groupBy(col("shard"), col("bin_id"))
          .agg(
            array_join(Text.inPositionOrder(
              collect_list(struct(col("offset"), col("text"))), "text"),
              " ").as("seq_text"),
            sum(col("n_toks")).as("fill"),
            count(lit(1)).as("n_docs"))
      },
      Some("""
        WITH RECURSIVE sc AS (
          SELECT doc_id, text, n_chars,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks
          FROM documents),
        kept AS (
          SELECT doc_id, text, n_toks FROM sc
          WHERE n_toks >= 20 AND n_toks * 3 <= n_chars
            AND n_chars <= n_toks * 10),
        dd AS (
          SELECT doc_id, text, n_toks,
                 min(doc_id) OVER (PARTITION BY
                   md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS keep_id
          FROM kept),
        sv AS (
          SELECT doc_id, text, doc_id % 8 AS shard, n_toks,
                 CAST(row_number() OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id) AS BIGINT) AS rn
          FROM dd WHERE doc_id = keep_id),
        s AS (
          SELECT doc_id, text, shard, n_toks, rn,
                 CAST(0 AS BIGINT) AS bin_id,
                 CAST(0 AS BIGINT) AS off,
                 n_toks AS fill
          FROM sv WHERE rn = 1
          UNION ALL
          SELECT d.doc_id, d.text, d.shard, d.n_toks, d.rn,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.bin_id ELSE s.bin_id + 1 END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill ELSE CAST(0 AS BIGINT) END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill + d.n_toks ELSE d.n_toks END
          FROM sv d JOIN s ON d.shard = s.shard AND d.rn = s.rn + 1)
        SELECT shard, bin_id,
               string_agg(text, ' ' ORDER BY off, text) AS seq_text,
               CAST(sum(n_toks) AS BIGINT) AS fill,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM s GROUP BY shard, bin_id""")),

    // ----- Budget-capped selection by score (corpus trimming) -----
    // [[graft.operators.CorpusPrep.selectToBudget]]: keep the
    // best-scored documents until a token budget fills — the
    // classifier-trimming step (take the top X tokens, not the top X
    // docs). Score here: chars-per-token density rounded to 6dp (any
    // rounded score works — rounding is what keeps the class
    // histogram ≪ corpus). The oracle runs the naive global ranked
    // prefix scan the class decomposition provably equals.
    QueryDef(
      "q162_select_to_budget",
      (spark, dir) => {
        val scored = Tables.load(spark, dir, "documents")
          .select(col("doc_id"),
            coalesce(size(split(col("text"), " ")), lit(0)).cast("long")
              .as("n_toks"),
            col("n_chars"))
          .filter(col("n_toks") > 0)
          .select(col("doc_id"), col("n_toks"),
            // 2dp: the class histogram must stay << corpus for the
            // operator's single-partition class cumsum — 6dp density
            // classes would approach corpus cardinality at scale
            round(col("n_chars").cast("double") /
              col("n_toks").cast("double"), 2).as("score"))
        CorpusPrep.selectToBudget(scored, "doc_id", "score", "n_toks",
          budget = 10000L)
      },
      Some("""
        WITH sc AS (
          SELECT doc_id,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
                   AS n_toks,
                 n_chars
          FROM documents),
        scored AS (
          SELECT doc_id, n_toks,
                 round(n_chars::DOUBLE / n_toks::DOUBLE, 2) AS score
          FROM sc WHERE n_toks > 0),
        ranked AS (
          SELECT doc_id, score, n_toks,
                 CAST(sum(n_toks) OVER (ORDER BY score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM scored)
        SELECT doc_id, score, n_toks
        FROM ranked WHERE cum <= 10000""")),

    // ----- Content-defined chunking (shift-stable boundaries) -----
    // [[graft.operators.CorpusPrep.chunkContentDefined]]: cut after
    // any position whose trailing trigram hashes ≡ 0 (mod 16) — the
    // FastCDC idea at token granularity, so chunk contents (and their
    // dedup hashes) survive insertions that would re-cut every fixed
    // window. The oracle replays the lag-trigram marker, the running
    // boundary count, and the ordered reassembly.
    QueryDef(
      "q163_chunk_cdc",
      (spark, dir) =>
        CorpusPrep.chunkContentDefined(
          Tables.load(spark, dir, "documents"), "doc_id", "text",
          modulus = 16),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        e AS (
          SELECT doc_id, i AS pos, w[i] AS tok
          FROM t, unnest(range(1, len(w) + 1)) AS u(i)),
        m AS (
          SELECT doc_id, pos, tok,
                 CASE WHEN pos >= 3 AND
                   ('0x' || substr(md5(concat_ws(' ', l2, l1, tok)), 1, 13))::BIGINT
                     % 16 = 0
                 THEN 1 ELSE 0 END AS marker
          FROM (SELECT doc_id, pos, tok,
                       lag(tok, 2) OVER win AS l2,
                       lag(tok, 1) OVER win AS l1
                FROM e WINDOW win AS (PARTITION BY doc_id ORDER BY pos))),
        c AS (
          SELECT doc_id, pos, tok,
                 CAST(coalesce(sum(marker) OVER (PARTITION BY doc_id
                   ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS chunk_id
          FROM m)
        SELECT doc_id, chunk_id,
               string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
               CAST(count(*) AS BIGINT) AS n_toks
        FROM c GROUP BY doc_id, chunk_id""")),

    // ----- Byte-level BPE: the no-UNK production tokenizer -----
    // The GPT-2/LLaMA variant completing the subword family
    // ([[graft.operators.Bpe.trainBytes]]): symbols start as UTF-8
    // BYTES (hex-rendered), so all 256 base symbols exist and NO word
    // of ANY corpus is out-of-vocabulary — the contract q121's
    // char-level max-match cannot offer ('gizmo' collapses to [UNK]
    // there; here it byte-segments). Train 5 merges on documents,
    // then APPLY the trained merge list in learned order to the
    // foreign part-name words ([[Bpe.applyMerges]] — rank-order
    // replay is exact because a merge's operands are only
    // constructible by earlier merges) and price every part: word
    // count + byte-BPE token count, no UNK column because none can
    // exist (BpeSpec pins that structurally). The oracle replays byte
    // hex segmentation, the 5-step merge loop, AND the foreign
    // rank-order application — training and runtime proved in one
    // hash. Scale shape = q108: merges fold over the DISTINCT-WORD
    // table, application is a broadcast vocab join in the scan stage,
    // one partial-aggregated row per part crosses the exchange.
    QueryDef(
      "q165_bpe_bytes",
      (spark, dir) => {
        val parts = Tables.load(spark, dir, "part")
        val pwords = Bpe.wordFreq(parts, "p_name")
        val merges = bpeBytesTrained(spark, dir)._1
        val seg = Bpe.applyMerges(Bpe.byteSegment(pwords), merges)
        val v = seg.select(col("w"), size(col("syms")).cast("long").as("n_sub"))
        parts.select(col("p_partkey"), explode(split(col("p_name"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .join(broadcast(v), "w")
          .groupBy(col("p_partkey"))
          .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_tokens"))
      },
      Some(bpeByteSegSql(5) + """,
        pw AS (
          SELECT p_partkey, pn AS w
          FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS pn
                FROM part)
          WHERE len(pn) > 0),
        aw AS (SELECT w FROM pw GROUP BY w),
        fseg0 AS (
          SELECT w,
                 array_to_string(list_append(
                   [substr(hx, 2*i-1, 2) for i in range(1, len(hx)//2 + 1)],
                   '3C2F773E'), ' ') AS s
          FROM (SELECT w, hex(encode(w)) AS hx FROM aw))""" +
        (1 to 5).map(fsegFoldSql).mkString + """,
        v AS (
          SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_sub
          FROM fseg5)
        SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens
        FROM pw JOIN v USING (w) GROUP BY p_partkey""")),

    // ----- Pack manifest: per-document spans + padding per bin -----
    // [[graft.operators.CorpusPrep.packManifest]]: the trainer-facing
    // artifact over q147's no-split pack — each document's
    // [start_tok, end_tok) span inside its bin (the block-diagonal
    // attention-mask boundaries and position_ids resets), the bin's
    // fill, and the right-padding the loss mask skips. The oracle
    // chains q147's recursive greedy replay with the span/fill/pad
    // window, so the hash re-proves the pack AND the manifest
    // arithmetic together. Scale = q147's one fixed-width shard
    // exchange + one window over the (shard, bin) fixed-width rows.
    QueryDef(
      "q167_pack_manifest",
      (spark, dir) =>
        CorpusPrep.packManifest(Tables.load(spark, dir, "documents"),
          "doc_id", "text", budget = 256,
          shardCol = pmod(col("doc_id"), lit(8))),
      Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks,
                 CAST(row_number() OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id) AS BIGINT) AS rn
          FROM documents),
        s AS (
          SELECT doc_id, shard, n_toks, rn,
                 CAST(0 AS BIGINT) AS bin_id,
                 CAST(0 AS BIGINT) AS off,
                 n_toks AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT d.doc_id, d.shard, d.n_toks, d.rn,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.bin_id ELSE s.bin_id + 1 END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill ELSE CAST(0 AS BIGINT) END,
                 CASE WHEN s.fill + d.n_toks <= 256
                      THEN s.fill + d.n_toks ELSE d.n_toks END
          FROM t d JOIN s ON d.shard = s.shard AND d.rn = s.rn + 1),
        m AS (
          SELECT doc_id, shard, bin_id, off AS start_tok,
                 off + n_toks AS end_tok,
                 CAST(max(off + n_toks) OVER (PARTITION BY shard, bin_id)
                      AS BIGINT) AS bin_fill
          FROM s)
        SELECT doc_id, shard, bin_id, start_tok, end_tok, bin_fill,
               CAST(greatest(0, 256 - bin_fill) AS BIGINT) AS n_pad
        FROM m""")),

    // ----- Chat-template rendering with loss-mask spans -----
    // [[graft.operators.CorpusPrep.renderChatTemplate]]: completion-
    // style SFT pairs derived deterministically from the corpus
    // (prompt = the first 20 tokens, response = the remainder, docs
    // with >= 30 tokens — the continuation-format construction), each
    // rendered into one sentinel-delimited training string with the
    // response span [target_start, target_end) the loss mask trains
    // on (<|end|> included — the stop token is learned). Spans are in
    // the packers' whitespace-token units, so the artifact composes
    // with q167's manifest directly. The oracle replays slicing,
    // assembly, and the token arithmetic; one zero-shuffle
    // projection.
    QueryDef(
      "q168_chat_template",
      (spark, dir) =>
        CorpusPrep.renderChatTemplate(
          sftPairs(Tables.load(spark, dir, "documents")),
          "doc_id", "prompt", "response"),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        p AS (
          SELECT doc_id,
                 array_to_string(w[1:20], ' ') AS prompt,
                 array_to_string(w[21:len(w)], ' ') AS response
          FROM t WHERE len(w) >= 30),
        r AS (
          SELECT doc_id,
                 concat_ws(' ', '<|system|>', 'You are a helpful assistant.',
                   '<|user|>', prompt, '<|assistant|>', response, '<|end|>')
                   AS chat_text,
                 CAST(1 + 5 + 1 + len(string_split(prompt, ' ')) + 1
                      AS BIGINT) AS target_start,
                 CAST(len(string_split(response, ' ')) AS BIGINT) AS n_resp
          FROM p)
        SELECT doc_id, chat_text, target_start,
               target_start + n_resp + 1 AS target_end,
               target_start + n_resp + 1 AS n_toks
        FROM r""")),

    // ----- SFT batch assembly end-to-end: absolute loss spans -----
    // The q161-family capstone composing the round's two trainer
    // artifacts: q168's rendered chat examples pack NO-SPLIT into
    // 512-token bins (q147's greedy fold over the rendered lengths)
    // and each example's loss-mask span is re-based to its ABSOLUTE
    // position inside the bin — (shard, bin_id, loss_start, loss_end)
    // is literally what the training loop feeds the loss mask after
    // loading a packed sequence. One fixed-width shard exchange (ids
    // and lengths only — rendered text never moves) + one id-keyed
    // join back; the oracle chains q168's assembly, the q147
    // recursive pack replay, and the re-basing arithmetic, so the
    // hash proves the whole corpus→batches path in one row set.
    QueryDef(
      "q169_sft_loss_spans",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val rendered = Barrier.materialize(
          CorpusPrep.renderChatTemplate(sftPairs(d),
              "doc_id", "prompt", "response")
            .select(col("doc_id"), col("target_start"), col("target_end"),
              col("n_toks")))
        val assign = CorpusPrep.packGreedyByLen(
          rendered.select(col("doc_id"), col("n_toks")),
          "doc_id", "n_toks", budget = 512,
          shardCol = pmod(col("doc_id"), lit(8)))
        assign.join(rendered, "doc_id")
          .select(col("doc_id"), col("shard"), col("bin_id"),
            (col("offset") + col("target_start")).as("loss_start"),
            (col("offset") + col("target_end")).as("loss_end"))
      },
      Some("""
        WITH RECURSIVE t0 AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        p AS (
          SELECT doc_id,
                 array_to_string(w[1:20], ' ') AS prompt,
                 array_to_string(w[21:len(w)], ' ') AS response
          FROM t0 WHERE len(w) >= 30),
        r AS (
          SELECT doc_id,
                 CAST(1 + 5 + 1 + len(string_split(prompt, ' ')) + 1
                      AS BIGINT) AS target_start,
                 CAST(len(string_split(response, ' ')) AS BIGINT) AS n_resp
          FROM p),
        t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 target_start, target_start + n_resp + 1 AS target_end,
                 target_start + n_resp + 1 AS n_toks,
                 CAST(row_number() OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id) AS BIGINT) AS rn
          FROM r),
        s AS (
          SELECT doc_id, shard, target_start, target_end, n_toks, rn,
                 CAST(0 AS BIGINT) AS bin_id,
                 CAST(0 AS BIGINT) AS off,
                 n_toks AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT d.doc_id, d.shard, d.target_start, d.target_end,
                 d.n_toks, d.rn,
                 CASE WHEN s.fill + d.n_toks <= 512
                      THEN s.bin_id ELSE s.bin_id + 1 END,
                 CASE WHEN s.fill + d.n_toks <= 512
                      THEN s.fill ELSE CAST(0 AS BIGINT) END,
                 CASE WHEN s.fill + d.n_toks <= 512
                      THEN s.fill + d.n_toks ELSE d.n_toks END
          FROM t d JOIN s ON d.shard = s.shard AND d.rn = s.rn + 1)
        SELECT doc_id, shard, bin_id,
               off + target_start AS loss_start,
               off + target_end AS loss_end
        FROM s"""))
  )
}
