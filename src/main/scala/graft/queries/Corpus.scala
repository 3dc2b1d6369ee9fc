package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Text
import graft.operators.{Barrier, Bloom, Collocations, Components, CountMin, Dedup, HeavyHitters, Ivf, Multimodal, Quantize, SemDedup, Similarity}
import graft.sources.Tables

/** LLM-training-data pipeline queries over `documents` / `embeddings`:
  * text analysis, dedup (exact / n-gram Jaccard / MinHash / SimHash),
  * and similarity search. North-star extensions (no reference analog);
  * every oracle-expressible pipeline has a DuckDB twin, the rest are
  * rows-only here and property-graded in the test suite.
  */
object Corpus {

  /** The shared q81/q92 daily-ingest scenario — (historical index,
    * planted batch). Docs < 400 are the historical corpus, existing
    * only as their (content_hash, keep_id) index; the batch is the
    * rest PLUS two plants: docs < 30 re-arrive under new ids (dups vs
    * the INDEX, must drop) and docs ≥ 490 arrive twice within the
    * batch (dups WITHIN the batch, min id survives). One definition so
    * the two queries and their oracles can never desync on the
    * thresholds. */
  private def plantedIncrementalScenario(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val index = Dedup.exact(d.filter(col("doc_id") < 400), "doc_id", "text")
      .select(col("content_hash"), col("keep_id"))
    val batch = d.filter(col("doc_id") >= 400)
      .unionByName(d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 100000000).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") >= 490)
        .select((col("doc_id") + 200000000).as("doc_id"), col("text")))
    (index, batch)
  }

  // q76/q77's 8-token line convention lives in Text.tokenChunks (NULL/
  // empty-text guarded there); q80's oracle mirrors it in DuckDB
  private def tokenChunks(toks: org.apache.spark.sql.Column) =
    Text.tokenChunks(toks, 8)

  /** q89/q110 share one trigram stream and ONE oracle string — the two
    * queries are the same declared semantics on different physical
    * paths (exact shuffle vs sketch+recount), and a shared definition
    * is what makes "same rows, same hash" a structural fact instead of
    * a copy that can rot (the q72/q105 temperatureSample precedent). */
  private def corpusTrigrams(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(spark, dir, "documents")
      .select(Text.tokens(col("text")).as("toks"))
      .select(explode(Text.wordNgrams(col("toks"), 3)).as("ngram"))

  private val topNgramsOracle = """
        WITH t AS (
          SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), n AS (
          SELECT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in range(1, len(w) - 1)]) AS ngram
          FROM t
        )
        SELECT ngram, CAST(count(*) AS BIGINT) AS n
        FROM n GROUP BY ngram
        ORDER BY n DESC, ngram LIMIT 50"""

  /** DuckDB replay of [[graft.operators.Collocations.iteratePhrases]]:
    * `passes` rounds of score → threshold-select → greedy token-merge
    * rewrite, then one final scoring. The rewrite fold is the
    * bpeSegSql idiom — `list_reduce` over the token list with the
    * accumulator's LAST token tested against the incoming one (so a
    * freshly-merged `w1_w2` is not reconsidered as a LEFT in the same
    * pass), exactly `mergePhrases`'s array fold. Multiply-referenced
    * CTEs are MATERIALIZED (the q112 lesson — inlining re-expands the
    * whole chain per reference). */
  private def iteratedPhrasesSql(passes: Int, minCount: Int,
      delta: Double, threshold: Double): String = {
    def scoring(i: Int): String = s""",
        u$i AS MATERIALIZED (
          SELECT w, count(*) AS c_w
          FROM (SELECT unnest(w) AS w FROM t${i - 1}) GROUP BY w),
        n$i AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM u$i),
        b$i AS (
          SELECT bigram, count(*) AS c_ab
          FROM (SELECT unnest([w[j] || ' ' || w[j+1]
                               for j in range(1, len(w))]) AS bigram
                FROM t${i - 1})
          GROUP BY bigram HAVING count(*) >= $minCount),
        s$i AS MATERIALIZED (
          SELECT b$i.bigram, b$i.c_ab,
                 round(CAST(n_total AS DOUBLE) * (b$i.c_ab - $delta) /
                       (CAST(ua.c_w AS DOUBLE) * CAST(ub.c_w AS DOUBLE)), 6) AS score
          FROM b$i CROSS JOIN n$i
          JOIN u$i ua ON ua.w = string_split(b$i.bigram, ' ')[1]
          JOIN u$i ub ON ub.w = string_split(b$i.bigram, ' ')[2])"""
    def rewrite(i: Int): String = s""",
        p$i AS MATERIALIZED (
          SELECT list(bigram) AS ps FROM s$i WHERE score >= $threshold),
        t$i AS MATERIALIZED (
          SELECT string_split(list_reduce(w, (acc, x) ->
            CASE WHEN list_contains(ps,
                   regexp_extract(acc, '([^ ]+)${"$"}', 1) || ' ' || x)
                 THEN regexp_replace(acc, '[^ ]+${"$"}', '') ||
                      regexp_extract(acc, '([^ ]+)${"$"}', 1) || '_' || x
                 ELSE acc || ' ' || x END), ' ') AS w
          FROM t${i - 1} CROSS JOIN p$i)"""
    val header = """
        WITH t0 AS MATERIALIZED (
          SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents)"""
    val body = (1 to passes).map(i => scoring(i) + rewrite(i)).mkString
    val last = passes + 1
    header + body + scoring(last) + s"""
        SELECT bigram, c_ab, score FROM s$last
        ORDER BY score DESC, bigram LIMIT 40"""
  }

  /** The q174 serving index: q171's exact IVFPQ config, built ONCE per
    * (JVM, dir, source-state) and cached — (index path, centroids,
    * codebooks). The cache key folds [[Tables.fingerprint]] of the
    * embeddings parquet (paths+lengths+mtimes), so a regenerated dir
    * rebuilds instead of serving the stale index; the path carries the
    * fingerprint too, so the rebuild never clobbers a probe against
    * the old layout mid-flight. Keyed by dir+state, not session
    * identity: all sessions in a JVM share the per-PID scratch, and a
    * newSession() clone must reuse, not rebuild (the
    * [[Rank.stagedTradeEdges]] discipline). */
  private val servedIvfPqBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Seq[Seq[Double]], Seq[Seq[Seq[Double]]])]()

  private def servedIvfPq(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    val fp = java.lang.Long.toHexString(
      Tables.fingerprint(spark, dir, Seq("embeddings")))
    servedIvfPqBuilt.computeIfAbsent(s"$dir|$fp", _ => {
      val e = Tables.load(spark, dir, "embeddings")
      val cents = Ivf.trainCentroids(e, 16, iters = 3, trainFraction = 0.25)
      val cbs = graft.operators.Pq.trainCodebooks(e, dim = 64, m = 8,
        k = 16, iters = 2, trainFraction = 0.5)
      val path = scratchPath(s"ivfpq_serve_$fp")
      graft.operators.IvfPq.writeIndex(e, path, cents, cbs)
      (path, cents, cbs)
    })
  }

  /** The retrieval-side serve artifacts for q179 — built once per
    * (JVM, dir, source-fingerprint) like [[servedIvfPq]]: the phrase
    * postings index, the hilbert-clustered document layout the fetch
    * step prunes, and the pre-derived query phrase (the corpus's top
    * trigram — corpus-derived CONFIG, computed at build time so the
    * serve path never re-scans the corpus to formulate it). */
  private val servedSearchBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, (String, String, Seq[String])]()

  private def servedSearch(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String, Seq[String]) = {
    val fp = java.lang.Long.toHexString(
      Tables.fingerprint(spark, dir, Seq("documents")))
    servedSearchBuilt.computeIfAbsent(s"$dir|$fp", _ => {
      val d = Tables.load(spark, dir, "documents")
      val pPath = scratchPath(s"postings_serve_$fp")
      graft.operators.Postings.writeIndex(
        graft.operators.Postings.build(d, "doc_id", "text"), pPath,
        nBuckets = 64)
      val dPath = scratchPath(s"docs_clustered_$fp")
      graft.operators.Zorder.writeBest(d, dPath, Seq("doc_id", "n_chars"),
        bits = 16, numFiles = 32)
      (pPath, dPath, graft.operators.Postings.topNgram(d, "text", n = 2))
    })
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- Text analysis: lang-ID heuristic + quality + token counts -----
    QueryDef(
      "q30_text_stats",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        d.select(
          col("doc_id"),
          Text.langId(col("text")).as("lang_id"),
          Text.tokenCount(col("text")).as("n_tokens"),
          Text.bpeTokenCount(col("text")).as("n_bpe"),
          Text.qualityScore(col("text")).as("quality"),
          Text.contentHash(col("text")).as("content_hash"))
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
        )
        SELECT doc_id,
               CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                    WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
                    WHEN s_es > s_en AND s_es > s_fr THEN 'es'
                    WHEN s_fr > s_en THEN 'fr'
                    WHEN s_en > 0 THEN 'en'
                    ELSE 'und' END AS lang_id,
               n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
               round(
                 least(1.0, (s_en+s_de+s_es+s_fr)::DOUBLE * 3.0 / greatest(n_tokens::DOUBLE, 1.0)) * 0.2
                 + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE / greatest(n_chars::DOUBLE, 1.0) * 0.4
                 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2
                 + (CASE WHEN n_chars::DOUBLE / greatest(n_tokens::DOUBLE, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
               , 6) AS quality,
               md5(norm) AS content_hash
        FROM s""")),

    // ----- Exact dedup: content-hash groupBy, min-id survivor -----
    QueryDef(
      "q31_dedup_exact",
      (spark, dir) =>
        Dedup.exact(Tables.load(spark, dir, "documents"), "doc_id", "text"),
      Some("""
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents
        GROUP BY 1""")),

    // ----- Incremental exact dedup vs a stored hash index -----
    // The daily-ingest path: docs < 400 are the historical corpus,
    // existing only as its (content_hash, keep_id) index; the batch is
    // the rest PLUS two planted re-ingests — docs < 30 re-arrive under
    // new ids (dups vs the INDEX, must drop) and docs >= 490 arrive
    // twice within the batch (dups WITHIN the batch, min id survives).
    // Output = the updated index, so the oracle hash-checks both rules
    // end-to-end. The corpus text is never re-read — only its hashes.
    QueryDef(
      "q81_dedup_incremental",
      (spark, dir) => {
        val (index, batch) = plantedIncrementalScenario(spark, dir)
        val (_, updatedIndex) =
          Dedup.exactAgainstIndex(batch, "doc_id", "text", index)
        updatedIndex
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
          FROM documents
        ), idx AS (
          SELECT content_hash, min(doc_id) AS keep_id
          FROM h WHERE doc_id < 400 GROUP BY 1
        ), batch AS (
          SELECT doc_id, content_hash FROM h WHERE doc_id >= 400
          UNION ALL
          SELECT doc_id + 100000000, content_hash FROM h WHERE doc_id < 30
          UNION ALL
          SELECT doc_id + 200000000, content_hash FROM h WHERE doc_id >= 490
        ), bf AS (
          SELECT content_hash, min(doc_id) AS keep_id FROM batch GROUP BY 1
        ), novel AS (
          SELECT b.content_hash, b.keep_id FROM bf b
          WHERE NOT EXISTS (SELECT 1 FROM idx i
                            WHERE i.content_hash = b.content_hash)
        )
        SELECT content_hash, keep_id FROM idx
        UNION ALL
        SELECT content_hash, keep_id FROM novel""")),

    // ----- Incremental exact dedup behind a bloom pre-test -----
    // q81's scenario routed through Dedup.exactAgainstIndexBloom: a
    // bloom filter of the historical index keys (built once per index
    // epoch) classifies bloom-NEGATIVE batch hashes as definitely
    // novel with a zero-shuffle codegen'd filter — no false negatives
    // — and only bloom positives (true dups + fpp) reach the exact
    // anti-join confirm, so at 100 TB the join probe side shrinks to
    // (dup rate + fpp) × batch. The result is EXACT (positives are
    // confirmed against the real index), which is why a plain
    // anti-join oracle can hash-check it: same answer, radically less
    // join input. Output = the admitted novel documents.
    QueryDef(
      "q92_dedup_bloom",
      (spark, dir) => {
        val (index, batch) = plantedIncrementalScenario(spark, dir)
        val bloom = Bloom.build(index, col("content_hash"),
          expectedItems = 1000L, fpp = 0.01)
        val (survivors, _) =
          Dedup.exactAgainstIndexBloom(batch, "doc_id", "text", index, bloom)
        survivors.select(col("doc_id"),
          Text.contentHash(col("text")).as("content_hash"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
          FROM documents
        ), idx AS (
          SELECT content_hash, min(doc_id) AS keep_id
          FROM h WHERE doc_id < 400 GROUP BY 1
        ), batch AS (
          SELECT doc_id, content_hash FROM h WHERE doc_id >= 400
          UNION ALL
          SELECT doc_id + 100000000, content_hash FROM h WHERE doc_id < 30
          UNION ALL
          SELECT doc_id + 200000000, content_hash FROM h WHERE doc_id >= 490
        ), bf AS (
          SELECT content_hash, min(doc_id) AS doc_id FROM batch GROUP BY 1
        )
        SELECT b.doc_id, b.content_hash FROM bf b
        WHERE NOT EXISTS (SELECT 1 FROM idx i
                          WHERE i.content_hash = b.content_hash)""")),

    // ----- Embedding cluster profiling: per-label centroid + cohesion -----
    // The embedding-space health report a pipeline runs before trusting
    // labels/clusters at scale: per label, the element-wise mean vector
    // (centroid), its norm, and the cosine-to-centroid cohesion stats.
    // Scale shape: posexplode's (label, pos) partial aggregate reduces
    // each map task to ≤ labels × dim cells BEFORE the shuffle, so the
    // exchange moves kilobytes regardless of corpus size; the 10-row
    // centroid table broadcasts into the scoring pass (one corpus scan,
    // no second shuffle of vectors); the final rollup shuffles one row
    // per vector. The unit-norm corpus makes cohesion_mean == |centroid|
    // — an identity (mean v·c/|c| = |c| when |v| = 1), not a bug, and
    // the oracle reproduces it bit-for-bit. cohesion_min is the
    // outlier/mislabel signal. Float vectors cast to double ONCE on
    // both engines so the arithmetic is identical.
    QueryDef(
      "q93_embed_centroids",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("vec"))
        val cent = e.select(col("label"), posexplode(col("vec")).as(Seq("pos", "x")))
          .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("c"))
          .groupBy(col("label"))
          .agg(collect_list(struct(col("pos"), col("c"))).as("pc"))
          .select(col("label"),
            Text.inPositionOrder(col("pc"), "c").as("cvec"))
          .withColumn("centroid_norm",
            sqrt(aggregate(col("cvec"), lit(0.0d), (a, x) => a + x * x)))
        e.join(broadcast(cent), Seq("label"))
          .select(col("label"), col("centroid_norm"),
            Similarity.cosine(col("vec"), col("cvec")).as("cos"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(first(col("centroid_norm")), 6).as("centroid_norm"),
            round(avg(col("cos")), 6).as("cohesion_mean"),
            round(min(col("cos")), 6).as("cohesion_min"))
      },
      Some("""
        WITH v AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
        ), cells AS (
          SELECT label, u.pos, u.x
          FROM (SELECT label,
                       unnest([{'pos': i, 'x': vec[i]}
                               for i in range(1, len(vec)+1)]) AS u
                FROM v)
        ), c AS (
          SELECT label, pos, avg(x) AS c FROM cells GROUP BY 1, 2
        ), cent AS (
          SELECT label, list(c ORDER BY pos) AS cvec FROM c GROUP BY 1
        ), scored AS (
          SELECT v.label, cent.cvec,
                 CASE WHEN list_dot_product(v.vec, v.vec) = 0
                        OR list_dot_product(cent.cvec, cent.cvec) = 0 THEN 0.0
                      ELSE list_dot_product(v.vec, cent.cvec)
                           / (sqrt(list_dot_product(v.vec, v.vec))
                              * sqrt(list_dot_product(cent.cvec, cent.cvec))) END AS cos
          FROM v JOIN cent USING (label)
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               round(any_value(sqrt(list_dot_product(cvec, cvec))), 6) AS centroid_norm,
               round(avg(cos), 6) AS cohesion_mean,
               round(min(cos), 6) AS cohesion_min
        FROM scored GROUP BY 1""")),

    // ----- N-gram Jaccard near-dup via inverted-index join -----
    // Oracle computes exact all-pairs Jaccard with list ops (fine at
    // sf0.01's 500 docs); the Spark side is the sub-quadratic
    // shingle-join formulation that holds at corpus scale.
    QueryDef(
      "q32_dedup_jaccard",
      (spark, dir) =>
        Dedup.ngramJaccardPairs(Tables.load(spark, dir, "documents"),
          "doc_id", "text", n = 3, tau = 0.8),
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in range(1, len(w) - 1)]) AS s
          FROM toks WHERE len(w) >= 3
        )
        SELECT a.doc_id AS a, b.doc_id AS b,
               len(list_intersect(a.s, b.s))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8"""),
      // bench = false: exact all-pairs Jaccard is the tiny-sf oracle
      // query; its scale form (banded MinHash) is benched as q33
      bench = false),

    // ----- MinHash+LSH near-dup: banded candidates + exact verify -----
    // Output pairs carry their EXACT Jaccard (candidates are verified),
    // so when LSH recall is 1.0 — which 16 bands × 4 rows gives at
    // tau=0.8 on this corpus — the result equals q32's oracle set.
    // Oracle spelling: the INVERTED-INDEX join (unnest shingles,
    // equi-join on shingle, count shared), not q32's all-pairs
    // list_intersect — same integers, bit-identical jaccard, but
    // Σ df² cost instead of n²·|s|, which keeps the 10× (sf0.1)
    // robustness sweep tractable (the r10 exclusion this closes).
    QueryDef(
      "q33_dedup_minhash",
      (spark, dir) =>
        Dedup.minhashNearDups(Tables.load(spark, dir, "documents"),
          "doc_id", "text", n = 3, k = 64, bands = 16, tau = 0.8),
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in range(1, len(w) - 1)]) AS s
          FROM toks WHERE len(w) >= 3
        ), post AS MATERIALIZED (
          SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
        ), inter AS MATERIALIZED (
          SELECT a.doc_id AS a, b.doc_id AS b,
                 CAST(count(*) AS BIGINT) AS c,
                 any_value(a.sz) AS sza, any_value(b.sz) AS szb
          FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT a, b, c::DOUBLE / (sza + szb - c) AS jaccard
        FROM inter
        WHERE c::DOUBLE / (sza + szb - c) >= 0.8""")),
    // (benched: MinHash+LSH is the dedup scale path — its sf0.1 number
    // is the one that matters, unlike the all-pairs oracle forms.)

    // ----- SimHash near-dup: banded Hamming candidates + verify -----
    // xxhash64-derived bit votes have no DuckDB twin → rows-only here;
    // SimHashSpec grades that the pair set ⊇ the planted near-identical
    // pairs and that hamming(a,a)=0.
    QueryDef(
      "q34_dedup_simhash",
      (spark, dir) =>
        Dedup.simhashNearDups(Tables.load(spark, dir, "documents"),
          "doc_id", "text", maxDist = 7),
      None,
      // bench = false: recall-graded diagnostic (DedupSpec ≥0.9); q33 is
      // the benched fuzzy-dedup representative with the same banded shape
      bench = false),

    // ----- Content fingerprint: polynomial rolling hash -----
    QueryDef(
      "q35_fingerprint",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        d.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      },
      Some("""
        SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   [ascii(c)::BIGINT for c in
                     string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '')]),
                 (acc, cp) -> (acc * 31 + cp) % 1000000007) AS fp
        FROM documents"""),
      // bench = false: golden cross-engine hash parity check (interpreted
      // per-char fold); scale content identity is md5 — q31, benched
      bench = false),

    // ----- Brute-force cosine top-k (exact ANN baseline) -----
    // Query set = vec_id < 10 (broadcast); corpus = all vectors. Cosine
    // rounded to 6 digits at the output boundary on both engines.
    QueryDef(
      "q37_embed_knn",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 10)
          .withColumn("cos", round(col("cos"), 6))
      },
      Some("""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
                   FROM embeddings WHERE vec_id < 10),
             c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cvec
                   FROM embeddings),
             scored AS (
               SELECT query_id, neighbor_id,
                      CASE WHEN list_dot_product(cvec, cvec) = 0
                             OR list_dot_product(qvec, qvec) = 0 THEN 0.0
                           ELSE list_dot_product(cvec, qvec)
                                / (sqrt(list_dot_product(cvec, cvec))
                                   * sqrt(list_dot_product(qvec, qvec))) END AS cos
               FROM c, q WHERE neighbor_id <> query_id),
             ranked AS (
               SELECT query_id, neighbor_id, cos,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id) AS rank
               FROM scored)
        SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos
        FROM ranked WHERE rank <= 10"""),
      // bench = false: deliberately O(corpus × queries) exact baseline,
      // kept as the ANN recall oracle; the benched scale path is q52
      bench = false),

    // ----- LSH-bucketed ANN (the scale path; recall graded in spec) -----
    QueryDef(
      "q38_ann_lsh",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        Similarity.annTopK(e, e.filter(col("vec_id") < 10), k = 10)
          .withColumn("cos", round(col("cos"), 6))
      },
      None,
      // bench = false: recall-graded in SimilaritySpec; q52 (IVF) is the
      // benched ANN representative — same bucket-equi-join cost shape
      bench = false),

    // ----- IVF ANN (cluster-partitioned scale path; recall in IvfSpec) -----
    // k-means centroids are trained inside the call (deterministic
    // hash-order seeding), so the row set is stable run-to-run; it is
    // still engine-specific (no DuckDB k-means) → rows-only check here,
    // exactness-when-probing-all-lists graded in IvfSpec.
    QueryDef(
      "q52_ann_ivf",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        // trainFraction < 1: k-means trains on a deterministic hash
        // sample — the scale path (16 centroids need thousands of
        // vectors, not the corpus; at 100 TB training never scans all
        // data). Probe-time exactness is independent of centroid
        // quality (IvfSpec: nprobe = k degrades to brute force).
        Ivf.ivfTopK(e, e.filter(col("vec_id") < 10), k = 10,
            nClusters = 16, nprobe = 4, trainFraction = 0.25)
          .withColumn("cos", round(col("cos"), 6))
      },
      None), // benched: IVF is the ANN scale path

    // ----- On-disk IVF: partitioned index write + pruned probe -----
    // The layout that carries q52's 100 TB story: writeIndex persists
    // the inverted lists partitionBy("cluster"); probeIndex pushes the
    // probed cluster ids as a static partition filter, so the scan
    // lists and reads ONLY the probed directories — nprobe/k of the
    // corpus, zero I/O for the rest (IvfSpec asserts PartitionFilters,
    // the exact probed file set, and disk == memory results). Rows-only
    // like q52: k-means centroid arithmetic is not DuckDB-reproducible.
    // Fixed scratch path + overwrite, like q21, so repeated invocations
    // reuse it. Benched: expect ≈ q52 + the index-write cost.
    QueryDef(
      "q79_ann_ivf_disk",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val path = scratchPath("ivf_index")
        val centroids = Ivf.writeIndex(e, path, nClusters = 16,
          trainFraction = 0.25)
        Ivf.probeIndex(spark, path, centroids,
            e.filter(col("vec_id") < 10), k = 10)
          .withColumn("cos", round(col("cos"), 6))
      },
      None),

    // ----- Embedding near-dup: exact cosine ≥ 0.45 pairs -----
    // (Threshold calibrated to the synthetic corpus: its top pair
    // cosine is ~0.51, so 0.45 yields a small non-empty pair set.)
    // Candidates come from multi-table LSH (equi-join on (table,
    // bucket) — no BroadcastNestedLoopJoin anywhere in the plan), then
    // exact cosine verifies each candidate. The inner prune runs at a
    // margin below the declared threshold (0.445 < round-6 boundary
    // 0.4499995) so the rounded filter here decides membership exactly
    // as the oracle's rounded filter does. Pair-set equality with the
    // exact all-pairs form is additionally pinned by CosineNearDupSpec.
    QueryDef(
      "q39_embed_neardup",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        // tables = 64 (not the operator's 24-table default): this is
        // the ORACLE-PARITY spelling, and parity needs candidate
        // recall ≈ 1 down to the weakest in-threshold angle. At the
        // corpus-calibrated τ = 0.45 (θ ≈ 63°), 24 tables leave a ~1%
        // miss per barely-above-threshold pair — one such miss
        // surfaced REAL in the round-10 sf0.1 sweep (cos 0.45191,
        // 1-in-144). 64 tables put the per-pair miss at ~3e-6
        // (1 − (1 − (1 − θ/π)^4)^64), negligible at any tested sf;
        // completeness stays knob-governed BY DESIGN (the operator
        // scaladoc's knob physics) — at production thresholds
        // (τ ≥ 0.8) far fewer tables reach the same recall.
        Similarity.cosineNearDupPairs(e, tau = 0.445, tables = 64)
          .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
          .filter(col("cos") >= 0.45)
      },
      Some("""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(CASE WHEN list_dot_product(a.vec, a.vec) = 0
                            OR list_dot_product(b.vec, b.vec) = 0 THEN 0.0
                          ELSE list_dot_product(a.vec, b.vec)
                               / (sqrt(list_dot_product(a.vec, a.vec))
                                  * sqrt(list_dot_product(b.vec, b.vec))) END, 6) AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE round(CASE WHEN list_dot_product(a.vec, a.vec) = 0
                           OR list_dot_product(b.vec, b.vec) = 0 THEN 0.0
                         ELSE list_dot_product(a.vec, b.vec)
                              / (sqrt(list_dot_product(a.vec, a.vec))
                                 * sqrt(list_dot_product(b.vec, b.vec))) END, 6) >= 0.45"""),
      // bench = false: parity form against a quadratic DuckDB oracle; the
      // bucketed candidate join it exercises is benched inside q75's
      // near-dup stage
      bench = false),

    // ----- Multimodal: decode-stub metadata + feature aggregation -----
    // Binary payload plumbing through typed Dataset stages. Every
    // payload here resolves to the deterministic STUB (see
    // Multimodal.fakeDecode scaladoc) — LOAD-BEARING invariant: since
    // r11, Multimodal.decode tries a REAL javax.imageio decode on
    // kind=='image' records first, and this oracle models only the
    // stub. It holds because syntheticMedia payloads are corpus TEXT
    // bytes: ImageIO dispatches on container magic (PNG \x89PNG, JPEG
    // \xFF\xD8, BMP 'BM'+valid header, GIF 'GIF8xa'+descriptor), and
    // a natural-text prefix either matches no reader or fails parsing
    // (caught -> stub). If this corpus ever plants REAL image bytes,
    // the Spark side would emit pixel metadata and this oracle must
    // be re-derived — the mismatch would fail the gate loudly, not
    // silently. Deterministic means ORACLE-CHECKABLE: the stub's metadata is a
    // 31-polynomial byte hash (Java Arrays.hashCode) of the payload,
    // which DuckDB reproduces with a list_reduce over code points (the
    // corpus is pure ASCII, so code point == UTF-8 byte; mod 2^31
    // throughout — `& 0x7fffffff` is mod 2^31 and mod is a ring hom,
    // so reducing mod 2^31 per step equals Java's wrapping int math).
    // payload_md5 grades the binary round-trip through the typed
    // Dataset encoders; the float feature values are snapped back to
    // their exact nibble/15 definition in double before the sum, so
    // the 6-digit boundary can't flip on float32 accumulation error.
    // The remaining spec-graded half (MultimodalSpec): frame sampling,
    // resize, per-partition batch shape.
    QueryDef(
      "q40_multimodal_meta",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val media = Multimodal.syntheticMedia(spark, docs)
        val integrity = media.toDF().select(col("mediaId"),
          md5(col("payload")).as("payload_md5"))
        Multimodal.decode(media).toDF()
          .join(integrity, "mediaId")
          .select(col("mediaId").as("media_id"), col("meta.kind").as("kind"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            col("meta.durationMs").as("duration_ms"),
            round(aggregate(col("features"), lit(0.0d),
              (acc, v) => acc + round(v.cast("double") * 15) / lit(15.0d)),
              6).as("feat_sum"),
            col("payload_md5"))
      },
      Some("""
        WITH m AS (
          SELECT doc_id AS media_id,
                 ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
                 text
          FROM documents
        ), h AS (
          SELECT media_id, kind, text,
                 list_reduce(
                   list_prepend(1::BIGINT,
                     [unicode(c)::BIGINT for c in regexp_split_to_array(text, '')]),
                   (acc, c) -> (31*acc + c) % 2147483648) AS h
          FROM m
        )
        SELECT media_id, kind,
               CAST(h % 1920 + 64 AS INT) AS width,
               CAST(h % 1080 + 64 AS INT) AS height,
               CASE WHEN kind = 'image' THEN 0 ELSE h % 600000 END AS duration_ms,
               round(list_sum(
                 [((h // (1::BIGINT << (i*4))) % 16) / 15.0 for i in range(0, 8)]),
                 6) AS feat_sum,
               md5(text) AS payload_md5
        FROM h"""),
      // bench = false: the decode stage is an honest stub (no codec libs
      // in the sandbox) — timing synthetic bytes would be a fake number
      bench = false),

    // ----- Dedup grouping: near-dup pairs → connected components -----
    // The keep-one-per-group stage every near-dup pipeline ends with:
    // MinHash pairs (whose pair set hash-matches the exact-Jaccard
    // oracle, q33) become groups via alternating large-star/small-star,
    // and every document maps to its group's minimum doc_id (itself
    // when it has no near-dup). Oracle = recursive-CTE min-label
    // propagation over the same exact pair set.
    QueryDef(
      "q69_dedup_groups",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
            n = 3, k = 64, bands = 16, tau = 0.8)
          .select(col("a"), col("b"))
        Components.dedupGroups(d.select(col("doc_id")), pairs)
      },
      Some("""
        WITH RECURSIVE toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in range(1, len(w) - 1)]) AS s
          FROM toks WHERE len(w) >= 3
        ), post AS MATERIALIZED (
          SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
        ), pairs AS MATERIALIZED (
          -- inverted-index spelling (equi-join on shingle, count
          -- shared): same integers as all-pairs list_intersect at
          -- Σ df² cost instead of n²·|s| — keeps the sf0.1 sweep
          -- tractable (the r10 exclusion this closes)
          SELECT a, b FROM (
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS c,
                   any_value(a.sz) AS sza, any_value(b.sz) AS szb
            FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          WHERE c::DOUBLE / (sza + szb - c) >= 0.8
        ), edges AS (
          SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.a AS node, r.lbl FROM reach r JOIN edges e ON e.b = r.node
        )
        SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS keep_id
        FROM reach GROUP BY node""")
      // benched: components is the dedup-grouping scale path; its cost
      // rides on the same MinHash pipeline q33 already measures.
    ),

    // ----- Quality-aware dedup: keep the BEST group member -----
    // [[graft.operators.Components.dedupGroupsBest]]: q69's groups,
    // but each document maps to its group's LONGEST member (n_chars
    // desc, id tiebreak) — the RefinedWeb/FineWeb keep-best policy,
    // which measurably beats keep-any downstream. Oracle = q69's
    // recursive-CTE components + an argmax window over the same
    // grouping, so the hash-match proves the representative choice
    // end-to-end.
    QueryDef(
      "q137_dedup_keep_best",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
            n = 3, k = 64, bands = 16, tau = 0.8)
          .select(col("a"), col("b"))
        Components.dedupGroupsBest(
          d.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", pairs)
      },
      Some("""
        WITH RECURSIVE toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in range(1, len(w) - 1)]) AS s
          FROM toks WHERE len(w) >= 3
        ), post AS MATERIALIZED (
          SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
        ), pairs AS MATERIALIZED (
          -- inverted-index spelling (equi-join on shingle, count
          -- shared): same integers as all-pairs list_intersect at
          -- Σ df² cost instead of n²·|s| — keeps the sf0.1 sweep
          -- tractable (the r10 exclusion this closes)
          SELECT a, b FROM (
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS c,
                   any_value(a.sz) AS sza, any_value(b.sz) AS szb
            FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          WHERE c::DOUBLE / (sza + szb - c) >= 0.8
        ), edges AS (
          SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.a AS node, r.lbl FROM reach r JOIN edges e ON e.b = r.node
        ), grp AS (
          SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS keep_id
          FROM reach GROUP BY node
        )
        SELECT g.doc_id,
               first(g.doc_id) OVER (PARTITION BY g.keep_id
                                     ORDER BY d.n_chars DESC, g.doc_id) AS best_id
        FROM grp g JOIN documents d USING (doc_id)"""),
      // bench = false: rides the same MinHash pipeline q33/q69 already
      // measure; the argmax window adds only group-sized work
      bench = false),

    // ----- PQ-prefiltered ANN (product quantization, ADC) -----
    // [[graft.operators.Pq]] (Jégou et al. 2011): 8 subspace codebooks
    // of 16 codes — 4 logical bytes per vector vs 256 float bytes
    // (64×) — shortlist by asymmetric-distance inner product over the
    // codes-only scan, exact cosine on the shortlist. Completes the
    // quantization levers beside SQ8 (byte width, q91) and JL
    // (dimension count, q123). Rows-only like the other trained-ANN
    // paths (k-means codebooks aren't oracle-reproducible); PqSpec
    // pins encode arithmetic, the full-shortlist ⇒ exact contract,
    // and deterministic recall.
    QueryDef(
      "q138_pq_ann",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val cbs = graft.operators.Pq.trainCodebooks(e, dim = 64, m = 8,
          k = 16, iters = 2, trainFraction = 0.5)
        graft.operators.Pq.adcPrefilterTopK(e, e.filter(col("vec_id") < 10),
            k = 10, nCand = 100, cbs)
          .withColumn("cos", round(col("cos"), 6))
      },
      None),

    // ----- On-disk PQ: persisted codes index + incremental append -----
    // The encode-once/probe-many artifact that carries q138's 100 TB
    // story: [[Pq.writeIndex]] persists the (id, codes) scan — 64×
    // smaller than the floats — and the probe reads codes, never
    // re-encoding the corpus; floats are touched only for the
    // nCand-per-query exact rescore. This query exercises the full
    // daily-ingest lifecycle: write HALF the corpus, append the rest
    // through the PINNED codebooks ([[Pq.appendIndex]] — codes are
    // pure facts under a fixed quantizer, so append == rebuild
    // exactly; the `_graft_codebooks` marker fails fast on a quantizer
    // mismatch), then serve from the index. Same training config as
    // q138, so this must produce q138's exact rows (CONTRACTS.json
    // grades fromIndex == in-memory and append == rebuild at 1.0;
    // PqSpec pins both). Rows-only: k-means codebooks aren't
    // oracle-reproducible. Benched: expect ≈ q138 + the index write.
    QueryDef(
      "q170_pq_index",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val cbs = graft.operators.Pq.trainCodebooks(e, dim = 64, m = 8,
          k = 16, iters = 2, trainFraction = 0.5)
        val path = scratchPath("pq_index")
        // even/odd halves: a scale-independent split (a fixed id cutoff
        // would leave the append empty at small sfs)
        graft.operators.Pq.writeIndex(
          e.filter(pmod(col("vec_id"), lit(2)) === 0), path, cbs)
        graft.operators.Pq.appendIndex(
          e.filter(pmod(col("vec_id"), lit(2)) === 1), path, cbs)
        graft.operators.Pq.adcPrefilterTopKFromIndex(spark, path, e,
            e.filter(col("vec_id") < 10), k = 10, nCand = 100, cbs)
          .withColumn("cos", round(col("cos"), 6))
      },
      None),

    // ----- IVF+PQ: the composed index (prune × compress) -----
    // [[graft.operators.IvfPq]] — the Jégou et al. IVFADC shape:
    // IVF's coarse quantizer prunes WHICH lists a probe reads
    // (partition filter, zero I/O outside the probed directories) and
    // PQ's codes shrink WHAT each list stores (4 logical bytes/vector
    // at m=8,k=16). The levers multiply — at production settings
    // (nClusters=4096, nprobe=64) a 100 TB float corpus serves from
    // ~25 GB of touched codes per probe batch. Exactness certified by
    // IvfPqSpec + CONTRACTS.json (probe-all + full-shortlist == brute
    // force, rank included); registered config graded on recall per
    // bench run. Rows-only: doubly-trained k-means isn't
    // oracle-reproducible. Benched: expect ≈ q79's write + a cheaper
    // probe (codes, not floats, inside the pruned lists).
    QueryDef(
      "q171_ann_ivfpq",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val cents = graft.operators.Ivf.trainCentroids(e, 16, iters = 3,
          trainFraction = 0.25)
        val cbs = graft.operators.Pq.trainCodebooks(e, dim = 64, m = 8,
          k = 16, iters = 2, trainFraction = 0.5)
        val path = scratchPath("ivfpq_index")
        graft.operators.IvfPq.writeIndex(e, path, cents, cbs)
        graft.operators.IvfPq.probeIndex(spark, path, e, cents, cbs,
            e.filter(col("vec_id") < 10), k = 10, nprobe = 4, nCand = 100)
          .withColumn("cos", round(col("cos"), 6))
      },
      None),

    // ----- IVFADC: residual-refined IVF+PQ, tight shortlist -----
    // The full Jégou et al. IVFADC: codes quantize the RESIDUAL
    // `vec − centroid[cluster]` (within one list every vector shares a
    // centroid, so residuals span a tighter range and the same m×k
    // codebook budget quantizes them with less error), and the probe's
    // shortlist score is exact-dot(q, centroid) + ADC(q, residual).
    // Registered at the TIGHT shortlist (nCand=20): that is where
    // residual precision pays — IndexProbe measures recall@10 0.27 vs
    // the raw coding's 0.20 at nCand=20, converging at nCand ≥ 50
    // where the shortlist saturates the probed lists — and the tight
    // shortlist IS the 100 TB serving regime (the exact-rescore float
    // fetches per query stay small). Exactness certificate and
    // registered recall graded in CONTRACTS.json; IvfPqSpec pins
    // probe-all+full-shortlist == brute, residual append == rebuild,
    // and that raw-coded and residual-coded layouts never mix (the
    // `ivfpq-res` marker flavor). Rows-only like its ANN siblings.
    QueryDef(
      "q173_ann_ivfadc",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val cents = graft.operators.Ivf.trainCentroids(e, 16, iters = 3,
          trainFraction = 0.25)
        val cbs = graft.operators.IvfPq.trainResidualCodebooks(e, cents,
          dim = 64, m = 8, k = 16, iters = 2, trainFraction = 0.5)
        val path = scratchPath("ivfadc_index")
        graft.operators.IvfPq.writeIndexResidual(e, path, cents, cbs)
        graft.operators.IvfPq.probeIndexResidual(spark, path, e, cents, cbs,
            e.filter(col("vec_id") < 10), k = 10, nprobe = 4, nCand = 20)
          .withColumn("cos", round(col("cos"), 6))
      },
      None),

    // ----- ANN serving: probe-only against the session-cached index -----
    // q170–q173 bench the full lifecycle (train + write + probe) per
    // rep, which is the BUILD cost; the number a 100 TB user actually
    // plans capacity around is the SERVE cost — one probe against an
    // index that already exists. This row registers it: the IVFPQ
    // index (q171's exact config) is built ONCE per (JVM, dir,
    // source-fingerprint) by [[servedIvfPq]] and every execution —
    // every bench rep after the warmup — runs ONLY the probe: the
    // partition-pruned codes scan, the broadcast ADC shortlist, and
    // the nCand-bounded float rescore. BENCH_DETAIL's q174 wall time
    // IS the registered serve-only latency (PLANS.md records the
    // per-layout IndexProbe timings beside it). The source
    // fingerprint in the cache key ([[Tables.fingerprint]]) forces a
    // rebuild if the embeddings parquet is regenerated mid-JVM —
    // serving a stale index would silently rank the old corpus.
    // Rows-only like its ANN siblings; CONTRACTS.json grades
    // serve == build-run parity at 1.0.
    QueryDef(
      "q174_ann_serve",
      (spark, dir) => {
        val (path, cents, cbs) = servedIvfPq(spark, dir)
        val e = Tables.load(spark, dir, "embeddings")
        graft.operators.IvfPq.probeIndex(spark, path, e, cents, cbs,
            e.filter(col("vec_id") < 10), k = 10, nprobe = 4, nCand = 100)
          .withColumn("cos", round(col("cos"), 6))
      },
      None),

    // ----- Composed serving flagship: the production read path -----
    // One request answered ENTIRELY from persisted artifacts — the
    // end-to-end shape a 100 TB deployment actually runs per query,
    // with zero corpus scans on the serve path:
    //   1. phrase filter through the postings index (q166's layout,
    //      bucket-pruned scan — the candidate doc set);
    //   2. ANN shortlist through the session-cached IVFPQ index
    //      (q174's layout, partition-pruned codes scan, nprobe=4,
    //      nCand=200, k=50 pre-filter headroom);
    //   3. intersect on fixed-width doc ids (broadcast — phrase hits
    //      are index-derived, never text), re-rank by exact cosine,
    //      top 10 per query;
    //   4. fetch serving metadata from the hilbert-CLUSTERED document
    //      layout ([[graft.operators.Zorder.writeBest]] on
    //      (doc_id, n_chars)) — the bounded id set (≤ 10 queries × 10
    //      docs, the IVF probe discipline) pushes down and prunes
    //      files by the layout's tight per-file doc_id bounds.
    // All three artifacts are built once per (JVM, dir, fingerprint)
    // ([[servedSearch]]/[[servedIvfPq]]); every bench rep after warmup
    // pays only index reads — BENCH_DETAIL's q179 wall time is the
    // composed serve latency. The doc-id ↔ vec_id identification is
    // the corpus convention (embeddings embed documents 0..nEmb-1).
    // Rows-only like its ANN siblings; CONTRACTS.json grades
    // serve == from-scratch composition parity at 1.0 per bench run.
    QueryDef(
      "q179_serve_flagship",
      (spark, dir) => {
        val (pPath, dPath, phrase) = servedSearch(spark, dir)
        val (iPath, cents, cbs) = servedIvfPq(spark, dir)
        val e = Tables.load(spark, dir, "embeddings")
        val phraseDocs = graft.operators.Postings
          .phraseOccurrencesFromIndex(spark, pPath, phrase, nBuckets = 64)
          .withColumnRenamed("doc_id", "neighbor_id")
        val ann = graft.operators.IvfPq.probeIndex(spark, iPath, e, cents,
            cbs, e.filter(col("vec_id") < 10), k = 50, nprobe = 4,
            nCand = 200)
          .drop("rank")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        // materialization barrier: the ids collect below AND the final
        // fetch join both consume topk — without the barrier the whole
        // probe+join+window pipeline executes TWICE per serve call and
        // the benched serve latency doubles (the Barrier discipline
        // from the curation flagships; ≤ 100 tiny rows materialized)
        val topk = graft.operators.Barrier.materialize(
          ann.join(broadcast(phraseDocs), Seq("neighbor_id"))
            .withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 10))
        // bounded driver collect (≤ 100 longs): the served ids become a
        // static pushed predicate on the clustered fetch — file-level
        // pruning via the layout's per-file doc_id bounds, never a scan
        val ids = topk.select(col("neighbor_id")).distinct()
          .collect().map(_.getLong(0)).sorted
        val fetched = graft.operators.Zorder.readClustered(spark, dPath)
          .filter(col("doc_id").isin(ids.map(Long.box): _*))
          .select(col("doc_id").as("neighbor_id"), col("source"),
            col("n_chars"))
        topk.join(broadcast(fetched), Seq("neighbor_id"))
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank"), round(col("cos"), 6).as("cos"), col("n_occ"),
            col("source"), col("n_chars"))
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ----- Image near-dup: REAL pixels → dHash → banded Hamming -----
    // The multimodal face of the dedup family: deterministic REAL
    // 16×16 PNGs rendered from each document ([[Multimodal
    // .syntheticImages]] — char-class histogram bars, so near-dup
    // texts yield near-dup pixels), fingerprinted with the 64-bit
    // difference hash over a 9×8 bilinear downscale, paired by the
    // banded Hamming join (4×16-bit bands — the text-LSH discipline
    // on perceptual hashes; recall EXACT to Hamming 3 by pigeonhole,
    // NEVER all-pairs). Every 10th image additionally rides a planted
    // RE-ENCODED copy (the real [[Multimodal.resize]] at native size:
    // same pixels, different bytes — the duplicate class a real image
    // lake carries), which MUST land at Hamming 0; CONTRACTS.json
    // grades that recall at 1.0 per bench run, MultimodalSpec pins
    // banded == brute-force pairs and the dHash properties at unit
    // scale. Offset 1e8 keeps planted ids collision-safe at any sf.
    // Rows-only: the pixel pipeline isn't DuckDB-expressible.
    QueryDef(
      "q172_image_neardup",
      (spark, dir) => {
        import spark.implicits._
        val docs = Tables.load(spark, dir, "documents")
        val imgs = Multimodal.syntheticImages(spark, docs)
        val copies = Multimodal.resize(
            imgs.filter(_.mediaId % 10 == 0), 16, 16)
          .map(r => r.copy(mediaId = r.mediaId + 100000000L))
        Multimodal.nearDupImages(imgs.union(copies), maxHamming = 3)
          .orderBy(col("a"), col("b"))
      },
      None),

    // ----- Leakage-safe train/val/test split (group-atomic) -----
    // Splitting documents independently leaks near-duplicates across
    // train and eval — the classic contamination bug a per-document
    // hash split cannot avoid. The safe unit is the NEAR-DUP GROUP:
    // assign each q69 component (keep_id) a split by seeded md5, and
    // every member inherits it, so a doc and its near-dups land in the
    // same split by construction. Hex-string range thresholds give
    // deterministic ~1/16 test, ~2/16 val, 13/16 train on both
    // engines (md5 is uniform in hex; string comparison is identical).
    // Scale shape: the group table is the only addition over q69 —
    // the split is a scalar projection and a 3-group rollup. Oracle =
    // q69's recursive-CTE components + the same CASE, so the
    // hash-match proves split atomicity end-to-end.
    QueryDef(
      "q96_leakage_safe_split",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
            n = 3, k = 64, bands = 16, tau = 0.8)
          .select(col("a"), col("b"))
        val groups = Components.dedupGroups(d.select(col("doc_id")), pairs)
        val h = md5(concat(lit("split42:"), col("keep_id").cast("string")))
        groups.select(col("doc_id"), col("keep_id"),
            when(h < "1", "test").when(h < "3", "val")
              .otherwise("train").as("split"))
          .groupBy(col("split"))
          .agg(countDistinct(col("keep_id")).as("n_groups"),
            count(lit(1)).as("n_docs"))
      },
      Some("""
        WITH RECURSIVE toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in range(1, len(w) - 1)]) AS s
          FROM toks WHERE len(w) >= 3
        ), post AS MATERIALIZED (
          SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
        ), pairs AS MATERIALIZED (
          -- inverted-index spelling (equi-join on shingle, count
          -- shared): same integers as all-pairs list_intersect at
          -- Σ df² cost instead of n²·|s| — keeps the sf0.1 sweep
          -- tractable (the r10 exclusion this closes)
          SELECT a, b FROM (
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS c,
                   any_value(a.sz) AS sza, any_value(b.sz) AS szb
            FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          WHERE c::DOUBLE / (sza + szb - c) >= 0.8
        ), edges AS (
          SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.a AS node, r.lbl FROM reach r JOIN edges e ON e.b = r.node
        ), groups AS (
          SELECT node AS doc_id, min(lbl) AS keep_id FROM reach GROUP BY node
        ), assigned AS (
          SELECT doc_id, keep_id,
                 CASE WHEN md5(concat('split42:', keep_id)) < '1' THEN 'test'
                      WHEN md5(concat('split42:', keep_id)) < '3' THEN 'val'
                      ELSE 'train' END AS split
          FROM groups
        )
        SELECT split, CAST(count(DISTINCT keep_id) AS BIGINT) AS n_groups,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM assigned GROUP BY 1"""),
      // bench = false: cost is q69's pipeline + a scalar projection —
      // benching it would double-count the components path
      bench = false),

    // ----- Corpus snapshot diff (data versioning) -----
    // The between-crawls report every managed corpus needs: which
    // documents were added, removed, or changed between snapshot v1
    // and v2, detected by normalized content hash — never by comparing
    // bodies. v2 is planted from the same table (v1 = ids < 450, v2 =
    // ids ≥ 50 with every 11th doc edited), mirroring q74's idiom.
    // Scale shape: two narrow hash projections and ONE full outer join
    // on doc_id — fixed-width (id, hash) rows shuffle, multi-KB bodies
    // never do; with both snapshots bucketed by id the join is
    // exchange-free. Unchanged docs (the overwhelming majority at
    // scale) are filtered before output.
    QueryDef(
      "q98_corpus_diff",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        // presence markers, NOT hash nullness, decide added/removed:
        // the full outer join coalesces doc_id, and a NULL content
        // hash (NULL text) must read as "present with null hash", not
        // "absent" — the oracle keys on doc_id presence the same way
        val v1 = d.filter(col("doc_id") < 450)
          .select(col("doc_id"), Text.contentHash(col("text")).as("h1"),
            lit(true).as("in1"))
        val v2 = d.filter(col("doc_id") >= 50)
          .select(col("doc_id"), Text.contentHash(
            concat(col("text"), when(col("doc_id") % 11 === 0,
              " [edited v2]").otherwise(""))).as("h2"),
            lit(true).as("in2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when(col("in1").isNull, "added")
              .when(col("in2").isNull, "removed")
              .when(!(col("h1") <=> col("h2")), "changed")
              .otherwise("unchanged"))
          .filter(col("status") =!= "unchanged")
          .select(col("doc_id"), col("status"))
      },
      Some("""
        WITH v1 AS (
          SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h1
          FROM documents WHERE doc_id < 450
        ), v2 AS (
          -- || not concat(): DuckDB concat() IGNORES null arguments
          -- while Spark's propagates NULL; || propagates like Spark,
          -- keeping NULL-text rows classified identically on both
          -- engines (hash NULL on both sides -> unchanged)
          SELECT doc_id,
                 md5(lower(trim(regexp_replace(
                   text || CASE WHEN doc_id % 11 = 0
                           THEN ' [edited v2]' ELSE '' END,
                   '\s+', ' ', 'g')))) AS h2
          FROM documents WHERE doc_id >= 50
        )
        SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
               CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    WHEN h1 <> h2 THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        WHERE CASE WHEN v1.doc_id IS NULL THEN 'added'
                   WHEN v2.doc_id IS NULL THEN 'removed'
                   WHEN h1 <> h2 THEN 'changed'
                   ELSE 'unchanged' END <> 'unchanged'""")),

    // ----- SemDeDup: embedding-space semantic dedup (Abbas et al.) -----
    // Within each cluster, pairs at round(cos,6) ≥ 0.45 form groups;
    // every vector maps to its group's min id (itself when unique) —
    // the q69 contract in embedding space. Clustering here is the
    // `label` column (a trained k-means assignment is float-iteration-
    // dependent — no engine-portable oracle; the k-means form is
    // SemDedupSpec-graded over the same core). The DuckDB twin
    // recomputes within-label all-pairs cosine exactly and resolves
    // groups with q69's recursive label propagation, so the hash-match
    // proves pair generation, thresholding, components, and survivor
    // choice end-to-end. Scale shape: see [[SemDedup.withClusters]] —
    // one cluster-keyed vector shuffle per side, pairs never shuffled,
    // Σ|cell|² bounded by nClusters growing with the corpus.
    QueryDef(
      "q99_semantic_dedup",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        SemDedup.withClusters(e, tau = 0.45)
      },
      Some("""
        WITH RECURSIVE v AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
        ), pairs AS (
          SELECT a.vec_id AS a, b.vec_id AS b
          FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE round(CASE WHEN list_dot_product(a.vec, a.vec) = 0
                             OR list_dot_product(b.vec, b.vec) = 0 THEN 0.0
                           ELSE list_dot_product(a.vec, b.vec)
                                / (sqrt(list_dot_product(a.vec, a.vec))
                                   * sqrt(list_dot_product(b.vec, b.vec))) END, 6) >= 0.45
        ), edges AS (
          SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
        ), reach(node, lbl) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT e.a AS node, r.lbl FROM reach r JOIN edges e ON e.b = r.node
        )
        SELECT node AS vec_id, CAST(min(lbl) AS BIGINT) AS keep_id
        FROM reach GROUP BY node""")),

    // ----- Semantic decontamination (embedding-space eval screening) -----
    // The embedding-space counterpart of q73's n-gram decontamination:
    // flag every training vector whose max cosine against the held-out
    // eval set (vec_id % 50 = 0, 2% of the corpus — benchmark-sized)
    // reaches 0.8. The flag compares the ROUNDED max on both engines
    // so a last-ulp cosine difference cannot flip it. Scale shape: see
    // [[Similarity.maxCosineAgainst]] — broadcast probes, one corpus
    // pass, per-vector max partial-aggregated before the exchange;
    // `max` is order-independent so there is no summation-order
    // caveat. PlanInvariantsSpec allowlists the broadcast-probe
    // nested-loop as it does q37's.
    QueryDef(
      "q102_semantic_decontaminate",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        Similarity.maxCosineAgainst(
            e.filter(col("vec_id") % 50 =!= 0),
            e.filter(col("vec_id") % 50 === 0))
          .select(col("vec_id"), round(col("max_cos"), 6).as("max_cos"))
          .withColumn("contaminated", col("max_cos") >= 0.8)
      },
      Some("""
        WITH ev AS (
          SELECT embedding::DOUBLE[] AS pvec
          FROM embeddings WHERE vec_id % 50 = 0),
        tr AS (
          SELECT vec_id, embedding::DOUBLE[] AS cvec
          FROM embeddings WHERE vec_id % 50 <> 0),
        scored AS (
          SELECT vec_id,
                 CASE WHEN list_dot_product(cvec, cvec) = 0
                        OR list_dot_product(pvec, pvec) = 0 THEN 0.0
                      ELSE list_dot_product(cvec, pvec)
                           / (sqrt(list_dot_product(cvec, cvec))
                              * sqrt(list_dot_product(pvec, pvec))) END AS cos
          FROM tr, ev),
        m AS (SELECT vec_id, max(cos) AS mc FROM scored GROUP BY vec_id)
        SELECT vec_id, round(mc, 6) AS max_cos,
               round(mc, 6) >= 0.8 AS contaminated
        FROM m""")),

    // ----- Repeated-span removal (ExactSubstr dedup, shingle form) -----
    // Lee et al. 2021's substring dedup at 8-token-span granularity:
    // any span already seen earlier in the corpus ((doc, pos) order)
    // loses its tokens; the first occurrence keeps them; self-
    // repetition inside a document trims by the same rule. The oracle
    // recomputes spans, first-occurrence choice, position coverage,
    // and the rebuild, so the hash-match proves the whole contract —
    // including the q76-style (clean_text, n_kept, n_dropped) output.
    // Scale shape: see [[Dedup.dropRepeatedSpans]] — zero-shuffle
    // shingling, distinct-shingle-sized skew-safe first choice,
    // coverage explode bounded by the dup rate, one id-keyed rebuild
    // join.
    QueryDef(
      "q104_repeated_spans",
      (spark, dir) =>
        Dedup.dropRepeatedSpans(Tables.load(spark, dir, "documents"),
          "doc_id", "text", k = 8),
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh0 AS (
          SELECT doc_id,
                 [struct_pack(pos := i - 1,
                    sh := md5(array_to_string(w[i : i + 7], ' ')))
                  for i in range(1, greatest(len(w) - 6, 1))] AS occs
          FROM t),
        occ AS (SELECT doc_id, unnest(occs, recursive := true) FROM sh0),
        red AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY sh
                                      ORDER BY doc_id, pos) AS rn
            FROM occ) WHERE rn > 1),
        cov AS (SELECT DISTINCT doc_id, p FROM (
          SELECT doc_id, unnest([pos + d for d in range(0, 8)]) AS p
          FROM red)),
        covs AS (SELECT doc_id, list(p) AS dps FROM cov GROUP BY doc_id),
        fin AS (
          SELECT t.doc_id,
                 [w[i] for i in range(1, len(w) + 1)
                  if NOT list_contains(coalesce(dps, CAST([] AS BIGINT[])), i - 1)] AS kept,
                 len(w) AS n_total
          FROM t LEFT JOIN covs USING (doc_id))
        -- array_to_string([]) is NULL in DuckDB; Spark's concat_ws
        -- renders a fully-trimmed document as '' — match that
        SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS clean_text,
               CAST(len(kept) AS BIGINT) AS n_kept,
               CAST(n_total - len(kept) AS BIGINT) AS n_dropped
        FROM fin""")),

    // ----- Line-level dedup (C4/CCNet): drop repeated lines corpus-wide -----
    // The corpus text has no newlines, so the query first chunks each
    // document's tokens into deterministic 8-token "lines" (mirrored
    // exactly in the oracle), then Dedup.dedupLines keeps only the
    // first occurrence of each distinct line (by doc_id, position) and
    // reassembles documents in original order. Pos is 0-based on the
    // Spark side and 1-based in DuckDB — only its ORDER matters.
    QueryDef(
      "q76_dedup_lines",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val lined = d
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            concat_ws("\n", tokenChunks(col("toks"))).as("text"))
        Dedup.dedupLines(lined, "doc_id", "text")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), lined AS (
          SELECT doc_id,
                 [struct_pack(pos := i, line := array_to_string(w[(i-1)*8+1 : i*8], ' '))
                  for i in range(1, CAST(ceil(len(w) / 8.0) AS BIGINT) + 1)] AS ls
          FROM toks
        ), ex AS (
          SELECT doc_id, unnest(ls, recursive := true) FROM lined
        ), flagged AS (
          SELECT doc_id, pos, line,
                 (row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)) = 1 AS keep
          FROM ex
        )
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        FROM flagged
        GROUP BY doc_id""")),

    // ----- Gopher/C4 quality signals: repetition + ratio filters -----
    // The filter battery web-scale curation runs before training
    // (Gopher §A1.1 / C4): duplicate-line fraction, top-2-gram share,
    // symbol-to-word ratio, stopword fraction, mean word length, alpha
    // token fraction — every one a pure Column expression, so the whole
    // battery is ONE zero-shuffle projection over the corpus (q30's
    // plan shape) and each signal composes as a conjunct into
    // q57/q75's filter stage. `passes_gopher` is the combined gate with
    // Gopher-flavored thresholds. Lines = q76's 8-token chunking
    // (corpus text has no newlines); ngrams/lines/tokens are staged as
    // bound columns per the HOF binding rule (Text.shingles scaladoc).
    QueryDef(
      "q77_quality_signals",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val staged = d
          .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("text"), col("toks"),
            Text.wordNgrams(col("toks"), 2).as("ng"),
            tokenChunks(col("toks")).as("ls"))
          .select(col("doc_id"),
            round(Text.duplicateLineFraction(col("ls")), 6).as("dup_line_frac"),
            round(Text.topNgramShare(col("ng")), 6).as("top2gram_share"),
            round(Text.symbolToWordRatio(col("text"), col("toks")), 6).as("symbol_ratio"),
            round(Text.stopwordFraction(col("toks")), 6).as("stop_frac"),
            round(Text.meanWordLength(col("toks")), 6).as("mean_word_len"),
            round(Text.alphaTokenFraction(col("toks")), 6).as("alpha_frac"))
        // stop_frac >= 0.05 is the occurrence-weighted analog of
        // Gopher's "contains at least 2 stop words" requirement
        staged.withColumn("passes_gopher",
          col("dup_line_frac") <= 0.3 && col("top2gram_share") <= 0.2 &&
          col("symbol_ratio") <= 0.1 && col("stop_frac") >= 0.05 &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("alpha_frac") >= 0.8)
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, text,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), staged AS (
          SELECT doc_id, text, w,
                 [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS ng,
                 [array_to_string(w[(i-1)*8+1 : i*8], ' ')
                  for i in range(1, CAST(ceil(len(w) / 8.0) AS BIGINT) + 1)] AS ls
          FROM t
        ), sig AS (
          SELECT doc_id,
                 round(CASE WHEN len(ls) = 0 THEN 0.0
                       ELSE (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls) END, 6) AS dup_line_frac,
                 round(CASE WHEN len(ng) = 0 THEN 0.0
                       ELSE list_max([len(list_filter(ng, x -> x = g))
                                      for g in list_distinct(ng)])::DOUBLE / len(ng) END, 6) AS top2gram_share,
                 round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
                       / greatest(len(w), 1), 6) AS symbol_ratio,
                 round(CASE WHEN len(w) = 0 THEN 0.0
                       ELSE len(list_filter(w, t -> list_contains(${duckList(Text.StopEn ++ Text.StopDe ++ Text.StopEs ++ Text.StopFr)}, t)))::DOUBLE
                            / len(w) END, 6) AS stop_frac,
                 round(coalesce(list_sum([length(t)::BIGINT for t in w]), 0)::DOUBLE
                       / greatest(len(w), 1), 6) AS mean_word_len,
                 round(CASE WHEN len(w) = 0 THEN 0.0
                       ELSE len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
                            / len(w) END, 6) AS alpha_frac
          FROM staged
        )
        SELECT doc_id, dup_line_frac, top2gram_share, symbol_ratio, stop_frac,
               mean_word_len, alpha_frac,
               (dup_line_frac <= 0.3 AND top2gram_share <= 0.2 AND
                symbol_ratio <= 0.1 AND stop_frac >= 0.05 AND
                mean_word_len BETWEEN 3.0 AND 10.0 AND
                alpha_frac >= 0.8) AS passes_gopher
        FROM sig""")),

    // ----- Gopher CHARACTER-weighted repetition signals -----
    // Completes q77's battery with Gopher §A1.1's char-weighted
    // variants: duplicate-line CHARACTER fraction (a repeated long
    // boilerplate paragraph scores its full length, where the
    // count-based q77 signal sees 1/n), top-3-gram character coverage,
    // and duplicate-5-gram fraction. All three are folds over the same
    // staged arrays — the battery stays ONE zero-shuffle projection.
    // Character denominators are of the NORMALIZED text
    // (array_join(toks, " ")), the same string the grams are built
    // from, so numerator and denominator count the same alphabet.
    QueryDef(
      "q82_repetition_signals",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        d.select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            length(array_join(col("toks"), " ")).as("n_chars"),
            Text.wordNgrams(col("toks"), 3).as("ng3"),
            Text.wordNgrams(col("toks"), 5).as("ng5"),
            tokenChunks(col("toks")).as("ls"))
          .select(col("doc_id"),
            round(Text.duplicateCharFraction(col("ls")), 6)
              .as("dup_line_char_frac"),
            round(Text.topNgramCharFraction(col("ng3"), col("n_chars")), 6)
              .as("top3gram_char_frac"),
            round(Text.duplicateLineFraction(col("ng5")), 6)
              .as("dup_5gram_frac"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), staged AS (
          SELECT doc_id, w,
                 length(array_to_string(w, ' ')) AS n_chars,
                 [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)] AS ng3,
                 [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
                  for i in range(1, len(w) - 3)] AS ng5,
                 [array_to_string(w[(i-1)*8+1 : i*8], ' ')
                  for i in range(1, CAST(ceil(len(w) / 8.0) AS BIGINT) + 1)] AS ls
          FROM t
        )
        SELECT doc_id,
               round(CASE WHEN len(ls) = 0
                            OR coalesce(list_sum([length(x)::BIGINT for x in ls]), 0) = 0 THEN 0.0
                     ELSE (coalesce(list_sum([length(x)::BIGINT for x in ls]), 0)
                           - coalesce(list_sum([length(x)::BIGINT for x in list_distinct(ls)]), 0))::DOUBLE
                          / coalesce(list_sum([length(x)::BIGINT for x in ls]), 0) END, 6)
                 AS dup_line_char_frac,
               round(CASE WHEN len(ng3) = 0 OR n_chars = 0 THEN 0.0
                     ELSE least(1.0,
                       list_max([len(list_filter(ng3, x -> x = g)) * length(g)
                                 for g in list_distinct(ng3)])::DOUBLE / n_chars) END, 6)
                 AS top3gram_char_frac,
               round(CASE WHEN len(ng5) = 0 THEN 0.0
                     ELSE (len(ng5) - len(list_distinct(ng5)))::DOUBLE / len(ng5) END, 6)
                 AS dup_5gram_frac
        FROM staged""")),

    // ----- Incremental line dedup vs a stored line-hash index -----
    // q76's daily-ingest sibling (the CCNet shape), completing the
    // incremental trio (q81 exact docs, DedupSpec's near-dup index,
    // and now lines): docs < 400 are the historical corpus, existing
    // only as their DISTINCT line-hash set (8 bytes/line); the batch
    // (docs >= 400) drops every line already in the index and then
    // line-dedups within itself with q76's first-occurrence rule. The
    // oracle reproduces both rules on raw lines (hash identity modulo
    // xxhash64 collisions — see dedupLinesAgainstIndex scaladoc).
    QueryDef(
      "q83_dedup_lines_incremental",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val lined = d
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            concat_ws("\n", tokenChunks(col("toks"))).as("text"))
        val corpus = lined.filter(col("doc_id") < 400)
        val index = corpus
          .select(explode(split(col("text"), "\n")).as("line"))
          .select(xxhash64(col("line")).as("line_hash")).distinct()
        val batch = lined.filter(col("doc_id") >= 400)
        val (cleaned, _) =
          Dedup.dedupLinesAgainstIndex(batch, "doc_id", "text", index)
        cleaned
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), lined AS (
          SELECT doc_id,
                 [struct_pack(pos := i, line := array_to_string(w[(i-1)*8+1 : i*8], ' '))
                  for i in range(1, CAST(ceil(len(w) / 8.0) AS BIGINT) + 1)] AS ls
          FROM toks
        ), ex AS (
          SELECT doc_id, unnest(ls, recursive := true) FROM lined
        ), idx AS (
          SELECT DISTINCT line FROM ex WHERE doc_id < 400
        ), flagged AS (
          SELECT doc_id, pos, line,
                 line NOT IN (SELECT line FROM idx)
                 AND (row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)) = 1 AS keep
          FROM ex WHERE doc_id >= 400
        )
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        FROM flagged
        GROUP BY doc_id""")),

    // ----- kNN majority-vote classification over labeled embeddings -----
    // The label-propagation shape of training-data pipelines: score a
    // query batch by vote of its 10 nearest LABELED corpus vectors
    // (the `label` column is the ground truth the synthetic table
    // carries). Exercises the kNN scan with a carried payload column +
    // deterministic argmax tail; `correct` compares the vote to the
    // query's own held-out label. Oracle recomputes the full stack
    // (quadratic at sf0.01 — fine; the Spark side is one corpus pass).
    QueryDef(
      "q84_knn_classify",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 50)
        val corpus = e.filter(col("vec_id") >= 50)
        Similarity.knnClassify(corpus, queries, k = 10)
          .join(queries.select(col("vec_id").as("query_id"),
            col("label").as("actual")), "query_id")
          .withColumn("correct", col("predicted") === col("actual"))
      },
      Some("""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings
        ), q AS (
          SELECT * FROM v WHERE vec_id < 50
        ), c AS (
          SELECT * FROM v WHERE vec_id >= 50
        ), scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 c.label AS nlabel,
                 CASE WHEN list_dot_product(c.vec, c.vec) = 0
                        OR list_dot_product(q.vec, q.vec) = 0 THEN 0.0
                      ELSE list_dot_product(c.vec, q.vec)
                           / (sqrt(list_dot_product(c.vec, c.vec))
                              * sqrt(list_dot_product(q.vec, q.vec))) END AS cos
          FROM q JOIN c ON c.vec_id <> q.vec_id
        ), nn AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored
        ), votes AS (
          SELECT query_id, nlabel, count(*) AS votes
          FROM nn WHERE rank <= 10 GROUP BY 1, 2
        ), pred AS (
          SELECT query_id, nlabel AS predicted, votes,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY votes DESC, nlabel) AS rn
          FROM votes
        )
        SELECT p.query_id, p.predicted, CAST(p.votes AS BIGINT) AS votes,
               q.label AS actual, p.predicted = q.label AS correct
        FROM pred p JOIN q ON p.query_id = q.vec_id
        WHERE p.rn = 1""")),

    // ----- Language-ID accuracy vs the corpus ground truth -----
    // The eval loop a real pipeline runs before trusting a heuristic
    // gate at scale: grade Text.langId against the documents table's
    // `lang` label per language (n, n_correct, accuracy). One
    // zero-shuffle scoring pass + a 5-group aggregate; the oracle
    // re-spells the heuristic (q57's CTE) and the same rollup.
    //
    // The synthetic `lang` column is a metadata label over one shared
    // English-ish vocabulary, so the raw corpus can only ever score
    // en/und (accuracy 0.0 for every other language BY CONSTRUCTION
    // OF THE DATA). Like q74 plants PII before grading the redactor,
    // this query plants per-language marker text before grading the
    // classifier: 90% of non-English docs (doc_id % 10 != 0) get
    // their language's stopword list (or a CJK char for zh) appended,
    // mirrored in the oracle. Result: per-language accuracy ~0.9 —
    // the planted docs classify correctly unless the base text
    // already hits all 8 English stopwords, the unplanted 10%
    // fall back to en/und — so the eval now grades the heuristic's
    // discrimination, not a degenerate corpus.
    QueryDef(
      "q85_langid_eval",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val marker = when(col("doc_id") % 10 === 0, lit(""))
          .when(col("lang") === "de", lit(" " + Text.StopDe.mkString(" ")))
          .when(col("lang") === "es", lit(" " + Text.StopEs.mkString(" ")))
          .when(col("lang") === "fr", lit(" " + Text.StopFr.mkString(" ")))
          .when(col("lang") === "zh", lit(" 的"))
          .otherwise(lit(""))
        d.select(col("lang"), concat(col("text"), marker).as("t"))
          .select(col("lang"),
            (Text.langId(col("t")) === col("lang")).as("ok"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("ok"), 1L).otherwise(0L)).as("n_correct"))
          .withColumn("accuracy",
            round(col("n_correct").cast("double") / col("n"), 6))
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id, lang,
                 text || CASE WHEN doc_id % 10 = 0 THEN ''
                              WHEN lang = 'de' THEN ' ${Text.StopDe.mkString(" ")}'
                              WHEN lang = 'es' THEN ' ${Text.StopEs.mkString(" ")}'
                              WHEN lang = 'fr' THEN ' ${Text.StopFr.mkString(" ")}'
                              WHEN lang = 'zh' THEN ' 的'
                              ELSE '' END AS text
          FROM documents
        ), t AS (
          SELECT doc_id, lang, text,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
          FROM aug
        ), s AS (
          SELECT doc_id, lang, text,
                 len(list_intersect(toks, ${duckList(Text.StopEn)})) AS s_en,
                 len(list_intersect(toks, ${duckList(Text.StopDe)})) AS s_de,
                 len(list_intersect(toks, ${duckList(Text.StopEs)})) AS s_es,
                 len(list_intersect(toks, ${duckList(Text.StopFr)})) AS s_fr
          FROM t
        ), pred AS (
          SELECT lang,
                 CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                      WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
                      WHEN s_es > s_en AND s_es > s_fr THEN 'es'
                      WHEN s_fr > s_en THEN 'fr'
                      WHEN s_en > 0 THEN 'en'
                      ELSE 'und' END AS lang_id
          FROM s
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN lang_id = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               round(sum(CASE WHEN lang_id = lang THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS accuracy
        FROM pred GROUP BY lang""")),

    // ----- uint8 embedding quantization + fidelity check -----
    // The storage/IO lever of an embedding pipeline (4× smaller
    // vectors, 4× fewer probe-scan bytes at 100 TB) with the fidelity
    // stats a pipeline asserts before swapping the float column out:
    // per-dimension max reconstruction error (bounded by range/510 by
    // construction) and cosine(original, reconstruction). Per-vector
    // min-max parameters — no corpus calibration pass, so the whole
    // operator is one zero-shuffle projection. mn/scale are staged as
    // bound attributes per the HOF binding rule (Quantize.codes
    // scaladoc).
    QueryDef(
      "q86_embed_quantize",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val staged = e.select(col("vec_id"), col("embedding").as("vec"))
          .select(col("vec_id"), col("vec"),
            array_min(col("vec")).cast("double").as("mn"),
            Quantize.scale(col("vec")).as("qscale"))
          .select(col("vec_id"), col("vec"), col("mn"), col("qscale"),
            Quantize.codes(col("vec"), col("mn"), col("qscale")).as("codes"))
        // metrics get their OWN projection: aliasing round(qscale) to
        // the name "qscale" in the same select would capture the
        // rounded value inside the metric lambdas (self-referencing
        // projection — measured: max_abs_err off by 255 × the rounding
        // delta), so round/rename only after the metrics are computed
        val metrics = staged.select(col("vec_id"), col("mn"),
          col("qscale"), col("codes"),
          Quantize.maxAbsError(col("vec"), col("codes"),
            col("mn"), col("qscale")).as("err_raw"),
          Similarity.cosine(col("vec"),
            Quantize.dequantize(col("codes"), col("mn"), col("qscale")))
            .as("cos_raw"))
        // The codes land as a comma-joined string, not a raw
        // array<int>: the oracle harness sorts raw output values, and
        // an array column is unsortable there. Digest equality over
        // the joined string verifies every code just as strongly.
        metrics.select(col("vec_id"),
          round(col("mn"), 6).as("mn"),
          round(col("qscale"), 6).as("qscale"),
          concat_ws(",", col("codes")).as("codes"),
          round(col("err_raw"), 6).as("max_abs_err"),
          round(col("cos_raw"), 6).as("cos_fidelity"))
      },
      Some("""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        ), p AS (
          SELECT vec_id, vec, list_min(vec) AS mn,
                 (list_max(vec) - list_min(vec)) / 255.0 AS s
          FROM v
        ), c AS (
          SELECT vec_id, vec, mn, s,
                 CASE WHEN s = 0 THEN [0 for x in vec]
                      ELSE [CAST(round((x - mn) / s) AS INT) for x in vec]
                 END AS codes
          FROM p
        ), d AS (
          SELECT vec_id, vec, mn, s, codes,
                 [mn + c * s for c in codes] AS dq
          FROM c
        )
        SELECT vec_id, round(mn, 6) AS mn, round(s, 6) AS qscale,
               array_to_string(codes, ',') AS codes,
               round(coalesce(list_max(
                 [abs(dq[i] - vec[i]) for i in range(1, len(vec) + 1)]), 0.0), 6)
                 AS max_abs_err,
               round(CASE WHEN list_dot_product(vec, vec) = 0
                            OR list_dot_product(dq, dq) = 0 THEN 0.0
                     ELSE list_dot_product(vec, dq)
                          / (sqrt(list_dot_product(vec, vec))
                             * sqrt(list_dot_product(dq, dq))) END, 6)
                 AS cos_fidelity
        FROM d""")),

    // ----- Curation funnel: survivors after each successive gate -----
    // The ops report every pipeline runs before committing thresholds:
    // how many documents survive each gate of q80's battery, applied
    // in order (lang → quality → dup-line → top-2-gram → symbol →
    // stopword → mean-word-len → alpha). One scoring projection (the
    // gates become boolean attributes; cumulative conjunctions are
    // attribute ANDs, nothing recomputed) + a single 1-row aggregate —
    // zero shuffles beyond the final partial/final agg. The last
    // column equals q80's kept-count by construction.
    QueryDef(
      "q87_curation_funnel",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val staged = d
          .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("text"), col("toks"),
            Text.wordNgrams(col("toks"), 2).as("ng"),
            tokenChunks(col("toks")).as("ls"))
        val gated = staged.select(
          (Text.langId(col("text"), col("toks")) === "en").as("g_lang"),
          (Text.qualityScore(col("text"), col("toks")) >= 0.72).as("g_quality"),
          (round(Text.duplicateLineFraction(col("ls")), 6) <= 0.3).as("g_dup_line"),
          (round(Text.topNgramShare(col("ng")), 6) <= 0.2).as("g_top2gram"),
          (round(Text.symbolToWordRatio(col("text"), col("toks")), 6) <= 0.1).as("g_symbol"),
          (round(Text.stopwordFraction(col("toks")), 6) >= 0.05).as("g_stop"),
          round(Text.meanWordLength(col("toks")), 6).between(3.0, 10.0).as("g_mwl"),
          (round(Text.alphaTokenFraction(col("toks")), 6) >= 0.8).as("g_alpha"))
        val gates = Seq("g_lang", "g_quality", "g_dup_line", "g_top2gram",
          "g_symbol", "g_stop", "g_mwl", "g_alpha")
        val prefixes = gates.scanLeft(lit(true))((acc, g) => acc && col(g)).tail
        gated.agg(count(lit(1)).as("n_total"),
          prefixes.zip(gates).map { case (p, g) =>
            sum(when(p, 1L).otherwise(0L)).as("n_after_" + g.stripPrefix("g_"))
          }: _*)
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, text,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, text, toks,
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
        ), g AS (
          SELECT
            (CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                  WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
                  WHEN s_es > s_en AND s_es > s_fr THEN 'es'
                  WHEN s_fr > s_en THEN 'fr'
                  WHEN s_en > 0 THEN 'en'
                  ELSE 'und' END) = 'en' AS g_lang,
            round(
              least(1.0, (s_en+s_de+s_es+s_fr)::DOUBLE * 3.0 / greatest(n_tokens::DOUBLE, 1.0)) * 0.2
              + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE / greatest(n_chars::DOUBLE, 1.0) * 0.4
              + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2
              + (CASE WHEN n_chars::DOUBLE / greatest(n_tokens::DOUBLE, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
            , 6) >= 0.72 AS g_quality,
            round(CASE WHEN len(ls) = 0 THEN 0.0
                  ELSE (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls) END, 6) <= 0.3 AS g_dup_line,
            round(CASE WHEN len(ng) = 0 THEN 0.0
                  ELSE list_max([len(list_filter(ng, x -> x = g))
                                 for g in list_distinct(ng)])::DOUBLE / len(ng) END, 6) <= 0.2 AS g_top2gram,
            round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
                  / greatest(len(toks), 1), 6) <= 0.1 AS g_symbol,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, t -> list_contains(${duckList(Text.StopEn ++ Text.StopDe ++ Text.StopEs ++ Text.StopFr)}, t)))::DOUBLE
                       / len(toks) END, 6) >= 0.05 AS g_stop,
            round(coalesce(list_sum([length(t)::BIGINT for t in toks]), 0)::DOUBLE
                  / greatest(len(toks), 1), 6) BETWEEN 3.0 AND 10.0 AS g_mwl,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
                       / len(toks) END, 6) >= 0.8 AS g_alpha
          FROM s
        )
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN g_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_after_lang,
               CAST(sum(CASE WHEN g_lang AND g_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
               CAST(sum(CASE WHEN g_lang AND g_quality AND g_dup_line THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dup_line,
               CAST(sum(CASE WHEN g_lang AND g_quality AND g_dup_line AND g_top2gram THEN 1 ELSE 0 END) AS BIGINT) AS n_after_top2gram,
               CAST(sum(CASE WHEN g_lang AND g_quality AND g_dup_line AND g_top2gram AND g_symbol THEN 1 ELSE 0 END) AS BIGINT) AS n_after_symbol,
               CAST(sum(CASE WHEN g_lang AND g_quality AND g_dup_line AND g_top2gram AND g_symbol AND g_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_after_stop,
               CAST(sum(CASE WHEN g_lang AND g_quality AND g_dup_line AND g_top2gram AND g_symbol AND g_stop AND g_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_after_mwl,
               CAST(sum(CASE WHEN g_lang AND g_quality AND g_dup_line AND g_top2gram AND g_symbol AND g_stop AND g_mwl AND g_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_after_alpha
        FROM g""")),

    // ----- Top-quantile quality selection per source -----
    // The FineWeb-Edu-style selection step: keep each source's top 25%
    // by quality score, rank-based (percent_rank over (quality DESC,
    // doc_id)) so the cutoff is exact integer arithmetic — no
    // floating-point quantile interpolation to diverge across engines.
    // One shuffle on source. At 100 TB the per-source sort is the
    // documented tradeoff: the sort-free sibling is a threshold from
    // approx_percentile (one pass + broadcast cutoff), traded here for
    // oracle-exact selection semantics.
    QueryDef(
      "q88_top_quantile",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val scored = d.select(col("doc_id"), col("source"),
          Text.qualityScore(col("text")).as("quality"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id"))
        scored.withColumn("pr", percent_rank().over(w))
          .filter(col("pr") <= 0.25)
          .select(col("doc_id"), col("source"), col("quality"),
            round(col("pr"), 6).as("pr"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, source, text,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, source, text,
                 len(list_intersect(toks, ${duckList(Text.StopEn)})) AS s_en,
                 len(list_intersect(toks, ${duckList(Text.StopDe)})) AS s_de,
                 len(list_intersect(toks, ${duckList(Text.StopEs)})) AS s_es,
                 len(list_intersect(toks, ${duckList(Text.StopFr)})) AS s_fr,
                 len(toks) AS n_tokens,
                 length(text) AS n_chars
          FROM t
        ), scored AS (
          SELECT doc_id, source,
                 round(
                   least(1.0, (s_en+s_de+s_es+s_fr)::DOUBLE * 3.0 / greatest(n_tokens::DOUBLE, 1.0)) * 0.2
                   + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE / greatest(n_chars::DOUBLE, 1.0) * 0.4
                   + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2
                   + (CASE WHEN n_chars::DOUBLE / greatest(n_tokens::DOUBLE, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
                 , 6) AS quality
          FROM s
        ), ranked AS (
          SELECT doc_id, source, quality,
                 percent_rank() OVER (PARTITION BY source
                                      ORDER BY quality DESC, doc_id) AS pr
          FROM scored
        )
        SELECT doc_id, source, quality, round(pr, 6) AS pr
        FROM ranked WHERE pr <= 0.25""")),

    // ----- Corpus-wide top n-grams (vocabulary / contamination stats) -----
    // The corpus-statistics pass behind vocab building and boilerplate
    // analysis: global trigram counts, top 50 by (count DESC, ngram) —
    // deterministic through the tie at the cut. Plan: explode → partial
    // count agg (map-side combine absorbs the head of the Zipf curve) →
    // one shuffle on ngram → TakeOrderedAndProject, never a global
    // sort. At 100 TB the long tail dominates the shuffle; cap it with
    // a doc-frequency prefix filter (q32's knob) when only the head is
    // wanted.
    QueryDef(
      "q89_top_ngrams",
      (spark, dir) =>
        corpusTrigrams(spark, dir)
          .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("ngram")).limit(50),
      Some(topNgramsOracle)),

    // ----- Top n-grams, heavy-hitter scale path -----
    // q89's EXACT semantics through the sketch-then-recount path
    // ([[graft.operators.HeavyHitters]]): a mergeable Misra–Gries
    // summary pass (only ≤2m-counter summaries cross the wire — the
    // exchange is summary-sized, never distinct-ngram-sized) feeds a
    // broadcast-candidate exact recount. The registered path is the
    // SELF-CERTIFYING form: topKCertified checks the exactness
    // certificate at runtime and doubles m until it proves — so a
    // regenerated testdata vintage whose tail flattens the 50th count
    // under N/(m+1) escalates instead of silently diverging from q89's
    // shared oracle. m = 16384 proves on the first attempt at current
    // vintages (evasion bound ≈ 1.6 at sf0.01, 50th count 5; ≈ 16 at
    // sf0.1, 50th count 21); the summary stays KB-scale through any
    // doubling. HeavyHittersSpec pins the sketch bound, the compaction
    // path, the certificate, and the escalation loop.
    QueryDef(
      "q110_top_ngrams_sketch",
      (spark, dir) =>
        HeavyHitters.topKCertified(corpusTrigrams(spark, dir), "ngram",
          k = 50, m = 16384),
      Some(topNgramsOracle)),

    // ----- Count-Min point-frequency estimates, validated in-path -----
    // [[graft.operators.CountMin]]: the POINT-query sibling of q110's
    // top-k sketch — "how often does THIS phrase occur" for ad-hoc
    // keys over an unbounded key space, through a fixed-size (64 KiB)
    // mergeable summary whose exchange never scales with distinct-key
    // count. Probe set: the distinct trigrams of the lowest-id
    // document (self-deriving, so the query survives testdata
    // regeneration; derived via a broadcast 1-row min-doc join, no
    // collect). The registered path recounts the probe EXACTLY (the
    // oracle-checked output) and asserts every sketch estimate lands
    // in [exact, exact + e/width·N] — the q110 runtime-certificate
    // idiom: a hash catastrophe throws instead of silently degrading.
    // CountMinSpec pins never-underestimate, merge-invariance across
    // partitionings, and the adversarial small-width failure mode.
    QueryDef(
      "q148_cms_probe_counts",
      (spark, dir) => {
        val tri = Tables.load(spark, dir, "documents")
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(Text.wordNgrams(col("toks"), 3)).as("ngram"))
        val probe = tri
          .join(broadcast(tri.agg(min(col("doc_id")).as("doc_id"))), "doc_id")
          .select(col("ngram")).distinct()
        CountMin.probeCountsChecked(tri.select(col("ngram")), "ngram",
          probe, width = 2048, depth = 4)
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), g AS (
          SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in range(1, len(w) - 1)]) AS ngram
          FROM t
        ), probe AS (
          SELECT DISTINCT ngram FROM g
          WHERE doc_id = (SELECT min(doc_id) FROM g)
        )
        SELECT g.ngram, CAST(count(*) AS BIGINT) AS n
        FROM g JOIN probe USING (ngram)
        GROUP BY g.ngram""")),

    // ----- Cross-source n-gram overlap matrix (leakage diagnostics) -----
    // For every source pair, the shared distinct-trigram count and the
    // DIRECTED containments |A∩B|/|A| and |A∩B|/|B| — which sources
    // bleed into which (mirror sites, syndicated content, an eval
    // source leaking into a train source). Plan: ONE distinct
    // (source, ngram) projection (Heaps-bounded × sources, not
    // corpus-sized), a shingle-keyed self-join whose per-key fan-out
    // is capped by sources² (≤400 here), then two broadcast joins
    // against the 20-row totals. At much larger source counts the
    // minhash signature form (q33's machinery per source) is the
    // documented swap — the exact form's join stays the right default
    // while sources² is small.
    QueryDef(
      "q159_source_overlap",
      (spark, dir) => {
        // four consumers (both self-join sides + two totals) — barrier
        // the Heaps-bounded distinct table so the corpus tokenizes
        // ONCE (the q111 multi-consumer lesson)
        val sh = Barrier.materialize(
          Tables.load(spark, dir, "documents")
            .select(col("source"), Text.tokens(col("text")).as("toks"))
            .select(col("source"),
              explode(Text.wordNgrams(col("toks"), 3)).as("ngram"))
            .distinct())
        val tot = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
        val pairs = sh.as("a")
          .join(sh.as("b"), "ngram")
          .filter(col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("common"))
        pairs
          .join(broadcast(tot.select(col("source").as("src_a"),
            col("n_sh").as("n_a"))), "src_a")
          .join(broadcast(tot.select(col("source").as("src_b"),
            col("n_sh").as("n_b"))), "src_b")
          .select(col("src_a"), col("src_b"), col("common"),
            round(col("common").cast("double") / col("n_a").cast("double"), 6)
              .as("cont_a"),
            round(col("common").cast("double") / col("n_b").cast("double"), 6)
              .as("cont_b"))
      },
      Some("""
        WITH t AS (
          SELECT source,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents),
        s AS (
          SELECT DISTINCT source, ngram
          FROM (SELECT source,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS ngram
                FROM t)),
        tot AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_sh
          FROM s GROUP BY source),
        pr AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS common
          FROM s a JOIN s b USING (ngram)
          WHERE a.source < b.source
          GROUP BY 1, 2)
        SELECT pr.src_a, pr.src_b, pr.common,
               round(pr.common::DOUBLE / ta.n_sh::DOUBLE, 6) AS cont_a,
               round(pr.common::DOUBLE / tb.n_sh::DOUBLE, 6) AS cont_b
        FROM pr
        JOIN tot ta ON ta.source = pr.src_a
        JOIN tot tb ON tb.source = pr.src_b""")),

    // ----- Windowed co-occurrence PMI (distributional statistics) -----
    // [[graft.operators.Collocations.windowedPmi]]: q111 scores
    // ADJACENT pairs; the word2vec/GloVe co-occurrence matrix counts
    // pairs within a ±3 window. Symmetrized pairs via win lead()s
    // over one doc-keyed window exchange, Heaps-bounded pair counts,
    // 1-row total broadcast (allowlisted), ONE ln expression mirrored
    // verbatim (q67 pinned ln cross-engine).
    QueryDef(
      "q160_cooccurrence_pmi",
      (spark, dir) =>
        Collocations.windowedPmi(Tables.load(spark, dir, "documents"),
          "doc_id", "text", win = 3, minCount = 5L, topN = 40),
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents),
        e AS (
          SELECT doc_id, i AS pos, w[i] AS tok
          FROM t, unnest(range(1, len(w) + 1)) AS u(i)),
        p AS (
          SELECT least(tok, nb) AS a, greatest(tok, nb) AS b
          FROM (SELECT doc_id, pos, tok,
                       lead(tok, 1) OVER win AS n1,
                       lead(tok, 2) OVER win AS n2,
                       lead(tok, 3) OVER win AS n3
                FROM e
                WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
               unnest([n1, n2, n3]) AS nbrs(nb)
          WHERE nb IS NOT NULL),
        u AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS c_w FROM e GROUP BY tok),
        nt AS (SELECT CAST(sum(c_w) AS BIGINT) AS n FROM u),
        cp AS (
          SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
          FROM p GROUP BY a, b HAVING count(*) >= 5)
        SELECT cp.a, cp.b, cp.c_ab,
               round(ln(CAST(n AS DOUBLE) * cp.c_ab /
                        (CAST(ua.c_w AS DOUBLE) * CAST(ub.c_w AS DOUBLE))), 6)
                 AS pmi
        FROM cp
        CROSS JOIN nt
        JOIN u ua ON ua.tok = cp.a
        JOIN u ub ON ub.tok = cp.b
        ORDER BY pmi DESC, a, b LIMIT 40""")),

    // ----- LSH banding-parameter plan (dedup index sizing) -----
    // [[graft.operators.Dedup.lshParameterPlan]]: the analytic sizing
    // step in front of q33's MinHash near-dup index — for each target
    // Jaccard threshold, the (bands, rows) split of a 128-hash
    // signature whose S-curve inflection (1/b)^(1/r) lands closest to
    // the target, plus the collision probability at the target. Pure
    // closed-form math over the divisor grid (no corpus input), so
    // the plan is a LocalTableScan; the oracle replays the same grid
    // and argmin in SQL. At 100 TB this decides b (the banding
    // exchange's per-doc row count) and r (the false-positive tail
    // the exact-verify pass pays for) before any data moves.
    QueryDef(
      "q149_lsh_parameter_plan",
      (spark, _) =>
        Dedup.lshParameterPlan(spark, k = 128,
          targets = Seq(0.5, 0.6, 0.7, 0.8, 0.9)),
      Some("""
        WITH d AS (
          SELECT unnest(range(1, 129)) AS b
        ), p AS (
          SELECT CAST(b AS INT) AS b, CAST(128 // b AS INT) AS r
          FROM d WHERE 128 % b = 0
        ), tg(t) AS (
          VALUES (0.5), (0.6), (0.7), (0.8), (0.9)
        ), scored AS (
          SELECT CAST(tg.t AS DOUBLE) AS t, p.b, p.r,
                 pow(1.0 / p.b, 1.0 / p.r) AS s_star
          FROM tg CROSS JOIN p
        ), best AS (
          SELECT t, b, r, s_star,
                 row_number() OVER (PARTITION BY t
                                    ORDER BY round(abs(s_star - t), 6), b) AS rk
          FROM scored
        )
        SELECT t AS target_t, b AS bands, r AS rows_per_band,
               round(s_star, 6) AS s_star,
               round(1.0 - pow(1.0 - pow(t, r), b), 6) AS p_at_target
        FROM best WHERE rk = 1"""),
      // bench = false: a 40-cell closed-form grid, nothing to measure
      bench = false),

    // ----- Phrase / collocation mining -----
    // The word2vec phrase-vocabulary induction step
    // ([[graft.operators.Collocations]]): discounted bigram score
    // N·(c(ab)−δ)/(c(a)·c(b)), top 40 at min support 5 — the pairs a
    // tokenizer pipeline would merge into single tokens. All counts
    // exact integers, ONE double expression mirrored verbatim in the
    // oracle (round 6 — the q93 cross-engine float idiom). Scale: two
    // vocab-sized partial-agg exchanges, vocab-keyed joins, 1-row
    // total broadcast (allowlisted BNLJ like q67/q100/q101) — nothing
    // corpus-sized past the map-side combine.
    QueryDef(
      "q111_collocations",
      (spark, dir) =>
        Collocations.phraseScores(
          Tables.load(spark, dir, "documents"), "text",
          minCount = 5L, delta = 1.0, topN = 40),
      Some("""
        WITH t AS (
          SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), u AS (
          SELECT w, count(*) AS c_w FROM (SELECT unnest(w) AS w FROM t) GROUP BY w
        ), n_tot AS (
          SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM u
        ), b AS (
          SELECT bigram, count(*) AS c_ab
          FROM (SELECT unnest([w[i] || ' ' || w[i+1]
                               for i in range(1, len(w))]) AS bigram
                FROM t)
          GROUP BY bigram HAVING count(*) >= 5
        )
        SELECT b.bigram, b.c_ab,
               round(CAST(n_total AS DOUBLE) * (b.c_ab - 1.0) /
                     (CAST(ua.c_w AS DOUBLE) * CAST(ub.c_w AS DOUBLE)), 6) AS score
        FROM b
        CROSS JOIN n_tot
        JOIN u ua ON ua.w = string_split(b.bigram, ' ')[1]
        JOIN u ub ON ub.w = string_split(b.bigram, ' ')[2]
        ORDER BY score DESC, bigram LIMIT 40""")),

    // ----- Iterated phrase mining (word2vec multi-pass) -----
    // q111 runs ONE scoring pass; word2vec's actual procedure iterates
    // 2–4 times, merging found phrases into single tokens between
    // passes so phrases-of-phrases emerge ("new_york times" →
    // "new_york_times"). Two rewrite passes at threshold 1.4 (chosen
    // inside the observed score head at both gate SFs), then a final
    // scoring — the oracle replays all three scorings and both greedy
    // token-merge folds verbatim. Scale: per pass, the corpus crosses
    // the two Heaps-bounded count exchanges plus one narrow rewrite
    // fold (barriered — two consumers next pass; persistPath is the
    // durable form); phrase sets are threshold-bounded literals.
    QueryDef(
      "q113_phrases_iterated",
      (spark, dir) =>
        Collocations.iteratePhrases(
            Tables.load(spark, dir, "documents"), "text",
            rewritePasses = 2, minCount = 5L, delta = 1.0, threshold = 1.4)
          .orderBy(col("score").desc, col("bigram"))
          .limit(40),
      Some(iteratedPhrasesSql(passes = 2, minCount = 5,
        delta = 1.0, threshold = 1.4))),

    // ----- Cross-document duplicated-span fraction -----
    // The exact-substring-dedup signal (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better" — suffix-array span
    // dedup, approximated here at fixed 8-token span granularity): for
    // each document, the fraction of its 8-gram span occurrences that
    // also occur in ANOTHER document. High fraction = the document is
    // largely assembled from text that exists elsewhere (mirrors,
    // quote farms, templated pages) even when no WHOLE-document
    // near-dup fires. Shape: ONE corpus tokenize pass collapsed to
    // per-(span, doc) occurrence counts (two-phase partial agg —
    // boilerplate spans collapse map-side), then the distinct-doc
    // count per span is a window over the already-aggregated pairs
    // (one row per (span, doc), so count(*) over the span IS the
    // distinct-doc count), then the per-doc rollup. Shuffles move the
    // aggregated pairs, never raw span occurrences, and the corpus is
    // scanned exactly once. Docs shorter than the span width have no
    // spans and no row — mirrored in the oracle.
    QueryDef(
      "q90_dup_span_fraction",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val pairs = d
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"), explode(Text.wordNgrams(col("toks"), 8)).as("g"))
          .groupBy(col("g"), col("doc_id"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("g"))
        pairs.withColumn("ndocs", count(lit(1)).over(w))
          .groupBy(col("doc_id"))
          .agg(sum(col("n")).as("n_spans"),
            sum(when(col("ndocs") >= 2, col("n")).otherwise(0L))
              .as("n_dup_spans"))
          .withColumn("dup_span_frac",
            round(col("n_dup_spans").cast("double") / col("n_spans"), 6))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), ng AS (
          SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
                         w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
                         for i in range(1, len(w) - 6)]) AS g
          FROM t WHERE len(w) >= 8
        ), x AS (
          SELECT g FROM ng GROUP BY g HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN g IN (SELECT g FROM x) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
               round(sum(CASE WHEN g IN (SELECT g FROM x) THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS dup_span_frac
        FROM ng GROUP BY doc_id""")),

    // ----- On-disk IVF with uint8-quantized lists (IVF+SQ8) -----
    // q79's partition-pruned probe over q86's quantized storage: the
    // inverted lists store (mn, qscale, codes) — 4× fewer bytes per
    // probed partition — and candidates dequantize in the scan
    // projection. Rows-only like q79/q52 (k-means centroids aren't
    // DuckDB-reproducible); IvfSpec grades top-k overlap vs the float
    // path with shared centroids. Fixed scratch path + overwrite, like
    // q79.
    QueryDef(
      "q91_ann_ivf_sq8",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val path = scratchPath("ivf_sq8_index")
        val centroids = Ivf.writeIndexQuantized(e, path, nClusters = 16,
          trainFraction = 0.25)
        Ivf.probeIndexQuantized(spark, path, centroids,
            e.filter(col("vec_id") < 10), k = 10)
          .withColumn("cos", round(col("cos"), 6))
      },
      None),

    // ----- Winnowing fingerprints (MOSS local-similarity sketch) -----
    // [[graft.operators.Winnow]] (Schleimer et al. 2003): per-document
    // winnowed fingerprint counts — trigram hashes, window w=4 minima,
    // distinct. Position-local (guaranteed shared fingerprint for any
    // shared passage of ≥ w+k−1 tokens), unlike q35's whole-document
    // hash or q33's set-similarity MinHash. Explode + window over the
    // token stream — all codegen, one doc-keyed exchange (the q76
    // line-dedup shape; see the operator scaladoc for why the
    // zero-shuffle HOF formulation was rejected). The md5-based hash
    // and integer minima are bit-identical on both engines, so the
    // oracle checks the exact fingerprint sets (via count + density).
    QueryDef(
      "q130_winnow_fingerprints",
      (spark, dir) =>
        graft.operators.Winnow
          .fingerprintStats(Tables.load(spark, dir, "documents"),
            "doc_id", "text", k = 3, w = 4),
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents),
        g AS (
          SELECT doc_id,
                 [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  for i in range(1, len(w) - 1)] AS grams
          FROM t),
        h AS (
          SELECT doc_id,
                 [('0x' || substr(md5(g), 1, 13))::BIGINT for g in grams] AS hs
          FROM g),
        m AS (
          SELECT doc_id,
                 [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)] AS mins,
                 len(hs) AS n_kgrams
          FROM h)
        SELECT doc_id,
               CAST(len(list_distinct(mins)) AS INT) AS n_fps,
               CAST(n_kgrams AS INT) AS n_kgrams,
               round(len(list_distinct(mins))::DOUBLE
                     / greatest(n_kgrams, 1), 6) AS density
        FROM m""")),

    // ----- Shared-passage pairs (boilerplate / quotation detector) -----
    // Winnowing's pair report: documents sharing ≥ 2 rare fingerprints.
    // The fingerprint-keyed equi-join is the LSH-band shape — posting
    // lists bounded by the stop-fingerprint cut (df ≤ maxDf), so the
    // candidate set is Σ|posting|² over rare fingerprints, never
    // all-pairs. Finds shared PASSAGES between globally-dissimilar
    // documents — the curation signal q33 (whole-doc near-dup) cannot
    // see.
    QueryDef(
      "q131_shared_passages",
      (spark, dir) =>
        graft.operators.Winnow.sharedPassagePairs(
          Tables.load(spark, dir, "documents"), "doc_id", "text",
          k = 3, w = 4, minShared = 2, maxDf = 1000),
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents),
        g AS (
          SELECT doc_id,
                 [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  for i in range(1, len(w) - 1)] AS grams
          FROM t),
        h AS (
          SELECT doc_id,
                 [('0x' || substr(md5(g), 1, 13))::BIGINT for g in grams] AS hs
          FROM g),
        m AS (
          SELECT doc_id,
                 [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)] AS mins
          FROM h),
        fps AS MATERIALIZED (
          SELECT DISTINCT doc_id, fp FROM (
            SELECT doc_id, unnest(mins) AS fp FROM m)),
        rare AS (
          SELECT fp FROM fps GROUP BY fp
          HAVING count(*) >= 2 AND count(*) <= 1000),
        keyed AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS shared
        FROM keyed a JOIN keyed b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2""")),

    // ----- Passage decontamination (winnowing cross-set probe) -----
    // [[graft.operators.Winnow.passageOverlap]]: flag training
    // documents sharing >= 1 winnowed fingerprint with the eval set
    // (doc_id < 10, the q37/q102 probe idiom). Sound for quotes of
    // >= w+k-1 tokens (the winnowing guarantee — no LSH miss
    // probability), at fingerprint cost: the eval fingerprint set is
    // broadcast, the corpus side stays the zero-shuffle projection,
    // and only matching postings reach the per-doc count. Complements
    // q73 (n-gram Jaccard) and q102 (embedding cosine): exact passage
    // evidence, not similarity.
    QueryDef(
      "q132_passage_decontaminate",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        graft.operators.Winnow.passageOverlap(
          d.filter(col("doc_id") >= 10), d.filter(col("doc_id") < 10),
          "doc_id", "text", k = 3, w = 4)
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents),
        g AS (
          SELECT doc_id,
                 [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  for i in range(1, len(w) - 1)] AS grams
          FROM t),
        h AS (
          SELECT doc_id,
                 [('0x' || substr(md5(g), 1, 13))::BIGINT for g in grams] AS hs
          FROM g),
        m AS (
          SELECT doc_id,
                 [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)] AS mins
          FROM h),
        fps AS MATERIALIZED (
          SELECT DISTINCT doc_id, fp FROM (
            SELECT doc_id, unnest(mins) AS fp FROM m)),
        evalf AS (SELECT DISTINCT fp FROM fps WHERE doc_id < 10)
        SELECT f.doc_id, CAST(count(*) AS BIGINT) AS shared_fps
        FROM fps f JOIN evalf USING (fp)
        WHERE f.doc_id >= 10
        GROUP BY f.doc_id""")),

    // ----- Token entropy (repetitiveness quality signal) -----
    // [[graft.functions.Text.tokenEntropyFp]]: per-document Shannon
    // entropy of the token distribution, computed as ONE sorted-scan
    // fold per row (the q77 idiom) with integer micro-nat terms — the
    // sum is order-independent, so the zero-shuffle Spark projection
    // and DuckDB's grouped aggregation produce identical bits. Low
    // entropy flags keyword stuffing and boilerplate loops that
    // length/stopword gates miss.
    QueryDef(
      "q133_token_entropy",
      (spark, dir) =>
        Tables.load(spark, dir, "documents")
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).as("n_tokens"),
            size(array_distinct(col("toks"))).as("n_distinct"),
            Text.tokenEntropyFp(col("toks")).as("acc"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            round(col("acc").cast("double") / col("n_tokens") / lit(1e6), 6)
              .as("entropy")),
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents),
        x AS (
          SELECT doc_id, len(w) AS n, unnest(w) AS term FROM t),
        c AS (
          SELECT doc_id, any_value(n) AS n, term, CAST(count(*) AS BIGINT) AS c
          FROM x GROUP BY doc_id, term),
        e AS (
          SELECT doc_id, any_value(n) AS n,
                 CAST(count(*) AS INT) AS n_distinct,
                 CAST(sum(CAST(round(-(c * ln(c::DOUBLE / n)) * 1000000.0) AS BIGINT))
                      AS BIGINT) AS acc
          FROM c GROUP BY doc_id)
        SELECT doc_id, CAST(n AS INT) AS n_tokens, n_distinct,
               round(acc::DOUBLE / n / 1000000.0, 6) AS entropy
        FROM e""")),

    // ----- Compression-ratio quality signal (CCNet's gzip knob) -----
    // Seventh native codegen expression
    // ([[graft.functions.CompressRatio]]): raw-DEFLATE bytes over
    // UTF-8 bytes per document — boilerplate compresses low, base64/
    // garbage compresses high, both tails are filter knobs. Zero-
    // shuffle projection inside whole-stage codegen. Rows-only (the
    // oracle engine has no deflate — irreducible); CompressRatioSpec
    // pins exact in-environment values, the two-tailed ordering, and
    // interpreted-vs-codegen parity.
    QueryDef(
      "q134_compression_ratio",
      (spark, dir) =>
        Tables.load(spark, dir, "documents")
          .select(col("doc_id"), octet_length(col("text")).as("n_bytes"),
            round(Text.compressRatio(col("text")), 6).as("ratio")),
      None),

    // ----- Soft dedup: down-weight duplicates, don't drop them -----
    // [[graft.operators.Dedup.softDedupWeights]]: every member of an
    // exact-duplicate cluster keeps a sampling weight 1/n_copies, so
    // each distinct content contributes one expected occurrence per
    // epoch however many times it was crawled — the reweighting
    // alternative to q31's hard drop. The corpus plants clusters the
    // oracle replays (docs < 60 re-ingested once, docs < 20 twice
    // more), since the base table is duplicate-free by construction.
    // One fixed-width (hash, id) shuffle for the count window; bodies
    // never move, no join back.
    QueryDef(
      "q139_soft_dedup",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") < 60)
            .select((col("doc_id") + 100000000).as("doc_id"), col("text")))
          .unionByName(d.filter(col("doc_id") < 20)
            .select((col("doc_id") + 200000000).as("doc_id"), col("text")))
        Dedup.softDedupWeights(corpus, "doc_id", "text")
      },
      Some("""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000000 AS doc_id, text FROM documents WHERE doc_id < 60
          UNION ALL
          SELECT doc_id + 200000000 AS doc_id, text FROM documents WHERE doc_id < 20
        ), h AS (
          SELECT doc_id,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
          FROM corpus
        )
        SELECT doc_id,
               CAST(count(*) OVER (PARTITION BY content_hash) AS BIGINT) AS n_copies,
               round(1.0::DOUBLE
                     / count(*) OVER (PARTITION BY content_hash), 6) AS weight
        FROM h""")),

    // ----- Containment near-dup: catch truncated/excerpted copies -----
    // [[graft.operators.Dedup.containmentPairs]]: directed Broder
    // containment C(A→B) = |A∩B|/|A| ≥ 0.9 over 3-gram shingles. The
    // planted truncations (docs < 30 cut to their first half, new ids)
    // are exactly what symmetric Jaccard misses: the half-copy scores
    // J ≈ 0.5 against its source (under q33's 0.8 bar) but C = 1.0
    // here. Same sub-quadratic inverted-index join as q32; both
    // directions of each candidate pair come from one joined row.
    QueryDef(
      "q140_containment_dedup",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val truncated = d.filter(col("doc_id") < 30)
          .select((col("doc_id") + 100000000).as("doc_id"),
            Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            array_join(slice(col("toks"), lit(1),
              (size(col("toks")) / 2).cast("int")), " ").as("text"))
        val corpus = d.select(col("doc_id"), col("text")).unionByName(truncated)
        Dedup.containmentPairs(corpus, "doc_id", "text", n = 3, tau = 0.9)
      },
      Some("""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000000 AS doc_id,
                 array_to_string(list_slice(
                   string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
                   1,
                   len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) // 2),
                   ' ') AS text
          FROM documents WHERE doc_id < 30
        ), toks AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM corpus
        ), sh AS (
          SELECT doc_id,
                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                for i in range(1, len(w) - 1)]) AS s
          FROM toks WHERE len(w) >= 3
        ), post AS MATERIALIZED (
          SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh
        ), pairs AS MATERIALIZED (
          -- inverted-index spelling: the shingle equi-join yields
          -- exactly the nc >= 1 pairs with the same integers as
          -- all-pairs list_intersect, at Σ df² cost — keeps the
          -- sf0.1 sweep fast (this is the UNCAPPED form; q164's
          -- maxDocFreq cap is the scale story)
          SELECT x.doc_id AS x, y.doc_id AS y,
                 CAST(count(*) AS BIGINT) AS nc,
                 any_value(x.sz) AS nx, any_value(y.sz) AS ny
          FROM post x JOIN post y ON x.g = y.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        ), directed AS (
          SELECT x AS a, y AS b, round(nc::DOUBLE / nx, 6) AS containment FROM pairs
          UNION ALL
          SELECT y AS a, x AS b, round(nc::DOUBLE / ny, 6) AS containment FROM pairs
        )
        SELECT a, b, containment FROM directed WHERE containment >= 0.9"""),
      // bench = false: the UNCAPPED shingle self-join is the tiny-sf
      // oracle spelling — a corpus-wide hot shingle makes its posting
      // self-join df² at scale. The benched scale form is q164, whose
      // maxDocFreq prefix filter bounds every posting list (the
      // q32→q33 precedent).
      bench = false),

    // ----- Containment at scale: df-capped posting self-join -----
    // q140's registered scale sibling: the same directed Broder
    // containment, but the inverted-index self-join runs behind a
    // doc-frequency prefix filter (maxDocFreq = 100) — the
    // prefix-filtering idea of the set-similarity-join literature
    // (PPJoin family): a shingle occurring in more than `cap` docs
    // contributes ≥ cap² candidate pairs yet carries almost no
    // containment evidence, so it is cut BEFORE the join and every
    // surviving posting list is ≤ cap long. The corpus plants exactly
    // the pathology: every base document gets a shared boilerplate
    // tail (the site-footer reality of web corpora), whose shingles
    // have df = |corpus| and would otherwise make the candidate set
    // all-pairs; the planted half-truncations (no tail) still score
    // C = 1.0 toward their sources because their shingle sets stay
    // strict subsets. The oracle replays the df cut verbatim. For
    // corpora too hot even capped, [[Dedup.containmentPairsApprox]]
    // estimates C from banded MinHash signatures (DedupSpec-graded).
    QueryDef(
      "q164_containment_capped",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val boiler = " subscribe to our newsletter for daily updates and follow us on social media"
        val base = d.select(col("doc_id"),
          concat(col("text"), lit(boiler)).as("text"))
        val truncated = d.filter(col("doc_id") < 30)
          .select((col("doc_id") + 100000000).as("doc_id"),
            Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            array_join(slice(col("toks"), lit(1),
              (size(col("toks")) / 2).cast("int")), " ").as("text"))
        val corpus = base.unionByName(truncated)
        Dedup.containmentPairs(corpus, "doc_id", "text", n = 3, tau = 0.9,
          maxDocFreq = Some(100L))
      },
      Some("""
        WITH corpus AS (
          SELECT doc_id,
                 text || ' subscribe to our newsletter for daily updates and follow us on social media' AS text
          FROM documents
          UNION ALL
          SELECT doc_id + 100000000 AS doc_id,
                 array_to_string(list_slice(
                   string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
                   1,
                   len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) // 2),
                   ' ') AS text
          FROM documents WHERE doc_id < 30
        ), toks AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM corpus
        ), shu AS (
          SELECT doc_id,
                 unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       for i in range(1, len(w) - 1)])) AS s
          FROM toks WHERE len(w) >= 3
        ), hot AS (
          SELECT s FROM shu GROUP BY s HAVING count(*) > 100
        ), capped AS MATERIALIZED (
          SELECT doc_id, s FROM shu ANTI JOIN hot USING (s)
        ), sz AS MATERIALIZED (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
          FROM capped GROUP BY doc_id
        ), pairs AS MATERIALIZED (
          -- inverted-index spelling over the CAPPED postings (the
          -- same df-capped join the Spark side runs): equi-join on
          -- shingle + shared-count, denominators = capped list sizes
          -- — same integers as the all-pairs list_intersect form
          SELECT p.x, p.y, p.nc, sx.sz AS nx, sy.sz AS ny FROM (
            SELECT x.doc_id AS x, y.doc_id AS y,
                   CAST(count(*) AS BIGINT) AS nc
            FROM capped x JOIN capped y
              ON x.s = y.s AND x.doc_id < y.doc_id
            GROUP BY 1, 2) p
          JOIN sz sx ON sx.doc_id = p.x
          JOIN sz sy ON sy.doc_id = p.y
        ), directed AS (
          SELECT x AS a, y AS b, round(nc::DOUBLE / nx, 6) AS containment FROM pairs
          UNION ALL
          SELECT y AS a, x AS b, round(nc::DOUBLE / ny, 6) AS containment FROM pairs
        )
        SELECT a, b, containment FROM directed WHERE containment >= 0.9""")),

    // ----- Per-document n-gram novelty (first-seen attribution) -----
    // [[graft.operators.Novelty.ngramNovelty]]: fraction of each
    // document's distinct trigrams the corpus sees FIRST in that
    // document (min doc_id attribution) — the marginal-contribution
    // signal behind selection-by-contribution curation; near-zero
    // novelty flags boilerplate stitched from many sources that
    // pairwise dedup can't pair. Two map-side-combined fixed-width
    // aggregations; the shingle-keyed join reuses the aggregation's
    // hash partitioning.
    QueryDef(
      "q142_ngram_novelty",
      (spark, dir) =>
        graft.operators.Novelty.ngramNovelty(
          Tables.load(spark, dir, "documents"), "doc_id", "text", n = 3),
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), pairs AS (
          SELECT doc_id,
                 unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       for i in range(1, len(w) - 1)])) AS sh
          FROM toks WHERE len(w) >= 3
        ), fs AS (
          SELECT sh, min(doc_id) AS first_id FROM pairs GROUP BY sh
        )
        SELECT p.doc_id,
               CAST(count(*) AS BIGINT) AS n_sh,
               CAST(sum(CASE WHEN f.first_id = p.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               round(sum(CASE WHEN f.first_id = p.doc_id THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS novelty
        FROM pairs p JOIN fs f USING (sh)
        GROUP BY p.doc_id"""),
      // benched: the shingle window + id agg IS the measured surface
      bench = true),

    // ----- Blocklist (C4 badwords) filter -----
    // C4's "remove any page containing a word from the blocklist",
    // kept as a density signal rather than a silent drop: flagged docs
    // surface with their occurrence count so the threshold is a
    // downstream knob. The list here is a 3-term placeholder (the real
    // C4 list is an external asset — same mechanism, longer literal;
    // at production size move it from an array literal to a broadcast
    // join on the exploded tokens). Zero-shuffle projection: tokenize →
    // per-row filtered count inside one projection, no explode, no agg.
    QueryDef(
      "q144_blocklist_filter",
      (spark, dir) => {
        val bad = Seq("slow", "spam", "xyzzy") // only "slow" occurs
        val badArr = array(bad.map(lit): _*)
        Tables.load(spark, dir, "documents")
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).as("n_tokens"),
            size(filter(col("toks"),
              t => array_contains(badArr, t))).as("n_bad"))
          .filter(col("n_bad") > 0)
          .withColumn("bad_density",
            round(col("n_bad").cast("double") / col("n_tokens"), 6))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), f AS (
          SELECT doc_id, len(w) AS n_tokens,
                 len([x FOR x IN w IF list_contains(['slow', 'spam', 'xyzzy'], x)]) AS n_bad
          FROM t
        )
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               CAST(n_bad AS INT) AS n_bad,
               round(n_bad::DOUBLE / n_tokens, 6) AS bad_density
        FROM f WHERE n_bad > 0"""),
      // benched: q144 and q146 bracket the blocklist cost — token-join
      // vs one-pass automaton
      bench = true),

    // ----- Multi-phrase blocklist via one-pass Aho–Corasick -----
    // Eighth native codegen expression
    // ([[graft.functions.PhraseHits]]): q144 catches single blocklist
    // TOKENS; real blocklists (C4's badwords) are full of multi-word
    // PHRASES, where the per-token join is blind and the composable
    // spelling is one regex pass per phrase (O(L·|text|)). The
    // automaton counts every phrase occurrence in ONE O(|text|) walk —
    // zero-shuffle projection inside whole-stage codegen. The phrase
    // list here cannot self-overlap, so the oracle's non-overlapping
    // replace-count equals the automaton's overlap-counting exactly.
    QueryDef(
      "q146_phrase_blocklist",
      (spark, dir) => {
        val phrases = Seq("slow hash batch", "big data", "window fast query")
        Tables.load(spark, dir, "documents")
          .select(col("doc_id"), Text.normalize(col("text")).as("t"))
          .select(col("doc_id"),
            org.apache.spark.sql.GraftColumn.of(graft.functions.PhraseHits(
              org.apache.spark.sql.GraftColumn.expr(col("t")),
              phrases)).as("n_hits"))
          .filter(col("n_hits") > 0)
      },
      Some("""
        WITH t AS (
          SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
          FROM documents
        ), h AS (
          SELECT doc_id,
            (length(s) - length(replace(s, 'slow hash batch', ''))) // length('slow hash batch')
          + (length(s) - length(replace(s, 'big data', ''))) // length('big data')
          + (length(s) - length(replace(s, 'window fast query', ''))) // length('window fast query')
            AS n_hits
          FROM t
        )
        SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
        FROM h WHERE n_hits > 0"""))
  )

}
