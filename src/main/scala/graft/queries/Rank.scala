package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{Bm25, Fusion, Mixture, PageRank, Postings}
import graft.sources.Tables

/** Ranking-layer operators: BM25 retrieval, link-graph quality scores
  * (PageRank/TrustRank), and loss-aware mixture reweighting (DoReMi).
  * These extend the reference's SQL-shaped search surface
  * (dags/tutorial_taskflow_api_etl.py's filter+extract chain) with the
  * ranking primitives a web-scale curation pipeline runs: full-text
  * relevance, crawl-graph authority, and training-mixture optimization.
  * Every query here is EXACTLY oracle-checked — the graph scores are
  * integer-mass (bit-reproducible), and retrieval/mixture scores use
  * the micro-nat fixed-point idiom so summation order cannot drift.
  */
object Rank {

  /** Unrolled DuckDB replay of [[PageRank]]'s integer-mass power
    * iteration over the symmetrized customer↔supplier trade graph:
    * per step, each node's new mass is its teleport base plus the
    * floor-divided damped in-flow — BIGINT arithmetic end-to-end, so
    * the CTE chain reproduces the Spark masses bit-for-bit.
    * `seedFilter` switches between uniform teleport (PageRank) and
    * seed-only teleport (TrustRank). */
  private def pagerankSql(iters: Int, seeded: Boolean): String = {
    val header = s"""
        WITH pairs AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS a,
                          CAST(l_suppkey * 2 + 1 AS BIGINT) AS b
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        e AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        outdeg AS (
          SELECT src, CAST(count(*) AS BIGINT) AS outdeg
          FROM e GROUP BY src),
        eo AS MATERIALIZED (
          SELECT e.src, e.dst, o.outdeg
          FROM e JOIN outdeg o ON o.src = e.src),""" +
      (if (seeded) """
        seeds AS (
          SELECT CAST(c_custkey * 2 AS BIGINT) AS node
          FROM customer WHERE c_nationkey = 0),
        nb AS MATERIALIZED (
          SELECT n.node,
                 CASE WHEN s.node IS NULL THEN CAST(0 AS BIGINT)
                      ELSE CAST(150000 AS BIGINT) END AS base
          FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
        m0 AS (
          SELECT node, CASE WHEN base = 0 THEN CAST(0 AS BIGINT)
                            ELSE CAST(1000000 AS BIGINT) END AS mass
          FROM nb)"""
      else """
        nb AS MATERIALIZED (
          SELECT node, CAST(150000 AS BIGINT) AS base FROM nodes),
        m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nb)""")
    val steps = (1 to iters).map { i =>
      s""",
        m$i AS MATERIALIZED (
          SELECT n.node, CAST(n.base + coalesce(s.c, 0) AS BIGINT) AS mass
          FROM nb n LEFT JOIN (
            SELECT eo.dst,
                   CAST(sum((m.mass * 85) // (eo.outdeg * 100)) AS BIGINT) AS c
            FROM eo JOIN m${i - 1} m ON m.node = eo.src
            GROUP BY eo.dst) s ON s.dst = n.node)"""
    }.mkString
    header + steps + s"""
        SELECT node, mass FROM m$iters"""
  }

  /** The symmetrized trade graph both graph queries rank: customer c
    * traded with supplier s (via any lineitem of any of c's orders) ⇒
    * arcs c→s and s→c. Key spaces are disambiguated into one LONG id
    * space (customers even, suppliers odd). */
  private def tradeEdges(spark: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("a"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Guard for the once-per-(JVM, dir) staged-edge build below: the
    * bucketed write must run exactly once per JVM even if both graph
    * queries (or sibling sessions sharing the catalog) race to it. */
  private val stagedEdgeBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The PRODUCTION layout both graph queries read: [[tradeEdges]]
    * staged through [[PageRank.stageEdges]] into `(src, dst, outdeg)`
    * and persisted SRC-BUCKETED in the session catalog
    * ([[graft.sources.Sinks.writeBucketed]]), built ONCE per
    * (session, sf-dir) and shared by q125 and q126. Every power-
    * iteration round's mass⋈edges join then reads the bucket layout
    * with ZERO Exchange on the edge side — the dominant data volume
    * (the edge table) never reshuffles across the 5 rounds, which
    * both matches the 100 TB serving shape (pay the edge shuffle once
    * at write time, never per round — at cluster scale use a bucket
    * count sized to executor parallelism) and cuts the chained-
    * shuffle surface the 5-round scheduler amplifier had to amplify
    * (the r10 q126 driver-stamp variance). The table is DROPPED and
    * rewritten on first touch per JVM, never trusted across runs —
    * testdata regenerates between rounds, and a stale warehouse table
    * would silently rank last round's graph. PageRankSpec pins
    * staged == raw masses and the exchange-free per-round plan. */
  /** Order-sensitive FNV-1a ([[graft.operators.Layout.fnv1a64]]) over
    * the raw dir string — the collision-resistant half of the
    * staged-table name. Sanitization alone is many-to-one (`sf0.1`,
    * `sf0_1`, `sf0-1` all sanitize to `sf0_1`, and the catalog is
    * case-insensitive), so the name carries BOTH the readable
    * sanitized dir and this hash of the exact raw dir: distinct dirs
    * get distinct tables with 2^-64-class collision odds, and the
    * readable prefix keeps the warehouse debuggable. Locale.ROOT:
    * default-locale lowercasing can emit non-ASCII (tr-TR maps 'I' to
    * dotless ı), which would break the identifier invariant. */
  private[graft] def dirTag(raw: String): String =
    raw.replaceAll("[^A-Za-z0-9]", "_").toLowerCase(java.util.Locale.ROOT) +
      "_" + java.lang.Long.toHexString(
        graft.operators.Layout.fnv1a64(raw.iterator.map(_.toLong)))

  private def stagedTradeEdges(spark: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame = {
    // the cache key and table name fold in a fingerprint of the edge
    // SOURCE files (paths+lengths+mtimes of orders/lineitem parquet):
    // a dir whose parquet is regenerated mid-JVM gets a fresh staged
    // table instead of silently ranking the stale graph. Stale
    // prior-fingerprint tables are unreachable garbage in the per-PID
    // /tmp warehouse — bounded by regenerations per JVM, gone with it.
    val fp = java.lang.Long.toHexString(
      Tables.fingerprint(spark, dir, Seq("orders", "lineitem")))
    val table = "pr_edges_staged_" + dirTag(dir) + "_" + fp
    // cache key = (raw dir, fingerprint): every session in this JVM
    // shares the in-memory catalog and the per-PID warehouse
    // (scratchPath), so one build per (JVM, dir, source-state) is both
    // sufficient and necessary — keying by session identity would make
    // a newSession() clone drop-and-rewrite a table the parent's cache
    // already points at. No cross-JVM cleanup is needed (and none
    // would work): the warehouse dir is per-PID under /tmp, so a dead
    // JVM's staged tables are unreachable from any later catalog and
    // go with /tmp.
    stagedEdgeBuilt.computeIfAbsent(s"$dir|$fp", _ => {
      graft.sources.Sinks.writeBucketed(
        PageRank.stageEdges(tradeEdges(spark, dir)), table,
        buckets = 32, keys = Seq("src"))
      table
    })
    spark.table(table)
  }

  /** The three literal probe queries the retrieval family (q124, q128,
    * q129) shares — an eval-set stand-in. */
  private def probes(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    Seq(
      (1L, "spark join fast"),
      (2L, "window agg stream"),
      (3L, "customer order value")).toDF("query_id", "qtext")
  }

  /** The shared DuckDB replay of [[Bm25.topKFromPostings]] over the
    * probe set: CTEs `q` → `tf`/`dl`/`stats` → `qterms`/`df` →
    * per-term micro-scores → `scored` → `ranked`. q124 selects from
    * `ranked` directly; q128 chains the RM3 expansion CTEs and q129
    * the RRF fusion CTEs on top. Constants are interpolated from the
    * same Scala doubles the Spark side uses, so both engines parse
    * identical literals. */
  private val bm25CtesSql: String = {
    val (k1, b) = (1.2, 0.75)
    s"""
        WITH q AS (
          SELECT CAST(query_id AS BIGINT) AS query_id, qtext
          FROM (VALUES (1, 'spark join fast'),
                       (2, 'window agg stream'),
                       (3, 'customer order value')) t(query_id, qtext)),
        toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents),
        tf AS MATERIALIZED (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE len(term) > 0 GROUP BY doc_id, term),
        dl AS MATERIALIZED (
          SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
          FROM tf GROUP BY doc_id),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
        qterms AS (
          SELECT DISTINCT query_id, term FROM (
            SELECT query_id, unnest(string_split(qtext, ' ')) AS term
            FROM q) WHERE len(term) > 0),
        df AS (
          SELECT term, CAST(count(*) AS DOUBLE) AS df
          FROM tf WHERE term IN (SELECT term FROM qterms)
          GROUP BY term),
        matched AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(round(
                   ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ${k1 + 1.0})
                   / (tf.tf + $k1 * (${1.0 - b} + $b * dl.dl / s.avgdl))
                   * 1000000.0) AS BIGINT) AS c
          FROM tf
          JOIN qterms qt USING (term)
          JOIN df USING (term)
          JOIN dl USING (doc_id)
          CROSS JOIN stats s),
        scored AS (
          SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_fp
          FROM matched GROUP BY query_id, doc_id),
        ranked AS (
          SELECT query_id, doc_id, score_fp,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score_fp DESC, doc_id) AS rank
          FROM scored)"""
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- BM25 ranked retrieval (decontamination / index serving) -----
    // Full-text relevance over the inverted index
    // ([[graft.operators.Bm25]]): three probe queries retrieve their
    // top-10 corpus documents by Okapi BM25. Integer micro-scores make
    // the ranking bit-stable across engines; the plan touches the
    // corpus once (the tf shuffle), keeps df query-vocabulary-sized by
    // pre-joining the broadcast probe terms, and broadcasts the 1-row
    // corpus stats. The production decontamination shape: probe = eval
    // set, corpus = training candidate pool.
    QueryDef(
      "q124_bm25_topk",
      (spark, dir) =>
        Bm25.topK(Tables.load(spark, dir, "documents"),
          "doc_id", "text", probes(spark), k = 10),
      Some(bm25CtesSql + """
        SELECT query_id, doc_id, rank, score_fp
        FROM ranked WHERE rank <= 10""")),

    // ----- RM3 pseudo-relevance feedback (query expansion) -----
    // The probe-widening step ([[graft.operators.Bm25]]
    // rm3ExpansionTerms): top-10 BM25 documents per probe form the
    // pseudo-relevant set; the 5 best non-query terms by
    // tf/dl-weighted BM25 mass become expansion terms. Both factors
    // fixed-point, so the expansion ranking is bit-stable. Oracle
    // chains the expansion CTEs onto the shared BM25 replay — the
    // hash covers retrieval AND expansion end-to-end.
    QueryDef(
      "q128_rm3_expansion",
      (spark, dir) =>
        Bm25.rm3ExpansionTerms(Tables.load(spark, dir, "documents"),
          "doc_id", "text", probes(spark), kDocs = 10, mTerms = 5),
      Some(bm25CtesSql + """,
        top AS (
          SELECT query_id, doc_id, score_fp
          FROM ranked WHERE rank <= 10),
        expw AS (
          SELECT t.query_id, tf.term,
                 CAST(sum(CAST(round(tf.tf::DOUBLE / dl.dl * 1000000.0) AS BIGINT)
                          * t.score_fp) AS BIGINT) AS weight_fp
          FROM tf
          JOIN top t USING (doc_id)
          JOIN dl USING (doc_id)
          GROUP BY t.query_id, tf.term),
        noq AS (
          SELECT e.query_id, e.term, e.weight_fp
          FROM expw e LEFT JOIN qterms qt
            ON qt.query_id = e.query_id AND qt.term = e.term
          WHERE qt.term IS NULL),
        exp_ranked AS (
          SELECT query_id, term, weight_fp,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY weight_fp DESC, term) AS rank
          FROM noq)
        SELECT query_id, term, rank, weight_fp
        FROM exp_ranked WHERE rank <= 5""")),

    // ----- Reciprocal-rank fusion (hybrid retrieval merge) -----
    // [[graft.operators.Fusion]]: fuse each probe's BM25 relevance
    // ranking with a global document-length quality prior (the
    // top-10 longest documents — a stand-in for any second retriever:
    // dense ANN, freshness, PageRank). RRF contributions are rounded
    // reciprocal ranks summed as BIGINT — bit-stable. Inputs are
    // top-k-truncated, so fusion never touches the corpus.
    QueryDef(
      "q129_rrf_fusion",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val bm = Bm25.topK(d, "doc_id", "text", probes(spark), k = 10)
        val priorTop = d.select(col("doc_id"), col("n_chars"))
          .orderBy(col("n_chars").desc, col("doc_id")).limit(10)
        val prior = priorTop.withColumn("rank",
            row_number().over(Window.partitionBy(lit(1))
              .orderBy(col("n_chars").desc, col("doc_id"))))
          .select(col("doc_id"), col("rank"))
        val priorPerQuery = probes(spark).select(col("query_id"))
          .crossJoin(broadcast(prior))
        Fusion.rrf(Seq(bm, priorPerQuery), k = 5)
      },
      Some(bm25CtesSql + """,
        bm AS (
          SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10),
        prior AS (
          SELECT doc_id, rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
            FROM documents) WHERE rank <= 10),
        prior_q AS (
          SELECT qq.query_id, p.doc_id, p.rank
          FROM (SELECT query_id FROM q) qq CROSS JOIN prior p),
        contribs AS (
          SELECT query_id, doc_id,
                 CAST(round(1000000.0 / (60.0 + rank)) AS BIGINT) AS c
          FROM bm
          UNION ALL
          SELECT query_id, doc_id,
                 CAST(round(1000000.0 / (60.0 + rank)) AS BIGINT) AS c
          FROM prior_q),
        fused AS (
          SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_fp
          FROM contribs GROUP BY query_id, doc_id),
        fr AS (
          SELECT query_id, doc_id, rrf_fp,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY rrf_fp DESC, doc_id) AS rank
          FROM fused)
        SELECT query_id, doc_id, rank, rrf_fp
        FROM fr WHERE rank <= 5""")),

    // ----- PageRank link-graph authority (crawl curation signal) -----
    // Integer-mass damped power iteration
    // ([[graft.operators.PageRank]], Page et al. 1999) over the
    // symmetrized customer↔supplier trade graph — the Common-Crawl-
    // style host-authority signal, bit-reproducibly. 5 rounds; the
    // oracle replays every round in BIGINT, so the hash check covers
    // the full iteration, not a converged approximation. REGISTERED
    // through the production spelling ([[stagedTradeEdges]] +
    // [[PageRank.ranksStaged]]): the src-bucketed edge table makes
    // every round's join exchange-free on the edge side; masses are
    // bit-identical to the raw-edge spelling (integer arithmetic —
    // PageRankSpec pins the parity), so the oracle is unchanged.
    QueryDef(
      "q125_pagerank",
      (spark, dir) =>
        PageRank.ranksStaged(stagedTradeEdges(spark, dir), iters = 5),
      Some(pagerankSql(iters = 5, seeded = false))),

    // ----- TrustRank seeded authority (spam demotion) -----
    // The seeded/personalized form (Gyöngyi et al. 2004): teleport
    // mass flows only to a vetted seed set (nation-0 customers), so
    // trust decays with link distance from the seeds — the link-spam
    // demotion signal. Same integer-mass loop, seed-gated base mass,
    // same registered bucketed layout as q125 (SHARED — the staged
    // table is built once per session and read by both).
    QueryDef(
      "q126_trustrank",
      (spark, dir) => {
        val seeds = Tables.load(spark, dir, "customer")
          .filter(col("c_nationkey") === 0)
          .select((col("c_custkey") * 2).cast("long").as("node"))
        PageRank.seededRanksStaged(stagedTradeEdges(spark, dir), seeds,
          iters = 5)
      },
      Some(pagerankSql(iters = 5, seeded = true))),

    // ----- DoReMi mixture reweighting (training-mixture optimization) -----
    // One exponentiated-gradient step of DoReMi (Xie et al. 2023) over
    // the 20 document sources ([[graft.operators.Mixture]]): domains
    // whose unigram NLL exceeds the corpus mean gain weight. Corpus
    // aggregation is integer micro-nats (bit-stable); only the final
    // 20-row softmax runs in doubles, each expression mirrored
    // verbatim. Complements q72's size-based temperature mixing.
    QueryDef(
      "q127_doremi_mixture",
      (spark, dir) =>
        Mixture.doremiStep(Tables.load(spark, dir, "documents"),
          "text", "source", eta = 10.0),
      Some("""
        WITH toks AS (
          SELECT source AS domain, unnest(string_split(text, ' ')) AS term
          FROM documents),
        dtf AS MATERIALIZED (
          SELECT domain, term, CAST(count(*) AS BIGINT) AS dtf
          FROM toks WHERE len(term) > 0 GROUP BY domain, term),
        tf AS MATERIALIZED (
          SELECT term, CAST(sum(dtf) AS BIGINT) AS tf FROM dtf GROUP BY term),
        total AS (SELECT CAST(sum(tf) AS BIGINT) AS corpus_n FROM tf),
        lp AS (
          SELECT term,
                 CAST(round(ln(tf::DOUBLE / corpus_n) * 1000000.0) AS BIGINT) AS lp_fp
          FROM tf CROSS JOIN total),
        bydom AS (
          SELECT domain, CAST(sum(dtf * lp_fp) AS BIGINT) AS lp_sum,
                 CAST(sum(dtf) AS BIGINT) AS n_tokens
          FROM dtf JOIN lp USING (term) GROUP BY domain),
        ndocs AS (
          SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
        overall AS (
          SELECT CAST(sum(lp_sum) AS BIGINT) AS lp_all,
                 CAST(sum(n_tokens) AS BIGINT) AS n_all FROM bydom),
        scored AS (
          SELECT domain AS source, n_docs, n_tokens,
                 round(-lp_sum::DOUBLE / n_tokens / 1000000.0, 6) AS mean_nll,
                 round(greatest(0.0,
                   (-lp_sum::DOUBLE / n_tokens / 1000000.0)
                   - (-lp_all::DOUBLE / n_all / 1000000.0)), 6) AS excess,
                 round(exp(10.0 * greatest(0.0,
                   (-lp_sum::DOUBLE / n_tokens / 1000000.0)
                   - (-lp_all::DOUBLE / n_all / 1000000.0))), 6) AS w
          FROM bydom JOIN ndocs USING (domain) CROSS JOIN overall)
        SELECT source, n_docs, n_tokens, mean_nll, excess,
               round(w / sum(w) OVER (), 6) AS weight
        FROM scored""")),

    // ----- Stride-scheduled mixture interleave (training order) -----
    // [[graft.operators.CorpusPrep.strideInterleave]] (Waldspurger &
    // Weihl 1995): the deterministic order in which a mixed-source
    // training stream visits its sources at rates ∝ n_s^0.3 — the
    // complement of q72's temperature SELECTION. Every prefix of the
    // key-ordered stream is within one document of the target mix.
    // Seeded-md5 per-source ranks + one fixed-point key expression ⇒
    // exactly oracle-checked; no global sort anywhere (per-source
    // windows only; the consumer range-partitions by key_fp).
    QueryDef(
      "q135_stride_interleave",
      (spark, dir) =>
        graft.operators.CorpusPrep.strideInterleave(
          Tables.load(spark, dir, "documents")
            .select(col("doc_id"), col("source")),
          "doc_id", "source", alpha = 0.3, seed = "mix1:"),
      Some("""
        WITH w AS (
          SELECT source, pow(count(*)::DOUBLE, 0.3) AS w
          FROM documents GROUP BY source),
        r AS (
          SELECT doc_id, source,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('mix1:' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS BIGINT) AS rk
          FROM documents)
        SELECT r.doc_id, r.source, r.rk,
               CAST(round((rk - 0.5) / w.w * 1000000.0) AS BIGINT) AS key_fp
        FROM r JOIN w USING (source)""")),

    // ----- Domain KL divergence (corpus drift monitor) -----
    // [[graft.operators.Mixture.domainKl]]: how far each source's
    // token distribution sits from the corpus — the between-crawls
    // drift report and the aggregate form of DSIR's pointwise
    // importance ratios. Micro-nat fixed point (log-ratio as a
    // DIFFERENCE of logs — no integer product to overflow at scale),
    // BIGINT sums, one Barrier-staged corpus aggregate; exactly
    // oracle-checked.
    QueryDef(
      "q136_domain_divergence",
      (spark, dir) =>
        Mixture.domainKl(Tables.load(spark, dir, "documents"),
          "text", "source"),
      Some("""
        WITH toks AS (
          SELECT source AS domain, unnest(string_split(text, ' ')) AS term
          FROM documents),
        dtf AS MATERIALIZED (
          SELECT domain, term, CAST(count(*) AS BIGINT) AS dtf
          FROM toks WHERE len(term) > 0 GROUP BY domain, term),
        tf AS MATERIALIZED (
          SELECT term, CAST(sum(dtf) AS BIGINT) AS tf FROM dtf GROUP BY term),
        total AS (SELECT CAST(sum(tf) AS BIGINT) AS corpus_n FROM tf),
        nd AS (
          SELECT domain, CAST(sum(dtf) AS BIGINT) AS n_d
          FROM dtf GROUP BY domain),
        contrib AS (
          SELECT d.domain, nd.n_d,
                 d.dtf * CAST(round((ln(d.dtf::DOUBLE / nd.n_d)
                                     - ln(tf.tf::DOUBLE / t.corpus_n))
                                    * 1000000.0) AS BIGINT) AS c
          FROM dtf d
          JOIN tf USING (term)
          JOIN nd USING (domain)
          CROSS JOIN total t),
        agg AS (
          SELECT domain, any_value(n_d) AS n_tokens,
                 CAST(sum(c) AS BIGINT) AS acc
          FROM contrib GROUP BY domain)
        SELECT domain AS source, n_tokens,
               round(acc::DOUBLE / n_tokens / 1000000.0, 6) AS kl
        FROM agg""")),

    // ----- Exact phrase search over a positional inverted index -----
    // [[graft.operators.Postings]]: the quotation-search/contamination-
    // audit companion to q124's BM25 — (term, doc_id, pos) postings
    // built zero-shuffle, phrase matched by joining the phrase terms'
    // posting lists on (doc_id, pos + offset). The probe phrase is
    // self-deriving (the corpus's most frequent trigram, count-desc /
    // text-asc tiebreak — one bounded 1-row collect, the Bpe idiom), so
    // the query survives testdata regeneration. The oracle counts the
    // same phrase's occurrence positions directly; since the phrase is
    // 3 tokens, adjacency-join occurrences == trigram occurrences,
    // overlaps included.
    QueryDef(
      "q141_phrase_search",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val phrase = Postings.topNgram(d, "text", n = 3)
        Postings.phraseOccurrences(
          Postings.build(d, "doc_id", "text"), phrase)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), tri AS (
          SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in range(1, len(w) - 1)]) AS ng
          FROM toks WHERE len(w) >= 3
        ), top AS (
          SELECT ng FROM tri GROUP BY ng
          ORDER BY count(*) DESC, ng LIMIT 1
        )
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        FROM tri t JOIN top USING (ng)
        GROUP BY t.doc_id""")),

    // ----- Phrase search served from the PERSISTED postings index -----
    // q141's serving shape at 100 TB ([[Postings.writeIndex]] /
    // [[Postings.phraseOccurrencesFromIndex]], the q79 disk-sibling
    // pattern): the postings persist partitioned by term-hash bucket,
    // the probe pushes its terms' buckets as a partition IN-filter
    // (listing-time directory pruning) and the term IN-list as a
    // pushed data filter — cost bounded by the phrase terms' buckets,
    // independent of corpus size (PostingsSpec pins PartitionFilters
    // and the exact touched-directory set). Same self-deriving top
    // trigram and the same direct-count oracle as q141, so the disk
    // round-trip is oracle-checked end-to-end, not just
    // parity-checked. Fixed scratch path + overwrite, like q79;
    // benched: expect ≈ q141 + the index-write cost.
    QueryDef(
      "q166_phrase_index",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val phrase = Postings.topNgram(d, "text", n = 3)
        val path = scratchPath("postings_index")
        Postings.writeIndex(Postings.build(d, "doc_id", "text"), path,
          nBuckets = 64)
        Postings.phraseOccurrencesFromIndex(spark, path, phrase, nBuckets = 64)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM documents
        ), tri AS (
          SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in range(1, len(w) - 1)]) AS ng
          FROM toks WHERE len(w) >= 3
        ), top AS (
          SELECT ng FROM tri GROUP BY ng
          ORDER BY count(*) DESC, ng LIMIT 1
        )
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        FROM tri t JOIN top USING (ng)
        GROUP BY t.doc_id""")),

    // ----- UniMax epoch-capped mixture allocation -----
    // [[graft.operators.Mixture.unimaxAllocation]] (Chung et al. 2023):
    // waterfill a 50k-token budget uniformly over sources with a
    // 2-epoch per-source cap — the third mixing policy beside size-
    // based temperature sampling (q72) and loss-based DoReMi (q127).
    // All prefix arithmetic is LONG (the capped-prefix condition
    // c·n_i·(S−i+1) ≤ B−P_{i−1}); only the final divisions are double,
    // mirrored verbatim — exactly oracle-checked.
    QueryDef(
      "q145_unimax_mixture",
      (spark, dir) =>
        Mixture.unimaxAllocation(
          Tables.load(spark, dir, "documents"), "text", "source",
          budget = 50000L, capEpochs = 2),
      Some("""
        WITH n AS (
          SELECT source,
                 CAST(sum(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ), o AS (
          SELECT source, n_tokens, n_tokens * 2 AS capped,
                 CAST(row_number() OVER (ORDER BY n_tokens * 2, source) AS BIGINT) AS i,
                 CAST(coalesce(sum(n_tokens * 2) OVER (
                   ORDER BY n_tokens * 2, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p_prev,
                 CAST(count(*) OVER () AS BIGINT) AS s_cnt,
                 CAST(sum(n_tokens * 2) OVER () AS BIGINT) AS total_capped
          FROM n
        ), c AS (
          SELECT *, (capped * (s_cnt - i + 1) <= 50000 - p_prev) AS cond FROM o
        ), kk AS (
          SELECT max(CASE WHEN cond THEN i ELSE 0 END) AS k,
                 max(CASE WHEN cond THEN p_prev + capped ELSE 0 END) AS p_k
          FROM c
        ), a AS (
          SELECT c.source, c.n_tokens, c.total_capped,
                 CASE WHEN c.i <= kk.k THEN c.capped::DOUBLE
                      ELSE (50000 - kk.p_k)::DOUBLE / (c.s_cnt - kk.k)::DOUBLE
                 END AS alloc
          FROM c CROSS JOIN kk
        )
        SELECT source, n_tokens, round(alloc, 6) AS alloc,
               round(alloc / n_tokens, 6) AS epochs,
               round(alloc / least(50000, total_capped)::DOUBLE, 6) AS share
        FROM a"""))
  )
}
