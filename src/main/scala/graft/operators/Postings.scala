package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Positional inverted index + exact phrase search.
  *
  * The retrieval-side companion to [[Bm25]]: BM25 ranks by bag-of-words
  * statistics, but "exact phrase" queries (quotation search,
  * contamination auditing of a benchmark sentence, boilerplate
  * tracing) need token POSITIONS. The index is the classic
  * (term, doc_id, pos) postings relation; a phrase of length L matches
  * wherever the L terms appear at consecutive positions in one
  * document.
  *
  * 100 TB shape: [[build]] is a zero-shuffle projection + generate —
  * in production the postings are written ONCE, partitioned (or
  * bucketed) BY TERM, so a phrase query reads only its own terms'
  * posting lists (partition pruning; the same layout argument as
  * [[Ivf]]'s inverted lists). [[phraseOccurrences]] then joins the L
  * per-term lists on (doc_id, pos±offset) — equi-joins whose inputs are
  * term-selective slices of the index, never the corpus; AQE broadcasts
  * the rarest term's list when it is small, which is the classic
  * "rarest-first" phrase-evaluation plan, for free. Cost is bounded by
  * the phrase terms' posting lists, independent of corpus size.
  */
object Postings {

  /** (term, doc_id, pos) positional postings — 0-based token position
    * over [[Text.tokens]]'s normalized split. Zero-shuffle: projection
    * + generate only; partition/bucket by `term` when persisting. */
  def build(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))

  /** Exact-phrase occurrences: (doc_id, n_occ) for every document
    * containing `phrase` as consecutive tokens, with the number of
    * (possibly overlapping) occurrence positions. The first term's
    * postings anchor the match; each later term joins on
    * (doc_id, pos = anchor_pos + i).
    *
    * Plan shape: the postings are slimmed to the phrase's terms ONCE
    * and hash-repartitioned by `doc_id` BEFORE the per-term branches
    * split off, so (a) the corpus-sized explode under an in-memory
    * `postings` executes a single time — every branch reads the same
    * canonicalized Exchange (ReuseExchange; the previous shape
    * re-evaluated the explode once per phrase term), and (b) the L−1
    * position joins and the final per-doc count are all clustered by
    * `doc_id` already, so no further corpus-side shuffle exists in the
    * plan (doc_id is a prefix of every join's equi-keys). AQE may still
    * broadcast a rare term's slice — the classic rarest-first phrase
    * plan — without disturbing the shared exchange. */
  def phraseOccurrences(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val terms = phrase.distinct
    val slim = postings.filter(col("term").isin(terms: _*))
      .repartition(col("doc_id"))
    val anchor = slim.filter(col("term") === lit(phrase.head))
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (term, i)) =>
        val next = slim.filter(col("term") === lit(term))
          .select(col("doc_id").as("d"), col("pos").as("p"))
        acc.join(next,
            acc("doc_id") === col("d") && col("p") === acc("pos") + lit(i))
          .select(acc("doc_id"), acc("pos"))
    }
    matched.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
  }

  /** Persist the postings TERM-BUCKETED on disk — the serving layout
    * for phrase search over a corpus that outlives one job (the
    * [[Ivf.writeIndex]] idiom pointed at text): rows are partitioned
    * by `tb = pmod(xxhash64(term), nBuckets)`, one directory per
    * bucket, so a probe's scan PRUNES at listing time to the buckets
    * its phrase terms hash into (≤ |phrase| of `nBuckets`
    * directories) and the per-term equality lands in PushedFilters
    * inside them. Hashing the term (rather than `partitionBy(term)`
    * directly) bounds the directory count at any vocabulary size —
    * a 100 TB corpus has hundreds of millions of distinct terms, and
    * million-directory listings are their own scaling failure. Within
    * each bucket the term filter still prunes via parquet min/max +
    * dictionary pages. Write cost: one corpus-sized shuffle-free
    * projection + the partitioned write. */
  def writeIndex(postings: DataFrame, path: String, nBuckets: Int = 256): Unit =
    writeIndexMode(postings, path, nBuckets, "overwrite")

  /** Incremental growth of a [[writeIndex]] layout: APPEND a new
    * batch's postings into the same term-hash-bucket directories —
    * the daily-ingestion shape (the [[Dedup.exactAgainstIndex]]
    * contract pointed at serving): postings are (term, doc_id, pos)
    * facts, so the index of corpus ∪ batch IS index(corpus) ∪
    * index(batch) — pure union, no read-modify-write, no compaction
    * logic, and a probe after the append sees old and new documents
    * alike through the same pruned scan (PostingsSpec pins append ==
    * rebuild). `nBuckets` must match the existing layout — the bucket
    * function IS the layout, and a mismatch would scatter the new
    * postings into directories the pruned probe never reads (silently
    * incomplete phrase results), so the on-disk `_graft_nbuckets`
    * marker [[writeIndex]] leaves is CHECKED here and the append
    * fails fast on disagreement. Appending onto an EMPTY markerless
    * path (a fresh layout — this call bootstraps it) stamps the marker
    * before the batch lands, so append-created layouts carry the same
    * guard as writeIndex-created ones even through a mid-append
    * crash; a POPULATED markerless path is refused outright. */
  def appendIndex(postings: DataFrame, path: String, nBuckets: Int = 256): Unit =
    // the (marker, data) crash-window state machine is the shared
    // layout protocol — documented once at [[Layout.bootstrapOrGuard]];
    // ONE writer lease spans bootstrap + publish on every composite
    Layout.withWriterLease(postings.sparkSession, path, "appendIndex") {
      Layout.bootstrapOrGuard(postings.sparkSession, path, markerFile,
        nBuckets.toString, "appendIndex", mismatchMsg("appendIndex", path, nBuckets))
      writeIndexMode(postings, path, nBuckets, "append")
    }

  /** [[appendIndex]] keyed by a streaming micro-batch id — the
    * `foreachBatch` maintenance form: the append runs through
    * [[Layout.idempotentAppend]]'s staged-publish-ledger transaction,
    * so an at-least-once replay of an already-applied batch is a
    * no-op and a crash mid-append is cleaned up and redone — the
    * streamed layout equals the clean run under any crash point
    * (StreamsSpec pins replay == clean). Returns false on a replay
    * no-op. */
  def appendIndexBatch(postings: DataFrame, path: String, batchId: Long,
      nBuckets: Int = 256): Boolean =
    Layout.withWriterLease(postings.sparkSession, path, "appendIndexBatch") {
      Layout.bootstrapOrGuard(postings.sparkSession, path, markerFile,
        nBuckets.toString, "appendIndexBatch",
        mismatchMsg("appendIndexBatch", path, nBuckets))
      Layout.idempotentAppend(postings.sparkSession, path, batchId) { stg =>
        graft.sources.Sinks.parquetPartitionedMode(
          bucketed(postings, nBuckets), stg, "overwrite", "tb")
      }
    }

  private def bucketed(postings: DataFrame, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    postings.select(col("doc_id"), col("pos"), col("term"),
      pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int").as("tb"))
  }

  private def writeIndexMode(postings: DataFrame, path: String,
      nBuckets: Int, mode: String): Unit = {
    val indexed = bucketed(postings, nBuckets)
    if (mode == "overwrite")
      // rebuilds hold the writer lease and clear-then-append instead
      // of mode("overwrite") — overwrite deletes the whole dir
      // INCLUDING an in-flight writer's lease file ([[Layout.rebuild]]).
      // The marker stamps AFTER the data, so a crash mid-rebuild
      // leaves populated-UNMARKED data — a state every probe and
      // append refuses outright (fail-fast, not silently certifiable)
      Layout.rebuild(postings.sparkSession, path, "writeIndex") {
        graft.sources.Sinks.parquetPartitionedMode(indexed, path,
          "append", "tb")
        Layout.writeMarker(postings.sparkSession, path, markerFile,
          nBuckets.toString)
      }
    else
      graft.sources.Sinks.parquetPartitionedMode(indexed, path, mode, "tb")
  }

  /** The layout's bucket count, persisted as an underscore-prefixed
    * sidecar so appenders and probes can fail fast on a
    * bucket-function mismatch instead of silently
    * mis-bucketing/mis-pruning ([[Layout]] protocol). */
  private val markerFile = "_graft_nbuckets"

  private def mismatchMsg(what: String, path: String,
      nBuckets: Int)(stored: String): String =
    s"$what: nBuckets=$nBuckets does not match the existing layout's " +
      s"$stored (marker $path/$markerFile) — the bucket function IS " +
      "the layout; probing or appending with a different count silently " +
      "drops postings"

  /** [[phraseOccurrences]] served from a [[writeIndex]] layout: the
    * phrase terms' buckets are derived through the SAME Spark
    * expression the writer used (a |phrase|-row LocalTableScan — no
    * divergent driver-side reimplementation of xxhash64), pushed as a
    * partition IN-filter, and the term IN-list rides into the pruned
    * buckets as a regular pushed filter. Cost is bounded by the
    * phrase terms' buckets — independent of corpus size
    * (PostingsSpec pins PartitionFilters + disk == memory). */
  def phraseOccurrencesFromIndex(spark: SparkSession, path: String,
      phrase: Seq[String], nBuckets: Int = 256): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    // marker PRESENCE is required, not just consistency: every graft
    // layout carries one (writeIndex stamps after the data, appendIndex
    // bootstraps before it), so its absence over data means a crashed
    // rebuild whose bucket function is unknown — probing it with an
    // assumed nBuckets would silently return incomplete phrases
    Layout.requireMarker(spark, path, markerFile, nBuckets.toString,
      "phraseOccurrencesFromIndex",
      mismatchMsg("phraseOccurrencesFromIndex", path, nBuckets))
    import spark.implicits._
    val terms = phrase.distinct
    val tbs = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).sorted
    val pruned = spark.read.parquet(path)
      .filter(col("tb").isin(tbs.map(Int.box).toSeq: _*) &&
        col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("pos"))
    phraseOccurrences(pruned, phrase)
  }

  /** The corpus's most frequent token n-gram, ties broken by n-gram
    * text ascending — a self-deriving phrase for data-driven probes
    * (robust to testdata regeneration, unlike a hard-coded literal).
    * ONE bounded driver collect: a single argmax row (the Bpe idiom). */
  def topNgram(df: DataFrame, textCol: String, n: Int): Seq[String] = {
    val top = df
      .select(Text.tokens(col(textCol)).as("toks"))
      .select(explode(Text.wordNgrams(col("toks"), n)).as("ng"))
      .groupBy(col("ng")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ng"))
      .limit(1)
      .collect()
    require(top.nonEmpty, s"corpus has no $n-grams")
    top(0).getString(0).split(' ').toSeq
  }
}
