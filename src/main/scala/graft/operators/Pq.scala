package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou, Douze & Schmid 2011, "Product
  * quantization for nearest neighbor search"): split each `dim`-vector
  * into `m` subvectors, learn a small L2 k-means codebook (`k` codes)
  * per subspace, and store each vector as `m` small codes —
  * `m·log2(k)` bits instead of `dim·32`. Queries score candidates by
  * ASYMMETRIC DISTANCE COMPUTATION (ADC): the query stays float, and
  * `dot(q, x) ≈ Σ_j dot(q_j, codebook_j[code_j(x)])` — m nested-array
  * lookups per candidate, never a float-vector read.
  *
  * This completes the quantization lever set: SQ8 (q86/q91) shrinks
  * byte WIDTH per dimension, JL (q122/q123) shrinks the DIMENSION
  * count, PQ replaces the vector with SUBSPACE CODES — at dim=64,
  * m=8, k=16 the index is 8 nibbles (4 bytes) per vector vs 256 float
  * bytes: 64× smaller, the regime where a 100 TB embedding corpus's
  * index fits in cluster memory.
  *
  * Scale shape: training is Lloyd iterations over a deterministic
  * hash-sample with ONE aggregate per iteration covering ALL m
  * subspaces (groups = m·k·(dim/m) cells — bounded, tiny); only
  * m·k·(dim/m) doubles ever reach the driver (the [[Ivf]] discipline).
  * Encoding is a zero-shuffle projection (the persisted index
  * artifact). Serving is the q123 prefilter→rescore shape: ADC
  * shortlists `nCand` per query over the codes-only scan against the
  * BROADCAST query batch, and only the shortlist pays the exact
  * float cosine.
  *
  * Like the other trained-ANN paths (q52/q79/q91), k-means codebooks
  * are not oracle-reproducible — the query is rows-only and PqSpec
  * grades recall against the exact baseline plus exact hand-checks of
  * the encode/ADC arithmetic.
  */
object Pq {

  /** Nearest codebook entry for one subvector by squared L2 (lowest
    * index wins ties). `codebook` is k × (dim/m). Reference form for
    * [[encodeRef]] only — the hot path is the native [[encode]]. */
  private def assignSub(codebook: Seq[Seq[Double]], sub: Column): Column = {
    val cb = typedlit(codebook)
    val dists = transform(cb, c =>
      aggregate(zip_with(c, sub, (x, y) =>
        (x - y.cast("double")) * (x - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** `m` codes for a full vector under `codebooks` (m × k × dim/m),
    * via the native fused-loop kernel [[graft.functions.PqEncode]].
    * The HigherOrderFunction form ([[encodeRef]]) paid interpreted
    * lambda frames and boxing m×k×(dim/m) times per vector — encoding
    * is the one full-corpus projection of every PQ index build, so it
    * is THE index cost at 100 TB. Bit-identical results
    * (AnnKernelsSpec pins equality, ties included). */
  def encode(codebooks: Seq[Seq[Seq[Double]]], vec: Column): Column = {
    require(codebooks.nonEmpty, "need at least one subspace")
    org.apache.spark.sql.GraftColumn.of(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftColumn.expr(vec), codebooks))
  }

  /** Reference (HigherOrderFunction) form of [[encode]] — retained for
    * AnnKernelsSpec's bit-equality pin. */
  private[graft] def encodeRef(codebooks: Seq[Seq[Seq[Double]]],
      vec: Column): Column = {
    val m = codebooks.length
    require(m > 0, "need at least one subspace")
    val sub = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      assignSub(cb, slice(vec, j * sub + 1, sub))
    }: _*)
  }

  /** Train per-subspace L2 codebooks by Lloyd iterations over a
    * deterministic hash-sample. Seeds = the k lowest-xxhash vectors'
    * subvectors; empty cells keep their previous centroid. One
    * aggregate per iteration covers every subspace; only
    * m·k·(dim/m) doubles reach the driver.
    */
  def trainCodebooks(corpus: DataFrame, dim: Int, m: Int, k: Int,
      iters: Int = 3, trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val sample =
      if (trainFraction >= 1.0) corpus
      else corpus.filter(
        pmod(xxhash64(col(idCol)), lit(10000)) < lit((trainFraction * 10000).toLong))
    val train = sample.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v")).cache()
    try {
      val seeds = train.orderBy(xxhash64(col("id")), col("id")).limit(k)
        .select(col("v")).collect().map(_.getSeq[Double](0).toVector)
      var codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map { j =>
        seeds.toSeq.map(v => v.slice(j * sub, j * sub + sub): Seq[Double])
      }
      for (_ <- 0 until iters) {
        // encode in its own projection BELOW the generators (the
        // generator-projection pitfall: a fused select would re-run
        // the full encode once per exploded element)
        val coded = train
          .select(encode(codebooks, col("v")).as("codes"), col("v"))
          .select(posexplode(col("codes")).as(Seq("j", "code")), col("v"))
          .select(col("j"), col("code"),
            posexplode(expr(s"slice(v, j * $sub + 1, $sub)"))
              .as(Seq("dim", "x")))
        val means = coded.groupBy(col("j"), col("code"), col("dim"))
          .agg(avg(col("x")).as("mu"))
          .collect()
          .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
          .toMap
        codebooks = codebooks.zipWithIndex.map { case (cb, j) =>
          cb.zipWithIndex.map { case (old, c) =>
            if (means.contains((j, c, 0)))
              (0 until sub).map(d => means((j, c, d))): Seq[Double]
            else old
          }
        }
      }
      codebooks
    } finally train.unpersist(false)
  }

  /** ADC inner product of a float query against a coded candidate:
    * `Σ_j dot(slice(q, j), codebooks[j][codes[j]])`, via the native
    * fused-loop kernel [[graft.functions.AdcDotExpr]] — this runs once
    * per (query, candidate) pair in every shortlist scan, the highest
    * row-count expression of the PQ serving path. Bit-identical to the
    * HigherOrderFunction form [[adcDotRef]] (AnnKernelsSpec). */
  private[graft] def adcDot(codebooks: Seq[Seq[Seq[Double]]], qvec: Column,
                     codes: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.functions.AdcDotExpr(
        org.apache.spark.sql.GraftColumn.expr(qvec),
        org.apache.spark.sql.GraftColumn.expr(codes), codebooks))

  /** Reference (HigherOrderFunction) form of [[adcDot]] — retained for
    * AnnKernelsSpec's bit-equality pin. */
  private[graft] def adcDotRef(codebooks: Seq[Seq[Seq[Double]]], qvec: Column,
                     codes: Column): Column = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val cbLit = typedlit(codebooks)
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
      acc + aggregate(
        zip_with(
          element_at(element_at(cbLit, j + 1), element_at(codes, j + 1) + 1),
          slice(qvec, j * lit(sub) + 1, lit(sub)),
          (c, q) => c * q.cast("double")),
        lit(0.0), (a, v) => a + v))
  }

  /** PQ-prefiltered exact-rescore ANN (the q123 composition with ADC
    * as the shortlist): codes-only scan × broadcast queries → top
    * `nCand` by ADC inner product → exact cosine on the shortlist.
    *
    * @return (query_id, neighbor_id, rank, cos)
    */
  def adcPrefilterTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCand: Int, codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the persisted-index shape: (id, codes) — 4 bytes/vector at
    // m=8, k=16 — is all the prefilter scan ever reads
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      encode(codebooks, col(vecCol)).as("codes"))
    topKFromCoded(coded, corpus, queries, k, nCand, codebooks, idCol, vecCol)
  }

  /** The shortlist→rescore tail [[adcPrefilterTopK]] and
    * [[adcPrefilterTopKFromIndex]] share: ADC-shortlist `nCand` per
    * query over the coded scan against the BROADCAST query batch, then
    * exact cosine on the shortlist only. The rescore join back to the
    * float corpus is shortlist-sized (nQueries × nCand ids) against a
    * column-pruned (id, vec) scan — the codes carry the heavy scan,
    * the floats are touched `nCand`-per-query times. */
  private def topKFromCoded(coded: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, nCand: Int,
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String, vecCol: String): DataFrame = {
    require(nCand >= k, s"nCand $nCand must be >= k $k")
    val qb = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec")))
    val shortlist = coded
      .join(qb, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcDot(codebooks, col("qvec"), col("codes")).as("adc"))
      .withColumn("crank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("adc").desc, col("neighbor_id"))))
      .filter(col("crank") <= nCand)
      .select(col("query_id"), col("neighbor_id"))
    val scored = shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qvec"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineFast(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  // ---- persisted codes layout (the [[Layout]] marker protocol) ----

  /** Exact identity of the quantizer as the marker payload:
    * `m k sub fingerprint` (order-sensitive FNV-1a over every codebook
    * double's bit pattern — encoding is deterministic in the exact
    * bits, so only exact bits make two layouts compatible). */
  private val markerFile = "_graft_codebooks"

  private[operators] def codebookPayload(cbs: Seq[Seq[Seq[Double]]]): String = {
    val k = cbs.headOption.map(_.size).getOrElse(0)
    val sub = cbs.headOption.flatMap(_.headOption).map(_.size).getOrElse(0)
    s"${cbs.size} $k $sub ${Layout.fnv1a64(cbs.iterator
      .flatMap(_.iterator).flatMap(_.iterator)
      .map(java.lang.Double.doubleToLongBits))}"
  }

  private def codebookMismatch(what: String, path: String,
      cbs: Seq[Seq[Seq[Double]]])(stored: String): String =
    s"$what: codebooks (m k sub fp = ${codebookPayload(cbs)}) do not " +
      s"match the existing layout's ($stored) (marker $path/$markerFile) " +
      "— the codebooks ARE the layout; codes written under different " +
      "codebooks decode to different vectors, silently corrupting every " +
      "ADC shortlist"

  /** Persist the codes-only index: `(neighbor_id, codes)` — the
    * encode-once/probe-many artifact. Encoding is the expensive
    * full-corpus projection (m × k distance evaluations per vector);
    * the persisted codes are 64× smaller than the floats (m=8, k=16,
    * dim=64), so at 100 TB of embeddings the probe's heavy scan reads
    * ~1.6 TB of codes and touches the floats only for the
    * nCand-per-query shortlist. No partitioning: ADC is a full
    * codes-scan by design (the compression, not pruning, is the
    * lever — [[Ivf]] is the pruned layout). Marker stamped AFTER the
    * data (the [[Layout]] overwrite idiom — a crashed rebuild leaves
    * unmarked data every reader refuses). */
  def writeIndex(corpus: DataFrame, path: String,
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    Layout.rebuild(corpus.sparkSession, path, "writeIndex") {
      corpus.select(col(idCol).as("neighbor_id"),
          encode(codebooks, col(vecCol)).as("codes"))
        .write.mode("append").parquet(path)
      Layout.writeMarker(corpus.sparkSession, path, markerFile,
        codebookPayload(codebooks))
    }

  /** Incremental growth of a [[writeIndex]] layout: encode a new batch
    * through the PINNED codebooks and append — codes are pure facts
    * under a fixed quantizer, so append == rebuild exactly (PqSpec
    * pins probe and row parity; the daily-ingest shape [[Ivf
    * .appendIndex]] has for inverted lists, here for codes). The
    * codebooks are NOT retrained (retraining re-codes the corpus — a
    * rebuild); the `_graft_codebooks` marker enforces exact-bit
    * identity via the [[Layout.bootstrapOrGuard]] state machine. */
  def appendIndex(batch: DataFrame, path: String,
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    Layout.withWriterLease(batch.sparkSession, path, "appendIndex") {
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        codebookPayload(codebooks), "appendIndex",
        codebookMismatch("appendIndex", path, codebooks))
      batch.select(col(idCol).as("neighbor_id"),
          encode(codebooks, col(vecCol)).as("codes"))
        .write.mode("append").parquet(path)
    }

  /** [[appendIndex]] keyed by a streaming micro-batch id
    * ([[Layout.idempotentAppend]]): at-least-once `foreachBatch`
    * replays become no-ops — the [[Postings.appendIndexBatch]]
    * contract for the flat codes layout. */
  def appendIndexBatch(batch: DataFrame, path: String, batchId: Long,
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
    Layout.withWriterLease(batch.sparkSession, path, "appendIndexBatch") {
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        codebookPayload(codebooks), "appendIndexBatch",
        codebookMismatch("appendIndexBatch", path, codebooks))
      Layout.idempotentAppend(batch.sparkSession, path, batchId) { stg =>
        batch.select(col(idCol).as("neighbor_id"),
            encode(codebooks, col(vecCol)).as("codes"))
          .write.parquet(stg)
      }
    }

  /** [[adcPrefilterTopK]] served from a [[writeIndex]] layout: the
    * prefilter scans the persisted codes (never re-encoding the
    * corpus); only the shortlist joins back to the float corpus for
    * the exact rescore. Marker presence AND match required — probing
    * with different codebooks decodes every candidate wrong. */
  def adcPrefilterTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, queries: DataFrame, k: Int,
      nCand: Int, codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    Layout.requireMarker(spark, path, markerFile, codebookPayload(codebooks),
      "adcPrefilterTopKFromIndex",
      codebookMismatch("adcPrefilterTopKFromIndex", path, codebooks))
    topKFromCoded(spark.read.parquet(path), corpus, queries, k, nCand,
      codebooks, idCol, vecCol)
  }
}
