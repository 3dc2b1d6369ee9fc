package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF+PQ — the composed ANN index (Jégou, Douze & Schmid 2011, §V:
  * the IVFADC system, minus the residual refinement): [[Ivf]]'s coarse
  * quantizer prunes WHICH lists a query reads, and [[Pq]]'s subspace
  * codes shrink WHAT each list stores. The two levers multiply: at
  * nClusters=4096, nprobe=64 a probe touches ~1.6% of the lists, and
  * at m=8, k=16 each touched row is 4 logical bytes instead of 256 —
  * a 100 TB float corpus serves from ~25 GB of touched codes per
  * probe batch, which is the regime where the whole probed working
  * set sits in one executor wave's page cache.
  *
  * Layout: `(neighbor_id, codes)` partitioned by `cluster` — the
  * [[Ivf.writeIndex]] directory scheme with [[Pq]] codes as the row
  * payload. The probe pushes the probed cluster ids as a static
  * partition filter (zero I/O outside the probed directories), ADC-
  * shortlists `nCand` per query inside them, and pays exact float
  * cosine only on the shortlist (the [[Pq.adcPrefilterTopK]] tail).
  *
  * The layout is governed by BOTH quantizers, so the
  * `_graft_ivfpq` [[Layout]] marker carries both identities
  * (centroid payload + codebook payload): a mismatch in either
  * scatters or mis-decodes, and appends/probes fail fast on each.
  * Appended batches assign + encode through the PINNED quantizers —
  * rows are pure facts under fixed quantizers, so append == rebuild
  * exactly (IvfPqSpec pins it; the [[Ivf.appendIndex]] /
  * [[Pq.appendIndex]] contract, composed).
  *
  * Exactness certificate (graded in CONTRACTS.json per bench run and
  * pinned in IvfPqSpec): probing EVERY list with a full shortlist
  * degrades to brute force bit-for-bit — pruning and compression then
  * only move recall at partial nprobe/nCand, never correctness.
  */
object IvfPq {

  private val markerFile = "_graft_ivfpq"

  /** Marker payload: flavor token + both quantizer identities. The
    * flavor ("ivfpq" raw vs "ivfpq-res" residual) is part of the
    * identity — the two layouts share a schema but decode
    * differently, so they must never mix. */
  private def payloadOf(centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], residual: Boolean): String =
    Ivf.centroidPayload(centroids, if (residual) "ivfpq-res" else "ivfpq") +
      " | " + Pq.codebookPayload(codebooks)

  /** Renders the guard failure with the CALLER's payload (flavor
    * included) against the stored one — a flavor-only mismatch must
    * show two visibly different strings. */
  private def mismatch(what: String, path: String,
      myPayload: String)(stored: String): String =
    s"$what: layout identity (flavor | centroids k dim fp | codebooks " +
      s"m k sub fp = $myPayload) does not match the existing layout's " +
      s"($stored) (marker $path/$markerFile) — the flavor and both " +
      "quantizers ARE the layout; a flavor mismatch mixes encodings the " +
      "probe mis-decodes, a centroid mismatch scatters vectors into " +
      "lists the probe ranking disagrees with, a codebook mismatch " +
      "decodes every candidate wrong"

  private def coded(batch: DataFrame, centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String, vecCol: String): DataFrame =
    batch.select(col(idCol).as("neighbor_id"),
      Ivf.assignCluster(centroids, col(vecCol)).as("cluster"),
      Pq.encode(codebooks, col(vecCol)).as("codes"))

  /** Persist the composed index: assign + encode every vector (the
    * one full-corpus projection), `partitionBy("cluster")`. Marker
    * stamped AFTER the data (the [[Layout]] overwrite idiom). */
  def writeIndex(corpus: DataFrame, path: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    writeImpl(corpus, path, centroids, codebooks, idCol, vecCol,
      residual = false)

  /** Incremental growth through the PINNED quantizer pair — pure-union
    * append into the existing cluster directories, append == rebuild
    * exactly ([[Layout.bootstrapOrGuard]] state machine). */
  def appendIndex(batch: DataFrame, path: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    appendImpl(batch, path, centroids, codebooks, idCol, vecCol,
      residual = false, "appendIndex")

  /** One write body for both flavors — the payload carries the flavor
    * so the two can never be confused at the marker. */
  private def writeImpl(corpus: DataFrame, path: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String, vecCol: String, residual: Boolean): Unit =
    Layout.rebuild(corpus.sparkSession, path, "writeIndex") {
      val rows = if (residual) codedResidual(corpus, centroids, codebooks, idCol, vecCol)
                 else coded(corpus, centroids, codebooks, idCol, vecCol)
      graft.sources.Sinks.parquetPartitionedMode(rows, path, "append",
        "cluster")
      Layout.writeMarker(corpus.sparkSession, path, markerFile,
        payloadOf(centroids, codebooks, residual))
    }

  private def appendImpl(batch: DataFrame, path: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String, vecCol: String, residual: Boolean, what: String): Unit =
    Layout.withWriterLease(batch.sparkSession, path, what) {
      val pay = payloadOf(centroids, codebooks, residual)
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        pay, what, mismatch(what, path, pay))
      val rows = if (residual) codedResidual(batch, centroids, codebooks, idCol, vecCol)
                 else coded(batch, centroids, codebooks, idCol, vecCol)
      graft.sources.Sinks.parquetPartitionedMode(rows, path, "append",
        "cluster")
    }

  /** [[appendIndex]] keyed by a streaming micro-batch id
    * ([[Layout.idempotentAppend]] — the [[Postings.appendIndexBatch]]
    * contract for the composed layout). */
  def appendIndexBatch(batch: DataFrame, path: String, batchId: Long,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
    appendBatchImpl(batch, path, batchId, centroids, codebooks, idCol,
      vecCol, residual = false, "appendIndexBatch")

  /** [[appendIndexResidual]] keyed by a streaming micro-batch id. */
  def appendIndexResidualBatch(batch: DataFrame, path: String, batchId: Long,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
    appendBatchImpl(batch, path, batchId, centroids, codebooks, idCol,
      vecCol, residual = true, "appendIndexResidualBatch")

  private def appendBatchImpl(batch: DataFrame, path: String, batchId: Long,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String, vecCol: String, residual: Boolean, what: String): Boolean =
    Layout.withWriterLease(batch.sparkSession, path, what) {
      val pay = payloadOf(centroids, codebooks, residual)
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        pay, what, mismatch(what, path, pay))
      val rows = if (residual) codedResidual(batch, centroids, codebooks, idCol, vecCol)
                 else coded(batch, centroids, codebooks, idCol, vecCol)
      Layout.idempotentAppend(batch.sparkSession, path, batchId) { stg =>
        graft.sources.Sinks.parquetPartitioned(rows, stg, "cluster")
      }
    }

  /** Search: probed cluster ids pushed as a static partition filter
    * (the [[Ivf.probeIndex]] pruning — IvfPqSpec pins
    * `PartitionFilters` and the probed file set), ADC shortlist of
    * `nCand` per query inside the probed lists, exact cosine on the
    * shortlist only. The rescore joins the shortlist (nQueries ×
    * nCand ids) back to the float corpus — the only float access.
    *
    * @return (query_id, neighbor_id, rank, cos)
    */
  def probeIndex(spark: SparkSession, path: String, corpus: DataFrame,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      queries: DataFrame, k: Int, nprobe: Int = 4, nCand: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    probeImpl(spark, path, corpus, centroids, codebooks, queries, k,
      nprobe, nCand, idCol, vecCol, residual = false)

  // ---- residual refinement (the full IVFADC) ----

  /** Residual of a vector against its assigned centroid:
    * `vec − centroid[cluster]`. Encoding RESIDUALS instead of raw
    * vectors is the refinement step of Jégou et al.'s IVFADC (§V.B):
    * within one inverted list every vector shares a centroid, so the
    * residuals are centered near zero and span a much tighter range —
    * the same m×k codebook budget quantizes them with far less error,
    * which tightens the ADC shortlist and lifts recall at identical
    * index size (PLANS.md records the measured uplift). */
  private[graft] def residualCol(centroids: Seq[Seq[Double]],
      vec: org.apache.spark.sql.Column,
      cluster: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // native fused loop ([[graft.functions.CentroidResidual]]): the
    // residual projection runs once per corpus vector in every
    // residual index build — the zip_with form paid interpreted
    // lambda frames per element (AnnKernelsSpec pins bit-equality
    // against [[residualColRef]])
    org.apache.spark.sql.GraftColumn.of(
      graft.functions.CentroidResidual(
        org.apache.spark.sql.GraftColumn.expr(vec),
        org.apache.spark.sql.GraftColumn.expr(cluster), centroids))

  /** Reference (HigherOrderFunction) form of [[residualCol]] —
    * retained for AnnKernelsSpec's bit-equality pin. */
  private[graft] def residualColRef(centroids: Seq[Seq[Double]],
      vec: org.apache.spark.sql.Column,
      cluster: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    zip_with(vec, element_at(typedlit(centroids), cluster + 1),
      (x, c) => x.cast("double") - c)

  /** Train PQ codebooks over the RESIDUALS under `centroids` — the
    * training half of the residual layout (one extra narrow
    * projection; the same deterministic Lloyd machinery). */
  def trainResidualCodebooks(corpus: DataFrame,
      centroids: Seq[Seq[Double]], dim: Int, m: Int, k: Int,
      iters: Int = 3, trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    val res = corpus.select(col(idCol),
      residualCol(centroids, col(vecCol),
        Ivf.assignCluster(centroids, col(vecCol))).as("res_vec"))
    Pq.trainCodebooks(res, dim, m, k, iters, trainFraction, idCol, "res_vec")
  }

  private def codedResidual(batch: DataFrame, centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String, vecCol: String): DataFrame =
    batch
      .select(col(idCol).as("neighbor_id"),
        Ivf.assignCluster(centroids, col(vecCol)).as("cluster"),
        col(vecCol).as("v"))
      // residual in its own projection: assignCluster isn't
      // re-evaluated inside the zip_with, AND the dim-wide residual
      // itself is aliased once instead of being duplicated into each
      // of Pq.encode's m subspace slices (non-cheap multi-referenced
      // aliases survive CollapseProject — the trainCodebooks idiom)
      .select(col("neighbor_id"), col("cluster"),
        residualCol(centroids, col("v"), col("cluster")).as("res"))
      .select(col("neighbor_id"), col("cluster"),
        Pq.encode(codebooks, col("res")).as("codes"))

  /** [[writeIndex]] with residual-encoded lists (flavor
    * `ivfpq-res` in the marker — raw-coded and residual-coded layouts
    * share a schema but decode differently, so they must never mix). */
  def writeIndexResidual(corpus: DataFrame, path: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    writeImpl(corpus, path, centroids, codebooks, idCol, vecCol,
      residual = true)

  /** [[appendIndex]] for the residual layout — same pure-union
    * append, the residual quantizer pair pinned by its marker. */
  def appendIndexResidual(batch: DataFrame, path: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    appendImpl(batch, path, centroids, codebooks, idCol, vecCol,
      residual = true, "appendIndexResidual")

  /** [[probeIndex]] over a residual layout. The ADC shortlist score
    * becomes `dot(q, centroid[cluster]) + adcRes(q, codes)`: the dot
    * distributes over `x = c + r`, the centroid half is EXACT (the
    * broadcast centroid literal), and only the residual half is
    * quantized — the tighter approximation that buys the recall
    * uplift. Same pruning, same exact-cosine rescore. */
  def probeIndexResidual(spark: SparkSession, path: String,
      corpus: DataFrame, centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], queries: DataFrame, k: Int,
      nprobe: Int = 4, nCand: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    probeImpl(spark, path, corpus, centroids, codebooks, queries, k,
      nprobe, nCand, idCol, vecCol, residual = true)

  private def probeImpl(spark: SparkSession, path: String,
      corpus: DataFrame, centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], queries: DataFrame, k: Int,
      nprobe: Int, nCand: Int, idCol: String, vecCol: String,
      residual: Boolean): DataFrame = {
    require(nCand >= k, s"nCand $nCand must be >= k $k")
    val pay = payloadOf(centroids, codebooks, residual)
    val what = if (residual) "probeIndexResidual" else "probeIndex"
    Layout.requireMarker(spark, path, markerFile, pay, what,
      mismatch(what, path, pay))
    val assigned = Ivf.probeAssignments(centroids, queries, nprobe,
      idCol, vecCol)
    // the exact dot(q, centroid[cluster]) half of the residual score
    // is constant per (query, cluster): compute it ONCE on the probe
    // rows (nQueries × nprobe of them) before the broadcast join, not
    // per candidate inside every probed list
    val probes =
      if (!residual) assigned
      else assigned.withColumn("cdot",
        aggregate(zip_with(col("qvec"),
            element_at(typedlit(centroids), col("cluster") + 1),
            (q, c) => q.cast("double") * c),
          lit(0.0), (acc, v) => acc + v))
    // bounded driver collect: ≤ min(nClusters, nprobe × queries) ints,
    // pushed as the static partition IN-filter
    val probed = probes.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = spark.read.parquet(path)
      .filter(col("cluster").isin(probed.map(Int.box): _*))
    val cand = lists.join(broadcast(probes), Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val adcScore =
      if (!residual) Pq.adcDot(codebooks, col("qvec"), col("codes"))
      // exact dot(q, c) (precomputed) + dot(q, r) via ADC
      else col("cdot") + Pq.adcDot(codebooks, col("qvec"), col("codes"))
    val shortlist = cand
      .select(col("query_id"), col("neighbor_id"), adcScore.as("adc"))
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
}
