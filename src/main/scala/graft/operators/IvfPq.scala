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

  private def payload(centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]]): String =
    Ivf.centroidPayload(centroids, "ivfpq") + " | " +
      Pq.codebookPayload(codebooks)

  private def mismatch(what: String, path: String,
      centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]])(stored: String): String =
    s"$what: quantizer pair (centroids k dim fp | codebooks m k sub fp " +
      s"= ${payload(centroids, codebooks)}) does not match the existing " +
      s"layout's ($stored) (marker $path/$markerFile) — the coarse " +
      "quantizer AND the codebooks ARE the layout; a centroid mismatch " +
      "scatters vectors into lists the probe ranking disagrees with, a " +
      "codebook mismatch decodes every candidate wrong"

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
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    graft.sources.Sinks.parquetPartitioned(
      coded(corpus, centroids, codebooks, idCol, vecCol), path, "cluster")
    Layout.writeMarker(corpus.sparkSession, path, markerFile,
      payload(centroids, codebooks))
  }

  /** Incremental growth through the PINNED quantizer pair — pure-union
    * append into the existing cluster directories, append == rebuild
    * exactly ([[Layout.bootstrapOrGuard]] state machine). */
  def appendIndex(batch: DataFrame, path: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
      payload(centroids, codebooks), "appendIndex",
      mismatch("appendIndex", path, centroids, codebooks))
    graft.sources.Sinks.parquetPartitionedMode(
      coded(batch, centroids, codebooks, idCol, vecCol), path, "append",
      "cluster")
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
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nCand >= k, s"nCand $nCand must be >= k $k")
    Layout.requireMarker(spark, path, markerFile,
      payload(centroids, codebooks), "probeIndex",
      mismatch("probeIndex", path, centroids, codebooks))
    val probes = Ivf.probeAssignments(centroids, queries, nprobe,
      idCol, vecCol)
    // bounded driver collect: ≤ min(nClusters, nprobe × queries) ints,
    // pushed as the static partition IN-filter
    val probed = probes.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = spark.read.parquet(path)
      .filter(col("cluster").isin(probed.map(Int.box): _*))
    val shortlist = lists.join(broadcast(probes), Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Pq.adcDot(codebooks, col("qvec"), col("codes")).as("adc"))
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
