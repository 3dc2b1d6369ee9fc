package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour search — the
  * cluster-partitioned counterpart to [[Similarity.annTopK]]'s LSH
  * path. Standard IVF shape (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011, §IV-A — the coarse quantizer
  * without the PQ refinement):
  *
  *   1. train k coarse centroids (k-means, spherical assignment);
  *   2. index: assign every corpus vector to its nearest centroid —
  *      the inverted lists;
  *   3. search: assign each query to its `nprobe` nearest centroids
  *      and scan only those lists.
  *
  * Scale design (100 TB corpus, 1000 executors):
  *   - centroids are k×dim doubles (k ≤ a few thousand) — they live in
  *     the plan as a literal array and reach executors with the task
  *     binary; no shuffle, no lookup table;
  *   - training iterates on a SAMPLE (`trainFraction`): k-means quality
  *     needs only a representative subset, so the full corpus is never
  *     scanned during training;
  *   - assignment is a narrow projection (transform over the centroid
  *     literal + array_position argmax) — embarrassingly parallel,
  *     stays inside whole-stage codegen's task, no shuffle;
  *   - the probe is an equi-join on `cluster`: candidates =
  *     corpus ∩ probed lists ≈ nprobe/k of the data. [[writeIndex]]
  *     persists the lists `partitionBy("cluster")` and [[probeIndex]]
  *     pushes the probed ids as a partition filter, so the scan prunes
  *     to the probed directories — reading nprobe/k of 100 TB instead
  *     of all of it (IvfSpec asserts the pruned file set).
  *
  * Everything is deterministic: seeding is by xxhash64 order of vector
  * ids, assignment ties break toward the lower cluster id, and all
  * reductions are fixed-order (see [[Similarity.dot]]).
  */
object Ivf {

  /** L2-normalize a centroid driver-side (zero vector stays zero). */
  private def unit(c: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) c else c.map(_ / n)
  }

  /** Array of cosine similarities from `vec` to every centroid, via
    * the native fused-loop kernel [[graft.functions.CentroidSims]]
    * (centroids pre-normalized driver-side, so cosine reduces to
    * dot(unitCentroid, vec) / ‖vec‖ with ‖vec‖ computed once).
    *
    * The composable HigherOrderFunction form is kept as
    * [[simsToCentroidsRef]]: HOFs never enter whole-stage codegen, so
    * the assignment scan paid interpreted lambda frames and boxing
    * k×dim times per vector — at 100 TB the full-corpus assignment
    * projection is THE index-build cost. Bit-identical results
    * (AnnKernelsSpec pins equality on the real corpus). */
  private[graft] def simsToCentroids(centroids: Seq[Seq[Double]], vec: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.functions.CentroidSims(
        org.apache.spark.sql.GraftColumn.expr(vec), centroids.map(unit)))

  /** Reference (HigherOrderFunction) form of [[simsToCentroids]] —
    * interpreted, k×dim lambda frames per row; retained for
    * AnnKernelsSpec's bit-equality pin. */
  private[graft] def simsToCentroidsRef(centroids: Seq[Seq[Double]],
      vec: Column): Column = {
    val cn = typedlit(centroids.map(unit))
    val nv = sqrt(aggregate(
      zip_with(vec, vec, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    transform(cn, c =>
      when(nv === 0.0, 0.0).otherwise(
        aggregate(zip_with(c, vec, (x, y) => x * y.cast("double")),
          lit(0.0), (acc, v) => acc + v) / nv))
  }

  /** Nearest-centroid id (argmax cosine; first/lowest id wins ties). */
  def assignCluster(centroids: Seq[Seq[Double]], vec: Column): Column = {
    val sims = simsToCentroids(centroids, vec)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** Train `k` centroids by spherical k-means over a deterministic
    * sample. Seeds = the `k` vectors with the lowest xxhash64(id);
    * each Lloyd iteration reassigns the sample (narrow projection) and
    * recomputes centroids as per-dimension means (one partial-aggregated
    * shuffle on (cluster, dim) — k×dim groups, tiny). Clusters that go
    * empty keep their previous centroid. Only k×dim doubles ever reach
    * the driver.
    */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int = 3,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    val sample =
      if (trainFraction >= 1.0) corpus
      // deterministic hash-sample: stable across runs and partitionings
      else corpus.filter(
        pmod(xxhash64(col(idCol)), lit(10000)) < lit((trainFraction * 10000).toLong))
    // CACHED across Lloyd iterations: each iteration is an action
    // (seeding + one means-collect per iter), and without the cache
    // every one re-scans the corpus just to re-derive the same sample —
    // at 100 TB that is iters × a full-corpus read for a sample that
    // fits in cluster memory by construction (trainFraction exists
    // precisely to make it small). Unpersisted before returning;
    // results are unchanged (the sample is deterministic either way).
    val train = sample.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v")).cache()
    try {
      var centroids: Seq[Seq[Double]] =
        train.orderBy(xxhash64(col("id")), col("id")).limit(k)
          .select(col("v")).collect().map(_.getSeq[Double](0).toVector).toVector

      for (_ <- 0 until iters) {
        // assignment in its OWN projection below the Generate: a single
        // select(assign, posexplode(v)) would hoist the centroid-distance
        // expression above the generator and re-evaluate it once per
        // exploded ELEMENT (dim× per vector) instead of once per vector
        val assigned = train
          .select(assignCluster(centroids, col("v")).as("cluster"), col("v"))
          .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        val means = assigned.groupBy(col("cluster"), col("dim"))
          .agg(avg(col("x")).as("m"))
          .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
        centroids = centroids.zipWithIndex.map { case (old, c) =>
          if (means.contains((c, 0))) old.indices.map(d => means((c, d))).toVector
          else old
        }
      }
      centroids
    } finally train.unpersist(false)
  }

  /** (query_id, qvec, cluster): one row per (query, probed list) — each
    * query's `nprobe` nearest centroids by cosine (lower cluster id
    * wins ties). Package-private so IvfSpec can derive the expected
    * probed-partition set independently of [[probeIndex]]. */
  private[graft] def probeAssignments(centroids: Seq[Seq[Double]],
      queries: DataFrame, nprobe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val nTrained = centroids.size
    val probeN = math.min(nprobe, nTrained)
    // rank clusters per query by similarity, keep the top nprobe:
    // zip (sim, id), sort by sim desc (id asc on ties), slice, explode
    val sims = simsToCentroids(centroids, col(vecCol))
    val ranked = array_sort(
      arrays_zip(sims.as("sim"), sequence(lit(0), lit(nTrained - 1)).as("cid")),
      (a, b) => when(a.getField("sim") > b.getField("sim"), -1)
        .when(a.getField("sim") < b.getField("sim"), 1)
        .otherwise(a.getField("cid") - b.getField("cid")))
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        slice(transform(ranked, s => s.getField("cid")), 1, probeN).as("probe_list"))
      .select(col("query_id"), col("qvec"), explode(col("probe_list")).as("cluster"))
  }

  /** Exact cosine + per-query top-k over (cluster-joined) candidates.
    * Input needs (query_id, qvec, neighbor_id, cvec); output matches
    * [[Similarity.bruteForceTopK]]: (query_id, neighbor_id, rank, cos). */
  private def topKOverCandidates(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineFast(col("cvec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF top-k: probe the `nprobe` nearest inverted lists per query,
    * exact cosine + top-k within candidates. Output schema matches
    * [[Similarity.bruteForceTopK]]: (query_id, neighbor_id, rank, cos).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int = 16, nprobe: Int = 4, iters: Int = 3,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKWithCentroids(corpus, queries, k,
      trainCentroids(corpus, nClusters, iters, trainFraction, idCol, vecCol),
      nprobe, idCol, vecCol)

  /** [[ivfTopK]] over ALREADY-TRAINED centroids — the in-memory
    * train-once/probe-many entry ([[probeIndex]]'s shape without the
    * disk round-trip): one k-means run can serve many probe calls and
    * nprobe settings (the Contracts generator grades probe-all
    * exactness AND registered-config recall on one training). */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[Seq[Double]], nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // a corpus smaller than nClusters trains fewer centroids (seeding
    // takes the k lowest-hash vectors — there may not be k); every
    // cluster-count reference below must use the TRAINED size, or
    // arrays_zip null-pads and malformed probe clusters enter the join
    val indexed = assigned(corpus, centroids, idCol, vecCol)
    val probes = probeAssignments(centroids, queries, nprobe, idCol, vecCol)
    topKOverCandidates(indexed.join(broadcast(probes), Seq("cluster")), k)
  }

  /** The inverted-list projection: (neighbor_id, cvec, cluster) — the
    * one assignment spelling every index write and in-memory probe
    * shares (they must never drift, or an appended batch would land in
    * different lists than the original write assigned). */
  private def assigned(corpus: DataFrame, centroids: Seq[Seq[Double]],
      idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      assignCluster(centroids, col(vecCol)).as("cluster"))

  /** Index side of the on-disk IVF layout: train centroids, assign every
    * corpus vector, and write the inverted lists
    * `partitionBy("cluster")` — one directory per list, so a probe's
    * scan PRUNES to the probed lists (see [[probeIndex]]). Returns the
    * trained centroids: k×dim doubles, the only state a searcher needs
    * besides the path. A `_graft_centroids` fingerprint marker rides
    * the layout so [[appendIndex]] can fail fast on a centroid-set
    * mismatch (the [[Postings.writeIndex]] `_graft_nbuckets` idiom
    * pointed at coarse quantizers). */
  def writeIndex(corpus: DataFrame, path: String, nClusters: Int,
      iters: Int = 3, trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    val centroids = trainCentroids(corpus, nClusters, iters, trainFraction, idCol, vecCol)
    writeIndexWithCentroids(corpus, path, centroids, idCol, vecCol)
    centroids
  }

  /** [[writeIndex]] over ALREADY-TRAINED centroids — rebuilds with a
    * pinned coarse quantizer (so an incremental layout and its
    * from-scratch rebuild are comparable), and the write half of the
    * train-once/serve-many story. */
  def writeIndexWithCentroids(corpus: DataFrame, path: String,
      centroids: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    Layout.rebuild(corpus.sparkSession, path, "writeIndex") {
      graft.sources.Sinks.parquetPartitionedMode(
        assigned(corpus, centroids, idCol, vecCol), path, "append",
        "cluster")
      Layout.writeMarker(corpus.sparkSession, path, markerFile,
        centroidPayload(centroids, "float"))
    }

  /** Incremental growth of a [[writeIndex]] layout: assign a new batch
    * through the PERSISTED centroids and APPEND into the existing
    * cluster partition directories — the daily-ingest shape the
    * stored-index dedup family (q81/q92/q83) has for hashes, extended
    * to embeddings. Inverted lists are pure facts under a FIXED coarse
    * quantizer: lists(corpus ∪ batch) == lists(corpus) ∪ lists(batch),
    * so append == rebuild exactly (IvfSpec pins probe parity and row
    * parity) — no read-modify-write, no compaction, and a probe after
    * the append sees old and new vectors alike through the same pruned
    * scan. The centroids are NOT retrained here by design: retraining
    * would reassign the existing corpus (a full rebuild); the
    * periodic-rebuild cadence handles quantizer drift. `centroids`
    * must BE the layout's centroid set — a mismatch assigns new
    * vectors into lists the probe's cluster ranking disagrees with
    * (silently wrong recall), so the `_graft_centroids` fingerprint
    * marker [[writeIndex]] leaves is CHECKED and the append fails fast
    * on disagreement. Appending onto a fresh EMPTY markerless path
    * bootstraps the layout and stamps the marker; a populated
    * markerless path is refused outright (the
    * [[Postings.appendIndex]] contract — the state machine is
    * documented there). */
  def appendIndex(batch: DataFrame, path: String,
      centroids: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    // ONE lease across bootstrap + publish (reentrant inside): without
    // it a concurrent corrected-retry could replace the marker in the
    // stamped-but-empty window and this append would land under a
    // foreign certificate — the same discipline on every composite
    Layout.withWriterLease(batch.sparkSession, path, "appendIndex") {
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        centroidPayload(centroids, "float"), "appendIndex",
        centroidMismatch("appendIndex", path, centroids, "float"))
      graft.sources.Sinks.parquetPartitionedMode(
        assigned(batch, centroids, idCol, vecCol), path, "append", "cluster")
    }

  /** [[appendIndex]] keyed by a streaming micro-batch id
    * ([[Layout.idempotentAppend]]): at-least-once `foreachBatch`
    * replays become no-ops, crash windows are cleaned and redone —
    * the [[Postings.appendIndexBatch]] contract for inverted lists. */
  def appendIndexBatch(batch: DataFrame, path: String, batchId: Long,
      centroids: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
    Layout.withWriterLease(batch.sparkSession, path, "appendIndexBatch") {
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        centroidPayload(centroids, "float"), "appendIndexBatch",
        centroidMismatch("appendIndexBatch", path, centroids, "float"))
      Layout.idempotentAppend(batch.sparkSession, path, batchId) { stg =>
        graft.sources.Sinks.parquetPartitioned(
          assigned(batch, centroids, idCol, vecCol), stg, "cluster")
      }
    }

  /** Exact identity of the coarse quantizer as the [[Layout]] marker
    * payload: `flavor k dim fingerprint` ([[Layout.fnv1a64]] over the
    * centroid doubles' exact bits — assignment is deterministic in
    * the bits, so only exact bits make two layouts compatible). The
    * FLAVOR names the row schema ("float" vs "sq8"): both layouts
    * share this marker file and directory scheme, and without the
    * token a float append through the CORRECT centroids onto an SQ8
    * layout would pass the guard and mix row schemas the probe then
    * silently mis-decodes. */
  private val markerFile = "_graft_centroids"

  private[operators] def centroidPayload(cs: Seq[Seq[Double]],
      flavor: String): String = {
    val dim = cs.headOption.map(_.size).getOrElse(0)
    s"$flavor ${cs.size} $dim ${Layout.fnv1a64(
      cs.iterator.flatMap(_.iterator).map(java.lang.Double.doubleToLongBits))}"
  }

  private def centroidMismatch(what: String, path: String,
      cs: Seq[Seq[Double]], flavor: String)(stored: String): String =
    s"$what: layout identity (flavor k dim fp = " +
      s"${centroidPayload(cs, flavor)}) does not match the existing " +
      s"layout's ($stored) (marker $path/$markerFile) — the list flavor " +
      "and the coarse quantizer ARE the layout; a flavor mismatch mixes " +
      "row schemas the probe mis-decodes, a centroid mismatch scatters " +
      "vectors into lists the probe's cluster ranking disagrees with"

  /** [[writeIndex]] with uint8 scalar-quantized inverted lists — the
    * IVF+SQ8 layout (FAISS's `IVF…,SQ8` analog): each list row stores
    * (neighbor_id, mn, qscale, codes) instead of the float vector, 4×
    * smaller, so a probe reads a quarter of the bytes q79's float
    * layout would for the same nprobe/k pruning. Search dequantizes
    * candidates on the fly ([[probeIndexQuantized]]); ranking error is
    * bounded by the per-vector quantization error (range/510 per
    * dimension — IvfSpec grades top-k overlap vs the float path). */
  def writeIndexQuantized(corpus: DataFrame, path: String, nClusters: Int,
      iters: Int = 3, trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    val centroids = trainCentroids(corpus, nClusters, iters, trainFraction, idCol, vecCol)
    Layout.rebuild(corpus.sparkSession, path, "writeIndexQuantized") {
      graft.sources.Sinks.parquetPartitionedMode(
        assignedQuantized(corpus, centroids, idCol, vecCol), path,
        "append", "cluster")
      Layout.writeMarker(corpus.sparkSession, path, markerFile,
        centroidPayload(centroids, "sq8"))
    }
    centroids
  }

  /** The SQ8 list projection [[writeIndexQuantized]] and
    * [[appendIndexQuantized]] share: per-row (mn, qscale) affine
    * quantization parameters ride each row, so quantized lists append
    * exactly like float ones — no global codebook state to merge. */
  private def assignedQuantized(corpus: DataFrame, centroids: Seq[Seq[Double]],
      idCol: String, vecCol: String): DataFrame =
    assigned(corpus, centroids, idCol, vecCol)
      .select(col("neighbor_id"), col("cluster"), col("cvec"),
        array_min(col("cvec")).cast("double").as("mn"),
        Quantize.scale(col("cvec")).as("qscale"))
      .select(col("neighbor_id"), col("cluster"), col("mn"), col("qscale"),
        Quantize.codes(col("cvec"), col("mn"), col("qscale")).as("codes"))

  /** [[appendIndex]] for the SQ8 layout: same pure-union append, same
    * `_graft_centroids` guard — per-row quantization parameters make
    * the quantized lists as append-safe as the float ones. */
  def appendIndexQuantized(batch: DataFrame, path: String,
      centroids: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    Layout.withWriterLease(batch.sparkSession, path, "appendIndexQuantized") {
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        centroidPayload(centroids, "sq8"), "appendIndexQuantized",
        centroidMismatch("appendIndexQuantized", path, centroids, "sq8"))
      graft.sources.Sinks.parquetPartitionedMode(
        assignedQuantized(batch, centroids, idCol, vecCol), path, "append",
        "cluster")
    }

  /** [[appendIndexQuantized]] keyed by a streaming micro-batch id
    * ([[appendIndexBatch]]'s contract for the SQ8 layout). */
  def appendIndexQuantizedBatch(batch: DataFrame, path: String,
      batchId: Long, centroids: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
    Layout.withWriterLease(batch.sparkSession, path,
        "appendIndexQuantizedBatch") {
      Layout.bootstrapOrGuard(batch.sparkSession, path, markerFile,
        centroidPayload(centroids, "sq8"), "appendIndexQuantizedBatch",
        centroidMismatch("appendIndexQuantizedBatch", path, centroids, "sq8"))
      Layout.idempotentAppend(batch.sparkSession, path, batchId) { stg =>
        graft.sources.Sinks.parquetPartitioned(
          assignedQuantized(batch, centroids, idCol, vecCol), stg, "cluster")
      }
    }

  /** Search over [[writeIndexQuantized]]'s layout: same partition-
    * pruned probe as [[probeIndex]], with candidates dequantized in
    * the scan projection (cast back to float so the codegen `cosine_f`
    * loop stays the hot path — the quantizer already dropped more
    * precision than the float cast does). */
  def probeIndexQuantized(spark: SparkSession, path: String,
      centroids: Seq[Seq[Double]], queries: DataFrame, k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireLayoutMarker(spark, path, centroids, "probeIndexQuantized", "sq8")
    val probes = probeAssignments(centroids, queries, nprobe, idCol, vecCol)
    val probed = probes.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = spark.read.parquet(path)
      .filter(col("cluster").isin(probed.map(Int.box): _*))
      .select(col("cluster"), col("neighbor_id"),
        Quantize.dequantizeF(col("codes"), col("mn"), col("qscale"))
          .as("cvec"))
    topKOverCandidates(lists.join(broadcast(probes), Seq("cluster")), k)
  }

  /** Probe-side marker requirement: presence AND match ([[Layout
    * .requireMarker]]). The layout's lists were assigned under the
    * marker's quantizer; probing with a different centroid set ranks
    * clusters the lists disagree with (silently wrong recall), and
    * probing an UNMARKED populated layout (a crashed rebuild) is the
    * same hazard with the mismatch unprovable — both fail fast. */
  private def requireLayoutMarker(spark: SparkSession, path: String,
      centroids: Seq[Seq[Double]], what: String, flavor: String): Unit =
    Layout.requireMarker(spark, path, markerFile,
      centroidPayload(centroids, flavor), what,
      centroidMismatch(what, path, centroids, flavor))

  /** Search side over [[writeIndex]]'s layout. The probed cluster ids
    * are collected to the driver (bounded: ≤ min(nClusters, nprobe ×
    * queries) ints — never corpus data) and pushed as a static `isin`
    * predicate on the PARTITION column, so the scan lists and reads
    * only the probed directories: nprobe/k of a 100 TB corpus, the
    * rest is zero I/O. IvfSpec asserts the predicate lands in
    * `PartitionFilters` and that the files actually read come from
    * exactly the probed directories. */
  def probeIndex(spark: SparkSession, path: String,
      centroids: Seq[Seq[Double]], queries: DataFrame, k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireLayoutMarker(spark, path, centroids, "probeIndex", "float")
    val probes = probeAssignments(centroids, queries, nprobe, idCol, vecCol)
    val probed = probes.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = spark.read.parquet(path)
      .filter(col("cluster").isin(probed.map(Int.box): _*))
    topKOverCandidates(lists.join(broadcast(probes), Seq("cluster")), k)
  }
}
