package graft.operators

import org.apache.spark.sql.SparkSession

/** The on-disk layout-marker protocol shared by every persisted index
  * in the engine ([[Postings]] `_graft_nbuckets`, [[Ivf]]
  * `_graft_centroids`, [[Pq]] `_graft_codebooks`): a layout's
  * physical organization (bucket function, coarse quantizer,
  * codebooks) is invisible in the data files themselves, so each
  * writer stamps an underscore-prefixed sidecar (parquet readers skip
  * `_` files) whose payload identifies the organization EXACTLY, and
  * every appender and probe fails fast on disagreement instead of
  * silently mis-bucketing, mis-pruning, or mis-ranking.
  *
  * Append-side state machine over (marker, data) — the crash-window
  * audit each caller's scaladoc documents:
  *   - marker matches → proceed (an empty-but-marked layout is a
  *     crashed same-config bootstrap and this is its retry);
  *   - marker mismatch over DATA → fail fast;
  *   - marker mismatch over an EMPTY path → a crashed bootstrap whose
  *     batch never landed: re-stamp for THIS config rather than
  *     poisoning every corrected retry;
  *   - no marker over DATA → refuse (a crashed overwrite rebuild
  *     clears the marker with the path; stamping here would certify
  *     rows whose organization is unknown);
  *   - no marker, no data → fresh bootstrap: stamp BEFORE the data so
  *     a mid-append crash leaves empty-but-guarded, never
  *     populated-unguarded.
  *
  * Probe-side: marker presence AND match are both required — absence
  * over data is the crashed-rebuild state, where any assumed
  * organization silently returns wrong results.
  */
private[graft] object Layout {

  /** Order-sensitive 64-bit FNV-1a over a stream of longs — the one
    * fingerprint every layout identity in the engine folds through
    * (centroid bits, codebook bits, staged-table dir names): exact
    * identity, not approximate equality. */
  def fnv1a64(xs: Iterator[Long]): Long = {
    var h = 0xcbf29ce484222325L
    while (xs.hasNext) {
      h ^= xs.next()
      h *= 0x100000001b3L
    }
    h
  }

  private def markerPath(path: String, file: String) =
    new org.apache.hadoop.fs.Path(path, file)

  def writeMarker(spark: SparkSession, path: String, file: String,
      payload: String): Unit = {
    val p = markerPath(path, file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(payload.getBytes("UTF-8")) finally out.close()
  }

  def readMarker(spark: SparkSession, path: String,
      file: String): Option[String] = {
    val p = markerPath(path, file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim)
      finally in.close()
    }
  }

  /** The append-side state machine above. `mismatch(stored)` renders
    * the fail-fast message for a payload disagreement over data;
    * `hazard` names what a mismatched organization would silently
    * break (rides the refuse-unmarked-data message). */
  def bootstrapOrGuard(spark: SparkSession, path: String, file: String,
      payload: String, what: String,
      mismatch: String => String): Unit = {
    lazy val populated = graft.sources.Sinks.hasDataFiles(spark, path)
    readMarker(spark, path, file) match {
      case Some(stored) if stored == payload.trim => ()
      case Some(stored) =>
        require(!populated, mismatch(stored))
        writeMarker(spark, path, file, payload)
      case None =>
        require(!populated,
          s"$what: $path holds data files but no $file marker — an " +
            "unguarded layout (likely a crashed rebuild, which clears " +
            "the path before rewriting); refusing to stamp a marker " +
            "over data whose organization is unknown. Rebuild with " +
            "writeIndex (or clear the path) first")
        writeMarker(spark, path, file, payload)
    }
  }

  /** The probe-side requirement above: presence AND match. */
  def requireMarker(spark: SparkSession, path: String, file: String,
      payload: String, what: String,
      mismatch: String => String): Unit =
    readMarker(spark, path, file) match {
      case Some(stored) =>
        require(stored == payload.trim, mismatch(stored))
      case None =>
        require(false,
          s"$what: no $file marker at $path — not a completed graft " +
            "index layout (a crashed rebuild leaves data without its " +
            "marker); rebuild with writeIndex")
    }
}
