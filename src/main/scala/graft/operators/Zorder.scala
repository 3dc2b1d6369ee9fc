package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional scan
  * pruning — the data-layout lever for predicates over MORE THAN ONE
  * column. A layout sorted on one column gives parquet row-group
  * min/max stats that prune that column only; every other dimension's
  * stats span the full domain in every file. Interleaving the bits of
  * d quantized columns (Morton 1966) and range-clustering on the
  * result bounds EVERY clustered dimension per file: a d-dimensional
  * box predicate then touches the files along a curve segment instead
  * of the whole table, and the pruning needs NO reader changes —
  * ordinary parquet min/max stats on the original columns do it
  * ([[graft.ZorderProbe]] measures decoded rows per layout from
  * executed-plan SQLMetrics; this is the public pattern behind
  * Delta/Iceberg OPTIMIZE ZORDER, re-expressed on plain parquet).
  *
  * 100 TB shape: one stats aggregate (min/max per clustered column,
  * partial-aggregated to a single row — the only driver collect, 2d
  * doubles), then exactly ONE shuffle (`repartitionByRange` on the
  * z-value, sampled boundaries) and a LOCAL sort within partitions —
  * the same cost any clustering rewrite pays, amortized over every
  * scan that prunes thereafter. The z-value is plain long arithmetic
  * (shift/and/or — whole-stage codegen keeps it in the generated
  * loop), never a UDF.
  *
  * Quantization comes in two built forms: [[writeZordered]] maps each
  * column to `bits` equal-WIDTH buckets of its [min, max] — the cheap
  * default for roughly uniform columns — and [[writeZorderedByRank]]
  * uses equal-DEPTH (approx-quantile) buckets for skewed columns,
  * where one extreme outlier would otherwise stretch the range until
  * every normal row shares bucket 0 and the curve degenerates to a
  * 1-D sort (both regimes measured in ZorderProbe). NULLs bucket to 0
  * (they sort first, like NULLS FIRST), a constant column (max == min)
  * degenerates to one bucket, and values are clamped so max lands in
  * the top bucket, not past it.
  *
  * ==Incremental story==
  * Every clustered write stamps a `_graft_clustering` [[Layout]]
  * marker whose payload IS the layout's quantization: curve, bits,
  * file count, and each column's pinned bucket parameters (bit-exact
  * doubles). That makes the layout appendable the way the index
  * families are: [[appendClustered]] buckets a new batch through the
  * PINNED parameters (never a fresh stats pass — fresh bounds would
  * interleave incompatibly with the resident files) and lands it as a
  * batchId-keyed idempotent transaction ([[Layout.idempotentAppend]]),
  * each batch z-sorted into a few tight files, so the tail still
  * prunes; [[compactClustered]] folds the accumulated tail back into
  * the main `numFiles` grid through the same pinned parameters, with a
  * crash-recoverable staged swap. Append-then-compact therefore equals
  * a pinned-parameter full rewrite (ZorderSpec pins row parity exactly
  * and pruning parity by decoded rows; CONTRACTS.json grades the
  * pruning ordering per bench run).
  */
object Zorder {

  /** One clustered column's pinned quantization: `kind` "u" =
    * equal-width with params [lo, hi]; "r" = equal-depth with params =
    * the sorted rank boundaries. */
  final case class ColQuant(name: String, kind: String, params: Seq[Double])

  /** A clustered layout's full physical identity — everything an
    * append or compaction needs to place NEW rows exactly where the
    * original write would have: curve ("morton" | "hilbert"), bits per
    * dimension, main-grid file count, and the per-column pinned
    * quantization. Serialized bit-exactly into the `_graft_clustering`
    * marker ([[payload]]/[[parsePayload]]). */
  final case class Clustering(curve: String, bits: Int, numFiles: Int,
      cols: Seq[ColQuant])

  private[graft] val markerFile = "_graft_clustering"
  private[graft] val schemaFile = "_graft_schema"
  private val compactingFile = "_graft_compacting"
  private val compactTmpDir = "_graft_compact_tmp"

  /** The layout's DATA schema as a marker payload — what
    * [[appendClustered]] validates batches against: one line per field,
    * `urlenc(name)=catalogString`, order-insensitive compare. A marker
    * read instead of `spark.read.parquet(path).schema` because the
    * latter is (a) a full directory listing + footer read per
    * streaming micro-batch, (b) sampled-footer roulette on a legacy
    * mixed layout, and (c) an AnalysisException on an empty-but-marked
    * bootstrap layout. */
  private def schemaPayload(schema: org.apache.spark.sql.types.StructType): String =
    schema.fields.map(f =>
      java.net.URLEncoder.encode(f.name, "UTF-8") + "=" +
        f.dataType.catalogString).sorted.mkString("\n")

  /** Quantize `c` to a long in [0, 2^bits) given its [lo, hi] range.
    * NULLs bucket to 0; NaN and +Infinity rows land in the TOP bucket,
    * −Infinity in bucket 0 — clamped in DOUBLE space, because an ANSI
    * long cast of a non-finite value would crash the whole rewrite
    * (Spark orders NaN greater than any double, so greatest→least
    * sends it to the top). */
  private[graft] def bucket(c: Column, lo: Double, hi: Double,
      bits: Int): Column = {
    val n = 1L << bits
    if (!(hi > lo)) lit(0L)
    else {
      val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble)
      // the NULL→0 mapping happens HERE: greatest skips nulls, so a
      // null input becomes greatest(null, 0.0) = 0.0 before the clamp
      val clamped = least(greatest(scaled, lit(0.0)), lit((n - 1).toDouble))
      clamped.cast("long")
    }
  }

  /** Interleave the low `bits` bits of each quantized dimension into
    * one Morton code: bit b of dimension i lands at position
    * b·d + (d−1−i), so dimension 0 owns the MOST significant bit of
    * each group (ties broken by leading columns, like a sort key).
    * Monotone in each dimension with the others fixed. */
  private[graft] def interleave(qs: Seq[Column], bits: Int): Column = {
    val d = qs.length
    require(d >= 2, s"z-ordering needs >= 2 dimensions, got $d (use a plain sort)")
    require(bits >= 1 && d * bits <= 63,
      s"d*bits = ${d * bits} must fit a non-negative long (<= 63)")
    val terms = for {
      b <- 0 until bits
      (q, i) <- qs.zipWithIndex
    } yield shiftleft(shiftrightunsigned(q, b).bitwiseAND(lit(1L)),
      b * d + (d - 1 - i))
    terms.reduce(_ bitwiseOR _)
  }

  /** The z-value column for `cols` over `df`, quantized by a single
    * min/max stats pass (one aggregate job, one collected row). */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int): Column =
    interleave(uniformQuants(df, cols, bits).map(q =>
      bucket(col(q.name), q.params(0), q.params(1), bits)), bits)

  /** EVERY argument check a clustered write needs, hoisted so a bad
    * argument never costs the full-table stats pass first — interleave
    * re-checks its own invariants, but by then the scan has run. */
  private def validateWrite(cols: Seq[String], bits: Int,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(cols.length >= 2,
      s"z-ordering needs >= 2 dimensions, got ${cols.length} (use a plain sort)")
    require(bits >= 1 && cols.length * bits <= 63,
      s"d*bits = ${cols.length * bits} must fit a non-negative long (<= 63)")
    // names travel through the _graft_clustering marker's text format
    // (`:`/`;`/`,`/space are its separators) — clustering columns are
    // plain top-level columns, so restrict to identifier characters
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"clustered column name '$c' must match [A-Za-z0-9_]+ (it is " +
        "serialized into the layout marker)"))
  }

  /** Rewrite `df` as a z-ordered parquet layout at `path`: range-
    * partition on the Morton code into `numFiles` files, sort within
    * each, write, and stamp the `_graft_clustering` marker with the
    * pinned quantization. Every clustered column's per-file min/max is
    * then tight, and ordinary pushed-down predicates prune files and
    * row groups in all `cols` dimensions at once. */
  def writeZordered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, numFiles: Int = 32): Clustering = {
    validateWrite(cols, bits, numFiles)
    writeAndStamp(df, path,
      Clustering("morton", bits, numFiles, uniformQuants(df, cols, bits)))
  }

  /** [[writeZordered]] on the HILBERT curve instead of Morton: same
    * quantization, same single-shuffle write, but the curve never
    * takes Morton's long diagonal jumps — every successive cell is
    * adjacent ([[graft.HilbertCodeNSpec]] pins unit-step adjacency at
    * d = 2, 3, 4) — so a box predicate cuts it into fewer, longer runs
    * and the same file count covers the box with tighter bounding
    * boxes (ZorderProbe measures the decoded-rows difference on
    * identical boxes, 2-D and 3-D). The curve is a native codegen
    * expression in both arities — `hilbert_d2`
    * ([[graft.functions.HilbertCode]], the classic xy2d loop) at two
    * dimensions, `hilbert_dn` ([[graft.functions.HilbertCodeN]],
    * Skilling's transpose algorithm) beyond — because the per-bit
    * rotate/flip state doesn't unroll into Column combinators without
    * multiplying the tree per bit plane. */
  def writeHilbert(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, numFiles: Int = 32): Clustering = {
    validateWrite(cols, bits, numFiles)
    writeAndStamp(df, path,
      Clustering("hilbert", bits, numFiles, uniformQuants(df, cols, bits)))
  }

  /** [[writeZordered]] with rank (equi-depth) quantization — the form
    * for skewed clustering columns. Same single-shuffle shape, ONE
    * extra stats job (all columns' quantile sketches in one pass).
    * Each dimension's decision-tree bucket is STAGED as a projected
    * column before the interleave — interleaving the raw bucket
    * expressions would embed the O(2^bits)-node tree once per output
    * bit (bits copies per dimension: thousands of expression nodes,
    * the bucket re-evaluated `bits` times per row); staging evaluates
    * it once per row and the interleave reads cheap attributes. The
    * stage columns are dropped after the sort, before the write. */
  def writeZorderedByRank(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 8, numFiles: Int = 32): Clustering = {
    validateWrite(cols, bits, numFiles)
    val bounds = rankBoundariesAll(df, cols, bits)
    writeAndStamp(df, path, Clustering("morton", bits, numFiles,
      cols.zip(bounds).map { case (c, b) => ColQuant(c, "r", b.toSeq) }))
  }

  /** [[writeZorderedByRank]] on the HILBERT curve — the skew-robust
    * quantization combined with the measured-better curve (q176 pinned
    * rank mode on Morton before the d-dimensional hilbert existed;
    * there is no reason to pair the robust buckets with the dominated
    * curve). Same staged decision-tree bucketing, same single-shuffle
    * write; bits ≤ 8 (the rank-boundary budget). */
  def writeHilbertByRank(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 8, numFiles: Int = 32): Clustering = {
    validateWrite(cols, bits, numFiles)
    val bounds = rankBoundariesAll(df, cols, bits)
    writeAndStamp(df, path, Clustering("hilbert", bits, numFiles,
      cols.zip(bounds).map { case (c, b) => ColQuant(c, "r", b.toSeq) }))
  }

  /** Route to the measured-best curve: HILBERT at every dimension
    * count — ZorderProbe measured it dominating Morton on identical
    * boxes in 2-D (12,151 vs 25,517 decoded rows, spread box) AND 3-D
    * (22,117 vs 30,646, bits=12/dim) — with the caller's `bits`
    * clamped to what d·bits ≤ 63 admits (a 4-D request at the default
    * 16 bits would otherwise just throw; the clamp trades resolution
    * for dimensions the way every multi-dim index does). Exists so a
    * caller cannot pick the dominated curve by accident; the returned
    * [[Clustering]] records the curve and the effective bits. */
  def writeBest(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, numFiles: Int = 32): Clustering = {
    require(cols.length >= 2,
      s"clustering needs >= 2 dimensions, got ${cols.length} (use a plain sort)")
    val eff = math.min(bits, 63 / cols.length)
    writeHilbert(df, path, cols, eff, numFiles)
  }

  /** The write half every clustered form shares: bucket + curve from
    * the PINNED parameters, one range shuffle, local sort, overwrite,
    * then stamp the marker. Marker-after-data matches the rebuild arm
    * of the [[Layout]] state machine: a crash between the write and
    * the stamp leaves data-without-marker, which every append, compact
    * and probe REFUSES (never silently mis-buckets). */
  private def writeAndStamp(df: DataFrame, path: String,
      cl: Clustering): Clustering =
    // a rebuild holds the SAME writer lease appends and compactions do
    // — mode("overwrite") would delete the whole dir INCLUDING an
    // in-flight writer's lease file and ledger, letting a concurrent
    // append publish into the fresh layout under the new marker
    // (silent mixing); Layout.rebuild clears under the lease (lease
    // file survives) and the write goes append-mode into the emptied
    // layout. Markers stamped LAST: clustering identity + the data
    // SCHEMA (what appendClustered validates batches against — a
    // marker read, not a per-batch directory listing, and defined even
    // for an empty bootstrap layout).
    Layout.rebuild(df.sparkSession, path, "writeClustered") {
      val (staged, z, drop) = clusteredFrame(df, cl)
      withStatsTimestamps(df.sparkSession) {
        staged.repartitionByRange(cl.numFiles, z)
          .sortWithinPartitions(z)
          .drop(drop: _*)
          .write.mode("append").parquet(path)
      }
      Layout.writeMarker(df.sparkSession, path, markerFile, payload(cl))
      Layout.writeMarker(df.sparkSession, path, schemaFile,
        schemaPayload(df.schema))
      cl
    }

  /** Append a batch into an existing clustered layout as ONE
    * idempotent batchId-keyed transaction — the daily-ingest /
    * `foreachBatch` shape every index family already has, for
    * clustered tables: the batch is bucketed through the layout's
    * PINNED quantization (read from the `_graft_clustering` marker —
    * never a fresh stats pass), z-sorted into `batchFiles` tight
    * files, and published via [[Layout.idempotentAppend]] (replays
    * are no-ops, crash windows are swept and redone). The appended
    * tail therefore still prunes — each batch file carries a narrow
    * z-range — just at batch granularity instead of the main grid's;
    * [[compactClustered]] folds the tail back in. Returns
    * true if the batch was applied by THIS call (false = replay).
    *
    * Refused fast: a missing marker (over data = crashed rebuild; over
    * an empty path = bootstrap with a `write*` form first — unlike the
    * index families there is no caller-side parameter set to bootstrap
    * from, the quantization comes from a stats pass only a full write
    * runs), or an in-flight/crashed compaction sentinel (run
    * [[compactClustered]] to recover first). */
  def appendClustered(batch: DataFrame, path: String, batchId: Long,
      batchFiles: Int = 4): Boolean = {
    val spark = batch.sparkSession
    require(batchFiles >= 1, s"batchFiles must be >= 1, got $batchFiles")
    // ONE lease across sentinel check + marker read + publish: a
    // compaction starting between the check and the append would
    // otherwise sweep files this append is publishing
    Layout.withWriterLease(spark, path, "appendClustered") {
    requireNotCompacting(spark, path, "appendClustered")
    val cl = clusteringOf(spark, path).getOrElse(sys.error(
      s"appendClustered: no $markerFile marker at $path — either a " +
        "crashed rebuild (data without its marker) or a fresh path; " +
        "bootstrap with writeZordered/writeHilbert/writeZorderedByRank " +
        "first (the pinned quantization comes from the write's stats " +
        "pass)"))
    // schema parity with the resident layout, checked BEFORE anything
    // lands: parquet directories have no schema enforcement of their
    // own, and a narrower (or differently-typed) batch would read back
    // with sampled-footer roulette — silent nulls, or whole columns
    // dropped by the next compaction. Name set AND per-name type must
    // match (nullability is a reader concern). Validated against the
    // `_graft_schema` marker the write stamped — one tiny read per
    // batch, never a directory listing; a pre-marker legacy layout
    // falls back to ONE mergeSchema read over its data files (skipped
    // when empty — nothing to corrupt, the batch defines the schema).
    // A mismatch over an EMPTY layout re-stamps instead of refusing —
    // the [[Layout]] state machine's dead-marker arm: a corrected
    // producer must not be poisoned forever by a schema nothing ever
    // landed under.
    val markerSchema = Layout.readMarker(spark, path, schemaFile)
    lazy val hasFiles = graft.sources.Sinks.hasDataFiles(spark, path)
    // the legacy-fallback frame is built ONCE and reused by the
    // mismatch arm's row probe
    lazy val residentDf = spark.read.option("mergeSchema", "true").parquet(path)
    val resident = markerSchema.orElse {
      if (hasFiles) Some(schemaPayload(residentDf.schema)) else None
    }
    val incoming = schemaPayload(batch.schema)
    if (resident.exists(_ != incoming)) {
      // "empty" keys on ROWS, not files: Spark writes a schema-only
      // 0-row part file even for an empty bootstrap frame, and a
      // corrected producer must not be poisoned by a schema nothing
      // ever landed under. isEmpty short-circuits at the first row and
      // runs ONLY on a mismatch, never on the per-batch hot path;
      // unreadable data conservatively counts as rows (the
      // bootstrapUnderLease discipline — corrupt files must refuse,
      // not bootstrap)
      val hasRows = hasFiles &&
        (try !residentDf.isEmpty
        catch { case scala.util.control.NonFatal(_) => true })
      require(!hasRows,
        s"appendClustered: batch schema [${incoming.replace("\n", ", ")}] " +
          s"does not match the resident layout's " +
          s"[${resident.get.replace("\n", ", ")}] at $path — appending " +
          "it would corrupt every future read (parquet dirs have no " +
          "schema enforcement)")
      // rowless re-stamp arm: clear the stale schema-only files AND the
      // old schema marker TOGETHER — a crash after this append
      // publishes must leave marker-absent-over-new-data (the retry's
      // fallback read then sees the NEW schema and the idempotent
      // replay proceeds), never old-marker-over-new-rows, which would
      // brick every retry on this very gate
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Layout.deleteData(fs,
        fs.makeQualified(new org.apache.hadoop.fs.Path(path)))
      markerSchema.foreach { _ =>
        val sm = new org.apache.hadoop.fs.Path(path, schemaFile)
        require(fs.delete(sm, false),
          s"appendClustered: could not clear the stale schema marker $sm")
      }
      // the ledger goes too: every ledgered batch contributed zero
      // rows, and a corrected replay of one of those batchIds (now
      // carrying rows) must RE-APPLY, not no-op into losing them
      Seq("_graft_batches", "_graft_staging").foreach { d =>
        val p = new org.apache.hadoop.fs.Path(path, d)
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
    val (staged, z, drop) = clusteredFrame(batch, cl)
    val applied = Layout.idempotentAppend(spark, path, batchId) { stg =>
      withStatsTimestamps(spark) {
        staged.repartitionByRange(math.min(batchFiles, cl.numFiles), z)
          .sortWithinPartitions(z)
          .drop(drop: _*)
          .write.mode("overwrite").parquet(stg)
      }
    }
    // stamp/refresh AFTER the batch landed (or replayed) so a rejected
    // or crashed first append can never poison the gate with a schema
    // nothing holds: covers the legacy-absent marker (one fallback
    // read, then marker reads forever) and the re-stamp-over-empty arm
    if (!markerSchema.contains(incoming))
      Layout.writeMarker(spark, path, schemaFile, incoming)
    applied
    }
  }

  /** Fold the appended tail back into the main grid: re-cluster ALL
    * current rows through the PINNED quantization into the layout's
    * `numFiles` and swap the files in a crash-recoverable staged
    * rewrite. After a compact the layout prunes exactly like a fresh
    * pinned-parameter rewrite (ZorderSpec pins rows exactly and
    * decoded-rows parity; the `_graft_batches` ledger is KEPT so a
    * replayed pre-compact batch stays a no-op rather than
    * re-appending folded rows).
    *
    * Protocol (single writer per path, like every [[Layout]] rewrite):
    *   1. stage the full re-clustered rewrite under the hidden
    *      `_graft_compact_tmp` (parquet readers never see it);
    *   2. stamp the `_graft_compacting` sentinel with a fresh token T —
    *      the commit point;
    *   3. delete every published data file NOT carrying `c<T>-`;
    *   4. publish the staged files into the root under `c<T>-`;
    *   5. drop the staging dir, then the sentinel.
    * Every crash window recovers on the next call: sentinel present →
    * resume steps 3–5 with the RECORDED token (files already published
    * under it survive the sweep — that is what the token is for);
    * staging without a sentinel → a pre-commit crash, the stale
    * staging is discarded. A crashed compact leaves the layout
    * readable-inconsistent only AFTER the sentinel exists, which is
    * also exactly when recovery is deterministic.
    *
    * At 100 TB this is the amortized rewrite any clustering pays;
    * operationally it runs partition-scoped (compact only the
    * partitions that ingested) — this engine's layouts are single-dir,
    * so the whole-layout form is the honest primitive. */
  def compactClustered(spark: SparkSession, path: String): Unit =
    Layout.withWriterLease(spark, path, "compactClustered") {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(path))
    val sentinel = new org.apache.hadoop.fs.Path(root, compactingFile)
    val tmp = new org.apache.hadoop.fs.Path(root, compactTmpDir)
    // finish a crashed compaction before starting this one
    if (fs.exists(sentinel)) {
      val token = Layout.readMarker(spark, path, compactingFile).get
      require(token.nonEmpty,
        s"compactClustered: empty $compactingFile sentinel at $path — " +
          "cannot tell the crashed generation's files apart; resolve " +
          "manually")
      Layout.deleteDataExcept(fs, root, s"c$token-")
      Layout.publishDir(fs, tmp, root, s"c$token-")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      require(fs.delete(sentinel, false),
        s"compactClustered: could not clear $sentinel after recovery")
    } else if (fs.exists(tmp)) {
      // pre-commit crash: the staged rewrite never became the layout
      require(fs.delete(tmp, true),
        s"compactClustered: could not clear stale staging $tmp")
    }
    // roll back any CRASHED append before folding: an unledgered
    // publish folded into the compacted files would strand the
    // stream's sweep-and-redo — the replay re-appends rows the fold
    // already absorbed (under the lease, staging-without-ledger IS
    // crashed, never in-flight)
    Layout.rollbackUnledgered(spark, path)
    val cl = clusteringOf(spark, path).getOrElse(sys.error(
      s"compactClustered: no $markerFile marker at $path — not a " +
        "clustered graft layout (or a crashed rebuild); rebuild with a " +
        "write* form first"))
    // mergeSchema: the fold must see EVERY column present anywhere in
    // the layout, not one sampled footer's view — with schema-checked
    // appends the schemas agree, but a pre-check legacy layout must
    // surface its width here rather than silently drop columns
    val (staged, z, drop) = clusteredFrame(
      spark.read.option("mergeSchema", "true").parquet(path), cl)
    withStatsTimestamps(spark) {
      staged.repartitionByRange(cl.numFiles, z)
        .sortWithinPartitions(z)
        .drop(drop: _*)
        .write.mode("overwrite").parquet(tmp.toString)
    }
    val token = java.util.UUID.randomUUID.toString.take(8)
    Layout.writeMarker(spark, path, compactingFile, token)
    Layout.deleteDataExcept(fs, root, s"c$token-")
    Layout.publishDir(fs, tmp, root, s"c$token-")
    fs.delete(tmp, true)
    require(fs.delete(sentinel, false),
      s"compactClustered: could not clear $sentinel after publish")
  }

  /** The layout's pinned clustering, read back from the marker — what
    * [[appendClustered]] and [[compactClustered]] bucket through, and
    * the introspection point for users ("what IS this layout?"). */
  def clusteringOf(spark: SparkSession, path: String): Option[Clustering] =
    Layout.readMarker(spark, path, markerFile).map(parsePayload)

  private def requireNotCompacting(spark: SparkSession, path: String,
      what: String): Unit =
    require(Layout.readMarker(spark, path, compactingFile).isEmpty,
      s"$what: $path carries a $compactingFile sentinel — a compaction " +
        "is in flight or crashed mid-swap; run compactClustered (it " +
        "recovers, then compacts) before appending")

  // ----- marker payload (bit-exact, versioned, human-inspectable) -----

  private def hexd(d: Double): String =
    java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(d))
  private def unhexd(s: String): Double =
    java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(s, 16))

  /** `v1 curve=<c> bits=<b> files=<n> cols=<name>:<kind>:<p0,p1,…>;…`
    * with every double as bit-exact hex — the quantization IS the
    * layout identity, and assignment is deterministic in the bits, so
    * only exact bits make an append compatible (the
    * [[Ivf.centroidPayload]] discipline for curve layouts). */
  private[graft] def payload(cl: Clustering): String =
    s"v1 curve=${cl.curve} bits=${cl.bits} files=${cl.numFiles} cols=" +
      cl.cols.map(c =>
        s"${c.name}:${c.kind}:${c.params.map(hexd).mkString(",")}")
        .mkString(";")

  private[graft] def parsePayload(s: String): Clustering = {
    def fail(why: String) = sys.error(
      s"$markerFile: unparseable payload ('$why'): $s")
    val parts = s.trim.split(' ')
    if (parts.length != 5 || parts(0) != "v1") fail("expected 5 v1 fields")
    def field(i: Int, k: String): String = {
      if (!parts(i).startsWith(k + "=")) fail(s"expected $k=")
      parts(i).substring(k.length + 1)
    }
    val cols = field(4, "cols").split(';').toSeq.map { c =>
      val p = c.split(':')
      if (p.length != 3) fail(s"bad col spec $c")
      if (p(1) != "u" && p(1) != "r") fail(s"unknown kind ${p(1)}")
      ColQuant(p(0), p(1), p(2).split(',').toSeq.map(unhexd))
    }
    Clustering(field(1, "curve"), field(2, "bits").toInt,
      field(3, "files").toInt, cols)
  }

  // ----- pinned-parameter bucketing + curve code -----

  /** The bucketed frame + curve column for `cl` over `df` — the ONE
    * placement spelling the original write, every append and every
    * compaction share (they must never drift, or an appended batch
    * would interleave incompatibly with the resident files). Rank
    * buckets are STAGED as projected columns (see
    * [[writeZorderedByRank]]'s note — the decision tree must evaluate
    * once per row, not once per output bit); uniform buckets are cheap
    * bit arithmetic and stay inline. Returns (frame, curve column,
    * stage columns to drop before the write). */
  private def clusteredFrame(df: DataFrame,
      cl: Clustering): (DataFrame, Column, Seq[String]) = {
    cl.cols.foreach(c => require(df.columns.contains(c.name),
      s"clustered column '${c.name}' missing from the input (has: " +
        s"${df.columns.mkString(", ")})"))
    cl.cols.foreach {
      case ColQuant(n, "u", ps) => require(ps.length == 2,
        s"uniform quantization for '$n' needs [lo, hi], got ${ps.length}")
      case ColQuant(_, "r", _) => ()
      case ColQuant(n, k, _) => sys.error(s"unknown quantization kind '$k' for '$n'")
    }
    def curveOf(qs: Seq[Column]): Column = cl.curve match {
      case "morton" => interleave(qs, cl.bits)
      // 2-D keeps the plan-pinned hilbert_d2 fused loop; 3+ dims go
      // through the Skilling-transpose hilbert_dn expression
      case "hilbert" if qs.length == 2 =>
        org.apache.spark.sql.GraftColumn.of(graft.functions.HilbertCode(
          org.apache.spark.sql.GraftColumn.expr(qs(0)),
          org.apache.spark.sql.GraftColumn.expr(qs(1)), cl.bits))
      case "hilbert" =>
        org.apache.spark.sql.GraftColumn.of(graft.functions.HilbertCodeN(
          qs.map(org.apache.spark.sql.GraftColumn.expr), cl.bits))
      case other => sys.error(s"unknown curve '$other' in $markerFile")
    }
    if (!cl.cols.exists(_.kind == "r")) {
      val qs = cl.cols.map(c => bucket(col(c.name), c.params(0), c.params(1), cl.bits))
      (df, curveOf(qs), Nil)
    } else {
      require(!df.columns.exists(_.startsWith("__graft_zb_")),
        "input already carries __graft_zb_* columns — a leaked stage " +
          "column from a crashed clustered write; drop it before re-clustering")
      val bcols = cl.cols.indices.map(i => s"__graft_zb_$i")
      // withColumn, not a full re-select: re-selecting every column by
      // name through col() would mis-parse dotted column names as
      // nested-field access — untouched columns must never be resolved
      val staged = cl.cols.zip(bcols).foldLeft(df) { case (d, (c, bc)) =>
        d.withColumn(bc, c.kind match {
          case "u" => bucket(col(c.name), c.params(0), c.params(1), cl.bits)
          case _ => rankBucket(col(c.name).cast("double"), c.params)
        })
      }
      (staged, curveOf(bcols.map(col)), bcols)
    }
  }

  /** The pinned-parameter curve value of each row of `df` — the
    * measurement hook ZorderSpec's grid pins ride on (per-file z-range
    * disjointness IS "fully clustered"): returns the frame extended
    * with the curve value under `asCol`, stage columns already shed. */
  private[graft] def curveValues(df: DataFrame, cl: Clustering,
      asCol: String): DataFrame = {
    val (staged, z, drop) = clusteredFrame(df, cl)
    staged.withColumn(asCol, z).drop(drop: _*)
  }

  /** The per-dimension equal-width [lo, hi] bounds behind [[zvalue]] —
    * one min/max stats pass, shared by the Morton and Hilbert forms.
    * Stats run over FINITE values only: a single NaN would make max()
    * return NaN (Spark orders it above every double) and silently
    * degenerate the whole dimension to one bucket; ±Infinity would
    * collapse every finite row's scale the same way. Non-finite ROWS
    * still get defined buckets (edge clamp in [[bucket]]). */
  private def uniformQuants(df: DataFrame, cols: Seq[String],
      bits: Int): Seq[ColQuant] = {
    def finite(x: Column): Column = {
      val d = x.cast("double")
      when(isnan(d) || abs(d) === Double.PositiveInfinity, lit(null))
        .otherwise(d)
    }
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      min(finite(col(c))).as(s"__lo_$c"),
      max(finite(col(c))).as(s"__hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // clustering an EMPTY frame is refused outright: zero rows pin a
    // degenerate lo = hi quantization into the marker, every future
    // append buckets to curve value 0, and the layout never prunes —
    // permanently, because appends and compactions bucket through the
    // PINNED parameters by design. A single all-NULL column still
    // degenerates to one bucket (documented above); a whole frame
    // with no stats is a bootstrap mistake and must fail loudly.
    require(stats.getLong(0) > 0,
      "cannot cluster an EMPTY frame — the stats pass would pin a " +
        "degenerate quantization that never prunes; bootstrap the " +
        "layout from resident data")
    cols.zipWithIndex.map { case (c, i) =>
      val lo = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      val hi = if (stats.isNullAt(2 * i + 2)) 0.0 else stats.getDouble(2 * i + 2)
      ColQuant(c, "u", Seq(lo, hi))
    }
  }

  /** Stats-bearing timestamps scoped to ONE write: Spark's default
    * INT96 timestamp encoding carries no min/max statistics, so a time
    * column clustered here would prune NOTHING at read (measured in
    * ZorderProbe: 25,199 decoded rows vs 12,633 once stats exist).
    * TIMESTAMP_MICROS is the parquet-standard stats-bearing encoding;
    * it is not set session-wide because its isAdjustedToUTC annotation
    * changes how external readers render values (see Session.builder's
    * note). The set/restore is a SESSION-level mutation — like every
    * rewrite in this engine, one writer per session is assumed: a
    * concurrent parquet write on the same session during this window
    * would pick up MICROS (harmless but unscoped), and a concurrent
    * clustered write could restore the wrong prior. */
  private def withStatsTimestamps[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try body finally spark.conf.set(key, prior)
  }

  /** Rank (equi-depth) quantization boundaries for `c` over `df`:
    * 2^bits − 1 approximate quantile splits, deduplicated and sorted.
    * The skew-robust sibling of the min/max scaling above — a
    * heavy-tailed column under equal-WIDTH buckets crams almost every
    * row into one bucket (the z-curve then degenerates to a 1-D sort
    * on the other dimensions, measured in ZorderProbe's rank
    * section); equal-DEPTH buckets spread rows ~evenly regardless of
    * shape. Driver-bounded: ≤ 255 doubles at the bits ≤ 8 this mode
    * supports. */
  private[graft] def rankBoundaries(df: DataFrame, c: String,
      bits: Int): Array[Double] =
    rankBoundariesAll(df, Seq(c), bits).head

  /** All clustered columns' boundaries in ONE approxQuantile pass —
    * the multi-column overload computes every column's sketch in a
    * single table scan, so the stats cost does not grow with the
    * dimension count. */
  private def rankBoundariesAll(df: DataFrame, cols: Seq[String],
      bits: Int): Seq[Array[Double]] = {
    require(bits >= 1 && bits <= 8,
      s"rank mode supports bits in [1,8] (<= 255 boundaries), got $bits")
    require(!df.isEmpty,
      "cannot cluster an EMPTY frame — the quantile pass would pin a " +
        "degenerate quantization that never prunes; bootstrap the " +
        "layout from resident data")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .stat.approxQuantile(cols.toArray, probs, 0.001)
      .map(_.distinct.sorted).toSeq
  }

  /** Bucket of `v` among sorted `bounds` — the count of boundaries
    * ≤ v, spelled as a BALANCED BINARY DECISION TREE of when/otherwise
    * (log₂ comparisons per row, fully whole-stage-codegen'd; no UDF,
    * no interpreted HOF). NULL descends the false branch at every
    * split and lands in bucket 0; NaN compares greater than any
    * double in Spark and lands in the top bucket. */
  private[graft] def rankBucket(v: Column, bounds: Seq[Double]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(v >= lit(bounds(mid)), go(mid + 1, hi)).otherwise(go(lo, mid))
      }
    go(0, bounds.length)
  }

  /** Per-file bounding boxes of `cols` in a written layout — the
    * zone-map view a pruning reader sees, here for measurement
    * ([[graft.ZorderProbe]]) and spec assertions. One narrow scan. */
  def boundingBoxes(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
