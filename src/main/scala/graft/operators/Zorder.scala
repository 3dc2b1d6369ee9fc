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
  */
object Zorder {

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
    interleave(quantized(df, cols, bits), bits)

  /** Rewrite `df` as a z-ordered parquet layout at `path`: range-
    * partition on the Morton code into `numFiles` files, sort within
    * each, write. Every clustered column's per-file min/max is then
    * tight, and ordinary pushed-down predicates prune files and row
    * groups in all `cols` dimensions at once. */
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
  }

  def writeZordered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, numFiles: Int = 32): Unit = {
    validateWrite(cols, bits, numFiles)
    writeClustered(df, path, zvalue(df, cols, bits), numFiles)
  }

  /** [[writeZordered]] on the 2-D HILBERT curve instead of Morton:
    * same quantization, same single-shuffle write, but the curve
    * never takes Morton's long diagonal jumps — every successive cell
    * is adjacent — so a box predicate cuts it into fewer, longer runs
    * and the same file count covers the box with tighter bounding
    * boxes (ZorderProbe measures the decoded-rows difference on
    * identical boxes). 2 dimensions exactly: the curve comes from the
    * native `hilbert_d2` expression ([[graft.functions.HilbertCode]],
    * one fused codegen loop; the xy2d algorithm's per-bit rotate/flip
    * state doesn't unroll into Column combinators without doubling
    * the tree per bit plane). */
  def writeHilbert(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, numFiles: Int = 32): Unit = {
    validateWrite(cols, bits, numFiles)
    require(cols.length == 2,
      s"hilbert layout is 2-D (got ${cols.length} columns) — use " +
        "writeZordered for higher dimensions")
    // the expression is constructed directly (no name lookup), so no
    // function registration is needed — the hilbert_d2 registry entry
    // exists for SQL/expr() users
    val qs = quantized(df, cols, bits)
    val h = org.apache.spark.sql.GraftColumn.of(
      graft.functions.HilbertCode(
        org.apache.spark.sql.GraftColumn.expr(qs(0)),
        org.apache.spark.sql.GraftColumn.expr(qs(1)), bits))
    writeClustered(df, path, h, numFiles)
  }

  /** The per-dimension equal-width bucket columns behind [[zvalue]] —
    * one min/max stats pass, shared by the Morton and Hilbert forms.
    * Stats run over FINITE values only: a single NaN would make max()
    * return NaN (Spark orders it above every double) and silently
    * degenerate the whole dimension to one bucket; ±Infinity would
    * collapse every finite row's scale the same way. Non-finite ROWS
    * still get defined buckets (edge clamp in [[bucket]]). */
  private def quantized(df: DataFrame, cols: Seq[String],
      bits: Int): Seq[Column] = {
    def finite(x: Column): Column = {
      val d = x.cast("double")
      when(isnan(d) || abs(d) === Double.PositiveInfinity, lit(null))
        .otherwise(d)
    }
    val aggs = cols.flatMap(c => Seq(
      min(finite(col(c))).as(s"__lo_$c"),
      max(finite(col(c))).as(s"__hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) =>
      val lo = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val hi = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      bucket(col(c), lo, hi, bits)
    }
  }

  /** The one clustered-write path both quantization modes share:
    * range-partition on `z`, local sort, write parquet, with
    * stats-bearing timestamps scoped to THIS write. Spark's default
    * INT96 timestamp encoding carries no min/max statistics, so a
    * time column clustered here would prune NOTHING at read (measured
    * in ZorderProbe: 25,199 decoded rows vs 12,633 once stats exist).
    * TIMESTAMP_MICROS is the parquet-standard stats-bearing encoding;
    * it is not set session-wide because its isAdjustedToUTC annotation
    * changes how external readers render values (see Session.builder's
    * note). The set/restore is a SESSION-level mutation — like every
    * rewrite in this engine, one writer per session is assumed: a
    * concurrent parquet write on the same session during this window
    * would pick up MICROS (harmless but unscoped), and a concurrent
    * clustered write could restore the wrong prior. `dropCols` lets
    * the rank path stage per-dimension bucket columns and shed them
    * after the sort (a projection preserves partitioning and
    * intra-partition order — no exchange, no re-sort). */
  private def writeClustered(df: DataFrame, path: String, z: Column,
      numFiles: Int, dropCols: Seq[String] = Nil): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val spark = df.sparkSession
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .drop(dropCols: _*)
      .write.mode("overwrite").parquet(path)
    finally spark.conf.set(key, prior)
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
      bits: Int = 8, numFiles: Int = 32): Unit = {
    validateWrite(cols, bits, numFiles)
    require(!df.columns.exists(_.startsWith("__graft_zb_")),
      "input already carries __graft_zb_* columns — a leaked stage " +
        "column from a crashed clustered write; drop it before re-clustering")
    val bounds = rankBoundariesAll(df, cols, bits)
    val bcols = cols.indices.map(i => s"__graft_zb_$i")
    // withColumn, not a full re-select: re-selecting every column by
    // name through col() would mis-parse dotted column names as
    // nested-field access — untouched columns must never be resolved
    val staged = cols.zip(bounds).zip(bcols).foldLeft(df) {
      case (d, ((c, b), bc)) =>
        d.withColumn(bc, rankBucket(col(c).cast("double"), b.toSeq))
    }
    writeClustered(staged, path, interleave(bcols.map(col), bits),
      numFiles, dropCols = bcols)
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
