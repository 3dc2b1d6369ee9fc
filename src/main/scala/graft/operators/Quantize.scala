package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar quantization of embedding columns — the storage/IO lever of
  * a large-scale embedding pipeline: uint8 codes are 4× smaller than
  * float32, which at 100 TB of vectors is the difference between one
  * rack of NVMe and four, and 4× fewer scan bytes for every ANN probe
  * that follows. Per-vector min-max quantization (each vector carries
  * its own (mn, scale)) keeps the error bounded by the vector's OWN
  * range — no corpus-wide calibration pass, so the operator stays a
  * zero-shuffle projection and streams through a corpus in one pass.
  *
  * All pure Column expressions (transform/zip_with folds), computed in
  * double with fixed operation order — deterministic across engines
  * and partitionings. Codes are 0..255 stored as int (parquet dictionary
  * + byte-packing makes the physical width 1 byte; Spark has no
  * unsigned type).
  */
object Quantize {

  /** Quantization scale for a float-array column: (max−min)/255, 0.0
    * for constant vectors (guarded at [[codes]]/[[dequantize]]). */
  def scale(vec: Column): Column =
    (array_max(vec).cast("double") - array_min(vec).cast("double")) / lit(255.0)

  /** uint8 codes: round((x − min)/scale), HALF_UP — identical to SQL
    * round() on the non-negative operand. Constant vectors (scale 0)
    * code to all-zeros. Native single pass ([[graft.functions
    * .Sq8Encode]]) — `mn`/`s` evaluate once per ROW, so the old
    * bound-attribute requirement of the lambda form (which evaluated
    * its body once per ELEMENT) no longer binds; callers that stage
    * them keep doing so for readability. */
  def codes(vec: Column, mn: Column, s: Column): Column =
    org.apache.spark.sql.GraftColumn.of(graft.functions.Sq8Encode(
      org.apache.spark.sql.GraftColumn.expr(vec),
      org.apache.spark.sql.GraftColumn.expr(mn),
      org.apache.spark.sql.GraftColumn.expr(s)))

  /** Composable (lambda-HOF) parity reference for [[codes]], kept for
    * Sq8KernelsSpec — the native expression must return bit-identical
    * arrays (same HALF_UP rounding, same all-zeros scale-0 arm, same
    * per-element null propagation). */
  private[graft] def codesFold(vec: Column, mn: Column, s: Column): Column =
    when(s === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => round((x.cast("double") - mn) / s, 0).cast("int")))

  /** Reconstruction: min + code × scale, as double. `mn`/`s` are the
    * stored per-vector parameters. */
  def dequantize(codes: Column, mn: Column, s: Column): Column =
    org.apache.spark.sql.GraftColumn.of(graft.functions.Sq8Decode(
      org.apache.spark.sql.GraftColumn.expr(codes),
      org.apache.spark.sql.GraftColumn.expr(mn),
      org.apache.spark.sql.GraftColumn.expr(s)))

  /** [[dequantize]] emitting FLOATS directly — fuses the probe path's
    * trailing `transform(_, cast("float"))` into the same native pass
    * (bit-identical: `(mn + c·s).toFloat` per element). */
  def dequantizeF(codes: Column, mn: Column, s: Column): Column =
    org.apache.spark.sql.GraftColumn.of(graft.functions.Sq8Decode(
      org.apache.spark.sql.GraftColumn.expr(codes),
      org.apache.spark.sql.GraftColumn.expr(mn),
      org.apache.spark.sql.GraftColumn.expr(s), toFloat = true))

  /** Composable parity reference for [[dequantize]]/[[dequantizeF]]. */
  private[graft] def dequantizeFold(codes: Column, mn: Column, s: Column): Column =
    transform(codes, c => mn + c.cast("double") * s)

  /** Largest per-dimension absolute reconstruction error — bounded by
    * scale/2 ≈ range/510 by construction; the cheap fidelity check a
    * pipeline asserts before swapping the float column out. */
  def maxAbsError(vec: Column, codes: Column, mn: Column, s: Column): Column =
    coalesce(
      array_max(zip_with(vec, codes,
        (x, c) => abs(mn + c.cast("double") * s - x.cast("double")))),
      lit(0.0))

  /** One entry of the seeded ±1 Johnson–Lindenstrauss sign matrix:
    * the parity of the first md5 hex digit of `"<seed><j>:<i>"` —
    * a pure function of (seed, output-dim, input-dim), so the matrix
    * is never materialized or shipped; any engine (and the DuckDB
    * oracle) regenerates the same entry from the seed. */
  def jlSign(seed: String, j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed$j:$i".getBytes("UTF-8"))
    if (((md(0) >> 4) & 0xf) % 2 == 0) 1 else -1
  }

  /** Johnson–Lindenstrauss random projection of uint8 [[codes]] down
    * to `outDim` integer coordinates — the dimensionality lever next
    * to the byte-width lever above (Achlioptas 2003: ±1 entries give
    * the JL distance-preservation guarantee without Gaussians; over
    * integer codes the projection is Σ ±code, EXACT integer
    * arithmetic, so engines agree bit-for-bit in any evaluation
    * order — no float-summation caveats anywhere). A 64-dim byte
    * vector becomes `outDim` longs: the coarse prefilter geometry for
    * ANN (probe the projected space, exact-rescore survivors).
    *
    * `dim` must match the code array's length exactly (zip_with pads
    * the shorter side with nulls — a silent wrong answer — so the
    * length is CHECKED per row and a mismatch raises, making a
    * testdata-vintage change fail loudly for every caller, not just
    * the oracle-gated ones). Returns one aliased column per output
    * dimension (`p0..p<k-1>`).
    */
  def jlProject(codes: Column, dim: Int, outDim: Int, seed: String): Seq[Column] = {
    val checked = when(size(codes) === dim, codes)
      .otherwise(raise_error(concat(
        lit(s"jlProject: expected $dim-dim codes, got "),
        size(codes).cast("string"))).cast("array<int>"))
    (0 until outDim).map { j =>
      val signs = array((0 until dim).map(i => lit(jlSign(seed, j, i))): _*)
      aggregate(zip_with(checked, signs, (c, s) => c * s),
        lit(0L), (acc, x) => acc + x.cast("long")).as(s"p$j")
    }
  }
}
