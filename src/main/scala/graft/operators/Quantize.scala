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
    * code to all-zeros.
    *
    * `mn` and `s` must be BOUND attributes (stage [[scale]] and
    * `array_min` in their own projection first): anything in the
    * transform lambda's body evaluates once per ELEMENT, so an inline
    * `array_min(vec)` tree would make the projection O(dim²) per
    * vector — the Text.shingles binding rule again. */
  def codes(vec: Column, mn: Column, s: Column): Column =
    when(s === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => round((x.cast("double") - mn) / s, 0).cast("int")))

  /** Reconstruction: min + code × scale, as double. `mn`/`s` are the
    * stored per-vector parameters. */
  def dequantize(codes: Column, mn: Column, s: Column): Column =
    transform(codes, c => mn + c.cast("double") * s)

  /** Largest per-dimension absolute reconstruction error — bounded by
    * scale/2 ≈ range/510 by construction; the cheap fidelity check a
    * pipeline asserts before swapping the float column out. */
  def maxAbsError(vec: Column, codes: Column, mn: Column, s: Column): Column =
    coalesce(
      array_max(zip_with(vec, codes,
        (x, c) => abs(mn + c.cast("double") * s - x.cast("double")))),
      lit(0.0))
}
