package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE compression ratio of a string —
  * `compressed_bytes / utf8_bytes`, the compression-based quality
  * signal corpus pipelines run beside the statistical battery (CCNet
  * computes it with gzip; repetitive boilerplate and template spam
  * compress far below prose, and high-entropy garbage/base64 blobs
  * compress above it, so BOTH tails of the ratio are filter knobs —
  * unlike q133's token entropy, this sees sub-token and cross-token
  * structure).
  *
  * Raw DEFLATE (RFC 1951, level 6, no zlib/gzip header) over the UTF-8
  * bytes. Deterministic for a given JVM's zlib; the exact byte count is
  * NOT specified cross-zlib-version, which is why this signal is
  * spec-graded (pinned values + ordering contracts in
  * CompressRatioSpec) rather than DuckDB-oracle-checked — the oracle
  * engine has no deflate at all. Empty input → 1.0 (incompressible by
  * convention, no division by zero).
  *
  * Codegen calls the static helper (the CosineFloat pattern) so the
  * projection stays inside whole-stage codegen; the Deflater is
  * allocated per call and `end()`ed in a finally — no native-memory
  * leak under speculative re-execution.
  */
case class CompressRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"compress_ratio expects string, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "compress_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
}

object CompressRatio {

  /** `deflate(utf8(s)).length / utf8(s).length`; 1.0 for empty. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0d
    val d = new java.util.zip.Deflater(6, /* nowrap = raw deflate */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / bytes.length
    } finally d.end()
  }
}
