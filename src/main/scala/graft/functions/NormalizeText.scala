package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: [[Text.normalize]] — and, with
  * `tokenize = true`, [[Text.tokens]] — in one fused byte pass.
  *
  * The composable forms are `lower(trim(regexp_replace(c, "\s+", " ")))`
  * (+ `split(_, " ")`): three to four codegen'd builtins, but the
  * collapse runs the java.util.regex engine over every document (with
  * a UTF8String→String→UTF8String round trip inside regexp_replace)
  * and each stage materializes an intermediate string. This is the
  * FIRST stage of every text query in the engine — tokenization
  * feeds the dedup indexes, batteries, LMs, tokenizers and packers —
  * so the regex engine ran over the corpus dozens of times per suite.
  *
  * The kernel makes ONE scan over the UTF-8 bytes: whitespace runs
  * (Java `\s` = ASCII `[ \t\n\x0B\f\r]` — single bytes in UTF-8;
  * continuation bytes are ≥ 0x80, so the byte test is exact) collapse
  * to a single space, edge runs drop (trim of the collapsed form),
  * then ONE `UTF8String.toLowerCase` (the same call the `lower`
  * builtin makes — full Unicode), then an optional byte-level split
  * on the single 0x20 separators (the collapsed form has no doubled
  * spaces, so this equals `split(_, " ")`; an empty normalized string
  * splits to `[""]`, java-split's limit −1 semantics).
  * NormalizeTextSpec pins bit-equality against the composable forms
  * on the real corpus and on whitespace-zoo fixtures.
  */
case class NormalizeText(child: Expression, tokenize: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.sql}")
  }

  override def dataType: DataType =
    if (tokenize) ArrayType(StringType, containsNull = false) else StringType
  override def prettyName: String =
    if (tokenize) "normalized_tokens" else "normalize_text"

  @transient private lazy val normalizer = new TextNormalizer(tokenize)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (tokenize) normalizer.tokens(s) else normalizer.normalize(s)
  }

  // The helper methods are TYPED (UTF8String / ArrayData): generated
  // code assigns the call result straight into the declared slot, and
  // an Object-returning signature would fail Janino's assignment check
  // ("Assignment conversion not possible from Object to ArrayData"),
  // silently dropping every stage containing tokens/normalize out of
  // whole-stage codegen (observed in BENCH_r16's tail).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textNormalizer", normalizer,
      classOf[TextNormalizer].getName)
    val m = if (tokenize) "tokens" else "normalize"
    defineCodeGen(ctx, ev, c => s"$ref.$m($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** The compiled pass (one virtual call per row from generated code).
  * `tokenize` is kept only for serialized-instance compatibility; the
  * expression picks the typed entry point at codegen time. */
final class TextNormalizer(tokenize: Boolean) extends Serializable {

  // Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val in = s.getBytes // may copy; one copy replaces regexp_replace's two
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val b = in(i)
      if (isWs(b)) { if (o > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = b; o += 1
      }
      i += 1
    }
    // pendingSpace true at end == trailing run: dropped (trim)
    val collapsed = UTF8String.fromBytes(out, 0, o)
    collapsed.toLowerCase
  }

  def tokens(s: UTF8String): ArrayData = {
    val lowered = normalize(s)
    // byte-level split on the single-space separators; empty input
    // yields [""], java-split limit -1 semantics
    val lb = lowered.getBytes
    val ln = lb.length
    if (ln == 0) new GenericArrayData(Array[AnyRef](UTF8String.EMPTY_UTF8))
    else {
      var parts = 1
      var j = 0
      while (j < ln) { if (lb(j) == ' ') parts += 1; j += 1 }
      val arr = new Array[AnyRef](parts)
      var start = 0
      var p = 0
      j = 0
      while (j < ln) {
        if (lb(j) == ' ') {
          arr(p) = UTF8String.fromBytes(lb, start, j - start)
          p += 1
          start = j + 1
        }
        j += 1
      }
      arr(p) = UTF8String.fromBytes(lb, start, ln - start)
      new GenericArrayData(arr)
    }
  }
}
