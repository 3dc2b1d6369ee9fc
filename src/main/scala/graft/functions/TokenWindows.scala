package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fixed-width token windows of a string
  * array in one fused pass — the shared kernel behind
  * [[Text.wordNgrams]] (width n, stride 1, full windows only),
  * [[Text.shingles]] (the same plus first-occurrence dedup) and
  * [[Text.tokenChunks]] (width w, stride w, partial tail window kept).
  *
  * Why native: the composable spellings are `transform(sequence(…),
  * i => concat_ws/array_join(slice|element_at…))` — HigherOrderFunctions,
  * which whole-stage codegen cannot compile, so every document pays an
  * interpreted lambda frame, an Integer box and a fresh child-row per
  * WINDOW (tokens × the per-element `element_at` walks), on every
  * corpus row of the shingle/n-gram hot paths (dedup inverted indexes,
  * Gopher batteries, n-gram LMs, phrase mining, CMS/postings builders).
  * Here the whole derivation is one primitive loop per row, compiled
  * once per expression instance and entered into codegen as a
  * referenced object — the [[MergeTokens]]/[[AnnKernels]] pattern.
  *
  * Semantics mirror the retained composable forms exactly
  * (TokenWindowsSpec pins bit-equality on the real corpus plus
  * adversarial fixtures):
  *   - window text joins tokens with a single space, SKIPPING null
  *     slots entirely (concat_ws / array_join both skip nulls — no
  *     doubled separator);
  *   - `partial = false`: a document shorter than `width` yields an
  *     empty array (the `when(size >= n)` guard), windows count
  *     sz − width + 1;
  *   - `partial = true`: ceil(sz / width) chunks, the last one
  *     truncated (the `sequence(1, ceil)` + `slice` form), empty input
  *     yields an empty array;
  *   - `distinct = true` keeps the FIRST occurrence of each value in
  *     window order (array_distinct semantics);
  *   - NULL input yields an empty array, not NULL — both composable
  *     forms fall through a `when(…).otherwise(array())` whose
  *     otherwise-branch types the output non-null.
  */
case class TokenWindows(child: Expression, width: Int, stride: Int,
    partial: Boolean, distinct: Boolean) extends UnaryExpression {

  require(width >= 1, "token windows: width must be >= 1")
  require(stride >= 1, "token windows: stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (partial) "token_chunks" else if (distinct) "word_shingles" else "word_ngrams"

  // the composable forms return an EMPTY array for NULL input (their
  // when-guard falls through to `otherwise(array())`), so this
  // expression is never null and must not use the null-intolerant
  // default eval
  override def nullable: Boolean = false

  @transient private lazy val slicer =
    new TokenSlicer(width, stride, partial, distinct)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TokenSlicer.empty else slicer.windows(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSlicer", slicer, classOf[TokenSlicer].getName)
    val childGen = child.genCode(ctx)
    val empty = s"${classOf[TokenSlicer].getName}.empty()"
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code +
        code"""
          |$javaType ${ev.value} = ${childGen.isNull}
          |  ? $empty : $ref.windows(${childGen.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWindows =
    copy(child = newChild)
}

/** The compiled window pass (one virtual call per row from generated
  * code). A single reusable width-wide buffer feeds
  * `UTF8String.concatWs`, whose null-skipping covers both interior
  * null tokens and the null-padded tail of a truncated final chunk. */
final class TokenSlicer(width: Int, stride: Int, partial: Boolean,
    distinct: Boolean) extends Serializable {

  @transient private lazy val space = UTF8String.fromString(" ")

  def windows(toks: ArrayData): ArrayData = {
    val sz = toks.numElements()
    val m =
      if (partial) (sz + width - 1) / width
      else if (sz < width) 0
      else (sz - width) / stride + 1
    if (m <= 0) return TokenSlicer.empty
    val buf = new Array[UTF8String](width)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var j = 0
      while (j < m) {
        seen.add(gram(toks, sz, j, buf))
        j += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    } else {
      val out = new Array[AnyRef](m)
      var j = 0
      while (j < m) {
        out(j) = gram(toks, sz, j, buf)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  @inline private def gram(toks: ArrayData, sz: Int, j: Int,
      buf: Array[UTF8String]): UTF8String = {
    val start = j * stride
    val end = math.min(sz, start + width)
    var i = start
    while (i < end) {
      buf(i - start) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    // truncated final chunk: null-pad the tail — concatWs skips nulls
    var p = end - start
    while (p < width) { buf(p) = null; p += 1 }
    UTF8String.concatWs(space, buf: _*)
  }
}

object TokenSlicer {
  private val emptyArray: ArrayData = new GenericArrayData(new Array[AnyRef](0))
  /** Shared empty result (also called from generated code). */
  def empty(): ArrayData = emptyArray
}
