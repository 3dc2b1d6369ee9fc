package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: greedy left-to-right phrase merge of a
  * token array under a FIXED phrase set — each adjacent pair present in
  * `phrases` (as `"w1 w2"`) merges to the single token `w1_w2`, the
  * word2vec between-pass token rewrite (Mikolov et al. 2013;
  * [[graft.operators.Collocations.iteratePhrases]] is the trainer).
  *
  * Why native: the composable spelling is an interpreted `aggregate`
  * HOF whose accumulator is rebuilt with `slice`+`concat` per token
  * (O(len²) array copying per document) and whose membership test is
  * `array_contains` over the phrase literal (O(|phrases|) PER TOKEN) —
  * the same interpreted-HOF shape the winnowing rewrite measured at
  * 100×. Here the whole rewrite is ONE O(len) pass with an O(1)
  * hash-set probe per adjacent pair, compiled once per expression
  * instance and entered into codegen as a referenced object — one
  * virtual call per row, inside whole-stage codegen (the
  * [[PhraseHits]] pattern).
  *
  * Semantics mirror the retained composable form exactly
  * ([[graft.operators.Collocations.mergePhrasesComposable]],
  * CollocationsSpec-pinned parity): the OUTPUT's last token is tested
  * against each incoming one, so a freshly-merged token can itself be
  * the left side of a later-pass phrase ("new_york times") only if
  * that phrase is in the set; null token slots never match (the
  * composable form's null-propagating `when`) and pass through; an
  * empty phrase set returns the input untouched.
  */
case class MergeTokens(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.forall(p => p != null && p.nonEmpty),
    "merge_tokens: null/empty phrase")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"merge_tokens expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "merge_tokens"

  @transient private lazy val merger = new TokenMerger(phrases.toArray)

  override def nullSafeEval(input: Any): Any =
    merger.merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merger", merger, classOf[TokenMerger].getName)
    defineCodeGen(ctx, ev, c => s"$ref.merge($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergeTokens =
    copy(child = newChild)
}

/** The compiled merge pass: a hash set of the `"w1 w2"` phrase keys
  * (rebuilt per executor after serialization, never per row) and one
  * in-place output sweep — the candidate key `last + " " + incoming`
  * is materialized only to probe the set, and the merged token only
  * on an actual hit. */
final class TokenMerger(phrases: Array[String]) extends Serializable {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, phrases.length * 2))
    phrases.foreach(p => s.add(UTF8String.fromString(p)))
    s
  }
  @transient private lazy val space = UTF8String.fromString(" ")
  @transient private lazy val underscore = UTF8String.fromString("_")

  def merge(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n == 0 || phrases.length == 0) return toks
    val out = new Array[AnyRef](n)
    var o = 0
    var i = 0
    while (i < n) {
      val s = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val last = if (o > 0) out(o - 1).asInstanceOf[UTF8String] else null
      if (s != null && last != null &&
          set.contains(UTF8String.concat(last, space, s))) {
        out(o - 1) = UTF8String.concat(last, underscore, s)
      } else {
        out(o) = s
        o += 1
      }
      i += 1
    }
    if (o == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }
}
