package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Gopher's character-weighted duplicate
  * fraction of a string array in ONE fused pass — the share of
  * characters belonging to occurrences beyond the first of each
  * distinct value, `(Σlen(all) − Σlen(distinct)) / Σlen(all)`, with
  * 0.0 for empty input or all-empty strings.
  *
  * Exists because the composable form is TWO interpreted lambda folds
  * plus an `array_distinct` materialization per row, in the same
  * quality battery whose other signals already went native
  * (`ngram_run_stats`). Here both sums come from a single hash-set
  * scan inside whole-stage codegen. Emits the FRACTION, not a stats
  * struct, so callers hold exactly one reference — in an interpreted
  * projection (one that carries lambda-HOF columns) two references to
  * the expression would evaluate it twice per row.
  *
  * Null elements contribute nothing to either sum (pinned in
  * CharDupFractionSpec; the old fold let one null element NULL the
  * total, which the 0-guard then mapped to 0.0 — same end value on
  * all-null input, and corpus line arrays never carry nulls).
  */
case class CharDupFraction(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_dup_fraction expects array<string>, got ${t.sql}")
  }

  // Default null-intolerance (null array → null fraction), like the
  // sibling natives: an explicit `nullable = false` here would make
  // UnaryExpression's eval hand a null to non-null-typed consumers and
  // the nullSafeCodeGen fast path dereference a null ArrayData when a
  // SQL caller passes NULL.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_dup_fraction"

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    var total = 0L
    var distinct = 0L
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        val s = ad.getUTF8String(i)
        val len = s.numChars().toLong
        total += len
        if (seen.add(s)) distinct += len
      }
      i += 1
    }
    if (total <= 0L) 0.0d
    else (total - distinct).toDouble / total.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ad => {
      // every local from ctx.freshName (the CosineFloat lesson)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val seen = ctx.freshName("seen"); val s = ctx.freshName("s")
      val len = ctx.freshName("len"); val total = ctx.freshName("total")
      val dist = ctx.freshName("dist")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $n = $ad.numElements();
         |java.util.HashSet<$utf8> $seen = new java.util.HashSet<$utf8>();
         |long $total = 0L; long $dist = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$ad.isNullAt($i)) {
         |    $utf8 $s = $ad.getUTF8String($i);
         |    long $len = (long) $s.numChars();
         |    $total += $len;
         |    if ($seen.add($s)) $dist += $len;
         |  }
         |}
         |${ev.value} = ($total <= 0L) ? 0.0d
         |  : ((double) ($total - $dist)) / ((double) $total);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharDupFraction =
    copy(child = newChild)
}
