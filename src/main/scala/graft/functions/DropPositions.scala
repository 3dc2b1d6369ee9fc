package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: drop the elements of a string array at
  * the 0-based positions listed in a second (int-array) argument,
  * preserving order — the rebuild step of repeated-span removal
  * ([[graft.operators.Dedup.dropRepeatedSpans]]).
  *
  * Exists because the composable form is an interpreted three-way
  * dispatch (`when(size(dps)=0, toks)` / per-token `array_contains`
  * scan / `array_except` + `transform`-`element_at`): lambda HOFs
  * evaluate outside whole-stage codegen, paying interpreter frames
  * per TOKEN across the whole corpus in the dedup hot path. Here the
  * whole rebuild is one fused loop in generated code: an empty drop
  * list returns the input array untouched (zero allocation — the
  * common case), otherwise one boolean bitmap + one output copy —
  * O(n + |dps|) always, so the fully-duplicated-long-doc worst case
  * stays linear. Both forms compute identical values (DedupSpec
  * parity); out-of-range and duplicate positions are ignored, null
  * token slots pass through, null inputs null the result (standard
  * binary-expression semantics).
  */
case class DropPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"drop_positions expects (array<string>, array<int>), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = left.dataType
  override def prettyName: String = "drop_positions"

  override def nullSafeEval(t: Any, d: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val dps = d.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = dps.numElements()
    if (m == 0) return toks
    val drop = new Array[Boolean](n)
    var dropped = 0
    var j = 0
    while (j < m) {
      if (!dps.isNullAt(j)) {
        val p = dps.getInt(j)
        if (p >= 0 && p < n && !drop(p)) { drop(p) = true; dropped += 1 }
      }
      j += 1
    }
    val out = new Array[AnyRef](n - dropped)
    var i = 0
    var o = 0
    while (i < n) {
      if (!drop(i)) {
        out(o) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val drop = ctx.freshName("drop"); val dropped = ctx.freshName("dropped")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val o = ctx.freshName("o")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $t.numElements();
         |int $m = $d.numElements();
         |if ($m == 0) {
         |  ${ev.value} = $t;
         |} else {
         |  boolean[] $drop = new boolean[$n];
         |  int $dropped = 0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if (!$d.isNullAt($j)) {
         |      int $p = $d.getInt($j);
         |      if ($p >= 0 && $p < $n && !$drop[$p]) { $drop[$p] = true; $dropped++; }
         |    }
         |  }
         |  Object[] $out = new Object[$n - $dropped];
         |  int $o = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$drop[$i]) {
         |      $out[$o++] = $t.isNullAt($i) ? null : $t.getUTF8String($i);
         |    }
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropPositions =
    copy(left = newLeft, right = newRight)
}
