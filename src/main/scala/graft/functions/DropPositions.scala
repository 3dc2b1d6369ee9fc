package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: drop the elements of a string array
  * covered by any [p, p+width-1] span whose 0-based START position p
  * is listed in a second (int-array) argument, preserving order — the
  * rebuild step of repeated-span removal
  * ([[graft.operators.Dedup.dropRepeatedSpans]]); `width = 1`
  * degenerates to point-position deletion.
  *
  * Exists because the composable form is an interpreted three-way
  * dispatch (`when(size(dps)=0, toks)` / per-token `array_contains`
  * scan / `array_except` + `transform`-`element_at`): lambda HOFs
  * evaluate outside whole-stage codegen, paying interpreter frames
  * per TOKEN across the whole corpus in the dedup hot path. Here the
  * whole rebuild is one fused loop in generated code: an empty drop
  * list returns the input array untouched (zero allocation — the
  * common case), otherwise one boolean bitmap + one output copy —
  * O(n + |dps|·width) bitmap marking clamped by n, so the
  * fully-duplicated-long-doc worst case stays linear. Taking START
  * positions (not expanded coverage) also lets the caller shuffle
  * width× fewer rows: the old `explode(sequence(pos, pos+k-1))`
  * coverage expansion happens inside this loop instead of inside an
  * exchange. Width-1 parity vs the composable dispatch is
  * DedupSpec-pinned; out-of-range and duplicate positions are
  * ignored (spans clamp to the array), null token slots pass
  * through, null inputs null the result (standard binary-expression
  * semantics).
  */
case class DropPositions(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  require(width >= 1, "span width must be at least 1")

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
        var q = math.max(p, 0)
        val end = math.min(p + width, n)
        while (q < end) {
          if (!drop(q)) { drop(q) = true; dropped += 1 }
          q += 1
        }
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
      val q = ctx.freshName("q"); val end = ctx.freshName("end")
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
         |      int $end = java.lang.Math.min($p + $width, $n);
         |      for (int $q = java.lang.Math.max($p, 0); $q < $end; $q++) {
         |        if (!$drop[$q]) { $drop[$q] = true; $dropped++; }
         |      }
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
