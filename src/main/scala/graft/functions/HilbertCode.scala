package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the 2-D Hilbert-curve index of two
  * pre-quantized bucket coordinates, each in [0, 2^bits) — the
  * locality-better sibling of [[graft.operators.Zorder.interleave]]'s
  * Morton code. The Hilbert curve never takes the Morton curve's long
  * diagonal jumps (every successive cell is an adjacent cell), so a
  * box predicate cuts the curve into fewer, longer runs and a
  * range-clustered layout touches fewer files for the same box
  * (measured against Morton in [[graft.ZorderProbe]]).
  *
  * Exists as a native expression because the classic xy2d algorithm
  * is an inherently SEQUENTIAL loop over bit planes with rotate/flip
  * state (x and y are rewritten each iteration): unrolling it into
  * pure Column combinators doubles the expression tree per bit plane,
  * and a Scala UDF would box every row. One fused loop inside
  * whole-stage codegen, interpreted eval mirroring the generated code
  * exactly.
  *
  * `bits` ≤ 31 so the d += s·s·… accumulation stays in a non-negative
  * long (outputs < 4^bits). Coordinates are masked into range, so a
  * caller bug cannot make the loop read sign bits.
  */
case class HilbertCode(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert_d2: bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_d2 expects (bigint, bigint), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val mask = (1L << bits) - 1
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  // freshName for every local: two hilbert_d2 calls in one projection
  // share the generated method, and fixed names collide (see
  // CosineFloat's note — the failure is a silent interpreted fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertCode =
    copy(left = newLeft, right = newRight)
}
