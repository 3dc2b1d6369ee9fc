package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the d-DIMENSIONAL Hilbert-curve index
  * of d pre-quantized bucket coordinates, each in [0, 2^bits) —
  * [[HilbertCode]]'s generalization past two dimensions, so
  * [[graft.operators.Zorder.writeBest]] can route EVERY dimension
  * count to the locality-better curve instead of falling back to
  * Morton at d ≥ 3. Implements Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * public in-place formulation): undo the excess-work transform over
  * descending bit planes (invert/exchange against axis 0), Gray-encode
  * across axes, apply the parity correction derived from the last
  * axis, then bit-interleave the transposed coordinates (axis 0 owns
  * the most significant bit of each group, exactly
  * [[graft.operators.Zorder.interleave]]'s convention — the transpose
  * IS the Hilbert index read in Morton order).
  *
  * Native for [[HilbertCode]]'s reason: the per-bit-plane loop
  * rewrites every coordinate in place — unrolling into Column
  * combinators multiplies the tree by d per plane, and a UDF boxes
  * every row. One fused loop in whole-stage codegen; interpreted eval
  * mirrors the generated code exactly (HilbertCodeNSpec pins
  * bijection and unit-step adjacency, the properties clustering
  * rides on, plus codegen == interpreted parity).
  *
  * d·bits ≤ 63 so the index fits a non-negative long; coordinates are
  * masked into range so a caller bug cannot feed sign bits into the
  * plane loop. NULL in any coordinate → NULL out.
  */
case class HilbertCodeN(children: Seq[Expression], bits: Int)
    extends Expression {

  private val d = children.length
  require(d >= 2, s"hilbert_dn needs >= 2 dimensions, got $d")
  require(bits >= 1 && d * bits <= 63,
    s"hilbert_dn: d*bits = ${d * bits} must fit a non-negative long (<= 63)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_dn expects all-bigint inputs, got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hilbert_dn"
  override def foldable: Boolean = children.forall(_.foldable)

  /** The shared scalar kernel — interpreted eval calls it directly and
    * the generated code is its line-for-line Java transcription. */
  private def hilbert(xs: Array[Long]): Long = {
    val mask = (1L << bits) - 1
    val x = new Array[Long](d)
    var i = 0
    while (i < d) { x(i) = xs(i) & mask; i = i + 1 }
    // inverse undo (Skilling): descending planes, invert/exchange vs x(0)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < d) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i = i + 1
      }
      q >>= 1
    }
    // Gray encode across axes + parity correction from the last axis
    i = 1
    while (i < d) { x(i) ^= x(i - 1); i = i + 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(d - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < d) { x(i) ^= t; i = i + 1 }
    // transpose → index: interleave, axis 0 most significant per group
    var h = 0L
    var b = 0
    while (b < bits) {
      i = 0
      while (i < d) {
        h |= ((x(i) >> b) & 1L) << (b * d + (d - 1 - i))
        i = i + 1
      }
      b = b + 1
    }
    h
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](d)
    var i = 0
    while (i < d) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i = i + 1
    }
    hilbert(xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    // freshName everywhere: two hilbert_dn calls in one projection
    // share the generated method namespace (the CosineFloat lesson —
    // fixed names silently fall back to interpreted)
    val x = ctx.freshName("x"); val q = ctx.freshName("q")
    val p = ctx.freshName("p"); val t = ctx.freshName("t")
    val h = ctx.freshName("h"); val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val mask = (1L << bits) - 1
    val loads = evals.zipWithIndex.map { case (e, idx) =>
      s"$x[$idx] = ${e.value} & ${mask}L;"
    }.mkString("\n")
    val nullChecks = evals.filter(_.isNull != FalseLiteral)
      .map(e => s"${e.isNull}").mkString(" || ")
    val guard = if (nullChecks.isEmpty) "false" else nullChecks
    val compute =
      s"""
         |long[] $x = new long[$d];
         |$loads
         |for (long $q = 1L << ${bits - 1}; $q > 1; $q >>= 1) {
         |  long $p = $q - 1;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if (($x[$i] & $q) != 0) { $x[0] ^= $p; }
         |    else { long $t = ($x[0] ^ $x[$i]) & $p; $x[0] ^= $t; $x[$i] ^= $t; }
         |  }
         |}
         |for (int $i = 1; $i < $d; $i++) { $x[$i] ^= $x[$i - 1]; }
         |long $t = 0L;
         |for (long $q = 1L << ${bits - 1}; $q > 1; $q >>= 1) {
         |  if (($x[${d - 1}] & $q) != 0) { $t ^= $q - 1; }
         |}
         |for (int $i = 0; $i < $d; $i++) { $x[$i] ^= $t; }
         |long $h = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  for (int $i = 0; $i < $d; $i++) {
         |    $h |= (($x[$i] >> $b) & 1L) << ($b * $d + ($d - 1 - $i));
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""
        |${evals.map(_.code).mkString("\n")}
        |boolean ${ev.isNull} = $guard;
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |$compute
        |}
      """.stripMargin)
    } else {
      ev.copy(code = code"""
        |${evals.map(_.code).mkString("\n")}
        |long ${ev.value} = 0L;
        |$compute
      """.stripMargin, isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertCodeN =
    copy(children = newChildren)
}
