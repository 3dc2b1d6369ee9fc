package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the SQ8 scalar-quantization hot paths
  * ([[graft.operators.Quantize]]): uint8 encode and affine decode in
  * one fused primitive loop per row.
  *
  * Why native: the composable forms — `transform(vec, x =>
  * round((x−mn)/s, 0).cast("int"))` and `transform(codes, c =>
  * mn + c*s)` — are HigherOrderFunctions (interpreted lambda frame +
  * boxing per ELEMENT, dim times per corpus vector, and the decode
  * site composed a second `transform` just to cast to float). The
  * kernels run inside whole-stage codegen as one referenced-object
  * call per row (the [[AnnKernels]] pattern) and are BIT-IDENTICAL to
  * the composable forms (Sq8KernelsSpec pins equality on the real
  * corpus): same `round(…, 0)` HALF_UP decimal rounding (Spark's
  * Round on DoubleType — BigDecimal.valueOf + setScale), same
  * all-zeros arm for scale == 0 (null slots included: the lambda
  * ignores its element there), same per-element null propagation (a
  * null element, mn or s nulls THAT element, never the array — only a
  * NULL input array yields NULL).
  */
private[graft] object Sq8Kernels {
  def isVecArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** The compiled loops (one virtual call per row from generated code).
  * `mn`/`s` arrive with explicit null flags so per-element null
  * propagation matches the lambda forms exactly. */
final class Sq8Kernel(isFloat: Boolean, toFloat: Boolean) extends Serializable {

  @inline private def at(v: ArrayData, i: Int): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Spark Round(_, 0) on DoubleType: NaN/Infinity pass through,
    * otherwise decimal HALF_UP via BigDecimal.valueOf. */
  @inline private def roundHalfUp(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def encode(vec: ArrayData, mnNull: Boolean, mn: Double,
      sNull: Boolean, s: Double): ArrayData = {
    val n = vec.numElements()
    val out = new Array[AnyRef](n)
    if (!sNull && s == 0.0) {
      // the when(s === 0.0) arm: all zeros, null slots included (the
      // constant lambda never reads its element)
      val zero = java.lang.Integer.valueOf(0)
      var i = 0
      while (i < n) { out(i) = zero; i += 1 }
    } else {
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i) && !mnNull && !sNull) {
          val r = roundHalfUp((at(vec, i) - mn) / s)
          // ANSI double→int cast bounds (never hit by real codes 0..255)
          if (java.lang.Double.isNaN(r) || r < Int.MinValue || r > Int.MaxValue)
            throw new ArithmeticException(
              s"sq8_encode: code $r overflows INT (ANSI cast)")
          out(i) = java.lang.Integer.valueOf(r.toInt)
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  def decode(codes: ArrayData, mnNull: Boolean, mn: Double,
      sNull: Boolean, s: Double): ArrayData = {
    val n = codes.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!codes.isNullAt(i) && !mnNull && !sNull) {
        val v = mn + codes.getInt(i).toDouble * s
        out(i) =
          if (toFloat) java.lang.Float.valueOf(v.toFloat)
          else java.lang.Double.valueOf(v)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[graft] trait Sq8Expr extends TernaryExpression {
  def first: Expression
  def second: Expression
  def third: Expression
  protected def kernel: Sq8Kernel
  protected def kernelMethod: String

  override def nullable: Boolean = first.nullable

  // only a NULL input ARRAY nulls the result; a null mn/s nulls
  // ELEMENTS (the lambda forms' propagation) — so eval/codegen handle
  // child nulls manually instead of TernaryExpression's all-or-nothing
  override def eval(input: InternalRow): Any = {
    val v = first.eval(input)
    if (v == null) null
    else {
      val m = second.eval(input)
      val s = third.eval(input)
      val mN = m == null; val sN = s == null
      val mV = if (mN) 0.0 else m.asInstanceOf[Double]
      val sV = if (sN) 0.0 else s.asInstanceOf[Double]
      val ad = v.asInstanceOf[ArrayData]
      if (kernelMethod == "encode") kernel.encode(ad, mN, mV, sN, sV)
      else kernel.decode(ad, mN, mV, sN, sV)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Kernel", kernel, classOf[Sq8Kernel].getName)
    val v = first.genCode(ctx); val m = second.genCode(ctx)
    val s = third.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      v.code + m.code + s.code +
        code"""
          |boolean ${ev.isNull} = ${v.isNull};
          |$javaType ${ev.value} = ${ev.isNull} ? null :
          |  $ref.$kernelMethod(${v.value}, ${m.isNull}, ${m.value},
          |    ${s.isNull}, ${s.value});
        """.stripMargin)
  }
}

/** uint8 codes of a float/double vector under per-row (mn, scale) —
  * [[graft.operators.Quantize.codes]]' native form. */
case class Sq8Encode(first: Expression, second: Expression,
    third: Expression) extends Sq8Expr {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Sq8Kernels.isVecArray(first.dataType) &&
        second.dataType == DoubleType && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq8_encode expects (array<float|double>, double, double), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "sq8_encode"

  @transient protected lazy val kernel =
    new Sq8Kernel(Sq8Kernels.isFloatArray(first.dataType), toFloat = false)
  protected def kernelMethod: String = "encode"

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Sq8Encode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Affine reconstruction mn + code·scale of uint8 codes —
  * [[graft.operators.Quantize.dequantize]]'s native form; `toFloat`
  * fuses the probe path's trailing `transform(_, cast float)`. */
case class Sq8Decode(first: Expression, second: Expression,
    third: Expression, toFloat: Boolean = false) extends Sq8Expr {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = first.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (codesOk && second.dataType == DoubleType && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq8_decode expects (array<int>, double, double), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  }

  override def dataType: DataType =
    ArrayType(if (toFloat) FloatType else DoubleType, containsNull = true)
  override def prettyName: String = "sq8_decode"

  @transient protected lazy val kernel = new Sq8Kernel(isFloat = false, toFloat)
  protected def kernelMethod: String = "decode"

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Sq8Decode =
    copy(first = newFirst, second = newSecond, third = newThird)
}
