package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the trained-ANN hot paths (IVF / PQ /
  * IVFADC): centroid similarity scan, PQ subspace encoding, ADC inner
  * product, and the residual projection.
  *
  * Why native: the composable spellings
  * (`transform`/`zip_with`/`aggregate` over a `typedlit` matrix — see
  * the `*Ref` reference forms kept beside each call site) are
  * HigherOrderFunctions, which whole-stage codegen cannot compile —
  * every row pays interpreted lambda frames and per-element boxing,
  * k×dim (or m×k×sub) times. These kernels are one fused primitive
  * loop per row over a driver-built flat double[] (entered into
  * codegen as a referenced object, the [[PhraseHits]]/[[CompressRatio]]
  * pattern), bit-identical to the reference forms: same element
  * order, same double accumulation order, same first-wins tie breaks
  * (AnnKernelsSpec pins equality on the real corpus plus adversarial
  * tie/zero-vector fixtures).
  *
  * All kernels accept `array<float>` or `array<double>` input vectors
  * (training runs on pre-cast doubles, the corpus scan on raw floats);
  * elements are read as double exactly like the reference's
  * `.cast("double")`.
  */
private[graft] object AnnKernels {
  /** Flatten a centroid/codebook matrix driver-side. */
  def flat2(m: Seq[Seq[Double]]): Array[Double] = m.flatten.toArray
  def flat3(m: Seq[Seq[Seq[Double]]]): Array[Double] =
    m.flatten.flatten.toArray

  def isVecArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** One compiled kernel instance: the matrix as a flat row-major
  * double[] plus the vector element accessor. Shared by interpreted
  * eval and codegen (one virtual call per row). `k` is the per-subspace
  * code count (PQ kernels only; 0 elsewhere). */
final class AnnKernel(mat: Array[Double], rows: Int, cols: Int,
    isFloat: Boolean, k: Int = 0) extends Serializable {

  @inline private def at(v: ArrayData, i: Int): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Cosine sims of `vec` to every (pre-normalized) centroid row:
    * nv = sqrt(Σ v²) once (over the FULL vector, the reference's
    * `zip_with(vec, vec)` length), then dot(row, vec)/nv per row
    * (0.0 rows on zero-norm input) — the [[graft.operators.Ivf]]
    * sims order. */
  def sims(vec: ArrayData): ArrayData = {
    val vLen = vec.numElements()
    val n = math.min(cols, vLen)
    var nv = 0.0
    var i = 0
    while (i < vLen) { val x = at(vec, i); nv += x * x; i += 1 }
    nv = math.sqrt(nv)
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      if (nv != 0.0) {
        var dot = 0.0
        var d = 0
        val off = r * cols
        while (d < n) { dot += mat(off + d) * at(vec, d); d += 1 }
        out(r) = dot / nv
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  /** PQ codes of `vec` under `m` subspace codebooks (matrix rows =
    * m·k, row width = sub): per subspace, argmin of squared L2 to the
    * k codes, first-wins ties — [[graft.operators.Pq.encode]]'s
    * `array_position(array_min)` semantics. */
  def encode(vec: ArrayData): ArrayData = {
    val m = rows / k
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        var dist = 0.0
        var d = 0
        val off = (j * k + c) * cols
        val voff = j * cols
        while (d < cols) {
          val diff = mat(off + d) - at(vec, voff + d)
          dist += diff * diff
          d += 1
        }
        if (dist < best) { best = dist; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC inner product: Σ_j dot(codebook_j[codes_j], q_j) with the
    * reference's left-to-right accumulation (outer j ascending, inner
    * dims ascending, each subspace summed before joining the outer
    * accumulator) — [[graft.operators.Pq.adcDot]]'s order. */
  def adcDot(qvec: ArrayData, codes: ArrayData): Double = {
    val m = rows / k
    var acc = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      val off = (j * k + code) * cols
      val qoff = j * cols
      var inner = 0.0
      var d = 0
      while (d < cols) { inner += mat(off + d) * at(qvec, qoff + d); d += 1 }
      acc += inner
      j += 1
    }
    acc
  }

  /** Residual `vec − centroid[cluster]` (element order preserved) —
    * [[graft.operators.IvfPq]]'s residual projection. */
  def residual(vec: ArrayData, cluster: Int): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Double](n)
    val off = cluster * cols
    var d = 0
    while (d < n) { out(d) = at(vec, d) - mat(off + d); d += 1 }
    new GenericArrayData(out)
  }
}

/** Array of cosine similarities from a vector to every centroid of a
  * FIXED (pre-normalized) centroid matrix. */
case class CentroidSims(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "centroid_sims: empty centroid set")
  private val dim = centroids.head.size
  require(centroids.forall(_.size == dim),
    "centroid_sims: ragged centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    if (AnnKernels.isVecArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"centroid_sims expects array<float|double>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_sims"

  @transient private lazy val kernel = new AnnKernel(
    AnnKernels.flat2(centroids), centroids.size, dim,
    AnnKernels.isFloatArray(child.dataType))

  override def nullSafeEval(input: Any): Any =
    kernel.sims(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("annKernel", kernel, classOf[AnnKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sims($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidSims =
    copy(child = newChild)
}

/** PQ subspace codes of a vector under FIXED codebooks (m × k × sub). */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty, "pq_encode: empty codebooks")
  private val k = codebooks.head.size
  private val sub = codebooks.head.head.size
  require(codebooks.forall(cb => cb.size == k && cb.forall(_.size == sub)),
    "pq_encode: ragged codebooks")

  override def checkInputDataTypes(): TypeCheckResult =
    if (AnnKernels.isVecArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val kernel = new AnnKernel(
    AnnKernels.flat3(codebooks), codebooks.size * k, sub,
    AnnKernels.isFloatArray(child.dataType), k)

  override def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("annKernel", kernel, classOf[AnnKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC inner product of a float/double query against PQ codes under
  * FIXED codebooks. */
case class AdcDotExpr(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  require(codebooks.nonEmpty, "adc_dot: empty codebooks")
  private val k = codebooks.head.size
  private val sub = codebooks.head.head.size
  require(codebooks.forall(cb => cb.size == k && cb.forall(_.size == sub)),
    "adc_dot: ragged codebooks")

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (AnnKernels.isVecArray(left.dataType) && codesOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"adc_dot expects (array<float|double>, array<int>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dot"

  @transient private lazy val kernel = new AnnKernel(
    AnnKernels.flat3(codebooks), codebooks.size * k, sub,
    AnnKernels.isFloatArray(left.dataType), k)

  override def nullSafeEval(q: Any, codes: Any): Any =
    kernel.adcDot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("annKernel", kernel, classOf[AnnKernel].getName)
    defineCodeGen(ctx, ev, (q, c) => s"$ref.adcDot($q, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Residual `vec − centroids[cluster]` under a FIXED centroid matrix. */
case class CentroidResidual(left: Expression, right: Expression,
    centroids: Seq[Seq[Double]]) extends BinaryExpression {

  require(centroids.nonEmpty, "centroid_residual: empty centroid set")
  private val dim = centroids.head.size
  require(centroids.forall(_.size == dim),
    "centroid_residual: ragged centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult = {
    val clusterOk = right.dataType == IntegerType
    if (AnnKernels.isVecArray(left.dataType) && clusterOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"centroid_residual expects (array<float|double>, int), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_residual"

  @transient private lazy val kernel = new AnnKernel(
    AnnKernels.flat2(centroids), centroids.size, dim,
    AnnKernels.isFloatArray(left.dataType))

  override def nullSafeEval(vec: Any, cluster: Any): Any =
    kernel.residual(vec.asInstanceOf[ArrayData], cluster.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("annKernel", kernel, classOf[AnnKernel].getName)
    defineCodeGen(ctx, ev, (v, c) => s"$ref.residual($v, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}
