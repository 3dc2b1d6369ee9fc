package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the positioned-string reassembly behind
  * [[Text.positionedConcat]] — sort an `array<struct<pos, piece>>` by
  * (pos, piece) and space-join the pieces, in one fused pass.
  *
  * Why native: the composable form — `array_join(transform(array_sort(
  * structs), _.getField("piece")), " ")` — runs two HigherOrderFunction
  * passes interpreted per row (array_sort's comparator is an
  * interpreted ordering; transform adds a lambda frame + struct-field
  * walk per element), over arrays sized by each document's token
  * count, TWICE per document in the span-corruption/MLM reassembly
  * queries. Here the sort is one `Arrays.sort` over an index-free
  * struct array with a primitive comparator, and the join writes
  * straight through `UTF8String.concatWs`.
  *
  * Parity with the composable form (PositionedConcatSpec pins it):
  * struct elements compare field-by-field — pos ascending, then piece
  * in UTF8 binary order with null-first (array_sort's default struct
  * ordering) — null STRUCT elements sort last (array_sort's null
  * placement), and null pieces are skipped by the join exactly like
  * `array_join`'s default. Empty input joins to ""; NULL input is
  * NULL (unreachable from collect_list, which returns empty, but the
  * expression stays total).
  */
case class PositionedConcat(child: Expression) extends UnaryExpression {

  private def posType: DataType = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 => fields(0).dataType
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 &&
          (fields(0).dataType == IntegerType || fields(0).dataType == LongType) &&
          fields(1).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"positioned_concat expects array<struct<pos: int|bigint, piece: string>>, " +
        s"got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "positioned_concat"

  @transient private lazy val joiner =
    new PositionedJoiner(posType == LongType)

  override def nullSafeEval(input: Any): Any =
    joiner.join(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("posJoiner", joiner,
      classOf[PositionedJoiner].getName)
    defineCodeGen(ctx, ev, c => s"$ref.join($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PositionedConcat =
    copy(child = newChild)
}

/** The compiled sort+join pass (one virtual call per row). */
final class PositionedJoiner(posIsLong: Boolean) extends Serializable {

  @transient private lazy val space = UTF8String.fromString(" ")

  def join(structs: ArrayData): UTF8String = {
    val n = structs.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    // (pos, piece) pairs; null struct elements carry a null marker and
    // sort LAST (array_sort's null placement)
    val pos = new Array[Long](n)
    val piece = new Array[UTF8String](n)
    val isNullStruct = new Array[Boolean](n)
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) {
      idx(i) = i
      if (structs.isNullAt(i)) isNullStruct(i) = true
      else {
        val row = structs.getStruct(i, 2)
        pos(i) = if (row.isNullAt(0)) Long.MinValue
          else if (posIsLong) row.getLong(0) else row.getInt(0).toLong
        piece(i) = if (row.isNullAt(1)) null else row.getUTF8String(1)
      }
      i += 1
    }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      def compare(ao: Integer, bo: Integer): Int = {
        val a = ao.intValue(); val b = bo.intValue()
        if (isNullStruct(a)) { if (isNullStruct(b)) 0 else 1 }
        else if (isNullStruct(b)) -1
        else {
          val c = java.lang.Long.compare(pos(a), pos(b))
          if (c != 0) c
          else {
            val pa = piece(a); val pb = piece(b)
            if (pa eq null) { if (pb eq null) 0 else -1 }
            else if (pb eq null) 1
            else pa.compareTo(pb)
          }
        }
      }
    })
    val ordered = new Array[UTF8String](n)
    i = 0
    while (i < n) {
      val j = idx(i).intValue()
      // a null struct projects a null piece; concatWs skips both
      ordered(i) = if (isNullStruct(j)) null else piece(j)
      i += 1
    }
    UTF8String.concatWs(space, ordered: _*)
  }
}
