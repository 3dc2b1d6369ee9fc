package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the three per-token quality-battery
  * counts in ONE fused pass — `struct(stop_cnt, alpha_cnt, sum_len)`
  * where `stop_cnt` counts token OCCURRENCES in the fixed stopword
  * set ([[Text.stopwordFraction]]'s numerator), `alpha_cnt` counts
  * tokens containing ≥ 1 ASCII letter ([[Text.alphaTokenFraction]]'s
  * numerator), and `sum_len` is Σ characters
  * ([[Text.meanWordLength]]'s numerator — NULL when any token is
  * null, exactly like the lambda fold where `acc + length(null)`
  * poisons the accumulator).
  *
  * Why native: the composable forms were two `filter` HOFs (one
  * testing 32 equalities per token, one running an `rlike` REGEX per
  * token) plus an `aggregate` fold — all interpreted, three separate
  * walks over every token of every document. Here: one walk, a
  * hash-set probe, a byte scan (A–Za–z are single ASCII bytes; UTF-8
  * continuation bytes are ≥ 0x80, so the byte scan equals the regex),
  * and an int add. The fractions stay Column arithmetic at the
  * caller, unchanged.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  require(stopwords.nonEmpty, "token_stats: empty stopword set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("stop_cnt", IntegerType, nullable = false),
    StructField("alpha_cnt", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = true)))
  override def prettyName: String = "token_stats"

  @transient private lazy val counter = new TokenCounter(stopwords.toArray)

  override def nullSafeEval(input: Any): Any =
    counter.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCounter", counter,
      classOf[TokenCounter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** The compiled single pass (one virtual call per row). */
final class TokenCounter(stopwords: Array[String]) extends Serializable {

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.length * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    var stop = 0
    var alpha = 0
    var sumLen = 0L
    var anyNull = false
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) anyNull = true
      else {
        val t = toks.getUTF8String(i)
        if (stopSet.contains(t)) stop += 1
        // ASCII letter anywhere == rlike("[A-Za-z]"): multi-byte
        // UTF-8 sequences never contain bytes < 0x80
        val bytes = t.numBytes()
        var j = 0
        var hasAlpha = false
        while (j < bytes && !hasAlpha) {
          val b = t.getByte(j)
          hasAlpha = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
          j += 1
        }
        if (hasAlpha) alpha += 1
        sumLen += t.numChars()
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](stop, alpha, if (anyNull) null else java.lang.Long.valueOf(sumLen)))
  }
}
