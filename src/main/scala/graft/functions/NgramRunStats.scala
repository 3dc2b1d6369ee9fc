package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the repeated-n-gram statistics behind
  * Gopher's top-n-gram signals, in one fused pass — sorts the string
  * array and scans equal runs, returning
  * `struct(top_count: long, top_chars: long)` where `top_count` is the
  * largest multiplicity of any value (the [[Text.topNgramShare]]
  * numerator) and `top_chars` the largest `count × length` coverage
  * (the [[Text.topNgramCharFraction]] numerator).
  *
  * Exists because the composable form — `aggregate(array_sort(ng), …)`
  * — is a lambda HigherOrderFunction: CodegenFallback, an interpreter
  * frame plus a struct allocation per element, and no subexpression
  * elimination. This expression is one `Arrays.sort` + one scan inside
  * whole-stage codegen; both forms compute identical values (binary
  * UTF8 ordering either way, and run statistics are order-insensitive
  * beyond grouping equal values), so they are interchangeable under
  * the DuckDB oracles. Null elements count toward neither maximum —
  * here the run maxima only update on non-null values, and the fold
  * gives null elements run = 0 explicitly (NgramRunStatsSpec pins the
  * parity, null-element arrays included).
  *
  * Empty or null-sized input yields (0, 0); callers divide by their
  * own denominators and guard zero there.
  */
case class NgramRunStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_run_stats expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_count", LongType, nullable = false),
    StructField("top_chars", LongType, nullable = false)))
  override def prettyName: String = "ngram_run_stats"

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = ad.numElements()
    var bestCount = 0L
    var bestChars = 0L
    if (n > 0) {
      val arr = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        arr(i) = if (ad.isNullAt(i)) null else ad.getUTF8String(i)
        i += 1
      }
      // nulls first, then binary UTF8 order — grouping is all that matters
      java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) =>
        if (a eq null) { if (b eq null) 0 else -1 }
        else if (b eq null) 1
        else a.compareTo(b))
      var run = 0L
      i = 0
      while (i < n) {
        val cur = arr(i)
        if (cur != null && i > 0 && arr(i - 1) != null && cur.equals(arr(i - 1))) run += 1
        else run = 1
        if (cur != null) {
          if (run > bestCount) bestCount = run
          val cover = run * cur.numChars()
          if (cover > bestChars) bestChars = cover
        }
        i += 1
      }
    }
    InternalRow(bestCount, bestChars)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ad => {
      // every local from ctx.freshName — fixed names collide when the
      // expression appears twice in one generated method (the
      // CosineFloat lesson)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val arr = ctx.freshName("arr"); val run = ctx.freshName("run")
      val bestCount = ctx.freshName("bestCount")
      val bestChars = ctx.freshName("bestChars")
      val cur = ctx.freshName("cur"); val cover = ctx.freshName("cover")
      val rowClass = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $n = $ad.numElements();
         |long $bestCount = 0L; long $bestChars = 0L;
         |if ($n > 0) {
         |  $utf8[] $arr = new $utf8[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $arr[$i] = $ad.isNullAt($i) ? null : $ad.getUTF8String($i);
         |  }
         |  // raw Comparator: Janino cannot synthesize the generic bridge
         |  // method a Comparator<UTF8String> anonymous class needs
         |  java.util.Arrays.sort($arr, new java.util.Comparator() {
         |    public int compare(Object ao, Object bo) {
         |      if (ao == null) return bo == null ? 0 : -1;
         |      if (bo == null) return 1;
         |      return (($utf8) ao).compareTo(($utf8) bo);
         |    }
         |  });
         |  long $run = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $utf8 $cur = $arr[$i];
         |    if ($cur != null && $i > 0 && $arr[$i - 1] != null
         |        && $cur.equals($arr[$i - 1])) { $run += 1L; } else { $run = 1L; }
         |    if ($cur != null) {
         |      if ($run > $bestCount) $bestCount = $run;
         |      long $cover = $run * (long) $cur.numChars();
         |      if ($cover > $bestChars) $bestChars = $cover;
         |    }
         |  }
         |}
         |${ev.value} = new $rowClass(new Object[] {
         |  java.lang.Long.valueOf($bestCount), java.lang.Long.valueOf($bestChars) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramRunStats =
    copy(child = newChild)
}
