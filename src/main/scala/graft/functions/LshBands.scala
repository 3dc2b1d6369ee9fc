package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: LSH band hashes of a MinHash signature
  * in one fused loop — slice the k-wide signature into `bands` equal
  * slices and hash each slice by CHAINING xxhash64 over its longs
  * (`h ← xxhash64(v, h)`, seeded per expression), emitting
  * `array<long>` of width `bands`.
  *
  * Exists because the composable form — `transform(sequence(…),
  * b => xxhash64(concat_ws(",", slice(sig, …))))` — is an interpreted
  * lambda that renders every slice to a comma-joined STRING before
  * hashing: ~bands string allocations per document plus per-element
  * interpreter frames, on every doc of the corpus, in the dedup hot
  * path. Here each band is a few chained long-hashes inside
  * whole-stage codegen; no strings, no lambda frames.
  *
  * Band VALUES differ from the string form (different hash input), so
  * swapping forms re-rolls the LSH candidate dice — fine for
  * [[graft.operators.Dedup.minhashNearDups]] because candidates are
  * verified with exact Jaccard (the oracle-checked final pair set is
  * independent of the band family), but the same COMPATIBILITY rule
  * as the signature family applies: banded values persisted under one
  * form never match the other. Slice width is numElements / bands
  * (floor), mirroring the composable form; trailing remainder
  * elements (k not divisible by bands) are ignored by both.
  */
case class LshBands(child: Expression, bands: Int) extends UnaryExpression {
  require(bands >= 1, "need at least 1 band")

  private val Seed = 0x51_7c_c1_b7_27_22_0a_95L // chain seed (fixed, arbitrary)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands expects array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bands"

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val r = ad.numElements() / bands
    // bands > |sig| floors r to 0 and every band hash of every row
    // would be the bare chain seed — the LSH join silently degrades to
    // an all-pairs cross product; fail loudly instead
    if (r == 0) throw new IllegalArgumentException(
      s"lsh_bands: bands=$bands exceeds signature width ${ad.numElements()}")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Seed
      var i = b * r
      val end = i + r
      while (i < end) {
        // null slots hash as 0 (signatures never carry nulls; fixed
        // behavior beats an undefined one for SQL callers)
        val v = if (ad.isNullAt(i)) 0L else ad.getLong(i)
        h = XXH64.hashLong(v, h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ad => {
      val r = ctx.freshName("r"); val b = ctx.freshName("b")
      val i = ctx.freshName("i"); val end = ctx.freshName("end")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $r = $ad.numElements() / $bands;
         |if ($r == 0) {
         |  throw new IllegalArgumentException(
         |    "lsh_bands: bands=$bands exceeds signature width " + $ad.numElements());
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = ${Seed}L;
         |  int $i = $b * $r;
         |  int $end = $i + $r;
         |  for (; $i < $end; $i++) {
         |    long $v = $ad.isNullAt($i) ? 0L : $ad.getLong($i);
         |    $h = $xxh.hashLong($v, $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}
