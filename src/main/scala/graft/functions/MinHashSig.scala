package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the full k-wide MinHash signature of a
  * shingle array in ONE fused loop — `sig[i] = min over shingles of
  * h_i(shingle)` where the k hash functions are Carter–Wegman
  * derivations `h_i = h1 + i·h2` of two seeded xxhash64 values (h2
  * forced odd so the step permutes Z/2^64; the same affine-derivation
  * family Spark's own ml `MinHashLSH` uses over one base hash).
  *
  * Exists because the aggregate formulation — explode shingles, then
  * k `min(xxhash64(sh, seed_i))` aggregates — hashes every shingle k
  * times (k × |doc| full string hashes) and pays an exchange to
  * reassemble per-document rows. This expression hashes each shingle
  * TWICE, derives the other k − 2 values with an add, and computes the
  * whole signature map-side in the scan projection. Candidate recall
  * is equivalent in expectation (2-universal family either way); the
  * exact-Jaccard verification join downstream makes the FINAL pair set
  * independent of the signature family, which is what the
  * q33/q69/q75/q80 oracles hash-check.
  *
  * Returns `struct(n_sh: long, sig: array<long>)` — the shingle-set
  * size rides along so the caller's projection references the (HOF-
  * built, expensive) shingle array exactly ONCE; two top-level
  * references would let CollapseProject duplicate the whole
  * interpreted shingle tree per row. `n_sh` counts only NON-NULL
  * elements (the ones that contributed hashes), so empty and all-null
  * input both yield n_sh = 0 with an all-Long.MaxValue signature —
  * callers filter n_sh = 0 AFTER the aggregation barrier (an
  * all-identical sentinel signature would band-collide every
  * degenerate document with every other one).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2, "need at least 2 signature rows")

  private val Seed1 = 42L
  private val Seed2 = 0x9e3779b97f4a7c15L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_sh", LongType, nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    // n_sh counts only elements that CONTRIBUTED to the signature —
    // null slots neither hash nor count, so an all-null array reports
    // n_sh = 0 and is dropped by the caller's n_sh > 0 filter instead
    // of surviving with the sentinel signature (which would
    // band-collide with every other degenerate doc)
    var nn = 0L
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        nn += 1L
        val s = ad.getUTF8String(i)
        val h1 = XXH64.hashUTF8String(s, Seed1)
        val h2 = XXH64.hashUTF8String(s, Seed2) | 1L
        var j = 0
        var c = h1
        while (j < k) {
          if (c < mins(j)) mins(j) = c
          c += h2
          j += 1
        }
      }
      i += 1
    }
    InternalRow(nn, new GenericArrayData(mins))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ad => {
      // every local from ctx.freshName (the CosineFloat lesson)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val mins = ctx.freshName("mins")
      val s = ctx.freshName("s"); val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2"); val c = ctx.freshName("c")
      val nn = ctx.freshName("nn")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val rowClass = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      s"""
         |int $n = $ad.numElements();
         |long $nn = 0L;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$ad.isNullAt($i)) {
         |    $nn += 1L;
         |    org.apache.spark.unsafe.types.UTF8String $s = $ad.getUTF8String($i);
         |    long $h1 = $xxh.hashUTF8String($s, ${Seed1}L);
         |    long $h2 = $xxh.hashUTF8String($s, ${Seed2}L) | 1L;
         |    long $c = $h1;
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($c < $mins[$j]) $mins[$j] = $c;
         |      $c += $h2;
         |    }
         |  }
         |}
         |${ev.value} = new $rowClass(new Object[] {
         |  java.lang.Long.valueOf($nn), new $gad($mins) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
