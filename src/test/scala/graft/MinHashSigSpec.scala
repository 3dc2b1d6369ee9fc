package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.MinHashSig

/** Contracts for the native minhash_sig expression: its fused loop
  * must equal a straight-line Scala reference of the same
  * Carter–Wegman family (h_i = h1 + i·h2 over two seeded xxhash64),
  * nulls contribute nothing, and empty input yields the (0, sentinel)
  * struct callers filter on.
  */
class MinHashSigSpec extends SparkSpec {

  private val K = 16

  private def refSig(shingles: Seq[String]): (Long, Seq[Long]) = {
    val mins = Array.fill(K)(Long.MaxValue)
    shingles.filter(_ != null).foreach { s =>
      val u = UTF8String.fromString(s)
      val h1 = XXH64.hashUTF8String(u, 42L)
      val h2 = XXH64.hashUTF8String(u, 0x9e3779b97f4a7c15L) | 1L
      var c = h1
      (0 until K).foreach { j =>
        if (c < mins(j)) mins(j) = c
        c += h2
      }
    }
    (shingles.count(_ != null).toLong, mins.toSeq)
  }

  private def sparkSig(cases: Seq[Seq[String]]): Seq[(Long, Seq[Long])] = {
    val s = spark
    import s.implicits._
    cases.map(Tuple1(_)).toDF("sh")
      .select(GraftColumn.of(MinHashSig(GraftColumn.expr(col("sh")), K)).as("ms"))
      .select(col("ms.n_sh"), col("ms.sig"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .toSeq
  }

  test("fused signature == straight-line reference, nulls skipped") {
    val cases = Seq(
      Seq("a b c"),
      Seq("a b c", "b c d", "c d e"),
      Seq("", "x"),                       // empty-string shingle is a value
      Seq("a", null, "a"),                // nulls contribute nothing
      (1 to 500).map(i => s"sh $i token")
    )
    sparkSig(cases).zip(cases).foreach { case ((n, sig), c) =>
      val (refN, refMins) = refSig(c)
      assert(n == refN, s"n_sh $n != $refN (non-null count) on $c")
      assert(sig == refMins, s"signature mismatch on $c")
    }
  }

  test("all-null input yields n_sh = 0 (sentinel docs get filtered, not banded)") {
    val Seq((n, sig)) = sparkSig(Seq(Seq(null.asInstanceOf[String], null)))
    assert(n == 0L && sig.forall(_ == Long.MaxValue))
  }

  test("empty input yields n_sh = 0 and the all-sentinel signature") {
    val Seq((n, sig)) = sparkSig(Seq(Seq.empty[String]))
    assert(n == 0L && sig.forall(_ == Long.MaxValue))
  }

  test("property: random shingle arrays match the reference (seeded)") {
    import org.scalacheck.Gen
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(24)),
      Gen.oneOf("a b", "b c", "", "ü ö")))
    val cases = (1 to 40).flatMap(i =>
      gen(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
      .map(_.toSeq)
    sparkSig(cases).zip(cases).foreach { case ((_, sig), c) =>
      assert(sig == refSig(c)._2, s"property mismatch on $c")
    }
  }

  test("SQL registration: minhash_sig(sh, k) resolves via graft.Session") {
    val s = spark
    import s.implicits._
    val r = Seq(Tuple1(Seq("a b", "b c"))).toDF("sh")
      .selectExpr("minhash_sig(sh, 16) AS ms")
      .select(col("ms.n_sh")).head()
    assert(r.getLong(0) == 2L)
  }
}
