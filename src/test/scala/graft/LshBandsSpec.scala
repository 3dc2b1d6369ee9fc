package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.expressions.XXH64
import graft.functions.LshBands

/** Contracts for the native lsh_bands expression: band hashes equal a
  * straight-line chained-xxhash64 reference, remainder elements beyond
  * bands × (k/bands) are ignored (mirroring the slice arithmetic of
  * the composable form it replaced), and distinct slices yield
  * distinct band hashes (the equi-join discriminator).
  */
class LshBandsSpec extends SparkSpec {

  private val Seed = 0x51_7c_c1_b7_27_22_0a_95L

  private def refBands(sig: Seq[Long], bands: Int): Seq[Long] = {
    val r = sig.length / bands
    (0 until bands).map { b =>
      sig.slice(b * r, b * r + r).foldLeft(Seed)((h, v) => XXH64.hashLong(v, h))
    }
  }

  private def sparkBands(cases: Seq[Seq[Long]], bands: Int): Seq[Seq[Long]] = {
    val s = spark
    import s.implicits._
    cases.map(Tuple1(_)).toDF("sig")
      .select(GraftColumn.of(LshBands(GraftColumn.expr(col("sig")), bands)).as("b"))
      .collect().map(_.getSeq[Long](0)).toSeq
  }

  test("fused band hashes == straight-line reference") {
    val cases = Seq(
      (1L to 64L).toSeq,                     // the k=64 production shape
      Seq.fill(64)(7L),                      // identical slices → identical hashes
      (1L to 67L).toSeq                      // remainder elements ignored
    )
    sparkBands(cases, 16).zip(cases).foreach { case (got, c) =>
      assert(got == refBands(c, 16), s"band mismatch on $c")
    }
    // extreme values at a width the 4-element sig supports
    assert(sparkBands(Seq(Seq(Long.MinValue, Long.MaxValue, 0L, -1L)), 4).head ==
      refBands(Seq(Long.MinValue, Long.MaxValue, 0L, -1L), 4))
    // remainder check explicitly: 67 elements at 16 bands == first 64
    assert(sparkBands(Seq((1L to 67L).toSeq), 16).head ==
      sparkBands(Seq((1L to 64L).toSeq), 16).head)
  }

  test("bands wider than the signature fail loudly, never band-collide") {
    // r = |sig|/bands floored to 0 would hash every band of every doc
    // to the bare chain seed — an all-pairs LSH join; the expression
    // throws instead
    val e = intercept[Exception] { sparkBands(Seq(Seq(1L, 2L)), 16) }
    assert(e.getMessage != null)
  }

  test("SQL registration: lsh_bands(sig, bands) resolves via graft.Session") {
    val s = spark
    import s.implicits._
    val r = Seq(Tuple1((1L to 64L).toSeq)).toDF("sig")
      .selectExpr("lsh_bands(sig, 16) AS b")
      .head().getSeq[Long](0)
    assert(r == refBands((1L to 64L).toSeq, 16))
  }

  test("distinct slices discriminate, identical slices collide") {
    val a = (1L to 64L).toSeq
    val b = a.updated(3, 999L)               // differs only inside band 0
    val Seq(ba, bb) = sparkBands(Seq(a, b), 16)
    assert(ba.head != bb.head, "changed slice must change its band hash")
    assert(ba.tail == bb.tail, "untouched slices must keep their band hashes")
  }
}
