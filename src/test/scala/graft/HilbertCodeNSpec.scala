package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumn
import graft.functions.HilbertCodeN

/** Pins the d-dimensional Hilbert expression ([[functions
  * .HilbertCodeN]], Skilling transpose algorithm) on the properties
  * clustering rides on: BIJECTION over the full grid (every index in
  * [0, 2^(d·bits)) hit exactly once) and UNIT-STEP ADJACENCY
  * (consecutive curve positions differ by exactly 1 in exactly one
  * coordinate — the property Morton lacks and the reason a box cuts
  * the curve into few long runs), at d = 2, 3 and 4; plus the
  * null/mask/registration edges and parity between the codegen
  * projection path and direct interpreted eval.
  */
class HilbertCodeNSpec extends SparkSpec {

  private def curve(d: Int, bits: Int): Map[Long, Seq[Long]] = {
    val s = spark
    import s.implicits._
    val n = 1L << bits
    val cells = (0L until math.round(math.pow(n.toDouble, d))
        .toLong).map { idx =>
      (0 until d).map(i =>
        (idx / math.round(math.pow(n.toDouble, d - 1 - i)).toLong) % n)
    }
    val df = cells.map(c => Tuple1(c)).toDF("c")
    val cols = (0 until d).map(i => col("c").getItem(i).cast("long"))
    df.select(col("c"),
        GraftColumn.of(HilbertCodeN(cols.map(GraftColumn.expr), bits)).as("h"))
      .collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](0).toSeq).toMap
  }

  for ((d, bits) <- Seq((2, 4), (3, 3), (4, 2)))
    test(s"bijection + unit-step adjacency on the full ${d}D grid at bits=$bits") {
      val byIdx = curve(d, bits)
      val total = math.round(math.pow((1L << bits).toDouble, d)).toLong
      assert(byIdx.size == total, s"not a bijection: ${byIdx.size} of $total")
      assert(byIdx.keys.min == 0L && byIdx.keys.max == total - 1)
      (0L until total - 1).foreach { h =>
        val (a, b) = (byIdx(h), byIdx(h + 1))
        val diff = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(diff == 1,
          s"curve jumps between h=$h $a and h=${h + 1} $b (L1 = $diff)")
      }
    }

  test("interpreted eval matches the codegen projection path") {
    val s = spark
    import s.implicits._
    val rows = for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield (x, y, z)
    val viaQuery = rows.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"), GraftColumn.of(HilbertCodeN(
        Seq(GraftColumn.expr(col("x")), GraftColumn.expr(col("y")),
          GraftColumn.expr(col("z"))), 3)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    val lit3 = (v: Long) => org.apache.spark.sql.catalyst.expressions
      .Literal(v, org.apache.spark.sql.types.LongType)
    rows.foreach { case (x, y, z) =>
      val direct = HilbertCodeN(Seq(lit3(x), lit3(y), lit3(z)), 3)
        .eval(null).asInstanceOf[Long]
      assert(viaQuery((x, y, z)) == direct,
        s"codegen/interpreted divergence at ($x,$y,$z)")
    }
  }

  test("edges: null propagates, out-of-range coords are masked, SQL registered, bad arity refused") {
    val s = spark
    import s.implicits._
    val r = Seq((Option.empty[Long], 1L, 2L)).toDF("x", "y", "z")
      .select(GraftColumn.of(HilbertCodeN(Seq(GraftColumn.expr(col("x")),
        GraftColumn.expr(col("y")), GraftColumn.expr(col("z"))), 3)))
      .collect()(0)
    assert(r.isNullAt(0), "null coordinate must yield null")
    // coords masked into [0, 2^bits): 8+1 behaves as 1 at bits=3
    val lit3 = (v: Long) => org.apache.spark.sql.catalyst.expressions
      .Literal(v, org.apache.spark.sql.types.LongType)
    assert(HilbertCodeN(Seq(lit3(9L), lit3(2L), lit3(3L)), 3).eval(null) ==
      HilbertCodeN(Seq(lit3(1L), lit3(2L), lit3(3L)), 3).eval(null))
    val viaSql = spark.sql("SELECT hilbert_dn(5L, 3L, 6L, 3)")
      .collect()(0).getLong(0)
    assert(viaSql == HilbertCodeN(Seq(lit3(5L), lit3(3L), lit3(6L)), 3)
      .eval(null).asInstanceOf[Long])
    intercept[IllegalArgumentException](HilbertCodeN(Seq(lit3(1L)), 8))
    // d*bits boundary: 3×21 = 63 fits, 3×22 = 66 does not
    HilbertCodeN(Seq(lit3(1L), lit3(2L), lit3(3L)), 21)
    intercept[IllegalArgumentException](
      HilbertCodeN(Seq(lit3(1L), lit3(2L), lit3(3L)), 22))
    ()
  }

  test("d=2 N-ary form is also a valid hilbert curve (same properties as hilbert_d2)") {
    // NOT pinned equal to hilbert_d2's xy2d variant — different valid
    // orientations of the same curve family are fine; what clustering
    // needs is bijection + adjacency, pinned above. This pins that the
    // two-dim N-ary entry doesn't accidentally degrade to Morton:
    // Morton's (1,1)->(2,0) style jumps have L1 > 1 and would fail.
    val byIdx = curve(2, 3)
    assert(byIdx.size == 64)
    (0L until 63L).foreach { h =>
      val diff = byIdx(h).zip(byIdx(h + 1))
        .map { case (x, y) => math.abs(x - y) }.sum
      assert(diff == 1)
    }
  }
}
