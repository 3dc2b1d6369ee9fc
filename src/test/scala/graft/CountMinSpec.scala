package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** Count-Min sketch contracts: the one-sided estimate, the ε·N error
  * budget, merge-invariance across partition layouts (the property
  * that makes the partial-aggregate exchange correct), and the
  * runtime certificate's failure mode under engineered collisions. */
class CountMinSpec extends SparkSpec {

  private def df(vals: Seq[String]) = {
    val s = spark
    import s.implicits._
    vals.toDF("k")
  }

  private val stream: Seq[String] =
    Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++ Seq.fill(10)("gamma") ++
      (1 to 25).map(i => s"tail$i")

  test("never underestimates; every estimate within exact + e/width*N") {
    val sk = CountMin.sketch(df(stream), "k", width = 64, depth = 4)
    assert(sk.n == stream.size)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) =>
      val est = sk.estimate(k)
      assert(est >= n, s"$k: est $est < exact $n")
      assert(est <= n + sk.errorBound, s"$k: est $est blows bound ${sk.errorBound}")
    }
    // unseen key: pure collision mass, still inside the budget
    assert(sk.estimate("never-seen") <= sk.errorBound)
  }

  test("merge-invariance: counters identical across partition layouts") {
    val one = CountMin.sketch(df(stream).coalesce(1), "k", width = 32, depth = 3)
    val many = CountMin.sketch(df(stream).repartition(7), "k", width = 32, depth = 3)
    // counters are LINEAR in the input, so any merge tree yields the
    // same table entry-wise — not just the same estimates
    assert(one.counts.toSeq == many.counts.toSeq)
    assert(one.n == many.n)
  }

  test("probeCountsChecked returns the exact groupBy counts") {
    val items = df(stream)
    val probe = df(Seq("alpha", "gamma", "tail3", "never-seen"))
    val got = CountMin.probeCountsChecked(items, "k", probe, width = 256, depth = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("alpha", 40L), ("gamma", 10L), ("tail3", 1L)))
  }

  test("certificate throws on an engineered total collision") {
    // find two keys that collide in EVERY row at width 4 — then pile
    // mass on one so the other's estimate blows exact + e/width*N
    val depth = 4
    val width = 4
    val cand = (1 to 4000).map(i => s"k$i")
    val sig = (k: String) => (0 until depth).map(CountMin.bucket(k, _, width))
    val bySig = cand.groupBy(sig).values.find(_.size >= 2).get
    val (light, heavy) = (bySig(0), bySig(1))
    // stream: heavy x90 + light x1 + spread x9 → N=100, bound = e/4*100 ≈ 68;
    // est(light) ≥ 91 > 1 + 68 → the bracket check must throw
    val items = df(Seq.fill(90)(heavy) ++ Seq(light) ++ (1 to 9).map(i => s"s$i"))
    val ex = intercept[IllegalStateException] {
      CountMin.probeCountsChecked(items, "k", df(Seq(light)), width, depth)
    }
    assert(ex.getMessage.contains("out of bracket"))
  }
}
