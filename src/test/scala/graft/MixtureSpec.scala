package graft

import graft.operators.Mixture

/** DoReMi EG-step mixture reweighting ([[operators.Mixture]]): exact
  * micro-nat domain statistics on a hand corpus, the
  * hard-domains-gain-weight direction, η=0 degeneracy to uniform, and
  * the weight normalization contract.
  */
class MixtureSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // domain A: 3 docs of a common token (easy); domain B: 1 doc of 4
  // singletons (hard). tf: x=12, y/z/w/q=1 each; T=16.
  // lp(x)  = round(ln(12/16)·1e6) = -287682
  // lp(y…) = round(ln(1/16)·1e6)  = -2772589
  // A: 12 tokens, lp_sum=-3452184 → mean_nll = 0.287682
  // B:  4 tokens, lp_sum=-11090356 → mean_nll = 2.772589
  // overall: -14542540/16 → 0.90890875
  private val docs = Seq(
    ("A", "x x x x"), ("A", "x x x x"), ("A", "x x x x"),
    ("B", "y z w q")).toDF("dom", "text")

  private def rows(eta: Double) =
    Mixture.doremiStep(docs, "text", "dom", eta).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap

  test("exact micro-nat domain statistics") {
    val m = rows(eta = 1.0)
    val (nDocsA, nToksA, nllA, excessA, _) = m("A")
    val (nDocsB, nToksB, nllB, excessB, _) = m("B")
    assert((nDocsA, nToksA) === ((3L, 12L)))
    assert((nDocsB, nToksB) === ((1L, 4L)))
    assert(nllA === 0.287682)
    assert(nllB === 2.772589)
    // easy domain sits below the corpus mean — zero excess
    assert(excessA === 0.0)
    // hard domain: 2.772589 − 0.90890875 = 1.86368025 → 1.86368
    assert(excessB === 1.86368)
  }

  test("hard domain gains weight; weights normalize to ~1") {
    val m = rows(eta = 1.0)
    val (wA, wB) = (m("A")._5, m("B")._5)
    assert(wB > wA)
    assert(math.abs(wA + wB - 1.0) < 1e-5)
    // EG direction: w_B/w_A = exp(η·excess_B) before rounding
    assert(math.abs(wB / wA - math.exp(1.86368025)) < 1e-3)
  }

  test("eta = 0 degenerates to uniform weights") {
    val m = rows(eta = 0.0)
    assert(m("A")._5 === 0.5)
    assert(m("B")._5 === 0.5)
  }

  test("domainKl: exact micro-nat divergences; identical distribution scores 0") {
    // easy domain A: P_A(x)=1 vs P(x)=0.75 → KL = ln(4/3) ≈ 0.287682
    // hard domain B: 4 singletons at 1/4 vs 1/16 → KL = ln(4) = 1.386294
    val m = Mixture.domainKl(docs, "text", "dom").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("A") === ((12L, 0.287682)))
    assert(m("B") === ((4L, 1.386294)))
    // two domains with the same distribution: both match the corpus → 0
    val same = Seq(("P", "x y"), ("Q", "x y")).toDF("dom", "text")
    val k2 = Mixture.domainKl(same, "text", "dom").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(k2("P") === 0.0 && k2("Q") === 0.0)
  }

  test("single-domain corpus gets weight 1 and zero excess") {
    val one = Seq(("only", "a b c")).toDF("dom", "text")
    val m = Mixture.doremiStep(one, "text", "dom", eta = 5.0).collect()
    assert(m.length === 1)
    assert(m(0).getDouble(4) === 0.0) // excess vs itself
    assert(m(0).getDouble(5) === 1.0)
  }

  /** Reference waterfill: the sequential loop straight from the
    * algorithm statement — at each ascending step give the source
    * min(cap·n, remaining/remaining_sources) and recompute. */
  private def waterfillRef(caps: Seq[Long], budget: Long): Seq[Double] = {
    var remaining = budget.toDouble
    var left = caps.length
    caps.sorted.map { c =>
      val a = math.min(c.toDouble, remaining / left)
      remaining -= a; left -= 1
      a
    }
  }

  test("unimax: capped prefix + uniform tail, equals the sequential waterfill") {
    // tokens: small=2 (cap 4), mid=5 (cap 10), big=20 (cap 40); budget 20
    // → small capped at 4, mid+big waterfill (20-4)/2 = 8 each
    val docs = Seq(
      ("small", "a b"), ("mid", "c d e f g"),
      ("big", (1 to 20).map(i => s"t$i").mkString(" "))
    ).toDF("src", "text")
    val got = Mixture.unimaxAllocation(docs, "text", "src",
        budget = 20L, capEpochs = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("small") == ((2L, 4.0, 2.0, 0.2)))
    assert(got("mid") == ((5L, 8.0, 1.6, 0.4)))
    assert(got("big") == ((20L, 8.0, 0.4, 0.4)))
    // budget above the capped total: everything allocates its full cap
    val capped = Mixture.unimaxAllocation(docs, "text", "src",
        budget = 1000L, capEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(capped == Map("small" -> 4.0, "mid" -> 10.0, "big" -> 40.0))
    // property: the closed-form prefix condition == the sequential
    // waterfill, across budgets straddling every breakpoint
    val caps = Seq(4L, 10L, 40L)
    for (budget <- Seq(1L, 3L, 4L, 11L, 12L, 20L, 53L, 54L, 90L)) {
      val expect = waterfillRef(caps, budget)
      val allocs = Mixture.unimaxAllocation(docs, "text", "src",
          budget = budget, capEpochs = 2)
        .collect().map(_.getDouble(2)).sorted.toSeq
      allocs.zip(expect).foreach { case (a, e) =>
        assert(math.abs(a - e) < 1e-4, s"budget=$budget: $allocs vs $expect")
      }
    }
  }
}
