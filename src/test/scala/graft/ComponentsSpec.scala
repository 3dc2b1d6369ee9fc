package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

/** Connected components (large-star/small-star): exact agreement with a
  * brute-force union-find on structured and random graphs, plus the
  * shapes that stress the algorithm — long paths (where naive label
  * propagation would need diameter rounds) and high-degree stars.
  */
class ComponentsSpec extends SparkSpec {

  /** Driver-side union-find ground truth. */
  private def truth(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Components.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph: converges in O(log n) rounds, one component") {
    // A 64-node path — naive min-label propagation needs 63 rounds;
    // large/small-star must finish inside the 25-round budget.
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("star + separate components + self-loop + duplicate edges") {
    val edges = Seq(
      (5L, 1L), (5L, 9L), (5L, 7L), (1L, 5L), // star centered at 5 + dup
      (20L, 21L),                             // separate pair
      (30L, 30L))                             // self loop: isolated node drops
    val got = run(edges)
    assert(got == Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L))
  }

  test("high-degree hub: 5000-leaf star resolves without neighbor arrays") {
    // The shape that OOMs collect_list formulations: one node adjacent
    // to everything. Join-based stars keep the hub's neighborhood as a
    // partial aggregate, so this must converge quickly and correctly.
    val s = spark
    import s.implicits._
    val hub = 2500L
    val edges = (0L until 5000L).filter(_ != hub).map(l => (hub, l))
    val got = Components.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 5000 && got.values.forall(_ == 0L))
  }

  test("result is invariant under adversarial repartitioning") {
    // Iterative graph algorithms are where partition-sensitivity bugs
    // hide; the label mapping must not depend on physical layout.
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 7L), (4L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    def run(parts: Int): Map[Long, Long] =
      Components.connectedComponents(edges.toDF("a", "b").repartition(parts))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(7))
  }

  test("empty edge list yields empty mapping") {
    val s = spark
    import s.implicits._
    assert(Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).isEmpty)
  }

  test("property: equals union-find on random graphs") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(0, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield edges
    (1 to 8).foreach { i =>
      val edges = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).get
      val real = edges.filter { case (a, b) => a != b }
      val nodes = real.flatMap { case (a, b) => Seq(a, b) }.distinct
      assert(run(edges) == truth(nodes, real), s"seed $i, edges=$real")
    }
  }

  test("dedupGroups: isolated ids keep themselves") {
    val s = spark
    import s.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Components.dedupGroups(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L))
  }

  test("dedupGroupsBest: argmax score wins, ties break to the smaller id") {
    val s = spark
    import s.implicits._
    // groups: {1,2,3} (best = 2, score 99), {5,6} (tie 7 ⇒ 5), {4} solo
    val scored = Seq((1L, 10L), (2L, 99L), (3L, 50L), (4L, 1L),
      (5L, 7L), (6L, 7L)).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Components.dedupGroupsBest(scored, "id", "score", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 4L,
      5L -> 5L, 6L -> 5L))
    // contrast with keep-min: dedupGroups would have kept 1, not 2
    val keepMin = Components.dedupGroups(scored.select(col("id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepMin(3L) === 1L && got(3L) === 2L)
  }
}
