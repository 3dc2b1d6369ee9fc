package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Integer-mass PageRank/TrustRank ([[operators.PageRank]]): exact
  * hand-computed masses on a tiny graph (pinning the recurrence
  * including the floor-division and dangling-node semantics), the
  * bit-reproducibility claim under re-partitioning, seed gating, and
  * checkpoint-path equivalence.
  */
class PageRankSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // 1→2, 2→1, 1→3 (3 dangles)
  private def g3 = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")

  private def massMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ranks: exact hand-computed masses, two iterations") {
    // m0 = 1e6 each; base = 150000
    // iter1: 1←floor(.85·1e6)=850000 ⇒ 1000000; 2,3←floor(.85·1e6/2)=425000 ⇒ 575000
    // iter2: 1←floor(.85·575000)=488750 ⇒ 638750; 2,3←425000 ⇒ 575000
    assert(massMap(PageRank.ranks(g3, iters = 2)) ===
      Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("ranks: iters = 0 returns the uniform start; dangling node mirrors its twin") {
    assert(massMap(PageRank.ranks(g3, iters = 0)).values.toSet === Set(1000000L))
    // iter3: 1 ← .85·575000 ⇒ 638750; 2,3 ← .85·638750/2 = ⌊271468.75⌋ ⇒ 421468.
    // Node 3 dangles (never sends) but receives exactly as node 2 does —
    // their masses stay identical every round, and 3's outflow simply
    // teleports away (the lumping treatment)
    assert(massMap(PageRank.ranks(g3, iters = 3)) ===
      Map(1L -> 638750L, 2L -> 421468L, 3L -> 421468L))
  }

  test("ranks: bit-identical across partitionings (the determinism claim)") {
    val a = massMap(PageRank.ranks(g3.repartition(7), iters = 3))
    val b = massMap(PageRank.ranks(g3.repartition(2, col("dst")), iters = 3))
    assert(a === b)
  }

  test("seededRanks: trust decays from seeds; unreachable non-seeds pin to zero") {
    // 1→2, 2→1, 1→3, 4→1; seeds = {1}
    // m0: only node 1 holds scale; base: only node 1 teleports
    // iter1: 1⇒150000, 2,3⇒floor(.85·1e6/2)=425000, 4⇒0
    // iter2: 1⇒150000+floor(.85·425000)=511250, 2,3⇒floor(.85·150000/2)=63750, 4⇒0
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    assert(massMap(PageRank.seededRanks(g, seeds, iters = 2)) ===
      Map(1L -> 511250L, 2L -> 63750L, 3L -> 63750L, 4L -> 0L))
  }

  test("checkpointEvery path returns the same masses as the unbroken lineage") {
    val direct = massMap(PageRank.ranks(g3, iters = 5, checkpointEvery = 100))
    val chk = massMap(PageRank.ranks(g3, iters = 5, checkpointEvery = 2))
    assert(direct === chk)
  }

  test("one-join-per-round plan shape: exactly iters joins in the final lineage") {
    // The teleport base rides the aggregate as union rows, so each
    // round contributes exactly ONE join (edges ⋈ mass on src) — the
    // round-9 form's second node-keyed join (re-attaching base to the
    // aggregated contributions) must not reappear. The staged-edges
    // join and any seed join are behind materialization barriers, so
    // the unbroken lineage holds precisely the per-round joins.
    val plan = PageRank.ranks(g3, iters = 4, checkpointEvery = 100)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.length === 4)
  }

  test("bucketed staged edges: per-round join is exchange-free on the edge side") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // stage once, persist bucketed by src — the production layout the
    // ranksStaged scaladoc claims reads exchange-free every round
    graft.sources.Sinks.writeBucketed(
      PageRank.stageEdges(g3), "pr_edges_b", buckets = 4, keys = Seq("src"))
    val bucketed = spark.table("pr_edges_b")
    val res = PageRank.ranksStaged(bucketed, iters = 3, checkpointEvery = 100)
    // masses must equal the raw-edge entry point bit for bit
    assert(massMap(res) === massMap(PageRank.ranks(g3, iters = 3)))
    // AQE may broadcast the tiny mass side here; force the shuffled
    // path so the exchange-free claim is actually exercised
    val plan = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      PageRank.ranksStaged(bucketed, iters = 1, checkpointEvery = 100)
        .queryExecution.executedPlan
    }
    // the join side carrying `outdeg` IS the staged edge table; the
    // bucket layout must satisfy the join's distribution with no
    // shuffle (the mass side still exchanges — that side is 16
    // bytes/node, the cheap one)
    val sides = plan.collect {
      case j: SortMergeJoinExec => Seq(j.left, j.right)
      case j: ShuffledHashJoinExec => Seq(j.left, j.right)
    }.flatten
    val edgeSides = sides.filter(_.output.exists(_.name == "outdeg"))
    assert(edgeSides.nonEmpty, s"expected a shuffled join over the edges in:\n$plan")
    val edgeSideShuffles = edgeSides.flatMap(_.collect {
      case e: ShuffleExchangeLike => e
    })
    assert(edgeSideShuffles.isEmpty,
      s"edge side reshuffled despite bucketing:\n$plan")
  }

  test("seededRanksStaged over the bucketed layout == seededRanks on raw edges") {
    // the q126 registered spelling: seeded teleport over the SAME
    // src-bucketed staged table q125 reads — masses bit-identical to
    // the raw-edge entry point (integer arithmetic; one shared
    // seededIterate behind both spellings)
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    graft.sources.Sinks.writeBucketed(
      PageRank.stageEdges(g), "pr_edges_seeded_b", buckets = 4,
      keys = Seq("src"))
    val bucketed = spark.table("pr_edges_seeded_b")
    assert(massMap(PageRank.seededRanksStaged(bucketed, seeds, iters = 2)) ===
      massMap(PageRank.seededRanks(g, seeds, iters = 2)))
    // and the hand-computed values stay pinned through the staged path
    assert(massMap(PageRank.seededRanksStaged(bucketed, seeds, iters = 2)) ===
      Map(1L -> 511250L, 2L -> 63750L, 3L -> 63750L, 4L -> 0L))
  }

  private def withConf[A](kv: (String, String)*)(f: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("staged-edge table names are collision-free across sanitization-equal dirs") {
    // sanitization alone is many-to-one ('sf0.1', 'sf0_1', 'sf0-1' all
    // sanitize to sf0_1, and the catalog is case-insensitive): the name
    // must carry a hash of the exact raw dir so distinct dirs can never
    // share a table (and thus never be served each other's graph)
    val tags = Seq("testdata/sf0.1", "testdata/sf0_1", "testdata/sf0-1",
      "testdata/SF0.1").map(graft.queries.Rank.dirTag)
    assert(tags.distinct.size == tags.size, s"collision in $tags")
    // and every tag is a valid catalog identifier fragment
    assert(tags.forall(_.matches("[a-z0-9_]+")), tags.toString)
  }

  test("guards: damping must be a proper fraction") {
    intercept[IllegalArgumentException] {
      PageRank.ranks(g3, iters = 1, dampNum = 100, dampDen = 100)
    }
  }
}
