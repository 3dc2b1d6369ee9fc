package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank (Page et al. 1999) and its seeded/personalized form
  * TrustRank (Gyöngyi et al. 2004) over INTEGER mass — the classic
  * link-graph quality signals web-scale corpus curation uses: Common
  * Crawl publishes a PageRank-style host ranking for crawl selection,
  * and TrustRank propagates trust from a vetted seed set to demote
  * link-spam neighborhoods before their pages enter a training corpus.
  *
  * Integer-mass formulation: each iteration a node keeps its teleport
  * share and receives `floor(dampNum · mass(u) / (dampDen · outdeg(u)))`
  * from each in-neighbor `u`:
  *
  *   mass'(v) = base(v) + Σ_{u→v} (mass(u)·dampNum) div (outdeg(u)·dampDen)
  *
  * where `base(v)` is the teleport mass — uniform for PageRank,
  * seed-only for TrustRank. All arithmetic is 64-bit integer, so the
  * result is BIT-REPRODUCIBLE across engines, partitionings, and
  * retries (floating-point power iteration is not: the Σ over
  * in-neighbors is summation-order-dependent). The floor drops <1 unit
  * of mass per edge per iteration relative to the real-valued
  * recurrence — at `scale` = 1e6 a relative perturbation ~1e-6·outdeg,
  * far below ranking resolution — and dangling-node mass simply
  * teleports, the standard lumping treatment. That determinism is what
  * makes the signal regression-gateable: two runs over
  * differently-partitioned 100 TB inputs produce byte-identical rank
  * tables.
  *
  * Scale shape, per iteration:
  *   - ONE equi-join (edges ⋈ mass on src) and ONE shuffle aggregate
  *     (contributions by dst). The `(src, dst, outdeg)` edge table is
  *     staged ONCE — persist/bucket it by src and the join side is
  *     exchange-free across ALL iterations, the dominant cost at scale;
  *     masses are 16 bytes/node.
  *   - hub skew (a node with huge in-degree) is an aggregate hot key —
  *     absorbed by map-side combine + AQE skew split, never a
  *     cartesian.
  *   - `iters` is a fixed small constant (rankings stabilize in tens of
  *     rounds); lineage grows linearly, so `checkpointEvery` truncates
  *     it with a [[Barrier]] for long runs.
  */
object PageRank {

  /** PageRank after `iters` damped power-iteration rounds.
    *
    * @param edges directed edges `(src, dst)` (LONG ids); pre-dedup for
    *              unweighted semantics
    * @return (node, mass) for every node appearing as src or dst; mass
    *         in `scale` units, Σ ≈ n·scale
    */
  def ranks(edges: DataFrame, iters: Int, scale: Long = 1000000L,
            dampNum: Long = 85, dampDen: Long = 100,
            checkpointEvery: Int = 8): DataFrame = {
    val (e, nodes) = staged(edges)
    val base = scale * (dampDen - dampNum) / dampDen
    iterate(nodes.withColumn("base", lit(base)), e,
      lit(scale), iters, dampNum, dampDen, checkpointEvery)
  }

  /** TrustRank: teleport mass flows ONLY to `seeds` — nodes reachable
    * from the seed set accumulate trust with distance-damped decay,
    * everything else decays toward zero. Unnormalized teleport (each
    * seed gets the same `scale·(dampDen−dampNum)/dampDen` share a
    * PageRank node would); rankings are scale-invariant so callers
    * compare masses, not probabilities.
    *
    * @param seeds single-column `(node)` trusted set (LONG ids)
    * @return (node, mass) for every graph node; non-seed sources with
    *         no seed in-path converge to 0
    */
  def seededRanks(edges: DataFrame, seeds: DataFrame, iters: Int,
                  scale: Long = 1000000L, dampNum: Long = 85,
                  dampDen: Long = 100, checkpointEvery: Int = 8): DataFrame = {
    val (e, nodes) = staged(edges)
    seededIterate(nodes, e, seeds, iters, scale, dampNum, dampDen,
      checkpointEvery)
  }

  /** [[seededRanks]] over an ALREADY-STAGED `(src, dst, outdeg)` edge
    * table — the TrustRank face of [[ranksStaged]]: same bucketed
    * exchange-free production layout, seed-gated teleport base. Masses
    * are bit-identical to [[seededRanks]] on the raw edges
    * (PageRankSpec pins both the parity and the zero-edge-side-
    * Exchange plan). */
  def seededRanksStaged(edgesOut: DataFrame, seeds: DataFrame, iters: Int,
                        scale: Long = 1000000L, dampNum: Long = 85,
                        dampDen: Long = 100,
                        checkpointEvery: Int = 8): DataFrame =
    seededIterate(nodesOf(edgesOut), edgesOut, seeds, iters, scale,
      dampNum, dampDen, checkpointEvery)

  /** Seed-gated base construction + the shared loop: teleport mass
    * `base` lands only on seed nodes, initial mass only on seeds —
    * one definition behind both seeded entry points so the raw and
    * staged spellings cannot drift. */
  private def seededIterate(nodes: DataFrame, edgesOut: DataFrame,
                            seeds: DataFrame, iters: Int, scale: Long,
                            dampNum: Long, dampDen: Long,
                            checkpointEvery: Int): DataFrame = {
    val s = seeds.select(col(seeds.columns.head).cast("long").as("node"))
      .distinct().withColumn("is_seed", lit(true))
    val base = scale * (dampDen - dampNum) / dampDen
    val withBase = nodes.join(s, Seq("node"), "left")
      .select(col("node"),
        when(col("is_seed"), lit(base)).otherwise(lit(0L)).as("base"))
    iterate(withBase, edgesOut,
      when(col("base") =!= 0L, lit(scale)).otherwise(lit(0L)),
      iters, dampNum, dampDen, checkpointEvery)
  }

  /** [[ranks]] over an ALREADY-STAGED `(src, dst, outdeg)` edge table
    * — the production shape the scaladoc's exchange-free claim refers
    * to: stage once with [[stageEdges]], persist it BUCKETED by `src`,
    * and every one of the `iters` per-round joins reads the bucket
    * layout with no Exchange on the edge side — the dominant data
    * volume at scale never reshuffles (PageRankSpec demonstrates on a
    * real bucketed table and pins masses == [[ranks]] on the raw
    * edges). No barrier is inserted here: the input is already a scan. */
  def ranksStaged(edgesOut: DataFrame, iters: Int, scale: Long = 1000000L,
                  dampNum: Long = 85, dampDen: Long = 100,
                  checkpointEvery: Int = 8): DataFrame = {
    val base = scale * (dampDen - dampNum) / dampDen
    iterate(nodesOf(edgesOut).withColumn("base", lit(base)), edgesOut,
      lit(scale), iters, dampNum, dampDen, checkpointEvery)
  }

  /** Node set of a staged edge table (src ∪ dst). */
  private def nodesOf(edgesOut: DataFrame): DataFrame =
    edgesOut.select(col("src").as("node"))
      .union(edgesOut.select(col("dst").as("node"))).distinct()

  /** The `(src, dst, outdeg)` staging projection alone — what
    * [[ranksStaged]] expects persisted (bucket by `src` for the
    * exchange-free per-round join). */
  def stageEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
  }

  /** Edge staging shared by both entry points: long-cast edges joined
    * with out-degrees (reused every iteration), plus the node set. */
  private def staged(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = nodesOf(e)
    // every iteration re-reads the staged table — materialize once
    // instead of replaying the edge derivation `iters` times (on a
    // cluster: persist/bucket by src via [[stageEdges]] +
    // [[ranksStaged]], making the per-iteration join exchange-free).
    // Delegating to stageEdges keeps the two staging paths one
    // definition — they must never drift, or ranksStaged would
    // silently diverge from ranks.
    (Barrier.materialize(stageEdges(e)), nodes)
  }

  /** The shared power-iteration loop over `(node, base)` + staged
    * edges, starting every node at `massInit`.
    *
    * Each round is exactly ONE equi-join + ONE aggregate: the teleport
    * mass enters the round's aggregate as a per-node `base` row
    * unioned onto the edge contributions, instead of a second
    * node-keyed join re-attaching `base` to the aggregated
    * contributions (the round-9 form — one more node-sized join per
    * round, and locally one more chained shuffle for the scheduler to
    * amplify across iterations). The union is exact, not a
    * reformulation: Σ over {base} ∪ {contributions} per node is the
    * old base + Σ contributions, in 64-bit integer arithmetic where
    * addition order cannot matter — masses are bit-identical to the
    * two-join spelling (PageRankSpec pins the hand-computed values and
    * the one-join-per-round plan shape). Nodes with no in-edges
    * survive via their base row, replacing the old left-join coalesce. */
  private def iterate(nodesBase: DataFrame, edgesOut: DataFrame,
                      massInit: org.apache.spark.sql.Column, iters: Int,
                      dampNum: Long, dampDen: Long,
                      checkpointEvery: Int): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    // (node, base) feeds every iteration's union — materialize once
    val nb = Barrier.materialize(nodesBase)
    var mass = nb.select(col("node"), massInit.cast("long").as("mass"))
    for (i <- 1 to iters) {
      mass = edgesOut
        .join(mass.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(mass * $dampNum) div (outdeg * $dampDen)").as("c"))
        .unionByName(nb.select(col("node"), col("base").as("c")))
        .groupBy(col("node")).agg(sum(col("c")).as("mass"))
      if (i % checkpointEvery == 0 && i < iters)
        mass = Barrier.materialize(mass)
    }
    mass
  }
}
