package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the last stage
  * of every near-dup pipeline: pair lists (from [[Dedup.minhashNearDups]],
  * [[Dedup.simhashNearDups]] or [[Similarity.cosineNearDupPairs]]) say
  * which documents are duplicates of each other; components turn those
  * pairs into dedup GROUPS so exactly one representative per group
  * survives. (The reference has no analog — Airflow orchestrates, it
  * does not compute; this is a north-star LLM-pipeline extension like
  * the dedup operators it composes with.)
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard shuffle-based formulation that converges in O(log n)
  * rounds on any graph, unlike naive min-label propagation whose round
  * count is the graph DIAMETER (a 1M-node near-dup chain would need 1M
  * rounds; large/small-star needs ~20).
  *
  * Scale shape: each round is two hash aggregations and two hash joins
  * keyed on node id — no collect_list (a high-degree hub node never
  * materializes its neighbor array; its neighborhood min is a plain
  * partial aggregate, so skew stays in AQE-managed shuffle land).
  * Convergence is detected by an order-independent checksum
  * (count + sum of xxhash64(a,b)) instead of an `except` — one
  * aggregate action per round rather than two extra join shuffles.
  * Each round's result is localCheckpoint'ed: the plan would otherwise
  * double per iteration and Catalyst re-analysis, not the data, would
  * become the bottleneck. (On a real cluster prefer
  * `spark.sparkContext.setCheckpointDir` + reliable checkpoints if
  * executor loss during the loop must be survivable.)
  */
object Components {

  /** Map every node appearing in `edges` to its component's minimum
    * node id. Input: first two columns are the endpoints (any names,
    * integral type). Output: (node, component). Nodes with no edges
    * don't appear — callers union isolated nodes back (see q69).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponentsCounted(edges, maxIter)._1

  /** [[connectedComponents]] plus the number of star rounds it took to
    * converge — the observable graft.ScaleProbe records to pin the
    * O(log n) round bound against growing-diameter graphs. */
  def connectedComponentsCounted(edges: DataFrame,
      maxIter: Int = 25): (DataFrame, Int) = {
    val e0 = edges.select(
      col(edges.columns(0)).cast("long").as("a"),
      col(edges.columns(1)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .distinct()

    // hash sum in decimal(38,0): |hash| ≤ 2^63 so even 1e18 edges stay
    // far from decimal-38 overflow (ANSI mode would fail a long sum).
    def checksum(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }

    // large-star: ∀u, m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
    // Implemented as groupBy-min + join — never a neighbor array.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy(col("a"))
        .agg(min(col("b")).as("mn"))
        .select(col("a").as("u"), least(col("a"), col("mn")).as("m"))
      sym.join(mins, sym("a") === mins("u"))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
    }

    // small-star on (hi, lo)-oriented edges: ∀u, m = min of its smaller
    // neighbors; re-attach every smaller neighbor AND u itself to m.
    // input is already oriented a > b by construction/largeStar output
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("a")).agg(min(col("b")).as("m"))
        .select(col("a").as("u"), col("m"))
      val joined = e.join(mins, e("a") === mins("u"))
      joined.select(col("b").as("a"), col("m").as("b"))
        .union(joined.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .distinct()
    }

    // LAZY localCheckpoint: the checksum action both materializes the
    // round's edge set into the checkpoint AND digests it — ONE Spark
    // job per round instead of an eager-checkpoint job plus a checksum
    // job. Each round is latency-bound (the edge set shrinks fast), so
    // halving the action count halves the loop's scheduler-latency
    // exposure. The empty-input check rides the same digest (count 0).
    var cur = e0.localCheckpoint(false)
    var sig = checksum(cur)
    var iter = 0
    var converged = sig._1 == 0L
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      val nsig = checksum(next)
      // next is materialized by its checksum, so the previous round's
      // blocks are dead — free them now rather than letting up to
      // maxIter edge-set copies pile up in storage.
      cur.unpersist()
      converged = nsig == sig
      cur = next
      sig = nsig
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    org.apache.log4j.Logger.getLogger(getClass)
      .info(s"connectedComponents converged in $iter rounds (${sig._1} star edges)")
    // At the fixpoint every edge is (node, componentMin).
    (cur.select(col("a").as("node"), col("b").as("component"))
      .union(cur.select(col("b").as("node"), col("b").as("component")))
      .distinct(), iter)
  }

  /** Dedup grouping: every id in `ids` (single-column DF) mapped to the
    * canonical survivor of its near-dup group — the component min, or
    * itself when it has no near-dups. The join is on node id; at corpus
    * scale `comp` is tiny relative to the corpus (only docs that HAVE a
    * near-dup appear), so AQE broadcasts it.
    */
  def dedupGroups(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val idCol = ids.columns(0)
    val comp = connectedComponents(pairs)
      .withColumnRenamed("node", idCol)
    ids.join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("keep_id"))
  }

  /** Quality-aware dedup grouping: every id mapped to its near-dup
    * group's BEST member by `scoreCol` (ties → smaller id) instead of
    * [[dedupGroups]]'s arbitrary minimum — the RefinedWeb/FineWeb
    * policy of keeping the longest/highest-quality duplicate, which
    * measurably beats keep-any on downstream quality. `scored` must
    * carry (idCol, scoreCol).
    *
    * Scale shape: [[dedupGroups]]'s component map (tiny — only docs
    * WITH near-dups appear, AQE broadcasts it) plus one window over
    * group-keyed rows; groups are near-dup clusters, so partitions are
    * small and skew-free by construction.
    *
    * @return (idCol, best_id) — `best_id` is the retained
    *         representative; a doc with no near-dups maps to itself
    */
  def dedupGroupsBest(scored: DataFrame, idCol: String,
                      scoreCol: String, pairs: DataFrame): DataFrame = {
    val groups = dedupGroups(scored.select(col(idCol)), pairs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("keep_id"))
      .orderBy(col(scoreCol).desc, col(idCol))
    groups.join(scored, Seq(idCol))
      .withColumn("best_id", first(col(idCol)).over(w))
      .select(col(idCol), col("best_id"))
  }
}
