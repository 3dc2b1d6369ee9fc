package graft

import graft.operators.Fusion

/** Reciprocal-rank fusion ([[operators.Fusion]]): exact fixed-point
  * contributions, the consensus-beats-single-list property, union
  * semantics for docs absent from a list, and the k cut.
  */
class FusionSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // contrib(rank) = round(1e6/(60+rank)):
  //   r1 → 16393, r2 → 16129, r3 → 15873, r4 → 15625
  private val listA = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
    .toDF("query_id", "doc_id", "rank")
  private val listB = Seq((1L, 3L, 1), (1L, 2L, 2), (1L, 4L, 3))
    .toDF("query_id", "doc_id", "rank")

  test("exact fused scores; consensus docs beat a single-list winner") {
    val fused = Fusion.rrf(Seq(listA, listB), k = 10).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).sortBy(_._2)
    // d3: 15873+16393=32266, d2: 16129+16129=32258 — both above d1's
    // single first-place 16393 (the RRF consensus property)
    assert(fused.map(x => (x._1, x._3)).toSeq ===
      Seq((3L, 32266L), (2L, 32258L), (1L, 16393L), (4L, 15873L)))
  }

  test("k cuts per query; single-list fusion preserves the list order") {
    val cut = Fusion.rrf(Seq(listA, listB), k = 2).collect()
    assert(cut.length === 2)
    val solo = Fusion.rrf(Seq(listA), k = 3).collect()
      .map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2).map(_._1)
    assert(solo.toSeq === Seq(1L, 2L, 3L))
  }

  test("queries fuse independently") {
    val other = Seq((2L, 9L, 1)).toDF("query_id", "doc_id", "rank")
    val fused = Fusion.rrf(Seq(listA, other), k = 10).collect()
    assert(fused.filter(_.getLong(0) == 2L).map(_.getLong(1)).toSeq === Seq(9L))
    assert(fused.count(_.getLong(0) == 1L) === 3)
  }

  test("empty ranking list is refused") {
    intercept[IllegalArgumentException] { Fusion.rrf(Seq.empty, k = 5) }
  }
}
