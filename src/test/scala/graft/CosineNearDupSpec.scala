package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Grades [[Similarity.cosineNearDupPairs]] (LSH candidates + exact
  * verify) against the exact all-pairs formulation: the q39 contract is
  * SET EQUALITY of (a, b) pairs at the declared threshold, not just
  * recall, on both test corpora. Also pins the plan shape: no
  * nested-loop join may appear — the whole point of the operator is
  * that candidates come from an equi-join.
  */
class CosineNearDupSpec extends SparkSpec {

  /** Exact all-pairs truth set at rounded-6 threshold `tau` — the same
    * semantics as q39's oracle (round before filter). */
  private def truthPairs(dir: String, tau: Double): Set[(Long, Long)] = {
    val e = Tables.load(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Similarity.cosineFast(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** q39's exact formulation: LSH candidates pruned at a margin below
    * tau, then the rounded filter decides membership. */
  private def lshPairs(dir: String, tau: Double): Set[(Long, Long)] = {
    val e = Tables.load(spark, dir, "embeddings")
    Similarity.cosineNearDupPairs(e, tau = tau - 0.005)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
      .filter(col("cos") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  for (dir <- Seq("sf0.001", "sf0.01")) {
    test(s"pair set equals the exact all-pairs set at $dir (tau=0.45)") {
      val d = s"/root/testdata/$dir"
      val truth = truthPairs(d, 0.45)
      val got = lshPairs(d, 0.45)
      assert(truth.nonEmpty, "calibration broke: empty truth set")
      val missed = truth.diff(got)
      val extra = got.diff(truth)
      assert(missed.isEmpty && extra.isEmpty,
        s"missed=$missed extra=$extra (truth=${truth.size}, got=${got.size})")
    }
  }

  test("plan is candidate-join shaped: no nested-loop join") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val plan = Similarity.cosineNearDupPairs(e, 0.445)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"all-pairs join leaked in:\n$plan")
  }
}
