package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** TEMPORARY scratch: grid-search LSH (nPlanes, tables) for q39
  * candidate recall over the 14 oracle pairs at sf0.01 + sf0.001. */
class ScratchGridSpec extends SparkSpec {

  test("grid") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Tables.load(spark, dir, "embeddings")
      val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
      val truth = a.join(b, col("a") < col("b"))
        .select(col("a"), col("b"), Similarity.cosineFast(col("va"), col("vb")).as("cos"))
        .filter(col("cos") >= 0.45)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"== $dir truth pairs: ${truth.size}")
      for ((np, nt) <- Seq((3, 12), (3, 16), (4, 20), (4, 24), (5, 24), (5, 32))) {
        val bucketed = e.select(col("vec_id").as("id"),
          explode(array((0 until nt).map(t =>
            struct(lit(t).as("tbl"),
              Similarity.lshBucketPublic(col("embedding"), np, t * np).as("bucket"))): _*)).as("tb"))
          .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
        val cand = bucketed.as("x").join(bucketed.as("y"),
            col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
            col("x.id") < col("y.id"))
          .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
        val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val hit = truth.intersect(candSet).size
        println(s"planes=$np tables=$nt cand=${candSet.size} recall=$hit/${truth.size}")
      }
    }
  }
}
