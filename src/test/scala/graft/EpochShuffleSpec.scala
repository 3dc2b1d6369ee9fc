package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusPrep
import graft.sources.Tables

/** Contracts for the distributed epoch shuffle
  * ([[CorpusPrep.epochShuffle]]): the sharded decomposition computes
  * the exact global seeded rank, the result is independent of the
  * shard prefix width (width only sizes the within-shard partitions),
  * and [[CorpusPrep.shardWidthFor]] grows the width with the corpus.
  */
class EpochShuffleSpec extends SparkSpec {

  private def positions(width: Int): Map[Long, Long] = {
    val d = Tables.load(spark, sfDir, "documents")
    CorpusPrep.epochShuffle(d, "doc_id", "epoch42:", width)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("widths 3/4/5 produce the identical global ordering (q95's corpus)") {
    val w3 = positions(3)
    val w4 = positions(4)
    val w5 = positions(5)
    assert(w3 == w4, "width 3 vs 4 diverged")
    assert(w4 == w5, "width 4 vs 5 diverged")
    // and it IS the naive global rank: a permutation 1..n ordered by
    // the seeded key
    val n = w4.size
    assert(w4.values.toSeq.sorted == (1L to n.toLong), "not a 1..n permutation")
    val naive = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("epoch42:"), col("doc_id").cast("string"))).as("k"))
      .orderBy(col("k"), col("doc_id"))
      .collect().map(_.getLong(0))
    naive.zipWithIndex.foreach { case (id, i) =>
      assert(w4(id) == i + 1L, s"doc $id: got ${w4(id)}, naive rank ${i + 1}")
    }
  }

  test("shardWidthFor grows with the corpus and stays in [1, 8]") {
    assert(CorpusPrep.shardWidthFor(0L) == 1)
    assert(CorpusPrep.shardWidthFor(4000000L) == 1)
    // 100 TB-ish: 50B rows / 4M per shard = 12500 shards → 16^4 covers
    assert(CorpusPrep.shardWidthFor(50000000000L) == 4)
    assert(CorpusPrep.shardWidthFor(Long.MaxValue) == 8)
    // a smaller per-shard target widens the prefix
    assert(CorpusPrep.shardWidthFor(4000000L, targetRowsPerShard = 1000L) >= 3)
    intercept[IllegalArgumentException] {
      CorpusPrep.shardWidthFor(10L, targetRowsPerShard = 0L)
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.epochShuffle(
        Tables.load(spark, sfDir, "documents"), "doc_id", "s", width = 0)
    }
  }
}
