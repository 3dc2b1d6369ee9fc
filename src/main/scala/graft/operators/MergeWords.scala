package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The shared scaffolding of the driver-side tokenizer merge loops —
  * [[Bpe]] and [[WordPiece]] differ ONLY in their merge objective
  * (frequency argmax vs likelihood score), so the mechanics they must
  * agree on byte-for-byte live here once: the collected word-table
  * representation, its round-trip back to a DataFrame (and the
  * durable per-step audit trail), and the greedy left-to-right
  * in-place merge sweep that must match [[Bpe.applyMerge]]'s
  * distributed fold exactly. A fix to any of these now reaches both
  * families by construction (each family's Spec pins its driver-side
  * loop == distributed loop on the real corpus).
  */
private[operators] object MergeWords {

  type Words = Array[(String, Long, ArrayBuffer[String])]

  /** Collect a `(w, f, syms)` segmentation into the mutable
    * driver-side representation the merge loops sweep over. */
  def collect(seg0: DataFrame): Words =
    seg0.select(col("w"), col("f"), col("syms")).collect().map { r =>
      (r.getString(0), r.getLong(1), ArrayBuffer(r.getSeq[String](2): _*))
    }

  /** The driver-side table back as a `(w, f, syms)` DataFrame. */
  def toDf(spark: SparkSession, words: Words): DataFrame = {
    import spark.implicits._
    words.toSeq.map { case (w, f, s) => (w, f, s.toSeq) }.toDF("w", "f", "syms")
  }

  /** Durable-mode audit trail: write step `step`'s segmentation to
    * `persistPath/seg<step>` (frames are local, so writes are cheap —
    * the contract is form-independent with the distributed loop). */
  def persist(spark: SparkSession, words: Words,
      persistPath: Option[String], step: Int): Unit =
    persistPath.foreach(p =>
      toDf(spark, words).write.mode("overwrite").parquet(s"$p/seg$step"))

  /** Does this symbol sequence contain the adjacent pair (l, r)? The
    * cheap containment verify for lazily-stale occurrence indexes. */
  def containsPair(syms: ArrayBuffer[String], l: String, r: String): Boolean = {
    var j = 0
    while (j < syms.length - 1) {
      if (syms(j) == l && syms(j + 1) == r) return true
      j += 1
    }
    false
  }

  /** Apply one merge (l, r) → l+r greedily left-to-right IN PLACE —
    * the freshly-merged symbol is never reconsidered as the LEFT of
    * the same pass, exactly [[Bpe.applyMerge]]'s fold (which reads
    * the accumulator's last element, which a merge just replaced —
    * matching requires skipping past it). */
  def mergeInPlace(syms: ArrayBuffer[String], l: String, r: String): Unit = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) {
        syms(i) = l + r
        syms.remove(i + 1)
      }
      i += 1
    }
  }
}
