package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): hash every word k-gram, slide a window of `w`
  * consecutive hashes, keep each window's minimum. The selected
  * fingerprints are POSITION-LOCAL: two documents sharing any passage
  * of at least w+k−1 tokens are guaranteed to share a fingerprint —
  * the local-similarity complement of whole-document identity (q31/q35)
  * and set-similarity MinHash (q33): it finds shared PASSAGES
  * (boilerplate, quotations, license blocks, plagiarized spans) even
  * between globally-dissimilar documents.
  *
  * Determinism: the k-gram hash is the repo's seeded-md5 53-bit idiom
  * (identical literal arithmetic on both engines), window minima are
  * exact integer comparisons — fingerprints are bit-stable across
  * engines and partitionings.
  *
  * Scale shape: [[fingerprints]] per-document work is ONE zero-shuffle
  * projection — tokens → k-gram hashes → windowed minima → distinct,
  * all inside array HOFs, no explode-then-window shuffle. Only the
  * (doc_id, fp) explosion leaves the projection, and only
  * [[sharedPassagePairs]] shuffles it: a fingerprint-keyed equi-join
  * (the LSH-band shape) with a stop-fingerprint cut (`maxDf`) bounding
  * every posting list, so the pair candidate set is
  * Σ|posting|² over RARE fingerprints — never all-pairs.
  */
object Winnow {

  /** Per-document winnowed fingerprint array plus coverage stats:
    * `(idCol, fps, n_kgrams)`. Documents with fewer than `k+w−1`
    * tokens (no full window) yield an empty fingerprint set — the
    * guarantee below the match-length threshold is vacuous anyway. */
  def fingerprintArrays(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val nWin = (size(col("hs")) - lit(w - 1)).cast("int")
    val mins: Column =
      if (w == 1) col("hs")
      else when(nWin <= 0, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(1), nWin),
          i => array_min(slice(col("hs"), i, lit(w)))))
    docs.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        transform(Text.wordNgrams(col("toks"), k),
          g => conv(substring(md5(g), 1, 13), 16, 10).cast("long")).as("hs"))
      .select(col(idCol), mins.as("mins"), size(col("hs")).as("n_kgrams"))
      .select(col(idCol), array_distinct(col("mins")).as("fps"),
        col("n_kgrams"))
  }

  /** Exploded `(idCol, fp)` fingerprint postings — the join key table
    * [[sharedPassagePairs]] and any cross-corpus passage probe use. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame =
    fingerprintArrays(docs, idCol, textCol, k, w)
      .select(col(idCol), explode(col("fps")).as("fp"))

  /** Cross-set passage decontamination: corpus documents sharing at
    * least one winnowed fingerprint with ANY eval-set document — the
    * ExactSubstr-style contamination probe at fingerprint cost. The
    * winnowing guarantee makes it sound for passages of ≥ w+k−1
    * tokens: a training document quoting that much of an eval document
    * WILL share a fingerprint (no LSH miss probability).
    *
    * Scale shape: the eval set is small by definition, so its distinct
    * fingerprint set is BROADCAST; the corpus side stays the
    * zero-shuffle fingerprint projection, and only matching postings
    * reach the per-doc count. One corpus pass, no corpus-sized
    * shuffle at all.
    *
    * @return (idCol, shared_fps) for contaminated corpus docs only
    */
  def passageOverlap(corpus: DataFrame, eval: DataFrame, idCol: String,
                     textCol: String, k: Int = 3, w: Int = 4): DataFrame = {
    val evalFps = broadcast(
      fingerprints(eval, idCol, textCol, k, w).select(col("fp")).distinct())
    fingerprints(corpus, idCol, textCol, k, w)
      .join(evalFps, Seq("fp"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("shared_fps"))
  }

  /** Document pairs sharing at least `minShared` winnowed fingerprints
    * — the shared-passage candidate report. Fingerprints occurring in
    * more than `maxDf` documents are dropped first (ubiquitous
    * boilerplate matches everything and would square the join; the
    * standard stop-fingerprint cut, same role as q32's prefix filter).
    *
    * @return (doc_a, doc_b, shared) with doc_a < doc_b
    */
  def sharedPassagePairs(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4, minShared: Int = 2,
                         maxDf: Int = 1000): DataFrame = {
    val fps = Barrier.materialize(fingerprints(docs, idCol, textCol, k, w))
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    val keyed = fps.join(rare, Seq("fp"))
    keyed.select(col("fp"), col(idCol).as("doc_a"))
      .join(keyed.select(col("fp"), col(idCol).as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
