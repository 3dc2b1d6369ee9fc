package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Determinism: the k-gram hash is the repo's md5 53-bit idiom
  * (identical literal arithmetic on both engines), window minima are
  * exact integer comparisons — fingerprints are bit-stable across
  * engines and partitionings.
  *
  * Implementation note — explode + window, NOT array HOFs: the k-gram →
  * hash → windowed-min chain is expressed over the exploded token
  * stream with `lead`/`min over (doc, pos rows w)` so every expression
  * (regex tokenize, md5, comparisons) runs inside whole-stage codegen
  * exactly once per token. The "obvious" nested-HOF formulation
  * (transform over transform over slice) evaluates interpreted AND
  * re-inlines the tokenizer into every lambda element reference —
  * measured 100×+ slower on sf0.1 before this rewrite. Cost of the
  * trade: ONE doc-keyed exchange (the q76 line-dedup shape — both
  * windows and the distinct reuse the same partitioning), which at
  * 100 TB is a corpus-token-sized shuffle of (id, pos, 8-byte hash)
  * rows; bucketing the corpus by doc id makes it exchange-free.
  */
object Winnow {

  /** The hashed k-gram stream `(idCol, pos, h)` — one row per complete
    * k-gram, in document order, all codegen. */
  private def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val toks = docs.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val leads = (1 until k).map(j => lead(col("tok"), j).over(win))
    val gram = concat_ws(" ", col("tok") +: leads: _*)
    // a k-gram is complete only while lead(k-1) exists; trailing
    // positions yield null and are dropped
    val h =
      if (k == 1) conv(substring(md5(gram), 1, 13), 16, 10).cast("long")
      else when(leads.last.isNotNull,
        conv(substring(md5(gram), 1, 13), 16, 10).cast("long"))
    toks.select(col(idCol), col("pos"), h.as("h"))
      .filter(col("h").isNotNull)
  }

  /** Winnowed `(idCol, fp, wlen)` BEFORE the full-window filter —
    * shared by [[fingerprints]] and [[fingerprintStats]] so the
    * window pass is defined once. */
  private def windowMins(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    require(w >= 1, s"need w >= 1, got $w")
    val frame = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    gramHashes(docs, idCol, textCol, k)
      .select(col(idCol), col("h"),
        min(col("h")).over(frame).as("fp"),
        count(lit(1)).over(frame).as("wlen"))
  }

  /** Exploded `(idCol, fp)` distinct fingerprint postings — the join
    * key table [[sharedPassagePairs]] and any cross-corpus passage
    * probe use. Documents with fewer than `k+w−1` tokens (no full
    * window) yield no rows — the guarantee below the match-length
    * threshold is vacuous anyway. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame =
    windowMins(docs, idCol, textCol, k, w)
      .filter(col("wlen") === w)
      .select(col(idCol), col("fp")).distinct()

  /** Per-document fingerprint coverage: `(idCol, n_fps, n_kgrams,
    * density)` — every input document appears (zero-gram docs score
    * 0). One window pass + one per-doc aggregate. */
  def fingerprintStats(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, w: Int = 4): DataFrame = {
    val stats = windowMins(docs, idCol, textCol, k, w)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_kgrams"),
        countDistinct(when(col("wlen") === w, col("fp"))).cast("int")
          .as("n_fps"))
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_fps"), lit(0)).as("n_fps"),
        coalesce(col("n_kgrams"), lit(0)).as("n_kgrams"))
      .withColumn("density",
        round(col("n_fps").cast("double") / greatest(col("n_kgrams"), lit(1)),
          6))
  }

  /** Cross-set passage decontamination: corpus documents sharing at
    * least one winnowed fingerprint with ANY eval-set document — the
    * ExactSubstr-style contamination probe at fingerprint cost. The
    * winnowing guarantee makes it sound for passages of ≥ w+k−1
    * tokens: a training document quoting that much of an eval document
    * WILL share a fingerprint (no LSH miss probability).
    *
    * Scale shape: the eval set is small by definition, so its distinct
    * fingerprint set is BROADCAST; only matching corpus postings reach
    * the per-doc count.
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
