package graft.operators

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece vocabulary induction — the THIRD mainstream subword
  * family next to [[Bpe]] (frequency-argmax merges) and [[UnigramLm]]
  * (EM-pruned piece scores): Schuster & Nakajima 2012, "Japanese and
  * Korean Voice Search" — the tokenizer BERT ships. WordPiece runs
  * BPE's merge loop but picks the pair that maximizes the training
  * corpus's unigram-LM LIKELIHOOD gain, which reduces to the score
  *
  *   score(l, r) = count(l r) / (count(l) · count(r))
  *
  * over the current segmentation — a rare pair of rare symbols can
  * beat a frequent pair of ubiquitous ones. Segmentation, pair
  * counting, and merge application are [[Bpe]]'s verbatim (same
  * `(w, f, syms)` vocab convention, same greedy left-to-right merge,
  * same `</w>` end-of-word marker — the families differ in the merge
  * OBJECTIVE, not the mechanics), so the application operators
  * ([[Bpe.tokenCounts]]/[[Bpe.encode]]) consume a trained WordPiece
  * vocabulary unchanged.
  *
  * Cross-engine arithmetic contract: the score is ONE IEEE division
  * of ONE IEEE multiplication of exact integer counts cast to double
  * — both operations are correctly rounded by definition, so Spark,
  * the driver-side loop, and the DuckDB oracle produce bit-identical
  * doubles and the (score desc, l, r) argmax cannot drift. (Casting
  * the counts to double BEFORE multiplying also keeps c(l)·c(r) from
  * overflowing 64-bit integers at corpus scale.)
  *
  * Scale shape: identical to [[Bpe]] — the only corpus-scale
  * operation is the word-frequency aggregate; every later frame is
  * distinct-word- or symbol-vocab-sized, and the hybrid driver-side
  * loop (delta-maintained pair AND symbol counts, a lazy-revalidation
  * argmax heap, an inverted pair→words occurrence index) makes
  * production merge counts one Spark job total.
  */
object WordPiece {

  /** Symbol unigram counts over a segmentation, weighted by word
    * frequency — the denominator statistic BPE doesn't need. Output
    * `(sym, c)`, symbol-vocab-sized. */
  def symbolCounts(seg: DataFrame): DataFrame =
    seg.select(col("f"), explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("f")).as("c"))

  /** The scored pair table `(l, r, cnt, score)` over a segmentation:
    * adjacent-pair counts joined to both sides' symbol counts. The
    * caller barriers `seg` (two consumers — pair counts and symbol
    * counts); the joins are symbol-vocab-sized on both sides. */
  def scoredPairs(seg: DataFrame): DataFrame = {
    val uc = symbolCounts(seg)
    Bpe.pairCounts(seg)
      .join(uc.withColumnRenamed("sym", "l").withColumnRenamed("c", "cl"), "l")
      .join(uc.withColumnRenamed("sym", "r").withColumnRenamed("c", "cr"), "r")
      .select(col("l"), col("r"), col("cnt"),
        (col("cnt").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double"))).as("score"))
  }

  /** Learn the first `k` likelihood-scored merges from a corpus.
    * Returns the merge list `(l, r, cnt, score)` and the final vocab
    * segmentation `(w, f, syms)` — [[Bpe.tokenCounts]]'s input. Knobs
    * as [[Bpe.train]]: `persistPath` for the durable audit trail,
    * `driverMaxWords` for the hybrid threshold. */
  def train(docs: DataFrame, textCol: String, k: Int,
      persistPath: Option[String] = None,
      driverMaxWords: Long = 2000000L): (Seq[(String, String, Long, Double)], DataFrame) =
    trainFromWordFreq(Bpe.wordFreq(docs, textCol), k, persistPath, driverMaxWords)

  /** [[train]] from an already-built `(w, f)` word-frequency table —
    * the same incremental contract as [[Bpe.trainFromWordFreq]]: word
    * counts are the ONLY corpus-derived state and merge associatively
    * ([[NgramLm.mergeCounts]]), so a stream maintaining the word table
    * retrains WordPiece from model-sized state. */
  def trainFromWordFreq(wf: DataFrame, k: Int,
      persistPath: Option[String] = None,
      driverMaxWords: Long = 2000000L): (Seq[(String, String, Long, Double)], DataFrame) = {
    require(k >= 1, "need at least one merge")
    def barrier(df: DataFrame, step: Int): DataFrame =
      Barrier.materialize(df, persistPath.map(p => s"$p/seg$step"))
    var seg = barrier(Bpe.segment(wf), 0)
    if (seg.count() <= driverMaxWords)
      return trainDriverSide(wf.sparkSession, seg, k, persistPath)
    val out = ArrayBuffer.empty[(String, String, Long, Double)]
    var exhausted = false
    while (out.length < k && !exhausted) {
      val top = scoredPairs(seg)
        .orderBy(col("score").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        out += ((l, r, top(0).getLong(2), top(0).getDouble(3)))
        // lazy final merge in the default form, always written in
        // durable mode — the Bpe.trainFromWordFreq rationale verbatim
        seg = if (out.length < k || persistPath.isDefined)
                barrier(Bpe.applyMerge(seg, l, r), out.length)
              else Bpe.applyMerge(seg, l, r)
      }
    }
    (out.toSeq, seg)
  }

  /** The token a word segments to when greedy matching fails — BERT's
    * unknown-token convention. */
  val Unk = "[UNK]"

  /** The distinct piece inventory of a trained vocabulary segmentation
    * — what a tokenizer ships at runtime (symbols in USE, not the
    * merge history). Symbol-vocab-sized. */
  def inventory(vocabSeg: DataFrame): DataFrame =
    vocabSeg.select(explode(col("syms")).as("piece")).distinct()

  /** Greedy longest-match-first segmentation of one string — the
    * WordPiece RUNTIME algorithm (BERT's tokenizer.apply): at each
    * position take the longest inventory piece matching there; any
    * position with no match collapses the whole word to [[Unk]].
    * Deliberately NOT the training segmentation replay: greedy
    * max-match can diverge from the merge history on in-vocab words
    * too (the documented BPE-vs-runtime mismatch), which is exactly
    * why application must be its own tested operator. Pure
    * integer/string arithmetic — no floats anywhere — so the DuckDB
    * oracle replays it exactly. */
  private[graft] def maxMatchPath(s: String, pieces: Set[String],
      maxLen: Int): String = {
    val n = s.length
    var pos = 0
    val sb = new StringBuilder
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = s.substring(pos, pos + l)
        if (pieces.contains(cand)) found = cand
        l -= 1
      }
      if (found == null) return Unk
      if (sb.nonEmpty) sb.append(' ')
      sb.append(found)
      pos += found.length
    }
    sb.toString
  }

  /** Segment a distinct-word table by greedy max-match against a
    * trained piece inventory, in the `(w, f, syms)` vocab convention —
    * so the [[Bpe.tokenCounts]]/[[Bpe.encode]] application path works
    * on a FOREIGN corpus (train on yesterday's data, apply to today's:
    * unseen words segment from the same inventory instead of
    * dropping; truly unmatchable words become one [[Unk]] token). The
    * inventory collects once (symbol-vocab-sized — it IS the shipped
    * tokenizer) and broadcasts to a per-row function over the
    * distinct-word table: zero shuffle, the [[UnigramLm
    * .viterbiSegments]] shape. Words are matched as `w + "</w>"`, the
    * training convention, so word-final pieces apply. */
  def maxMatchSegments(words: DataFrame, pieces: DataFrame): DataFrame = {
    val inv = pieces.select(col("piece")).collect().map(_.getString(0)).toSet
    val maxLen = if (inv.isEmpty) 1 else inv.iterator.map(_.length).max
    val bc = words.sparkSession.sparkContext.broadcast(inv)
    val seg = udf((w: String) =>
      maxMatchPath(w + Bpe.EndOfWord, bc.value, maxLen))
    words.select(col("w"), col("f"),
      split(seg(col("w")), " ").as("syms"))
  }

  private def utf8Lt(a: String, b: String): Boolean =
    graft.functions.Utf8Order.lt(a, b)

  /** The driver-side merge loop — [[Bpe]]'s delta-maintenance design
    * plus the WordPiece twist: symbol counts are ALSO delta-maintained,
    * and since a symbol-count change re-scores EVERY live pair
    * containing that symbol, a pair→pairs-by-symbol index re-enqueues
    * exactly the affected pairs after each merge. Heap entries carry
    * their enqueue-time score and are revalidated on dequeue against
    * the live counts (score equality ⇒ identical argmax position, so
    * a coincidentally-restored score is safe to accept); any score
    * change is caused by a pair-count or symbol-count delta, and both
    * kinds re-enqueue — so the heap can never silently miss a pair
    * whose score rose. */
  private def trainDriverSide(spark: SparkSession, seg0: DataFrame, k: Int,
      persistPath: Option[String]): (Seq[(String, String, Long, Double)], DataFrame) = {
    val words = MergeWords.collect(seg0)
    def persist(step: Int): Unit =
      MergeWords.persist(spark, words, persistPath, step)
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val symCnt = mutable.HashMap.empty[String, Long]
    val pairsBySym = mutable.HashMap.empty[String, mutable.HashSet[(String, String)]]
    val occurs = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // NET deltas per merge sweep — a touched word's -f/+f recount
    // cancels for every symbol/pair it didn't actually change, and
    // only net-changed entries may re-enqueue: flagging everything the
    // sweep merely PASSED OVER would fan out through pairsBySym (e.g.
    // '</w>' touches nearly every pair) and re-enqueue O(|pairs|)
    // unchanged scores per merge — exactly the heap blow-up the
    // delta-maintenance design exists to avoid. Per merge the only
    // nonzero symbol deltas are l, r, and l+r.
    val pairDelta = mutable.HashMap.empty[(String, String), Long]
    val symDelta = mutable.HashMap.empty[String, Long]
    // exactly the one-division-of-one-multiplication the distributed
    // form and the oracle evaluate — bit-identical IEEE arithmetic
    def score(p: (String, String)): Option[Double] =
      pairCnt.get(p).map { c =>
        c.toDouble / (symCnt(p._1).toDouble * symCnt(p._2).toDouble)
      }
    // max-heap on (score desc, l asc, r asc) — UTF-8 string order, the
    // Bpe heap's comparator with a double head
    val heap = mutable.PriorityQueue.empty[(Double, String, String)](
      new Ordering[(Double, String, String)] {
        def compare(x: (Double, String, String), y: (Double, String, String)): Int = {
          if (x._1 != y._1) return if (x._1 < y._1) -1 else 1
          if (x._2 != y._2) return if (utf8Lt(x._2, y._2)) 1 else -1
          if (x._3 != y._3) return if (utf8Lt(x._3, y._3)) 1 else -1
          0
        }
      })
    def bumpSym(s: String, d: Long): Unit = {
      val nv = symCnt.getOrElse(s, 0L) + d
      if (nv == 0L) symCnt.remove(s) else symCnt.update(s, nv)
      val nd = symDelta.getOrElse(s, 0L) + d
      if (nd == 0L) symDelta.remove(s) else symDelta.update(s, nd)
    }
    def addPairs(wi: Int, syms: ArrayBuffer[String], f: Long, sign: Long): Unit = {
      var i = 0
      while (i < syms.length) {
        bumpSym(syms(i), sign * f)
        if (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          val nv = pairCnt.getOrElse(p, 0L) + sign * f
          if (nv == 0L) {
            pairCnt.remove(p)
            pairsBySym.get(p._1).foreach(_ -= p)
            pairsBySym.get(p._2).foreach(_ -= p)
          } else {
            pairCnt.update(p, nv)
            pairsBySym.getOrElseUpdate(p._1, mutable.HashSet.empty) += p
            pairsBySym.getOrElseUpdate(p._2, mutable.HashSet.empty) += p
          }
          val nd = pairDelta.getOrElse(p, 0L) + sign * f
          if (nd == 0L) pairDelta.remove(p) else pairDelta.update(p, nd)
          if (sign > 0L) occurs.getOrElseUpdate(p, new mutable.BitSet) += wi
        }
        i += 1
      }
    }
    var wi0 = 0
    while (wi0 < words.length) {
      addPairs(wi0, words(wi0)._3, words(wi0)._2, 1L)
      wi0 += 1
    }
    pairCnt.keysIterator.foreach { p =>
      score(p).foreach(s => heap.enqueue((s, p._1, p._2)))
    }
    pairDelta.clear(); symDelta.clear()
    val out = ArrayBuffer.empty[(String, String, Long, Double)]
    var exhausted = false
    while (out.length < k && !exhausted) {
      var top: Option[(String, String, Double)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val (s, hl, hr) = heap.dequeue()
        if (score((hl, hr)).contains(s)) top = Some((hl, hr, s))
      }
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, s) = top.get
        out += ((l, r, pairCnt((l, r)), s))
        val cand = occurs.remove((l, r)).getOrElse(mutable.BitSet.empty)
        cand.foreach { wi =>
          val (_, f, syms) = words(wi)
          if (MergeWords.containsPair(syms, l, r)) {
            addPairs(wi, syms, f, -1L)
            MergeWords.mergeInPlace(syms, l, r)
            addPairs(wi, syms, f, 1L)
          }
        }
        // re-enqueue everything whose score could have moved: pairs
        // with NET count deltas, plus every live pair touching a
        // symbol with a NET count delta (per merge that is exactly
        // l, r, and l+r)
        val moved = mutable.HashSet.empty[(String, String)]
        pairDelta.keysIterator.foreach(moved += _)
        symDelta.keysIterator.foreach { sy =>
          pairsBySym.get(sy).foreach(_.foreach(moved += _))
        }
        moved.foreach { p =>
          score(p).foreach(sc => heap.enqueue((sc, p._1, p._2)))
        }
        pairDelta.clear(); symDelta.clear()
        persist(out.length)
      }
    }
    (out.toSeq, MergeWords.toDf(spark, words))
  }
}
