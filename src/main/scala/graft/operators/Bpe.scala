package graft.operators

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * tokenizer-training stage of an LLM data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"): repeatedly merge the most frequent adjacent symbol pair,
  * starting from characters plus an end-of-word marker. North-star
  * extension (the reference corpus has no analog).
  *
  * Scale shape — the whole point of doing this on an engine: the ONLY
  * corpus-scale operation is the word-frequency aggregate (one
  * map-side-combined shuffle of (word, 1) pairs). Everything after —
  * segmentation, pair counting, merge application — runs over the
  * DISTINCT-WORD table, which by Heaps' law is orders of magnitude
  * smaller than the corpus and stays fully distributed; the driver
  * sees one argmax row per merge (the [[Ivf]] bounded-driver-training
  * pattern). Each iteration re-materializes the segmentation behind a
  * [[Barrier]] so lineage stays flat across k merges.
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence, so
    * merges can learn word-final subwords (Sennrich's `</w>`). */
  val EndOfWord = "</w>"

  /** (w, f): corpus word frequencies — the single corpus-scale pass.
    * Empty tokens (doubled separators) are dropped on both engines;
    * every downstream symbol sequence therefore has length ≥ 2. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Initial segmentation: each word as its character symbols plus
    * [[EndOfWord]]. `w` is a bound attribute here, so the per-char
    * substr lambda reads an attribute, not a recomputed tree (HOF
    * binding rule). */
  def segment(wf: DataFrame): DataFrame =
    wf.select(col("w"), col("f"),
      concat(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))),
        array(lit(EndOfWord))).as("syms"))

  /** The end-of-word marker in BYTE-symbol space: [[EndOfWord]]'s own
    * UTF-8 bytes hex-rendered ("3C2F773E"), so EVERY byte-level symbol
    * — bytes, merges, and the marker alike — is a hex string. That
    * uniformity is what makes the ordering claim below unconditional:
    * a literal "</w>" among hex pairs would compare by its own bytes
    * ('<' = 0x3C) while its char-level counterpart compares the same
    * way, but ties between the marker and a byte symbol would then
    * resolve differently across the two families (hex('a') = "61"
    * starts with '6' < '<'). */
  val ByteEndOfWord: String =
    EndOfWord.getBytes("UTF-8").map(b => f"$b%02X").mkString

  /** BYTE-level initial segmentation — the GPT-2/LLaMA production
    * variant (Radford et al. 2019): each word as its UTF-8 BYTES plus
    * [[ByteEndOfWord]], every symbol a fixed-width uppercase hex
    * rendering ("ab" → [61, 62, 3C2F773E]). Because all 256 possible
    * bytes have a base symbol, EVERY word of ANY corpus segments — no
    * `[UNK]` exists anywhere in the byte-level family (the q165/
    * BpeSpec no-UNK contract), unlike the char-level family whose
    * unseen characters drop at the vocab join. The hex rendering is
    * engine-portable (DuckDB's `hex(encode(w))` produces the identical
    * string, so the oracle replays byte training verbatim) and
    * ORDER-FAITHFUL: fixed-width hex of a byte string compares exactly
    * like the bytes themselves (hex digits are ordered, width is
    * fixed, hex(a)+hex(b) = hex(a+b)), and with the marker hexed too
    * the property holds over ALL symbols — so the argmax tie-break
    * sequence of byte training is the exact hex image of char
    * training's on any single-byte-per-char corpus (BpeSpec pins the
    * isomorphism). `hx` is pre-projected to an attribute so the
    * per-pair substr lambda reads it, not a recomputed hex tree (the
    * [[segment]] binding rule). */
  def byteSegment(wf: DataFrame): DataFrame =
    wf.select(col("w"), col("f"),
        hex(org.apache.spark.sql.functions.encode(col("w"), "UTF-8")).as("hx"))
      .select(col("w"), col("f"),
        concat(
          transform(sequence(lit(1), (length(col("hx")) / 2).cast("int")),
            i => col("hx").substr(i * lit(2) - 1, lit(2))),
          array(lit(ByteEndOfWord))).as("syms"))

  /** Weighted adjacent-pair counts over a segmentation: every
    * within-word occurrence counts ("aaa" contributes (a,a) twice),
    * weighted by the word's corpus frequency. Pure integer arithmetic
    * — exactly reproducible across engines. The explode input is
    * distinct-word-sized; the aggregate output is pair-vocabulary-
    * sized. Fully-merged single-symbol words yield no pairs (the
    * guard also keeps sequence() from descending (1,0)-style). */
  def pairCounts(seg: DataFrame): DataFrame =
    seg.select(col("f"),
      explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("f")).as("cnt"))

  /** Apply one merge (l, r) → lr to every word's symbol sequence,
    * greedy left-to-right (the BPE rule: "aaa" under (a,a) becomes
    * [aa, a]). One fold over each word's own symbols — interpreted
    * HOF, but the input is the distinct-word table, never the corpus.
    * The && short-circuits, so element_at(acc, -1) is never evaluated
    * on an empty accumulator (ANSI mode throws on out-of-bounds). */
  def applyMerge(seg: DataFrame, l: String, r: String): DataFrame =
    seg.withColumn("syms",
      aggregate(col("syms"), array().cast("array<string>"),
        (acc, s) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), s))))
          .otherwise(concat(acc, array(s)))))

  /** Learn the first `k` merges: argmax pair by (count desc, l, r) —
    * the deterministic tie-break both engines can reproduce — then
    * re-segment, k times. Driver traffic is ONE row per merge; the
    * segmentation is barriered per iteration (flat lineage, the
    * k-means discipline). Stops early if no pairs remain. Returns the
    * merge list and the FINAL vocab segmentation (w, f, syms) — the
    * trained subword vocabulary [[tokenCounts]] consumes.
    *
    * `persistPath`: the [[Barrier]] durability knob. The default
    * localCheckpoint form is right for single-JVM runs; on a real
    * cluster an executor loss mid-training loses lineage-free blocks
    * and kills the job — pass a directory to write each iteration's
    * segmentation to `persistPath/seg<i>` instead (executor loss
    * re-reads files, and the per-step segmentations double as the
    * tokenizer-training audit trail).
    *
    * `driverMaxWords`: the hybrid-loop threshold. A production merge
    * count is k ≈ 32,000, and the distributed loop costs one
    * vocab-sized Spark job + one 1-row collect PER MERGE — 32k
    * sequential job schedulings over a distinct-word table that, by
    * Heaps' law, virtually always fits in driver memory anyway. So
    * when the distinct-word count is ≤ `driverMaxWords` the word table
    * is collected ONCE and the whole merge loop runs driver-side (one
    * Spark job total); the distributed loop remains the fallback for
    * corpora whose vocabulary genuinely exceeds the driver (set 0 to
    * force it). Both forms produce identical merge sequences and
    * segmentations — the argmax tie-break compares strings as UTF-8
    * bytes exactly like Spark's StringType ordering, and BpeSpec pins
    * the equality at k=8 on the real corpus. */
  def train(docs: DataFrame, textCol: String, k: Int,
      persistPath: Option[String] = None,
      driverMaxWords: Long = 2000000L): (Seq[(String, String, Long)], DataFrame) =
    trainFromWordFreq(wordFreq(docs, textCol), k, persistPath, driverMaxWords)

  /** [[train]] from an already-built `(w, f)` word-frequency table —
    * the incremental contract (symmetric with [[Dsir]]/[[NgramLm]]
    * `mergeCounts`): word counts are the training run's ONLY
    * corpus-derived state, and they merge associatively
    * ([[NgramLm.mergeCounts]] works verbatim on the 2-column (w, f)
    * shape), so a stream maintaining the word table batch-by-batch
    * retrains the tokenizer from model-sized state without re-reading
    * the corpus. BpeSpec pins two-batch merge == whole-corpus
    * training. */
  def trainFromWordFreq(wf: DataFrame, k: Int,
      persistPath: Option[String] = None,
      driverMaxWords: Long = 2000000L): (Seq[(String, String, Long)], DataFrame) =
    trainFromSegments(segment(wf), k, persistPath, driverMaxWords)

  /** [[train]] over the BYTE-level segmentation ([[byteSegment]]) —
    * the same merge loop, pair statistics, and tie-break over hex byte
    * symbols. The trained vocabulary feeds [[tokenCounts]]/[[encode]]
    * unchanged for the training corpus; for a FOREIGN corpus,
    * [[applyMerges]] over its own [[byteSegment]] segments every word
    * with zero `[UNK]`s (all 256 byte symbols exist by construction). */
  def trainBytes(docs: DataFrame, textCol: String, k: Int,
      persistPath: Option[String] = None,
      driverMaxWords: Long = 2000000L): (Seq[(String, String, Long)], DataFrame) =
    trainFromSegments(byteSegment(wordFreq(docs, textCol)), k,
      persistPath, driverMaxWords)

  /** Replay a TRAINED merge list, in learned order, over a fresh
    * [[segment]]/[[byteSegment]] segmentation — the APPLICATION half
    * of BPE for corpora the training never saw. Rank-order full-pass
    * replay is exact for any trained list: a merge's operand symbols
    * are only constructible by strictly earlier merges (that is how
    * they got frequent enough to be learned), so no earlier merge can
    * become newly applicable after a later one fires. Cost: one
    * [[applyMerge]] fold per merge over the DISTINCT-WORD table (never
    * the corpus), with a [[Barrier]] every `barrierEvery` merges to
    * keep lineage flat; production merge counts (k ≈ 32k) should
    * instead collect the word table through the [[MergeWords]] driver
    * loop — the training hybrid's threshold reasoning applies
    * verbatim to application. */
  def applyMerges(seg: DataFrame, merges: Seq[(String, String, Long)],
      barrierEvery: Int = 8): DataFrame =
    merges.zipWithIndex.foldLeft(seg) { case (s, ((l, r, _), i)) =>
      val applied = applyMerge(s, l, r)
      if ((i + 1) % barrierEvery == 0 && i + 1 < merges.length)
        Barrier.materialize(applied)
      else applied
    }

  /** The shared merge loop behind [[trainFromWordFreq]] (char
    * symbols) and [[trainBytes]] (byte symbols): hybrid driver-side/
    * distributed training from an arbitrary `(w, f, syms)` initial
    * segmentation. */
  private def trainFromSegments(seg0: DataFrame, k: Int,
      persistPath: Option[String],
      driverMaxWords: Long): (Seq[(String, String, Long)], DataFrame) = {
    require(k >= 1, "need at least one merge")
    def barrier(df: DataFrame, step: Int): DataFrame =
      Barrier.materialize(df, persistPath.map(p => s"$p/seg$step"))
    var seg = barrier(seg0, 0)
    if (seg.count() <= driverMaxWords)
      return trainDriverSide(seg.sparkSession, seg, k, persistPath)
    val out = ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (out.length < k && !exhausted) {
      val top = pairCounts(seg)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((l, r, c))
        // the FINAL merge is applied lazily in the default form:
        // learnMerges discards the segmentation, so an eager
        // localCheckpoint there would spend a full distinct-word-table
        // job on a result nobody reads — callers that consume it
        // (tokenCounts) fold it inside their own job instead. In
        // DURABLE mode the final segmentation IS the artifact the
        // audit trail exists for (the trained vocabulary), so it is
        // always written — seg<k> on disk matches the returned frame
        seg = if (out.length < k || persistPath.isDefined)
                barrier(applyMerge(seg, l, r), out.length)
              else applyMerge(seg, l, r)
      }
    }
    (out.toSeq, seg)
  }

  /** The driver-side argmax tie-break must match Spark's StringType
    * ordering exactly or the two [[train]] forms could diverge on
    * non-ASCII symbols — see [[graft.functions.Utf8Order]]. */
  private def utf8Lt(a: String, b: String): Boolean =
    graft.functions.Utf8Order.lt(a, b)

  /** The driver-side merge loop: identical semantics to the
    * distributed loop (weighted within-word pair counts, (cnt desc,
    * l, r) argmax with UTF-8 string order, greedy left-to-right
    * non-cascading merge), run over the collected word table. In
    * durable mode each step's segmentation is still written to
    * `persistPath/seg<i>` so the audit-trail contract is form-
    * independent (the frames are local, so the writes are cheap). */
  private def trainDriverSide(spark: SparkSession, seg0: DataFrame, k: Int,
      persistPath: Option[String]): (Seq[(String, String, Long)], DataFrame) = {
    val words = MergeWords.collect(seg0)
    def persist(step: Int): Unit =
      MergeWords.persist(spark, words, persistPath, step)
    // Pair counts are built once and DELTA-maintained: each merge only
    // re-counts the words it actually touched, so a k≈32,000 production
    // run costs O(touched words) per merge, not O(vocab × word length)
    // — the recount-everything form is what made the distributed loop's
    // k sequential jobs infeasible in the first place. The argmax is a
    // lazy-deletion max-heap over (count, pair) snapshots: every count
    // update pushes a fresh snapshot, dequeue skips entries whose count
    // no longer matches the live table — so picking the next merge is
    // O(log |pairs|) amortized, not a full-table scan per merge. An
    // inverted pair→word-indices occurrence index (lazy-stale, verified
    // on use) narrows each merge's word sweep to the words that have
    // EVER contained the pair — without it every merge scans the whole
    // vocabulary for containment and the loop is O(k · V) regardless of
    // the count bookkeeping.
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // max-heap: bigger count wins; on ties the UTF-8-smaller (l, r)
    // must surface FIRST (Spark's (cnt desc, l, r) orderBy), so the
    // smaller pair compares as the larger heap element.
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          if (x._1 != y._1) return if (x._1 < y._1) -1 else 1
          if (x._2 != y._2) return if (utf8Lt(x._2, y._2)) 1 else -1
          if (x._3 != y._3) return if (utf8Lt(x._3, y._3)) 1 else -1
          0
        }
      })
    def addPairs(wi: Int, syms: ArrayBuffer[String], f: Long, sign: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val nv = counts.getOrElse(p, 0L) + sign * f
        if (nv == 0L) counts.remove(p)
        else {
          counts.update(p, nv)
          heap.enqueue((nv, p._1, p._2))
        }
        if (sign > 0L) occurs.getOrElseUpdate(p, new mutable.BitSet) += wi
        i += 1
      }
    }
    var wi0 = 0
    while (wi0 < words.length) {
      addPairs(wi0, words(wi0)._3, words(wi0)._2, 1L)
      wi0 += 1
    }
    val out = ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (out.length < k && !exhausted) {
      var top: Option[(String, String, Long)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val (c, hl, hr) = heap.dequeue()
        if (counts.get((hl, hr)).contains(c)) top = Some((hl, hr, c))
      }
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = top.get
        out += ((l, r, c))
        // only words the occurrence index has ever seen the pair in —
        // stale entries (the pair has since merged away there) fail the
        // verify scan and cost one short containment check
        val cand = occurs.remove((l, r)).getOrElse(mutable.BitSet.empty)
        cand.foreach { wi =>
          val (_, f, syms) = words(wi)
          if (MergeWords.containsPair(syms, l, r)) {
            addPairs(wi, syms, f, -1L)
            MergeWords.mergeInPlace(syms, l, r)
            addPairs(wi, syms, f, 1L)
          }
        }
        persist(out.length)
      }
    }
    (out.toSeq, MergeWords.toDf(spark, words))
  }

  /** [[train]]'s merge list alone. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): Seq[(String, String, Long)] =
    train(docs, textCol, k)._1

  /** Persist a trained vocabulary segmentation — the production
    * hand-off: a tokenizer is trained ONCE and applied many times, so
    * the (w, f, syms) table is the artifact that crosses job
    * boundaries ([[loadVocab]] is the consumer side). Plain parquet:
    * durable, partition-prunable, and readable by any engine for
    * audits. */
  def saveVocab(vocabSeg: DataFrame, path: String): Unit =
    vocabSeg.select(col("w"), col("f"), col("syms"))
      .write.mode("overwrite").parquet(path)

  /** Load a [[saveVocab]]'d (or durable-mode `persistPath/seg<k>`)
    * vocabulary for [[tokenCounts]]/[[encode]]. BpeSpec pins
    * disk-loaded == freshly-trained. */
  def loadVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Tokenize the corpus under a trained vocabulary: per-document BPE
    * token counts — the budgeting input for packing ([[CorpusPrep
    * .packSequential]]) and per-doc cost accounting. The corpus is
    * NEVER re-segmented word by word: subword counts live on the
    * vocab table (one row per distinct word) and the word occurrences
    * meet it in a vocab-keyed join fused into the scan stage — with
    * the vocab broadcast (it fits whenever the tokenizer itself
    * would), the per-doc aggregate partial-combines map-side and the
    * ONLY exchange carries one row per document. At a vocabulary too
    * big to broadcast, pre-aggregate (idCol, w) multiplicities before
    * the then-shuffled join so hot words collapse map-side first.
    * OOV words of a foreign corpus drop (inner join). Output:
    * (idCol, n_words, n_tokens). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      vocabSeg: DataFrame): DataFrame = {
    val vocab = vocabSeg.select(col("w"), size(col("syms")).as("n_sub"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(vocab), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_tokens"))
  }

  /** Emit the subword-tokenized TEXT per document — the tokenizer
    * hand-off artifact ([[tokenCounts]]'s sibling when downstream
    * wants the token stream, not just its price). Same scale shape:
    * word occurrences meet the broadcast vocab (word → space-joined
    * subwords) in the scan stage, then ONE id-keyed shuffle
    * reassembles each document from its own positioned words — the
    * [[Dedup]] reassemble idiom, collect_list bounded by a single
    * document's word count, never a cross-document set. OOV words of
    * a foreign corpus drop (inner join). Output:
    * (idCol, bpe_text, n_tokens). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      vocabSeg: DataFrame, outCol: String = "bpe_text"): DataFrame = {
    val vocab = vocabSeg.select(col("w"),
      concat_ws(" ", col("syms")).as("sub"),
      size(col("syms")).as("n_sub"))
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .join(broadcast(vocab), "w")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", graft.functions.Text.inPositionOrder(
          collect_list(struct(col("pos"), col("sub"))), "sub")).as(outCol),
        sum(col("n_sub")).as("n_tokens"))
  }
}
