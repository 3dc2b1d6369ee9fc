package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Utf8Order

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * mainstream subword family next to [[Bpe]] (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates"): seed a candidate-piece vocabulary
  * from frequent substrings, EM over the corpus, prune to a target
  * vocabulary. This is the hard-EM (Viterbi) variant: the E-step
  * segments each word by its single best path under the current piece
  * scores and counts pieces along it, the M-step re-estimates scores
  * from those counts — integer counts, so each step is exactly
  * reproducible across engines.
  *
  * Cross-engine arithmetic contract: piece scores are FIXED-POINT
  * log-probabilities `lp(piece) = round(ln(c/T)·1e6)` (micro-nats, a
  * BIGINT). The one double expression (ln, mirrored verbatim in the
  * DuckDB oracle — the q111 idiom) happens once per piece; the Viterbi
  * DP then compares pure integer sums, so path selection cannot drift
  * on float summation order. Score ties — common, e.g. the same piece
  * multiset in a different order — break to the UTF-8-lexicographically
  * smallest path string, which both engines reproduce exactly.
  *
  * Scale shape (the [[Bpe]] family discipline): the ONLY corpus-scale
  * operation is the word-frequency aggregate (one map-side-combined
  * shuffle). Seeding, quantization, Viterbi segmentation, and E-step
  * counting all run over the DISTINCT-WORD table (Heaps' law: ≪
  * corpus), fully distributed; the piece table is bounded by
  * minCount-pruned frequent substrings of length ≤ maxPieceLen
  * (alphabet- and vocab-bounded) and broadcasts to the Viterbi UDF. At
  * a piece table too big to broadcast, the DP joins piece-by-position
  * instead — the shape the DuckDB oracle spells — at one vocab-sized
  * join per position.
  */
object UnigramLm {

  /** Distinct-word frequencies, capped at `maxWordLen` characters —
    * the cap bounds the oracle's DP chain and drops nothing real at
    * sane settings (URLs and digit strings beyond it are not
    * vocabulary); mirrored in the oracle so both engines segment the
    * same word set. */
  def wordTable(docs: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    Bpe.wordFreq(docs, textCol).where(length(col("w")) <= maxWordLen)

  /** Seed pieces: every substring of length 1..`maxPieceLen` of every
    * word, counted with within-word multiplicity and weighted by word
    * frequency; keep frequent ones (`c >= minCount`) plus ALL single
    * characters (the coverage floor — every word stays segmentable).
    * Output: (piece, c). */
  def seedPieces(wf: DataFrame, maxPieceLen: Int, minCount: Long): DataFrame =
    wf.select(col("f"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), s =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - s + 1)),
            pl => col("w").substr(s, pl))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("c"))
      .where(col("c") >= minCount || length(col("piece")) === 1)

  /** Fixed-point scores: `lp = round(ln(c/T)·1e6)` micro-nats with
    * `T = Σc` — the single double expression of the operator. Output:
    * (piece, c, lp). */
  def quantize(pieces: DataFrame): DataFrame = {
    val total = pieces.agg(sum(col("c")).as("t"))
    pieces.crossJoin(broadcast(total))
      .select(col("piece"), col("c"),
        round(log(col("c").cast("double") / col("t")) * 1e6, 0)
          .cast("long").as("lp"))
  }

  /** Viterbi-best segmentation of one word: maximize the integer lp
    * sum; break exact ties to the UTF-8-smallest path string (both
    * sides of the tie-break are engine-reproducible — see the
    * class-level contract). Left-to-right DP over end positions;
    * pieces are at most `maxPieceLen` chars, so each position looks
    * back a constant window. */
  private[operators] def viterbiPath(w: String, lp: collection.Map[String, Long],
      maxPieceLen: Int): String = {
    val n = w.length
    val score = new Array[Long](n + 1)
    val path = new Array[String](n + 1)
    java.util.Arrays.fill(score, Long.MinValue)
    score(0) = 0L
    path(0) = ""
    var j = 1
    while (j <= n) {
      var bestS = Long.MinValue
      var bestP: String = null
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (score(i) != Long.MinValue) {
          val piece = w.substring(i, j)
          lp.get(piece) match {
            case Some(v) =>
              val s2 = score(i) + v
              val p2 = if (i == 0) piece else path(i) + " " + piece
              if (s2 > bestS || (s2 == bestS && Utf8Order.lt(p2, bestP))) {
                bestS = s2
                bestP = p2
              }
            case None =>
          }
        }
        i += 1
      }
      score(j) = bestS
      path(j) = bestP
      j += 1
    }
    path(n)
  }

  /** Segment every distinct word under the current piece scores:
    * (w, f, path) with `path` the space-joined Viterbi pieces. The
    * piece table collects once (bounded — frequent substrings) and
    * broadcasts; the DP is a pure per-row function over the
    * distinct-word table, no shuffle at all. */
  def viterbiSegments(wf: DataFrame, pieces: DataFrame, maxPieceLen: Int): DataFrame = {
    val lpMap = pieces.select(col("piece"), col("lp")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = wf.sparkSession.sparkContext.broadcast(lpMap)
    val seg = udf((w: String) => viterbiPath(w, bc.value, maxPieceLen))
    wf.select(col("w"), col("f"), seg(col("w")).as("path"))
  }

  /** Piece counts along already-computed Viterbi segmentations —
    * [[emStep]]'s counting half, split out so a materialized
    * segmentation table can be shared across its consumers. */
  def countsFromSegments(segments: DataFrame): DataFrame =
    segments
      .select(col("f"), explode(split(col("path"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("c"))

  /** One hard-EM E-step: piece counts along the Viterbi segmentations,
    * weighted by word frequency — the sufficient statistic the M-step
    * ([[quantize]]) re-estimates from. Output: (piece, c), vocab-sized,
    * pieces unused by every path drop out. */
  def emStep(wf: DataFrame, pieces: DataFrame, maxPieceLen: Int): DataFrame =
    countsFromSegments(viterbiSegments(wf, pieces, maxPieceLen))

  /** A Viterbi segmentation table in [[Bpe]]'s `(w, f, syms)` vocab
    * shape, so the BPE APPLICATION operators work verbatim on a
    * trained unigram vocabulary: `Bpe.tokenCounts` prices documents in
    * unigram-LM tokens and `Bpe.encode` emits the segmented stream —
    * the two tokenizer families differ in how the segmentation is
    * LEARNED, not in how it is applied. */
  def vocabFromSegments(segments: DataFrame): DataFrame =
    segments.select(col("w"), col("f"), split(col("path"), " ").as("syms"))

  /** Full training loop: seed → `iters` hard-EM rounds → prune to the
    * target MULTI-char vocabulary (single characters always survive —
    * the SentencePiece character-coverage rule — with a count floor of
    * 1 when an iteration stops using one, so every word remains
    * segmentable at every step). Returns the final scored vocabulary
    * (piece, c, lp). UnigramLmSpec grades conservation (paths always
    * re-concatenate to their word), the floor, and the prune. */
  def train(docs: DataFrame, textCol: String, iters: Int, vocabTarget: Int,
      maxWordLen: Int = 16, maxPieceLen: Int = 4, minCount: Long = 5L): DataFrame = {
    require(iters >= 1 && vocabTarget >= 1)
    val wf = Barrier.materialize(wordTable(docs, textCol, maxWordLen))
    val singles = Barrier.materialize(
      seedPieces(wf, maxPieceLen, minCount)
        .where(length(col("piece")) === 1).select(col("piece")))
    def floored(counts: DataFrame): DataFrame =
      counts.unionByName(
        singles.join(counts, Seq("piece"), "left_anti")
          .select(col("piece"), lit(1L).as("c")))
    var pieces = quantize(seedPieces(wf, maxPieceLen, minCount))
    for (_ <- 1 to iters)
      pieces = quantize(floored(emStep(wf, pieces, maxPieceLen)))
    val multis = pieces.where(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece")).limit(vocabTarget)
    pieces.where(length(col("piece")) === 1).unionByName(multis)
  }
}
