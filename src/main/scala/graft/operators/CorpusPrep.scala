package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import graft.functions.Text

/** Training-data preparation operators over a document corpus: sliding-
  * window chunking, sequential sequence-packing, and TF-IDF keyword
  * extraction. North-star extensions (no reference analog) — the
  * operations an LLM data pipeline applies between dedup
  * ([[Dedup]]) and tokenizer hand-off.
  *
  * All three are pure DataFrame programs: chunking is a narrow
  * generator (no shuffle), packing is a per-shard window, TF-IDF is
  * two partial-aggregated shuffles and a join — each shape survives a
  * 100 TB corpus (see per-method notes).
  */
object CorpusPrep {

  private def toks(textCol: Column): Column = split(textCol, " ")

  /** Sliding-window chunking: split each document's token stream into
    * overlapping windows of `size` tokens advancing by `stride`
    * (stride < size ⇒ overlap = size − stride, the context-continuity
    * trick). The last window may be shorter; a document shorter than
    * `size` yields exactly one chunk.
    *
    * Scale: `explode` over a per-row `sequence` — a narrow generator
    * inside the scan stage, zero shuffles, output rows ∝ input tokens.
    */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, s"need 0 < stride <= size")
    val t = toks(col(textCol))
    // NULL text yields ZERO chunks: size(NULL array) is -1, which
    // un-guarded satisfies n <= size and fabricates one chunk with
    // chunk_text = '' and a NEGATIVE chunk_len that poisons token
    // accounting downstream — and a SQL oracle's NULL propagation
    // (len(NULL) → NULL → range(NULL) → no rows) emits nothing for
    // such docs. The explode guard exists because sequence(0, -1)
    // DESCENDS (the tokenChunks lesson); empty array → row dropped.
    val nChunks = when(col(textCol).isNull, lit(0))
      .when(F.size(t) <= size, lit(1))
      .otherwise(ceil((F.size(t) - lit(size)).cast("double") / stride).cast("int") + 1)
    docs.select(col(idCol), t.as("t"), F.size(t).as("n_toks"), nChunks.as("n_chunks"))
      .select(col(idCol), col("t"), col("n_toks"),
        explode(when(col("n_chunks") > 0,
            sequence(lit(0), col("n_chunks") - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        concat_ws(" ", slice(col("t"), col("chunk_id") * stride + 1, lit(size)))
          .as("chunk_text"),
        least(lit(size), col("n_toks") - col("chunk_id") * stride).as("chunk_len"))
  }

  /** Content-defined chunking (the FastCDC/rsync idea at token
    * granularity): cut AFTER any position whose trailing trigram
    * hashes to 0 mod `modulus` — so boundaries are decided by LOCAL
    * content, not absolute offsets, and an insertion near the start
    * of a document shifts only the chunks it touches while every
    * later chunk's CONTENT (and hence its dedup hash) is unchanged.
    * Fixed-window chunking (q53) re-cuts everything after an
    * insertion; this is the chunker that keeps chunk-level dedup
    * effective against shifted/prepended boilerplate
    * (CorpusPrepSpec pins the shift-stability property).
    * Expected chunk length ≈ `modulus` tokens.
    *
    * Scale: one doc-keyed window exchange (lag×2 for the trigram,
    * one running-sum for the chunk id, the reassembly agg — all in
    * the same partitioning; bucketing by id removes the exchange).
    * Output: (idCol, chunk_id, chunk_text, n_toks).
    */
  def chunkContentDefined(docs: DataFrame, idCol: String, textCol: String,
      modulus: Int): DataFrame = {
    require(modulus >= 2, s"need modulus >= 2, got $modulus")
    val e = docs.select(col(idCol),
      posexplode(toks(col(textCol))).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("tok"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val tri = concat_ws(" ", lag(col("tok"), 2).over(w),
      lag(col("tok"), 1).over(w), col("tok"))
    val marker = when(col("pos") >= 3 &&
      pmod(conv(substring(md5(tri), 1, 13), 16, 10).cast("long"),
        lit(modulus.toLong)) === 0, lit(1)).otherwise(lit(0))
    val marked = e.select(col(idCol), col("pos"), col("tok"),
      marker.as("marker"))
    val chunkId = coalesce(
      sum(col("marker")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    marked
      .select(col(idCol), col("pos"), col("tok"), chunkId.as("chunk_id"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(Text.positionedConcat(col("pos"), col("tok")).as("chunk_text"),
        count(lit(1)).as("n_toks"))
  }

  /** Sequential sequence-packing: lay documents end-to-end per shard
    * and record, for each document, which fixed-`budget` token sequence
    * it starts in (`seq_id`) and at which offset. This is the
    * "concatenate then split at budget boundaries" packing used for
    * pre-training batches (documents may straddle two sequences).
    *
    * Packing is inherently sequential, so it is SHARDED: the running
    * total runs inside each `shardCol` partition (a per-shard window),
    * never globally — a global ORDER BY window would serialize the
    * corpus through one task at 100 TB. Shards pack independently;
    * choose the shard key to balance token mass (e.g. hash of doc id).
    */
  def packSequential(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shardCol: Column): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), shardCol.as("shard"),
        size(toks(col(textCol))).as("n_toks"))
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_toks"),
        expr(s"cum_before div $budget").as("seq_id"),
        pmod(col("cum_before"), lit(budget)).as("offset"))
  }

  /** Greedy NO-SPLIT sequence packing: within each shard, walk
    * documents in id order and append each to the current `budget`-token
    * bin if it fits, else close the bin and start a new one. Unlike
    * [[packSequential]], a document NEVER straddles two sequences —
    * the packing used for SFT/instruction batches, where splitting an
    * example mid-thought corrupts it and cross-document attention must
    * be maskable per bin. The price is padding: `budget − fill` wasted
    * tokens per closed bin (the first-fit waste the caller trades
    * against split-free examples). A document longer than `budget`
    * gets a bin of its own (overflowing it — truncation is a separate,
    * explicit step; silently dropping oversize docs here would bias
    * the corpus).
    *
    * Output: (idCol, shard, n_toks, bin_id, offset) — `bin_id` counts
    * from 0 per shard, `offset` is the token position within the bin.
    *
    * Scale: the greedy fold is inherently sequential, so — exactly as
    * [[packSequential]] — it is SHARDED: one hash exchange on `shard`,
    * a per-partition sort, and a single O(rows) pass per partition
    * (`mapPartitions`, state reset at each shard boundary, so many
    * shards per task is fine). No window, no join, nothing
    * driver-side; shards pack independently and in parallel. This is
    * the rare operator where per-partition imperative logic is the
    * honest spelling: a running-capacity fold has no closed
    * prefix-sum form (bin boundaries depend on every prior decision),
    * so a window cannot express it and a recursive join would be a
    * shuffle per document.
    */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shardCol: Column): DataFrame =
    packGreedyByLen(
      docs.select(col(idCol),
        // NULL-text docs carry zero tokens (mirror the oracle's
        // coalesce(len(...), 0)) rather than poisoning the fold
        coalesce(size(toks(col(textCol))), lit(0)).cast("long").as("n_toks")),
      idCol, "n_toks", budget, shardCol)

  /** [[packGreedy]] over a PRE-COMPUTED per-document length column —
    * the production entry point when the budget is priced in trained-
    * tokenizer tokens (q150 packs on q108's BPE `n_tokens`), not
    * whitespace words. Same plan: project to (id, shard, len), one
    * fixed-width shard exchange, per-partition greedy fold. */
  /** `sortByLenDesc`: walk each shard longest-document-first instead
    * of id order — the first-fit-DECREASING heuristic. Batching
    * similar lengths shrinks per-bin padding substantially (q151
    * prices all three packers on the corpus) at the cost of giving up
    * document order within the shard; use when the downstream shuffle
    * (q95) randomizes order anyway. */
  def packGreedyByLen(docs: DataFrame, idCol: String, lenCol: String,
      budget: Int, shardCol: Column,
      sortByLenDesc: Boolean = false): DataFrame =
    greedyFold(docs, idCol, lenCol, budget, shardCol, sortByLenDesc,
      Map.empty)

  /** ONE greedy fold serves every packer entry point — the id-order
    * form, the length-sorted form, and the resumed form are all this
    * recurrence with different walk orders / initial states, so a fix
    * to the (subtle) first-doc-seed vs overflow-close rule can never
    * drift between them. */
  private def greedyFold(docs: DataFrame, idCol: String, lenCol: String,
      budget: Int, shardCol: Column, sortByLenDesc: Boolean,
      initState: Map[Long, (Long, Long)]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val order = if (sortByLenDesc)
      Seq(col("shard"), col(lenCol).desc, col(idCol))
    else Seq(col("shard"), col(idCol))
    val base = docs.select(col(idCol).cast("long"),
        shardCol.cast("long").as("shard"),
        col(lenCol).cast("long"))
      .repartition(col("shard"))
      .sortWithinPartitions(order: _*)
      .as[(Long, Long, Long)]
    base.mapPartitions { rows =>
      var shard = Long.MinValue
      var binId = 0L
      var fill = 0L
      var virgin = false
      rows.map { case (id, sh, n) =>
        if (sh != shard) {
          shard = sh
          initState.get(sh) match {
            case Some((b, f)) => binId = b; fill = f; virgin = false
            case None => binId = 0L; fill = 0L; virgin = true
          }
        }
        // a VIRGIN shard's first document always enters bin 0 (even
        // oversize — its own overflowed bin); every later document —
        // including the first of a RESUMED shard, which is not first
        // in the walk — closes the current bin UNCONDITIONALLY on
        // overflow, including a fill-0 bin left by zero-token
        // documents: the exact recurrence the oracle's recursive CTE
        // spells, so the two can never diverge on the degenerate
        // [oversize, 0-token, oversize] sequence
        val off =
          if (virgin) { virgin = false; 0L }
          else {
            if (fill + n > budget) { binId += 1L; fill = 0L }
            fill
          }
        fill += n
        (id, sh, n, binId, off)
      }
    }.toDF(idCol, "shard", lenCol, "bin_id", "offset")
  }

  /** Trainer-facing PACK MANIFEST over [[packGreedy]]'s assignment:
    * one row per document with its token SPAN inside its bin —
    * (id, shard, bin_id, start_tok, end_tok) plus the bin's fill and
    * right-padding. This is the artifact a training loop actually
    * consumes from a no-split pack: span boundaries drive the
    * block-diagonal attention mask (tokens attend within their own
    * document only) and position_ids resets, `n_pad` prices the
    * padding the loss mask skips, and (id → shard, bin, span) is the
    * provenance map back from any training sequence to its source
    * documents. Spans within a bin are contiguous by construction
    * (doc k+1 starts where doc k ends — CorpusPrepSpec pins the
    * invariant corpus-wide); `bin_fill > budget` only on the declared
    * single-oversize-doc bins, where `n_pad` clamps to 0.
    *
    * Scale: [[packGreedy]]'s ONE fixed-width shard exchange plus one
    * window over the (shard, bin) key of the already-fixed-width
    * assignment — text never moves, the manifest is O(docs) narrow
    * rows. */
  def packManifest(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shardCol: Column): DataFrame = {
    val packed = packGreedy(docs, idCol, textCol, budget, shardCol)
    val w = Window.partitionBy(col("shard"), col("bin_id"))
    packed.select(col(idCol), col("shard"), col("bin_id"),
        col("offset").as("start_tok"),
        (col("offset") + col("n_toks")).as("end_tok"))
      .withColumn("bin_fill", max(col("end_tok")).over(w))
      .withColumn("n_pad",
        greatest(lit(0L), lit(budget.toLong) - col("bin_fill")))
  }

  /** Render (prompt, response) examples into ONE training string with
    * role sentinels, emitting the LOSS-MASK span of the response — the
    * chat-template step between an SFT recipe's example pairs and the
    * packer: instruction tuning computes loss ONLY on the assistant
    * turn (plus the end-of-turn token the model must learn to emit),
    * so each rendered example carries [target_start, target_end) in
    * the SAME whitespace-token units the packers budget in — compose
    * with [[packManifest]] and each example's loss span inside its
    * bin is `bin_start_tok + target_start` onward.
    *
    * Layout (sentinels are ordinary space-delimited tokens, so token
    * arithmetic is exact and engine-portable):
    *
    *   <|system|> {system} <|user|> {prompt} <|assistant|> {response} <|end|>
    *
    * target_start = first response token (0-based); target_end is
    * EXCLUSIVE and includes `<|end|>` (the stop token is trained);
    * `n_toks` = target_end = the rendered string's total token count
    * (CorpusPrepSpec pins the arithmetic by re-splitting). Zero
    * shuffles — one projection; the q30 zero-shuffle class. */
  def renderChatTemplate(pairs: DataFrame, idCol: String,
      promptCol: String, responseCol: String,
      system: String = "You are a helpful assistant."): DataFrame = {
    // The system prompt's token count enters the span arithmetic as a
    // driver-side constant, so its tokenization must be EXACTLY what a
    // re-split of the rendered string sees: leading/trailing/double
    // spaces would make Scala's split (which drops trailing empties)
    // disagree with the trainer-side whitespace split and shift every
    // span by silent off-by-ones — reject them, along with sentinel
    // text that would forge role boundaries.
    require(system.nonEmpty && !system.contains("<|"),
      "system prompt must be plain text (sentinels are reserved)")
    require(system.trim == system && !system.contains("  "),
      "system prompt must have no leading/trailing/double spaces — " +
        "its token count is span arithmetic")
    val nSys = system.split(" ").length.toLong
    // Per-row data guards, in-plan (the weightedSample raise_error
    // idiom): a NULL prompt/response would shift spans silently
    // (size(split(null)) = -1 while concat_ws SKIPS the null field),
    // and sentinel text inside the DATA would forge role boundaries —
    // a response containing '<|end|>' loss-trains a premature stop,
    // a prompt containing '<|assistant|>' injects a fake turn. Both
    // are upstream corpus bugs that must fail the job, not ship
    // silently into a training batch.
    def guarded(c: String, what: String): Column =
      when(col(c).isNull, raise_error(concat(
          lit(s"renderChatTemplate: NULL $what for id "),
          col(idCol).cast("string"))).cast("string"))
        .when(col(c).contains("<|"), raise_error(concat(
          lit(s"renderChatTemplate: reserved sentinel '<|' inside $what for id "),
          col(idCol).cast("string"))).cast("string"))
        .otherwise(col(c))
    val p = guarded(promptCol, "prompt")
    val r = guarded(responseCol, "response")
    val nP = F.size(split(p, " ")).cast("long")
    val nR = F.size(split(r, " ")).cast("long")
    val start = lit(1L) + lit(nSys) + lit(1L) + nP + lit(1L)
    pairs.select(col(idCol),
      concat_ws(" ", lit("<|system|>"), lit(system), lit("<|user|>"),
        p, lit("<|assistant|>"), r, lit("<|end|>")).as("chat_text"),
      start.as("target_start"),
      (start + nR + lit(1L)).as("target_end"),
      (start + nR + lit(1L)).as("n_toks"))
  }

  /** Exact per-group token-length quantiles WITHOUT a global sort:
    * the (length → #docs) count histogram is a sufficient statistic
    * (the [[vocabCoverage]] idiom pointed at lengths), so the p-th
    * quantile is the smallest length whose cumulative doc count
    * reaches ⌈p·n/100⌉ — the comparison kept in integers
    * (100·cum ≥ p·n), bit-matching a naive ranked scan. This is the
    * sequence-length planning input for packing budgets (q151): p50
    * sizes the typical bin, p99 bounds the oversize tail.
    *
    * Scale: ONE partial-aggregated (group, length) exchange — bounded
    * by groups × distinct lengths, NOT corpus size — then a window
    * over the tiny histogram and a generator for the p values. A
    * sort-based quantile would shuffle every document row; this
    * never does.
    */
  def lengthQuantiles(docs: DataFrame, groupCol: String, textCol: String,
      ps: Seq[Int]): DataFrame =
    lengthQuantilesByLen(
      docs.select(col(groupCol), coalesce(F.size(toks(col(textCol))), lit(0))
        .cast("long").as("len")),
      groupCol, "len", ps)

  /** [[lengthQuantiles]] over a PRE-COMPUTED length column — so a
    * caller that already carries per-doc lengths (q156's datacard
    * base) feeds them in instead of paying a second corpus scan and
    * re-tokenization (the packGreedyByLen split-entry-point idiom). */
  def lengthQuantilesByLen(rows: DataFrame, groupCol: String,
      lenCol: String, ps: Seq[Int]): DataFrame =
    lengthQuantilesFromHist(
      rows.select(col(groupCol), col(lenCol).cast("long").as("len"))
        .groupBy(col(groupCol), col("len")).agg(count(lit(1)).as("cnt")),
      groupCol, "len", "cnt", ps)

  /** The quantile walk over an ALREADY-built (group, length → #docs)
    * histogram — the histogram is the operator's sufficient statistic
    * AND it is mergeable by plain count addition, so per-batch
    * histograms summed into a store yield EXACTLY the whole-corpus
    * quantiles (StreamsSpec pins the foreachBatch form — quantiles
    * join the mergeable-store family without any sketch
    * approximation). */
  def lengthQuantilesFromHist(hist: DataFrame, groupCol: String,
      lenCol: String, cntCol: String, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must lie in [1, 100], got $ps")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(lenCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col(cntCol)).over(w))
      .withColumn("n", sum(col(cntCol))
        .over(Window.partitionBy(col(groupCol))))
      .select(col(groupCol), col(lenCol).as("len"), col("cum"), col("n"),
        explode(array(ps.map(lit(_)): _*)).as("p"))
      .filter(col("cum") * 100 >= col("p") * col("n"))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col("len")).as("q_len"))
  }

  /** Select documents to a TOKEN budget in quality order — the
    * "keep the best X tokens" curation step (classifier-scored corpus
    * trimming): documents ranked by (score desc, id asc) are taken
    * while the running token total stays ≤ `budget`.
    *
    * Exact WITHOUT the global sort that ranking implies: the
    * (score → token mass) class histogram carries the cross-class
    * running totals (classes ≪ corpus — scores are rounded), and
    * documents rank only WITHIN their own score class (a
    * class-partitioned window, parallel across classes — never one
    * global ordering task). cum_before(class) + within-class prefix
    * IS the global ranked running total, so the result equals the
    * naive ranked prefix scan — the oracle runs that spelling and
    * the hash proves the equivalence. Columns:
    * (idCol, scoreCol, lenCol).
    *
    * Scale: one class-histogram aggregate (bounded by distinct
    * rounded scores), one windowed cumsum over that histogram (class
    * count ≪ corpus — single-partition by construction, documented),
    * one class table joined back (broadcast while classes are small),
    * one class-partitioned window. Nothing corpus-sized sorts
    * globally.
    */
  def selectToBudget(docs: DataFrame, idCol: String, scoreCol: String,
      lenCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val hist = docs.groupBy(col(scoreCol))
      .agg(sum(col(lenCol)).as("class_tokens"))
    val wq = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val classes = hist
      .withColumn("cum", sum(col("class_tokens")).over(wq))
      .withColumn("cum_before", col("cum") - col("class_tokens"))
    val joined = docs.join(broadcast(classes.select(col(scoreCol),
      col("cum_before"))), Seq(scoreCol))
    val wd = Window.partitionBy(col(scoreCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cum_before (whole classes above) + dcum (within-class prefix)
    // IS the global ranked running total — one comparison, exactly
    // the oracle's naive ranked-prefix spelling, zero-length edge
    // cases included
    joined
      .withColumn("dcum", sum(col(lenCol)).over(wd))
      .filter(col("cum_before") + col("dcum") <= budget)
      .select(col(idCol), col(scoreCol), col(lenCol))
  }

  /** Per-shard tail state of a [[packGreedy]]/[[packGreedyByLen]]
    * result: the open (last) bin's id and fill — everything the
    * greedy fold needs to RESUME. One aggregate over the fixed-width
    * assignment table; rows = shards. */
  def packTailState(packed: DataFrame, lenCol: String): DataFrame = {
    val last = packed.groupBy(col("shard")).agg(max(col("bin_id")).as("bin_id"))
    packed.join(last, Seq("shard", "bin_id"))
      .groupBy(col("shard"), col("bin_id"))
      .agg(sum(col(lenCol)).as("fill"))
  }

  /** Resume greedy packing from a persisted [[packTailState]]: the
    * incremental form of the packer family (the DSIR/Count-Min/
    * novelty merge-contract story, pointed at batch assembly). When
    * new documents arrive strictly after the packed corpus in each
    * shard's walk order (monotonic ids — the append-only ingest
    * case), resuming from the tail state yields EXACTLY the
    * whole-corpus pack: earlier batches are never re-read, only the
    * shards-sized state table is (CorpusPrepSpec pins the equality).
    * A shard absent from the state packs from scratch.
    *
    * The state is collected and closed over (bounded: one row per
    * shard — the shard count is the operator's own parallelism knob,
    * thousands at most).
    */
  def packGreedyResume(docs: DataFrame, idCol: String, lenCol: String,
      budget: Int, shardCol: Column, state: DataFrame): DataFrame = {
    val init: Map[Long, (Long, Long)] = state
      .select(col("shard").cast("long"), col("bin_id").cast("long"),
        col("fill").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    greedyFold(docs, idCol, lenCol, budget, shardCol,
      sortByLenDesc = false, init)
  }

  /** The NEXT tail state after [[packGreedyResume]] packed a batch:
    * [[packTailState]] over the batch's assignments counts only the
    * BATCH's contribution to each shard's open bin, so the previous
    * state must be folded in — a shard whose open bin the batch
    * CONTINUED (same bin id) adds the carried-over fill, a shard the
    * batch moved past that bin starts its new open bin from the batch
    * rows alone, and a shard the batch never touched keeps its stored
    * row verbatim. Deriving the next state any other way (the batch
    * tail alone) understates continued bins and breaks the
    * resume-equals-whole-pack equality from the THIRD batch on
    * (StreamsSpec runs three batches to pin exactly this). */
  def packTailStateMerged(packedBatch: DataFrame, lenCol: String,
      prevState: DataFrame): DataFrame = {
    val b = packTailState(packedBatch, lenCol)
      .select(col("shard"), col("bin_id").as("b_bin"),
        col("fill").as("b_fill"))
    val p = prevState.select(col("shard"), col("bin_id").as("p_bin"),
      col("fill").as("p_fill"))
    b.join(p, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("b_bin"), col("p_bin")).as("bin_id"),
        (coalesce(col("b_fill"), lit(0L)) +
          when(col("b_bin").isNull, coalesce(col("p_fill"), lit(0L)))
            .when(col("p_bin") === col("b_bin"), col("p_fill"))
            .otherwise(lit(0L))).as("fill"))
  }

  /** Best-fit-decreasing bin packing: walk each shard longest-
    * document-first with ALL bins open, placing each document into the
    * FULLEST bin that still fits it (ties → lowest bin id), opening a
    * new bin only when none fits. The classic offline bin-packing
    * heuristic (11/9·OPT + 6/9 guarantee class) — q151 measures it
    * cutting the single-open-bin greedy's padding from 15.1% to 3.5%
    * on the corpus (the per-shard theoretical minimum bin count),
    * because keeping bins open lets the short tail backfill the gaps
    * the long documents leave.
    *
    * Same sharded-sequential plan as [[packGreedyByLen]] (one
    * fixed-width exchange, per-partition fold); the fold state grows
    * to O(bins-per-shard) — bins ≈ shard tokens / budget, so the
    * shard-sizing knob that already bounds task input bounds this
    * too. Placement is a TreeMap lookup: O(log bins) per document.
    * Output: (idCol, shard, lenCol, bin_id, offset); document order
    * within a bin follows the length-sorted walk, so downstream
    * should epoch-shuffle (q95) as usual.
    */
  def packBestFitDecreasing(docs: DataFrame, idCol: String, lenCol: String,
      budget: Int, shardCol: Column): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long"),
        shardCol.cast("long").as("shard"),
        col(lenCol).cast("long"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(lenCol).desc, col(idCol))
      .as[(Long, Long, Long)]
    base.mapPartitions { rows =>
      var shard = Long.MinValue
      var fills: scala.collection.mutable.ArrayBuffer[Long] = null
      // remaining capacity -> bin ids at that capacity (only bins with
      // remaining >= 0 are indexed; an overflowed bin can never fit
      // anything again)
      var byRemaining: java.util.TreeMap[Long, java.util.TreeSet[Integer]] = null
      rows.map { case (id, sh, n) =>
        if (sh != shard) {
          shard = sh
          fills = scala.collection.mutable.ArrayBuffer.empty[Long]
          byRemaining = new java.util.TreeMap[Long, java.util.TreeSet[Integer]]
        }
        def index(bin: Int): Unit = {
          val rem = budget - fills(bin)
          if (rem >= 0L)
            byRemaining.computeIfAbsent(rem, _ => new java.util.TreeSet[Integer]())
              .add(bin)
        }
        val e = byRemaining.ceilingEntry(n)
        val bin = if (e == null) {
          fills += 0L
          val b = fills.size - 1
          b
        } else {
          val b = e.getValue.first.intValue
          e.getValue.remove(Integer.valueOf(b))
          if (e.getValue.isEmpty) byRemaining.remove(e.getKey)
          b
        }
        val off = fills(bin)
        fills(bin) += n
        index(bin)
        (id, sh, n, bin.toLong, off)
      }
    }.toDF(idCol, "shard", lenCol, "bin_id", "offset")
  }

  /** T5-style span corruption (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning…" §3.1.4): mask contiguous token
    * spans and emit the (input, target) pair of the denoising
    * objective — input = text with each span replaced by its sentinel
    * token, target = the sentinels followed by the tokens they hide.
    *
    * Span placement is a DETERMINISTIC GRID, not an RNG walk: positions
    * partition into `block`-token blocks; each COMPLETE block masks
    * exactly one `spanLen`-token span whose offset is a seeded md5
    * hash of (doc, block) — ≈ spanLen/block corruption rate (T5's 15%
    * at 3/20). The grid keeps every decision block-local, so the
    * operator is one zero-shuffle generator + one per-doc reassembly
    * (no sequential scan, no driver state), reruns are bit-identical
    * across partitionings and engines (the md5-prefix idiom
    * [[weightedSample]] pinned cross-engine), and the incomplete tail
    * block is left unmasked rather than masking a short span (a
    * truncated span would change the corruption rate near doc ends).
    * Sentinels are grid-indexed (`<extra_id_<block>>`), so they are
    * unique and ordered within a document.
    *
    * Scale: posexplode → per-position expressions (all codegen'd,
    * hash included) → ONE doc-keyed exchange for the ordered
    * reassembly (the dedupLines collect idiom, bounded by each doc's
    * own token count) — bucketing the corpus by `idCol` removes even
    * that. Output: (idCol, input_text, target_text, n_masked).
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      block: Int, spanLen: Int, seed: String): DataFrame = {
    require(spanLen >= 1 && block >= spanLen,
      s"need 1 <= spanLen <= block, got spanLen=$spanLen block=$block")
    val nStarts = block - spanLen + 1
    val e = docs
      .select(col(idCol), F.size(toks(col(textCol))).as("n"),
        posexplode(toks(col(textCol))).as(Seq("p0", "tok")))
      .select(col(idCol), col("n"), col("tok"),
        (col("p0") + 1).as("pos"),
        expr(s"p0 div $block").as("blk"))
      .withColumn("off",
        pmod(conv(substring(md5(concat(lit(seed), col(idCol).cast("string"),
          lit(":"), col("blk").cast("string"))), 1, 13), 16, 10).cast("long"),
          lit(nStarts.toLong)))
      .withColumn("s_pos", col("blk") * block + 1 + col("off"))
      .withColumn("complete", (col("blk") + 1) * block <= col("n"))
    val sentinel = concat(lit("<extra_id_"), col("blk").cast("string"), lit(">"))
    val isStart = col("complete") && col("pos") === col("s_pos")
    val inSpan = col("complete") &&
      col("pos") >= col("s_pos") && col("pos") < col("s_pos") + spanLen
    val pieces = e.select(col(idCol), col("pos"),
      when(isStart, sentinel).when(inSpan, lit(null)).otherwise(col("tok"))
        .as("in_piece"),
      when(isStart, concat(sentinel, lit(" "), col("tok")))
        .when(inSpan, col("tok")).otherwise(lit(null)).as("tgt_piece"),
      when(inSpan, lit(1)).otherwise(lit(0)).as("msk"))
    pieces.groupBy(col(idCol)).agg(
      Text.positionedConcat(col("pos"), col("in_piece")).as("input_text"),
      Text.positionedConcat(col("pos"), col("tgt_piece")).as("target_text"),
      sum(col("msk")).as("n_masked"))
  }

  /** BERT-style MLM masking (Devlin et al. 2019 §3.1): select ~15% of
    * token positions; of those, 80% become `[MASK]`, 10% are replaced
    * by a "random" vocabulary token, 10% keep the original (so the
    * model cannot assume an unmasked token is correct). Emits
    * (idCol, mlm_text, labels_text, n_masked) — labels are the
    * ORIGINAL tokens at selected positions in document order.
    *
    * All three draws come from ONE seeded md5 hash per position,
    * decimal-field-split (h%100 < 15 selects; h/100%10 ∈ 0-7 mask /
    * 8 replace / 9 keep; h/1000%V indexes the replacement) — integer
    * arithmetic the oracle replays verbatim. The replacement draw
    * uses the corpus's top-`vocabK` tokens (count desc, token asc —
    * deterministic through ties), matching BERT's corpus-vocab draw
    * while keeping the lookup a BROADCAST join against a vocabK-row
    * table instead of a per-doc array carry (which would materialize
    * O(n²) bytes per document through the explode).
    *
    * Scale: one vocab aggregate (Heaps-bounded, then top-K), one
    * zero-shuffle position projection, the broadcast replacement
    * join, one doc-keyed reassembly exchange (the q152 shape).
    */
  def mlmMask(docs: DataFrame, idCol: String, textCol: String,
      seed: String, vocabK: Int = 16): DataFrame = {
    require(vocabK >= 1, s"need vocabK >= 1, got $vocabK")
    // the replacement vocabulary is COLLECTED (bounded: ≤ vocabK rows)
    // and enters the plan as a literal array — no join, no second
    // corpus pass at apply time, and the replacement index draws
    // modulo the ACTUAL vocabulary size: a corpus with fewer than
    // vocabK distinct tokens must not send ~((vocabK−V)/vocabK) of
    // the replacement draws to a non-existent index (which would
    // silently DELETE those positions through the null-dropping
    // reassembly)
    val vlist = docs
      .select(explode(toks(col(textCol))).as("vtok"))
      .groupBy(col("vtok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("vtok")).limit(vocabK)
      .collect().map(_.getString(0))
    require(vlist.nonEmpty, "mlmMask: empty corpus has no replacement vocabulary")
    val vocabArr = array(vlist.map(lit(_)): _*)
    val e = docs
      .select(col(idCol), posexplode(toks(col(textCol))).as(Seq("p0", "tok")))
      .withColumn("pos", col("p0") + 1)
      .withColumn("bits",
        conv(substring(md5(concat(lit(seed), col(idCol).cast("string"),
          lit(":"), col("pos").cast("string"))), 1, 13), 16, 10)
          .cast("long"))
      .withColumn("sel", pmod(col("bits"), lit(100L)) < 15)
      .withColumn("sub", pmod(expr("bits div 100"), lit(10L)))
    val repl = element_at(vocabArr,
      (pmod(expr("bits div 1000"), lit(vlist.length.toLong)) + 1).cast("int"))
    val outTok = when(!col("sel"), col("tok"))
      .when(col("sub") < 8L, lit("[MASK]"))
      .when(col("sub") === 8L, repl)
      .otherwise(col("tok"))
    val pieces = e.select(col(idCol), col("pos"),
      outTok.as("out_tok"),
      when(col("sel"), col("tok")).as("label_tok"),
      when(col("sel"), lit(1)).otherwise(lit(0)).as("msk"))
    pieces.groupBy(col(idCol)).agg(
      Text.positionedConcat(col("pos"), col("out_tok")).as("mlm_text"),
      Text.positionedConcat(col("pos"), col("label_tok")).as("labels_text"),
      sum(col("msk")).as("n_masked"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * split each document's token stream at two seeded cut points into
    * (prefix, middle, suffix) and emit the PSM reordering
    * `<PRE> prefix <SUF> suffix <MID> middle` — the document-level
    * transform that teaches a causal LM infilling "for free".
    *
    * Cut points are the [[weightedSample]] md5-prefix hash of
    * (seed, doc, "a"/"b") mod (n+1), lo/hi-ordered — deterministic,
    * partition-independent, oracle-replayable; empty segments are
    * legal (a cut at 0 or n) exactly as in the paper's uniform split.
    *
    * Scale: a pure zero-shuffle projection — two hashes and three
    * array slices per row inside the scan stage, no explode, no
    * aggregation. Output: (idCol, fim_text, n_prefix, n_middle,
    * n_suffix).
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      seed: String): DataFrame = {
    val t = toks(col(textCol))
    def h(tag: String): Column =
      conv(substring(md5(concat(lit(seed), col(idCol).cast("string"),
        lit(tag))), 1, 13), 16, 10).cast("long")
    docs
      .select(col(idCol), t.as("t"), F.size(t).cast("long").as("n"),
        pmod(h(":a"), F.size(t).cast("long") + 1).as("c1"),
        pmod(h(":b"), F.size(t).cast("long") + 1).as("c2"))
      .select(col(idCol), col("t"), col("n"),
        least(col("c1"), col("c2")).as("lo"),
        greatest(col("c1"), col("c2")).as("hi"))
      .select(col(idCol),
        concat(lit("<PRE> "),
          array_join(slice(col("t"), lit(1), col("lo").cast("int")), " "),
          lit(" <SUF> "),
          array_join(slice(col("t"), col("hi").cast("int") + 1,
            (col("n") - col("hi")).cast("int")), " "),
          lit(" <MID> "),
          array_join(slice(col("t"), col("lo").cast("int") + 1,
            (col("hi") - col("lo")).cast("int")), " ")).as("fim_text"),
        col("lo").as("n_prefix"),
        (col("hi") - col("lo")).as("n_middle"),
        (col("n") - col("hi")).as("n_suffix"))
  }

  /** Top-`k` TF-IDF terms per document. tf = term count / document
    * length; idf = ln(N / df) (no smoothing — df ≥ 1 by construction).
    * Ties break toward the lexicographically smaller term.
    *
    * Scale: one shuffle for (doc, term) counts (partial-aggregated),
    * one for document frequencies (term cardinality ≪ corpus size),
    * a join keyed on term (AQE: broadcast if the vocabulary is small,
    * sort-merge otherwise), and a per-document top-k window (partial
    * top-k per partition). N is a scalar single-row broadcast.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val exploded = docs.select(col(idCol), size(toks(col(textCol))).as("doc_len"),
        explode(toks(col(textCol))).as("term"))
    val tf = exploded.groupBy(col(idCol), col("term"), col("doc_len"))
      .agg(count(lit(1)).as("tf_count"))
    // document frequency FROM tf — its rows are exactly the distinct
    // (doc, term) pairs, so a second tokenize+explode pass over the
    // corpus for DF would be pure tree duplication; deriving it here
    // also lets AQE reuse tf's shuffle stage for both consumers.
    // (n_docs stays a direct corpus count: it must include docs that
    // produce no tokens, which never reach tf.)
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df_, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        round((col("tf_count").cast("double") / col("doc_len")) *
          log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("rnk"), col("tfidf"))
  }

  /** Exact-quota temperature (mixture) sampling — the data-mixing step
    * of a training pipeline (q72, and the mix stage of q105's recipe).
    * Per-source quota t_s = min(n_s, floor(round(budget·n_s^alpha /
    * Σ_s n_s^alpha, 6))) — alpha < 1 flattens the source distribution
    * (big sources down-weighted, rare sources kept) — and each
    * source's first t_s documents in deterministic md5(id) order are
    * chosen. The round-to-6-digits before floor keeps a last-ulp
    * window-sum difference between engines/plans from flipping an
    * integer quota boundary. ONE definition serves every caller so
    * quota flooring and tie-breaking can never diverge between the
    * standalone query and compositions.
    *
    * Output: the input columns plus `rk` (the 1-based per-source md5
    * rank, long). Scale shape: quotas are a window over the per-source
    * COUNT aggregate (a handful of rows, broadcast back); the
    * per-source row_number is exact-quota semantics — for giant
    * sources trade exactness for [[mixtureSampleThreshold]]'s sort-free
    * filter (same quota arithmetic, membership in expectation). */
  def temperatureSample(docs: DataFrame, idCol: String,
      sourceCol: String, alpha: Double, budget: Long): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
    val quota = counts
      .withColumn("w", pow(col("n_s").cast("double"), alpha))
      .withColumn("t_s", least(col("n_s"),
        floor(round(lit(budget) * col("w") /
          sum(col("w")).over(Window.partitionBy(lit(1))), 6)).cast("long")))
      .select(col(sourceCol), col("t_s"))
    val ranked = docs.withColumn("rk",
      row_number().over(Window.partitionBy(col(sourceCol))
        .orderBy(md5(col(idCol).cast("string")), col(idCol)))
        .cast("long"))
    ranked.join(quota, sourceCol)
      .filter(col("rk") <= col("t_s"))
      .drop("t_s")
  }

  /** Deterministic stride-scheduling interleave (Waldspurger & Weihl
    * 1995 stride scheduling; the order Megatron/T5-style loaders emit
    * when mixing datasets at fixed sampling ratios): assign each
    * document a sort key `(rk_s − 0.5) / w_s` — the s-th source's
    * rk-th document in seeded per-source order — so a key-ordered
    * stream visits sources at rates ∝ their weights `w_s = n_s^alpha`,
    * with every prefix within one document of the target mix (the
    * stride guarantee). The COMPLEMENT of [[temperatureSample]]:
    * sampling decides WHAT trains, interleaving decides WHEN — a
    * skewed order (all of source A, then all of B) measurably biases
    * early training even on a perfectly mixed selection.
    *
    * Deterministic: per-source rank comes from the seeded-md5 order
    * (the [[epochShuffle]] discipline — same rows, same key, on every
    * engine/partitioning/cluster), and the key is one rounded double
    * expression in fixed point. Scale shape: one count aggregate
    * (broadcast back), one PROPERLY PARTITIONED per-source window (no
    * global sort anywhere — the consumer range-partitions by key_fp at
    * write time, q95's shard discipline).
    *
    * @return input columns + (rk, key_fp); stream in (key_fp, source,
    *         doc) order
    */
  def strideInterleave(docs: DataFrame, idCol: String, sourceCol: String,
                       alpha: Double, seed: String): DataFrame = {
    val weights = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_s"))
      .select(col(sourceCol), pow(col("n_s").cast("double"), alpha).as("w"))
    val ranked = docs.withColumn("rk",
      row_number().over(Window.partitionBy(col(sourceCol))
        .orderBy(md5(concat(lit(seed), col(idCol).cast("string"))),
          col(idCol))).cast("long"))
    ranked.join(broadcast(weights), sourceCol)
      .withColumn("key_fp",
        round((col("rk").cast("double") - lit(0.5)) / col("w") * lit(1e6), 0)
          .cast("long"))
      .drop("w")
  }

  /** Hash-threshold mixture sampling — the giant-source form of q72's
    * temperature sampling. Per-source quota ∝ n_s^alpha as there, but
    * membership is a FILTER, not a rank: accept a row iff its id-hash
    * (uniform in [0,1)) falls below the source's acceptance rate
    * quota_s / n_s. No per-source sort exists anywhere in the plan —
    * a 10-billion-row source costs the same narrow pass as a small
    * one, at the price of hitting the quota only in expectation
    * (±binomial noise) rather than exactly. Deterministic: the hash is
    * a pure function of the id, so the SAME rows are chosen on every
    * run, partitioning, and cluster size.
    *
    * The acceptance rate is rounded to 6 digits (q72's idiom: a
    * last-ulp window-sum difference must not flip membership across
    * engines/plans). `uniform` overrides the id→[0,1) hash — the
    * default xxhash64 is the cheap scale path; q78 passes an
    * md5-derived uniform that DuckDB can reproduce bit-for-bit. */
  def mixtureSampleThreshold(docs: DataFrame, idCol: String,
      sourceCol: String, alpha: Double, budget: Long,
      uniform: Option[Column] = None): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
    val rates = counts
      .withColumn("w", pow(col("n_s").cast("double"), alpha))
      .withColumn("rate", round(least(lit(1.0),
        lit(budget) * col("w") /
          sum(col("w")).over(Window.partitionBy(lit(1))) / col("n_s")), 6))
      .select(col(sourceCol), col("rate"))
    // uniform in [0,1) from the id hash; xxhash64 spans the full long
    // range, so normalize via the unsigned-ish shift to [0, 2^63)
    val u = uniform.getOrElse(
      shiftrightunsigned(xxhash64(col(idCol)), 1)
        .cast("double") / lit(Long.MaxValue.toDouble))
    docs.join(broadcast(rates), sourceCol)
      .filter(u < col("rate"))
      .drop("rate")
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    * 2006 ("Weighted random sampling with a reservoir", A-ES): each
    * row draws a uniform `u` and ranks by `u^(1/w)`; the top-k under
    * that key is a weighted sample without replacement whose
    * inclusion probability increases with `w`. This implementation
    * ranks by the monotone-equivalent `ln(u)/w` (same order, avoids
    * `pow`), with `u` derived from a SEEDED md5 hash of the id — a
    * 52-bit integer, exactly representable as a double — so the
    * sample is a pure function of (seed, id): re-runs, engines, and
    * partitionings all agree, and changing the seed redraws it
    * (epochs — the [[epochShuffle]] seeding discipline).
    *
    * The reported key rounds to 6 digits with an id tie-break (the
    * q72 idiom: a last-ulp `ln` difference must not flip rank across
    * engines); SELECTION uses the rounded key too, so both engines
    * pick the same k rows. Weights must be positive.
    *
    * Scale shape: a zero-shuffle keyed projection into
    * `TakeOrderedAndProject` — per-partition top-k partials, ONE
    * k-row-bounded exchange, no full sort at any size. Output: the
    * input row plus `samp_key`, k rows. */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    require(k >= 1, "need k >= 1")
    // 13 hex chars = 52 bits; +1 shifts to (0, 2^52] so ln never sees 0
    val bits = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))),
      1, 13), 16, 10).cast("long")
    val u = (bits + lit(1L)).cast("double") / lit(4503599627370496.0d) // 2^52
    // enforce the positive-weight precondition IN the plan: ln(u) ≤ 0,
    // so a negative weight flips its key positive and wins every draw
    // silently, and a zero weight divides to -Infinity — both are
    // upstream data bugs that must fail the job, not skew the sample
    val w = when(col(weightCol).cast("double") > 0d, col(weightCol).cast("double"))
      .otherwise(raise_error(concat(
        lit(s"weightedSample: non-positive weight in '$weightCol': "),
        col(weightCol).cast("string"))).cast("double"))
    docs
      .withColumn("samp_key", round(log(u) / w, 6))
      .orderBy(col("samp_key").desc, col(idCol))
      .limit(k)
  }

  /** Hex-prefix width for [[epochShuffle]]'s shards:
    * ⌈log16(rows / targetRowsPerShard)⌉, clamped to [1, 8]. md5 keys
    * are uniform, so width w splits the corpus into 16^w ranges of
    * ~rows/16^w each; the default target keeps a shard's window
    * partition a few million rows — comfortably one task — while the
    * offset table stays ≤ 16^8 aggregate rows. */
  /** Vocabulary coverage curve: for each `targets` percentage p, the
    * minimum vocabulary size (terms ranked by frequency desc) whose
    * cumulative token mass reaches p% of the corpus, plus the share it
    * actually covers — the sizing curve behind "how big must the
    * tokenizer vocab be" (Zipf coverage) and OOV-rate planning.
    *
    * Exact WITHOUT a global ranked cumsum: within one count class every
    * term contributes the same mass, so the (count → #terms)
    * COUNT-HISTOGRAM is a sufficient statistic for the whole curve —
    * walk classes in descending count, take whole classes while they
    * fit and ceil-divide into the boundary class. The comparison is
    * kept in integers (100·cum ≥ N·p, never a fractional threshold), so
    * the result is bit-identical to an oracle's row-by-row ranked scan.
    *
    * Scale shape: one Heaps-bounded (term, count) exchange with
    * map-side combine, then a histogram exchange bounded by the number
    * of DISTINCT COUNT VALUES (≤ O(√(2·corpus tokens)) — the k-th
    * largest distinct count needs k·(k+1)/2 tokens — i.e. KB-scale for
    * any real corpus), and ONE driver collect of that histogram. No
    * global sort, no single-partition window, no term-ranked shuffle. */
  def vocabCoverage(docs: DataFrame, textCol: String,
      targets: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    require(targets.nonEmpty && targets.forall(p => p >= 1 && p <= 100),
      s"targets must be percentages in [1, 100]: $targets")
    val hist = docs
      .select(graft.functions.Text.tokens(col(textCol)).as("toks"))
      .select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))
      .orderBy(col("c").desc)
      .collect() // bounded: one row per distinct count value
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map { case (c, m) => c * m }.sum
    require(n > 0, "empty corpus")
    val rows = targets.sorted.map { pct =>
      val target100 = n * pct // 100·cum >= N·p in exact long arithmetic
      var cum = 0L; var terms = 0L
      var vocab = 0L; var covered = 0L; var done = false
      hist.foreach { case (c, m) =>
        if (!done) {
          if (100L * (cum + c * m) >= target100) {
            val num = target100 - 100L * cum
            val k = (num + 100L * c - 1L) / (100L * c) // ceil
            vocab = terms + k; covered = cum + k * c; done = true
          } else { cum += c * m; terms += m }
        }
      }
      val share = BigDecimal(covered.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (pct, vocab, share)
    }
    val s = docs.sparkSession
    import s.implicits._
    rows.toDF("target_pct", "vocab_size", "covered_share")
  }

  def shardWidthFor(rows: Long, targetRowsPerShard: Long = 4000000L): Int = {
    require(targetRowsPerShard > 0, "targetRowsPerShard must be positive")
    val shards = math.max(1.0, rows.toDouble / targetRowsPerShard)
    math.min(8, math.max(1, math.ceil(math.log(shards) / math.log(16.0)).toInt))
  }

  /** Deterministic epoch shuffle: every row gets a seeded pseudorandom
    * global position (rank of md5(seed ++ id)), reproducible across
    * runs, partitionings, and engines. The naive spelling —
    * `row_number() OVER (ORDER BY key)` — is a SINGLE-PARTITION
    * window: a scale-killer at 100 TB. This is the distributed
    * decomposition: shard by the key's first `width` hex chars (16^w
    * ranges in key order), rank WITHIN each shard (a partitioned
    * window), and add per-shard offsets from a 16^w-row running sum —
    * the only non-partitioned window runs over the aggregate shard
    * counts, never the corpus. Shard prefix order == key prefix order,
    * so offset + within-shard rank IS the global rank (ties broken by
    * id). The result is width-INDEPENDENT (EpochShuffleSpec pins
    * widths 3/4/5 hash-identical on q95's corpus); width only sizes
    * the within-shard partitions, via [[shardWidthFor]] when not given
    * explicitly — the auto form costs one metadata-cheap count. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: String,
      width: Int): DataFrame = {
    require(width >= 1 && width <= 8, s"shard width $width outside [1, 8]")
    val keyed = docs.select(col(idCol),
      md5(concat(lit(seed), col(idCol).cast("string"))).as("k"))
      .withColumn("shard", substring(col("k"), 1, width))
    val within = keyed.withColumn("r",
      row_number().over(Window.partitionBy(col("shard"))
        .orderBy(col("k"), col(idCol))))
    val offsets = keyed.groupBy(col("shard"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("offset"))
    within.join(broadcast(offsets), Seq("shard"))
      .select(col(idCol), (col("offset") + col("r")).as("shuffle_pos"))
  }

  /** [[epochShuffle]] with the shard width derived from the corpus
    * size — the "widen the prefix if the corpus outgrows an executor"
    * note as code. The sizing `count()` is one extra action: cheap on
    * a bare parquet scan (row-group metadata), but a full recompute on
    * a derived input — pass an explicit width (or a known row count
    * via [[shardWidthFor]]) when `docs` is the tail of an expensive
    * pipeline. Either way the RESULT is width-independent. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: String): DataFrame =
    epochShuffle(docs, idCol, seed, shardWidthFor(docs.count()))
}
