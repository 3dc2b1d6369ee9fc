package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for large-scale corpus pipelines:
  * normalization, tokenization, shingling, language-ID heuristics,
  * quality scoring, token counting, and content fingerprinting.
  *
  * Everything here is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — whole-stage-codegen'd, no UDFs —
  * so at 100 TB these run inside the scan/project pipeline with zero
  * extra shuffles and full predicate/column pruning.
  *
  * The reference corpus has no text analysis (it is an orchestration
  * repo); this extends its data-pipeline surface per the north star
  * (training-data pipelines: language-ID, quality, dedup signals).
  */
object Text {

  /** Canonical form: collapse whitespace runs, trim, lowercase. The
    * anchor for exact dedup — byte-identical after normalization.
    * Collapse-THEN-trim, deliberately: `trim` strips only ASCII
    * spaces, so trim-then-collapse leaves a trailing newline/tab as a
    * trailing " " after the collapse — "hello\n" and "hello" would
    * hash differently and exact dedup would miss byte-near-identical
    * duplicates (trailing newlines are ubiquitous in real corpora).
    * Collapsing first turns every edge whitespace run into a single
    * leading/trailing space, which trim then removes. Mirrored in
    * every DuckDB oracle spelling (same trim semantics there);
    * BoundarySpec pins the trailing-newline dedup case. */
  def normalize(c: Column): Column =
    org.apache.spark.sql.GraftColumn.of(NormalizeText(
      org.apache.spark.sql.GraftColumn.expr(c), tokenize = false))

  /** Whitespace tokens of the normalized text — fused with the
    * normalization into one native byte pass ([[NormalizeText]]). */
  def tokens(c: Column): Column =
    org.apache.spark.sql.GraftColumn.of(NormalizeText(
      org.apache.spark.sql.GraftColumn.expr(c), tokenize = true))

  /** Composable parity reference for [[normalize]], kept for
    * NormalizeTextSpec (and the form every DuckDB oracle mirrors). */
  private[graft] def normalizeFold(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Composable parity reference for [[tokens]]. */
  private[graft] def tokensFold(c: Column): Column = split(normalizeFold(c), " ")

  /** Sort an array of (position, value) structs by position and
    * project the value — the order-restoring half of the reassemble
    * idiom (exploded rows keep no order through an aggregate, so
    * reassembly collects positioned structs and re-sorts). The
    * struct's FIRST field must be the position; `field` names the
    * value field to project. ONE definition serves every reassembly
    * ([[graft.operators.Dedup]] line rebuild, BPE encode, centroid
    * vector rebuild) so a fix to the idiom can never miss a copy. */
  def inPositionOrder(structs: Column, field: String): Column =
    transform(array_sort(structs), x => x.getField(field))

  /** Aggregate form of [[inPositionOrder]] for token-stream rebuilds:
    * collect non-NULL `piece`s tagged with `pos`, re-sort, and join
    * with spaces — NULL pieces are dropped (that is how a masked
    * position disappears from q152's input_text). ONE definition for
    * every positioned string reassembly (span corruption, MLM) so a
    * fix here reaches all of them. */
  def positionedConcat(pos: Column, piece: Column): Column =
    org.apache.spark.sql.GraftColumn.of(PositionedConcat(
      org.apache.spark.sql.GraftColumn.expr(
        collect_list(when(piece.isNotNull, struct(pos, piece.as("piece")))))))

  /** Composable (lambda-HOF) parity reference for [[positionedConcat]],
    * kept for PositionedConcatSpec. */
  private[graft] def positionedConcatFold(pos: Column, piece: Column): Column =
    array_join(inPositionOrder(
      collect_list(when(piece.isNotNull, struct(pos, piece.as("piece")))),
      "piece"), " ")

  /** Distinct word n-gram shingles (the unit of near-dup detection):
    * [[wordNgrams]] with first-occurrence dedup fused into the same
    * native single pass ([[TokenWindows]] — array_distinct semantics).
    * Empty shingle set (never null) when the doc is shorter than n. */
  def shingles(toks: Column, n: Int): Column =
    windowsNative(toks, n, 1, partial = false, distinct = true)

  /** Composable (lambda-HOF) parity reference for [[shingles]], kept
    * for TokenWindowsSpec. */
  private[graft] def shinglesFold(toks: Column, n: Int): Column =
    array_distinct(wordNgramsFold(toks, n))

  private def windowsNative(toks: Column, width: Int, stride: Int,
      partial: Boolean, distinct: Boolean): Column =
    org.apache.spark.sql.GraftColumn.of(
      TokenWindows(org.apache.spark.sql.GraftColumn.expr(toks),
        width, stride, partial, distinct))

  /** MD5 of the normalized content — the exact-dedup key. (Content
    * hashing beats raw-string grouping at scale: fixed-width shuffle
    * keys instead of multi-KB documents.) */
  def contentHash(c: Column): Column = md5(normalize(c))

  /** Stopword hit-count per language: |distinct(tokens) ∩ stopwords|. */
  private def hits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "that")
  val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit")
  val StopEs = Seq("el", "la", "los", "de", "que", "y", "es", "una")
  val StopFr = Seq("le", "la", "les", "et", "est", "une", "dans", "pour")

  /** N-gram/stopword language-ID heuristic producing one of
    * en/de/es/fr/zh/und. CJK codepoints short-circuit to zh; otherwise
    * the language with strictly the most stopword hits wins, ties
    * resolving toward English (fixed CASE order — deterministic on any
    * engine). "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = langId(text, tokens(text))

  /** [[langId]] over a BOUND token array — when the caller has already
    * staged `tokens(text)` in its own projection, this variant reads
    * the attribute instead of embedding four copies of the regex+split
    * tree per stopword intersect (which only whole-stage codegen CSE
    * can deduplicate — and a projection that also carries lambda-HOF
    * columns evaluates interpreted, where no CSE exists). */
  def langId(text: Column, toks: Column): Column = {
    val en = hits(toks, StopEn); val de = hits(toks, StopDe)
    val es = hits(toks, StopEs); val fr = hits(toks, StopFr)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(de > en && de > es && de > fr, "de")
      .when(es > en && es > fr, "es")
      .when(fr > en, "fr")
      .when(en > 0, "en")
      .otherwise("und")
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs + digit runs + individual
    * punctuation, the standard pre-tokenizer shape. ASCII classes only
    * so the regex means the same thing under Java regex and RE2. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality score in [0,1] from cheap surface statistics — the
    * length/punctuation/stopword-ratio heuristics used to filter web
    * corpora before training. Deterministic double arithmetic (fixed
    * operation order), rounded to 6 digits at the boundary. */
  def qualityScore(text: Column): Column = qualityScore(text, tokens(text))

  /** [[qualityScore]] over a BOUND token array — same rationale as the
    * [[langId]] overload. NULL text scores 0.0 (not NULL): a NULL
    * `nChar` would propagate through `alphaRatio` into the sum, and a
    * NULL score turns any downstream `>= threshold` gate three-valued.
    * The guard is `coalesce(tree, 0.0)` — NOT `when(text.isNull, …)
    * .otherwise(tree)` — deliberately: subexpression elimination skips
    * conditional BRANCHES (lazily evaluated) but keeps a coalesce's
    * always-evaluated first child, so the stopword-hit subtrees stay
    * shared with [[langId]] in a combined scoring projection. Only
    * NULL text makes the tree NULL (alphaRatio's NULL numerator
    * survives every `greatest`/`least`, which skip nulls), so the two
    * spellings are value-identical. */
  def qualityScore(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val stopRatio = least(lit(1.0),
      (hits(toks, StopEn) + hits(toks, StopDe) + hits(toks, StopEs) + hits(toks, StopFr))
        .cast("double") * lit(3.0) / greatest(nTok, lit(1.0)))
    val alphaRatio =
      length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") / greatest(nChar, lit(1.0))
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val meanTokLen = nChar / greatest(nTok, lit(1.0))
    val tokLenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    coalesce(
      round(stopRatio * 0.2 + alphaRatio * 0.4 + lenScore * 0.2 + tokLenScore * 0.2, 6),
      lit(0.0))
  }

  // --- Gopher/C4-style repetition + ratio signals (Rae et al. 2021,
  // "Scaling Language Models" §A1.1; Raffel et al. 2020 C4 filters).
  // All pure Column expressions: at 100 TB these are one zero-shuffle
  // projection over the corpus, like qualityScore.

  /** Deterministic fixed-width token "lines": chunk a BOUND token array
    * into `width`-token groups joined by spaces — the line convention
    * q76/q77/q80 use over corpora whose text has no newlines. Guarded
    * for NULL/empty input: `sequence(1, 0)` DESCENDS in Spark (default
    * step is -1 when start > stop), so an unguarded chunk count of 0
    * would fabricate two bogus lines where a SQL oracle's
    * `range(1, 1)` yields none. */
  def tokenChunks(toks: Column, width: Int = 8): Column = {
    require(width >= 1)
    windowsNative(toks, width, width, partial = true, distinct = false)
  }

  /** Composable (lambda-HOF) parity reference for [[tokenChunks]],
    * kept for TokenWindowsSpec. */
  private[graft] def tokenChunksFold(toks: Column, width: Int = 8): Column = {
    require(width >= 1)
    val n = greatest(
      coalesce(ceil(size(toks) / lit(width.toDouble)).cast("int"), lit(0)), lit(0))
    when(n > 0,
      transform(sequence(lit(1), n),
        i => array_join(slice(toks, (i - 1) * width + 1, lit(width)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of lines that exactly repeat an earlier line of the SAME
    * document (Gopher's duplicate-line fraction — boilerplate/nav-bar
    * detector). Input is the line ARRAY (split at the caller, where the
    * line convention is known); 0.0 when there are no lines. */
  def duplicateLineFraction(lines: Column): Column =
    when(coalesce(size(lines), lit(0)) <= 0, 0.0).otherwise(
      (size(lines) - size(array_distinct(lines))).cast("double")
        / size(lines).cast("double"))

  /** All word n-grams WITH repeats (unlike [[shingles]], counts matter
    * here). Native single pass ([[TokenWindows]]); empty array for
    * NULL or shorter-than-n input, like the composable form. */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1)
    windowsNative(toks, n, 1, partial = false, distinct = false)
  }

  /** Composable (lambda-HOF) parity reference for [[wordNgrams]], kept
    * for TokenWindowsSpec — the native expression must return
    * bit-identical arrays (same strings, same order, same null-token
    * skipping). */
  private[graft] def wordNgramsFold(toks: Column, n: Int): Column = {
    require(n >= 1)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Share of all n-grams taken by the single most frequent one
    * (Gopher's top-n-gram share — repeated-phrase detector). Input is
    * a BOUND [[wordNgrams]] column.
    *
    * Computed as the longest equal-run of the SORTED n-gram array — a
    * single `aggregate` fold carrying (prev, run-length, best) — so the
    * per-row cost is O(n log n) in the document's n-gram count. The
    * naive filter-per-distinct form is O(distinct × total) interpreted
    * lambda steps per row, which on a 100k-token web document is ~10^10
    * steps; the sorted scan keeps the same exact value (max multiplicity
    * over distinct grams) at document-length-bounded cost, and the stage
    * stays a zero-shuffle projection. */
  def topNgramShare(ng: Column): Column =
    when(coalesce(size(ng), lit(0)) <= 0, 0.0).otherwise(
      runStats(ng).getField("top_count")
        .cast("double") / size(ng).cast("double"))

  /** [[NgramRunStats]] built directly as an expression — NOT a
    * `call_function("ngram_run_stats", …)` registry lookup, which would
    * silently couple this pure Column library to sessions that ran
    * [[graft.Session]]'s `injectFunction` hook (any other session
    * would fail analysis with "undefined function"). The SQL-name
    * registration still exists for `expr("ngram_run_stats(...)")`
    * users; this library does not depend on it. */
  private def runStats(ng: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      NgramRunStats(org.apache.spark.sql.GraftColumn.expr(ng)))

  /** The composable (lambda-HOF) form of [[topNgramShare]]'s numerator,
    * kept as the parity reference for NgramRunStatsSpec — the native
    * `ngram_run_stats` expression must return bit-identical values. */
  private[graft] def topRunFold(ng: Column): Column =
    aggregate(
      array_sort(ng),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        // a null element neither joins nor starts a run (run = 0, prev
        // coalesced to "" so the NEXT element starts cleanly at
        // 0 + 1) — parity with the native expression, which only
        // updates its maxima on non-null values
        val run = when(g.isNull, lit(0L))
          .when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(coalesce(g, lit("")).as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Shannon token entropy in integer micro-nats: `Σ_runs
    * round(−c·ln(c/n)·1e6)` over the equal-runs of the SORTED token
    * array (run length c = the token's count, n = total tokens). The
    * per-run fixed-point term makes the sum ORDER-INDEPENDENT and
    * engine-exact (the [[graft.operators.UnigramLm]] micro-nat idiom);
    * divide by n·1e6 for nats. Low entropy flags repetitive/spammy
    * text (keyword stuffing, boilerplate loops) that length and
    * stopword gates miss — a standard quality-battery signal. Same
    * single-fold sorted-scan shape as [[topNgramShare]]: document-cost
    * O(n log n), zero shuffle. Empty arrays score 0.
    */
  def tokenEntropyFp(toks: Column): Column = {
    val n = size(toks).cast("double")
    def termFp(run: Column): Column =
      when(run <= 0L, lit(0L)).otherwise(
        round(-(run.cast("double") * log(run.cast("double") / n)) * lit(1e6),
          0).cast("long"))
    aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (st, x) => {
        val same = x === st.getField("prev") && st.getField("run") > 0L
        struct(x.as("prev"),
          when(same, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(same, st.getField("acc"))
            .otherwise(st.getField("acc") + termFp(st.getField("run")))
            .as("acc"))
      },
      st => st.getField("acc") + termFp(st.getField("run")))
  }

  /** DEFLATE compression ratio of a string ([[CompressRatio]] — the
    * CCNet-style compressibility quality signal; see that scaladoc for
    * the two-tailed filter semantics and the spec-graded determinism
    * contract). */
  def compressRatio(c: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      CompressRatio(org.apache.spark.sql.GraftColumn.expr(c)))

  /** CHARACTER-weighted duplicate fraction over any string array
    * (Gopher's "duplicate line character fraction" when fed lines,
    * "duplicate n-gram fraction" when fed [[wordNgrams]]): the share of
    * characters belonging to occurrences BEYOND the first of each
    * distinct value — sum_len(all) − sum_len(distinct) over
    * sum_len(all). Two linear folds per row; 0.0 for empty input or
    * all-empty strings. A long boilerplate paragraph repeated once
    * scores its full length here while the count-based
    * [[duplicateLineFraction]] sees only 1/n — which is why Gopher
    * gates on both. */
  def duplicateCharFraction(lines: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      CharDupFraction(org.apache.spark.sql.GraftColumn.expr(lines)))

  /** Composable (lambda-fold) parity reference for
    * [[duplicateCharFraction]], kept for CharDupFractionSpec — two
    * interpreted folds + an array_distinct per row, which is exactly
    * why the native single-pass expression replaced it in the
    * battery's hot path. */
  private[graft] def charDupFractionFold(lines: Column): Column = {
    def sumLen(a: Column): Column =
      aggregate(a, lit(0L), (acc, s) => acc + length(s))
    val total = sumLen(lines)
    when(coalesce(size(lines), lit(0)) <= 0 || coalesce(total, lit(0L)) <= 0L, 0.0)
      .otherwise((total - sumLen(array_distinct(lines))).cast("double")
        / total.cast("double"))
  }

  /** Characters covered by the single best-covering n-gram —
    * max over distinct grams of count(g) × len(g) — as a fraction of
    * the document's characters (Gopher's "top n-gram character
    * fraction", with the tie/selection rule made deterministic by
    * maximizing coverage directly). Numerator comes from the native
    * `ngram_run_stats` expression (one fused sort+scan inside codegen;
    * see [[NgramRunStats]]). `nChars` is the denominator — pass
    * `length(text)` so the fraction is of the ORIGINAL document. */
  def topNgramCharFraction(ng: Column, nChars: Column): Column =
    when(coalesce(size(ng), lit(0)) <= 0 || coalesce(nChars, lit(0)) <= 0, 0.0).otherwise(
      least(lit(1.0),
        runStats(ng).getField("top_chars")
          .cast("double") / nChars.cast("double")))

  /** Composable parity reference for [[topNgramCharFraction]]'s
    * numerator (see [[topRunFold]]). */
  private[graft] def topCoverFold(ng: Column): Column =
    aggregate(
      array_sort(ng),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val closed = greatest(acc.getField("best"),
          acc.getField("run") * length(acc.getField("prev")))
        // null handling mirrors [[topRunFold]]: run = 0, prev = "" —
        // the closed-run coverage of a null "run" is 0 × 0
        val run = when(g.isNull, lit(0L))
          .when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(coalesce(g, lit("")).as("prev"),
          run.as("run"),
          when(g === acc.getField("prev"), acc.getField("best"))
            .otherwise(closed).as("best"))
      },
      acc => greatest(acc.getField("best"),
        acc.getField("run") * length(acc.getField("prev"))))

  /** Symbol-to-word ratio: non-alphanumeric, non-space characters per
    * token (Gopher uses #/… hashes and ellipses; this counts the whole
    * symbol class so it is alphabet-agnostic). NULL text scores 0.0 —
    * without the greatest() guard, size(NULL) = −1 would leak a
    * NEGATIVE ratio that silently PASSES a `<= threshold` gate. */
  def symbolToWordRatio(text: Column, toks: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))), lit(0))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")

  private val AllStops = StopEn ++ StopDe ++ StopEs ++ StopFr

  /** The fused per-token battery counts ([[TokenStats]] — one native
    * pass instead of three interpreted HOF walks); identical trees for
    * the same `toks` dedupe under codegen subexpression elimination,
    * so a battery projection using all three signals pays ONE walk. */
  private def tokenStats(toks: Column): Column =
    org.apache.spark.sql.GraftColumn.of(TokenStats(
      org.apache.spark.sql.GraftColumn.expr(toks), AllStops))

  /** Fraction of token OCCURRENCES that are stopwords (C4/Gopher's
    * stop-word fraction; occurrence-weighted, unlike [[qualityScore]]'s
    * distinct-intersect hit count). */
  def stopwordFraction(toks: Column): Column =
    when(coalesce(size(toks), lit(0)) <= 0, 0.0).otherwise(
      tokenStats(toks).getField("stop_cnt")
        .cast("double") / size(toks).cast("double"))

  /** Composable (lambda-HOF) parity reference for [[stopwordFraction]],
    * kept for TokenStatsSpec. */
  private[graft] def stopwordFractionFold(toks: Column): Column =
    when(coalesce(size(toks), lit(0)) <= 0, 0.0).otherwise(
      size(filter(toks, t => AllStops.map(w => t === lit(w)).reduce(_ || _)))
        .cast("double") / size(toks).cast("double"))

  /** Mean token length of the normalized tokens (Gopher gates on
    * 3 ≤ mean ≤ 10 — gibberish/code detector). NULL input scores 0.0,
    * consistent with the other signals (and a NULL here would make the
    * combined gate NULL rather than false — same filter outcome, but a
    * three-valued surprise for any consumer reading the signal). */
  def meanWordLength(toks: Column): Column =
    coalesce(tokenStats(toks).getField("sum_len"), lit(0L))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")

  /** Composable parity reference for [[meanWordLength]]. */
  private[graft] def meanWordLengthFold(toks: Column): Column =
    coalesce(aggregate(toks, lit(0L), (acc, t) => acc + length(t)), lit(0L))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")

  /** Fraction of tokens containing at least one alphabetic character
    * (C4 drops pages where this is low — symbol soup / data dumps). */
  def alphaTokenFraction(toks: Column): Column =
    when(coalesce(size(toks), lit(0)) <= 0, 0.0).otherwise(
      tokenStats(toks).getField("alpha_cnt")
        .cast("double") / size(toks).cast("double"))

  /** Composable parity reference for [[alphaTokenFraction]]. */
  private[graft] def alphaTokenFractionFold(toks: Column): Column =
    when(coalesce(size(toks), lit(0)) <= 0, 0.0).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]")))
        .cast("double") / size(toks).cast("double"))

  /** Polynomial rolling-hash fingerprint of the normalized content:
    * fold codepoints through acc*31+cp mod 1e9+7. Cheap 64-bit content
    * identity with a well-defined cross-engine formula (unlike xxhash,
    * whose seed/variant differs per engine). */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(normalize(text), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, cp) => (acc * 31L + cp) % 1000000007L)
}
