package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
  * and SimHash. Training-data-pipeline extensions per the north star —
  * the reference corpus has no analog, so these are designed Spark-first
  * for the 100 TB case:
  *
  *   - NOTHING here is all-pairs. Exact dedup is a hash groupBy;
  *     Jaccard uses an inverted-index (shingle) join; MinHash/SimHash
  *     use banded LSH bucket joins. Candidate generation is always
  *     equi-join shaped so Catalyst plans shuffle/broadcast hash joins,
  *     and AQE handles bucket skew.
  *   - All signatures are built from `xxhash64`/bit ops inside
  *     whole-stage codegen (no UDFs, no ml.Vector boxing).
  */
object Dedup {

  /** Exact dedup: group by normalized-content hash, keep the smallest
    * id per group (the canonical survivor). Shuffles fixed-width
    * (hash, id) pairs, never document bodies. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.contentHash(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Soft dedup: instead of DROPPING duplicates, down-weight every
    * member of an exact-duplicate cluster by the cluster's size —
    * sampling weight 1/n_copies, so each distinct content contributes
    * one expected epoch occurrence however many times it was crawled
    * (the SoftDeDup reweighting idea: keep the data, dedup the
    * *distribution*). Output keeps every row: (id, n_copies, weight).
    *
    * One shuffle, fixed-width: (hash, id) pairs partitioned by
    * content_hash for the count window — document bodies never move,
    * and there is no join back to the corpus (the window carries the
    * count to every member in place). At 100 TB this is strictly
    * cheaper than [[exact]] + re-join. */
  def softDedupWeights(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.contentHash(col(textCol)).as("content_hash"))
      .withColumn("n_copies",
        count(lit(1)).over(Window.partitionBy(col("content_hash"))))
      .select(col(idCol), col("n_copies"),
        round(lit(1.0) / col("n_copies"), 6).as("weight"))

  /** Distinct (id, shingle) pairs — the inverted-index input.
    *
    * Tokens are bound to an attribute in their OWN projection before
    * shingling: `Text.shingles` reads its token array inside a
    * `transform` lambda, and handing it the raw `split(normalize(…))`
    * tree would re-run the regex+split once per shingle POSITION
    * (quadratic per document, and un-CSE'd because higher-order
    * functions evaluate interpreted). Staging makes the lambda read a
    * per-row array attribute instead — measured 24× on q33's corpus
    * (the optimizer keeps the stage: CollapseProject refuses to inline
    * a non-cheap expression with multiple references). */
  private[graft] def docShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(Text.shingles(col("toks"), n)).as("sh"))

  /** All-pairs n-gram Jaccard ≥ tau via inverted-index self-join:
    * J(a,b) = |A∩B| / (|A|+|B|−|A∩B|), counting common shingles by
    * joining on the shingle itself. Only documents sharing ≥1 shingle
    * ever meet — no cartesian product. At 100 TB, ultra-common
    * ("stop") shingles are the skew risk: AQE skew-join splitting
    * handles moderate cases; for pathological ones add a document-
    * frequency cap on shingles before the join (prefix filtering). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, maxDocFreq: Option[Long] = None): DataFrame = {
    val all = docShingles(df, idCol, textCol, n)
    // Prefix filtering (the 100 TB knob): drop shingles appearing in
    // more than maxDocFreq documents before the self-join — "stop
    // shingles" contribute df² candidate pairs but almost no Jaccard
    // discrimination. Changes |A∩B| for affected pairs, so enable it
    // only when approximate pair discovery is acceptable; the exact
    // default keeps oracle parity.
    val sh = cappedShingles(all, maxDocFreq)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("x")
      .join(sh.as("y"), col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= tau)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** The df-cap (prefix filter) applied to a shingle stream. The HOT
    * list is materialized behind a [[Barrier]]: the capped stream has
    * THREE consumers downstream (sizes + both self-join sides), and
    * Spark plans are trees — without the barrier each consumer re-runs
    * the corpus-shingle-sized df aggregate from the scan (measured in
    * the q164 plan dump: 3 full aggregates, zero ReusedExchange). The
    * materialized state is only the > cap shingles — boilerplate-
    * vocabulary-sized at any corpus size — and broadcasts to the
    * anti-joins; the shingle RE-DERIVATION per branch stays deliberate
    * (the minhash lesson: shuffling exploded shingle occurrences costs
    * corpus×shingle bytes where recomputation is map-side CPU). */
  private def cappedShingles(all: DataFrame, maxDocFreq: Option[Long]): DataFrame =
    maxDocFreq.fold(all) { cap =>
      val hot = Barrier.materialize(
        all.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("sh")))
      all.join(broadcast(hot), Seq("sh"), "left_anti")
    }

  /** Directed n-gram containment pairs: C(A→B) = |A∩B| / |A| ≥ tau —
    * Broder's containment, the asymmetric companion to Jaccard. A
    * truncated or excerpted copy of a long document scores C≈1 toward
    * its source while its symmetric Jaccard is only ≈ |A|/|B| (a 50%
    * truncation has J≈0.5 and would sail under a 0.8 Jaccard bar);
    * containment is how near-dup pipelines catch subset duplicates.
    * Output is DIRECTED: (a, b, containment) means shingle-set A is
    * tau-contained in B, for a ≠ b in both orientations.
    *
    * Same sub-quadratic inverted-index shape as [[ngramJaccardPairs]]
    * — only documents sharing ≥1 shingle ever meet, the common-shingle
    * count is one equi-join + count, and both orientations of each
    * unordered candidate pair are derived from ONE joined row (an
    * explode of the two directed readings), so the shingle self-join
    * runs once, not twice. The same maxDocFreq prefix-filter knob
    * applies at 100 TB. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, maxDocFreq: Option[Long] = None): DataFrame = {
    val all = docShingles(df, idCol, textCol, n)
    val sh = cappedShingles(all, maxDocFreq)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("x")
      .join(sh.as("y"), col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("x"), col("y.id").as("y"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "x").withColumnRenamed("n_sh", "nx"), "x")
      .join(sizes.withColumnRenamed("id", "y").withColumnRenamed("n_sh", "ny"), "y")
      // both directed readings of the one undirected candidate row
      .select(explode(array(
        struct(col("x").as("a"), col("y").as("b"),
          round(col("n_common").cast("double") / col("nx"), 6).as("containment")),
        struct(col("y").as("a"), col("x").as("b"),
          round(col("n_common").cast("double") / col("ny"), 6).as("containment"))
      )).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.containment"))
      .filter(col("containment") >= tau)
  }

  /** Signature-estimated directed containment — [[containmentPairs]]'s
    * sketch sibling, for corpora whose shingle inverted index is too
    * hot to self-join even capped: candidates come from the SAME
    * banded MinHash equi-join as [[minhashNearDups]] (fixed-width
    * signatures — no posting list ever self-joins, so no hot-shingle
    * df² exists by construction), and the intersection is ESTIMATED
    * from the signatures instead of recounted:
    *
    *   Ĵ = (matching signature components)/k,
    *   |A∩B|^ = Ĵ/(1+Ĵ)·(|A|+|B|)   (from J = I/(|A|+|B|−I)),
    *   C(A→B)^ = |A∩B|^/|A|  (clamped to 1), symmetrically for B→A.
    *
    * RECALL CAVEAT, documented not hidden: banded candidates surface
    * by SYMMETRIC Jaccard, and a tau-contained A inside a much larger
    * B has J ≈ tau·|A|/|B| — a tiny excerpt of a huge document escapes
    * any Jaccard-tuned banding. Size the band count for the smallest
    * size ratio that must be caught (J_floor = tau·ratio/(1+ratio−
    * tau·ratio); [[lshParameterPlan]] gives (b, r) for that floor —
    * the default 32 bands over k=64 puts the S-curve inflection at
    * ≈0.177, covering the half-truncation J≈0.5 with recall ~1);
    * for guaranteed-exact semantics use [[containmentPairs]] with
    * `maxDocFreq` (the q164 registered scale form). DedupSpec grades
    * recall + estimate error against the exact operator. Output:
    * (a, b, containment) with estimate-derived values. */
  def containmentPairsApprox(df: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, k: Int = 64, bands: Int = 32): DataFrame = {
    require(bands >= 1 && bands <= k,
      s"bands=$bands must be in [1, k=$k] — wider banding has zero-width " +
        "slices and would band-collide everything")
    val sigs = minhashSignatures(df, idCol, textCol, n, k)
    // signatures re-attach to the (small) candidate set by id-keyed
    // hash joins — the minhashNearDupsAgainstIndex pattern: the banding
    // itself carries only (id, n_sh), never the k-long arrays
    val cand = sizedCandidatePairs(sigs, bands)
    cand
      .join(sigs.select(col("id").as("a"), col("sig").as("sa")), "a")
      .join(sigs.select(col("id").as("b"), col("sig").as("sb")), "b")
      .withColumn("est_j",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
          v => v)).cast("double") / k)
      .withColumn("inter_est",
        col("est_j") / (lit(1.0) + col("est_j")) *
          (col("na") + col("nb")).cast("double"))
      // both directed readings of the one undirected candidate row —
      // the containmentPairs explode idiom
      .select(explode(array(
        struct(col("a").as("a"), col("b").as("b"),
          round(least(lit(1.0), col("inter_est") / col("na")), 6)
            .as("containment")),
        struct(col("b").as("a"), col("a").as("b"),
          round(least(lit(1.0), col("inter_est") / col("nb")), 6)
            .as("containment"))
      )).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.containment"))
      .filter(col("containment") >= tau)
  }

  /** MinHash signature per document via the native
    * [[graft.functions.MinHashSig]] expression: the k-wide signature is
    * a fused per-row loop (2 xxhash64 per shingle + a Carter–Wegman
    * add per signature row) computed MAP-SIDE in the scan projection —
    * not an explode + k min-aggregates that hash every shingle k
    * times. The trivial `groupBy(id).agg(first)` that follows is the
    * load-bearing materialization barrier, replacing the old k-wide
    * aggregate at a fraction of its CPU: (a) the downstream LSH band
    * SELF-join reuses the aggregate's exchange (ReusedExchange), so
    * signatures are computed once, not once per join side; (b)
    * predicate pushdown cannot substitute expression trees through an
    * Aggregate, so the n_sh filter below never re-derives the
    * interpreted shingle tree per row (both re-derivations measured:
    * removing the barrier entirely took q33 from ~1.8 s to ~21 s at
    * sf0.1). The struct output keeps the expensive shingle array
    * referenced exactly once in the projection (see MinHashSig
    * scaladoc); docs with no shingles (shorter than n tokens) are
    * dropped AFTER the barrier, as the explode-based form dropped
    * them implicitly. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    df.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), Text.shingles(col("toks"), n).as("sh"))
      .select(col("id"),
        org.apache.spark.sql.GraftColumn.of(graft.functions.MinHashSig(
          org.apache.spark.sql.GraftColumn.expr(col("sh")), k)).as("ms"))
      .groupBy(col("id")).agg(first(col("ms")).as("ms"))
      .select(col("id"), col("ms.n_sh").as("n_sh"), col("ms.sig").as("sig"))
      .filter(col("n_sh") > 0)

  /** LSH banding: split the k-wide signature into `bands` bands of
    * k/bands rows each; docs sharing any band hash become candidates.
    * The band join is an equi-join on (band_idx, band_hash) — the
    * classic sub-quadratic near-dup candidate generator. Input is
    * [[minhashSignatures]] output. */
  def lshCandidatePairs(sigs: DataFrame, bands: Int): DataFrame =
    sizedCandidatePairs(sigs, bands).select(col("a"), col("b"))

  /** [[lshCandidatePairs]] with each side's shingle-set size carried
    * through the banding — so verification never needs a second
    * signature pass just to recover the counts. */
  private def sizedCandidatePairs(sigs: DataFrame, bands: Int): DataFrame = {
    val banded = sigs.select(col("id"), col("n_sh"),
      posexplode(split_sig(col("sig"), bands)).as(Seq("band", "band_hash")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
      .distinct()
  }

  /** Slice a signature array into `bands` equal slices, hashing each
    * slice to one value — via the native [[graft.functions.LshBands]]
    * expression (chained long-hashes inside codegen; the composable
    * transform+concat_ws form rendered every slice to a string in an
    * interpreted lambda, per document, in the dedup hot path). */
  private def split_sig(sig: Column, bands: Int): Column =
    org.apache.spark.sql.GraftColumn.of(graft.functions.LshBands(
      org.apache.spark.sql.GraftColumn.expr(sig), bands))

  /** MinHash+LSH near-dup pipeline: signatures → banded candidates →
    * exact Jaccard verification of candidates only. Output = verified
    * pairs with their exact Jaccard. Verification joins candidates back
    * to the inverted index, so cost is proportional to candidate count,
    * not corpus². */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16, tau: Double = 0.8): DataFrame = {
    require(bands >= 1 && bands <= k,
      s"bands=$bands must be in [1, k=$k] — wider banding has zero-width " +
        "slices and would band-collide everything")
    val sigs = minhashSignatures(df, idCol, textCol, n, k)
    // n_sh rides through the banding so candidate pairs surface with
    // BOTH set sizes already attached: Spark plans are trees, so a
    // separate `sigs.select(id, n_sh)` branch would re-scan the corpus
    // and re-run the k-wide signature aggregate just for the counts
    // (measured: one of four corpus scans in the old plan), plus two
    // extra hash joins to attach them.
    val cand = sizedCandidatePairs(sigs, bands)
    // Each verification branch recomputes docShingles from the scan
    // rather than sharing one materialized shingle set — DELIBERATE,
    // re-tested round 7: an id-keyed repartition barrier here measured
    // zero gain at sf0.1 (the per-branch shingle pass is not the cost
    // center) and at 100 TB it would shuffle exploded shingle
    // OCCURRENCES (several × corpus bytes) where recomputation is a
    // map-side CPU cost.
    val sh = docShingles(df, idCol, textCol, n)
    // Common shingles per candidate pair: attach a's shingles, then
    // equi-join on (b, shingle) — both joins are hash joins keyed on
    // (id) and (id, shingle); no per-pair array materialization.
    // na/nb are functionally determined by (a, b), so adding them to
    // the group key changes nothing but keeps them available.
    val common = cand
      .join(sh.toDF("a", "sh"), "a")
      .join(sh.toDF("b", "sh"), Seq("b", "sh"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_common"))
    common
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= tau)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 64-bit SimHash per document: each token occurrence votes ±1 on
    * every bit of its xxhash64 (term-frequency weighting — near-dup
    * docs have near-identical counts, so their vote margins track);
    * bit i of the simhash is 1 iff the vote sum is positive. One
    * explode + one 64-column codegen'd aggregate. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(Text.tokens(col(textCol))).as("tok"))
    val h = xxhash64(col("tok"))
    val votes = (0 until 64).map { i =>
      sum(when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1).otherwise(-1)).as(s"v$i")
    }
    toks.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(i =>
          when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found via
    * banded LSH over 8×8-bit slices: two hashes within Hamming 7 must
    * agree on at least one 8-bit band (pigeonhole), so candidates come
    * from equi-joins on (band, slice) — never all-pairs — then are
    * verified with bit_count(xor). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 7): DataFrame = {
    require(maxDist <= 7, "8-band slicing guarantees recall only to Hamming 7")
    val sh = simhash(df, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("band", "slice")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.slice") === col("y.slice") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Incremental near-dup: match a NEW batch of documents against an
    * EXISTING signature index — the daily-ingestion shape, where the
    * historical corpus exists only as its [[minhashSignatures]] table
    * (k longs per doc) and its text is never re-read. Candidates come
    * from the same banded equi-join as the batch form; verification
    * uses the signature-estimated Jaccard (fraction of agreeing
    * signature components — unbiased estimator of J, σ = √(J(1−J)/k) ≈
    * 0.05 at k=64), because exact verification would require the
    * corpus shingles the index deliberately doesn't store.
    *
    * Scale shape: the index is read once (k×8 bytes/doc — 0.5 TB per
    * trillion docs, not the corpus's 100 TB), banding is narrow on
    * both sides, and the only joins are (band, hash) and id-keyed
    * signature attachments. Output: (id, corpus_id, est_jaccard).
    *
    * COMPATIBILITY: a persisted signature index is only comparable to
    * batch signatures from the SAME hash family. Round 7 changed the
    * family (k seeded xxhash64 mins → Carter–Wegman h1 + i·h2 over
    * two seeds; see [[graft.functions.MinHashSig]]) — an index
    * persisted under the old family joins the new batch signatures to
    * effectively nothing (silent zero-duplicate result, not an
    * error). Rebuild persisted signature indexes when the signature
    * implementation changes; at 100 TB that is a pass over the stored
    * index-INPUT hashes or one corpus re-signature, not a redesign.
    */
  def minhashNearDupsAgainstIndex(newDocs: DataFrame, idCol: String,
      textCol: String, index: DataFrame,
      n: Int = 3, k: Int = 64, bands: Int = 16, tau: Double = 0.8): DataFrame = {
    require(bands >= 1 && bands <= k,
      s"bands=$bands must be in [1, k=$k] — wider banding has zero-width " +
        "slices and would band-collide everything")
    val newSigs = minhashSignatures(newDocs, idCol, textCol, n, k)
    // The banding carries IDS ONLY: hauling the k-long signature array
    // through the posexplode, the (band, band_hash) join, and the
    // distinct would duplicate ~k×8 bytes per doc × bands on the
    // billions-row index side (multi-TB of avoidable shuffle at the
    // trillion-doc index this operator is sized for). Signatures
    // re-attach to the (small) candidate pair set by two id-keyed hash
    // joins — the cosineNearDupPairs pattern; the batch side's
    // re-reference reuses the signature aggregate's exchange, and the
    // index side is a narrow columnar re-scan.
    def band(sigs: DataFrame, idAs: String): DataFrame =
      sigs.select(col("id").as(idAs),
        posexplode(split_sig(col("sig"), bands)).as(Seq("band", "band_hash")))
    val cand = band(newSigs, "id").as("x")
      .join(band(index, "corpus_id").as("y"), Seq("band", "band_hash"))
      .select(col("id"), col("corpus_id"))
      .distinct()
    cand
      .join(newSigs.select(col("id"), col("sig").as("sa")), "id")
      .join(index.select(col("id").as("corpus_id"), col("sig").as("sb")),
        "corpus_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sa"), col("sb"), (a, b) => a === b),
          x => x)).cast("double") / k)
      .filter(col("est_jaccard") >= tau)
      .select(col("id"), col("corpus_id"), col("est_jaccard"))
  }

  /** Line-level exact dedup (the C4/CCNet idiom): remove duplicate
    * LINES across the corpus, keeping only the first occurrence
    * corpus-wide (ordered by document id, then line position) — the
    * complement of whole-document dedup ([[exact]]) and fuzzy dedup
    * ([[minhashNearDups]]) that strips boilerplate headers/footers/
    * navigation repeated across pages.
    *
    * Shape (default, skew-safe): posexplode lines → a map-side-combined
    * `groupBy(line).agg(min(struct(id, pos)))` marks the corpus-wide
    * first occurrence of every distinct line — an ultra-hot line (the
    * empty line, "Home", a cookie banner) collapses to ONE row per map
    * task before the shuffle, so no reducer ever sees all its
    * occurrences. The survivor set (one unique (id, pos) per distinct
    * line) then joins back to the exploded lines on (id, pos) — a
    * UNIQUE, uniformly distributed key, so the join-back cannot be
    * skewed either (joining back on the line value would just move the
    * hot key from the window to the join probe). Finally one id-keyed
    * aggregate reassembles each document from its surviving lines in
    * original order; the collect_list is bounded by a single document's
    * own line count — never a cross-document neighbor set.
    *
    * `skewSafe = false` selects the original value-partitioned window
    * form (row_number over partitionBy(line)) — identical semantics
    * because the keep rule is a pure min over (id, pos), but a
    * corpus-wide hot line is a single window partition, i.e. one task
    * at scale. Kept for the DedupSpec equivalence proof and for small
    * corpora where one shuffle beats two.
    *
    * Output: (idCol, clean_text, n_kept, n_dropped); documents whose
    * every line was dropped survive with clean_text = ''. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", skewSafe: Boolean = true): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val marked = if (skewSafe) {
      // distinct lines are far fewer than line occurrences, and each
      // survivor row is just (id, pos) — the join-back side is narrow
      val firsts = lines.groupBy(col("line"))
        .agg(min(struct(col("id"), col("pos"))).as("first"))
        .select(col("first.id").as("id"), col("first.pos").as("pos"),
          lit(true).as("keep"))
      markByKeys(lines, firsts)
    } else {
      val w = Window.partitionBy(col("line")).orderBy(col("id"), col("pos"))
      lines.withColumn("keep", row_number().over(w) === 1)
    }
    reassemble(marked, idCol, sep)
  }

  /** Left-join keep keys (id, pos, keep=true) onto exploded lines; the
    * join key is unique and uniformly distributed, so the join-back
    * cannot be skewed. */
  private def markByKeys(lines: DataFrame, keepKeys: DataFrame): DataFrame =
    lines.join(keepKeys, Seq("id", "pos"), "left")
      .withColumn("keep", coalesce(col("keep"), lit(false)))

  /** Reassemble documents from keep-marked exploded lines: ONE
    * id-keyed aggregate, surviving lines re-joined in original order;
    * the collect_list is bounded by a single document's own line
    * count, never a cross-document set. Shared by [[dedupLines]] and
    * [[dedupLinesAgainstIndex]] so the batch and incremental paths can
    * never diverge on what clean_text/n_kept/n_dropped mean. */
  private def reassemble(marked: DataFrame, idCol: String, sep: String): DataFrame =
    marked.groupBy(col("id"))
      .agg(
        concat_ws(sep, Text.inPositionOrder(
          collect_list(when(col("keep"),
            struct(col("pos"), col("line")))), "line")).as("clean_text"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
      .withColumnRenamed("id", idCol)

  /** Incremental LINE-level dedup: [[dedupLines]]'s daily-ingest
    * sibling (the CCNet shape) — strip from a NEW batch every line
    * whose hash already exists in a persisted line-hash index, and
    * dedup the remaining lines within the batch (first occurrence by
    * (id, pos) survives, matching [[dedupLines]]'s keep rule). The
    * historical corpus is represented ONLY by its distinct line hashes
    * (8 bytes/line as xxhash64); its text is never re-read.
    *
    * Returns (cleanedDocs, updatedIndex): `cleanedDocs` has
    * (idCol, clean_text, n_kept, n_dropped) like [[dedupLines]];
    * `updatedIndex` = old index ∪ hashes of the batch's surviving
    * lines — persist it to serve the next batch.
    *
    * Scale shape, same skew discipline as [[dedupLines]]: the batch
    * pre-aggregates `(line_hash) → min(id, pos)` with map-side combine
    * (a corpus-wide hot line collapses per map task), the index join
    * is a left-anti on the uniformly-distributed hash (exchange-free
    * when the index is persisted bucketed on line_hash), and the
    * join-back key (id, pos) is unique. Hash identity: xxhash64
    * collisions (~2⁻⁶⁴ per pair) silently drop a novel line — the
    * standard CCNet tradeoff for an index 100× smaller than the lines;
    * use the raw line as the index key where that is unacceptable. */
  def dedupLinesAgainstIndex(batch: DataFrame, idCol: String,
      textCol: String, index: DataFrame,
      sep: String = "\n"): (DataFrame, DataFrame) = {
    val lines = batch.select(col(idCol).as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
      .withColumn("line_hash", xxhash64(col("line")))
    val batchFirst = lines.groupBy(col("line_hash"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    val novel = batchFirst
      .join(index.select(col("line_hash")), Seq("line_hash"), "left_anti")
    val keepKeys = novel
      .select(col("first.id").as("id"), col("first.pos").as("pos"),
        lit(true).as("keep"))
    val cleaned = reassemble(markByKeys(lines, keepKeys), idCol, sep)
    val updated = index.select(col("line_hash"))
      .unionByName(novel.select(col("line_hash")))
    (cleaned, updated)
  }

  /** Incremental EXACT dedup: dedup a NEW batch of documents against a
    * persisted `(content_hash, keep_id)` index — the daily-ingestion
    * sibling of [[minhashNearDupsAgainstIndex]] for byte-identical
    * content. The historical corpus is represented ONLY by its hash
    * index (16 bytes + id per doc); its text is never re-read.
    *
    * Rules (matching [[exact]]'s min-id survivor semantics):
    *   1. within the batch, the lowest id per content_hash survives;
    *   2. a batch survivor whose hash already exists in the index is
    *      dropped (the corpus saw that content first).
    *
    * Returns (survivors, updatedIndex): `survivors` = the batch rows
    * (all columns) that enter the corpus; `updatedIndex` = the old
    * index plus one `(content_hash, keep_id)` row per novel hash —
    * persist it to serve the next batch.
    *
    * Scale shape: the batch hash+groupBy shuffles fixed-width
    * (hash, id) pairs; the anti-join against the index shuffles index
    * KEYS, never corpus text — and disappears entirely as an exchange
    * if the index is persisted bucketed by content_hash
    * (`Sinks.writeBucketed`), the layout a daily pipeline would use.
    * The survivor join-back is left UNHINTED deliberately: a
    * dup-heavy replay leaves a broadcast-sized novel set, but the
    * common mostly-novel daily batch leaves novel ≈ |batch| ids —
    * forcing a broadcast there ships the whole id set to every
    * executor; AQE picks broadcast vs shuffle from the novel set's
    * RUNTIME size. Nothing here scans the historical corpus. */
  def exactAgainstIndex(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame): (DataFrame, DataFrame) = {
    val hashed = batch.select(col(idCol),
      Text.contentHash(col(textCol)).as("content_hash"))
    val batchFirst = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol))
    val novel = batchFirst.join(index.select(col("content_hash")),
      Seq("content_hash"), "left_anti")
    val survivors = batch.join(novel.select(col(idCol)), Seq(idCol))
    val updated = index.select(col("content_hash"), col("keep_id"))
      .unionByName(novel.select(col("content_hash"), col(idCol).as("keep_id")))
    (survivors, updated)
  }

  /** [[exactAgainstIndex]] with a bloom-filter pre-test of the
    * historical index (built once per index epoch via
    * [[Bloom.build]] over the index's `content_hash`; persisted next
    * to the index in a real pipeline).
    *
    * Identical results — the bloom only routes: a bloom NEGATIVE hash
    * is definitely novel (no false negatives) and skips the index
    * anti-join entirely; bloom POSITIVES (true duplicates + fpp) are
    * confirmed against the real index, so false positives cannot drop
    * a novel document. At 100 TB the anti-join's probe side shrinks
    * from the whole batch to (dup rate + fpp) × batch — with a 1–10%
    * dup rate, ~10–100× less join input against the billions-row
    * index — while the definite-novel majority is classified by a
    * codegen'd scalar filter with zero shuffle. BloomDedupSpec pins
    * path-equivalence with [[exactAgainstIndex]] on planted data. */
  def exactAgainstIndexBloom(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, indexBloom: Array[Byte]): (DataFrame, DataFrame) = {
    val hashed = batch.select(col(idCol),
      Text.contentHash(col(textCol)).as("content_hash"))
    val batchFirst = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol))
    val seenMaybe = Bloom.mightContain(indexBloom, col("content_hash"))
    val definiteNovel = batchFirst.filter(!seenMaybe)
    val confirmedNovel = batchFirst.filter(seenMaybe)
      .join(index.select(col("content_hash")), Seq("content_hash"), "left_anti")
    val novel = definiteNovel.unionByName(confirmedNovel)
    // unhinted like exactAgainstIndex: novel ≈ |batch| on a
    // mostly-novel day — AQE decides broadcast vs shuffle at runtime
    val survivors = batch.join(novel.select(col(idCol)), Seq(idCol))
    val updated = index.select(col("content_hash"), col("keep_id"))
      .unionByName(novel.select(col("content_hash"), col(idCol).as("keep_id")))
    (survivors, updated)
  }

  /** Benchmark decontamination: cross-corpus n-gram overlap — for each
    * corpus document, the number of distinct n-gram shingles it shares
    * with each benchmark document (self-matches excluded so a benchmark
    * that also lives in the corpus never flags itself). The standard
    * training-data hygiene step: drop/flag corpus docs whose overlap
    * with any eval-set document exceeds `minCommon`.
    *
    * Same inverted-index shape as [[ngramJaccardPairs]] but the join is
    * corpus×benchmark, not a self-join: the benchmark side (eval sets —
    * thousands of docs, not billions) is broadcast, so the corpus is
    * ONE narrow pass — shingle explode, broadcast hash join, partial
    * count agg; no shuffle of corpus text and no all-pairs anything.
    */
  def crossCorpusOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int,
      minCommon: Long = 1L): DataFrame = {
    val c = docShingles(corpus, idCol, textCol, n)
    val b = docShingles(benchmark, idCol, textCol, n)
      .withColumnRenamed("id", "bench_id")
    c.join(broadcast(b), Seq("sh"))
      .filter(col("id") =!= col("bench_id"))
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      .select(col("id").as("doc_id"), col("bench_id"), col("n_common"))
  }

  /** Corpus-wide repeated-SPAN removal: the shingle-granular form of
    * ExactSubstr dedup (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better" — they use suffix arrays; the
    * k-token-window form keeps the same contract with relational
    * machinery). Every k-token span that already occurred earlier in
    * the corpus — (id, pos) lexicographic order defines "earlier" —
    * loses its tokens; the canonical first occurrence keeps them.
    * Within-document repetition is removed by the same rule. Every
    * position covered by SOME redundant occurrence is dropped —
    * overlapping the first occurrence does not protect a position, so
    * a periodic run ("p q p q p q", k=3) keeps exactly one period and
    * a constant run ("a a a a a", k=3) keeps one token: deliberately
    * aggressive, like the suffix-array original. Docs shorter than k
    * tokens pass through untouched.
    *
    * Output: (idCol, clean_text, n_kept, n_dropped) — the
    * [[dedupLines]] contract at span granularity.
    *
    * Scale shape: shingle hashing is a zero-shuffle generator over
    * each doc's own token array; the first-occurrence choice is the
    * skew-safe [[dedupLines]] idiom — a distinct-shingle-sized
    * min-struct aggregate (a corpus-wide hot span collapses map-side),
    * and redundancy is decided by joining the keep-keys back on the
    * UNIQUE, uniform (id, pos) key ([[markByKeys]]'s reasoning), never
    * by joining occurrences on the skewed shingle key; the drop set
    * shuffles one START position per redundant occurrence (bounded by
    * the dup rate, not the corpus, and never expanded ×k before the
    * exchange); the rebuild is one id-keyed join + a per-row fused
    * bitmap loop (linear in doc length) that expands spans in place.
    * Nothing is all-pairs and document bodies
    * shuffle only in the final id-keyed join-back.
    */
  def dropRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "span width must be at least 2 tokens")
    val toks = df.select(col(idCol).as("id"),
      split(col(textCol), " ").as("toks"))
    val occs = toks
      .select(col("id"),
        posexplode(Text.wordNgrams(col("toks"), k)).as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), md5(col("gram")).as("sh"))
    val keepKeys = occs.groupBy(col("sh"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
      .select(col("first.id").as("id"), col("first.pos").as("pos"),
        lit(true).as("keep"))
    // join back on (id, pos) — unique and uniform — NOT on the shingle
    // key, where a corpus-wide hot span would land on one task
    val redundant = markByKeys(occs, keepKeys).filter(!col("keep"))
    // ship span STARTS, not expanded coverage: the old
    // explode(sequence(pos, pos+k-1)) multiplied every redundant
    // occurrence k× BEFORE its exchange — the dominant intermediate at
    // high dup rates (the ×20 scale probe's memory cliff); the native
    // rebuild expands [p, p+k-1] inside its bitmap loop instead, so
    // the shuffle carries one int per redundant span
    val covered = redundant
      .groupBy(col("id")).agg(collect_set(col("pos")).as("drop_starts"))
    toks.join(covered, Seq("id"), "left")
      .select(col("id"), col("toks"),
        coalesce(col("drop_starts"), array().cast("array<integer>")).as("dps"))
      .select(col("id"), size(col("toks")).as("n_total"),
        // one fused codegen loop ([[graft.functions.DropPositions]]):
        // empty drop list returns the input array untouched (the
        // common case, zero allocation), else bitmap + copy — the
        // bitmap marking is clamped by the doc's own length, so the
        // fully-duplicated-long-doc worst case stays linear; the
        // interpreted dispatch retained below as [[rebuildComposable]]
        // is the DedupSpec width-1 parity contract
        org.apache.spark.sql.GraftColumn.of(graft.functions.DropPositions(
          org.apache.spark.sql.GraftColumn.expr(col("toks")),
          org.apache.spark.sql.GraftColumn.expr(col("dps")), k)).as("kept"))
      .select(col("id").as(idCol),
        concat_ws(" ", col("kept")).as("clean_text"),
        size(col("kept")).cast("long").as("n_kept"),
        (col("n_total") - size(col("kept"))).cast("long").as("n_dropped"))
  }

  /** The composable (pre-native) rebuild — a cost-model dispatch on
    * the doc's own dup mass: clean docs return the untouched array;
    * sparse dups (|dps| ≤ 32) take the allocation-free per-token
    * contains scan (linear, 32-bounded constant); heavy dups take the
    * hash-based `array_except` position difference so the
    * fully-duplicated worst case stays linear. Retained ONLY as
    * DropPositionsSpec/DedupSpec's parity reference for
    * [[graft.functions.DropPositions]] — a nonempty dps implies ≥ k
    * tokens upstream, so sequence() cannot descend (the (1,0) trap)
    * in the heavy branch; toks/dps must be bound attributes (HOF
    * binding rule). */
  private[graft] def rebuildComposable(toks: Column, dps: Column): Column =
    when(size(dps) === 0, toks)
      .when(size(dps) <= 32,
        // coalesce: array_contains over a dps that CONTAINS a null
        // returns NULL (not false) for unmatched indices — bare
        // negation would then drop every unlisted token, diverging
        // from the native's ignore-null-positions rule
        filter(toks, (_, i) => !coalesce(array_contains(dps, i), lit(false))))
      .otherwise(transform(
        array_except(sequence(lit(0), size(toks) - lit(1)), dps),
        p => element_at(toks, p + lit(1))))

  /** LSH banding-parameter plan: for each target Jaccard threshold,
    * the (bands, rows-per-band) factorization of a length-`k` MinHash
    * signature whose S-curve inflection s* = (1/b)^(1/r) sits closest
    * to the target (ties → fewer bands, the cheaper index). Also
    * reports the collision probability 1 − (1 − t^r)^b AT the target —
    * how sharp the chosen curve is where it matters.
    *
    * This is the sizing step in front of [[minhashNearDups]]: at
    * 100 TB the band count multiplies the banding exchange (b rows per
    * document) and r controls the false-positive tail that the exact
    * verify pass must re-check, so (b, r) is chosen analytically
    * BEFORE touching data — the method is pure closed-form math over
    * the ≤ d(k)·|targets| candidate grid (driver-side by design:
    * there is no corpus input to distribute).
    */
  def lshParameterPlan(spark: org.apache.spark.sql.SparkSession, k: Int,
      targets: Seq[Double]): DataFrame = {
    require(k >= 1, s"signature length must be positive, got $k")
    require(targets.forall(t => t > 0.0 && t < 1.0),
      s"targets must lie in (0, 1), got $targets")
    val round6 = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairs = (1 to k).filter(k % _ == 0).map(b => (b, k / b))
    val rows = targets.map { t =>
      // The argmin KEY is rounded to 6dp (not just the output columns):
      // JVM math.pow and the oracle engine's pow can differ by an ulp,
      // and a near-tie between two (b, r) factorizations would then
      // resolve differently cross-engine — rounding the key first lets
      // the fewer-bands tiebreak decide ties deterministically on both.
      val (b, r, sStar) = pairs.map { case (b, r) =>
        (b, r, math.pow(1.0 / b, 1.0 / r))
      }.minBy { case (b, _, s) => (round6(math.abs(s - t)), b) }
      val pAtTarget = 1.0 - math.pow(1.0 - math.pow(t, r), b)
      (t, b, r, round6(sStar), round6(pAtTarget))
    }
    import spark.implicits._
    rows.toDF("target_t", "bands", "rows_per_band", "s_star", "p_at_target")
  }
}
