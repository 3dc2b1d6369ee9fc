package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Grades the dedup operators that have no DuckDB twin, plus the
  * HLL-estimate query (q15). */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  /** Exact 3-gram Jaccard pairs ≥ tau — the ground truth. */
  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup groups cover every doc exactly once") {
    val res = Dedup.exact(docs, "doc_id", "text")
    val total = res.agg(sum(col("n_copies"))).head().getLong(0)
    assert(total == docs.count())
    // survivors are distinct docs
    val keeps = res.select("keep_id").collect().map(_.getLong(0))
    assert(keeps.distinct.length == keeps.length)
  }

  test("minhash LSH candidates achieve full recall of exact pairs at tau=0.8") {
    val nd = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification guarantees precision; recall must be total on this
    // corpus (0.99-Jaccard planted dups vs 16-band LSH at 0.8)
    assert(nd == exactPairs, s"minhash=${nd.size} exact=${exactPairs.size}")
  }

  test("lshCandidatePairs: identical docs always collide, disjoint never") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"), // identical → all bands agree
      (3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", n = 3, k = 64)
    val cand = Dedup.lshCandidatePairs(sigs, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    // docs 1/2 vs 3 share no shingles → no band can collide (min-hashes
    // are over disjoint shingle sets; equality would need a hash tie)
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)))
  }

  test("simhash near-dups include the planted near-identical pairs") {
    val planted = exactPairs
    assert(planted.nonEmpty, "test corpus should contain planted near-dups")
    val sim = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count(sim.contains).toDouble / planted.size
    info(s"simhash recall of planted pairs = $recall (pairs found = ${sim.size})")
    // SimHash is token-frequency-based (coarser than 3-gram Jaccard, and
    // this tiny-vocab corpus is its adversarial case — every doc shares
    // most of the vocabulary). The 0.99-Jaccard planted pairs must still
    // mostly collapse to within Hamming 7.
    assert(recall >= 0.7, s"simhash recall of planted pairs = $recall")
  }

  test("simhash of identical content is identical (hamming 0)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val hs = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    assert(hs(1L) != hs(3L))
  }

  test("incremental near-dup vs signature index finds re-ingested docs") {
    // index = corpus signatures (text never re-read); new batch =
    // verbatim copy of doc 0, near-copy of doc 1, one unrelated doc.
    val s = spark
    import s.implicits._
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val index = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 64)
    val batch = Seq(
      (100000L, texts(0L)),                       // exact re-ingest
      (100001L, texts(1L) + " tail token"),       // near-dup
      (100002L, "zz yy xx ww vv uu tt ss rr qq")) // unrelated
      .toDF("doc_id", "text")
    val got = Dedup.minhashNearDupsAgainstIndex(batch, "doc_id", "text",
        index, n = 3, k = 64, bands = 16, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byNew = got.groupBy(_._1)
    // identical text → identical signatures → estimate exactly 1.0
    assert(byNew(100000L).exists(m => m._2 == 0L && m._3 == 1.0))
    assert(byNew.get(100001L).exists(_.exists(_._2 == 1L)))
    assert(!byNew.contains(100002L))
  }

  test("crossCorpusOverlap: exact counts, self-matches excluded") {
    val s = spark
    import s.implicits._
    // doc 1 ≡ bench 10 (4 shared trigrams), doc 2 shares 1, doc 3 none;
    // doc 10 is ALSO in the corpus (a benchmark leaked verbatim) and
    // must not flag against itself.
    val corpus = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "a quick brown fox sleeps instead now"),
      (3L, "completely unrelated text with nothing shared"),
      (10L, "the quick brown fox jumps over it")).toDF("doc_id", "text")
    val bench = Seq((10L, "the quick brown fox jumps over it"))
      .toDF("doc_id", "text")
    val got = Dedup.crossCorpusOverlap(corpus, bench, "doc_id", "text",
        n = 3, minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // "the quick brown fox jumps over it" = 5 trigram shingles; doc 2
    // shares exactly "a/quick/brown..." → "quick brown fox" only.
    assert(got((1L, 10L)) == 5L)
    assert(got((2L, 10L)) == 1L)
    assert(!got.contains((3L, 10L)))
    assert(!got.contains((10L, 10L)), "benchmark flagged itself")
  }

  test("dedupLines: first occurrence survives, later copies drop, order kept") {
    val s = spark
    import s.implicits._
    // doc 1 owns "alpha" and "beta"; doc 2 repeats "alpha" (dropped)
    // around its own line; doc 3 is ALL repeats → survives empty; the
    // in-doc repeat of "beta" inside doc 1 also drops (first pos wins).
    val docs = Seq(
      (1L, "alpha\nbeta\nbeta"),
      (2L, "alpha\ngamma\nbeta"),
      (3L, "beta\nalpha")).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("alpha\nbeta", 2L, 1L)))
    assert(got(2L) == (("gamma", 1L, 2L)))
    assert(got(3L) == (("", 0L, 2L)), "fully-duplicated doc must survive as a row")
  }

  test("dedupLines: skew-safe pre-aggregate form == window form under a hot line") {
    val s = spark
    import s.implicits._
    // plant ONE line in 50% of the docs (twice per doc) — the corpus-wide
    // hot-line shape (empty line / nav boilerplate) that makes the window
    // form a single-task straggler at scale; both forms must agree exactly
    val docs = (1L to 200L).map { i =>
      val text =
        if (i % 2 == 0) s"every page has this line\nunique line $i\nevery page has this line"
        else s"unique line $i\nalso unique $i"
      (i, text)
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val safe = rows(Dedup.dedupLines(docs, "doc_id", "text"))
    val win = rows(Dedup.dedupLines(docs, "doc_id", "text", skewSafe = false))
    assert(safe == win, "pre-aggregate and window forms diverged")
    // the hot line survives exactly once corpus-wide — in doc 2 (lowest
    // id containing it), at its first position
    assert(safe.count(_._2.contains("every page has this line")) == 1)
    assert(safe.find(_._1 == 2L).get._2
      == "every page has this line\nunique line 2")
  }

  test("dedupLinesAgainstIndex: index lines drop, batch-first survives, index grows") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "nav bar\nalpha"), (2L, "nav bar\nbeta"))
      .toDF("doc_id", "text")
    val index = corpus
      .select(explode(split(col("text"), "\n")).as("line"))
      .select(xxhash64(col("line")).as("line_hash")).distinct()
    val batch = Seq(
      (10L, "nav bar\ngamma\ndelta"), // nav bar → index hit; gamma/delta novel
      (11L, "gamma\nepsilon"),        // gamma lost to (10, pos 1); epsilon first here
      (12L, "alpha\nepsilon"))        // alpha → index hit; epsilon lost to (11, pos 1)
      .toDF("doc_id", "text")
    val (cleaned, updated) =
      Dedup.dedupLinesAgainstIndex(batch, "doc_id", "text", index)
    val got = cleaned.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(10L) == (("gamma\ndelta", 2L, 1L)))
    assert(got(11L) == (("epsilon", 1L, 1L)))
    assert(got(12L) == (("", 0L, 2L)), "all-dup doc must survive as a row")
    // updated index = 3 historical lines + 3 novel survivors
    assert(updated.count() == 6L)
    // idempotence: the same batch against the UPDATED index is all dups
    val (again, _) =
      Dedup.dedupLinesAgainstIndex(batch, "doc_id", "text", updated)
    assert(again.collect().forall(_.getLong(2) == 0L),
      "re-ingest against updated index must keep zero lines")
  }

  test("exactAgainstIndex: re-ingest drops vs index, min id wins within batch") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
    val index = Dedup.exact(corpus, "doc_id", "text")
      .select(col("content_hash"), col("keep_id"))
    val batch = Seq(
      (10L, "alpha doc"),     // corpus re-ingest → dropped vs index
      (14L, " ALPHA   Doc "), // normalized dup of corpus content → dropped
      (11L, "gamma doc"),     // novel → survives
      (13L, "delta doc"),     // within-batch dup, higher id → dropped
      (12L, "delta doc"))     // within-batch dup, min id → survives
      .toDF("doc_id", "text")
    val (survivors, updated) =
      Dedup.exactAgainstIndex(batch, "doc_id", "text", index)
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(11L, 12L))
    // updated index: 2 corpus hashes (keep ids unchanged) + gamma + delta
    assert(updated.select("keep_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 11L, 12L))
    // idempotence: the same batch against the UPDATED index is all dups
    val (again, _) = Dedup.exactAgainstIndex(batch, "doc_id", "text", updated)
    assert(again.count() == 0)
  }

  test("exactAgainstIndex over a BUCKETED index: index side joins exchange-free") {
    // the scaladoc's 100 TB claim, pinned: with the hash index persisted
    // bucketed on content_hash (bucket count == shuffle.partitions so
    // the batch aggregate's exchange already satisfies the join
    // distribution), the anti-join consumes the bucket layout — the
    // ONLY content_hash exchange in the whole plan is the batch's own
    // pre-aggregate; the index is never re-shuffled
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") < 250)
    val index = Dedup.exact(corpus, "doc_id", "text")
      .select(col("content_hash"), col("keep_id"))
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    graft.sources.Sinks.writeBucketed(index, "dedup_index_b",
      buckets = nParts, keys = Seq("content_hash"))
    val batch = docs.filter(col("doc_id") >= 250)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (got, plan) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val (_, updated) = Dedup.exactAgainstIndex(
          batch, "doc_id", "text", spark.table("dedup_index_b"))
        val rows = updated.collect().map(_.getLong(1)).toSet
        (rows, updated.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the adaptive plan string repeats nodes in its "Initial Plan"
    // section — audit only the final plan
    val finalPlan = plan.split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning\\(content_hash"
      .r.findAllIn(finalPlan).size
    assert(hashExchanges == 1,
      s"expected exactly the batch-side pre-aggregate exchange, got $hashExchanges:\n$finalPlan")
    assert(finalPlan.contains("Bucketed: true"),
      s"index scan did not use the bucket layout:\n$finalPlan")
    // same survivors as the unbucketed path
    val (_, updatedRef) = Dedup.exactAgainstIndex(batch, "doc_id", "text", index)
    assert(got == updatedRef.collect().map(_.getLong(1)).toSet)
  }

  test("dropRepeatedSpans: later copies trimmed, first occurrence kept") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e"),       // owns span "a b c" — untouched
      (2L, "x y z a b c"),     // re-uses "a b c" at pos 3 -> loses 3,4,5
      (3L, "p q p q p q"),     // self-repetition: keeps first k tokens
      (4L, "m n")              // shorter than k: untouched
    ).toDF("doc_id", "text")
    val got = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("a b c d e", 5L, 0L)), s"got $got")
    assert(got(2L) == (("x y z", 3L, 3L)), s"got $got")
    // spans (p q p)@0 and (q p q)@1 are the firsts; their later copies
    // at 2 and 3 cover positions 2..5 -> only "p q" survives
    assert(got(3L) == (("p q", 2L, 4L)), s"got $got")
    assert(got(4L) == (("m n", 2L, 0L)), s"got $got")
  }

  test("dropRepeatedSpans: fully-duplicated long doc loses everything, fast") {
    // The rebuild's worst case: a long doc that is a verbatim copy of
    // an earlier one gets a drop-set covering EVERY position. The
    // hash-based array_except rebuild is O(n + |dps|) per doc; the
    // per-token contains-scan it replaced was O(n·|dps|) — quadratic
    // exactly here, the common case in dedup workloads. 10k tokens
    // would take ~10^8 interpreted lambda steps the old way; the test
    // budget (generous for CI noise) would blow through it.
    val s = spark
    import s.implicits._
    val longText = (1 to 10000).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, longText), (2L, longText)).toDF("doc_id", "text")
    val t0 = System.nanoTime
    val got = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val secs = (System.nanoTime - t0) / 1e9
    assert(got(1L) == ((longText, 10000L, 0L)), "first copy must be untouched")
    assert(got(2L) == (("", 0L, 10000L)), "verbatim copy must lose every token")
    assert(secs < 60.0, f"worst-case rebuild took $secs%.1f s")
  }

  test("drop_positions native matches the composable rebuild (parity)") {
    // every dispatch regime in one frame: clean (empty dps), sparse
    // (small dps), heavy (most positions dropped), out-of-range and
    // duplicate positions ignored, null token slots passed through
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Seq("a", "b", "c"), Seq[Integer]()),
      (2L, Seq("a", "b", "c", "d"), Seq[Integer](1, 3)),
      (3L, (1 to 200).map(i => s"w$i"), (0 until 190).map(Integer.valueOf)),
      (4L, Seq("a", "b"), Seq[Integer](5, -1, 0, 0)),
      (5L, Seq.empty[String], Seq[Integer]()),
      (6L, Seq("a", "b", "c"), Seq[Integer](1, null))
    ).toDF("id", "toks", "dps")
      .withColumn("dps", col("dps").cast("array<int>"))
    val expected = Map(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "c"),
      3L -> (191 to 200).map(i => s"w$i"),
      4L -> Seq("b"),
      5L -> Seq.empty[String],
      6L -> Seq("a", "c"))
    val native = org.apache.spark.sql.GraftColumn.of(
      graft.functions.DropPositions(
        org.apache.spark.sql.GraftColumn.expr(col("toks")),
        org.apache.spark.sql.GraftColumn.expr(col("dps")), 1))
    // codegen path: the native column ALONE in the projection (the
    // lambda-HOF composable columns force a projection interpreted —
    // CharDupFraction lesson — so a combined frame would only ever
    // exercise nullSafeEval); expectations are literals, and the
    // frame is non-foldable local data under whole-stage codegen
    rows.select(col("id"), native.as("n")).collect().foreach { r =>
      assert(r.getSeq[String](1) == expected(r.getLong(0)),
        s"codegen id=${r.getLong(0)}: got ${r.getSeq[String](1)}")
    }
    // interpreted parity vs the retained composable dispatch
    val got = rows.select(col("id"), native.as("n"),
        Dedup.rebuildComposable(col("toks"), col("dps")).as("c"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"id=${r.getLong(0)}: native ${r.getSeq[String](1)} vs composable ${r.getSeq[String](2)}")
    }
    // and via SQL registration — 2-arg point form and 3-arg span form
    val sql = spark.sql(
      "SELECT drop_positions(array('x','y','z'), array(1)) AS k").head()
    assert(sql.getSeq[String](0) == Seq("x", "z"))
    val span = spark.sql(
      "SELECT drop_positions(array('a','b','c','d','e'), array(1), 3) AS k").head()
    assert(span.getSeq[String](0) == Seq("a", "e"))
    // span clamping: a start near the end drops only what exists
    val clamp = spark.sql(
      "SELECT drop_positions(array('a','b','c'), array(2), 3) AS k").head()
    assert(clamp.getSeq[String](0) == Seq("a", "b"))
  }

  test("softDedupWeights: cluster mass sums to one distinct content each") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha  beta gamma "), // same normalized
      (3L, "alpha beta gamma"),                             // triple cluster
      (4L, "delta epsilon"), (5L, "delta epsilon"),         // pair cluster
      (6L, "zeta eta theta")                                // singleton
    ).toDF("doc_id", "text")
    val w = Dedup.softDedupWeights(df, "doc_id", "text")
    assert(w.count() == 6) // keeps every row — soft, not hard, dedup
    val byId = w.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byId(1L) == ((3L, 0.333333)) && byId(2L) == ((3L, 0.333333)))
    assert(byId(4L) == ((2L, 0.5)) && byId(6L) == ((1L, 1.0)))
    // total weight == number of distinct contents (expected epoch mass)
    val total = w.agg(sum(col("weight"))).head().getDouble(0)
    assert(math.abs(total - 3.0) < 1e-3, s"total weight $total")
  }

  test("containmentPairs catches the truncation Jaccard misses") {
    val s = spark
    import s.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val half = (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, long), (2L, half),                    // 2 truncated from 1
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")            // unrelated
    ).toDF("doc_id", "text")
    // symmetric Jaccard at 0.8: the half-copy scores ~0.47 — missed
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.8)
      .collect()
    assert(jac.isEmpty, s"jaccard should miss the truncation: ${jac.toSeq}")
    // directed containment at 0.9: 2→1 scores exactly 1.0
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 3, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((2L, 1L, 1.0)), s"got $got")
  }

  test("containmentPairs maxDocFreq cap: boilerplate shingles cut, true containment kept") {
    val s = spark
    import s.implicits._
    val boiler = "subscribe to our newsletter for daily updates today"
    // 20 distinct docs, every one ending in the shared boilerplate —
    // uncapped, the boiler shingles' posting lists pair ALL docs
    val base = (1 to 20).map(i =>
      (i.toLong, (1 to 12).map(j => s"u${i}w$j").mkString(" ") + " " + boiler))
    // one half-truncation of doc 1's unique part, no boilerplate
    val trunc = (101L, (1 to 6).map(j => s"u1w$j").mkString(" "))
    val df = (base :+ trunc).toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(df, "doc_id", "text", n = 3, tau = 0.9,
        maxDocFreq = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the planted truncation survives the cap at exactly 1.0 (its
    // shingles are a strict subset of doc 1's unique prefix)
    assert(capped == Set((101L, 1L, 1.0)), s"got $capped")
    // same result as uncapped HERE (boiler pairs never reach tau=0.9),
    // but the cap removes the df=20 posting lists BEFORE the self-join
    val uncapped = Dedup.containmentPairs(df, "doc_id", "text", n = 3, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncapped == capped)
    // filter direction pin: cap = 0 cuts every shingle → no pairs at all
    assert(Dedup.containmentPairs(df, "doc_id", "text", n = 3, tau = 0.9,
      maxDocFreq = Some(0L)).isEmpty)
  }

  test("containmentPairsApprox: recalls comparable-size containment, bounded estimate error") {
    // the q140 planting over the real corpus: half-truncations have
    // J ≈ 0.5 vs their source — inside the default banding's S-curve
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 30), " ").as("text")))
    val exact = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "planting must create containment pairs")
    // approx at a slack threshold (estimator σ ≈ 0.06 at k=64): grade
    // recall of the exact tau=0.9 pairs and the per-pair estimate error
    val approx = Dedup.containmentPairsApprox(corpus, "doc_id", "text",
        n = 3, tau = 0.7, k = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val recalled = exact.keySet.count(approx.contains)
    val recall = recalled.toDouble / exact.size
    info(s"approx containment recall = $recall (${approx.size} approx pairs)")
    assert(recall >= 0.9, s"recall $recall of ${exact.size} exact pairs")
    val errs = exact.collect { case (k, c) if approx.contains(k) =>
      math.abs(approx(k) - c) }
    assert(errs.forall(_ <= 0.25),
      s"estimate error out of band: max = ${errs.max}")
  }

  test("lshParameterPlan: hand-checked argmin, b*r == k, sane probabilities") {
    val got = Dedup.lshParameterPlan(spark, k = 4, targets = Seq(0.3, 0.7, 0.95))
      .collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // s* per split of k=4: (b=1,r=4)→1.0, (b=2,r=2)→0.707107, (b=4,r=1)→0.25
    assert(got.toSeq == Seq(
      (0.3, 4, 1, 0.25),         // |0.25-0.3| = 0.05 beats |0.707-0.3|
      (0.7, 2, 2, 0.707107),
      (0.95, 1, 4, 1.0)), got.mkString(","))
    val full = Dedup.lshParameterPlan(spark, k = 128,
      targets = Seq(0.5, 0.6, 0.7, 0.8, 0.9)).collect()
    full.foreach { r =>
      assert(r.getInt(1) * r.getInt(2) == 128)
      val p = r.getAs[Double]("p_at_target")
      assert(p > 0.0 && p <= 1.0)
    }
    // sharper target ⇒ the chosen inflection is non-decreasing
    val ss = full.sortBy(_.getDouble(0)).map(_.getAs[Double]("s_star"))
    assert(ss.zip(ss.tail).forall { case (a, b) => a <= b })
  }

  test("approx_count_distinct within 5% of exact (q15 contract)") {
    val rows = SparkEntry.queries("q15_agg_approx")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL estimate $approx vs exact $exact")
    }
  }
}
