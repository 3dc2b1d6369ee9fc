package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Structured Streaming surface (T2 file-arrival incremental runs,
  * T15 watermarked windows, custom state via flatMapGroupsWithState). */
class StreamsSpec extends SparkSpec {

  private def writeBatch(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("file-arrival + AvailableNow processes only new files per run (T2/T13)") {
    val in = Files.createTempDirectory("graft_stream_in_").toString
    val out = Files.createTempDirectory("graft_stream_out_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString

    writeBatch(in, Seq((1L, "2024-01-01 00:05:00", 1.0), (2L, "2024-01-01 00:10:00", 2.0)))
    val stream1 = Streams.fileArrival(spark, in, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    Streams.runAvailableNow(stream1.select("user_id", "ts", "value"), out, ckpt)
    assert(spark.read.parquet(out).count() == 2)

    // second batch arrives; a new AvailableNow run picks up ONLY it
    writeBatch(in, Seq((3L, "2024-01-01 01:00:00", 3.0)))
    val stream2 = Streams.fileArrival(spark, in, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    Streams.runAvailableNow(stream2.select("user_id", "ts", "value"), out, ckpt)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3, "incremental run must append only the new file")
    assert(rows.select(sum("value")).head().getDouble(0) == 6.0)
  }

  test("watermarked windowed aggregation over a file stream (T15/A4)") {
    val in = Files.createTempDirectory("graft_stream_in_").toString
    val out = Files.createTempDirectory("graft_stream_out_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString
    def run(): Unit = {
      val stream = Streams.fileArrival(spark, in, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
      val agg = Streams.windowedCounts(stream, "ts", "1 hour", "0 seconds")
      Streams.runAvailableNow(agg.select(col("window.start").as("ws"),
        col("n"), col("sum_value")), out, ckpt)
    }
    // Append-mode windows emit only once the watermark (checkpointed,
    // advanced at the END of each batch) passes their end — so each
    // incremental run flushes windows the PREVIOUS run's data closed.
    writeBatch(in, Seq(
      (1L, "2024-01-01 00:05:00", 1.0), (1L, "2024-01-01 00:20:00", 2.0),
      (2L, "2024-01-01 01:05:00", 4.0)))
    run() // watermark was -inf during this batch: nothing emitted yet
    writeBatch(in, Seq((2L, "2024-01-01 02:30:00", 8.0)))
    run() // watermark now 01:05 → flushes the [00:00,01:00) window
    writeBatch(in, Seq((2L, "2024-01-01 03:30:00", 16.0)))
    run() // flushes [01:00,02:00) and [02:00,03:00); [03:00,04:00) stays open
    val got = spark.read.parquet(out).orderBy("ws").collect()
    assert(got.length == 3, got.mkString(";"))
    assert(got(0).getAs[Long]("n") == 2 && got(0).getAs[Double]("sum_value") == 3.0)
    assert(got(1).getAs[Long]("n") == 1 && got(1).getAs[Double]("sum_value") == 4.0)
    assert(got(2).getAs[Long]("n") == 1 && got(2).getAs[Double]("sum_value") == 8.0)
    // the window holding 03:30 is still open — never emitted early
    assert(!got.exists(_.getTimestamp(0).toString.startsWith("2024-01-01 03")))
  }

  test("stream-stream time-bounded join attributes clicks within the window (T15)") {
    val s = spark
    import s.implicits._
    val impDir = Files.createTempDirectory("graft_imp_").toString
    val clkDir = Files.createTempDirectory("graft_clk_").toString
    val out = Files.createTempDirectory("graft_join_out_").toString
    val ckpt = Files.createTempDirectory("graft_join_ckpt_").toString

    Seq(("ad1", "2024-01-01 00:00:00"), ("ad2", "2024-01-01 00:00:00"))
      .toDF("imp_ad", "imp_ts_s")
      .select(col("imp_ad"), col("imp_ts_s").cast("timestamp").as("imp_ts"))
      .coalesce(1).write.mode("append").parquet(impDir)
    Seq(("ad1", "2024-01-01 00:00:10"),   // within 30s → attributed
        ("ad1", "2024-01-01 00:02:00"))   // 120s later → outside window
      .toDF("clk_ad", "clk_ts_s")
      .select(col("clk_ad"), col("clk_ts_s").cast("timestamp").as("clk_ts"))
      .coalesce(1).write.mode("append").parquet(clkDir)

    val imps = Streams.fileArrival(spark, impDir, "imp_ad STRING, imp_ts TIMESTAMP")
    val clks = Streams.fileArrival(spark, clkDir, "clk_ad STRING, clk_ts TIMESTAMP")
    val joined = Streams.timeBoundJoin(imps, clks,
      "imp_ad", "clk_ad", "imp_ts", "clk_ts", "0 seconds", "30 seconds")
    Streams.runAvailableNow(
      joined.select(col("imp_ad"), col("imp_ts"), col("clk_ts")), out, ckpt)

    val got = spark.read.parquet(out).collect()
    assert(got.length == 1, got.mkString(";"))
    assert(got.head.getString(0) == "ad1")
    assert(got.head.getTimestamp(2).toString == "2024-01-01 00:00:10.0")
  }

  test("dropDuplicatesWithinWatermark: dups suppressed, state evicted after horizon") {
    val in = Files.createTempDirectory("graft_dedup_in_").toString
    val out = Files.createTempDirectory("graft_dedup_out_").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ckpt_").toString
    def run(): Unit = {
      val stream = Streams.fileArrival(spark, in, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
      Streams.runAvailableNow(
        Streams.dedupWithinWatermark(stream, "ts", "1 hour", "user_id"), out, ckpt)
    }
    // duplicates inside one watermark horizon collapse to the first row
    writeBatch(in, Seq(
      (1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 00:10:00", 99.0),
      (2L, "2024-01-01 00:20:00", 2.0)))
    run()
    assert(spark.read.parquet(out).count() == 2)
    // a day later the key is STILL suppressed in the batch that carries
    // it: the checkpointed watermark (advanced only at batch END) hasn't
    // passed the key's expiry when the batch starts
    writeBatch(in, Seq((1L, "2024-01-02 12:00:00", 7.0)))
    run()
    assert(spark.read.parquet(out).count() == 2)
    // …but that run advanced the watermark past the expiry, evicting the
    // state — the NEXT occurrence of the key is re-emitted
    writeBatch(in, Seq((1L, "2024-01-03 00:00:00", 11.0)))
    run()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 3, rows.mkString(";"))
    assert(rows.count(_.getLong(0) == 1L) == 2)
    // suppressed duplicates (99.0 within horizon, 7.0 pre-eviction)
    // never reached the sink; the post-eviction 11.0 did
    assert(!rows.exists(_.getDouble(2) == 99.0) && !rows.exists(_.getDouble(2) == 7.0))
    assert(rows.exists(_.getDouble(2) == 11.0))
  }

  test("streaming curation: quality gate + content-hash dedup in one stream") {
    // The Text column library composing INSIDE a streaming query — the
    // daily-ingest curation shape as a stream: file arrival → quality/
    // language gate (pure projections, streaming-safe) → exact dedup
    // via dropDuplicatesWithinWatermark on the content hash. Batch and
    // streaming share the exact same gate expressions.
    val s = spark
    import s.implicits._
    import graft.functions.Text
    val in = Files.createTempDirectory("graft_cur_in_").toString
    val out = Files.createTempDirectory("graft_cur_out_").toString
    val ckpt = Files.createTempDirectory("graft_cur_ckpt_").toString
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks to the river bank to rest in the afternoon sun for a while " +
      "before heading home through the quiet village streets at dusk " +
      "watching the light fade over the hills and the fields of wheat " +
      "that stretch away toward the horizon in every direction tonight"
    def writeDocs(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "ts_s", "text")
        .select(col("doc_id"), col("ts_s").cast("timestamp").as("ts"), col("text"))
        .coalesce(1).write.mode("append").parquet(in)
    def run(): Unit = {
      val stream = Streams.fileArrival(spark, in,
        "doc_id BIGINT, ts TIMESTAMP, text STRING")
        .select(col("doc_id"), col("ts"), col("text"),
          Text.langId(col("text")).as("lang_id"),
          Text.qualityScore(col("text")).as("quality"),
          Text.contentHash(col("text")).as("content_hash"))
        .filter(col("lang_id") === "en" && col("quality") >= 0.72)
      Streams.runAvailableNow(
        Streams.dedupWithinWatermark(stream, "ts", "1 hour", "content_hash"),
        out, ckpt)
    }
    writeDocs(Seq(
      (1L, "2024-01-01 00:00:00", good),
      (2L, "2024-01-01 00:05:00", "$$$ ### !!! %%% @@@"), // fails the gate
      (3L, "2024-01-01 00:10:00", good)))                 // dup of doc 1
    run()
    val got1 = spark.read.parquet(out).collect()
    assert(got1.length == 1 && got1.head.getAs[Long]("doc_id") == 1L,
      "only the first clean unique doc may pass")
    // a later batch: same content within the horizon stays suppressed,
    // a novel clean doc passes
    writeDocs(Seq(
      (4L, "2024-01-01 00:30:00", good),
      (5L, "2024-01-01 00:40:00", good + " with a new closing sentence")))
    run()
    val got2 = spark.read.parquet(out).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(got2.toSeq == Seq(1L, 5L), s"got ${got2.mkString(",")}")
  }

  test("sessionization with flatMapGroupsWithState: gap splits sessions") {
    val s = spark
    import s.implicits._
    // batch Dataset path of the same code (stateful func runs per group)
    val events = Seq(
      Streams.Event(1L, 0L), Streams.Event(1L, 10000L),          // session A
      Streams.Event(1L, 100000L),                                 // session B (gap > 30s)
      Streams.Event(2L, 5000L)).toDS()                            // user 2, open session
    val sessions = Streams.sessionize(events, gapMs = 30000L).collect()
    // closed sessions only: user 1's first session (the second stays open
    // in state; user 2's single session stays open)
    assert(sessions.toSet == Set(Streams.SessionOut(1L, 0L, 10000L, 2)))
  }

  test("foreachBatch maintains the bloom-routed dedup index incrementally (T13)") {
    val s = spark
    import s.implicits._
    import graft.operators.{Bloom, Dedup}
    val in = Files.createTempDirectory("graft_fb_in_").toString
    val ckpt = Files.createTempDirectory("graft_fb_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_fb_idx_").toString

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    // versioned index paths: each micro-batch reads v(n), writes v(n+1)
    // (a real pipeline would MERGE into a table; parquet has no
    // in-place upsert and overwriting a path being read is an error)
    var version = 0
    def indexAt(v: Int) = s"$idxRoot/v$v"
    Seq.empty[(String, Long)].toDF("content_hash", "keep_id")
      .write.parquet(indexAt(0))

    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, _) =>
        val index = spark.read.parquet(indexAt(version))
        val bloom = Bloom.build(index, col("content_hash"), expectedItems = 100L)
        val (_, updated) =
          Dedup.exactAgainstIndexBloom(batch, "doc_id", "text", index, bloom)
        updated.write.parquet(indexAt(version + 1))
        version += 1
    }

    val batch1 = Seq(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "alpha beta")
    val batch2 = Seq(4L -> "ALPHA   beta", 5L -> "epsilon zeta", 6L -> "epsilon zeta")
    writeDocs(batch1); ingest()                 // first run: empty-index bloom path
    writeDocs(batch2); ingest()                 // second run: only the new file
    val streamed = spark.read.parquet(indexAt(version))
    val batchEquivalent = Dedup.exact(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")
      .select(col("content_hash"), col("keep_id"))
    assert(streamed.exceptAll(batchEquivalent).isEmpty &&
      batchEquivalent.exceptAll(streamed).isEmpty,
      "streaming-maintained index must equal the batch rebuild")
    // doc 4 normalizes to doc 1's content: the cross-run dup was
    // dropped via the index, not recomputed from the corpus
    assert(streamed.filter(col("keep_id") === 4L).isEmpty)
  }

  test("foreachBatch maintains the minhash signature index incrementally (T15)") {
    val s = spark
    import s.implicits._
    import graft.operators.Dedup
    val in = Files.createTempDirectory("graft_mh_in_").toString
    val ckpt = Files.createTempDirectory("graft_mh_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_mh_idx_").toString
    val (n, k, bands) = (2, 16, 4)

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def indexAt(v: Int) = s"$idxRoot/v$v"
    // v0: an empty SIGNATURE table with the operator's own schema
    Dedup.minhashSignatures(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", n, k)
      .write.parquet(indexAt(0))

    // per-batch near-dups found against the index-so-far: the
    // daily-ingestion contract — cross-batch dups surface WITHOUT
    // re-reading earlier batches' text (only their signatures)
    val dupsSeen = scala.collection.mutable.Buffer[(Long, Long)]()
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, _) =>
        val index = spark.read.parquet(indexAt(version))
        dupsSeen ++= Dedup.minhashNearDupsAgainstIndex(
            batch, "doc_id", "text", index, n, k, bands, tau = 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        index.unionByName(
            Dedup.minhashSignatures(batch, "doc_id", "text", n, k))
          .write.parquet(indexAt(version + 1))
        version += 1
    }

    val batch1 = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs")
    val batch2 = Seq(
      3L -> "the quick brown fox jumps over the lazy dog", // dup of 1
      4L -> "sphinx of black quartz judge my vow today")   // novel
    writeDocs(batch1); ingest()                 // first run: empty index
    writeDocs(batch2); ingest()                 // second run: only the new file
    assert(dupsSeen.toSet == Set(3L -> 1L),
      s"expected exactly the cross-batch dup (3,1), got $dupsSeen")
    // streamed index == batch rebuild over the full corpus
    val streamed = spark.read.parquet(indexAt(version))
    val rebuilt = Dedup.minhashSignatures(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", n, k)
    assert(streamed.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(streamed).isEmpty,
      "streaming-maintained signature index must equal the batch rebuild")
  }

  test("foreachBatch maintains the postings index incrementally (append-only)") {
    val s = spark
    import s.implicits._
    import graft.operators.Postings
    val in = Files.createTempDirectory("graft_pi_in_").toString
    val ckpt = Files.createTempDirectory("graft_pi_ckpt_").toString
    val idx = Files.createTempDirectory("graft_pi_idx_").toString + "/postings"

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    // postings are (term, doc_id, pos) facts — a batch contributes its
    // own rows and NEVER touches earlier ones, so the incremental form
    // is a pure append: no read-modify-write, safe under retries as
    // long as batch output is idempotent (foreachBatch + parquet
    // append keyed by checkpoint). This is the simplest of the
    // incremental index contracts — pinned here so the family
    // (minhash signatures, DSIR counts, first-seen novelty, postings)
    // all state their merge story explicitly.
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, _) =>
        Postings.build(batch, "doc_id", "text")
          .write.mode("append").parquet(idx)
    }

    val batch1 = Seq(1L -> "to be or not to be", 2L -> "be not afraid")
    val batch2 = Seq(3L -> "not to be trusted", 4L -> "to be or to be")
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()

    val streamed = spark.read.parquet(idx)
    val rebuilt = Postings.build(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")
    assert(streamed.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(streamed).isEmpty,
      "streaming-appended postings must equal the batch rebuild")
    // and the search surface agrees: phrase hits against the streamed
    // index == hits against the rebuild
    val a = Postings.phraseOccurrences(streamed, Seq("to", "be"))
      .collect().map(_.toString).sorted.toSeq
    val b = Postings.phraseOccurrences(rebuilt, Seq("to", "be"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("foreachBatch maintains a Count-Min sketch incrementally") {
    val s = spark
    import s.implicits._
    import graft.operators.CountMin
    val in = Files.createTempDirectory("graft_cm_in_").toString
    val ckpt = Files.createTempDirectory("graft_cm_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_cm_idx_").toString
    val (width, depth) = (64, 3)

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "k").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def skAt(v: Int) = s"$idxRoot/v$v"
    // v0: the zero sketch (counters are linear, so zero is the unit)
    Seq(CountMin.Sketch(width, depth, 0L, new Array[Long](width * depth)))
      .toDS().write.parquet(skAt(0))

    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, k STRING"), ckpt) {
      (batch, _) =>
        val stored = spark.read.parquet(skAt(version))
          .as[CountMin.Sketch].head()
        val merged = CountMin.merge(stored,
          CountMin.sketch(batch, "k", width, depth))
        Seq(merged).toDS().write.parquet(skAt(version + 1))
        version += 1
    }

    val batch1 = (1L to 30L).map(i => i -> (if (i % 3 == 0) "x" else s"t$i"))
    val batch2 = (31L to 60L).map(i => i -> (if (i % 2 == 0) "x" else "y"))
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    val streamed = spark.read.parquet(skAt(version)).as[CountMin.Sketch].head()
    val whole = CountMin.sketch(
      (batch1 ++ batch2).toDF("doc_id", "k"), "k", width, depth)
    // entry-wise equality, not just equal estimates: the streamed
    // counters ARE the whole-corpus counters
    assert(streamed.counts.toSeq == whole.counts.toSeq && streamed.n == whole.n)
    assert(streamed.estimate("x") == 25L)
  }

  test("foreachBatch packs batches incrementally from the tail state") {
    val s = spark
    import s.implicits._
    import graft.operators.CorpusPrep
    val in = Files.createTempDirectory("graft_pk_in_").toString
    val ckpt = Files.createTempDirectory("graft_pk_ckpt_").toString
    val root = Files.createTempDirectory("graft_pk_idx_").toString
    val budget = 16

    def writeDocs(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("doc_id", "n").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def stateAt(v: Int) = s"$root/state_v$v"
    def packedAt(v: Int) = s"$root/packed_v$v"
    Seq.empty[(Long, Long, Long)].toDF("shard", "bin_id", "fill")
      .write.parquet(stateAt(0))

    // append-only ingest (monotonic ids): each batch packs FROM the
    // stored per-shard tail state and appends its assignments — the
    // corpus is never repacked, yet the union of batch outputs IS the
    // whole-corpus pack (packGreedyResume's contract). The next state
    // comes from packTailStateMerged: the batch tail ALONE would
    // understate a bin the batch continued (its fill counts only the
    // batch's rows), silently overpacking from the third batch on.
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, n BIGINT"), ckpt) {
      (batch, _) =>
        val prev = spark.read.parquet(stateAt(version))
        val packed = CorpusPrep.packGreedyResume(batch, "doc_id", "n",
          budget, pmod(col("doc_id"), lit(4)), prev)
        packed.write.mode("append").parquet(packedAt(0))
        CorpusPrep.packTailStateMerged(packed, "n", prev)
          .write.parquet(stateAt(version + 1))
        version += 1
    }

    // small lengths relative to the budget, so open bins CONTINUE
    // across batches — the case where the carried-over fill matters
    // (a batch tail alone would restart those bins' fills at the
    // batch contribution and overpack in the next round)
    val batch1 = (1L to 12L).map(i => i -> (i % 3 + 2))  // lens 2..4
    val batch2 = (13L to 24L).map(i => i -> (i % 4 + 1))
    val batch3 = (25L to 40L).map(i => i -> (i % 3 + 1))
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    writeDocs(batch3); ingest()

    val streamed = spark.read.parquet(packedAt(0))
      .collect().map(_.toString).sorted.toSeq
    val whole = CorpusPrep.packGreedyByLen(
        (batch1 ++ batch2 ++ batch3).toDF("doc_id", "n"), "doc_id", "n",
        budget, pmod(col("doc_id"), lit(4)))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == whole,
      "incrementally packed batches must equal the whole-corpus pack")
  }

  test("foreachBatch maintains a length-histogram store: exact streamed quantiles") {
    val s = spark
    import s.implicits._
    import graft.operators.CorpusPrep
    val in = Files.createTempDirectory("graft_lq_in_").toString
    val ckpt = Files.createTempDirectory("graft_lq_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_lq_idx_").toString

    def writeDocs(rows: Seq[(String, Long)]): Unit =
      rows.toDF("source", "len").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def histAt(v: Int) = s"$idxRoot/v$v"
    Seq.empty[(String, Long, Long)].toDF("source", "len", "cnt")
      .write.parquet(histAt(0))

    // the (group, length → #docs) histogram is the quantile walk's
    // sufficient statistic AND merges by count addition — so the
    // store yields EXACT whole-corpus quantiles with no sketch error,
    // unlike every approximate streaming-quantile structure
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "source STRING, len BIGINT"), ckpt) {
      (batch, _) =>
        spark.read.parquet(histAt(version))
          .unionByName(batch.groupBy(col("source"), col("len"))
            .agg(count(lit(1)).as("cnt")))
          .groupBy(col("source"), col("len"))
          .agg(sum(col("cnt")).as("cnt"))
          .write.parquet(histAt(version + 1))
        version += 1
    }

    val batch1 = (1L to 30L).map(i => ("a", i % 11 + 5))
    val batch2 = (1L to 25L).map(i => ("a", i % 7 + 2)) ++
      (1L to 10L).map(i => ("b", i))
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    val streamed = CorpusPrep.lengthQuantilesFromHist(
        spark.read.parquet(histAt(version)), "source", "len", "cnt",
        Seq(50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = CorpusPrep.lengthQuantilesByLen(
        (batch1 ++ batch2).toDF("source", "len"), "source", "len",
        Seq(50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed == whole && streamed.nonEmpty,
      s"streamed quantiles $streamed != whole-corpus $whole")
  }

  test("foreachBatch maintains an HLL distinct-count store (hll_union_agg)") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_hll_in_").toString
    val ckpt = Files.createTempDirectory("graft_hll_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_hll_idx_").toString

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "h").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def skAt(v: Int) = s"$idxRoot/v$v"
    // v0: the empty-input sketch (hll_sketch_agg over zero rows)
    Seq.empty[(Long, String)].toDF("doc_id", "h")
      .agg(hll_sketch_agg(col("h")).as("sk")).write.parquet(skAt(0))

    // distinct-count monitoring at ingest (e.g. distinct content
    // hashes = dedup-rate telemetry) without ever re-reading earlier
    // batches: per-batch sketches union into the store — the fourth
    // mergeable-store contract beside minhash signatures, DSIR/CM
    // counts, and the novelty first-seen index, this one through
    // Spark's own datasketches surface
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, h STRING"), ckpt) {
      (batch, _) =>
        spark.read.parquet(skAt(version))
          .unionByName(batch.agg(hll_sketch_agg(col("h")).as("sk")))
          .agg(hll_union_agg(col("sk"), lit(true)).as("sk"))
          .write.parquet(skAt(version + 1))
        version += 1
    }

    val batch1 = (1L to 40L).map(i => i -> s"h${i % 25}")   // 25 distinct
    val batch2 = (41L to 80L).map(i => i -> s"h${i % 60}")  // adds new keys
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    val streamed = spark.read.parquet(skAt(version))
      .select(hll_sketch_estimate(col("sk"))).head().getLong(0)
    val whole = (batch1 ++ batch2).toDF("doc_id", "h")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("h")))).head().getLong(0)
    assert(streamed == whole,
      s"streamed HLL store must equal the batch rebuild: $streamed vs $whole")
    // at this cardinality the sketch is still in exact (sparse) mode
    val exact = (batch1 ++ batch2).map(_._2).distinct.size.toLong
    assert(streamed == exact, s"estimate $streamed vs exact $exact")
  }

  test("foreachBatch maintains the DSIR count model incrementally") {
    val s = spark
    import s.implicits._
    import graft.operators.Dsir
    val in = Files.createTempDirectory("graft_ds_in_").toString
    val ckpt = Files.createTempDirectory("graft_ds_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_ds_idx_").toString
    val buckets = 256

    def writeDocs(rows: Seq[(Long, String, Boolean)]): Unit =
      rows.toDF("doc_id", "text", "is_target")
        .coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def countsAt(v: Int) = s"$idxRoot/v$v"
    Seq.empty[(Long, Long, Long)].toDF("b", "tf_t", "tf_r")
      .write.parquet(countsAt(0))

    // counts are the model's sufficient statistics: each micro-batch
    // merges its own <= buckets-row count table into the store — the
    // corpus is never re-read, yet the derived weights stay EXACTLY
    // the whole-corpus model (no approximation drift to monitor)
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in,
        "doc_id BIGINT, text STRING, is_target BOOLEAN"), ckpt) {
      (batch, _) =>
        Dsir.mergeCounts(spark.read.parquet(countsAt(version)),
            Dsir.countsFor(batch, col("is_target"), "text", buckets))
          .write.parquet(countsAt(version + 1))
        version += 1
    }

    val batch1 = Seq((1L, "alpha beta gamma", true),
      (2L, "zork quux blarg", false))
    val batch2 = Seq((3L, "beta gamma alpha alpha", true),
      (4L, "alpha zork quux", false))
    writeDocs(batch1); ingest()                 // first run: empty store
    writeDocs(batch2); ingest()                 // second run: only the new file
    val streamed = Dsir.weightsFromCounts(
        spark.read.parquet(countsAt(version)), buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val whole = Dsir.weightsFor(
        (batch1 ++ batch2).toDF("doc_id", "text", "is_target"),
        col("is_target"), "text", buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == whole,
      s"streamed DSIR model must equal the whole-corpus rebuild: $streamed vs $whole")
  }

  test("foreachBatch maintains the BPE word-count table; retrain equals batch training") {
    // the tokenizer-family incremental contract (symmetric with the
    // DSIR test above and NgramLm.mergeCounts): word counts are BPE
    // training's only corpus-derived state, so a stream folding each
    // micro-batch's (w, f) table into the store can retrain the
    // tokenizer at any moment without re-reading the corpus
    val s = spark
    import s.implicits._
    import graft.operators.{Bpe, NgramLm}
    val in = Files.createTempDirectory("graft_bpe_in_").toString
    val ckpt = Files.createTempDirectory("graft_bpe_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_bpe_idx_").toString

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def countsAt(v: Int) = s"$idxRoot/v$v"
    Seq.empty[(String, Long)].toDF("w", "f").write.parquet(countsAt(0))

    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, _) =>
        NgramLm.mergeCounts(spark.read.parquet(countsAt(version)),
            Bpe.wordFreq(batch, "text"))
          .write.parquet(countsAt(version + 1))
        version += 1
    }

    val batch1 = Seq(1L -> "low low low low low lower lower",
      2L -> "newest newest newest")
    val batch2 = Seq(3L -> "newest newest newest widest widest widest")
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    val (streamedMerges, _) = Bpe.trainFromWordFreq(
      spark.read.parquet(countsAt(version)), k = 5)
    val (wholeMerges, _) = Bpe.train(
      (batch1 ++ batch2).toDF("doc_id", "text"), "text", k = 5)
    assert(streamedMerges == wholeMerges,
      s"streamed-counts retrain must equal batch training: " +
        s"$streamedMerges vs $wholeMerges")
    // and it is the hand-computed Sennrich sequence (same corpus shape
    // as BpeSpec's classic test)
    assert(streamedMerges.map(m => (m._1, m._2)) == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w")))
    // the SAME streamed store retrains the other merge family too:
    // WordPiece consumes the identical (w, f) table, so one maintained
    // count store serves every tokenizer (the point of the shared
    // incremental contract)
    val (wpStreamed, _) = graft.operators.WordPiece.trainFromWordFreq(
      spark.read.parquet(countsAt(version)), k = 3)
    val (wpWhole, _) = graft.operators.WordPiece.train(
      (batch1 ++ batch2).toDF("doc_id", "text"), "text", k = 3)
    assert(wpStreamed == wpWhole,
      s"streamed-counts WordPiece retrain must equal batch: $wpStreamed vs $wpWhole")
  }

  test("foreachBatch maintains the BM25 postings index incrementally") {
    val s = spark
    import s.implicits._
    import graft.operators.Bm25
    val in = Files.createTempDirectory("graft_bm_in_").toString
    val ckpt = Files.createTempDirectory("graft_bm_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_bm_idx_").toString

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def indexAt(v: Int) = s"$idxRoot/v$v"
    Seq.empty[(Long, String, Long)].toDF("doc_id", "term", "tf")
      .write.parquet(indexAt(0))

    // postings are per-document, so an append-only corpus maintains
    // the index by PURE UNION: each micro-batch contributes only its
    // own documents' postings — the corpus is never re-read, and the
    // serving path (topKFromPostings) sees exactly the batch-rebuilt
    // index
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, _) =>
        spark.read.parquet(indexAt(version))
          .unionByName(Bm25.postings(batch, "doc_id", "text"))
          .write.parquet(indexAt(version + 1))
        version += 1
    }

    val batch1 = Seq(1L -> "apple banana apple", 2L -> "apple cherry")
    val batch2 = Seq(3L -> "banana banana banana cherry")
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    val streamed = spark.read.parquet(indexAt(version))
    val rebuilt = Bm25.postings(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")
    assert(streamed.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(streamed).isEmpty,
      "streaming-maintained postings must equal the batch rebuild")
    // serving parity: querying the maintained index == querying the corpus
    val probes = Seq((1L, "banana cherry")).toDF("query_id", "qtext")
    val fromStream = Bm25.topKFromPostings(streamed, probes, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val fromCorpus = Bm25.topK(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", probes, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(fromStream.sortBy(_._3).toSeq === fromCorpus.sortBy(_._3).toSeq)
  }

  test("foreachBatch maintains the novelty first-seen index incrementally") {
    val s = spark
    import s.implicits._
    import graft.operators.Novelty
    val in = Files.createTempDirectory("graft_nv_in_").toString
    val ckpt = Files.createTempDirectory("graft_nv_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_nv_idx_").toString

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def indexAt(v: Int) = s"$idxRoot/v$v"
    Seq.empty[(String, Long)].toDF("sh", "first_id").write.parquet(indexAt(0))

    // (sh, min id) is the operator's whole sufficient statistic and min
    // is associative — each micro-batch merges its own index in and the
    // per-batch scores against the store equal the whole-corpus scores
    val scored = scala.collection.mutable.Buffer[(Long, Double)]()
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, _) =>
        val index = spark.read.parquet(indexAt(version))
        scored ++= Novelty.ngramNoveltyAgainstIndex(
            batch, "doc_id", "text", n = 3, index)
          .collect().map(r => (r.getLong(0), r.getDouble(3)))
        Novelty.mergeIndex(index,
            Novelty.firstSeenIndex(batch, "doc_id", "text", n = 3))
          .write.parquet(indexAt(version + 1))
        version += 1
    }

    val batch1 = Seq(1L -> "a b c d e", 2L -> "a b c x y")
    val batch2 = Seq(3L -> "a b c d e", 4L -> "p q r s t")
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    // streamed index == batch rebuild
    val streamed = spark.read.parquet(indexAt(version))
    val rebuilt = Novelty.firstSeenIndex(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", n = 3)
    assert(streamed.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(streamed).isEmpty,
      "streaming-maintained first-seen index must equal the batch rebuild")
    // per-batch scores against the store == whole-corpus novelty
    val whole = Novelty.ngramNovelty(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(scored.toMap == whole,
      s"streamed novelty $scored vs whole-corpus $whole")
  }

  test("foreachBatch maintains the winnowing fingerprint index incrementally") {
    val s = spark
    import s.implicits._
    import graft.operators.Winnow
    val in = Files.createTempDirectory("graft_wn_in_").toString
    val ckpt = Files.createTempDirectory("graft_wn_ckpt_").toString
    val idxRoot = Files.createTempDirectory("graft_wn_idx_").toString

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    var version = 0
    def indexAt(v: Int) = s"$idxRoot/v$v"
    Seq.empty[(Long, Long)].toDF("doc_id", "fp").write.parquet(indexAt(0))

    // fingerprints are per-document (zero-shuffle projection), so the
    // index maintains by pure union — like the BM25 postings, the
    // corpus is never re-read; the shared-passage join runs against
    // the maintained index at any time
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, _) =>
        spark.read.parquet(indexAt(version))
          .unionByName(Winnow.fingerprints(batch, "doc_id", "text"))
          .write.parquet(indexAt(version + 1))
        version += 1
    }

    val passage = "alpha beta gamma delta epsilon zeta"
    val batch1 = Seq(1L -> s"one two three $passage four five")
    val batch2 = Seq(2L -> s"$passage entirely different tail here")
    writeDocs(batch1); ingest()
    writeDocs(batch2); ingest()
    val streamed = spark.read.parquet(indexAt(version))
    val rebuilt = Winnow.fingerprints(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")
    assert(streamed.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(streamed).isEmpty,
      "streaming-maintained fingerprint index must equal the batch rebuild")
    // the cross-batch shared passage is visible through the index
    val shared = streamed.groupBy(col("fp")).count().filter(col("count") >= 2)
    assert(shared.count() >= 1, "cross-batch passage must share a fingerprint")
  }

  test("foreachBatch maintains the persisted postings AND IVF layouts via appendIndex") {
    // the daily-ingest shape end-to-end through Structured Streaming:
    // each micro-batch APPENDS into the persisted index layouts
    // (bootstrap on the first batch — the Layout marker protocol),
    // and the streamed index must equal the whole-corpus rebuild.
    // Delivery note: the checkpoint makes each file enter exactly one
    // micro-batch, but foreachBatch itself is AT-LEAST-ONCE — a crash
    // after the append and before the checkpoint commit replays the
    // batch. The appendIndexBatch forms close that window: each append
    // is a batchId-keyed transaction (Layout.idempotentAppend), so the
    // replay is a no-op — pinned by the crash-replay test below; this
    // test certifies the clean-run composition.
    val s = spark
    import s.implicits._
    import graft.operators.{Ivf, Postings}
    val in = Files.createTempDirectory("graft_fb2_in_").toString
    val ckpt = Files.createTempDirectory("graft_fb2_ckpt_").toString
    val pIdx = Files.createTempDirectory("graft_fb2_post_").toString
    val vIdx = Files.createTempDirectory("graft_fb2_ivf_").toString

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val centroids = Ivf.trainCentroids(emb.filter(col("vec_id") < 200),
      k = 4, iters = 2)
    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in, "doc_id BIGINT, text STRING"), ckpt) {
      (batch, bid) =>
        Postings.appendIndexBatch(Postings.build(batch, "doc_id", "text"),
          pIdx, bid, nBuckets = 16)
        // embeddings keyed off the arriving doc ids — the media/vector
        // half of the same arrival
        val ids = batch.select(col("doc_id")).collect().map(_.getLong(0))
        Ivf.appendIndexBatch(emb.filter(col("vec_id").isin(ids.map(Long.box): _*)),
          vIdx, bid, centroids)
    }

    val batch1 = Seq(1L -> "the quick brown fox", 2L -> "lazy dog sleeps")
    val batch2 = Seq(3L -> "quick brown dog", 4L -> "the quick brown cat")
    writeDocs(batch1); ingest()   // bootstrap: marker stamped, batch appended
    writeDocs(batch2); ingest()   // incremental: only the new file
    // postings: streamed layout == whole-corpus rebuild, via the probe
    val pAll = Files.createTempDirectory("graft_fb2_post_all_").toString
    Postings.writeIndex(Postings.build(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text"), pAll, 16)
    def probe(dir: String) = Postings
      .phraseOccurrencesFromIndex(spark, dir, Seq("quick", "brown"), 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probe(pIdx) == probe(pAll) && probe(pIdx).nonEmpty)
    // IVF: streamed lists == pinned-centroid rebuild over the same ids
    val vAll = Files.createTempDirectory("graft_fb2_ivf_all_").toString
    Ivf.writeIndexWithCentroids(
      emb.filter(col("vec_id").between(1, 4)), vAll, centroids)
    def rows(dir: String) = spark.read.parquet(dir)
      .select(col("neighbor_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(vIdx) == rows(vAll) && rows(vIdx).size == 4)
  }

  test("batch-keyed appends are idempotent: replays and crash windows yield the clean layout") {
    // foreachBatch is at-least-once — a crash between the sink write
    // and the checkpoint commit re-delivers the batch. The
    // appendIndexBatch transaction (stage → prefix-publish → ledger,
    // Layout.idempotentAppend) must make every re-delivery a no-op and
    // every mid-append crash redo-safe. Each crash window the protocol
    // claims to close is reconstructed on disk here and replayed.
    val s = spark
    import s.implicits._
    import org.apache.hadoop.fs.Path
    import graft.operators.{Layout, Pq, Postings}
    val pIdx = Files.createTempDirectory("graft_idem_post_").toString + "/idx"
    val fs = new Path(pIdx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def post(rows: Seq[(Long, String)]) =
      Postings.build(rows.toDF("doc_id", "text"), "doc_id", "text")
    val b0 = Seq(1L -> "to be or not to be", 2L -> "be not afraid")
    val b1 = Seq(3L -> "not to be trusted")
    assert(Postings.appendIndexBatch(post(b0), pIdx, 0L, nBuckets = 8))
    assert(Postings.appendIndexBatch(post(b1), pIdx, 1L, nBuckets = 8))
    def snap() = spark.read.parquet(pIdx)
      .select(col("term"), col("doc_id"), col("pos"), col("tb"))
      .collect().map(_.toString).sorted.toSeq
    val clean = snap()

    // window 1: crash AFTER the whole append, BEFORE the checkpoint
    // commit — the stream replays batch 1 verbatim → ledger hit, no-op
    assert(!Postings.appendIndexBatch(post(b1), pIdx, 1L, nBuckets = 8))
    assert(snap() == clean, "replayed batch must be a no-op")

    // window 2: crash between publish and ledger — on disk: batch 1's
    // files published, staging still present, NO ledger entry. The
    // replay must sweep the published b1- files and redo, not stack a
    // second copy.
    assert(fs.delete(new Path(pIdx, "_graft_batches/1"), false))
    fs.mkdirs(new Path(pIdx, "_graft_staging/1"))
    assert(Postings.appendIndexBatch(post(b1), pIdx, 1L, nBuckets = 8))
    assert(snap() == clean, "redone publish must equal the clean layout")

    // window 3: crash during the staging write — staging holds partial
    // garbage, nothing published. The replay drops staging and redoes.
    val stg2 = new Path(pIdx, "_graft_staging/2")
    fs.mkdirs(new Path(stg2, "tb=0"))
    fs.create(new Path(stg2, "tb=0/part-garbage.parquet"), true).close()
    val b2 = Seq(4L -> "to be")
    assert(Postings.appendIndexBatch(post(b2), pIdx, 2L, nBuckets = 8))
    assert(!fs.exists(stg2), "staging must be cleared after commit")

    // the final streamed layout == the whole-corpus rebuild, through
    // the pruned probe surface
    val pAll = Files.createTempDirectory("graft_idem_all_").toString + "/idx"
    Postings.writeIndex(post(b0 ++ b1 ++ b2), pAll, nBuckets = 8)
    def probe(dir: String) = Postings
      .phraseOccurrencesFromIndex(spark, dir, Seq("to", "be"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probe(pIdx) == probe(pAll) && probe(pIdx).nonEmpty)
    assert(Layout.batchApplied(spark, pIdx, 2L) &&
      !Layout.batchApplied(spark, pIdx, 3L))

    // the FLAT codes layout publishes at the layout root (no partition
    // dirs) — pin the same replay no-op on that rename shape
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 64)
    val cbs = Pq.trainCodebooks(e, dim = 64, m = 8, k = 16, iters = 2)
    val cIdx = Files.createTempDirectory("graft_idem_pq_").toString + "/idx"
    assert(Pq.appendIndexBatch(e, cIdx, 0L, cbs))
    val once = spark.read.parquet(cIdx).count()
    assert(!Pq.appendIndexBatch(e, cIdx, 0L, cbs))
    assert(spark.read.parquet(cIdx).count() == once,
      "flat-layout replay must not duplicate codes")
  }

  test("foreachBatch maintains a clustered layout: append through pinned bounds, compact to the grid") {
    // the daily-ingest story for CLUSTERED tables, end-to-end through
    // Structured Streaming: the layout is bootstrapped by a static
    // clustered write (the quantization comes from that write's stats
    // pass — unlike the index families there is no caller-side
    // parameter set), each micro-batch lands through the PINNED bounds
    // as a batchId-keyed idempotent transaction, a replay is a no-op,
    // and a compaction folds the tail into the main grid while keeping
    // the ledger (a post-compact replay must stay a no-op).
    val s = spark
    import s.implicits._
    import graft.operators.Zorder
    val in = Files.createTempDirectory("graft_zs_in_").toString
    val ckpt = Files.createTempDirectory("graft_zs_ckpt_").toString
    val dir = Files.createTempDirectory("graft_zs_lay_").toString + "/events"

    // the resident corpus PROJECTED to the streamed schema — appends
    // are schema-checked against the layout (a narrower batch would
    // corrupt every future read), so the bootstrap must carry exactly
    // the columns the stream delivers
    val e = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    // bootstrap: the resident corpus, clustered — stats over it pin
    // the quantization every streamed batch will bucket through
    Zorder.writeHilbert(e.filter(col("event_id") % 3 === 0), dir,
      Seq("user_id", "value"), bits = 16, numFiles = 4)

    def writeBatch(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("event_id", "user_id", "value")
        .coalesce(1).write.mode("append").parquet(in)
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in,
        "event_id BIGINT, user_id BIGINT, value DOUBLE"), ckpt) {
      (batch, bid) =>
        Zorder.appendClustered(batch, dir, bid, batchFiles = 2)
        ()
    }

    val b1 = Seq((1000001L, 3L, 50.0), (1000002L, 7L, 80.0))
    val b2 = Seq((1000003L, 11L, 20.0), (1000004L, 2L, 300.0))
    writeBatch(b1); ingest()
    writeBatch(b2); ingest()
    val base = e.filter(col("event_id") % 3 === 0)
      .select(col("event_id"), col("user_id"), col("value")).count()
    def ids() = spark.read.parquet(dir).select(col("event_id"))
      .filter(col("event_id") >= 1000000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(spark.read.parquet(dir).count() == base + 4)
    assert(ids() == Seq(1000001L, 1000002L, 1000003L, 1000004L))
    // crash-replay: re-deliver batch 1 directly — ledger hit, no-op
    assert(!Zorder.appendClustered(
      b2.toDF("event_id", "user_id", "value"), dir, batchId = 1))
    assert(spark.read.parquet(dir).count() == base + 4,
      "replayed micro-batch must not duplicate rows")
    // compact: tail folds into the 4-file grid, rows intact, and a
    // replayed pre-compact batch is STILL a no-op (ledger survives)
    Zorder.compactClustered(spark, dir)
    assert(spark.read.parquet(dir).count() == base + 4)
    assert(!Zorder.appendClustered(
      b2.toDF("event_id", "user_id", "value"), dir, batchId = 1),
      "post-compact replay must stay a no-op")
    val files = spark.read.parquet(dir)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(files == 4, s"compaction must restore the 4-file grid, got $files")
  }

  test("tailCompactDue drives the fold from inside the stream — no human in the loop") {
    // the trigger POLICY (round-14 verdict #7): compactTail is caller-
    // invoked, so streaming ingest needs a measured rule for WHEN to
    // fold. tailCompactDue answers from one root listing — tail file
    // count (read amplification: every batch file overlaps the grid)
    // or tail byte fraction (write amortization). This drives a real
    // foreachBatch loop where the POLICY decides, and asserts the fold
    // fired, the layout ends disjoint (the q178 structural contract),
    // rows stay exact, and the steady state reports not-due.
    val s = spark
    import s.implicits._
    import graft.operators.Zorder
    val in = Files.createTempDirectory("graft_zp_in_").toString
    val ckpt = Files.createTempDirectory("graft_zp_ckpt_").toString
    val dir = Files.createTempDirectory("graft_zp_lay_").toString + "/events"
    val e = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    Zorder.writeHilbert(e.filter(col("event_id") % 3 === 0), dir,
      Seq("user_id", "value"), bits = 16, numFiles = 4)
    assert(!Zorder.tailCompactDue(spark, dir),
      "a freshly-bootstrapped layout has no tail — not due")
    var folds = 0
    def writeBatch(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("event_id", "user_id", "value")
        .coalesce(1).write.mode("append").parquet(in)
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in,
        "event_id BIGINT, user_id BIGINT, value DOUBLE"), ckpt) {
      (batch, bid) =>
        Zorder.appendClustered(batch, dir, bid, batchFiles = 2)
        // the FILE trigger at 3: each micro-batch lands <= 2 files, so
        // the policy stays quiet after batch 1 and fires on batch 2
        // (byte fraction set past reach — this test pins the count arm)
        if (Zorder.tailCompactDue(spark, dir, maxTailFiles = 3,
            maxTailFraction = 1.0)) {
          assert(Zorder.compactTail(spark, dir), "due implies a tail to fold")
          folds += 1
        }
        ()
    }
    writeBatch(Seq((2000001L, 3L, 50.0), (2000002L, 7L, 80.0)))
    ingest()
    assert(folds == 0, "one 2-file batch is under the 3-file trigger")
    writeBatch(Seq((2000003L, 11L, 20.0), (2000004L, 2L, 300.0)))
    ingest()
    assert(folds == 1, "the second batch crosses the file trigger")
    assert(!Zorder.tailCompactDue(spark, dir),
      "steady state right after a fold: no tail, not due")
    // the BYTE-FRACTION arm: any tail is >= a tiny fraction of total
    writeBatch(Seq((2000005L, 5L, 10.0)))
    ingest()
    assert(Zorder.tailCompactDue(spark, dir, maxTailFiles = 1000,
      maxTailFraction = 1e-9), "fraction arm must fire on any tail")
    assert(Zorder.compactTail(spark, dir))
    // end state: rows exact, structurally clustered (disjoint z-ranges)
    val base = e.filter(col("event_id") % 3 === 0).count()
    assert(spark.read.parquet(dir).count() == base + 5)
    val cl = Zorder.clusteringOf(spark, dir).get
    val ranges = Zorder.curveValues(spark.read.parquet(dir), cl, "__z")
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        col("__z"))
      .groupBy(col("f")).agg(min(col("__z")).as("lo"), max(col("__z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(ranges.zip(ranges.drop(1)).forall { case ((_, hi), (lo2, _)) =>
      hi <= lo2 }, s"policy-driven folds must keep the layout clustered: " +
      ranges.mkString(","))
  }

  test("foreachBatch applies a CDC stream through mergeClustered; re-applying a batch is a no-op") {
    // the serving loop a warehouse table runs: a change feed arrives
    // as files, each micro-batch is ONE keyed merge (update/delete/
    // insert), later batches win on the same key, and merge's
    // replace-by-key semantics make a replayed batch a natural no-op —
    // the at-least-once property foreachBatch needs, with no ledger.
    // Clustering is (user_id, event_id): the key is a clustering
    // column, so key-addressing is immutable by construction, and
    // updates touch only the non-clustered value column.
    val s = spark
    import s.implicits._
    import graft.operators.Zorder
    val in = Files.createTempDirectory("graft_cdc_in_").toString
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt_").toString
    val dir = Files.createTempDirectory("graft_cdc_lay_").toString + "/t"
    val e = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("event_id") % 3 === 0)
    Zorder.writeHilbert(e, dir, Seq("user_id", "event_id"), bits = 16,
      numFiles = 4)
    val base = e.count()
    // two resident keys with their true clustering values
    val Array(r1, r2) = e.orderBy(col("event_id")).limit(2).collect()
    val (k1, u1) = (r1.getLong(0), r1.getLong(1))
    val (k2, u2) = (r2.getLong(0), r2.getLong(1))
    def writeBatch(rows: Seq[(Long, Long, Double, String)]): Unit =
      rows.toDF("event_id", "user_id", "value", "op")
        .coalesce(1).write.mode("append").parquet(in)
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in,
        "event_id BIGINT, user_id BIGINT, value DOUBLE, op STRING"),
      ckpt) { (batch, _) =>
      Zorder.mergeClustered(spark, dir,
        batch.withColumn("__del", col("op") === "D").drop("op"),
        Seq("event_id"), deleteCol = Some("__del"))
      ()
    }
    // batch 1: update k1, delete k2, insert a fresh key
    writeBatch(Seq((k1, u1, 111.0, "U"), (k2, u2, 0.0, "D"),
      (9000001L, 3L, 5.0, "I")))
    ingest()
    val t1 = Zorder.readClustered(spark, dir)
    assert(t1.count() == base) // +1 insert, -1 delete
    assert(t1.filter(col("event_id") === k1).select(col("value"))
      .collect()(0).getDouble(0) == 111.0)
    assert(t1.filter(col("event_id") === k2).count() == 0)
    // batch 2: later batch wins on k1; the batch-1 insert is deleted
    writeBatch(Seq((k1, u1, 222.0, "U"), (9000001L, 3L, 0.0, "D"),
      (9000002L, 4L, 6.0, "I")))
    ingest()
    val t2 = Zorder.readClustered(spark, dir)
    assert(t2.count() == base)
    assert(t2.filter(col("event_id") === k1).select(col("value"))
      .collect()(0).getDouble(0) == 222.0)
    assert(t2.filter(col("event_id") === 9000001L).count() == 0)
    assert(t2.filter(col("event_id") === 9000002L).count() == 1)
    // at-least-once: re-applying batch 2 directly changes NOTHING —
    // replace-by-key is idempotent (update re-replaces, delete of a
    // gone key no-ops, insert of a present key replaces)
    val fp1 = t2.agg(count(lit(1)),
      sum(xxhash64(t2.columns.map(col): _*).cast("decimal(38,0)")))
      .collect()(0)
    Zorder.mergeClustered(spark, dir,
      Seq((k1, u1, 222.0, "U"), (9000001L, 3L, 0.0, "D"),
        (9000002L, 4L, 6.0, "I"))
        .toDF("event_id", "user_id", "value", "op")
        .withColumn("__del", col("op") === "D").drop("op"),
      Seq("event_id"), deleteCol = Some("__del"))
    val t3 = Zorder.readClustered(spark, dir)
    val fp2 = t3.agg(count(lit(1)),
      sum(xxhash64(t3.columns.map(col): _*).cast("decimal(38,0)")))
      .collect()(0)
    assert(fp1 == fp2, "a replayed CDC batch must be a no-op")
  }

  test("foreachBatch applies a CDC stream through mergeOnRead; debt triggers materialize inside the loop") {
    // the merge-on-read serving loop: each micro-batch is ONE
    // tombstone+insert commit (no file rewritten on the ingest path),
    // foreachBatch's batchId keys the exactly-once ledger (a replayed
    // batch returns 0 and touches nothing — key-tombstones are NOT
    // state-idempotent, so the sentinel protocol, not replay-redo, is
    // what makes at-least-once safe here), and the two debt policies
    // drive the folds with no human in the loop: tailCompactDue
    // bounds the standing insert tail, dvCompactDue bounds the
    // tombstone fraction every read anti-joins over.
    val s = spark
    import s.implicits._
    import graft.operators.Zorder
    val in = Files.createTempDirectory("graft_morcdc_in_").toString
    val ckpt = Files.createTempDirectory("graft_morcdc_ckpt_").toString
    val dir = Files.createTempDirectory("graft_morcdc_lay_").toString + "/t"
    val e = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("event_id") % 3 === 0)
    Zorder.writeHilbert(e, dir, Seq("user_id", "event_id"), bits = 16,
      numFiles = 4)
    val base = e.count()
    val Array(r1, r2) = e.orderBy(col("event_id")).limit(2).collect()
    val (k1, u1) = (r1.getLong(0), r1.getLong(1))
    val (k2, u2) = (r2.getLong(0), r2.getLong(1))
    def writeBatch(rows: Seq[(Long, Long, Double, String)]): Unit =
      rows.toDF("event_id", "user_id", "value", "op")
        .coalesce(1).write.mode("append").parquet(in)
    var lastBatch = -1L
    def ingest(): Unit = Streams.runForeachBatch(
      Streams.fileArrival(spark, in,
        "event_id BIGINT, user_id BIGINT, value DOUBLE, op STRING"),
      ckpt) { (batch, bid) =>
      lastBatch = bid
      Zorder.mergeOnRead(spark, dir,
        batch.withColumn("__del", col("op") === "D").drop("op"),
        Seq("event_id"), batchId = bid, deleteCol = Some("__del"))
      // the maintenance half of the loop: both debts self-bound
      if (Zorder.tailCompactDue(spark, dir, maxTailFiles = 64))
        Zorder.compactTail(spark, dir)
      if (Zorder.dvCompactDue(spark, dir, maxDebt = 0.2))
        Zorder.compactClustered(spark, dir)
      ()
    }
    // batch: update k1, delete k2, insert a fresh key
    writeBatch(Seq((k1, u1, 111.0, "U"), (k2, u2, 0.0, "D"),
      (9000001L, 3L, 5.0, "I")))
    ingest()
    val t1 = Zorder.readClustered(spark, dir)
    assert(t1.count() == base)
    assert(t1.filter(col("event_id") === k1).select(col("value"))
      .collect()(0).getDouble(0) == 111.0)
    assert(t1.filter(col("event_id") === k2).count() == 0)
    // at-least-once: re-running the SAME ledgered batch directly is a
    // pure no-op — 0 tombstones, no epoch burned
    val ep1 = Zorder.currentEpoch(spark, dir).get
    assert(Zorder.mergeOnRead(spark, dir,
      Seq((k1, u1, 111.0, "U"), (k2, u2, 0.0, "D"),
        (9000001L, 3L, 5.0, "I"))
        .toDF("event_id", "user_id", "value", "op")
        .withColumn("__del", col("op") === "D").drop("op"),
      Seq("event_id"), batchId = lastBatch,
      deleteCol = Some("__del")) == 0L)
    assert(Zorder.currentEpoch(spark, dir).get == ep1)
    // debt-triggered materialization: a delete-heavy batch pushes
    // dvDebt past the loop's threshold, the IN-LOOP compact clears it
    val heavy = e.filter(col("event_id") % 9 === 0 &&
        col("event_id") =!= k1 && col("event_id") =!= k2)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("op", lit("D")).as[(Long, Long, Double, String)]
      .collect().toSeq
    val expect2 = base - heavy.size
    writeBatch(heavy)
    ingest()
    assert(Zorder.dvDebt(spark, dir) == 0.0,
      "the delete-heavy batch must trip the in-loop materialize, " +
        "which clears the debt entirely")
    assert(Zorder.readClustered(spark, dir).count() == expect2,
      "debt materialization must not change a visible row")
  }
}
