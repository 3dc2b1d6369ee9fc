package graft

import org.apache.spark.sql.functions._
import graft.operators.Postings

/** Positional inverted index + phrase search (q141). */
class PostingsSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "brown fox and the quick brown fox"),
      (3L, "quick brown quick brown quick"),
      (4L, "Fox  THE quick") // normalization: case + runs of spaces
    ).toDF("doc_id", "text")
  }

  test("build emits 0-based normalized positions") {
    val idx = Postings.build(docs, "doc_id", "text")
    val d4 = idx.filter(col("doc_id") === 4L)
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(d4.toSeq == Seq((0, "fox"), (1, "the"), (2, "quick")))
  }

  test("phraseOccurrences counts overlapping occurrences per doc") {
    val idx = Postings.build(docs, "doc_id", "text")
    val got = Postings.phraseOccurrences(idx, Seq("quick", "brown", "fox"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L), s"got $got")
    // overlapping repeats: "quick brown" twice in doc 3
    val qb = Postings.phraseOccurrences(idx, Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qb == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), s"got $qb")
    // a repeated-token phrase joins the same posting list twice
    val qq = Postings.phraseOccurrences(idx, Seq("quick", "brown", "quick"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qq == Map(3L -> 2L), s"got $qq")
    // absent phrase → empty, not an error
    assert(Postings.phraseOccurrences(idx, Seq("missing", "phrase")).count() == 0)
  }

  test("persisted index: partition-pruned probe, disk == memory results") {
    val dir = java.nio.file.Files.createTempDirectory("postings_idx").toString
    val idx = Postings.build(docs, "doc_id", "text")
    Postings.writeIndex(idx, dir, nBuckets = 16)

    // layout: tb=<bucket> directories, at most 16
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(onDisk.nonEmpty && onDisk.forall(_.startsWith("tb=")))

    val phrase = Seq("quick", "brown", "fox")
    val res = Postings.phraseOccurrencesFromIndex(spark, dir, phrase, nBuckets = 16)

    // 1) plan: the bucket predicate lands in PartitionFilters
    //    (directory pruning at listing time), the term IN-list in the
    //    pushed data filters
    val plan = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tb[^\\]]* IN ".r.findFirstIn(plan).isDefined,
      s"bucket predicate did not reach PartitionFilters:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term IN-list did not push into the bucket scans:\n$plan")

    // 2) behavior: the probe touches exactly the phrase terms' buckets
    val expected = {
      val s = spark
      import s.implicits._
      phrase.toDF("term")
        .select(pmod(xxhash64(col("term")), lit(16L)).cast("int"))
        .distinct().collect().map(r => s"tb=${r.getInt(0)}").toSet
    }
    val touched = spark.read.parquet(dir)
      .filter(col("tb").isin(expected.map(_.stripPrefix("tb=").toInt)
        .map(Int.box).toSeq: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0).split("/").init.last).toSet
    assert(touched == expected, s"scan touched $touched, expected $expected")

    // 3) result: identical to the in-memory path
    val mem = Postings.phraseOccurrences(idx, phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dsk = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dsk == mem && mem.nonEmpty, s"disk $dsk vs mem $mem")
  }

  test("appendIndex: incremental batch append == whole-corpus rebuild") {
    val s = spark
    import s.implicits._
    val batch1 = docs.filter(col("doc_id") <= 2)
    val batch2 = docs.filter(col("doc_id") >= 3)
    val dirInc = java.nio.file.Files.createTempDirectory("postings_inc").toString
    val dirAll = java.nio.file.Files.createTempDirectory("postings_all").toString
    // day 1 writes, day 2 appends — postings are pure facts, so the
    // incremental layout must equal the rebuild exactly
    Postings.writeIndex(Postings.build(batch1, "doc_id", "text"), dirInc, 16)
    Postings.appendIndex(Postings.build(batch2, "doc_id", "text"), dirInc, 16)
    Postings.writeIndex(Postings.build(docs, "doc_id", "text"), dirAll, 16)
    def probe(dir: String, phrase: Seq[String]) =
      Postings.phraseOccurrencesFromIndex(spark, dir, phrase, 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a phrase present in BOTH batches: the probe must see old and
    // new docs alike through the appended layout
    for (phrase <- Seq(Seq("quick", "brown"), Seq("the", "quick"))) {
      val inc = probe(dirInc, phrase)
      assert(inc == probe(dirAll, phrase) && inc.nonEmpty,
        s"append != rebuild for $phrase: $inc")
    }
    // raw row parity too, not just probe results
    assert(spark.read.parquet(dirInc).count() ==
      spark.read.parquet(dirAll).count())
    // bucket-function mismatch fails FAST on both append and probe —
    // a silent mismatch would scatter new postings into directories
    // the pruned probe never reads
    val e1 = intercept[IllegalArgumentException](
      Postings.appendIndex(Postings.build(batch2, "doc_id", "text"), dirInc, 64))
    assert(e1.getMessage.contains("does not match the existing layout"))
    val e2 = intercept[IllegalArgumentException](
      Postings.phraseOccurrencesFromIndex(spark, dirInc, Seq("quick"), 64))
    assert(e2.getMessage.contains("does not match the existing layout"))
  }

  test("appendIndex bootstrapping a FRESH layout stamps the marker") {
    // an index whose first batch arrives via appendIndex (no prior
    // writeIndex) must carry the same nBuckets guard as an
    // overwrite-created one — without the bootstrap stamp a later
    // mismatched append/probe would silently scatter/drop postings
    val dir = java.nio.file.Files.createTempDirectory("postings_boot").toString
    Postings.appendIndex(Postings.build(docs.filter(col("doc_id") <= 2),
      "doc_id", "text"), dir, 16)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_graft_nbuckets")), "marker not stamped")
    val e = intercept[IllegalArgumentException](
      Postings.appendIndex(Postings.build(docs.filter(col("doc_id") >= 3),
        "doc_id", "text"), dir, 64))
    assert(e.getMessage.contains("does not match the existing layout"))
    // matching append still works and the guard rides along
    Postings.appendIndex(Postings.build(docs.filter(col("doc_id") >= 3),
      "doc_id", "text"), dir, 16)
    val res = Postings.phraseOccurrencesFromIndex(spark, dir,
      Seq("quick", "brown"), 16).collect()
    assert(res.nonEmpty)
  }

  test("crash windows: unmarked data refused, dead marker over empty path re-stamped") {
    // (1) populated-but-MARKERLESS layout — what a crashed writeIndex
    // rebuild leaves (overwrite clears the whole path, marker included,
    // before the data re-lands; the re-stamp never ran): the bootstrap
    // append and the probe must both REFUSE rather than certify rows
    // whose bucket function is unknown
    val dir = java.nio.file.Files.createTempDirectory("postings_crash").toString
    Postings.writeIndex(Postings.build(docs, "doc_id", "text"), dir, 16)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_graft_nbuckets"))
    val e1 = intercept[IllegalArgumentException](
      Postings.appendIndex(Postings.build(docs, "doc_id", "text"), dir, 64))
    assert(e1.getMessage.contains("no _graft_nbuckets marker"))
    val e2 = intercept[IllegalArgumentException](
      Postings.phraseOccurrencesFromIndex(spark, dir, Seq("quick"), 16))
    assert(e2.getMessage.contains("no _graft_nbuckets marker"))
    // (2) marker over an EMPTY path — a bootstrap whose first batch
    // never landed: the dead marker guards zero rows, so a retry with
    // a CORRECTED config must re-stamp and succeed, not be poisoned
    val dir2 = java.nio.file.Files.createTempDirectory("postings_dead").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir2, "_graft_nbuckets"), "16".getBytes("UTF-8"))
    Postings.appendIndex(Postings.build(docs, "doc_id", "text"), dir2, 64)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir2, "_graft_nbuckets")), "UTF-8").trim == "64")
    assert(Postings.phraseOccurrencesFromIndex(spark, dir2,
      Seq("quick", "brown"), 64).collect().nonEmpty)
  }

  test("topNgram derives the most frequent n-gram with desc/asc tiebreak") {
    // "quick brown" 4× (doc 3 twice) beats "brown fox" 3×
    assert(Postings.topNgram(docs, "text", n = 2) == Seq("quick", "brown"))
    // tie between "a b" (2×) and "b a" (2×): text-ascending wins
    val s = spark
    import s.implicits._
    val tie = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    assert(Postings.topNgram(tie, "text", n = 2) == Seq("a", "b"))
  }
}
