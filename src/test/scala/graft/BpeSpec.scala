package graft

import graft.operators.Bpe
import graft.sources.Tables

/** Grades BPE vocabulary induction on the Sennrich et al. (2016)
  * worked example — the merge sequence is hand-computable, so the
  * spec pins pair counting (within-word multiplicity, frequency
  * weighting), the greedy left-to-right merge rule, and the
  * deterministic (count desc, l, r) tie-break across several
  * iterations. The FIRST pair-count table is also oracle-checked
  * end-to-end in DuckDB (q106). */
class BpeSpec extends SparkSpec {

  test("learnMerges reproduces the classic low/lower/newest/widest sequence") {
    val s = spark
    import s.implicits._
    // corpus frequencies: low 5, lower 2, newest 6, widest 3
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", k = 5)
    // hand-computed: e+s / es+t / est+</w> all tie at 9 and resolve in
    // (l, r) order across successive rounds; then l+o and lo+w at 7
    assert(merges == Seq(
      ("e", "s", 9L),
      ("es", "t", 9L),
      ("est", Bpe.EndOfWord, 9L),
      ("l", "o", 7L),
      ("lo", "w", 7L)), s"got $merges")
  }

  test("durable persistPath training matches the localCheckpoint form") {
    val s = spark
    import s.implicits._
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe-train").toString
    val (durable, seg) = Bpe.train(docs, "text", k = 5, Some(dir))
    assert(durable == Bpe.train(docs, "text", k = 5)._1)
    // the audit trail covers EVERY step including the final trained
    // vocabulary — seg5 on disk must match the returned frame
    (0 to 5).foreach { i =>
      assert(new java.io.File(s"$dir/seg$i").exists(), s"missing seg$i")
    }
    assert(seg.count() == 4L)
    val onDisk = spark.read.parquet(s"$dir/seg5")
      .select("w", "syms").collect().map(r =>
        r.getString(0) -> r.getSeq[String](1)).toMap
    val returned = seg.select("w", "syms").collect().map(r =>
      r.getString(0) -> r.getSeq[String](1)).toMap
    assert(onDisk == returned)
  }

  test("hybrid driver-side loop matches the distributed loop at k=8 on the real corpus") {
    // the production-merge-count path (driver-side delta-maintained
    // counts + lazy-deletion argmax heap) must reproduce the
    // distributed loop's merge sequence AND final segmentation exactly
    // — including the (cnt desc, l, r) tie-break, which driver-side
    // compares as UTF-8 bytes to match Spark's StringType ordering
    val docs = Tables.load(spark, sfDir, "documents")
    val (driverMerges, driverSeg) = Bpe.train(docs, "text", k = 8)
    val (distMerges, distSeg) =
      Bpe.train(docs, "text", k = 8, driverMaxWords = 0L)
    assert(driverMerges == distMerges,
      s"driver $driverMerges vs distributed $distMerges")
    def segMap(df: org.apache.spark.sql.DataFrame) =
      df.select("w", "f", "syms").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(segMap(driverSeg) == segMap(distSeg))
  }

  test("disk-loaded vocab equals the freshly-trained vocab (train once, apply many)") {
    val s = spark
    import s.implicits._
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val (_, fresh) = Bpe.train(docs, "text", k = 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe-vocab").toString
    Bpe.saveVocab(fresh, dir)
    val loaded = Bpe.loadVocab(spark, dir)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("w", "f", "syms").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(m(loaded) == m(fresh))
    // and the loaded vocab tokenizes identically
    val doc = Seq((42L, "low lower newest widest")).toDF("doc_id", "text")
    val a = Bpe.tokenCounts(doc, "doc_id", "text", loaded).head()
    val b = Bpe.tokenCounts(doc, "doc_id", "text", fresh).head()
    assert(a == b)
  }

  test("two-batch merged word counts retrain the whole-corpus vocabulary exactly") {
    // the incremental contract: word counts are the training run's only
    // corpus-derived state and merge associatively, so a stream
    // maintaining the (w, f) table retrains from model-sized state
    val docs = Tables.load(spark, sfDir, "documents")
    val h1 = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val h2 = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val mergedWf = graft.operators.NgramLm.mergeCounts(
      Bpe.wordFreq(h1, "text"), Bpe.wordFreq(h2, "text"))
    val (mMerges, mSeg) = Bpe.trainFromWordFreq(mergedWf, k = 5)
    val (wMerges, wSeg) = Bpe.train(docs, "text", k = 5)
    assert(mMerges == wMerges)
    def segMap(df: org.apache.spark.sql.DataFrame) =
      df.select("w", "f", "syms").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(segMap(mSeg) == segMap(wSeg))
  }

  test("pair counts weight by word frequency and count within-word multiplicity") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaa aaa"), (2L, "aaa ab")).toDF("doc_id", "text")
    // wordFreq: aaa -> 3, ab -> 1; "aaa" contributes (a,a) TWICE per
    // occurrence and (a,</w>) once; "ab" contributes (a,b), (b,</w>)
    val got = Bpe.pairCounts(Bpe.segment(Bpe.wordFreq(docs, "text")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "a")) == 6L, s"got $got")
    assert(got(("a", Bpe.EndOfWord)) == 3L, s"got $got")
    assert(got(("a", "b")) == 1L, s"got $got")
    assert(got(("b", Bpe.EndOfWord)) == 1L, s"got $got")
  }

  test("applyMerge is greedy left-to-right, non-cascading") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val seg = Bpe.applyMerge(Bpe.segment(Bpe.wordFreq(docs, "text")), "a", "a")
    val syms = seg.select("syms").head().getSeq[String](0)
    // a a a a </w> under (a,a): first two merge, merged "aa" does not
    // re-combine with the next raw "a", which pairs with the fourth
    assert(syms == Seq("aa", "aa", Bpe.EndOfWord), s"got $syms")
    // a second application over three a's: "aaa" -> [aa, a]
    val docs3 = Seq((1L, "aaa")).toDF("doc_id", "text")
    val seg3 = Bpe.applyMerge(Bpe.segment(Bpe.wordFreq(docs3, "text")), "a", "a")
    val syms3 = seg3.select("syms").head().getSeq[String](0)
    assert(syms3 == Seq("aa", "a", Bpe.EndOfWord), s"got $syms3")
  }

  test("tokenCounts prices docs under the trained vocab (hand-computed)") {
    val s = spark
    import s.implicits._
    val train = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val (_, vocabSeg) = Bpe.train(train, "text", k = 5)
    // after (e,s)(es,t)(est,</w>)(l,o)(lo,w): low → [low,</w>] = 2,
    // lower → [low,e,r,</w>] = 4, newest → [n,e,w,est</w>] = 4,
    // widest → [w,i,d,est</w>] = 4
    val doc = Seq((42L, "low lower newest widest")).toDF("doc_id", "text")
    val row = Bpe.tokenCounts(doc, "doc_id", "text", vocabSeg).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((42L, 4L, 14L)),
      s"got $row")
    // and the emitted token stream itself: subword order within words,
    // word order within the document, </w> boundaries where expected
    val enc = Bpe.encode(doc, "doc_id", "text", vocabSeg).head()
    assert(enc.getString(1) ==
      "low </w> low e r </w> n e w est</w> w i d est</w>", s"got $enc")
    assert(enc.getLong(2) == 14L)
  }

  test("segmentation always reconstructs word+</w> on the real corpus") {
    // the conservation law of BPE: merging only ever concatenates
    // adjacent symbols, so at EVERY step the symbol concatenation must
    // equal the original word plus the end marker — a fold bug (lost,
    // duplicated, or reordered symbol) breaks it immediately, and the
    // real corpus exercises punctuation/digit characters the toy
    // corpora don't
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val (_, seg) = Bpe.train(docs, "text", k = 5)
    // ONE action: assert clues evaluate eagerly, so a count-then-take
    // pair would run the lazy final-merge lineage twice per test run
    val bad = seg.filter(
      concat_ws("", col("syms")) =!= concat(col("w"), lit(Bpe.EndOfWord)))
      .take(3)
    assert(bad.isEmpty, s"non-reconstructing rows: ${bad.mkString("; ")}")
  }

  test("byteSegment renders UTF-8 bytes as fixed-width uppercase hex pairs") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab é")).toDF("doc_id", "text")
    val seg = Bpe.byteSegment(Bpe.wordFreq(docs, "text"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toSeq).toMap
    // the marker is hexed too ("</w>" → 3C2F773E) so EVERY byte-level
    // symbol is a hex string and symbol order == underlying byte order
    assert(Bpe.ByteEndOfWord == "3C2F773E")
    assert(seg("ab") == Seq("61", "62", Bpe.ByteEndOfWord))
    // 'é' is two UTF-8 bytes (C3 A9) — one base symbol each
    assert(seg("é") == Seq("C3", "A9", Bpe.ByteEndOfWord))
  }

  test("byte-level training is isomorphic to char-level on an ASCII corpus") {
    val s = spark
    import s.implicits._
    // fixed-width hex of a byte string compares exactly like the bytes
    // themselves, and the end-of-word marker is hexed too — so the
    // mapping symbol → hex(utf8(symbol)) is order- AND
    // concatenation-faithful over ALL symbols, making the merge
    // SEQUENCE (argmax + tie-breaks) of byte training the exact hex
    // image of char training's, count for count, on any
    // single-byte-per-char corpus
    val docs = Seq((1L, "low low low lower lower newest newest widest"))
      .toDF("doc_id", "text")
    def hexImage(sym: String): String =
      sym.getBytes("UTF-8").map(b => f"$b%02X").mkString
    val charMerges = Bpe.learnMerges(docs, "text", k = 6)
    val byteMerges = Bpe.trainBytes(docs, "text", k = 6)._1
    assert(byteMerges ==
      charMerges.map { case (l, r, c) => (hexImage(l), hexImage(r), c) },
      s"char=$charMerges byte=$byteMerges")

    // the adversarial tie the hexed marker exists for: corpus "xz x"
    // puts (x,z), (x,</w>), (z,</w>) all at count 1; the l-then-r
    // tie-break decides (x,·) on r — char space has '<'(0x3C) < 'z'
    // so (x,</w>) wins, and a LITERAL '</w>' among hex pairs would
    // instead lose to "7A" (hex 'z') because '7' < '<'. With the
    // marker hexed to 3C2F773E the byte argmax is the exact image.
    val tie = Seq((1L, "xz x")).toDF("doc_id", "text")
    val charTie = Bpe.learnMerges(tie, "text", k = 1)
    val byteTie = Bpe.trainBytes(tie, "text", k = 1)._1
    assert(charTie.head._1 == "x" && charTie.head._2 == Bpe.EndOfWord,
      s"char argmax moved: $charTie")
    assert(byteTie ==
      charTie.map { case (l, r, c) => (hexImage(l), hexImage(r), c) },
      s"tie diverged: char=$charTie byte=$byteTie")
  }

  test("applyMerges rank-order replay reproduces the training segmentation; no UNK ever") {
    val docs = Tables.load(spark, sfDir, "documents")
    val (merges, trainedSeg) = Bpe.trainBytes(docs, "text", k = 5)
    // replaying the merge list over a fresh byte segmentation of the
    // SAME word table must land on the trained segmentation exactly
    val replay = Bpe.applyMerges(
      Bpe.byteSegment(Bpe.wordFreq(docs, "text")), merges)
    import org.apache.spark.sql.functions._
    val diff = replay.select(col("w"), col("syms"))
      .join(trainedSeg.select(col("w"), col("syms").as("t")), "w")
      .filter(concat_ws(" ", col("syms")) =!= concat_ws(" ", col("t")))
      .take(3)
    assert(diff.isEmpty, s"replay diverged: ${diff.mkString("; ")}")
    // the no-UNK contract on the q121 foreign corpus: EVERY part word
    // segments (full coverage), and no [UNK] symbol can exist
    val parts = Tables.load(spark, sfDir, "part")
    val pwords = Bpe.wordFreq(parts, "p_name")
    val fseg = Bpe.applyMerges(Bpe.byteSegment(pwords), merges)
    assert(fseg.count() == pwords.count(), "every foreign word must segment")
    assert(fseg.filter(array_contains(col("syms"), "[UNK]")).isEmpty)
    // 'gizmo' — q121's [UNK] case ('z' absent from documents) — byte-
    // segments here
    val s2 = spark
    import s2.implicits._
    val gizmo = Bpe.applyMerges(
      Bpe.byteSegment(Seq(("gizmo", 1L)).toDF("w", "f")), merges)
      .select("syms").head().getSeq[String](0)
    assert(gizmo.nonEmpty && !gizmo.contains("[UNK]"), s"got $gizmo")
  }

  test("fully-merged single-symbol words stop contributing pairs") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    var seg = Bpe.segment(Bpe.wordFreq(docs, "text"))
    seg = Bpe.applyMerge(seg, "a", "b")
    seg = Bpe.applyMerge(seg, "ab", Bpe.EndOfWord)
    val syms = seg.select("syms").head().getSeq[String](0)
    assert(syms == Seq("ab" + Bpe.EndOfWord), s"got $syms")
    assert(Bpe.pairCounts(seg).count() == 0L)
    // and learnMerges stops early instead of looping
    val merges = Bpe.learnMerges(docs, "text", k = 10)
    assert(merges == Seq(("a", "b", 1L), ("ab", Bpe.EndOfWord, 1L)), s"got $merges")
  }
}
