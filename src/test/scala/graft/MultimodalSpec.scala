package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Grades the multimodal plumbing (q40's shape): REAL image decode
  * through javax.imageio (planted PNG/BMP payloads with known pixels),
  * decode schema / row preservation / determinism, frame sampling, and
  * the resize stage. The audio/video codec bodies remain deterministic
  * stubs (no AV libraries in the test environment — see Multimodal
  * scaladoc); for those what is graded is the Spark-side contract a
  * real codec would slot into. */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(spark, Tables.load(spark, sfDir, "documents"))

  /** A real encoded image: left half black, right half white. */
  private def encodedImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("image decode is REAL: planted PNG/BMP pixels drive metadata and histogram") {
    for (fmt <- Seq("png", "bmp")) {
      val rec = Multimodal.MediaRecord(7L, "image", encodedImage(fmt, 12, 8))
      val d = Multimodal.decodeRecord(rec)
      // width/height from the actual pixel grid, not a payload hash
      assert(d.meta == Multimodal.MediaMeta("image", 12, 8, 0, 0L),
        s"$fmt meta: ${d.meta}")
      // half the pixels are black (luma 0 → bin 0), half white
      // (luma 255 → bin 7); the histogram is normalized
      assert(d.features.length == 8)
      assert(math.abs(d.features(0) - 0.5f) < 1e-6 &&
        math.abs(d.features(7) - 0.5f) < 1e-6 &&
        (1 to 6).forall(d.features(_) == 0f), d.features.toSeq.toString)
    }
    // the same pixels through a DIFFERENT container decode identically —
    // features come from the decoded grid, not the encoded bytes
    val viaPng = Multimodal.decodeRecord(
      Multimodal.MediaRecord(1L, "image", encodedImage("png", 30, 20)))
    val viaBmp = Multimodal.decodeRecord(
      Multimodal.MediaRecord(2L, "image", encodedImage("bmp", 30, 20)))
    assert(viaPng.meta == viaBmp.meta)
    assert(viaPng.features.sameElements(viaBmp.features))
  }

  test("image decode in the distributed stage; opaque payloads fall back to the stub") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", encodedImage("png", 16, 16)),
      Multimodal.MediaRecord(2L, "image", "not an image".getBytes("UTF-8")),
      Multimodal.MediaRecord(3L, "audio", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.decode(rows).collect().map(d => d.mediaId -> d).toMap
    assert(out(1L).meta.width == 16 && out(1L).meta.height == 16)
    // opaque "image" payload: the deterministic stub, not a crash
    val stub = Multimodal.fakeDecode(
      Multimodal.MediaRecord(2L, "image", "not an image".getBytes("UTF-8")))
    assert(out(2L).meta == stub.meta &&
      out(2L).features.sameElements(stub.features))
    assert(out(3L).meta.sampleRateHz == 16000)
    // truncated container with a valid magic prefix: still the stub
    val trunc = encodedImage("png", 16, 16).take(20)
    val d = Multimodal.decodeRecord(Multimodal.MediaRecord(4L, "image", trunc))
    assert(d.meta == Multimodal.fakeDecode(
      Multimodal.MediaRecord(4L, "image", trunc)).meta)
  }

  test("multimodal decode preserves rows, schema, and determinism") {
    val docs = Tables.load(spark, sfDir, "documents")
    val decoded = Multimodal.decode(media)
    assert(decoded.count() == docs.count())
    val df = decoded.toDF()
    assert(df.schema.fieldNames.toSet == Set("mediaId", "meta", "features"))
    assert(df.select("features").head().getSeq[Float](0).length == 8)
    // determinism: same payload → same decode (stub is hash-based).
    // Compare fields, not case classes — Array[Float] uses reference ==.
    val a = decoded.filter(col("mediaId") === 0).head()
    val b = Multimodal.decode(media).filter(col("mediaId") === 0).head()
    assert(a.meta == b.meta && a.features.sameElements(b.features))
  }

  test("frame sampling yields monotone offsets bounded by duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 40000L)
    val byMedia = frames.collect().groupBy(_.mediaId)
    assert(byMedia.nonEmpty, "no video rows sampled")
    byMedia.foreach { case (_, fs) =>
      val offs = fs.sortBy(_.frameIdx).map(_.offsetMs)
      assert(offs.zip(offs.drop(1)).forall { case (x, y) => x < y })
      assert(offs.head == 0L)
    }
    // only audio/video (duration>0) produce frames; images never do
    val kinds = Multimodal.decode(media).toDF()
      .select(col("mediaId"), col("meta.durationMs")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byMedia.keySet.forall(id => kinds(id) > 0))
  }

  test("REAL resize: decodable images are actually rescaled pixels") {
    val s = spark
    import s.implicits._
    val rec = Multimodal.MediaRecord(1L, "image", encodedImage("png", 64, 32))
    val out = Multimodal.resize(Seq(rec).toDS(), 16, 16).head()
    val d = Multimodal.decodeImage(out).get
    // the decode downstream reports the TARGET grid from real pixels
    assert(d.meta.width == 16 && d.meta.height == 16)
    // the half-black/half-white structure survives the rescale: mass
    // stays at the luma extremes (bilinear blurs only the seam column)
    assert(d.features(0) > 0.3f && d.features(7) > 0.3f, d.features.toSeq.toString)
  }

  /** A 9×8 image with an explicit luma grid — scaleTo(9,8) is then
    * identity-sized, so the dHash bits are hand-predictable. */
  private def gridImage(lum: (Int, Int) => Int, fmt: String = "png"): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = lum(x, y) & 0xFF
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, bos))
    bos.toByteArray
  }

  test("dHash: container-invariant, local edits flip few bits, inversion flips all") {
    // a fixed pseudo-random luma pattern (deterministic arithmetic)
    def base(x: Int, y: Int) = (x * 37 + y * 101 + (x * y * 13) % 97) % 256
    val h1 = Multimodal.dHash(gridImage(base, "png")).get
    val h2 = Multimodal.dHash(gridImage(base, "bmp")).get
    // same pixels, different container → identical fingerprint
    assert(h1 == h2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // one edited cell touches at most its two adjacent comparisons
    // (base(4,3)=254, neighbors 178/233: zeroing it flips both)
    def edited(x: Int, y: Int) = if (x == 4 && y == 3) 0 else base(x, y)
    val he = Multimodal.dHash(gridImage(edited)).get
    assert(ham(h1, he) >= 1 && ham(h1, he) <= 2, s"hamming ${ham(h1, he)}")
    // luma inversion flips every strict comparison both ways
    val hi = Multimodal.dHash(gridImage((x, y) => 255 - base(x, y))).get
    assert(ham(h1, hi) > 32, s"hamming ${ham(h1, hi)}")
    // non-decodable → None, never a crash
    assert(Multimodal.dHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("nearDupImages: banded join finds exactly the brute-force pairs (Hamming <= 3)") {
    val s = spark
    import s.implicits._
    def base(x: Int, y: Int) = (x * 37 + y * 101 + (x * y * 13) % 97) % 256
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", gridImage(base, "png")),
      Multimodal.MediaRecord(2L, "image", gridImage(base, "bmp")),   // = 1 re-encoded
      Multimodal.MediaRecord(3L, "image",
        gridImage((x, y) => if (x == 4 && y == 3) 0 else base(x, y))), // near 1
      Multimodal.MediaRecord(4L, "image",
        gridImage((x, y) => 255 - base(x, y))),                      // far from all
      Multimodal.MediaRecord(5L, "image", "opaque".getBytes("UTF-8")), // non-decodable
      Multimodal.MediaRecord(6L, "audio", Array[Byte](1, 2))).toDS()
    val got = Multimodal.nearDupImages(recs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same hashes — the banded join must match
    // EXACTLY (pigeonhole: <= 3 diffs cannot touch all 4 bands)
    val hs = Multimodal.imageHashes(recs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) && got.contains((2L, 3L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L || p._1 == 6L || p._2 == 6L))
    // radius beyond the banding guarantee is refused, not silently lossy
    intercept[IllegalArgumentException](Multimodal.nearDupImages(recs, maxHamming = 4))
  }

  test("syntheticImages render real PNGs; re-encoded copies land at Hamming 0") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val imgs = Multimodal.syntheticImages(spark, docs)
    val one = imgs.head()
    val d = Multimodal.decodeImage(one).get
    assert(d.meta.width == 16 && d.meta.height == 16)
    // the q172 planted-copy shape: the real resize at native size is a
    // pixel-identical re-encode, so every copy pairs at Hamming 0
    val copies = Multimodal.resize(imgs.filter(_.mediaId % 10 == 0), 16, 16)
      .map(r => r.copy(mediaId = r.mediaId + 100000000L))
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    val zero = Multimodal.nearDupImages(imgs.union(copies), maxHamming = 3)
      .filter(col("b") === col("a") + 100000000L && col("hamming") === 0)
      .count()
    assert(zero == planted, s"recovered $zero of $planted planted copies")
  }

  test("resize touches only images, is deterministic, stays narrow") {
    val resized = Multimodal.resize(media, 224, 224)
    // no exchange: the stage must be partition-preserving
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
    val before = media.collect().map(r => r.mediaId -> r).toMap
    val after = resized.collect()
    assert(after.length == before.size)
    after.foreach { r =>
      if (r.kind == "image") {
        assert(r.payload.length == 224 * 224 / 1024)
        val again = Multimodal.resize(media, 224, 224)
          .filter(_.mediaId == r.mediaId).head()
        assert(again.payload.sameElements(r.payload))
      } else
        assert(r.payload.sameElements(before(r.mediaId).payload))
    }
  }

  test("resize refuses an output grid past the decode-bomb pixel bound") {
    // the decode side caps w*h at MaxImagePixels (64M); a caller-sized
    // 50000x50000 OUTPUT grid would allocate a multi-GB BufferedImage
    // in scaleTo — the same OOM by the other door. Fail fast instead.
    val e = intercept[IllegalArgumentException](
      Multimodal.resize(media, 50000, 50000))
    assert(e.getMessage.contains("MaxImagePixels"))
    Multimodal.resize(media, 8192, 8192) // at the bound: allowed
  }

  test("hot-band chunk-pair salting: identical pairs, bounded cells") {
    val s = spark
    import s.implicits._
    // a monochrome lake: 40 images whose dHash is ALL-ZERO bits (any
    // constant image), so every (band, bval) group holds all 40 —
    // the degenerate case where the plain banded join concentrates
    // 40^2 candidate work on four reducers
    def flat(v: Int): (Int, Int) => Int = (_, _) => v
    val recs = ((1 to 40).map(i =>
      Multimodal.MediaRecord(i.toLong, "image", gridImage(flat(128)))) ++
      Seq(Multimodal.MediaRecord(99L, "image", gridImage((x, y) =>
        (x * 37 + y * 101) % 256)))).toDS()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    val plain = rows(Multimodal.nearDupImages(recs, maxHamming = 3))
    val salted = rows(Multimodal.nearDupImages(recs, maxHamming = 3,
      hotBandDf = 8, bandSalt = 4))
    assert(salted == plain && plain.size == 40 * 39 / 2,
      s"salted pairs must equal the plain join's (${plain.size} pairs)")
    // the bounded-partition claim, pinned on the real replicated
    // sides: a (band, bval, cx, cy) join cell holds exactly one hash
    // CHUNK of its group per side — the hot group's 40 rows spread to
    // cells no larger than its largest chunk (hash-balanced around
    // 40/salt; 2x slack covers hash imbalance), where the unsalted
    // join put all 40 in one cell
    val bands = Multimodal.bandExplode(Multimodal.imageHashes(recs))
    val (hx, hy) = Multimodal.hotChunkSides(bands, salt = 4)
    for (side <- Seq(hx, hy)) {
      val maxCell = side.groupBy(col("band"), col("bval"), col("cx"), col("cy"))
        .count().agg(max(col("count"))).head().getLong(0)
      assert(maxCell <= 2 * 40 / 4,
        s"a chunk cell holds $maxCell rows — the salt is not spreading")
    }
  }
}
