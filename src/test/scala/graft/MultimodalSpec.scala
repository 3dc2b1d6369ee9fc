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
}
