package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-preserving batch
  * transforms, typed `Dataset` stages — is real and tested. The IMAGE
  * decode is REAL: [[decodeImage]] parses PNG/JPEG/BMP/GIF payloads
  * through the JDK's own `javax.imageio` (headless, no native codecs
  * needed), reporting width/height from the actual pixel grid and an
  * 8-bin luminance histogram as the feature vector. Audio/video decode
  * remains a STUB (this container has no AV codec libraries):
  * `fakeDecode` derives deterministic pseudo-metadata and features
  * from a hash of the payload, with the exact signature a real decoder
  * (javacv / a JNI codec) would slot into — and non-decodable "image"
  * payloads (synthetic corpora carry opaque blobs) fall back to the
  * same stub so pipelines stay total. Swapping in a real AV decoder
  * changes only the function body, not the pipeline shape.
  *
  * Scale notes: media rows are large (MBs) — transforms here are
  * narrow (mapPartitions; no shuffle), so blobs are never shuffled;
  * only extracted features/metadata (small, fixed-width) flow into
  * joins/aggregations downstream.
  */
object Multimodal {

  /** Typed media metadata — the part of a media row that is cheap to
    * shuffle and index. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)

  final case class MediaRecord(mediaId: Long, kind: String, payload: Array[Byte])

  final case class DecodedMedia(mediaId: Long, meta: MediaMeta,
      features: Array[Float])

  final case class Frame(mediaId: Long, frameIdx: Int, offsetMs: Long,
      payload: Array[Byte])

  /** REAL image decode through the JDK's headless `javax.imageio`
    * (PNG, JPEG, BMP, GIF — the readers every JVM ships): width/height
    * come from the decoded pixel grid and the 8-dim feature vector is
    * the normalized 8-bin luminance histogram (ITU-R BT.601 integer
    * weights 299/587/114, bins of 32 luma levels), the classic cheap
    * image signature for dedup/quality bucketing. Returns None when
    * the payload is not a decodable image — [[decodeRecord]] then
    * falls back to the deterministic stub so pipelines stay total
    * over synthetic/opaque blobs. */
  /** Decode-bomb guard: a few-KB container can DECLARE an enormous
    * pixel grid (a 30000×30000 PNG header is bytes; its decoded
    * BufferedImage is ~3.6 GB) — dimensions are checked from the
    * HEADER, before any pixel allocation, and oversized images fall
    * back to the stub instead of OOM-killing the executor. 64 MPx
    * admits any sane training image (8k×8k). */
  private val MaxImagePixels = 64L * 1024 * 1024

  /** The guarded pixel decode [[decodeImage]], [[dHash]] and the real
    * [[resize]] share: header-checked dimensions, then the decoded
    * `BufferedImage`. None for empty/non-image/oversized/corrupt
    * payloads. */
  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (payload == null || payload.isEmpty) return None
    try {
      // memory-backed stream, NOT ImageIO.createImageInputStream: the
      // factory honors ImageIO.getUseCache (default true) and wraps a
      // ByteArrayInputStream in a FileCacheImageInputStream — a disk
      // temp-file create/write/delete per decoded image, which at
      // corpus scale turns a CPU stage into an I/O stage (measured:
      // q172's isolated probe drops 5.61 -> 3.13 s with the memory
      // streams here and in pngBytes)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // header-only dimension read — no pixel decode yet
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) None
            else Some(reader.read(0))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      // ImageIO readers throw on truncated/corrupt containers whose
      // magic bytes looked decodable — same contract as "not an image"
      case _: java.io.IOException | _: RuntimeException => None
    }
  }

  /** PNG-encode via an explicit MEMORY-backed ImageIO stream — the
    * encode-side twin of [[readImage]]'s stream choice (the bare
    * `ImageIO.write(im, "png", outputStream)` overload wraps the
    * target in a FileCacheImageOutputStream by default: one disk
    * temp file per encoded image). Same encoder, identical bytes. */
  private def pngBytes(im: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(im, "png", ios) finally ios.close()
    bos.toByteArray
  }

  /** BT.601 integer luma of a packed RGB pixel (0..255). */
  private def luma(rgb: Int): Int =
    (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
      (rgb & 0xFF) * 114) / 1000

  def decodeImage(r: MediaRecord): Option[DecodedMedia] =
    readImage(r.payload).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val hist = new Array[Long](8)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        // bulk row fetch: one raster call per row, not one
        // synchronized getRGB call per pixel
        im.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          hist(luma(row(x)) >> 5) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      DecodedMedia(r.mediaId, MediaMeta("image", w, h, 0, 0L),
        hist.map(c => c.toFloat / n))
    }

  /** The per-record decode [[decode]] maps: real pixels for decodable
    * images, the deterministic stub for audio/video and for opaque
    * payloads. */
  def decodeRecord(r: MediaRecord): DecodedMedia =
    if (r.kind == "image") decodeImage(r).getOrElse(fakeDecode(r))
    else fakeDecode(r)

  /** STUB decoder (audio/video, and the fallback for non-decodable
    * image payloads): a real implementation would parse the
    * container/codec headers and decode pixels/samples. Here metadata
    * and an 8-dim feature vector are derived deterministically from the
    * payload bytes so the pipeline is testable end-to-end. */
  def fakeDecode(r: MediaRecord): DecodedMedia = {
    val h = java.util.Arrays.hashCode(r.payload).toLong & 0x7fffffffL
    val meta = MediaMeta(
      kind = r.kind,
      width = (h % 1920 + 64).toInt,
      height = (h % 1080 + 64).toInt,
      sampleRateHz = if (r.kind == "audio") 16000 else 0,
      durationMs = if (r.kind == "image") 0L else h % 600000L)
    val feats = Array.tabulate(8)(i => ((h >> (i * 4)) & 0xF).toFloat / 15f)
    DecodedMedia(r.mediaId, meta, feats)
  }

  /** Decode stage: narrow, partition-preserving, batched per partition.
    * The unit a real decoder would parallelize over — one codec context
    * per partition, rows streamed through it. */
  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition setup (real impl: allocate AV codec context
      // here; ImageIO readers are looked up per call and need none)
      it.map(decodeRecord)
    }
  }

  /** Frame sampling: one row per sampled frame every `everyMs`. The
    * offsets come from metadata, so sampling plans frames WITHOUT
    * decoding the video — explode happens on (id, offset), and only
    * the sampled frames would be decoded downstream. */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long): Dataset[Frame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val d = fakeDecode(r)
      if (d.meta.durationMs <= 0) Iterator.empty
      else (0L until d.meta.durationMs by everyMs).iterator.zipWithIndex.map {
        case (off, i) => Frame(r.mediaId, i, off, Array.empty[Byte])
      }
    }
  }

  /** Headless `Graphics2D` downscale to exactly (w, h) — the shared
    * resampler of the REAL [[resize]] and [[dHash]]. Bilinear
    * interpolation: deterministic for a given JDK, smooth enough that
    * a re-encoded copy of an image lands on the same hash. */
  private def scaleTo(im: java.awt.image.BufferedImage, w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(im, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Resize stage (images; audio/video pass through untouched): narrow
    * and partition-preserving like [[decode]]. DECODABLE images are
    * REALLY resized — decode, `Graphics2D` bilinear scale to the
    * target grid, re-encode as PNG (lossless, every JVM writes it) —
    * so a decode downstream reports the target dimensions from actual
    * pixels. Non-decodable "image" payloads (synthetic opaque blobs)
    * keep the deterministic stub resample so pipelines stay total. */
  def resize(ds: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    require(width > 0 && height > 0)
    // the OUTPUT grid gets the same pixel bound the decode side
    // enforces: a caller-supplied 50000×50000 target would allocate a
    // multi-GB BufferedImage in scaleTo, reintroducing exactly the
    // executor OOM the decode-bomb guard exists to prevent
    require(width.toLong * height <= MaxImagePixels,
      s"resize target ${width}x$height exceeds MaxImagePixels=" +
        s"$MaxImagePixels — the decode-side bomb guard applies to the " +
        "output grid too")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        if (r.kind != "image") r
        else readImage(r.payload) match {
          case Some(im) =>
            r.copy(payload = pngBytes(scaleTo(im, width, height)))
          case None =>
            // stub resample: payload bytes cycled to pixel-count length
            val target = math.max(1, (width.toLong * height / 1024).toInt)
            val out =
              if (r.payload.isEmpty) new Array[Byte](target)
              else Array.tabulate(target)(i => r.payload(i % r.payload.length))
            r.copy(payload = out)
        }
      }
    }
  }

  // ---- perceptual fingerprint + image near-dup ----

  /** 64-bit difference hash (dHash — the classic cheap perceptual
    * fingerprint): downscale to a 9×8 luma grid, emit one bit per
    * horizontally adjacent pair (left > right). Robust to re-encoding
    * (PNG vs BMP of the same pixels hash identically — the scaled
    * grid sees pixels, not containers) and to small local edits (a
    * few changed cells flip a few bits), while global changes move
    * many bits. None for non-decodable payloads. */
  def dHash(payload: Array[Byte]): Option[Long] =
    readImage(payload).map { im =>
      val g = scaleTo(im, 9, 8)
      var bits = 0L
      var i = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(g.getRGB(x, y)) > luma(g.getRGB(x + 1, y)))
            bits |= 1L << i
          i += 1
          x += 1
        }
        y += 1
      }
      bits
    }

  /** (media_id, dhash) for every DECODABLE image — the narrow
    * fingerprint stage: payloads (MBs) never leave their partition,
    * only 8-byte hashes flow downstream into the banded join. */
  def imageHashes(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.flatMap(r =>
        if (r.kind != "image") None
        else dHash(r.payload).map(h => (r.mediaId, h)))
    }.toDF("media_id", "dhash")
  }

  /** Image near-dup pairs by banded Hamming join — the LSH discipline
    * the text dedup family uses, on perceptual hashes: split each
    * 64-bit dHash into 4 fixed 16-bit bands and equi-join on
    * (band, value), so candidates share at least one exact band and
    * the plan is a hash join on fixed-width keys — NEVER all-pairs
    * across the corpus. Pigeonhole makes recall EXACT for
    * `maxHamming` ≤ 3: ≤ 3 differing bits cannot touch all 4 bands,
    * so every true pair shares a band (MultimodalSpec pins banded ==
    * brute-force pairs). Each candidate is verified with the exact
    * Hamming distance (`bit_count(a XOR b)`).
    *
    * WITHIN a band-value group the candidate set is quadratic by
    * construction (every member pair is a candidate) — fine when
    * groups are small, but a low-entropy lake (thousands of uniform /
    * near-black images sharing band values) concentrates one group's
    * n² candidate work on a single reducer. `hotBandDf`/`bandSalt`
    * bound that: groups past the `hotBandDf` frequency threshold run
    * through a chunk-pair (triangle) decomposition — each member gets
    * a deterministic chunk in [0, bandSalt) by id hash, each side
    * replicates across the other's chunk axis, and the join key grows
    * to (band, bval, cx, cy) — so a hot group's work spreads over
    * bandSalt² cells of ≤ ⌈n/bandSalt⌉² candidates each, with every
    * member pair meeting in EXACTLY one cell (no recall change, no
    * duplicate candidates; the self-join counterpart of
    * [[Skew.saltedJoin]]'s one-sided salt). Output pairs are
    * identical with the knob on or off — MultimodalSpec plants a hot
    * band and pins both the parity and the per-cell bound. The
    * default leaves the fast single-join plan untouched (no frequency
    * pass): engage the knob when the lake's band histogram says so.
    *
    * @return (a, b, hamming), a < b, hamming ≤ maxHamming
    */
  def nearDupImages(ds: Dataset[MediaRecord], maxHamming: Int = 3,
      hotBandDf: Long = Long.MaxValue, bandSalt: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming: 4 fixed 16-bit bands guarantee full " +
        "recall only to Hamming 3 — raise the band count for looser radii")
    require(hotBandDf >= 1, s"hotBandDf must be >= 1, got $hotBandDf")
    require(bandSalt >= 1, s"bandSalt must be >= 1, got $bandSalt")
    val bands = bandExplode(imageHashes(ds))
    val candidates =
      if (hotBandDf == Long.MaxValue) pairCells(bands, bands)
      else {
        // one fixed-width aggregate on the (band, bval) key the join
        // already shuffles on — co-partitioned, no extra exchange shape
        val freq = bands.groupBy(col("band"), col("bval"))
          .agg(count(lit(1)).as("bf"))
        val withF = bands.join(freq, Seq("band", "bval"))
        val cold = withF.filter(col("bf") <= hotBandDf).drop("bf")
        val hot = withF.filter(col("bf") > hotBandDf).drop("bf")
        val (hx, hy) = hotChunkSides(hot, bandSalt)
        pairCells(cold, cold).unionByName(
          hx.join(hy, Seq("band", "bval", "cx", "cy"))
            .select(col("xid"), col("xh"), col("yid"), col("yh")))
      }
    candidates
      .filter(col("xid") < col("yid"))
      .select(col("xid").as("a"), col("yid").as("b"),
        bit_count(col("xh").bitwiseXOR(col("yh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** (media_id, dhash) → one row per (band, bval) — 4 fixed 16-bit
    * bands of the 64-bit dHash. */
  private[graft] def bandExplode(h: DataFrame): DataFrame =
    h.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("dhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("bval"))): _*)).as("bb"))
      .select(col("media_id"), col("dhash"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))

  /** Candidate pairs within each (band, bval) group: the plain
    * equi-join cell, columns renamed to the shared candidate schema. */
  private def pairCells(x: DataFrame, y: DataFrame): DataFrame =
    x.select(col("band"), col("bval"), col("media_id").as("xid"),
        col("dhash").as("xh"))
      .join(y.select(col("band"), col("bval"), col("media_id").as("yid"),
        col("dhash").as("yh")), Seq("band", "bval"))
      .select(col("xid"), col("xh"), col("yid"), col("yh"))

  /** The two replicated sides of the chunk-pair decomposition for hot
    * band groups: each member's chunk is a deterministic id hash in
    * [0, salt); the x side keeps its chunk as `cx` and replicates
    * across every `cy`, the y side keeps its chunk as `cy` and
    * replicates across every `cx` — so members x, y meet in exactly
    * the (chunk(x), chunk(y)) cell, and each (band, bval, cx, cy)
    * join group holds ≤ ⌈|group|/salt⌉ rows per side
    * (MultimodalSpec pins the bound). */
  private[graft] def hotChunkSides(hot: DataFrame,
      salt: Int): (DataFrame, DataFrame) = {
    val chunked = hot.withColumn("chunk",
      pmod(xxhash64(col("media_id")), lit(salt.toLong)))
    val axis = sequence(lit(0), lit(salt - 1)).cast("array<bigint>")
    val hx = chunked
      .select(col("band"), col("bval"), col("media_id").as("xid"),
        col("dhash").as("xh"), col("chunk").as("cx"))
      .withColumn("cy", explode(axis))
    val hy = chunked
      .select(col("band"), col("bval"), col("media_id").as("yid"),
        col("dhash").as("yh"), col("chunk").as("cy"))
      .withColumn("cx", explode(axis))
    (hx, hy)
  }

  /** Deterministic REAL images from the documents corpus: a 16×16
    * grayscale rendering of the text's character-class histogram
    * (16 classes × 16 rows of quantized frequency), PNG-encoded.
    * Near-duplicate texts have near-identical histograms, so their
    * images land within a few dHash bits — which is what makes this a
    * faithful stand-in for a real image lake with re-encoded/lightly-
    * edited duplicates: the whole decode→fingerprint→banded-join
    * pipeline runs on REAL pixels end-to-end. */
  def syntheticImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val counts = new Array[Long](16)
          var i = 0
          while (i < text.length) {
            val c = text.charAt(i)
            val cls =
              if (c >= 'a' && c <= 'z') (c - 'a') % 12
              else if (c >= 'A' && c <= 'Z') (c - 'A') % 12
              else if (c >= '0' && c <= '9') 12
              else if (c == ' ') 13
              else if (c == '.' || c == ',') 14
              else 15
            counts(cls) += 1
            i += 1
          }
          val mx = math.max(1L, counts.max)
          val im = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var x = 0
          while (x < 16) {
            // column brightness = the class's relative frequency;
            // rows fill bar-chart style so small frequency shifts
            // move few pixels (near-dup texts → near-dup images)
            val lvl = ((counts(x) * 16) / mx).toInt
            var y = 0
            while (y < 16) {
              val on = (15 - y) < lvl
              val v = if (on) 230 else 25
              im.setRGB(x, y, (v << 16) | (v << 8) | v)
              y += 1
            }
            x += 1
          }
          MediaRecord(id, "image", pngBytes(im))
        }
      }
  }

  /** Build a synthetic media table from the documents corpus: payload =
    * UTF-8 bytes of the text (an opaque deterministic blob), kind
    * round-robins image/audio/video. Stands in for `spark.read.format
    * ("binaryFile")` over a media lake. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
