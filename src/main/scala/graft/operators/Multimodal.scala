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

  def decodeImage(r: MediaRecord): Option[DecodedMedia] = {
    if (r.payload == null || r.payload.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
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
            else {
              val im = reader.read(0)
              val hist = new Array[Long](8)
              val row = new Array[Int](w)
              var y = 0
              while (y < h) {
                // bulk row fetch: one raster call per row, not one
                // synchronized getRGB call per pixel
                im.getRGB(0, y, w, 1, row, 0, w)
                var x = 0
                while (x < w) {
                  val rgb = row(x)
                  val lum = (((rgb >> 16) & 0xFF) * 299 +
                    ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
                  hist(lum >> 5) += 1
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              Some(DecodedMedia(r.mediaId, MediaMeta("image", w, h, 0, 0L),
                hist.map(c => c.toFloat / n)))
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      // ImageIO readers throw on truncated/corrupt containers whose
      // magic bytes looked decodable — same contract as "not an image"
      case _: java.io.IOException | _: RuntimeException => None
    }
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

  /** Resize stage (images; audio/video pass through untouched): narrow
    * and partition-preserving like [[decode]]. The STUB "resampler"
    * deterministically re-derives a payload whose length is
    * proportional to the target pixel count (a real implementation
    * decodes, scales, re-encodes — same signature, same plan shape);
    * metadata downstream then reports the target dimensions. */
  def resize(ds: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    require(width > 0 && height > 0)
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        if (r.kind != "image") r
        else {
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
