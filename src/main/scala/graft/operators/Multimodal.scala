package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-preserving batch
  * transforms, typed `Dataset` stages — is real and tested. The codec
  * calls themselves are STUBS (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-metadata and
  * features from a hash of the payload, with the exact signature a real
  * decoder (javacv / a JNI codec) would slot into. Swapping in a real
  * decoder changes only the function body, not the pipeline shape.
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

  /** STUB decoder: a real implementation would parse the
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
      // per-partition setup (real impl: allocate codec context here)
      it.map(fakeDecode)
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
