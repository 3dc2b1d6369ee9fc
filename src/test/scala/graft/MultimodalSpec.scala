package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Grades the multimodal plumbing (q40's shape): decode schema / row
  * preservation / determinism, frame sampling, and the resize stage.
  * The codec bodies are deterministic stubs (no media libraries in the
  * test environment — see Multimodal scaladoc); what is graded here is
  * the Spark-side contract a real codec would slot into. */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(spark, Tables.load(spark, sfDir, "documents"))

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
