package graft

import java.time.{Duration, Instant}
import org.scalacheck.{Gen, Prop}
import graft.streaming.Incremental

/** Interval semantics (SURVEY.md §2.9 T1/T13): half-open slices must
  * partition the range — no gaps, no overlaps, full coverage — the
  * invariant the reference's scheduler provides for backfills.
  */
class IncrementalSpec extends SparkSpec {

  /** Run a scalacheck property under scalatest (the scalatestplus bridge
    * is not in the offline cache; raw Test.check is equivalent). */
  def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")

  test("slices partition [start,end) exactly: contiguous, ordered, covering") {
    val genCase = for {
      spanMin <- Gen.choose(1L, 10000L)
      stepMin <- Gen.choose(1L, 500L)
    } yield (spanMin, stepMin)
    check(Prop.forAll(genCase) { case (spanMin, stepMin) =>
      val end = t0.plus(Duration.ofMinutes(spanMin))
      val s = Incremental.slices(t0, end, Duration.ofMinutes(stepMin))
      val contiguous = s.sliding(2).forall {
        case Seq((_, e1), (s2, _)) => e1 == s2
        case _ => true
      }
      s.head._1 == t0 && s.last._2 == end && contiguous &&
        s.forall { case (a, b) => a.isBefore(b) }
    })
  }

  test("latestOnly keeps exactly the newest slice") {
    val s = Incremental.slices(t0, t0.plus(Duration.ofHours(10)), Duration.ofHours(1))
    assert(Incremental.latestOnly(s) ==
      Seq((t0.plus(Duration.ofHours(9)), t0.plus(Duration.ofHours(10)))))
    assert(Incremental.latestOnly(Nil).isEmpty)
  }

  test("intervalScoped is half-open: start inclusive, end exclusive") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val df = Seq("2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val got = Incremental.intervalScoped(df, "ts",
        Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-03T00:00:00Z"))
      .collect().map(_.getTimestamp(0).toInstant)
    assert(got.toSet == Set(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-02T00:00:00Z")))
  }

  test("slice union over events equals the whole-range query (catch-up law)") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.load(spark, sfDir, "events")
    val start = Instant.parse("2024-01-05T00:00:00Z")
    val end = Instant.parse("2024-01-11T00:00:00Z")
    val whole = Incremental.intervalScoped(e, "ts", start, end).count()
    val parts = Incremental.slices(start, end, Duration.ofHours(36)).map {
      case (a, b) => Incremental.intervalScoped(e, "ts", a, b).count()
    }.sum
    assert(parts == whole)
  }
}
