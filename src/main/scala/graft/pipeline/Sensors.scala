package graft.pipeline

import java.nio.file.{Files, Paths}
import graft.pipeline.Pipeline.{Outcome, SelfSkip, Value}

/** Polling sensors (SURVEY.md §2.9 T7–T10): await-style guards that
  * block a pipeline task until a condition holds, with the reference's
  * timeout semantics — `soft_fail` turns a timeout into a SKIP (not a
  * failure), and a `PokeReturnValue` carries a payload to downstream
  * tasks via XCom (`dags/example_sensors.py:56-122`,
  * `dags/example_sensor_decorator.py:45-47`).
  *
  * Deferrable/async sensors (T8) are a NON-ISSUE here by design: the
  * reference needs them because a waiting sensor occupies a worker
  * slot; in this engine sensors wait on the driver thread while
  * executors hold no resources, which is what "deferrable" buys.
  * Documented, not built — per SURVEY §2.9 T8.
  */
object Sensors {

  sealed trait SensorResult[+A]
  final case class Found[A](value: A, waitedMs: Long) extends SensorResult[A]
  case object TimedOut extends SensorResult[Nothing]

  /** Core poke loop (T10: custom poke interval + payload). */
  def poll[A](timeoutMs: Long, intervalMs: Long = 100L)
      (probe: () => Option[A]): SensorResult[A] = {
    val t0 = System.nanoTime()
    def elapsed = (System.nanoTime() - t0) / 1000000L
    var r = probe()
    while (r.isEmpty && elapsed < timeoutMs) {
      Thread.sleep(math.min(intervalMs, math.max(1, timeoutMs - elapsed)))
      r = probe()
    }
    r.fold[SensorResult[A]](TimedOut)(v => Found(v, elapsed))
  }

  /** Wrap a sensor as a pipeline task body (T9): found → Value(payload),
    * timeout → SelfSkip when softFail else failure. */
  def asTask[A](timeoutMs: Long, intervalMs: Long = 100L, softFail: Boolean = false)
      (probe: () => Option[A]): Pipeline.Context => Outcome =
    _ => poll(timeoutMs, intervalMs)(probe) match {
      case Found(v, _) => Value(v)
      case TimedOut if softFail => SelfSkip
      case TimedOut => throw new RuntimeException(s"sensor timed out after ${timeoutMs}ms")
    }

  /** T7: file sensor — path exists. */
  def fileProbe(path: String): () => Option[String] =
    () => if (Files.exists(Paths.get(path))) Some(path) else None

  /** T7: time sensor — target wall-clock instant reached. */
  def timeProbe(target: java.time.Instant): () => Option[java.time.Instant] =
    () => if (!java.time.Instant.now().isBefore(target)) Some(target) else None

  /** T7: python-predicate sensor analog. */
  def predicateProbe(p: () => Boolean): () => Option[Unit] =
    () => if (p()) Some(()) else None
}
