package graft

import java.nio.file.Files
import graft.pipeline.{Pipeline, Sensors}
import graft.pipeline.Pipeline._

/** Sensors (T7–T10) and the workday timetable (T14). */
class SensorsSpec extends SparkSpec {

  test("file sensor finds a file that appears mid-poll (T7)") {
    val dir = Files.createTempDirectory("graft_sensor_")
    val target = dir.resolve("ready.flag")
    val writer = new Thread(() => { Thread.sleep(150); Files.createFile(target); () })
    writer.start()
    val r = Sensors.poll(timeoutMs = 5000, intervalMs = 20)(
      Sensors.fileProbe(target.toString))
    writer.join()
    r match {
      case Sensors.Found(p, _) => assert(p == target.toString)
      case Sensors.TimedOut => fail("sensor should have found the file")
    }
  }

  test("timeout + soft_fail skips the task; hard timeout fails it (T9)") {
    val never = Sensors.predicateProbe(() => false)
    val soft = Pipeline.run(Seq(
      Task("wait", Sensors.asTask(timeoutMs = 50, intervalMs = 10, softFail = true)(never)),
      Task("next", _ => Value(()), Seq("wait"))))
    assert(soft.status("wait") == Skipped && soft.status("next") == Skipped)
    val hard = Pipeline.run(Seq(
      Task("wait", Sensors.asTask(timeoutMs = 50, intervalMs = 10)(never)),
      Task("next", _ => Value(()), Seq("wait"))))
    assert(hard.status("wait") == Failed && hard.status("next") == UpstreamFailed)
  }

  test("poke payload reaches downstream via xcom (T10)") {
    val r = Pipeline.run(Seq(
      Task("sense", Sensors.asTask(timeoutMs = 1000, intervalMs = 10)(
        () => Some("payload-42"))),
      Task("use", ctx => Value(ctx.xcom[String]("sense").toUpperCase), Seq("sense"))))
    assert(r.value[String]("use") == "PAYLOAD-42")
  }

  test("time sensor: past target fires immediately, future target waits (T7)") {
    import java.time.Instant
    val past = Instant.now().minusSeconds(60)
    assert(Sensors.timeProbe(past)().contains(past))
    val future = Instant.now().plusSeconds(3600)
    assert(Sensors.timeProbe(future)().isEmpty)
    // through the poke loop: past target completes without timing out
    Sensors.poll(timeoutMs = 1000)(Sensors.timeProbe(past)) match {
      case Sensors.Found(v, _) => assert(v == past)
      case other => fail(s"expected Found, got $other")
    }
  }

  test("workday timetable skips weekends and holidays (T14)") {
    import java.time.LocalDate
    val holidays = Set(LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 15))
    val w = graft.pipeline.WorkdaySchedule(holidays)
    // 2024-01-01 is a holiday Monday; next workday is Tuesday the 2nd
    assert(w.nextWorkday(LocalDate.of(2023, 12, 31)) == LocalDate.of(2024, 1, 2))
    // Friday the 12th → Monday the 15th is MLK holiday → Tuesday the 16th
    assert(w.nextWorkday(LocalDate.of(2024, 1, 12)) == LocalDate.of(2024, 1, 16))
    val runs = w.runDates(LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 8))
    assert(runs == Seq(2, 3, 4, 5).map(LocalDate.of(2024, 1, _)))
  }
}
