package graft

import graft.pipeline.{Ops, Pipeline}
import graft.pipeline.Pipeline._

/** Bash tasks (C2), typed params (C14), cross-pipeline deps (T11),
  * trigger-with-payload (T12). */
class OpsSpec extends SparkSpec {

  test("bash task: stdout becomes xcom; params template into the command (C2)") {
    val r = Pipeline.run(
      Seq(
        Ops.bashTask("echo", "echo run_${run_id}", env = Map.empty),
        Task("use", ctx => Value(ctx.xcom[String]("echo")), Seq("echo"))),
      params = Map("run_id" -> "42"))
    assert(r.value[String]("use") == "run_42")
  }

  test("bash exit 99 skips, other non-zero fails (C2 skip_on_exit_code)") {
    val r = Pipeline.run(Seq(
      Ops.bashTask("skipme", "exit 99"),
      Ops.bashTask("failme", "exit 3")))
    assert(r.status("skipme") == Skipped)
    assert(r.status("failme") == Failed)
  }

  test("bash env injection reaches the command") {
    val r = Pipeline.run(Seq(
      Ops.bashTask("envy", "echo $GREETING", env = Map("GREETING" -> "hola"))))
    assert(r.value[String]("envy") == "hola")
  }

  test("typed params: defaults, required, validation (C14)") {
    import Ops.ParamSpec
    val specs = Seq(
      ParamSpec[Int]("retries", default = Some(2), validate = (_: Int) >= 0),
      ParamSpec[String]("segment"))
    val ok = Ops.resolveParams(specs, Map("segment" -> "BUILDING"))
    assert(ok == Map("retries" -> 2, "segment" -> "BUILDING"))
    val missing = intercept[IllegalArgumentException] {
      Ops.resolveParams(specs, Map.empty)
    }
    assert(missing.getMessage.contains("segment"))
    val invalid = intercept[IllegalArgumentException] {
      Ops.resolveParams(specs, Map("segment" -> "X", "retries" -> -1))
    }
    assert(invalid.getMessage.contains("retries"))
  }

  test("cross-pipeline dependency: consumer waits for producer's marker (T11)") {
    val reg = new Ops.RunRegistry
    val producer = new Thread(() => {
      Thread.sleep(100)
      Pipeline.run(Seq(Task("head_task", _ => {
        reg.markComplete("parent", "head_task"); Value(())
      })))
      ()
    })
    producer.start()
    val consumer = Pipeline.run(Seq(
      Task("wait_parent", reg.awaitTask("parent", "head_task", timeoutMs = 5000)),
      Task("work", _ => Value("done"), Seq("wait_parent"))))
    producer.join()
    assert(consumer.status("work") == Success)
  }

  test("external sensor timeout with soft_fail skips the consumer cone (T11/T9)") {
    val reg = new Ops.RunRegistry
    val r = Pipeline.run(Seq(
      Task("wait_parent", reg.awaitTask("parent", "never", timeoutMs = 60,
        softFail = true)),
      Task("work", _ => Value(()), Seq("wait_parent"))))
    assert(r.status("wait_parent") == Skipped && r.status("work") == Skipped)
  }

  test("trigger with payload: conf reaches the target pipeline (T12)") {
    val target = Seq(Task("greet",
      ctx => Value(s"hello ${ctx.params("message")}")))
    val r = Ops.triggerWithPayload(target, Map("message" -> "world"))
    assert(r.value[String]("greet") == "hello world")
  }

  test("isolated session: conf and temp views don't leak; context shared (C11)") {
    val outer = spark
    val before = outer.conf.get("spark.sql.shuffle.partitions")
    val n = Ops.withIsolatedSession(outer,
        Map("spark.sql.shuffle.partitions" -> "7")) { s =>
      assert(s.sparkContext eq outer.sparkContext) // shared executors
      assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
      s.range(5).createOrReplaceTempView("c11_isolated_view")
      s.sql("SELECT count(*) AS n FROM c11_isolated_view").head().getLong(0)
    }
    assert(n == 5L)
    // nothing leaked into the caller's session
    assert(outer.conf.get("spark.sql.shuffle.partitions") == before)
    assert(!outer.catalog.tableExists("c11_isolated_view"))
  }
}
