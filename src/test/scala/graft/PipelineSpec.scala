package graft

import org.scalacheck.{Gen, Prop}
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline._

/** Trigger-rule × skip-propagation semantics (SURVEY.md §2.10 C7 —
  * "the one genuinely hard part"): the truth table, the reference's own
  * skip-dag and nested-branch scenarios, and the rest of the DSL
  * surface (branch, short-circuit, retries, xcom, map/reduce, groups,
  * teardown, listeners, SLA).
  */
class PipelineSpec extends SparkSpec {

  private def ok(name: String, up: String*) = Task(name, _ => Value(name), up)
  private def failT(name: String, up: String*) =
    Task(name, _ => throw new RuntimeException(s"$name boom"), up)
  private def skipT(name: String, up: String*) = Task(name, _ => SelfSkip, up)

  def checkProp(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  // ---- truth table (Airflow semantics, hand-derived expectations) ----

  test("trigger-rule truth table") {
    import Pipeline.{evaluate => ev}
    val S = Success; val F = Failed; val U = UpstreamFailed; val K = Skipped
    // (rule, upstream, expected: Right=run, Left=landed state)
    val table: Seq[(TriggerRule, Seq[Status], Either[Status, Unit])] = Seq(
      (AllSuccess, Seq(S, S), Right(())),
      (AllSuccess, Seq(S, F), Left(U)),
      (AllSuccess, Seq(S, U), Left(U)),
      (AllSuccess, Seq(S, K), Left(K)),
      (AllSuccess, Seq(K, K), Left(K)),
      (AllSuccess, Seq(F, K), Left(U)), // failure dominates skip
      (AllFailed, Seq(F, U), Right(())),
      (AllFailed, Seq(F, S), Left(K)),
      (AllFailed, Seq(K, K), Left(K)),
      (AllDone, Seq(F, K), Right(())),
      (OneSuccess, Seq(K, S), Right(())),
      (OneSuccess, Seq(K, F), Left(K)),
      (OneFailed, Seq(S, U), Right(())),
      (OneFailed, Seq(S, K), Left(K)),
      (NoneFailed, Seq(S, K), Right(())),
      (NoneFailed, Seq(K, K), Right(())),
      (NoneFailed, Seq(S, F), Left(U)),
      (NoneFailedMinOneSuccess, Seq(S, K), Right(())),
      (NoneFailedMinOneSuccess, Seq(K, K), Left(K)),
      (NoneFailedMinOneSuccess, Seq(S, F), Left(U)),
      (NoneSkipped, Seq(S, F), Right(())),
      (NoneSkipped, Seq(S, K), Left(K)),
      (Always, Seq(F, K), Right(())))
    table.foreach { case (rule, up, want) =>
      assert(ev(rule, up) == want, s"$rule on $up")
    }
  }

  test("rule evaluation is permutation-invariant and empty-upstream always runs") {
    val rules = Seq(AllSuccess, AllFailed, AllDone, OneSuccess, OneFailed,
      NoneFailed, NoneFailedMinOneSuccess, NoneSkipped, Always)
    val genStatus = Gen.oneOf[Status](Success, Failed, UpstreamFailed, Skipped)
    val gen = for {
      rule <- Gen.oneOf(rules)
      up <- Gen.listOfN(5, genStatus)
      perm <- Gen.const(scala.util.Random.shuffle(up))
    } yield (rule, up, perm)
    checkProp(Prop.forAll(gen) { case (rule, up, perm) =>
      Pipeline.evaluate(rule, up) == Pipeline.evaluate(rule, perm)
    })
    rules.foreach(r => assert(Pipeline.evaluate(r, Nil) == Right(())))
  }

  // ---- ported reference scenarios ----

  test("example_skip_dag: ALL_SUCCESS join skips, ONE_SUCCESS join runs") {
    def pipeline(rule: TriggerRule): Seq[Task] = Seq(
      skipT("skip_operator"), ok("always_true"),
      Task("join", _ => Value("join"), Seq("skip_operator", "always_true"), rule),
      ok("final", "join"))
    val r1 = Pipeline.run(pipeline(AllSuccess))
    assert(r1.status("join") == Skipped && r1.status("final") == Skipped)
    val r2 = Pipeline.run(pipeline(OneSuccess))
    assert(r2.status("join") == Success && r2.status("final") == Success)
  }

  test("example_nested_branch_dag: nested branches + NFMOS joins") {
    val tasks = Seq(
      Task("branch_1", _ => Branch(Set("true_1"))),
      ok("true_1", "branch_1"), ok("false_1", "branch_1"),
      Task("branch_2", _ => Branch(Set("true_2")), Seq("false_1")),
      ok("true_2", "branch_2"), ok("false_2", "branch_2"),
      Task("join_2", _ => Value(()), Seq("true_2", "false_2"), NoneFailedMinOneSuccess),
      ok("false_3", "join_2"),
      Task("join_1", _ => Value(()), Seq("true_1", "false_3"), NoneFailedMinOneSuccess))
    val r = Pipeline.run(tasks)
    assert(r.status("true_1") == Success)
    assert(r.status("false_1") == Skipped)
    assert(r.status("branch_2") == Skipped) // upstream skipped
    assert(r.status("true_2") == Skipped && r.status("false_2") == Skipped)
    assert(r.status("join_2") == Skipped)   // no success among upstream
    assert(r.status("false_3") == Skipped)
    assert(r.status("join_1") == Success)   // true_1 succeeded, none failed
  }

  // ---- DSL surface ----

  test("short-circuit: transitive vs direct-only skip") {
    def dag(ignoreRules: Boolean) = Seq(
      Task("guard", _ => ShortCircuit(proceed = false, ignoreRules)),
      ok("a", "guard"),
      Task("b", _ => Value(()), Seq("a"), AllDone))
    val transitive = Pipeline.run(dag(true))
    assert(transitive.status("a") == Skipped && transitive.status("b") == Skipped)
    val direct = Pipeline.run(dag(false))
    assert(direct.status("a") == Skipped)
    assert(direct.status("b") == Success) // AllDone rule decides, not the guard
  }

  test("short-circuit true proceeds") {
    val r = Pipeline.run(Seq(
      Task("guard", _ => ShortCircuit(proceed = true)), ok("a", "guard")))
    assert(r.status("a") == Success)
  }

  test("retries: two failures then success with retries=2 (C15)") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    val r = Pipeline.run(Seq(Task("flaky",
      _ => if (attempts.incrementAndGet() < 3) sys.error("nope") else Value(42),
      retries = 2)))
    assert(r.status("flaky") == Success && r.value[Int]("flaky") == 42)
    assert(attempts.get() == 3)
  }

  test("failure lands Failed and downstream UpstreamFailed") {
    val r = Pipeline.run(Seq(failT("bad"), ok("next", "bad")))
    assert(r.status("bad") == Failed)
    assert(r.status("next") == UpstreamFailed)
  }

  test("xcom + dynamic map/reduce: the sum_it pattern totals 9 (C4/C13)") {
    // dags/example_dynamic_task_mapping.py: add_one over [1,2,3] then sum.
    val tasks = Seq(
      Task("make_list", _ => Value(Seq(1, 2, 3))),
      Pipeline.mapReduce[Int, Int, Int]("sum_it",
        ctx => ctx.xcom[Seq[Int]]("make_list"),
        _ + 1, _.sum, upstream = Seq("make_list")))
    val r = Pipeline.run(tasks)
    assert(r.value[Int]("sum_it") == 9)
  }

  test("task group namespacing rewires internal edges only (C8)") {
    val g = Pipeline.group("etl", Seq(ok("extract"), ok("load", "extract")))
    assert(g.map(_.name) == Seq("etl.extract", "etl.load"))
    assert(g.last.upstream == Seq("etl.extract"))
    val r = Pipeline.run(ok("pre") +: g.map(t =>
      if (t.name == "etl.extract") t.copy(upstream = t.upstream :+ "pre") else t))
    assert(r.status("etl.load") == Success)
  }

  test("teardown runs even when work fails (C9)") {
    val torn = new java.util.concurrent.atomic.AtomicBoolean(false)
    val r = Pipeline.run(Pipeline.withTeardown(
      setup = ok("setup"),
      work = Seq(failT("work")),
      teardown = Task("teardown", _ => { torn.set(true); Value(()) })))
    assert(r.status("work") == Failed)
    assert(r.status("teardown") == Success && torn.get())
  }

  test("teardown is skipped when SETUP fails - nothing to tear down (C9)") {
    val torn = new java.util.concurrent.atomic.AtomicBoolean(false)
    val r = Pipeline.run(Pipeline.withTeardown(
      setup = failT("setup"),
      work = Seq(ok("work")),
      teardown = Task("teardown", _ => { torn.set(true); Value(()) })))
    assert(r.status("setup") == Failed)
    assert(r.status("teardown") != Success && !torn.get(),
      "teardown must not release resources setup never created")
  }

  test("withTeardown gate name never collides with a user task (C9)") {
    // A user task literally named "<teardown>.gate" must stay a
    // distinct node; the synthetic gate grows a suffix instead.
    val torn = new java.util.concurrent.atomic.AtomicBoolean(false)
    val tasks = Pipeline.withTeardown(
      setup = ok("setup"),
      work = Seq(ok("teardown.gate")),
      teardown = Task("teardown", _ => { torn.set(true); Value(()) }))
    assert(tasks.map(_.name).distinct.size == tasks.size,
      s"duplicate task names in ${tasks.map(_.name)}")
    assert(tasks.exists(_.name == "teardown.gate1"))
    val r = Pipeline.run(tasks)
    assert(r.status("teardown.gate") == Success)
    assert(r.status("teardown") == Success && torn.get())
  }

  test("listener sees every terminal state; SLA miss fires (C16/C17)") {
    val seen = mutable()
    val slow = Task("slow", _ => { Thread.sleep(30); Value(()) })
    val r = Pipeline.run(
      Seq(slow, failT("bad"), skipT("skipped")),
      listener = seen, slaMs = Map("slow" -> 1L))
    assert(r.status("slow") == Success)
    assert(seen.done.toSet == Set("slow" -> Success, "bad" -> Failed, "skipped" -> Skipped))
    assert(seen.slaMisses.contains("slow"))
  }

  private def mutable() = new Listener {
    val done = scala.collection.mutable.ArrayBuffer.empty[(String, Status)]
    val slaMisses = scala.collection.mutable.Set.empty[String]
    override def onTaskDone(task: String, status: Status, elapsedMs: Long): Unit =
      done += (task -> status)
    override def onSlaMiss(task: String, elapsedMs: Long, slaMs: Long): Unit =
      slaMisses += task
  }

  test("cycles are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(Seq(ok("a", "b"), ok("b", "a")))
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("a pipeline of Spark stages: branch picks the wide path (C1/C5)") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val tasks = Seq(
      Task("count", _ => Value(li.count())),
      Task("branch", ctx =>
        Branch(Set(if (ctx.xcom[Long]("count") > 1000) "wide" else "narrow")),
        Seq("count")),
      Task("wide", _ => Value(
        li.groupBy(col("l_returnflag")).count().collect().length), Seq("branch")),
      Task("narrow", _ => Value(li.limit(1).collect().length), Seq("branch")),
      Task("publish", ctx => Value(
        ctx.xcomOpt[Int]("wide").orElse(ctx.xcomOpt[Int]("narrow")).get),
        Seq("wide", "narrow"), NoneFailedMinOneSuccess))
    val r = Pipeline.run(tasks)
    assert(r.status("wide") == Success && r.status("narrow") == Skipped)
    assert(r.value[Int]("publish") == 3)
  }
}
