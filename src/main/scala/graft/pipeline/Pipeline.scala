package graft.pipeline

import scala.collection.mutable
import scala.util.control.NonFatal

/** Pipeline DSL (SURVEY.md §2.10): the reference's orchestration
  * semantics — task DAGs, trigger rules, branching, short-circuit,
  * dynamic mapping, retries, XCom-style dataflow — re-expressed as
  * driver-side control flow around Spark stages.
  *
  * Division of labor (SURVEY §4): data parallelism lives INSIDE each
  * task (a task typically builds/executes a DataFrame plan on the
  * cluster); the DSL only decides WHICH tasks run and in what order.
  * Nothing here touches Catalyst — per the survey, the orchestration
  * layer is the one genuinely custom piece, and trigger-rule × skip
  * propagation (C7, `dags/example_skip_dag.py:47-73`,
  * `dags/example_nested_branch_dag.py:41-57`) is its hard part; the
  * truth table is ported faithfully and property-tested.
  *
  * Partially-N/A rows (SURVEY §2.10):
  *   - C11 (virtualenv / external-python isolation,
  *     `dags/example_python_operator.py:96-148`): the reference isolates
  *     per-task Python interpreters because tasks are arbitrary Python
  *     with conflicting deps. The single-JVM counterpart IS implemented:
  *     [[Ops.withIsolatedSession]] (per-stage `SparkSession.newSession`
  *     — own SQL conf / temp views / UDFs over the shared context;
  *     OpsSpec proves no leakage). Jar/classpath-level isolation stays
  *     a deployment concern (`spark.jars`) — that part by design.
  *   - C12 (Kubernetes pod overrides — volumes, sidecars, resources,
  *     affinity, `dags/example_kubernetes_executor.py:55-239`): per-task
  *     placement is the cluster manager's job in Spark
  *     (`spark.executor.*`, dynamic allocation, scheduler pools), i.e.
  *     deployment configuration, not engine code. The per-task knob the
  *     engine does own is scheduler-pool assignment
  *     (`sc.setLocalProperty("spark.scheduler.pool", …)`) — config, per
  *     SURVEY §2.10 C18.
  */
object Pipeline {

  /** Terminal task states, matching the reference scheduler's
    * (success / failed / upstream_failed / skipped). */
  sealed trait Status
  case object Success extends Status
  case object Failed extends Status
  case object UpstreamFailed extends Status
  case object Skipped extends Status

  /** Fan-in semantics under failure/skip (C7). `Failed` and
    * `UpstreamFailed` both count as failed for rule evaluation —
    * exactly the reference's bookkeeping. */
  sealed trait TriggerRule
  case object AllSuccess extends TriggerRule // default
  case object AllFailed extends TriggerRule
  case object AllDone extends TriggerRule
  case object OneSuccess extends TriggerRule
  case object OneFailed extends TriggerRule
  case object NoneFailed extends TriggerRule
  case object NoneFailedMinOneSuccess extends TriggerRule
  case object NoneSkipped extends TriggerRule
  case object Always extends TriggerRule

  /** Decide whether a task with `rule` runs given its upstream states;
    * when it doesn't run, decide what state it lands in. Left = the
    * non-run state; Right(()) = run it.
    *
    * Ported truth table: unsatisfied AllSuccess/NoneFailed variants
    * caused by failure → UpstreamFailed; unsatisfied because of skips
    * (or unsatisfied One-/All-Failed/NoneSkipped conditions) → Skipped.
    * Tasks with no upstream always run.
    */
  def evaluate(rule: TriggerRule, up: Seq[Status]): Either[Status, Unit] = {
    if (up.isEmpty) return Right(())
    val anyFailed = up.exists(s => s == Failed || s == UpstreamFailed)
    val anySkipped = up.contains(Skipped)
    val anySuccess = up.contains(Success)
    val allSuccess = up.forall(_ == Success)
    val allFailed = up.forall(s => s == Failed || s == UpstreamFailed)
    rule match {
      case AllSuccess =>
        if (allSuccess) Right(())
        else if (anyFailed) Left(UpstreamFailed)
        else Left(Skipped)
      case AllFailed =>
        if (allFailed) Right(()) else Left(Skipped)
      case AllDone => Right(())
      case OneSuccess =>
        if (anySuccess) Right(()) else Left(Skipped)
      case OneFailed =>
        if (anyFailed) Right(()) else Left(Skipped)
      case NoneFailed =>
        if (!anyFailed) Right(()) else Left(UpstreamFailed)
      case NoneFailedMinOneSuccess =>
        if (anyFailed) Left(UpstreamFailed)
        else if (anySuccess) Right(())
        else Left(Skipped)
      case NoneSkipped =>
        if (!anySkipped) Right(()) else Left(Skipped)
      case Always => Right(())
    }
  }

  /** Runtime context a task body sees: upstream results by task name
    * (the XCom channel, C13 — plain values, no serialization boundary)
    * and the run's typed parameters (C14). */
  final class Context(
      results: collection.Map[String, Any],
      val params: Map[String, Any]) {
    /** Pull an upstream task's return value (XCom pull). */
    def xcom[A](task: String): A = results(task).asInstanceOf[A]
    def xcomOpt[A](task: String): Option[A] =
      results.get(task).map(_.asInstanceOf[A])
  }

  /** What a task body can signal about downstream control flow. */
  sealed trait Outcome
  /** Plain value: task succeeded, value becomes its XCom. */
  final case class Value(v: Any) extends Outcome
  /** Branch decision (C5): only the named direct downstreams stay;
    * every other direct downstream is skipped. */
  final case class Branch(chosen: Set[String], v: Any = ()) extends Outcome
  /** Task skips itself (the reference's AirflowSkipException,
    * `dags/example_skip_dag.py:38-44`); downstream rules see Skipped. */
  case object SelfSkip extends Outcome
  /** Short-circuit (C6): condition false → skip downstream. With
    * `ignoreDownstreamTriggerRules` (the reference default) the WHOLE
    * transitive downstream cone is skipped; otherwise only direct
    * downstreams, and their trigger rules decide the rest. */
  final case class ShortCircuit(proceed: Boolean, ignoreDownstreamTriggerRules: Boolean = true)
    extends Outcome

  /** One node (C1/C10). `retries`/`retryDelayMs` mirror C15. Metadata
    * fields (C19) carry no execution semantics. */
  final case class Task(
      name: String,
      fn: Context => Outcome,
      upstream: Seq[String] = Nil,
      rule: TriggerRule = AllSuccess,
      retries: Int = 0,
      retryDelayMs: Long = 0L,
      displayName: String = "",
      doc: String = "")

  /** Lifecycle listener (C17) + SLA hook (C16). */
  trait Listener {
    def onTaskDone(task: String, status: Status, elapsedMs: Long): Unit = ()
    def onSlaMiss(task: String, elapsedMs: Long, slaMs: Long): Unit = ()
  }

  final case class RunResult(
      statuses: Map[String, Status],
      results: Map[String, Any]) {
    def status(t: String): Status = statuses(t)
    def value[A](t: String): A = results(t).asInstanceOf[A]
  }

  /** Execute the DAG: topological order, trigger-rule gating, retry
    * loop, branch/short-circuit skip propagation. Deterministic: ties
    * in the topological order resolve by declaration order. */
  def run(tasks: Seq[Task],
      params: Map[String, Any] = Map.empty,
      listener: Listener = new Listener {},
      slaMs: Map[String, Long] = Map.empty): RunResult = {
    val byName = tasks.map(t => t.name -> t).toMap
    require(byName.size == tasks.size, "duplicate task names")
    tasks.foreach(t => t.upstream.foreach(u =>
      require(byName.contains(u), s"${t.name}: unknown upstream $u")))

    // Kahn topological sort, declaration order as tiebreak.
    val order = mutable.ArrayBuffer.empty[Task]
    val pending = mutable.LinkedHashSet(tasks: _*)
    while (pending.nonEmpty) {
      val ready = pending.find(t => t.upstream.forall(u => order.exists(_.name == u)))
        .getOrElse(throw new IllegalArgumentException(
          s"cycle among: ${pending.map(_.name).mkString(",")}"))
      order += ready; pending -= ready
    }

    val status = mutable.Map.empty[String, Status]
    val results = mutable.Map.empty[String, Any]
    // Tasks condemned by a branch decision or short-circuit.
    val forcedSkip = mutable.Set.empty[String]

    def downstreamOf(name: String): Seq[Task] =
      order.filter(_.upstream.contains(name)).toSeq

    def transitiveDownstream(name: String): Set[String] = {
      val out = mutable.Set.empty[String]
      var frontier = downstreamOf(name).map(_.name).toSet
      while (frontier.nonEmpty) {
        out ++= frontier
        frontier = frontier.flatMap(n => downstreamOf(n).map(_.name)) -- out
      }
      out.toSet
    }

    order.foreach { t =>
      val decision =
        if (forcedSkip(t.name)) Left(Skipped)
        else evaluate(t.rule, t.upstream.map(status))
      decision match {
        case Left(s) =>
          status(t.name) = s
          listener.onTaskDone(t.name, s, 0L)
        case Right(()) =>
          val t0 = System.nanoTime()
          var attempt = 0
          var done = false
          while (!done) {
            try {
              val ctx = new Context(results, params)
              t.fn(ctx) match {
                case Value(v) =>
                  results(t.name) = v; status(t.name) = Success
                case SelfSkip =>
                  status(t.name) = Skipped
                case Branch(chosen, v) =>
                  results(t.name) = v; status(t.name) = Success
                  downstreamOf(t.name).filterNot(d => chosen(d.name))
                    .foreach(d => forcedSkip += d.name)
                case ShortCircuit(proceed, ignoreRules) =>
                  results(t.name) = proceed; status(t.name) = Success
                  if (!proceed) {
                    val cone =
                      if (ignoreRules) transitiveDownstream(t.name)
                      else downstreamOf(t.name).map(_.name).toSet
                    forcedSkip ++= cone
                  }
              }
              done = true
            } catch {
              case NonFatal(e) =>
                attempt += 1
                if (attempt > t.retries) {
                  status(t.name) = Failed
                  results(t.name) = e
                  done = true
                } else if (t.retryDelayMs > 0) Thread.sleep(t.retryDelayMs)
            }
          }
          val elapsedMs = (System.nanoTime() - t0) / 1000000L
          listener.onTaskDone(t.name, status(t.name), elapsedMs)
          slaMs.get(t.name).foreach(sla =>
            if (elapsedMs > sla) listener.onSlaMiss(t.name, elapsedMs, sla))
      }
    }
    RunResult(status.toMap, results.toMap)
  }

  /** `chain(a, b, c)` wiring helper (C20): returns the tasks with each
    * linked to the previous one. */
  def chain(tasks: Task*): Seq[Task] =
    tasks.head +: tasks.sliding(2).collect {
      case Seq(up, down) => down.copy(upstream = down.upstream :+ up.name)
    }.toSeq

  /** Task-group composition (C8): namespace a sub-DAG with `group.`
    * prefix; external edges attach to the group's roots/leaves. */
  def group(prefix: String, tasks: Seq[Task]): Seq[Task] = {
    val names = tasks.map(_.name).toSet
    tasks.map(t => t.copy(
      name = s"$prefix.${t.name}",
      upstream = t.upstream.map(u => if (names(u)) s"$prefix.$u" else u)))
  }

  /** Setup/teardown (C9), with the standard semantics: `work` runs
    * gated on `setup` (AllSuccess); `teardown` runs iff SETUP
    * SUCCEEDED — after all work resolved, even if work failed — and is
    * skipped when setup itself failed (there is nothing to tear down;
    * a blanket AllDone teardown would try to release resources setup
    * never created). Expressed with the existing rule vocabulary via a
    * synthetic AllDone gate over the work leaves: the gate resolves
    * once work settles either way, and teardown is AllSuccess over
    * {gate, setup}. */
  def withTeardown(setup: Task, work: Seq[Task], teardown: Task): Seq[Task] = {
    val leaves = work.filterNot(w => work.exists(_.upstream.contains(w.name)))
    val roots = work.filter(w => !work.exists(o => w.upstream.contains(o.name)))
    val wired = work.map(w =>
      if (roots.exists(_.name == w.name)) w.copy(upstream = w.upstream :+ setup.name) else w)
    // Fresh gate name (the AsOf/Ranges idiom): a user task literally
    // named "<teardown>.gate" must not silently merge with the
    // synthetic gate in the task graph.
    val taken = (Seq(setup, teardown) ++ work).map(_.name).toSet
    val gateName = Iterator.from(0)
      .map(i => if (i == 0) s"${teardown.name}.gate" else s"${teardown.name}.gate$i")
      .find(!taken(_)).get
    val gate = Task(gateName, _ => Value(()),
      upstream = leaves.map(_.name), rule = AllDone)
    (setup +: wired) ++ Seq(gate, teardown.copy(
      upstream = teardown.upstream ++ Seq(gate.name, setup.name),
      rule = AllSuccess))
  }

  /** Dynamic mapping (C4): expand a function over a runtime list and
    * reduce — the `expand`/`sum_it` pattern. Items run inside ONE task
    * here because per-item heavyweight work belongs in the DATA plane
    * (a Dataset of work items + flatMap), not the control plane. */
  def mapReduce[A, B, C](name: String, items: Context => Seq[A],
      mapFn: A => B, reduceFn: Seq[B] => C,
      upstream: Seq[String] = Nil): Task =
    Task(name, ctx => Value(reduceFn(items(ctx).map(mapFn))), upstream)
}
