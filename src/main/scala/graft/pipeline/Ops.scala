package graft.pipeline

import org.apache.spark.sql.SparkSession
import scala.sys.process.{Process, ProcessLogger}
import graft.pipeline.Pipeline._

/** Remaining operator analogs (SURVEY.md §2.10 C2/C14, §2.9 T11/T12). */
object Ops {

  /** C2: BashOperator — run a shell command with env injection and
    * `${...}`-templated interpolation of run params
    * (`dags/tutorial.py:78-123`, `dags/example_bash_operator.py:44-74`).
    * Exit code 99 means SKIP (the reference's `skip_on_exit_code`);
    * other non-zero codes fail. Stdout (trimmed) becomes the XCom value
    * (the Bash-push pattern, `dags/example_xcom.py:76-79`).
    */
  def bashTask(name: String, command: String,
      env: Map[String, String] = Map.empty,
      upstream: Seq[String] = Nil,
      rule: TriggerRule = AllSuccess,
      skipOnExitCode: Int = 99): Task =
    Task(name, ctx => {
      // lenient render: ${param} substitutes from run params, but any
      // other ${VAR} is bash's own syntax for the SHELL to expand —
      // the strict unrendered-placeholder check would reject valid
      // shell commands like `echo ${HOME}`
      val rendered = graft.sources.SqlTemplates.render(command,
        ctx.params.map { case (k, v) => k -> String.valueOf(v) },
        strict = false)
      val out = new StringBuilder
      val proc = Process(Seq("bash", "-c", rendered), None,
        env.toSeq: _*)
      val code = proc ! ProcessLogger(line => { out ++= line; out += '\n' }, _ => ())
      if (code == skipOnExitCode) SelfSkip
      else if (code != 0) throw new RuntimeException(s"bash exited $code: $rendered")
      else Value(out.toString.trim)
    }, upstream, rule)

  /** C14: typed, validated run parameters — the reference's
    * JSON-Schema-validated Params
    * (`dags/example_params_ui_tutorial.py:44-248`) as a declarative
    * spec checked before the pipeline runs (fail fast, not mid-DAG). */
  final case class ParamSpec[A](name: String, default: Option[A] = None,
      validate: A => Boolean = (_: A) => true, description: String = "") {
    def resolve(given: Map[String, Any]): A = {
      val v = given.get(name).map(_.asInstanceOf[A]).orElse(default).getOrElse(
        throw new IllegalArgumentException(s"missing required param: $name"))
      require(validate(v), s"param $name failed validation: $v")
      v
    }
  }

  /** Validate every spec up front; returns the resolved param map. */
  def resolveParams(specs: Seq[ParamSpec[_]], given: Map[String, Any]): Map[String, Any] =
    specs.map(s => s.name -> s.resolve(given)).toMap

  /** T11: cross-pipeline dependency registry — the
    * ExternalTaskMarker/Sensor pair
    * (`dags/example_external_task_marker_dag.py:59-98`). Producers mark
    * task completion; consumers await it (with the sensor machinery's
    * timeout/soft-fail). Thread-safe: producer and consumer pipelines
    * run concurrently. */
  final class RunRegistry {
    private val done = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, String)]()
    /** Producer side (the marker). */
    def markComplete(pipeline: String, task: String): Unit = {
      done.add((pipeline, task)); ()
    }
    def isComplete(pipeline: String, task: String): Boolean =
      done.contains((pipeline, task))
    /** Consumer side (the external sensor) as a task body. */
    def awaitTask(pipeline: String, task: String, timeoutMs: Long,
        intervalMs: Long = 50L, softFail: Boolean = false): Context => Outcome =
      Sensors.asTask(timeoutMs, intervalMs, softFail)(
        () => if (isComplete(pipeline, task)) Some(s"$pipeline.$task") else None)
  }

  /** T12: trigger another pipeline with a payload
    * (`dags/example_trigger_controller_dag.py:38-42`): the payload
    * becomes the target's run params (`dag_run.conf`). */
  def triggerWithPayload(target: Seq[Task], payload: Map[String, Any],
      listener: Listener = new Listener {}): RunResult =
    Pipeline.run(target, params = payload, listener = listener)

  /** C11 analog: run a stage in an ISOLATED session. The reference
    * isolates per-task Python interpreters
    * (`dags/example_python_operator.py:96-148`) because tasks carry
    * conflicting deps; the single-JVM counterpart is
    * `SparkSession.newSession()` — the stage gets its OWN SQL conf,
    * temp-view catalog, UDF registry and current database over the
    * SHARED SparkContext (executors, caches, listeners stay pooled,
    * like the reference's shared worker host). Conf tweaks and temp
    * views made by the stage never leak into the caller's session;
    * jar-level isolation remains a deployment concern (`spark.jars`),
    * documented in [[Pipeline]]. */
  def withIsolatedSession[A](spark: SparkSession,
      conf: Map[String, String] = Map.empty)(
      f: SparkSession => A): A = {
    val s = spark.newSession()
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    f(s)
  }
}
