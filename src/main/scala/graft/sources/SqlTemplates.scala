package graft.sources

import scala.io.Source

/** Templated SQL-file loading (SURVEY.md §2.1 S11, §2.8 F2).
  *
  * The reference renders SQL files through Jinja templating before
  * execution (`dags/example_python_operator.py:70-75` loads
  * `sql/sample.sql` via `templates_dict`; `dags/tutorial.py:110-117`
  * interpolates `{{ params }}`). Here templates live on the classpath
  * under `sql/` and use `${name}` placeholders, substituted at
  * plan-build time (driver-side, never per-row — interpolation happens
  * once before Catalyst sees the query).
  */
object SqlTemplates {

  /** Load a SQL template from the classpath (`src/main/resources/sql/`). */
  def load(name: String): String = {
    val in = getClass.getResourceAsStream(s"/sql/$name")
    require(in != null, s"SQL template not found on classpath: sql/$name")
    try Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Substitute `${key}` placeholders. With `strict` (the SQL
    * default), unknown placeholders are an error — a silently
    * unrendered `${x}` would reach the SQL parser. `strict = false`
    * leaves unknown `${...}` untouched: the mode for bash commands,
    * where `${VAR}` is ordinary shell syntax the SHELL must expand,
    * not a template error. */
  def render(template: String, params: Map[String, String],
      strict: Boolean = true): String = {
    val out = params.foldLeft(template) { case (acc, (k, v)) =>
      acc.replace("$" + s"{$k}", v)
    }
    if (strict) {
      val leftover = "\\$\\{[^}]*\\}".r.findFirstIn(out)
      require(leftover.isEmpty, s"unrendered template placeholder: ${leftover.get}")
    }
    out
  }
}
