package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode bridge between graft's native Catalyst expressions and
  * the public `Column` API.
  *
  * Spark 4 made `Column` implementation-agnostic (it now wraps a
  * `ColumnNode`, shared with Connect) and moved the
  * `Expression` ↔ `Column` conversions behind `private[sql]`
  * `classic.ExpressionUtils`, so a library that constructs its own
  * Catalyst expressions needs this one-hop shim. It exists so the
  * `graft.functions` Column library can build
  * [[graft.functions.NgramRunStats]] / [[graft.functions.CosineFloat]]
  * columns DIRECTLY, without a `call_function` registry lookup that
  * silently couples a pure expression library to sessions built by
  * `graft.Session` (the registry entry only exists after its
  * `injectFunction` hook ran).
  *
  * Lives in `org.apache.spark.sql` solely for access; nothing in Spark
  * is modified or overridden.
  */
object GraftColumn {
  /** Wrap a Catalyst expression as a public Column. */
  def of(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a classic Column to its Catalyst expression. */
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rebind a DataFrame to another session over the same
    * SparkContext — the already-ANALYZED plan is reused, so no
    * re-resolution happens against the target session's (fresh)
    * catalog and temp-view references keep working. Lets an operator
    * run one action under session-scoped conf overrides (e.g.
    * [[graft.operators.Bloom]] raising the runtime bloom-filter
    * clamps) without mutating the caller's session. */
  def inSession(target: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(target.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)

  /** Register SQL functions directly on an EXISTING session's
    * function registry — the fallback for sessions `getOrCreate`
    * returned instead of created, where `withExtensions` hooks never
    * ran (`sessionState` is private[sql], hence this bridge).
    * Idempotent: already-present names are left untouched. */
  def ensureFunctions(spark: SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[org.apache.spark.sql.catalyst.expressions.Expression] => Expression)]): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
