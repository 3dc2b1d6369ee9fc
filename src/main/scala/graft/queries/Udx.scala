package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** User-defined function surface (SURVEY.md §2.11 + §2.4 A2/A3): the
  * reference's arbitrary-callable / custom-operator extension points,
  * each exercised through the engine and oracle-checked.
  *
  * Ordering of preference (documented for users): native `Column`
  * functions > custom Catalyst `Expression` (q29) > typed `Aggregator`
  * (q26) > `udf` (q27) > typed `flatMap` (q28). The udf/flatMap rows
  * exist because the capability must exist; the scaladoc on each warns
  * that they are opaque to Catalyst (no pushdown through them).
  */
object Udx {

  /** A2/A3: the reference's `SumItOperator`
    * (`dags/example_dynamic_task_mapping_with_no_taskflow_operators.py:39-51`)
    * — a custom reducer over mapped partials — as a typed
    * [[Aggregator]]. Long arithmetic: exact, order-independent,
    * ANSI-checked for overflow. */
  object SumIt extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = Math.addExact(b, a)
    def merge(x: Long, y: Long): Long = Math.addExact(x, y)
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- A2/A3: dynamic-mapping map (add one) + custom reduce -----
    QueryDef(
      "q26_udaf_sumit",
      (spark, dir) => {
        val sumIt = udaf(SumIt)
        val li = Tables.load(spark, dir, "lineitem")
        li.select(col("l_returnflag"),
            (floor(col("l_quantity")).cast("long") + 1L).as("mapped"))
          .groupBy(col("l_returnflag"))
          .agg(sumIt(col("mapped")).as("sum_it"), count(lit(1)).as("n"))
      },
      Some("""
        SELECT l_returnflag,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT) + 1) AS BIGINT) AS sum_it,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag""")),

    // ----- Scala udf path (ScalaUDF expression) -----
    QueryDef(
      "q27_udf_priority",
      (spark, dir) => {
        // Deliberately a udf to exercise the surface; the same logic as
        // a native expression would be split(col,"-")(0).cast("int") —
        // prefer that in real pipelines (udfs block pushdown/codegen).
        val priorityNum = udf((s: String) => s.split("-")(0).trim.toInt)
        val o = Tables.load(spark, dir, "orders")
        o.select(priorityNum(col("o_orderpriority")).as("prio"))
          .groupBy(col("prio")).agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(trim(string_split(o_orderpriority, '-')[1]) AS INT) AS prio,
               count(*) AS n
        FROM orders
        GROUP BY prio""")),

    // ----- Generator / UDTF: typed flatMap, one row per token -----
    QueryDef(
      "q28_udtf_tokens",
      (spark, dir) => {
        import spark.implicits._
        val docs = Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
        docs.filter(_._1 < 50)
          .flatMap { case (id, text) =>
            text.trim.toLowerCase.split("\\s+").toIndexedSeq
              .zipWithIndex.map { case (tok, i) => (id, i + 1, tok) }
          }
          .toDF("doc_id", "pos", "tok")
      },
      Some("""
        SELECT doc_id,
               unnest([{'pos': i, 'tok': w[i]} for i in range(1, len(w) + 1)],
                      recursive := true)
        FROM (SELECT doc_id,
                     string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
              FROM documents WHERE doc_id < 50)"""),
      // bench = false: typed-Dataset flatMap demo pinned to a 50-doc
      // subset (deserialization path on purpose); the codegen'd token
      // explode at scale is q47/q53's generator shape, benched there
      bench = false),

    // ----- Custom Catalyst Expression with codegen: cosine_f -----
    QueryDef(
      "q29_custom_expr_cosine",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings").filter(col("vec_id") < 40)
        val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
        a.join(b, col("a") < col("b"))
          .select(col("a"), col("b"),
            round(call_function("cosine_f", col("va"), col("vb")), 6).as("cos"))
      },
      Some("""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec
                   FROM embeddings WHERE vec_id < 40)
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(CASE WHEN list_dot_product(a.vec, a.vec) = 0
                            OR list_dot_product(b.vec, b.vec) = 0 THEN 0.0
                          ELSE list_dot_product(a.vec, b.vec)
                               / (sqrt(list_dot_product(a.vec, a.vec))
                                  * sqrt(list_dot_product(b.vec, b.vec))) END, 6) AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id"""),
      // bench = false: 40-vector all-pairs parity check for the codegen
      // Expression (bit-equality in SimilaritySpec); cosine_f's hot-path
      // cost is measured where it runs at scale — q52's IVF probe
      bench = false)
  )
}
