package graft

import graft.sources.SqlTemplates

/** Templated SQL-file loading (SURVEY.md §2.1 S11, §2.8 F2). */
class SqlTemplatesSpec extends SparkSpec {

  test("render substitutes placeholders") {
    assert(SqlTemplates.render("a=${x} b=${y}", Map("x" -> "1", "y" -> "2")) == "a=1 b=2")
  }

  test("render fails loudly on unrendered placeholder") {
    val e = intercept[IllegalArgumentException] {
      SqlTemplates.render("a=${x}", Map("y" -> "2"))
    }
    assert(e.getMessage.contains("${x}"))
  }

  test("classpath template loads and renders into a runnable query") {
    graft.sources.Tables.registerAll(spark, sfDir)
    val sql = SqlTemplates.render(SqlTemplates.load("top_nations.sql"),
      Map("min_acctbal" -> "0"))
    val rows = spark.sql(sql).collect()
    assert(rows.nonEmpty)
  }

  test("missing template is an error naming the resource") {
    val e = intercept[IllegalArgumentException](SqlTemplates.load("nope.sql"))
    assert(e.getMessage.contains("nope.sql"))
  }

  test("S7/S9: the reference's Orders DDL creates a table; console previews") {
    // dags/sql/sample.sql:20-24 — PRIMARY KEY is metadata-only in Spark,
    // so the DDL ports minus the constraint (documented in Sinks).
    graft.sources.Sinks.createTable(spark,
      """CREATE TABLE IF NOT EXISTS graft_orders_ddl (
        |  order_id INT, name STRING, description STRING)""".stripMargin)
    try {
      assert(spark.catalog.tableExists("graft_orders_ddl"))
      spark.sql(
        "INSERT INTO graft_orders_ddl VALUES (1, 'widget', 'a widget')")
      graft.sources.Sinks.console(spark.table("graft_orders_ddl"), n = 1)
      assert(spark.table("graft_orders_ddl").count() == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_orders_ddl")
  }
}
