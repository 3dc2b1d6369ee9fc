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
}
