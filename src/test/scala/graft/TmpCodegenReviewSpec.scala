package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext}
import graft.functions.{NormalizeText, Text}

class TmpCodegenReviewSpec extends SparkSpec {

  test("NormalizeText generated code compiles under Janino") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("Hello  World")).toDF("t")
      .select(Text.normalize(col("t")).as("n"), Text.tokens(col("t")).as("tk"))
    // force codegen path check: compile the projection's generated code directly
    val plan = df.queryExecution.executedPlan
    println("PLAN:\n" + plan.treeString)
    // direct expression-level check: generate + janino-compile a projection
    val expr = NormalizeText(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      tokenize = false)
    val ctx = new CodegenContext
    val ev = expr.genCode(ctx)
    val codeBody = s"""
      public java.lang.Object generate(Object[] references) {
        return new TestGen(references);
      }
      class TestGen {
        private Object[] references;
        public TestGen(Object[] references) { this.references = references; }
        public Object apply(org.apache.spark.sql.catalyst.InternalRow i) {
          ${ctx.initMutableStates()}
          ${ev.code}
          return ${ev.isNull} ? null : ${ev.value};
        }
      }
    """
    val code = org.apache.spark.sql.catalyst.expressions.codegen.CodeFormatter
      .stripOverlappingComments(new org.apache.spark.sql.catalyst.expressions.codegen.CodeAndComment(codeBody, ctx.getPlaceHolderToComments()))
    try {
      CodeGenerator.compile(code)
      println("JANINO-COMPILE-OK")
    } catch {
      case e: Throwable =>
        println("JANINO-COMPILE-FAIL: " + e.getMessage.take(2000))
        throw e
    }
  }
}
