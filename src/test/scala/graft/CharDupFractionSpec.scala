package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Parity contract for the native char_dup_fraction expression: it
  * must equal the composable two-fold form it replaced, value for
  * value, on every non-null-element shape (exact double equality —
  * both compute (Σlen − Σdistinct len)/Σlen in the same integer/double
  * steps), and the null-element/degenerate semantics are pinned
  * explicitly.
  */
class CharDupFractionSpec extends SparkSpec {

  test("native fraction == composable folds on adversarial arrays") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      Seq("a"),                                  // singleton → 0.0
      Seq("aaa", "aaa"),                         // full repeat → 0.5
      Seq("", "", "x"),                          // empty-string lines
      Seq("long boilerplate line", "x", "long boilerplate line"),
      Seq("ü", "ü", "u"),                        // numChars, not bytes
      (1 to 300).map(i => s"line ${i % 9}")      // many repeats
    )
    val got = cases.map(Tuple1(_)).toDF("ls")
      .select(Text.duplicateCharFraction(col("ls")).as("native"),
        Text.charDupFractionFold(col("ls")).as("fold"))
      .collect()
    got.zip(cases).foreach { case (r, c) =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native ${r.getDouble(0)} != fold ${r.getDouble(1)} on $c")
    }
  }

  test("SQL registration: char_dup_fraction(ls) resolves via graft.Session") {
    val s = spark
    import s.implicits._
    val r = Seq(Tuple1(Seq("aaa", "aaa"))).toDF("ls")
      .selectExpr("char_dup_fraction(ls) AS f").head().getDouble(0)
    assert(r == 0.5)
  }

  test("degenerate shapes: empty, all-empty-string, null elements") {
    val s = spark
    import s.implicits._
    val r = Seq(
      Tuple1(Seq.empty[String]),                 // no lines → 0.0
      Tuple1(Seq("", "")),                       // zero total chars → 0.0
      Tuple1(Seq("a", null, "a")),               // nulls contribute nothing
      Tuple1(Seq(null.asInstanceOf[String]))     // all-null → 0.0
    ).toDF("ls").select(Text.duplicateCharFraction(col("ls")).as("f"))
      .collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(0.0, 0.0, 0.5, 0.0), s"got $r")
  }

  test("NULL input array yields NULL, in both SQL (codegen) and interpreted paths") {
    val s = spark
    // SQL/codegen path: a registered-function caller passing NULL must
    // get a clean NULL, not an NPE (the nullable=false regression).
    val sqlRow = s.sql("SELECT char_dup_fraction(CAST(NULL AS ARRAY<STRING>)) AS f").head()
    assert(sqlRow.isNullAt(0), s"SQL path returned ${sqlRow.get(0)}")
    val interp = graft.functions.CharDupFraction(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))).eval(null)
    assert(interp == null, s"interpreted path returned $interp")
  }
}
