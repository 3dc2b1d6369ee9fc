package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Parity contract for the native `positioned_concat` behind
  * [[Text.positionedConcat]]: bit-identical strings vs the composable
  * `array_join(transform(array_sort(collect_list(…))))` form on the
  * real corpus reassembly (the q152 span-corruption shape) and on
  * adversarial orderings — shuffled positions, long positions,
  * single-piece and empty groups. */
class PositionedConcatSpec extends SparkSpec {

  test("native == fold on the real corpus span-corruption reassembly") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
    val e = d.select(col("doc_id"),
        posexplode(Text.tokens(col("text"))).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        // a masked-span shape: every 7th position drops, every 11th
        // becomes a sentinel
        when(col("p0") % 7 === 3, lit(null))
          .when(col("p0") % 11 === 5, lit("<extra_id>"))
          .otherwise(col("tok")).as("piece"))
    val got = e.groupBy(col("doc_id")).agg(
        Text.positionedConcat(col("pos"), col("piece")).as("n"),
        Text.positionedConcatFold(col("pos"), col("piece")).as("f"))
      .filter(col("n") =!= col("f") ||
        col("n").isNull =!= col("f").isNull)
      .count()
    assert(got == 0L, s"$got corpus reassemblies disagree with the fold")
  }

  test("adversarial groups: shuffled, long positions, all-null, empty") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 5L, "e"), (1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"), (1L, 4L, "d"),
      (2L, 1000000007L, "z"), (2L, 2L, "y"),
      (3L, 1L, null), (3L, 2L, null),          // all pieces null → ""
      (4L, 1L, "only")
    ).toDF("id", "pos", "piece")
    val got = rows.groupBy(col("id")).agg(
        Text.positionedConcat(col("pos"), col("piece")).as("n"),
        Text.positionedConcatFold(col("pos"), col("piece")).as("f"))
      .orderBy(col("id")).collect()
    got.foreach(r => assert(r.getString(1) == r.getString(2),
      s"id=${r.getLong(0)}: native '${r.getString(1)}' != fold '${r.getString(2)}'"))
    assert(got.find(_.getLong(0) == 1L).get.getString(1) == "a b c d e")
    assert(got.find(_.getLong(0) == 3L).get.getString(1) == "")
  }
}
