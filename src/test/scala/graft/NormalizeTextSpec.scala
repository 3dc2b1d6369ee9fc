package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Parity contract for the native `NormalizeText` kernel behind
  * [[Text.normalize]] / [[Text.tokens]]: bit-identical strings and
  * token arrays vs the composable
  * `lower(trim(regexp_replace(c, "\s+", " ")))` (+ `split(_, " ")`)
  * forms, on the real corpus and on a whitespace/Unicode zoo —
  * leading/trailing/interior runs, every Java `\s` class member,
  * empty and all-whitespace strings, multi-byte uppercase. */
class NormalizeTextSpec extends SparkSpec {

  private val zoo: Seq[String] = Seq(
    null,
    "",
    " ",
    "\t\n\f\r",                       // every \s member, nothing else
    "hello",
    "Hello  World",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\rmixed\f runs  here",
    "ÜBER Straße ÉTÉ İ",                    // multi-byte uppercase
    "a", "a b", "a  b", " a ", "a b",  // NBSP is NOT \s — must survive
    "Ωδή ΣΟΦΙΑ"                             // Greek sigma lowering
  )

  test("native == fold on the whitespace/Unicode zoo") {
    val s = spark
    import s.implicits._
    val got = zoo.map(Tuple1(_)).toDF("t").select(
        Text.normalize(col("t")).as("nN"),
        Text.normalizeFold(col("t")).as("nF"),
        Text.tokens(col("t")).as("tN"),
        Text.tokensFold(col("t")).as("tF"))
      .collect()
    got.zip(zoo).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1),
        s"normalize '${r.getString(0)}' != fold '${r.getString(1)}' on '$c'")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"tokens ${r.getSeq[String](2)} != fold ${r.getSeq[String](3)} on '$c'")
    }
  }

  test("native == fold on the real corpus (documents + events source)") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
    val mismatches = d.select(
        Text.normalize(col("text")).as("nN"),
        Text.normalizeFold(col("text")).as("nF"),
        Text.tokens(col("text")).as("tN"),
        Text.tokensFold(col("text")).as("tF"))
      .filter(col("nN") =!= col("nF") || col("tN") =!= col("tF"))
      .count()
    assert(mismatches == 0L, s"$mismatches corpus rows disagree with the folds")
  }

  test("kernels COMPILE under whole-stage codegen (no interpreted fallback)") {
    // Regression: TextNormalizer.apply once returned Any (Java Object),
    // so the generated `UTF8String v = ref.apply(c)` / `ArrayData v =
    // ...` failed Janino's assignment check and EVERY stage containing
    // tokens/normalize silently fell back to interpreted execution
    // (1,483 CompileExceptions in one bench run). fallback=false turns
    // that silent deoptimization into a test failure.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val d = graft.sources.Tables.load(spark, sfDir, "documents")
      val n = d.select(Text.normalize(col("text")).as("n"),
          Text.tokens(col("text")).as("t"))
        .filter(length(col("n")) >= 0 && size(col("t")) >= 0)
        .count()
      assert(n > 0L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("content hash (md5 over the native normalize) is fold-identical") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
    val mismatches = d.select(
        Text.contentHash(col("text")).as("hN"),
        md5(Text.normalizeFold(col("text"))).as("hF"))
      .filter(col("hN") =!= col("hF")).count()
    assert(mismatches == 0L, s"$mismatches content hashes disagree")
  }
}
