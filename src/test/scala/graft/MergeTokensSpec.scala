package graft

import org.apache.spark.sql.functions._
import graft.operators.Collocations

/** The ninth native expression: one-pass hash-set phrase merge
  * (q113's rewrite step). Parity vs the retained interpreted
  * `aggregate`-HOF spelling on randomized corpora, null-slot and
  * empty-set semantics, SQL registration, serialization round-trip. */
class MergeTokensSpec extends SparkSpec {

  private def viaNative(toks: Seq[Seq[String]], phrases: Seq[String]): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    toks.toDF("toks")
      .select(Collocations.mergePhrases(col("toks"), phrases).as("m"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  private def viaComposable(toks: Seq[Seq[String]], phrases: Seq[String]): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    toks.toDF("toks")
      .select(Collocations.mergePhrasesComposable(col("toks"), phrases).as("m"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  test("parity with the composable HOF spelling on a randomized corpus") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("new", "york", "times", "the", "cat", "a_b", "c")
    val phrases = Seq("new york", "york times", "a_b c", "the cat")
    val corpus = Seq.fill(60)(Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))))
    assert(viaNative(corpus, phrases) == viaComposable(corpus, phrases))
  }

  test("greedy left-to-right, non-cascading within a pass, chained merges across positions") {
    // "aa aa aa": (aa aa) merges the first two; the merged "aa_aa" is
    // only reconsidered if "aa_aa aa" is itself a phrase — it isn't.
    assert(viaNative(Seq(Seq("aa", "aa", "aa")), Seq("aa aa")) ==
      Seq(Seq("aa_aa", "aa")))
    // but with the second-pass phrase present, the chain fires
    assert(viaNative(Seq(Seq("aa", "aa", "aa")), Seq("aa aa", "aa_aa aa")) ==
      Seq(Seq("aa_aa_aa")))
    assert(viaNative(Seq(Seq.empty), Seq("a b")) == Seq(Seq.empty))
  }

  test("null token slots never match and pass through (composable parity)") {
    val s = spark
    import s.implicits._
    val df = Seq(1).toDF("i").select(
      array(lit("new"), lit(null).cast("string"), lit("new"), lit("york"))
        .as("toks"))
    val nat = df.select(Collocations.mergePhrases(col("toks"), Seq("new york")))
      .head().getSeq[String](0).toSeq
    val comp = df.select(Collocations.mergePhrasesComposable(col("toks"), Seq("new york")))
      .head().getSeq[String](0).toSeq
    assert(nat == Seq("new", null, "new_york"))
    assert(nat == comp)
  }

  test("empty phrase set is a pass-through; SQL registration resolves") {
    assert(viaNative(Seq(Seq("x", "y")), Nil) == Seq(Seq("x", "y")))
    // the bare array() literal (ARRAY<VOID>) is the SQL spelling of an
    // empty phrase set and must pass the literal gate
    val viaEmptySql = spark.sql(
      "SELECT merge_tokens(array('a','b'), array()) AS m")
      .head().getSeq[String](0).toSeq
    assert(viaEmptySql == Seq("a", "b"))
    val viaSql = spark.sql(
      "SELECT merge_tokens(array('new','york','co'), array('new york')) AS m")
      .head().getSeq[String](0).toSeq
    assert(viaSql == Seq("new_york", "co"))
    // non-string phrase literal dies with the friendly message, not a MatchError
    val e = intercept[RuntimeException](
      spark.sql("SELECT merge_tokens(array('a'), array(1, 2))").collect())
    assert(e.getMessage.contains("string-array literal"))
  }

  test("survives serialization (the transient set rebuilds)") {
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(
      new functions.TokenMerger(Array("a b")))
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[functions.TokenMerger]
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[AnyRef](org.apache.spark.unsafe.types.UTF8String.fromString("a"),
        org.apache.spark.unsafe.types.UTF8String.fromString("b")))
    assert(back.merge(arr).numElements() == 1)
  }
}
