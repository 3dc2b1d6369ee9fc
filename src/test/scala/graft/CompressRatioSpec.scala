package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{CompressRatio, Text}

/** Compression-ratio native ([[functions.CompressRatio]]): the
  * two-tailed quality contract (boilerplate low, high-entropy high,
  * prose between), exact parity between the static helper, interpreted
  * eval, and the codegen projection path, and the empty/null edges.
  * Spec-graded because no oracle engine has deflate; determinism is
  * per-zlib-version (documented in the scaladoc).
  */
class CompressRatioSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private val repetitive = "spam " * 60
  private val prose = "the quick brown fox jumps over a lazy dog near still " +
    "water while birds sing softly above green meadows and rivers flow " +
    "gently past old stone bridges toward distant blue mountains under " +
    "golden evening light"
  // base64 of hash bytes ~ high-entropy printable text (64-symbol
  // alphabet; hex's 16 symbols would Huffman-compress 2×)
  private val garbage = (1 to 16).map(i =>
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"g$i".getBytes("UTF-8")))).mkString(" ")

  private def viaQuery(texts: String*): Seq[Double] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), Text.compressRatio(col("text")).as("r"))
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq

  test("two-tailed ordering: repetitive < prose < high-entropy") {
    val Seq(rep, pro, gar) = viaQuery(repetitive, prose, garbage)
    assert(rep < pro, s"repetitive ($rep) must compress below prose ($pro)")
    assert(pro < gar, s"prose ($pro) must compress below garbage ($gar)")
    assert(rep < 0.2 && gar > 0.7, s"tails not separated: $rep / $gar")
  }

  test("query path matches the static helper exactly (codegen parity)") {
    for (t <- Seq(repetitive, prose, garbage, "x")) {
      val direct = CompressRatio.ratio(UTF8String.fromString(t))
      assert(viaQuery(t).head === direct, s"parity broke for: $t")
    }
  }

  test("edges: empty string -> 1.0; null -> null; SQL name registered") {
    assert(viaQuery("").head === 1.0)
    val r = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(Text.compressRatio(col("text"))).collect()(0)
    assert(r.isNullAt(0))
    val viaSql = spark.sql(
      s"SELECT compress_ratio('$prose')").collect()(0).getDouble(0)
    assert(viaSql === CompressRatio.ratio(UTF8String.fromString(prose)))
  }

  test("deterministic across repeated evaluation and partitionings") {
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val a = d.select(col("doc_id"), Text.compressRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = d.repartition(7)
      .select(col("doc_id"), Text.compressRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }
}
