package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantize

/** Parity contract for the native SQ8 kernels behind
  * [[Quantize.codes]] / [[Quantize.dequantize]]: bit-identical output
  * vs the composable lambda forms they replaced, on the real
  * embeddings corpus and on adversarial fixtures — scale-0 constant
  * vectors (all-zeros arm, null slots included), null elements
  * (per-element propagation, never array-level), empty vectors, and
  * the fused float-output decode. */
class Sq8KernelsSpec extends SparkSpec {

  test("encode/decode native == fold on the real embeddings corpus") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("embedding").as("vec"))
      .select(col("vec"), array_min(col("vec")).cast("double").as("mn"))
      .withColumn("s", Quantize.scale(col("vec")))
    val staged = emb
      .withColumn("cN", Quantize.codes(col("vec"), col("mn"), col("s")))
      .withColumn("cF", Quantize.codesFold(col("vec"), col("mn"), col("s")))
    val encMismatch = staged.filter(col("cN") =!= col("cF")).count()
    assert(encMismatch == 0L, s"$encMismatch encode rows disagree")
    val dec = staged
      .withColumn("dN", Quantize.dequantize(col("cN"), col("mn"), col("s")))
      .withColumn("dF", Quantize.dequantizeFold(col("cN"), col("mn"), col("s")))
      .withColumn("fN", Quantize.dequantizeF(col("cN"), col("mn"), col("s")))
      .withColumn("fF", transform(
        Quantize.dequantizeFold(col("cN"), col("mn"), col("s")),
        x => x.cast("float")))
    val decMismatch = dec.filter(col("dN") =!= col("dF") ||
      col("fN") =!= col("fF")).count()
    assert(decMismatch == 0L, s"$decMismatch decode rows disagree")
  }

  test("adversarial fixtures: scale 0, null elements, empty") {
    val s = spark
    import s.implicits._
    val cases: Seq[Seq[java.lang.Double]] = Seq(
      Seq(1.0, 1.0, 1.0).map(Double.box),          // constant → scale 0
      Seq(0.25, null, 7.5).map(x =>
        if (x == null) null else Double.box(x.asInstanceOf[Double])), // null slot
      Seq.empty,                                    // empty vector
      Seq(-3.5, 0.0, 251.499, 251.5).map(Double.box)) // HALF_UP edges
    val df = cases.map(Tuple1(_)).toDF("vec")
      .withColumn("mn", array_min(col("vec")).cast("double"))
      .withColumn("s", Quantize.scale(col("vec")))
    val rows = df
      .select(
        Quantize.codes(col("vec"), col("mn"), col("s")).as("cN"),
        Quantize.codesFold(col("vec"), col("mn"), col("s")).as("cF"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"native ${r.getSeq[Any](0)} != fold ${r.getSeq[Any](1)} on $c")
    }
    // scale-0 arm zeroes null slots too (the constant lambda never
    // reads its element)
    val z = Seq(Tuple1(Seq[java.lang.Double](Double.box(2.0), null,
        Double.box(2.0)))).toDF("vec")
      .select(Quantize.codes(col("vec"), lit(2.0), lit(0.0)).as("cN"),
        Quantize.codesFold(col("vec"), lit(2.0), lit(0.0)).as("cF"))
      .head()
    assert(z.getSeq[Any](0) == Seq(0, 0, 0) && z.getSeq[Any](0) == z.getSeq[Any](1))
  }

  test("null mn/s null ELEMENTS, not the array (lambda propagation)") {
    val s = spark
    import s.implicits._
    val r = Seq(Tuple1(Seq(1.0, 2.0))).toDF("vec")
      .select(
        Quantize.codes(col("vec"), lit(null).cast("double"),
          lit(1.0)).as("cN"),
        Quantize.codesFold(col("vec"), lit(null).cast("double"),
          lit(1.0)).as("cF"),
        Quantize.dequantize(array(lit(1), lit(2)),
          lit(null).cast("double"), lit(1.0)).as("dN"),
        Quantize.dequantizeFold(array(lit(1), lit(2)),
          lit(null).cast("double"), lit(1.0)).as("dF"))
      .head()
    assert(r.getSeq[Any](0) == Seq(null, null) &&
      r.getSeq[Any](0) == r.getSeq[Any](1))
    assert(r.getSeq[Any](2) == Seq(null, null) &&
      r.getSeq[Any](2) == r.getSeq[Any](3))
  }
}
