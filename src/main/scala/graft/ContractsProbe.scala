package graft

/** Standalone runner for [[Contracts.measure]] — the iteration loop
  * for contract thresholds without paying a full bench run: prints the
  * same JSON [[Bench]] writes as CONTRACTS.json. Usage:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ContractsProbe`.
  */
object ContractsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.builder("graft-contractsprobe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (rows, errs) = Contracts.measure(spark, sfDir)
    println(Contracts.toJson(rows, errs, sfDir))
    spark.stop()
  }
}
