package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared one-per-JVM SparkSession for the test suite (local[4], UTC,
  * AQE on — same Session factory the mains use, so tests exercise the
  * production configuration).
  */
object SparkSpec {
  lazy val spark: SparkSession = Session.builder("graft-test", 4).getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  /** Smallest test scale — ~6k lineitem rows; keeps the suite fast. */
  val sfDir = "/root/testdata/sf0.001"
}
