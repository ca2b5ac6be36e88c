package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (reused via getOrCreate — one JVM,
  * one SparkContext across the forked test run). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Smallest scale factor — specs verify semantics, not throughput. */
  val sfDir = "/root/testdata/sf0.001"
}
