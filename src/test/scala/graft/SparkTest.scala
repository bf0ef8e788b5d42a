package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all specs (one JVM-wide session — specs
  * run in a single forked JVM, build.sbt `Test / fork := true`). */
object SparkTest {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTest {
  lazy val spark: SparkSession = SparkTest.spark
  /** Smallest driver fixture dir (500 docs / 500 vecs); read-only. */
  val Sf0001 = "/root/testdata/sf0.001"
}
