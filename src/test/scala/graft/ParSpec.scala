package graft

import graft.util.{Par, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Par.spread]] — the scale-adaptive parallelism floor (r15): spreads a
  * small scan-rooted frame to the cluster's core count, leaves
  * already-parallel or already-repartitioned frames untouched, and never
  * changes the row multiset. */
class ParSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("spread repartitions a small scan to defaultParallelism") {
    val docs = Tables.documents(spark, Sf0001)
    assert(docs.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism) // the premise: 1-split input
    val got = Par.spread(docs, Seq(col("doc_id")))
    assert(got.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }

  test("spread preserves the row multiset exactly") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    val got = Par.spread(docs, Seq(col("doc_id")))
    assert(got.count() === docs.count())
    assert(got.exceptAll(docs).isEmpty && docs.exceptAll(got).isEmpty)
  }

  test("spread is identity when the input is already explicitly repartitioned") {
    val docs = Tables.documents(spark, Sf0001).repartition(2, col("doc_id"))
    val got = Par.spread(docs, Seq(col("doc_id")))
    assert(got.rdd.getNumPartitions === 2) // untouched — no second exchange
  }

  test("spread is identity when the scan can already feed every core") {
    // shrink the split size so the same file ESTIMATES to >= target splits
    // — the guard that keeps production (many-split) scans exchange-free
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024")
      val docs = Tables.documents(spark, Sf0001)
      val got = Par.spread(docs, Seq(col("doc_id")))
      assert(got.queryExecution.logical eq docs.queryExecution.logical)
    } finally spark.conf.set(key, old)
  }
}
