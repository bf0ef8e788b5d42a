package graft

import graft.util.{Bucketing, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: both sides bucketed+sorted on the join key →
  * SortMergeJoin with zero Exchange (the shuffle-free join layout). */
class BucketingSpec extends AnyFunSuite with SparkTest {

  test("join of two tables bucketed on the key plans without any Exchange") {
    val docs = Tables.documents(spark, Sf0001)
    val embs = Tables.embeddings(spark, Sf0001)
    Bucketing.writeBucketed(docs, buckets = 4, keyCol = "doc_id", table = "docs_bucketed")
    Bucketing.writeBucketed(embs.withColumnRenamed("vec_id", "doc_id"),
      buckets = 4, keyCol = "doc_id", table = "embs_bucketed")
    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick SortMergeJoin
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readTable(spark, "docs_bucketed")
        .join(Bucketing.readTable(spark, "embs_bucketed"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === embs.count()) // every vector has its doc
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
  }
}
