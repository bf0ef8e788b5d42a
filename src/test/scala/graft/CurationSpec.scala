package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Keyword extraction and sequence packing semantics. */
class CurationSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("topTerms: tf-idf ranks distinctive terms above common ones") {
    val docs = Seq(
      (1L, "spark spark catalyst common"),
      (2L, "duck duck arrow common"),
      (3L, "iceberg delta lake common"),
    ).toDF("id", "text")
    val got = Curation.topTerms(docs, "id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // 'common' has df=3 → idf=ln(1)=0 → never in top-2 of any doc
    assert(!got.exists(_._2 == "common"))
    // doc 1's top term is its tf=2 distinctive term
    assert(got.collect { case (1L, t, 1) => t }.head === "spark")
    // every doc gets exactly k rows (enough distinct terms exist)
    assert(got.groupBy(_._1).values.forall(_.length == 2))
  }

  test("packSequences: greedy packing respects order, never splits a doc") {
    val docs = Seq(
      ("s1", 1L, "a b c"),        // 3 tokens, cum_excl 0  → seq 0, off 0
      ("s1", 2L, "d e f g"),      // 4 tokens, cum_excl 3  → seq 0, off 3
      ("s1", 3L, "h i"),          // 2 tokens, cum_excl 7  → seq 1, off 2  (budget 5)
      ("s2", 9L, "x y z w v u"),  // separate shard restarts at seq 0
    ).toDF("source", "id", "text")
    val got = Curation.packSequences(docs, "source", "id", "text", tokenBudget = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      ("s1", 1L, 3L, 0L, 0L),
      ("s1", 2L, 4L, 0L, 3L),
      ("s1", 3L, 2L, 1L, 2L),
      ("s2", 9L, 6L, 0L, 0L),
    ))
  }

  test("salted two-phase aggregation equals direct aggregation (skew path)") {
    import graft.util.{Skew, Tables}
    val ev = Tables.events(spark, Sf0001)
    val direct = ev.groupBy("event_type")
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(ev, "event_type", "value", col("event_id"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
    // phase-1 spreads each key across multiple reducers
    val plan = Skew.saltedSumCount(ev, "event_type", "value", col("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "partial agg must group by the salt")
  }

  test("packSequences window is partitioned (no single global sort partition)") {
    val docs = Seq(("s1", 1L, "a"), ("s2", 2L, "b")).toDF("source", "id", "text")
    val plan = Curation.packSequences(docs, "source", "id", "text", 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(group"),
      s"window must hash-partition by group, not sort globally:\n$plan")
  }
}
