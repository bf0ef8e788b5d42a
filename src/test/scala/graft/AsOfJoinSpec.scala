package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics: ≤ visibility, tie-breaks, missing-right nulls,
  * key isolation. */
class AsOfJoinSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def t(s: Int) = new Timestamp(1000L * s)

  test("each left row gets the greatest right (time, tie) ≤ its time, per key") {
    val left = Seq(
      (10L, 1L, t(100)), // after both clicks of key 1
      (11L, 1L, t(50)),  // exactly at a click time → that click visible
      (12L, 1L, t(10)),  // before any click → nulls
      (13L, 2L, t(100)), // other key: isolated
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, t(50), 100L, 1.0),
      (1L, t(50), 101L, 2.0), // same ts: greater id wins
      (1L, t(80), 102L, 3.0),
      (2L, t(90), 200L, 9.0),
    ).toDF("user_id", "click_ts", "click_id", "value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "click_ts", "click_id", Seq("value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some((r.getLong(4), r.getDouble(5))))).toMap
    assert(got(10L) === Some((102L, 3.0))) // latest at t80
    assert(got(11L) === Some((101L, 2.0))) // t50 visible; id tie → 101
    assert(got(12L) === None)              // nothing precedes
    assert(got(13L) === Some((200L, 9.0))) // key-isolated
  }

  test("plan shape: one hash shuffle on the key, no range-join pair blowup") {
    val left = Seq((1L, 1L, t(1))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, t(1), 2L, 0.5)).toDF("user_id", "click_ts", "click_id", "value")
    val plan = AsOfJoin.asOf(left, right, "user_id", "ts", "click_ts", "click_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n$plan")
    assert(plan.contains("hashpartitioning(__key"), s"expected key shuffle in:\n$plan")
  }
}
