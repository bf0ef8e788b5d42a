package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel / cohort-retention semantics: ordered (strictly-after) step
  * attribution, non-increasing conversion, cohort assignment by first
  * activity, once-per-period counting. */
class EventAnalyticsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
      .drop("s")

  test("funnelTimes: strictly-after ordering; out-of-order steps do not count") {
    val events = ev(
      // user 1: full funnel in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: clicked BEFORE the first view — click must not count,
      // and therefore neither can the purchase (it precedes no valid click)
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00"),
      // user 3: view then click, no purchase
      (3L, "view", "2024-01-02 08:00:00"),
      (3L, "click", "2024-01-02 09:00:00"),
      // user 4: never viewed — not even in the relation
      (4L, "purchase", "2024-01-01 10:00:00"),
      // user 5: second click after the view is the one that counts
      (5L, "click", "2024-01-03 07:00:00"),
      (5L, "view", "2024-01-03 08:00:00"),
      (5L, "click", "2024-01-03 09:00:00"))
    val t = EventAnalytics.funnelTimes(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user")
      .select(col("user"), col("t0").cast("string"),
        col("t1").cast("string"), col("t2").cast("string"))
      .as[(Long, String, String, String)].collect().toSeq
    assert(t === Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-01 12:00:00"),
      (2L, "2024-01-01 10:00:00", null, null),
      (3L, "2024-01-02 08:00:00", "2024-01-02 09:00:00", null),
      (5L, "2024-01-03 08:00:00", "2024-01-03 09:00:00", null)))
  }

  test("funnel: per-step counts are the ordered-reachability counts, non-increasing") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 11:00:00"),
      (3L, "view", "2024-01-01 10:00:00"),
      (4L, "purchase", "2024-01-01 10:00:00"))
    val got = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "view", 3L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("retention: cohort by first activity, one count per active period") {
    val events = ev(
      // user 1: first active period 0 (anchor week), active again period 1
      // (two events in period 1 — counted ONCE)
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-08 10:00:00"),
      (1L, "view", "2024-01-09 10:00:00"),
      // user 2: cohort period 0, only period 0
      (2L, "view", "2024-01-02 10:00:00"),
      // user 3: cohort period 1, active periods 1 and 3 (offset 0 and 2)
      (3L, "view", "2024-01-08 10:00:00"),
      (3L, "view", "2024-01-23 10:00:00"))
    val got = EventAnalytics.retention(events, "user_id", "ts",
        anchorDate = "2024-01-01", periodDays = 7)
      .orderBy("cohort_period", "period_offset")
      .as[(Int, Int, Long)].collect().toSeq
    assert(got === Seq(
      (0, 0, 2L), // users 1, 2 in the anchor-week cohort's week 0
      (0, 1, 1L), // user 1 retained into week 1 (counted once)
      (1, 0, 1L), // user 3's cohort week
      (1, 2, 1L)))
  }

  test("conversion window: a step exactly at the gap counts, one second past does not") {
    val events = ev(
      // user 1 clicks exactly 60 minutes after viewing → counts (half-open
      // (prev, prev+gap] — the attribution-join bound convention)
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      // user 2 clicks 60 minutes and one second after → outside the window
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 11:00:01"))
    val got = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"), maxGapMinutes = Some(60))
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "view", 2L), (1, "click", 1L)))
    // and the SECOND in-window click is found when the first is outside:
    // the window applies to the candidate being attributed, not just the
    // user's earliest next-step event
    val events2 = ev(
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-01 11:00:01"), // outside
      (3L, "click", "2024-01-01 10:30:00")) // inside (order-independent)
    val got2 = EventAnalytics.funnelTimes(events2, "user_id", "event_type",
        "ts", Seq("view", "click"), maxGapMinutes = Some(60))
      .select(col("t1").cast("string")).as[String].collect().toSeq
    assert(got2 === Seq("2024-01-01 10:30:00"))
  }

  test("repeated steps: each repeat resolves to the NEXT such event strictly after the previous") {
    val events = ev(
      // user 1: two views then a purchase — full view→view→purchase
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: ONE view only — the repeated second view must not
      // re-match the same event (strictly-after excludes t0 itself)
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 10:10:00"),
      // user 3: two views, purchase BETWEEN them — purchase precedes the
      // second view, so step 2 is unreached
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "purchase", "2024-01-01 10:02:00"),
      (3L, "view", "2024-01-01 10:05:00"))
    val got = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "view", "purchase"))
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "view", 3L), (1, "view", 2L), (2, "purchase", 1L)))
    // the step times are the two earliest views in order
    val t1 = EventAnalytics.funnelTimes(events, "user_id", "event_type", "ts",
        Seq("view", "view", "purchase"))
      .where(col("user") === 1L)
      .select(col("t0").cast("string"), col("t1").cast("string"),
        col("t2").cast("string"))
      .as[(String, String, String)].collect().head
    assert(t1 === (("2024-01-01 10:00:00", "2024-01-01 10:05:00",
      "2024-01-01 10:10:00")))
  }

  test("funnelDurations: converted counts and average transition seconds") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),      // +3600 s
      (1L, "purchase", "2024-01-01 11:30:00"),   // +1800 s
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:00:30"),      // +30 s, no purchase
      (3L, "view", "2024-01-01 09:00:00"))       // stalls at view
    val got = EventAnalytics.funnelDurations(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .as[(Int, String, String, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1, "view", "click", 2L, Some((3600.0 + 30.0) / 2)),
      (2, "click", "purchase", 1L, Some(1800.0))))
    // nobody converts the second transition → count 0, latency null
    val noP = EventAnalytics.funnelDurations(
        events.where($"event_type" =!= "purchase"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .as[(Int, String, String, Long, Option[Double])].collect().toSeq
    assert(noP(1) === ((2, "click", "purchase", 0L, None)))
  }

  test("funnel guards: empty step lists are refused; repeats are legal") {
    val events = ev((1L, "view", "2024-01-01 10:00:00"))
    assert(intercept[IllegalArgumentException] {
      EventAnalytics.funnel(events, "user_id", "event_type", "ts", Nil)
    }.getMessage.contains("at least one"))
    // repeated steps are a SUPPORTED funnel shape since round 9 (the
    // strictly-after fold always handled them; only the require blocked
    // it) — one view cannot satisfy both legs
    val got = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "view"))
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "view", 1L), (1, "view", 0L)))
  }
}
