package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch event-sequence analytics over the events table — the funnel /
  * cohort-retention family that completes the event toolkit next to
  * sessionization, windowed aggregation and click→purchase attribution
  * ([[graft.streaming.EventStreams]]). The reference has no event
  * analytics at all (its only collection is a product catalog); these are
  * north-star additions shaped for the 100 TB clickstream case: every
  * shuffle is keyed by the user id, step relations shrink monotonically
  * through a funnel, and nothing ever sorts or collects a user's full
  * history.
  */
object EventAnalytics {

  /** Ordered-funnel step times per user: for `steps = Seq(A, B, C)`,
    * `t0` = the user's earliest A, `t1` = earliest B STRICTLY AFTER t0,
    * `t2` = earliest C strictly after t1, … — the standard "ordered
    * funnel" semantics where step n counts only if it happens after the
    * user's step n−1 time (a purchase before the first view is not a
    * converted funnel). Returns (user, t0 … t(k−1)) with nulls beyond
    * the user's last reached step — one row per user who reached step 0.
    *
    * REPEATED steps are supported (view→view→purchase — real funnels
    * repeat types): each stage's strictly-after bound is the PREVIOUS
    * stage's time, so two consecutive identical steps resolve to the
    * user's two earliest such events in order.
    *
    * Shape: k−1 user-keyed joins of monotonically SHRINKING relations
    * (each stage is ≤ previous stage's users × 1 row), each stage one
    * map-side-combinable min aggregation. k is a constant (the funnel
    * definition), so at 100 TB this is a fixed number of narrow
    * user-keyed shuffles — never a per-user sort or event-list
    * collection. */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGapMinutes: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMinutes.forall(_ >= 1),
      s"maxGapMinutes must be ≥ 1, got $maxGapMinutes")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user"))
      .agg(min(col(tsCol)).as("t0"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (step, i)) =>
      // conversion window: step n must land within maxGap of step n−1
      // (half-open (prev, prev+gap] — the attribution-join convention)
      val inWindow = maxGapMinutes match {
        case Some(m) => col("__ts") > col("__prev") &&
          col("__ts") <= col("__prev") + expr(s"INTERVAL $m MINUTES")
        case None => col("__ts") > col("__prev")
      }
      val next = events.where(col(typeCol) === step)
        .select(col(userCol).as("user"), col(tsCol).as("__ts"))
        .join(prev.select(col("user"), col(s"t${i - 1}").as("__prev")), "user")
        .where(inWindow)
        .groupBy("user").agg(min(col("__ts")).as(s"t$i"))
      prev.join(next, Seq("user"), "left")
    }
  }

  /** [[funnelTimes]] MELTED to one row per (user, reached step) —
    * (user_id, step_idx, step, ts): the advancement-row shape the
    * streaming tracker emits
    * ([[graft.streaming.EventStreams.FunnelProgress]]), so batch truth
    * and streamed output diff directly (the reconciliation operator's
    * ground-truth side). Same k−1-join scale shape as [[funnelTimes]];
    * the melt is k filters over its one result. */
  def funnelProgressRows(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      maxGapMinutes: Option[Int] = None): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps,
      maxGapMinutes)
    steps.zipWithIndex.map { case (step, i) =>
      times.where(col(s"t$i").isNotNull)
        .select(col("user").as("user_id"), lit(i).as("step_idx"),
          lit(step).as("step"), col(s"t$i").as("ts"))
    }.reduce(_.unionByName(_))
  }

  /** Funnel conversion counts: one row per step —
    * (step_idx, step, users) where `users` reached the step in order.
    * Counts are non-increasing by construction ([[funnelTimes]] nulls). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGapMinutes: Option[Int] = None): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps,
      maxGapMinutes)
    // ONE aggregation over the step-times relation (count(t_i) skips the
    // nulls of unreached steps), exploded to the per-step rows — never k
    // re-executions of the join chain
    val aggs = steps.indices.map(i => count(col(s"t$i")).as(s"c$i"))
    times.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i).as("step_idx"), lit(step).as("step"),
          col(s"c$i").as("users"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** Funnel TRANSITION latencies: one row per consecutive step pair —
    * (step_idx, from_step, to_step, converted, avg_seconds), where
    * `converted` counts users who made the transition and `avg_seconds`
    * averages their step-time gap (null when nobody converted). The
    * companion metric to [[funnel]]'s counts: WHERE users stall and HOW
    * LONG conversion takes. Arithmetic is exact-integer micros summed
    * then divided once (both engines agree to the bit before the
    * 6-decimal round); one aggregation over the step-times relation,
    * exploded — the [[funnel]] discipline. */
  def funnelDurations(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGapMinutes: Option[Int] = None): DataFrame = {
    require(steps.size >= 2, "transition latencies need at least two steps")
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps,
      maxGapMinutes)
    val aggs = (1 until steps.size).flatMap { i =>
      Seq(count(col(s"t$i")).as(s"c$i"),
        round(avg(unix_micros(col(s"t$i")) - unix_micros(col(s"t${i - 1}")))
          / 1000000L, 6).as(s"a$i"))
    }
    times.agg(aggs.head, aggs.tail: _*)
      .select(explode(array((1 until steps.size).map { i =>
        struct(lit(i).as("step_idx"), lit(steps(i - 1)).as("from_step"),
          lit(steps(i)).as("to_step"), col(s"c$i").as("converted"),
          col(s"a$i").as("avg_seconds"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** SQL twin of [[funnelDurations]] (DuckDB) — the [[sqlFunnel]] CTE
    * chain with per-transition join aggregates. */
  def sqlFunnelDurations(eventsTable: String, userExpr: String,
      typeExpr: String, tsExpr: String, steps: Seq[String],
      maxGapMinutes: Option[Int] = None): String = {
    require(steps.size >= 2, "transition latencies need at least two steps")
    val gapCond = maxGapMinutes
      .map(m => s" AND e.t <= p.t + INTERVAL $m MINUTES").getOrElse("")
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"""s0 AS (
           |  SELECT $userExpr AS u, min($tsExpr) AS t
           |  FROM $eventsTable WHERE $typeExpr = '$step' GROUP BY 1)"""
          .stripMargin
      else
        s"""s$i AS (
           |  SELECT e.u, min(e.t) AS t FROM (
           |    SELECT $userExpr AS u, $tsExpr AS t
           |    FROM $eventsTable WHERE $typeExpr = '$step') e
           |  JOIN s${i - 1} p ON e.u = p.u AND e.t > p.t$gapCond
           |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = (1 until steps.size).map { i =>
      s"""SELECT $i AS step_idx, '${steps(i - 1)}' AS from_step,
         |       '${steps(i)}' AS to_step, count(*) AS converted,
         |       round(avg(epoch_us(b.t) - epoch_us(a.t)) / 1000000, 6) AS avg_seconds
         |FROM s${i - 1} a JOIN s$i b ON a.u = b.u""".stripMargin
    }.mkString("\nUNION ALL ")
    s"WITH $ctes\n$selects"
  }

  /** CTE-chain SQL twin of [[funnel]] (DuckDB): s0 … s(k−1) mirror the
    * shrinking per-step min-time relations; `tsExpr` must match the
    * engine-side timestamp normalization (`ts::TIMESTAMP` for the events
    * fixture — see [[graft.util.Tables.events]]). */
  def sqlFunnel(eventsTable: String, userExpr: String, typeExpr: String,
      tsExpr: String, steps: Seq[String],
      maxGapMinutes: Option[Int] = None): String = {
    val gapCond = maxGapMinutes
      .map(m => s" AND e.t <= p.t + INTERVAL $m MINUTES").getOrElse("")
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"""s0 AS (
           |  SELECT $userExpr AS u, min($tsExpr) AS t
           |  FROM $eventsTable WHERE $typeExpr = '$step' GROUP BY 1)"""
          .stripMargin
      else
        s"""s$i AS (
           |  SELECT e.u, min(e.t) AS t FROM (
           |    SELECT $userExpr AS u, $tsExpr AS t
           |    FROM $eventsTable WHERE $typeExpr = '$step') e
           |  JOIN s${i - 1} p ON e.u = p.u AND e.t > p.t$gapCond
           |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = steps.zipWithIndex.map { case (step, i) =>
      s"SELECT $i AS step_idx, '$step' AS step, count(*) AS users FROM s$i"
    }.mkString("\nUNION ALL ")
    s"WITH $ctes\n$selects"
  }

  /** Cohort retention matrix: users are cohorted by the period (default
    * week) of their FIRST activity, counted once per (cohort, offset)
    * they were active in — (cohort_period, period_offset, users).
    * Periods are integer `floor(days-since-anchor / periodDays)` (pure
    * calendar arithmetic on the UTC session — no timezone-dependent
    * truncation, identical in any engine).
    *
    * Shape: one user-keyed min (cohort), one distinct over (user,
    * period) — bounded by ACTIVE user-periods, not events — and one
    * map-side-combinable count. The matrix itself is tiny
    * (cohorts × offsets). */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      anchorDate: String, periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be ≥ 1, got $periodDays")
    val ap = events.select(col(userCol).as("user"),
      floor(datediff(col(tsCol).cast("date"), lit(anchorDate).cast("date"))
        / periodDays.toDouble).cast("int").as("p"))
    val cohort = ap.groupBy("user").agg(min(col("p")).as("cohort"))
    ap.distinct()
      .join(cohort, "user")
      .groupBy(col("cohort").as("cohort_period"),
        (col("p") - col("cohort")).cast("int").as("period_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** SQL twin of [[retention]] (DuckDB). */
  def sqlRetention(eventsTable: String, userExpr: String, tsExpr: String,
      anchorDate: String, periodDays: Int = 7): String =
    s"""WITH ap AS (
       |  SELECT $userExpr AS u,
       |         floor(date_diff('day', DATE '$anchorDate', $tsExpr) / $periodDays.0)::INT AS p
       |  FROM $eventsTable
       |), coh AS (
       |  SELECT u, min(p) AS cohort FROM ap GROUP BY 1
       |), act AS (
       |  SELECT DISTINCT u, p FROM ap
       |)
       |SELECT coh.cohort AS cohort_period, (act.p - coh.cohort)::INT AS period_offset,
       |       count(*) AS users
       |FROM act JOIN coh ON act.u = coh.u
       |GROUP BY 1, 2""".stripMargin
}
