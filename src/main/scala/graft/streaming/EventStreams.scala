package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (north-star addition — the reference has nothing streaming, SURVEY §2.4;
  * the `events` fixture is reserved exactly for this).
  *
  * Design: every transform is declared once and runs in BOTH batch and
  * streaming mode (the Spark-first way — same DataFrame program, Catalyst
  * plans it incrementally under `readStream`). Batch mode is what the
  * DuckDB oracle checks (q_window_agg / q_sessionize); streaming mode —
  * watermarks, late-data drop, incremental state — is spec-tested with
  * `MemoryStream`.
  *
  * Scale shape: tumbling-window counts are a streaming hash aggregation
  * keyed on (window, type) — state size ∝ active windows × types, constant
  * per event. Sessionization state is one struct per active user; the
  * event-time timeout bounds it. Both shuffle once on their grouping key.
  */
// Serializable: the stateful transition closures ([[funnelStateful]],
// [[funnelTrackerSim]]) call the shared [[advanceFunnel]], so executor
// tasks capture this object
object EventStreams extends Serializable {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Internal per-user open-session state ([[sessionizeStateful]]); public
    * because the state encoder's generated code instantiates it. */
  final case class SessionState(startMs: Long, endMs: Long, n: Long, total: Double)

  /** Tumbling-window counts/sums per event type. In streaming mode the
    * watermark bounds state and drops data later than `lateness`. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Gap-based sessions via the built-in `session_window` — one declaration,
    * batch or streaming. session_start/end are the observed event extremes
    * (min/max ts), not the padded window bounds, so the batch result is
    * plain-SQL-reproducible. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")

  /** Equivalent batch-only sessionization via analytic functions (lag +
    * running sum of gap-breaks) — the cross-check for [[sessionAgg]] and the
    * shape of the DuckDB oracle. */
  def sessionAggBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // microsecond precision — the native resolution of Spark timestamps,
    // mirrored by epoch_us in the oracle SQL
    val gapUs = gapMinutes * 60L * 1000000L
    // `>=` matches session_window's merge rule exactly: windows are
    // [ts, ts+gap) half-open, so a diff of exactly `gap` does NOT merge.
    // First row: lag is null → comparison null → otherwise(0); the cumsum
    // still starts that user's first session at index 0.
    val newSession = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) >= gapUs, 1
    ).otherwise(lit(0))
    events
      .withColumn("brk", newSession)
      .withColumn("sess", sum(col("brk")).over(byUser))
      .groupBy("user_id", "sess")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
  }

  def sqlSessionAgg(eventsTable: String, gapMinutes: Int = 30): String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= ${gapMinutes * 60L * 1000000L}
       |              THEN 1 ELSE 0 END AS brk
       |  FROM $eventsTable
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts, value,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM marked
       |)
       |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       |       count(*) AS n_events, round(sum(value), 4) AS total_value
       |FROM numbered GROUP BY user_id, sess""".stripMargin

  /** Streaming exact dedup with BOUNDED state (the streaming rendition of
    * [[graft.dedup.Dedup.exact]]'s keep-first semantics): the first event
    * per key wins; duplicates arriving within the watermark horizon are
    * dropped, and per-key state older than the watermark is evicted — state
    * size ∝ keys per watermark window, not corpus size. In batch mode the
    * same call degenerates to `dropDuplicates` (whole-input dedup, no
    * horizon). Use the watermarked form for at-least-once ingest pipelines
    * where replays land close to the original in event time. */
  def dedupEvents(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
      lateness: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
    else
      events.dropDuplicates(keyCols)

  /** Custom-state sessionization (`flatMapGroupsWithState`, event-time
    * timeout): emits a [[Session]] when the watermark passes the session's
    * end + gap. Demonstrates arbitrary stateful processing where
    * session_window's merge semantics don't fit (e.g. per-session caps,
    * value-dependent gaps). */
  def sessionizeStateful(events: Dataset[Event], gapMinutes: Int = 30,
      lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, it: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total))
      } else {
        val evs = it.toSeq
        val closed = Seq.newBuilder[Session]
        // merge sorted events into (possibly) the existing open session,
        // closing it whenever a gap exceeds gapMs
        var cur = state.getOption.orNull
        evs.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case null =>
              cur = SessionState(t, t, 1L, e.value)
            // `>=` matches session_window / sessionAggBatch: the window is
            // half-open [ts, ts+gap), so a gap of exactly gapMs splits
            case s if t - s.endMs >= gapMs =>
              closed += Session(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total)
              cur = SessionState(t, t, 1L, e.value)
            case s =>
              cur = SessionState(s.startMs, math.max(s.endMs, t), s.n + 1, s.total + e.value)
          }
        }
        state.update(cur)
        state.setTimeoutTimestamp(cur.endMs + gapMs)
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Per-user funnel progress state ([[funnelStateful]]): the highest step
    * reached in order and its event-time millis; public because the state
    * encoder's generated code instantiates it. */
  final case class FunnelState(step: Int, tsMs: Long)

  final case class FunnelProgress(user_id: Long, step_idx: Int, step: String,
      ts: Timestamp)

  /** STREAMING funnel tracker — the live twin of
    * [[graft.operators.EventAnalytics.funnelTimes]]: one
    * `flatMapGroupsWithState` struct per user holding (highest step
    * reached, its event time), emitting a [[FunnelProgress]] row the
    * moment a user ADVANCES a step under the same strictly-after rule
    * (step n counts only with ts > the user's step n−1 time; a greedy
    * scan in event-time order picks exactly the sequential min times the
    * batch operator computes).
    *
    * State contract: 1 struct per user who reached step 0 — users who
    * never enter the funnel hold NO state — evicted by event-time
    * timeout `ttlMinutes` after their last advancement (the bound an
    * unbounded 100 TB/day stream needs; a converted-or-stalled user
    * costs 12 bytes until TTL, nothing after).
    *
    * Parity contract (spec-pinned): equal to the batch funnel when each
    * user's events arrive in event-time order ACROSS micro-batches
    * (within a batch any order is fine — events are sorted before the
    * scan). A cross-batch late arrival can under-advance the funnel —
    * the standard approximation every un-buffered streaming funnel
    * makes; the DECLARED repair path is [[funnelReconcile]] /
    * [[funnelRepaired]] — replay the ledger through the batch operator
    * and apply the diff (gate-checked by `q_funnel_reconcile`).
    *
    * `maxGapMinutes` is the batch operator's CONVERSION WINDOW (half-open
    * (prev, prev+gap], `EventAnalytics.funnelTimes`): step n advances
    * only within the gap of step n−1's time. The greedy in-order scan
    * keeps parity — events are seen in event-time order, so the first
    * in-window qualifier IS the batch min, and once an event overshoots
    * the window no later event can re-enter it (a live funnel WITHOUT
    * this silently over-counts conversions vs its batch twin). Repeated
    * steps (view→view→purchase) are supported, as in batch. */
  def funnelStateful(events: Dataset[Event], steps: Seq[String],
      ttlMinutes: Int = 7 * 24 * 60,
      lateness: String = "10 minutes",
      maxGapMinutes: Option[Int] = None): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMinutes.forall(_ >= 1),
      s"maxGapMinutes must be ≥ 1, got $maxGapMinutes")
    import events.sparkSession.implicits._
    val gapMs = maxGapMinutes.map(_ * 60000L)

    def fn(userId: Long, it: Iterator[Event],
        state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val (cur, out) = advanceFunnel(userId,
          state.getOption.getOrElse(FunnelState(-1, Long.MinValue)),
          it.toSeq, steps, gapMs)
        if (cur.step >= 0) {
          state.update(cur)
          // clamp past the watermark: an old-but-within-lateness event can
          // put tsMs + TTL at or before the current watermark, which Spark
          // rejects ("timeout timestamp must be after watermark") — such a
          // user's state then times out at the earliest legal instant,
          // which is exactly the TTL contract's intent
          state.setTimeoutTimestamp(math.max(
            cur.tsMs + ttlMinutes * 60000L,
            state.getCurrentWatermarkMs() + 1))
        }
        out.iterator
      }
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** One greedy in-event-time-order advance over a batch's event slice —
    * THE streaming-funnel transition function, shared verbatim by the
    * live tracker ([[funnelStateful]]) and the deterministic replay
    * ([[funnelTrackerSim]]), so reconciliation measures the SEMANTICS'
    * divergence (cross-batch late data), never two implementations'. */
  private[streaming] def advanceFunnel(userId: Long, cur0: FunnelState,
      evs: Seq[Event], steps: Seq[String], gapMs: Option[Long])
      : (FunnelState, Seq[FunnelProgress]) = {
    var cur = cur0
    val out = Seq.newBuilder[FunnelProgress]
    evs.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val next = cur.step + 1
      if (next < steps.length && e.event_type == steps(next) &&
          (cur.step < 0 || (e.ts.getTime > cur.tsMs &&
            gapMs.forall(g => e.ts.getTime <= cur.tsMs + g)))) {
        cur = FunnelState(next, e.ts.getTime)
        out += FunnelProgress(userId, next, steps(next), e.ts)
      }
    }
    (cur, out.result())
  }

  /** Deterministic BATCH replay of the streaming funnel tracker under an
    * explicit micro-batch assignment: each user's events are partitioned
    * by `batchOf`, batches are folded in ascending order through the SAME
    * [[advanceFunnel]] transition the live tracker runs, state carried
    * across batches. This reproduces — exactly and repeatably — the
    * cross-batch under-advance approximation [[funnelStateful]] documents
    * (a late event landing in a later batch than a subsequent step's
    * event is consumed after it, so the funnel can stall below the batch
    * truth), which makes the repair path testable without a live stream.
    *
    * Scope: a reconciliation/test harness, not the production batch
    * funnel — it collects each user's history per group (bounded by one
    * user's events, the [[sessionizeStateful]] batch shape), where
    * [[graft.operators.EventAnalytics.funnelTimes]] is the scale-shaped
    * batch operator. */
  def funnelTrackerSim(events: Dataset[Event], steps: Seq[String],
      batchOf: Event => Long,
      maxGapMinutes: Option[Int] = None): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMinutes.forall(_ >= 1),
      s"maxGapMinutes must be ≥ 1, got $maxGapMinutes")
    import events.sparkSession.implicits._
    val gapMs = maxGapMinutes.map(_ * 60000L)
    events.groupByKey(_.user_id).flatMapGroups {
      (uid: Long, it: Iterator[Event]) =>
        var cur = FunnelState(-1, Long.MinValue)
        val out = Seq.newBuilder[FunnelProgress]
        it.toSeq.groupBy(batchOf).toSeq.sortBy(_._1).foreach {
          case (_, evs) =>
            val (nxt, emitted) = advanceFunnel(uid, cur, evs, steps, gapMs)
            cur = nxt
            out ++= emitted
        }
        out.result().iterator
    }
  }

  /** The shared (user_id, step_idx, step, ts) row shape both the tracker
    * output and the batch truth melt into. */
  private val FunnelKeyCols = Seq("user_id", "step_idx", "step", "ts")

  /** LATE-DATA RECONCILIATION for the streaming funnel — the declared
    * repair operator the [[funnelStateful]] scaladoc promises: replay the
    * event LEDGER through the batch operator
    * ([[graft.operators.EventAnalytics.funnelTimes]] — the ground truth
    * that sees all events regardless of arrival order) and diff its
    * melted per-(user, step) advancement rows against what the tracker
    * actually emitted. Output: the tracker's rows to retract (`action =
    * "retract"` — an advancement whose step time the late data changed)
    * and the truth rows to add (`action = "add"` — advancements the
    * under-advanced tracker never emitted). Applying both
    * ([[funnelRepaired]]) yields exactly the batch truth.
    *
    * Scale shape: truth is the funnelTimes join chain (k−1 user-keyed
    * joins of shrinking relations); the diff is two user-keyed anti-joins
    * bounded by funnel PARTICIPANTS, not events — run it per
    * reconciliation window (e.g. daily, after the late-arrival horizon
    * closes), emit the corrections downstream, leave the live tracker
    * untouched. */
  def funnelReconcile(ledger: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], maxGapMinutes: Option[Int],
      tracked: DataFrame): DataFrame = {
    val truth = graft.operators.EventAnalytics.funnelProgressRows(
      ledger, userCol, typeCol, tsCol, steps, maxGapMinutes)
    val trackedKeys = tracked.select(FunnelKeyCols.map(col): _*)
    truth.join(trackedKeys, FunnelKeyCols, "left_anti")
      .withColumn("action", lit("add"))
      .unionByName(
        trackedKeys.join(truth, FunnelKeyCols, "left_anti")
          .withColumn("action", lit("retract")))
  }

  /** Apply [[funnelReconcile]]'s corrections to the tracker's output:
    * drop the retractions, add the additions — the repaired relation
    * equals the batch truth's per-(user, step) advancement rows. */
  def funnelRepaired(tracked: DataFrame, corrections: DataFrame): DataFrame = {
    val keyed = tracked.select(FunnelKeyCols.map(col): _*)
    keyed
      .join(corrections.where(col("action") === "retract")
        .select(FunnelKeyCols.map(col): _*), FunnelKeyCols, "left_anti")
      .unionByName(corrections.where(col("action") === "add")
        .select(FunnelKeyCols.map(col): _*))
  }

  /** Watermarked stream-stream INTERVAL join — event attribution: pair
    * each `right` event (e.g. a purchase) with every `left` event (e.g. a
    * click) by the same user at most `gapMinutes` earlier,
    * `l.ts ∈ (r.ts − gap, r.ts]`.
    *
    * State contract: both sides carry a watermark and the join condition
    * bounds event-time distance, so each side buffers only `gapMinutes +
    * lateness` of data per user — bounded state, the requirement for an
    * unbounded 100 TB/day event stream (an unbounded-time stream-stream
    * join would grow state forever and Spark rejects it in append mode).
    * In batch mode the same call is a plain interval join, so batch/stream
    * parity is testable (StreamingSpec).
    *
    * Both inputs must carry `keyCol` (the join key) and `tsCol` (event
    * time) — required up front with the ORIGINAL names, because after the
    * prefix-renaming an analysis error would blame `l_...`/`r_...`
    * columns the caller never wrote.
    *
    * Output: left columns prefixed `l_`, right prefixed `r_`. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      gapMinutes: Int = 60, lateness: String = "10 minutes",
      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    for ((df, side) <- Seq((left, "left"), (right, "right")); c <- Seq(keyCol, tsCol))
      require(df.columns.contains(c),
        s"intervalJoin: $side input has no '$c' column (columns: " +
          s"${df.columns.mkString(", ")}) — pass keyCol/tsCol to match your schema")
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    val (lw, rw) =
      if (left.isStreaming || right.isStreaming)
        (l.withWatermark(s"l_$tsCol", lateness), r.withWatermark(s"r_$tsCol", lateness))
      else (l, r)
    lw.join(rw, expr(
      s"""l_$keyCol = r_$keyCol AND
         |l_$tsCol <= r_$tsCol AND
         |l_$tsCol > r_$tsCol - INTERVAL $gapMinutes MINUTES""".stripMargin))
  }
}
