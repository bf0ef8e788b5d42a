package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import graft.util.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics: incremental windowed aggregation, watermark
  * late-data drop, custom-state sessionization, and batch/streaming parity
  * of the same declared transform. */
class StreamingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
  private def tsAt(hour: Int, minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("streaming funnel: advancement rows match the batch funnel's step times") {
    val events = Seq(
      // user 7: out-of-order WITHIN a batch (sorted before the scan)
      Event(2, ts(10), 7, "click", 1.0),
      Event(1, ts(0), 7, "view", 1.0),
      // user 8: clicked before the first view — that click must not count
      Event(3, ts(0), 8, "click", 1.0),
      Event(4, ts(5), 8, "view", 1.0))
    val later = Seq(
      Event(5, ts(20), 7, "purchase", 1.0),
      Event(6, ts(15), 8, "click", 1.0))
    val steps = Seq("view", "click", "purchase")

    val mem = MemoryStream[Event](spark)
    val q = EventStreams.funnelStateful(mem.toDS(), steps, lateness = "1 minutes")
      .writeStream.format("memory").queryName("funnelp").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(later: _*)
      q.processAllAvailable()
      val got = spark.table("funnelp").as[EventStreams.FunnelProgress]
        .collect().map(p => (p.user_id, p.step_idx, p.step, p.ts)).toSet
      assert(got === Set(
        (7L, 0, "view", ts(0)), (7L, 1, "click", ts(10)),
        (7L, 2, "purchase", ts(20)),
        (8L, 0, "view", ts(5)), (8L, 1, "click", ts(15))))

      // parity: the batch operator over the union of both batches reports
      // the SAME step times the stream emitted incrementally
      val bt = graft.operators.EventAnalytics.funnelTimes(
          (events ++ later).toDF(), "user_id", "event_type", "ts", steps)
        .orderBy("user")
        .select(col("user"), col("t0"), col("t1"), col("t2"))
        .as[(Long, Timestamp, Timestamp, Timestamp)].collect().toSeq
      assert(bt === Seq(
        (7L, ts(0), ts(10), ts(20)),
        (8L, ts(5), ts(15), null)))
    } finally q.stop()
  }

  test("streaming funnel conversion window: gap parity with the batch funnel; repeated steps advance") {
    // user 7 clicks INSIDE the 10-minute window; user 8 clicks outside it
    // (a gap-free stream would count both — the silent over-count the
    // window exists to prevent); user 9 runs a REPEATED-step funnel leg
    val events = Seq(
      Event(1, ts(0), 7, "view", 1.0),
      Event(2, ts(8), 7, "click", 1.0),
      Event(3, ts(0), 8, "view", 1.0),
      Event(4, ts(15), 8, "click", 1.0))
    val steps = Seq("view", "click")
    val mem = MemoryStream[Event](spark)
    val q = EventStreams.funnelStateful(mem.toDS(), steps,
        lateness = "1 minutes", maxGapMinutes = Some(10))
      .writeStream.format("memory").queryName("funnelgap")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("funnelgap").as[EventStreams.FunnelProgress]
        .collect().map(p => (p.user_id, p.step_idx, p.ts)).toSet
      assert(got === Set((7L, 0, ts(0)), (7L, 1, ts(8)), (8L, 0, ts(0))))
      // parity: the batch funnel under the same window reports exactly
      // the step times the stream emitted
      val bt = graft.operators.EventAnalytics.funnelTimes(
          events.toDF(), "user_id", "event_type", "ts", steps,
          maxGapMinutes = Some(10))
        .orderBy("user")
        .select(col("user"), col("t0"), col("t1"))
        .as[(Long, Timestamp, Timestamp)].collect().toSeq
      assert(bt === Seq((7L, ts(0), ts(8)), (8L, ts(0), null)))
    } finally q.stop()

    // repeated steps: view→view advances on the user's second view
    val mem2 = MemoryStream[Event](spark)
    val q2 = EventStreams.funnelStateful(mem2.toDS(), Seq("view", "view"),
        lateness = "1 minutes")
      .writeStream.format("memory").queryName("funnelrep")
      .outputMode("append").start()
    try {
      mem2.addData(Event(1, ts(0), 9, "view", 1.0),
        Event(2, ts(3), 9, "view", 1.0))
      q2.processAllAvailable()
      val got2 = spark.table("funnelrep").as[EventStreams.FunnelProgress]
        .collect().map(p => (p.user_id, p.step_idx, p.ts)).toSet
      assert(got2 === Set((9L, 0, ts(0)), (9L, 1, ts(3))))
    } finally q2.stop()
  }

  test("streaming funnel reconciliation: cross-batch late data detected and repaired to batch parity") {
    val steps = Seq("view", "click", "purchase")
    // user 7's purchase arrives in batch 1 but the click it depends on is
    // LATE (batch 2, earlier event time): the live tracker consumes the
    // purchase while stalled at step 0 and can never emit step 2 — the
    // documented cross-batch under-advance. User 8 arrives in order.
    val batch1 = Seq(
      Event(1, ts(0), 7, "view", 1.0),
      Event(3, ts(20), 7, "purchase", 1.0),
      Event(4, ts(0), 8, "view", 1.0))
    val batch2 = Seq(
      Event(2, ts(10), 7, "click", 1.0),
      Event(5, ts(25), 8, "click", 1.0))

    val mem = MemoryStream[Event](spark)
    val q = EventStreams.funnelStateful(mem.toDS(), steps,
        lateness = "60 minutes")
      .writeStream.format("memory").queryName("funnelrec")
      .outputMode("append").start()
    val tracked = try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      spark.table("funnelrec").as[EventStreams.FunnelProgress]
        .collect().toSeq
    } finally q.stop()
    // the under-advance is real: the stream never emits user 7's purchase
    assert(!tracked.exists(p => p.user_id == 7 && p.step_idx == 2))
    assert(tracked.exists(p => p.user_id == 7 && p.step_idx == 1))

    // the deterministic replay under the same batch assignment reproduces
    // the LIVE tracker's output exactly — the sim is the tracker, so a
    // reconciliation tested against the sim covers the stream
    val all = batch1 ++ batch2
    val batchOf = (batch1.map(_.event_id -> 0L) ++
      batch2.map(_.event_id -> 1L)).toMap
    val sim = EventStreams.funnelTrackerSim(all.toDS(), steps,
        e => batchOf(e.event_id)).collect().toSeq
    assert(sim.map(p => (p.user_id, p.step_idx, p.step, p.ts)).toSet ===
      tracked.map(p => (p.user_id, p.step_idx, p.step, p.ts)).toSet)

    // reconcile against the ledger: exactly the missing advancement
    val trackedDf = tracked.toDF()
    val corr = EventStreams.funnelReconcile(all.toDF(), "user_id",
      "event_type", "ts", steps, None, trackedDf)
    assert(corr.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2), r.getTimestamp(3), r.getString(4))).toSet ===
      Set((7L, 2, "purchase", ts(20), "add")))

    // applying the corrections restores batch parity row-for-row
    val repaired = EventStreams.funnelRepaired(trackedDf, corr)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3))).toSet
    val truth = graft.operators.EventAnalytics.funnelProgressRows(
        all.toDF(), "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3))).toSet
    assert(repaired === truth)
    assert(truth.contains((7L, 2, "purchase", ts(20))))
  }

  test("streaming funnel state: non-participants hold no state; TTL evicts") {
    val mem = MemoryStream[Event](spark)
    // tiny TTL so the timeout path executes in-test
    val q = EventStreams.funnelStateful(mem.toDS(), Seq("view", "click"),
        ttlMinutes = 5, lateness = "1 minutes")
      .writeStream.format("memory").queryName("funnelttl").outputMode("append").start()
    try {
      // user 7 enters the funnel; user 9 only errors (never step 0 → no state)
      mem.addData(Event(1, ts(0), 7, "view", 1.0), Event(2, ts(0), 9, "error", 1.0))
      q.processAllAvailable()
      // watermark far past ts(0) + 5min TTL → user 7's state times out
      mem.addData(Event(3, ts(40), 5, "error", 1.0))
      q.processAllAvailable()
      // a click AFTER eviction cannot advance: the funnel forgot user 7
      mem.addData(Event(4, ts(45), 7, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("funnelttl").as[EventStreams.FunnelProgress]
        .collect().map(p => (p.user_id, p.step_idx)).toSet
      assert(got === Set((7L, 0)))
    } finally q.stop()
  }

  test("windowedCounts: identical results in batch and streaming (complete) mode") {
    val events = Seq(
      Event(1, tsAt(10, 5), 1, "click", 1.0),
      Event(2, tsAt(10, 40), 1, "click", 2.0),
      Event(3, tsAt(11, 10), 2, "view", 3.0),
    )
    val batch = EventStreams.windowedCounts(events.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    val mem = MemoryStream[Event](spark)
    mem.addData(events: _*)
    val q = EventStreams.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wc").orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(batch.map(_(2)) === Seq(2L, 1L)) // 10:00 click ×2, 11:00 view ×1
    } finally q.stop()
  }

  test("curation gate runs unchanged on a document stream (batch/stream parity)") {
    // qualityFilter is a pure projection (zero aggregation state), so the
    // SAME declaration drives readStream→writeStream ingestion gating —
    // the streaming corpus-intake shape: gate on arrival, append the kept
    // rows. Parity: streamed output ≡ batch output on identical input.
    import graft.pipeline.Curation
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").limit(200)
    def gate(df: org.apache.spark.sql.DataFrame) =
      Curation.qualityFilter(df, "doc_id", "text",
        minTokens = 10, maxTokens = 400, minQualityPpm = 300000L,
        langs = Seq("en", "de", "fr"))
    val batch = gate(docs).orderBy("id").collect().map(_.toSeq).toSeq
    val rows = docs.as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)](spark)
    val q = gate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gated").outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("gated").orderBy("id").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("intervalJoin: stream-stream attribution equals the batch interval join") {
    val clicks = Seq(
      Event(1, tsAt(10, 0), 1, "click", 1.0),
      Event(2, tsAt(10, 50), 1, "click", 1.0),
      Event(3, tsAt(10, 10), 2, "click", 1.0),
    )
    val purchases = Seq(
      Event(10, tsAt(10, 55), 1, "purchase", 9.0), // pairs with clicks 1 and 2 (gap 60)
      Event(11, tsAt(12, 0), 2, "purchase", 5.0),  // click 3 too old — no pair
    )
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("l_event_id"), r.getAs[Long]("r_event_id"))).toSet
    val batch = key(EventStreams.intervalJoin(
      clicks.toDF(), purchases.toDF(), gapMinutes = 60).collect())
    assert(batch === Set((1L, 10L), (2L, 10L)))

    val lmem = MemoryStream[Event](spark)
    val rmem = MemoryStream[Event](spark)
    lmem.addData(clicks: _*)
    rmem.addData(purchases: _*)
    val q = EventStreams.intervalJoin(lmem.toDF(), rmem.toDF(), gapMinutes = 60)
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(key(spark.table("ij").collect()) === batch)
    } finally q.stop()
  }

  test("watermark drops events later than the lateness bound (append mode)") {
    val mem = MemoryStream[Event](spark)
    val q = EventStreams.windowedCounts(mem.toDF(), windowDur = "10 minutes",
        lateness = "5 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(8), 1, "click", 1.0))
      q.processAllAvailable() // watermark → 10:03
      mem.addData(Event(3, ts(30), 1, "click", 1.0)) // watermark → 10:25; closes ≤10:20
      q.processAllAvailable()
      mem.addData(Event(4, ts(1), 1, "click", 99.0)) // late: 10:01 < watermark
      q.processAllAvailable()
      mem.addData(Event(5, ts(59), 1, "click", 1.0)) // advance watermark past 10:40
      q.processAllAvailable()
      val rows = spark.table("late")
        .select("window_start", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      // the 10:00 window must NOT contain the late event's 99.0
      assert(rows.contains((ts(0), 2L, 2.0)))
      assert(rows.exists(_._1 == ts(30)))
    } finally q.stop()
  }

  test("stateful sessionization emits sessions after the event-time timeout") {
    val mem = MemoryStream[Event](spark)
    val sessions = EventStreams.sessionizeStateful(mem.toDS(), gapMinutes = 10,
      lateness = "1 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "view", 2.0))
      q.processAllAvailable()
      // push watermark far past session end + gap → timeout fires
      mem.addData(Event(3, ts(59), 8, "click", 5.0))
      q.processAllAvailable()
      mem.addData(Event(4, tsAt(12, 30), 8, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("sess").as[EventStreams.Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value))
      assert(got.contains((7L, ts(0), ts(5), 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming dedup: first event per id wins, replays within watermark dropped") {
    val mem = MemoryStream[Event](spark)
    val q = EventStreams.dedupEvents(mem.toDF(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 99.0), // same id, same batch
        Event(2, ts(2), 2, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(3), 1, "click", 77.0)) // replay, next batch
      q.processAllAvailable()
      mem.addData(Event(3, ts(50), 3, "click", 3.0))
      q.processAllAvailable()
      val got = spark.table("dedup").as[Event].collect()
      assert(got.map(_.event_id).sorted.toSeq === Seq(1L, 2L, 3L))
      // the FIRST arrival's payload survives
      assert(got.find(_.event_id == 1L).get.value === 1.0)
    } finally q.stop()
    // batch mode: same call degenerates to whole-input dropDuplicates
    val batch = EventStreams.dedupEvents(Seq(
      Event(9, ts(0), 1, "click", 1.0), Event(9, ts(30), 1, "click", 2.0)).toDF())
    assert(batch.count() === 1)
  }

  test("stateful sessionization splits at a gap of exactly `gap` (half-open boundary)") {
    // session_window / sessionAggBatch treat windows as [ts, ts+gap): an
    // event exactly gapMinutes after the previous one starts a NEW session.
    // The stateful variant must agree.
    val mem = MemoryStream[Event](spark)
    val sessions = EventStreams.sessionizeStateful(mem.toDS(), gapMinutes = 10,
      lateness = "1 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessb")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, tsAt(13, 0), 7, "click", 5.0)) // timeout both
      q.processAllAvailable()
      mem.addData(Event(4, tsAt(15, 0), 9, "click", 0.0)) // flush
      q.processAllAvailable()
      val got = spark.table("sessb").as[EventStreams.Session].collect()
        .map(s => (s.session_start, s.session_end, s.n_events)).toSet
      // two single-event sessions, NOT one merged [10:00,10:10] session
      assert(got.contains((ts(0), ts(0), 1L)))
      assert(got.contains((ts(10), ts(10), 1L)))
      // parity with the batch analytic formulation on the same 3 events
      val batch = EventStreams.sessionAggBatch(Seq(
          Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "view", 2.0),
          Event(3, tsAt(13, 0), 7, "click", 5.0)).toDF(), gapMinutes = 10)
        .select("session_start", "session_end", "n_events")
        .as[(Timestamp, Timestamp, Long)].collect().toSet
      assert(batch.contains((ts(0), ts(0), 1L)) && batch.contains((ts(10), ts(10), 1L)))
    } finally q.stop()
  }

  test("parquet sink + checkpoint: windows survive a query restart exactly once") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("stream-out").toString
    val mem = MemoryStream[Event](spark)
    def start() = EventStreams.windowedCounts(mem.toDF(), windowDur = "10 minutes",
        lateness = "1 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0))
      q1.processAllAvailable()
      mem.addData(Event(3, ts(20), 1, "view", 1.0)) // closes the 10:00 window
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start() // same checkpoint: resumes, must not re-emit 10:00
    try {
      mem.addData(Event(4, ts(45), 1, "click", 3.0)) // closes the 10:20 window
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .select("window_start", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // the 10:00 click window appears exactly once despite the restart
    assert(rows.count(r => r._1 == ts(0) && r._2 == "click") === 1)
    assert(rows.contains((ts(0), "click", 2L, 3.0)))
    assert(rows.contains((ts(20), "view", 1L, 1.0)))
  }

  test("session_window agg equals the analytic-function batch sessionization on events fixture") {
    val ev = Tables.events(spark, Sf0001)
    val a = EventStreams.sessionAgg(ev)
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    val b = EventStreams.sessionAggBatch(ev)
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
