package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec
import graft.queries.EventsDemos

/** Streaming == batch equivalence for the windowed event aggregations
  * (SURVEY.md §5.3.4 / §7.4.9): the same EventsDemos transformation is fed
  * once from a MemoryStream (append mode, AvailableNow, watermark) and once
  * as a plain batch DataFrame; results must agree row-for-row. This is the
  * oracle for the streaming *runtime* — the SQL semantics themselves are
  * DuckDB-checked via the x6* queries.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  // Two users; user 1 has a session gap > 30 min at minute 95; late/ooo
  // rows within watermark tolerance included.
  private def sampleRows: Seq[Ev] = Seq(
    Ev(1, ts(5), 1L, "click", 10.0, "{}"),
    Ev(2, ts(20), 1L, "click", 20.0, "{}"),
    Ev(3, ts(15), 2L, "view", 5.0, "{}"),   // out of order within batch
    Ev(4, ts(50), 1L, "click", 30.0, "{}"),
    Ev(5, ts(95), 1L, "buy", 40.0, "{}"),   // >30min gap for user 1
    Ev(6, ts(100), 2L, "view", 50.0, "{}"),
    Ev(7, ts(130), 2L, "view", 60.0, "{}"),
    Ev(8, ts(200), 1L, "click", 70.0, "{}")) // advances watermark past all windows

  private def runBoth(name: String,
      pipe: DataFrame => DataFrame): (Seq[Row], Seq[Row]) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sampleRows: _*)
    val q = pipe(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = s.table(name).collect().toSeq
    val batch = pipe(sampleRows.toDF()).collect().toSeq
    (sort(streamed), sort(batch))
  }

  private def sort(rows: Seq[Row]): Seq[Row] =
    rows.sortBy(_.mkString("|"))

  test("tumbling window: streaming == batch (X6a)") {
    // note: streaming append emits only watermark-closed windows; the final
    // event at minute 200 closes every earlier window. The last window
    // itself can stay open, so compare on the closed prefix.
    val (streamed, batch) = runBoth("t_tumbling", StreamingPipelines.tumblingStream)
    val closedBatch = batch.filterNot(_.toString.contains("2024-01-01 03:"))
    assert(streamed == closedBatch || streamed == batch,
      s"streamed=$streamed\nbatch=$batch")
    assert(streamed.nonEmpty)
  }

  test("sliding window: streaming == batch on closed windows (X6b)") {
    val (streamed, batch) = runBoth("t_sliding", StreamingPipelines.slidingStream)
    // closed = every batch window whose end <= max event time - watermark;
    // simpler robust assertion: streamed is a prefix subset of batch and
    // covers all windows ending before the last event's hour.
    assert(streamed.toSet.subsetOf(batch.toSet),
      s"streamed=$streamed\nbatch=$batch")
    assert(streamed.size >= batch.size - 2)
  }

  test("stateful sessionization: flatMapGroupsWithState closes sessions by gap and watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines.statefulSessions(mem.toDF())
      .writeStream.format("memory").queryName("t_stateful")
      .outputMode("append").start()
    mem.addData(sampleRows: _*)
    q.processAllAvailable()
    // far-future event advances the watermark past every open session
    mem.addData(Ev(99, ts(400), 999L, "click", 0.0, "{}"))
    q.processAllAvailable()
    // one more batch so event-time timeouts fire against the new watermark
    mem.addData(Ev(100, ts(401), 999L, "click", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val got = s.table("t_stateful")
      .select("user_id", "n_events", "total_cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set(
      (1L, 3L, 6000L),  // minutes 5,20,50
      (1L, 1L, 4000L),  // minute 95
      (1L, 1L, 7000L),  // minute 200
      (2L, 1L, 500L),   // minute 15
      (2L, 2L, 11000L)) // minutes 100,130
    assert(expected.subsetOf(got), s"got=$got")
  }

  test("stateful sessionization: cross-batch out-of-order event moves session_start down") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines.statefulSessions(mem.toDF())
      .writeStream.format("memory").queryName("t_ooo")
      .outputMode("append").start()
    mem.addData(Ev(1, ts(60), 7L, "click", 1.0, "{}"))
    q.processAllAvailable() // watermark now 00:50
    // older but not-yet-late event (00:55 >= watermark) joins the session
    mem.addData(Ev(2, ts(55), 7L, "click", 2.0, "{}"))
    q.processAllAvailable()
    mem.addData(Ev(3, ts(400), 999L, "click", 0.0, "{}"))
    q.processAllAvailable()
    mem.addData(Ev(4, ts(401), 999L, "click", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val rows = s.table("t_ooo").filter($"user_id" === 7L)
      .select("session_start", "n_events").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toList
    assert(rows == List(("2024-01-01 00:55:00.0", 2L)), rows.toString)
  }

  test("stateful sessionization: strays older than the open session form their own sessions, bridging when reachable") {
    // The stray-older-event path needs the watermark delay to EXCEED the
    // session gap (with the defaults, delay 10 min < gap 30 min, the
    // runtime's late-row filter drops such events before the function) —
    // so run with gap = 5 min, delay = 30 min. A not-yet-late event more
    // than a gap older than the open session's start must NOT merge into
    // it (the pre-fix guard `ms - lastMs <= gap` was vacuously true for
    // any older event); it closes as its own singleton session.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines
      .statefulSessions(mem.toDF(), gapMs = 5L * 60 * 1000,
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("t_stray")
      .outputMode("append").start()
    // open sessions @01:40 for users 8 and 9
    mem.addData(
      Ev(1, ts(100), 8L, "click", 1.0, "{}"),
      Ev(2, ts(100), 9L, "click", 1.0, "{}"))
    q.processAllAvailable() // watermark now 01:10
    // user 8 — 01:20 and 01:22: not late (>= watermark) but ~20 min older
    // than the session start, far beyond the 5-min gap. They must NOT
    // merge into the open session, but MUST session with each other
    // (batch session_window semantics within the micro-batch).
    // user 9 — a stray run 01:30/01:33 that a direct span-extension at
    // 01:36 bridges to the open session: all four events are one chain
    // under session_window and must emit as ONE session.
    mem.addData(
      Ev(3, ts(80), 8L, "click", 2.0, "{}"),
      Ev(4, ts(82), 8L, "click", 4.0, "{}"),
      Ev(5, ts(90), 9L, "click", 2.0, "{}"),
      Ev(6, ts(93), 9L, "click", 4.0, "{}"),
      Ev(7, ts(96), 9L, "click", 8.0, "{}"))
    q.processAllAvailable()
    mem.addData(Ev(8, ts(400), 999L, "click", 0.0, "{}"))
    q.processAllAvailable()
    mem.addData(Ev(9, ts(401), 999L, "click", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val byUser = s.table("t_stray").filter($"user_id".isin(8L, 9L))
      .select("user_id", "session_start", "n_events", "total_cents").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getLong(3)))
      .toSet
    assert(byUser == Set(
      // user 8: the stray pair forms ONE 2-event session; open stays 1
      (8L, "2024-01-01 01:40:00.0", 1L, 100L),
      (8L, "2024-01-01 01:20:00.0", 2L, 600L),
      // user 9: stray run bridged into the open session — one 4-event chain
      (9L, "2024-01-01 01:30:00.0", 4L, 1500L)),
      byUser.toString)
  }

  test("streaming dedup drops in-watermark duplicates; evicted keys pass again") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    // batch 1: a duplicate within the batch
    mem.addData(
      Ev(1, ts(10), 1L, "click", 1.0, "{}"),
      Ev(1, ts(10), 1L, "click", 1.0, "{}"),
      Ev(2, ts(11), 1L, "click", 2.0, "{}"))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate, still within the watermark
    mem.addData(Ev(1, ts(12), 1L, "click", 1.0, "{}"))
    q.processAllAvailable()
    // batch 3: far-future event advances the watermark past event 1's
    // state; batch 4 re-sends event_id 1 — state evicted, passes again
    mem.addData(Ev(3, ts(500), 1L, "click", 3.0, "{}"))
    q.processAllAvailable()
    mem.addData(Ev(1, ts(501), 1L, "click", 1.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val ids = s.table("t_dedup").select("event_id").collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(ids === Seq(1L, 1L, 2L, 3L), ids.toString)
  }

  test("throttle dedup: streaming face equals the X6g batch face under in-order arrival") {
    val s = spark
    import org.apache.spark.sql.functions.{col, date_trunc}
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def sec(str: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $str")
    // arrival order == (ts, event_id) order per key, so the streaming
    // first-arrival keeper coincides with the batch min-(ts,id) keeper
    val evs = Seq(
      Ev(1, sec("10:00:05"), 1L, "click", 1.0, "{}"),
      Ev(2, sec("10:00:30"), 1L, "click", 1.0, "{}"),  // same minute → dropped
      Ev(3, sec("10:00:50"), 2L, "view", 1.0, "{}"),
      Ev(4, sec("10:01:10"), 1L, "click", 1.0, "{}"),  // new minute → kept
      Ev(5, sec("10:01:20"), 1L, "view", 1.0, "{}"))   // other type → kept
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines.dedupStream(
        mem.toDF().withColumn("minute", date_trunc("minute", col("ts"))),
        keys = Seq("user_id", "event_type", "minute"))
      .writeStream.format("memory").queryName("t_throttle")
      .outputMode("append").start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("t_throttle").select("event_id").collect()
      .map(_.getLong(0)).toSet
    val batch = EventsDemos.throttleDedup(evs.toDF())
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batch && batch === Set(1L, 3L, 4L, 5L),
      s"streamed=$streamed batch=$batch")
  }

  test("session window: streaming == batch on closed sessions (X6c)") {
    val (streamed, batch) = runBoth("t_session", StreamingPipelines.sessionStream)
    assert(streamed.toSet.subsetOf(batch.toSet),
      s"streamed=$streamed\nbatch=$batch")
    // all sessions ending >30min+watermark before the last event are closed:
    // user1 {5,20,50}, user1 {95}, user2 {15}, user2 {100,130}
    assert(streamed.size >= 4)
  }

  test("interval join: stream-stream self-join == batch (X6d)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      Ev(1, ts(5), 1L, "click", 1.0, "{}"),
      Ev(2, ts(30), 1L, "purchase", 2.0, "{}"), // ← click 1 (25 min back)
      Ev(3, ts(40), 2L, "click", 3.0, "{}"),
      Ev(4, ts(50), 1L, "click", 4.0, "{}"),
      Ev(5, ts(70), 1L, "purchase", 5.0, "{}"), // ← click 4 only (click 1 is 65 min back, outside the hour)
      Ev(6, ts(75), 2L, "purchase", 6.0, "{}"), // ← click 3
      Ev(7, ts(200), 1L, "click", 7.0, "{}"))   // watermark advance; matches nothing
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val q = StreamingPipelines.intervalJoinStream(mem.toDF())
      .writeStream.format("memory").queryName("t_ij")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = s.table("t_ij").collect().toSeq
    val batch = EventsDemos.intervalJoin(rows.toDF()).collect().toSeq
    assert(sort(streamed) === sort(batch), s"streamed=$streamed\nbatch=$batch")
    assert(streamed.map(r => (r.getLong(0), r.getLong(3))).toSet ===
      Set((2L, 1L), (5L, 4L), (6L, 3L)))
  }

  test("left-outer interval join: NULL rows emit once the watermark closes their window (X6e)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val first = Seq(
      Ev(1, ts(5), 1L, "click", 1.0, "{}"),
      Ev(2, ts(30), 1L, "purchase", 2.0, "{}"),  // matched ← click 1
      Ev(3, ts(35), 3L, "purchase", 3.0, "{}"))  // user 3 has NO click → outer NULL row
    val advance = Seq(
      Ev(4, ts(200), 1L, "click", 4.0, "{}"))    // watermark → 190: closes purchase 3's window
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines.intervalJoinStream(mem.toDF(), "left_outer")
      .writeStream.format("memory").queryName("t_ij_outer")
      .outputMode("append").start()
    try {
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(advance: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = s.table("t_ij_outer").collect().toSeq
    val batch = EventsDemos.intervalJoin((first ++ advance).toDF(), "left_outer")
      .collect().toSeq
    assert(sort(streamed) === sort(batch), s"streamed=$streamed\nbatch=$batch")
    // the outer row is really there: purchase 3 with a NULL click
    assert(streamed.exists(r => r.getLong(0) == 3L && r.isNullAt(3)), streamed.toString)
  }

  test("first-touch: running-min state survives out-of-order micro-batches == batch face (X6f)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val batch1 = Seq(
      Ev(10, ts(50), 1L, "click", 1.0, "{}"),
      Ev(11, ts(40), 2L, "view", 1.0, "{}"))
    val batch2 = Seq(
      Ev(12, ts(5), 1L, "signup", 1.0, "{}"), // EARLIER, out of order → state must move down
      Ev(13, ts(60), 2L, "view", 1.0, "{}"))  // later → user 2 unchanged
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines.firstTouchStream(mem.toDF())
      .writeStream.format("memory").queryName("t_firsttouch")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // update-mode memory sink APPENDS each emission; emissions per user are
    // a running minimum, so the overall min per user IS the final state
    val streamedFinal = s.table("t_firsttouch").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> rs.minBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
      }
    val batchFace = EventsDemos.firstTouch((batch1 ++ batch2).toDF())
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(streamedFinal.keySet == batchFace.keySet)
    streamedFinal.foreach { case (u, r) =>
      val b = batchFace(u)
      assert(r.getTimestamp(1) == b.getTimestamp(1)
        && r.getLong(2) == b.getLong(2)
        && r.getString(3) == b.getString(3),
        s"user $u: streamed=$r batch=$b")
    }
    // and the out-of-order correction really happened
    assert(streamedFinal(1L).getLong(2) == 12L)
    assert(streamedFinal(2L).getLong(2) == 11L)
  }

  test("first-touch TTL: state evicted at the event-time horizon, re-arrival opens a new epoch (X6f)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingPipelines
      .firstTouchStreamTtl(mem.toDF(), watermark = "0 seconds",
        ttl = java.time.Duration.ofMinutes(60))
      .writeStream.format("memory").queryName("t_firsttouch_ttl")
      .outputMode("update").start()
    try {
      mem.addData(Ev(1, ts(100), 1L, "click", 1.0, "{}"))
      q.processAllAvailable() // u1 epoch 1 opens; timeout armed at ts(160)
      mem.addData(Ev(2, ts(400), 9L, "view", 1.0, "{}"))
      q.processAllAvailable() // watermark → ts(400) after this batch
      mem.addData(Ev(3, ts(410), 9L, "view", 1.0, "{}"))
      q.processAllAvailable() // wm ts(400) > ts(160): u1 evicted, silently
      // the re-arrival must sit AT/AFTER the watermark — anything behind
      // it is late data the watermark filter drops before the state fn
      mem.addData(Ev(99, ts(500), 1L, "click", 1.0, "{}"))
      q.processAllAvailable() // post-eviction arrival → NEW first touch
    } finally q.stop()
    val u1 = s.table("t_firsttouch_ttl").collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getTimestamp(1), r.getLong(2)))
    // epoch 1 was emitted, then evicted; epoch 2 re-attributed afresh —
    // the unbounded variant would have kept event 1 forever
    assert(u1.toSeq == Seq((ts(100), 1L), (ts(500), 99L)), u1.mkString(","))
  }
}
