package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SaveMode}

import graft.SparkSpec

/** File-source streaming (the production entry of StreamingPipelines):
  * events parquet files appearing in a directory stream through the
  * tumbling aggregation across micro-batches, and a row arriving after
  * the watermark passed its window is dropped.
  */
class FileStreamSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("file source streams new files; late row beyond watermark is dropped") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    def write(evs: Seq[Ev]): Unit =
      evs.toDF().coalesce(1).write.mode(SaveMode.Append).parquet(dir)

    // batch 1: one row in hour 0, one in hour 1 → after this batch the
    // watermark is 01:10 - 10min = 01:00
    write(Seq(
      Ev(1, ts(10), 1L, "click", 10.0, "{}"),
      Ev(2, ts(70), 1L, "click", 20.0, "{}")))
    val q = StreamingPipelines.tumblingStream(
        StreamingPipelines.readEventsStream(s, dir))
      .writeStream.format("memory").queryName("t_file")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: a far-future row (advances the watermark past hours 0-1)
    // and a LATE row for hour 0 — the watermark (01:00) must drop it
    write(Seq(
      Ev(3, ts(300), 1L, "click", 30.0, "{}"),
      Ev(4, ts(11), 1L, "click", 999.0, "{}")))
    q.processAllAvailable()
    q.stop()

    val rows = s.table("t_file")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    assert(rows("2024-01-01 00:00:00.0") == 1L,
      s"late row was not dropped (hour-0 count): $rows")
    assert(rows("2024-01-01 01:00:00.0") == 1L, rows.toString)
    assert(!rows.keys.exists(_.startsWith("2024-01-01 05:")),
      s"hour-5 window should still be open: $rows")
  }

  test("incremental LSH stream over arriving doc files equals the batch X58 face") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (1L, base), (2L, base),
      (3L, "completely different words about spark shuffles and joins here"))
      .toDF("doc_id", "text")
    // batch: 9 and 14 duplicate the corpus base; 19 matches nothing; 20
    // is sub-shingle (2 tokens) and must be filtered, not crash
    val batchDocs = Seq((9L, base), (14L, base),
      (19L, "unrelated text with no overlap at all in any shingle window"),
      (20L, "too short"))
    val index = graft.operators.TextDedup.lshIndex(corpus, "doc_id", "text")
      .localCheckpoint(true) // the production shape: a STORED index
    val dir = Files.createTempDirectory("graft-lsh-stream").toString
    def write(docs: Seq[(Long, String)], min: Int): Unit =
      docs.map { case (id, tx) => (id, tx, ts(min)) }
        .toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
    // two arrival waves — candidates must stream out per batch, and the
    // pair state must dedup the re-delivered doc 9 in wave 2
    write(Seq(batchDocs(0), batchDocs(3)), 10)
    val stream = s.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, text STRING, ts TIMESTAMP")).parquet(dir)
    val q = StreamingPipelines.incrementalLshStream(
        stream, index, corpus, "doc_id", "text", threshold = 0.5)
      .writeStream.format("memory").queryName("t_lsh")
      .outputMode("append").start()
    q.processAllAvailable()
    write(Seq(batchDocs(0), batchDocs(1), batchDocs(2)), 20)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("t_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchFace = graft.operators.TextDedup.incrementalLshPairs(
        batchDocs.toDF("doc_id", "text"), corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batchFace, s"stream-only=${streamed.diff(batchFace).take(3)} " +
      s"batch-only=${batchFace.diff(streamed).take(3)}")
    assert(streamed === Set((9L, 1L, 1.0), (9L, 2L, 1.0),
      (14L, 1L, 1.0), (14L, 2L, 1.0)))
  }

  test("incremental LSH stream state diet (newTexts) ≡ text-carrying face") {
    // r14 verdict item 3: with `newTexts` (the arriving docs' ingest
    // store as a static frame) the stateful pair dedup runs on a
    // text-free projection and the verify re-attaches the text by a
    // stream-static join — output must be pair-for-pair the
    // text-carrying face's, across multiple waves INCLUDING the
    // cross-wave redelivery of doc 9 (the state row that dedups it no
    // longer carries the text that used to ride along)
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (1L, base), (2L, base),
      (3L, "completely different words about spark shuffles and joins here"))
      .toDF("doc_id", "text")
    val batchDocs = Seq((9L, base), (14L, base),
      (19L, "unrelated text with no overlap at all in any shingle window"),
      (20L, "too short"))
    val index = graft.operators.TextDedup.lshIndex(corpus, "doc_id", "text")
      .localCheckpoint(true)
    val dir = Files.createTempDirectory("graft-lsh-diet").toString
    def write(docs: Seq[(Long, String)], min: Int): Unit =
      docs.map { case (id, tx) => (id, tx, ts(min)) }
        .toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
    write(Seq(batchDocs(0), batchDocs(3)), 10)
    val stream = s.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, text STRING, ts TIMESTAMP")).parquet(dir)
    // the store is APPEND-mode: cross-wave redelivery means doc 9's row
    // appears TWICE (wave 1 and wave 2 both persisted it) — the diet
    // join must not fan out on the duplicate id (r15 advice: the
    // original spec only ever fed unique ids, leaving the fanout path
    // untested)
    val ingestStore = (batchDocs ++ Seq(batchDocs(0)))
      .toDF("doc_id", "text")
    val q = StreamingPipelines.incrementalLshStream(
        stream, index, corpus, "doc_id", "text", threshold = 0.5,
        newTexts = Some(ingestStore))
      .writeStream.format("memory").queryName("t_lsh_diet")
      .outputMode("append").start()
    q.processAllAvailable()
    write(Seq(batchDocs(0), batchDocs(1), batchDocs(2)), 20)
    q.processAllAvailable()
    q.stop()
    val streamedRows = s.table("t_lsh_diet").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // pair-for-pair equivalence is a MULTISET claim: the duplicated
    // store row must not emit any pair twice (a Set-only assertion
    // would hide the fanout)
    assert(streamedRows.size === streamedRows.toSet.size,
      s"duplicate pairs emitted: ${streamedRows.groupBy(identity)
        .filter(_._2.size > 1).keys.take(3)}")
    // the text-carrying face's pinned output (previous test) — diet
    // must emit exactly it
    assert(streamedRows.toSet === Set((9L, 1L, 1.0), (9L, 2L, 1.0),
      (14L, 1L, 1.0), (14L, 2L, 1.0)))
  }

  test("harness events stream (auto ts layout) equals the batch tumbling agg") {
    val s = spark
    val dir = Files.createTempDirectory("graft-nanos").toString
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val q = StreamingPipelines.toMemorySink(
      StreamingPipelines.tumblingStream(
        StreamingPipelines.readEventsStreamAuto(s, dir)), "t_nanos")
    q.awaitTermination()
    val streamed = s.table("t_nanos").collect()
      .map(_.mkString("|")).toSet
    val batch = graft.queries.EventsDemos.tumbling(
        graft.sources.Tables.table(s, "/root/testdata/sf0.001", "events"))
      .collect().map(_.mkString("|")).toSet
    // append mode withholds windows the watermark hasn't passed; everything
    // emitted must match the batch result and cover most of it
    assert(streamed.subsetOf(batch), s"diff=${streamed.diff(batch).take(3)}")
    assert(streamed.size >= batch.size - 2, s"${streamed.size} vs ${batch.size}")
  }

  test("bench-scale sf0.1 events: file stream EQUALS the batch tumbling agg exactly") {
    // the X6 batch≡streaming claim at bench scale (round-1 verdict item 8):
    // stream the full sf0.1 events table, then append a far-future sentinel
    // so the watermark passes every real window — append mode must then
    // have emitted EXACTLY the batch result (the sentinel's own window
    // stays open and never emits).
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-sf01-stream").toString
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.1/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val batchEvents = graft.sources.Tables.table(s, "/root/testdata/sf0.1", "events")
    val batch = graft.queries.EventsDemos.tumbling(batchEvents)
      .collect().map(_.mkString("|")).toSet
    val maxTs = batchEvents.agg(org.apache.spark.sql.functions.max("ts"))
      .head().getTimestamp(0)

    val q = StreamingPipelines.tumblingStream(
        StreamingPipelines.readEventsStreamAuto(s, dir))
      .writeStream.format("memory").queryName("t_sf01")
      .outputMode("append").start()
    q.processAllAvailable()
    // sentinel 2h past the max real event, in the same micros-timestamp
    // layout as the harness files the auto reader detected
    Seq(Ev(999999999L, new Timestamp(maxTs.getTime + 2 * 3600 * 1000L),
        999L, "sentinel", 0.0, "{}"))
      .toDF().coalesce(1).write.mode(SaveMode.Append).parquet(dir)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("t_sf01").collect().map(_.mkString("|")).toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"missing=${batch.diff(streamed).take(3)} extra=${streamed.diff(batch).take(3)}")
  }

  test("foreachBatch bucketed-table sink: streamed table equals batch agg, bucket-wise") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-bkt-src").toString
    val path = Files.createTempDirectory("graft-bkt-tbl").toString
    val ckpt = Files.createTempDirectory("graft-bkt-ckpt").toString
    val table = "t_bucketed_ingest"
    s.sql(s"DROP TABLE IF EXISTS $table")
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val batchEvents = graft.sources.Tables.table(s, "/root/testdata/sf0.001", "events")
    val batch = graft.queries.EventsDemos.tumbling(batchEvents)
      .collect().map(_.mkString("|")).toSet
    val maxTs = batchEvents.agg(org.apache.spark.sql.functions.max("ts"))
      .head().getTimestamp(0)

    // ingest run 1: the real events
    StreamingPipelines.toBucketedTableSink(
      StreamingPipelines.tumblingStream(
        StreamingPipelines.readEventsStreamAuto(s, dir)),
      table, buckets = 4, keys = Seq("event_type"), path, ckpt)
      .awaitTermination()
    // ingest run 2 (a NEW query over the same checkpoint): a far-future
    // sentinel closes every real window, so append mode emits the rest
    Seq(Ev(999999999L, new Timestamp(maxTs.getTime + 2 * 3600 * 1000L),
        999L, "sentinel", 0.0, "{}"))
      .toDF().coalesce(1).write.mode(SaveMode.Append).parquet(dir)
    StreamingPipelines.toBucketedTableSink(
      StreamingPipelines.tumblingStream(
        StreamingPipelines.readEventsStreamAuto(s, dir)),
      table, buckets = 4, keys = Seq("event_type"), path, ckpt)
      .awaitTermination()

    // the ingested table IS the batch result (the sentinel's own window
    // stays open and never emits)
    val streamed = s.table(table).collect().map(_.mkString("|")).toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"missing=${batch.diff(streamed).take(3)} extra=${streamed.diff(batch).take(3)}")
    // and it really is bucketed: an aggregation on the bucket key plans
    // with NO shuffle exchange (the point of bucketing the sink)
    val agg = s.table(table).groupBy("event_type").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), plan.take(2000))
    s.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("stream-static enrichment: streamed result equals the batch x6h face") {
    val s = spark
    val dir = Files.createTempDirectory("graft-enrich").toString
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val dim = graft.sources.Tables.table(s, "/root/testdata/sf0.001", "customer")
    val q = StreamingPipelines.toMemorySink(
      StreamingPipelines.enrichedTumblingStream(
        StreamingPipelines.readEventsStreamAuto(s, dir), dim), "t_enrich")
    q.awaitTermination()
    val streamed = s.table("t_enrich").collect()
      .map(_.mkString("|")).toSet
    val batch = graft.queries.EventsDemos.enrichedTumbling(
        graft.sources.Tables.table(s, "/root/testdata/sf0.001", "events"), dim)
      .collect().map(_.mkString("|")).toSet
    // append mode withholds windows the watermark hasn't passed; all
    // emitted rows must match the batch result and cover most of it
    assert(streamed.subsetOf(batch), s"diff=${streamed.diff(batch).take(3)}")
    // only the final open hour's windows (≤ one per nation) are withheld
    assert(streamed.nonEmpty && streamed.size >= batch.size - 25,
      s"${streamed.size} vs ${batch.size}")
  }

  test("auto reader streams legacy Long-nanos events via the nanos path") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-legacy-nanos").toString
    def nanos(min: Int): Long = ts(min).getTime * 1000000L
    Seq(
      (1L, nanos(10), 1L, "click", 10.0, "{}"),
      (2L, nanos(300), 1L, "click", 30.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
    val q = StreamingPipelines.tumblingStream(
        StreamingPipelines.readEventsStreamAuto(s, dir))
      .writeStream.format("memory").queryName("t_legacy")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // hour-0 window closed by the hour-5 row advancing the watermark
    val rows = s.table("t_legacy")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    assert(rows("2024-01-01 00:00:00.0") == 1L, rows.toString)
  }

  test("maxFilesPerTrigger paces ingestion into multiple micro-batches") {
    val s = spark
    val dir = Files.createTempDirectory("graft-paced").toString
    val events = graft.sources.Tables.table(s, "/root/testdata/sf0.001", "events")
    events.repartition(4).write.mode(SaveMode.Overwrite).parquet(dir)
    val q = s.readStream
      .schema(StreamingPipelines.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.format("memory").queryName("t_paced")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one data file per micro-batch: at least 4 non-empty batches ran
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 4, s"expected >= 4 paced batches, got $dataBatches")
    val streamed = s.table("t_paced").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("JSONL file source streams the x24 interchange format; agg equals batch") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-jsonl-stream").toString
    val docs = graft.sources.Tables
      .table(s, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    docs.write.mode(SaveMode.Overwrite).json(dir)
    // stream the JSONL directory with an EXPLICIT schema (no inference
    // pre-scan — the same contract as the x24 batch reader)
    val q = s.readStream.schema(docs.schema).json(dir)
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.format("memory").queryName("t_jsonl")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = s.table("t_jsonl").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming parquet sink with checkpoint persists closed windows") {
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("graft-src").toString
    val out = Files.createTempDirectory("graft-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    Seq(
      Ev(1, ts(10), 1L, "click", 10.0, "{}"),
      Ev(2, ts(300), 1L, "click", 30.0, "{}"))
      .toDF().coalesce(1).write.mode(SaveMode.Append).parquet(src)
    val q = StreamingPipelines.tumblingStream(
        StreamingPipelines.readEventsStream(s, src))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    // second batch closes hour 0 against the advanced watermark
    Seq(Ev(3, ts(700), 1L, "click", 1.0, "{}"))
      .toDF().coalesce(1).write.mode(SaveMode.Append).parquet(src)
    q.processAllAvailable()
    q.stop()
    val persisted = s.read.parquet(out)
    assert(persisted.count() >= 2, persisted.collect().mkString(";"))
  }

  test("checkpoint RECOVERY: a mid-stream kill resumes exactly-once from offsets AND agg state") {
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("graft-rec-src").toString
    val out = Files.createTempDirectory("graft-rec-out").toString
    val ckpt = Files.createTempDirectory("graft-rec-ckpt").toString
    def write(evs: Seq[Ev]): Unit =
      evs.toDF().coalesce(1).write.mode(SaveMode.Append).parquet(src)
    // the fault fires BEFORE the sink write, so sink output stays
    // exactly-once and the test isolates what the CHECKPOINT must
    // recover across an ABNORMAL termination: committed source offsets
    // (the input file must not re-read) and the open-window state store
    // (the windows to emit exist ONLY there — their events are in no
    // unprocessed input, so a lost state store would surface as a gap)
    val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def sink() =
      StreamingPipelines.tumblingStream(
          StreamingPipelines.readEventsStream(s, src))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (armed.get && !batch.isEmpty)
            throw new RuntimeException("injected mid-stream kill")
          batch.write.mode(SaveMode.Append).parquet(out)
        }
        .start()

    // run 1: the input file's batch commits (offsets advance, hours
    // 0/1/2 sit open in state, the watermark reaches 02:20), then the
    // query DIES on the first batch that tries to emit a closed window
    write(Seq(
      Ev(1, ts(10), 1L, "click", 10.0, "{}"),
      Ev(2, ts(20), 1L, "view", 1.0, "{}"),
      Ev(3, ts(70), 2L, "click", 20.0, "{}"),
      Ev(4, ts(150), 2L, "click", 5.0, "{}")))
    armed.set(true)
    val q1 = sink()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(!q1.isActive, "the injected fault must kill the query")
    assert(scala.util.Try(s.read.parquet(out).count()).getOrElse(0L) === 0L,
      "nothing may emit before the kill")

    // run 2: SAME checkpoint, fault disarmed — the uncommitted emitting
    // batch replays (hours 0 and 1 from RESTORED state), then a
    // far-future sentinel closes hour 2
    armed.set(false)
    val q2 = sink()
    q2.processAllAvailable()
    assert(s.read.parquet(out).count() > 0,
      "restart must emit the windows the killed run left in state")
    write(Seq(Ev(9, ts(600), 9L, "sentinel", 0.0, "{}")))
    q2.processAllAvailable()
    q2.stop()

    // exactly-once across the kill: multiset equality with the batch
    // result over the same events (sentinel's own window never closes)
    val emitted = s.read.parquet(out).collect().map(_.mkString("|")).toSeq
    assert(emitted.length === emitted.toSet.size,
      s"duplicate emissions after restart: $emitted")
    val batch = graft.queries.EventsDemos.tumbling(
        s.read.schema(StreamingPipelines.eventsSchema).parquet(src)
          .filter($"event_type" =!= "sentinel"))
      .collect().map(_.mkString("|")).toSet
    assert(emitted.toSet === batch,
      s"missing=${batch.diff(emitted.toSet)} extra=${emitted.toSet.diff(batch)}")

    // run 3: a restart with NO new input appends nothing — the
    // checkpoint makes re-runs resume, not re-emit
    val before = s.read.parquet(out).count()
    val q3 = sink()
    q3.processAllAvailable()
    q3.stop()
    assert(s.read.parquet(out).count() === before,
      "an idle restart re-appended rows")
  }
}
