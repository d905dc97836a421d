package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.TextDedup
import graft.queries.EventsDemos

/** Structured Streaming runtime for the windowed event aggregations
  * (SURVEY.md §2B X6). The transformations themselves live in
  * [[graft.queries.EventsDemos]] and are declared once — a batch DataFrame
  * or a streaming DataFrame flows through the same code, which is the core
  * Spark idiom: the logical plan is identical, only the sink/trigger layer
  * differs. StreamingSpec asserts streaming output == batch output over
  * the same rows (the only oracle available for a runtime behavior,
  * SURVEY §7.4.9).
  *
  * Scale: state is keyed on (window × event_type) / (user × session) —
  * bounded keys × bounded retention via watermark, so state store size is
  * O(active windows), not O(events). Late data beyond 10 minutes is
  * dropped deterministically by the watermark.
  */
object StreamingPipelines {

  /** Schema of the events table as ingested by [[graft.sources.Tables]]. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over a directory of events parquet —
    * the production entry: new files appearing under `dir` are discovered
    * per micro-batch. Expects microsecond TIMESTAMP files (Spark-written).
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Streaming reader for harness-shaped events directories that detects
    * the physical `ts` layout from the files already present (a streaming
    * source needs its schema up front, so we peek with a batch read):
    * legacy TIMESTAMP(NANOS) files go through the nanos→micros conversion,
    * TIMESTAMP(MICROS) files stream as-is — mirroring the type-conditional
    * batch reader ([[graft.sources.Tables.events]]) so batch and streaming
    * agree on either generation.
    */
  def readEventsStreamAuto(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.enableNanosAsLong(spark)
    graft.sources.Tables.enableLtzTimestamps(spark)
    spark.read.parquet(dir).schema("ts").dataType match {
      case LongType => readEventsStreamNanos(spark, dir)
      // Spark-written NTZ files keep their footer schema despite the
      // inference conf — stream them with an NTZ schema, then cast (same
      // normalization as the batch reader, value-identical under UTC).
      case TimestampNTZType =>
        val ntz = StructType(eventsSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
        spark.readStream.schema(ntz).parquet(dir)
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ => readEventsStream(spark, dir)
    }
  }

  /** Streaming reader for legacy harness events files whose `ts` is
    * parquet TIMESTAMP(NANOS) (see [[graft.sources.Tables.events]]): read
    * nanos as raw longs and truncate to microsecond TIMESTAMP — the same
    * conversion the batch reader applies, so batch and streaming agree.
    */
  def readEventsStreamNanos(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.enableNanosAsLong(spark)
    val nanosSchema = StructType(eventsSchema.map {
      case f if f.name == "ts" => f.copy(dataType = LongType)
      case f => f
    })
    graft.sources.Tables.nanosTsToMicros(
      spark.readStream.schema(nanosSchema).parquet(dir))
  }

  /** Tumbling 1-hour aggregation with a 10-minute watermark. Append mode
    * emits a window once the watermark passes its end — the streaming
    * analogue of EventsDemos x6a.
    */
  def tumblingStream(events: DataFrame): DataFrame =
    EventsDemos.tumbling(events.withWatermark("ts", "10 minutes"))

  /** Sliding (1 hour / 30 min) aggregation with watermark (x6b analogue). */
  def slidingStream(events: DataFrame): DataFrame =
    EventsDemos.sliding(events.withWatermark("ts", "10 minutes"))

  /** Session windows (30-minute gap) per user with watermark (x6c
    * analogue). session_window requires the watermark in streaming mode —
    * sessions close when the watermark passes last_ts + gap.
    */
  def sessionStream(events: DataFrame): DataFrame =
    EventsDemos.session(events.withWatermark("ts", "10 minutes"))

  /** Stream-stream event-time interval join (x6d/x6e analogue):
    * purchases joined to the same user's clicks from the preceding hour,
    * as a self-join of the watermarked stream. Inner matches emit as
    * soon as both sides arrive; with `joinType = "left_outer"` the
    * NULL-padded row for an unmatched purchase emits only once the
    * watermark CLOSES its join window (the engine must know no click can
    * still arrive) — expect outer rows one watermark-delay late, not
    * promptly. The time-range condition plus the watermark bounds the
    * symmetric hash-join state to (watermark delay + 1 hour) of rows per
    * side — without the range predicate Spark would have to retain every
    * row forever.
    */
  def intervalJoinStream(events: DataFrame,
      joinType: String = "inner"): DataFrame =
    EventsDemos.intervalJoin(events.withWatermark("ts", "10 minutes"),
      joinType)

  /** Stream–static enrichment (x6h analogue): the watermarked event
    * stream broadcast-joined to a STATIC dimension DataFrame, then the
    * tumbling agg by customer nation — the same declaration as the batch
    * face (EventsDemos.enrichedTumbling). Spark re-plans the static side
    * per micro-batch (picking up dim refreshes between batches); the
    * stateful agg keys on (window × nation), so state is bounded by the
    * watermark exactly as in the un-enriched tumbling stream.
    */
  def enrichedTumblingStream(events: DataFrame,
      customer: DataFrame): DataFrame =
    EventsDemos.enrichedTumbling(
      events.withWatermark("ts", "10 minutes"), customer)

  /** Streaming exact dedup (the streaming face of X1): duplicate keys
    * arriving within the watermark delay are dropped exactly once; state
    * holds one entry per key seen inside the watermark window and is
    * evicted as the watermark advances — O(keys-per-window), not
    * O(stream). A duplicate arriving after its key's state was evicted
    * passes through again: at-least-once sources re-delivering inside
    * their redelivery window (<< watermark) dedup exactly; infinite-
    * horizon dedup needs the batch exactDedup over the materialized
    * corpus instead.
    */
  def dedupStream(events: DataFrame, keys: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(keys.nonEmpty,
      "dedupStream needs at least one key column (all-column dedup would " +
        "make the event time part of the key and never match duplicates)")
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Streaming incremental near-dup ingestion — the streaming face of
    * X58 (`TextDedup.incrementalLshPairs`): documents arriving on a
    * stream probe a STATIC LSH band index and verify exactly, all
    * without stateful aggregation. Per micro-batch:
    *
    *   1. band keys per document via the stateless per-row expressions
    *      ([[graft.operators.TextDedup.shingleHashes]] in its own
    *      projection + [[graft.operators.TextDedup.lshBandKeys]]) — a
    *      streaming MinHash AGGREGATE would key state by doc id and
    *      hold it forever; a projection holds none,
    *   2. stream–static equi-join on (band, key) against the index
    *      (re-planned per batch — in production read the bucketed
    *      (band, key) store so the static side never shuffles),
    *   3. `dropDuplicatesWithinWatermark` collapses multi-band hits of
    *      the same (new, old) pair — the ONLY stateful operator, state
    *      bounded by pairs seen inside the watermark window,
    *   4. stream–static join to the corpus texts + exact
    *      [[graft.operators.TextDedup.textJaccard]] at `threshold`.
    *
    * Emits `(new_id, old_id, jaccard)` in append mode as batches
    * arrive. Same recall contract as x2b/x58. Docs under 3 tokens
    * cannot shingle and are filtered (the batch path's tokArrays
    * contract).
    */
  /** `newTexts` is the STATE-DIET knob (r14 verdict item 3): with the
    * default `None` every retained candidate-pair state row of step 3
    * carries the full arriving document's text (measured 12.3 GB of
    * state / ~64 rows per doc at the 2M-doc probe decade,
    * probes/r14) — the text rides through the band explode and the
    * stateful dedup only so the verify can read it afterwards. Pass
    * the ingest store of the arriving documents — a STATIC
    * `(idCol, textCol)` frame; the crawl loop persists accepted
    * batches anyway (x59's store machinery), and the probe's wave
    * files are exactly such a store — and the stateful dedup runs on
    * a text-free `(new_id, old_id, ts)` projection, state rows
    * shrinking by the text's share; the verify re-attaches the new
    * side's text by a stream-static join on `new_id` (stateless,
    * legal after the stateful operator in append mode). Output is
    * pair-for-pair identical PROVIDED the store covers every arriving
    * id — an id missing from the store drops its pairs at the inner
    * join (fail-soft: the verify cannot run without the text).
    * Spec-pinned: diet ≡ text-carrying on the same waves, including
    * cross-wave redelivery.
    */
  def incrementalLshStream(batch: DataFrame, index: DataFrame,
      corpus: DataFrame, idCol: String, textCol: String, threshold: Double,
      watermarkDelay: String = "10 minutes",
      newTexts: Option[DataFrame] = None): DataFrame = {
    val carryText = newTexts.isEmpty
    val shingled = batch.withWatermark("ts", watermarkDelay)
      .filter(size(split(col(textCol), " ")) >= 3)
      .withColumn("__hs", TextDedup.shingleHashes(col(textCol)))
    val keyed =
      (if (carryText)
        shingled.select(col(idCol).as("new_id"), col("ts"),
          col(textCol).as("__new_text"),
          explode(TextDedup.lshBandKeys(col("__hs"))).as("bk"))
      else
        shingled.select(col(idCol).as("new_id"), col("ts"),
          explode(TextDedup.lshBandKeys(col("__hs"))).as("bk")))
        .withColumn("band", col("bk.band"))
        .withColumn("key", col("bk.key"))
        .drop("bk")
    val cand = keyed
      .join(index.select(col("doc_id").as("old_id"), col("band"), col("key")),
        Seq("band", "key"))
      // the probed (band, key) is dead weight past the join — drop it
      // BEFORE the stateful dedup so retained state rows don't carry it
      .drop("band", "key")
      .dropDuplicatesWithinWatermark("new_id", "old_id")
    // the ingest store is APPEND-mode and at-least-once: cross-wave
    // redelivery lands the same id more than once (the probe's wave
    // files do exactly this), and an un-deduped static side would fan
    // the inner join out — silently duplicating (new_id, old_id) pairs
    // and breaking the pair-for-pair equivalence with the text-carrying
    // face (r15 advice). One aggregate collapses the store to one text
    // per id; max() rather than dropDuplicates so the pick stays
    // deterministic even if a store ever held conflicting texts for an
    // id (an input-contract violation, but a stable one).
    val withNewText = newTexts.fold(cand)(nt =>
      cand.join(nt.groupBy(col(idCol).as("new_id"))
        .agg(max(col(textCol)).as("__new_text")), "new_id"))
    withNewText
      .join(corpus.select(col(idCol).as("old_id"),
        col(textCol).as("__old_text")), "old_id")
      .select(col("new_id"), col("old_id"),
        TextDedup.textJaccard(col("__new_text"), col("__old_text")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Wire an aggregated streaming DataFrame to an in-memory sink (used by
    * tests and local inspection) and START it; callers await/stop the
    * returned query and read results from `spark.table(queryName)`.
    */
  def toMemorySink(df: DataFrame, queryName: String): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** foreachBatch sink into a BUCKETED warehouse table — the streaming-
    * ingest-to-warehouse shape ([[graft.operators.ScaleOps.writeBucketed]]
    * is the batch face of the same table): each micro-batch of closed
    * windows appends into an external parquet table bucketed on `keys`,
    * so downstream batch joins/aggregations on those keys read co-located
    * buckets with NO exchange while ingest remains incremental. The
    * checkpoint makes re-runs resume instead of re-appending; appends
    * add files per bucket id, which bucketed scans merge per bucket.
    *
    * Scale: each micro-batch writes only its own closed windows (append
    * mode) — the table grows monotonically, nothing is rewritten; the
    * bucket count is fixed at creation, sized for the table's final
    * volume like any bucketed materialization.
    */
  def toBucketedTableSink(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append")
          .bucketBy(buckets, keys.head, keys.tail: _*)
          .option("path", path)
          .format("parquet")
          .saveAsTable(table)
      }
      .start()

  // -------------------------------------------------------------------
  // Custom-state sessionization via flatMapGroupsWithState — the
  // KeyValueGroupedDataset state API (SURVEY.md §2B X6), for session
  // semantics session_window can't express (e.g. carrying running
  // aggregates in the emitted row). State per user = the single open
  // session; closed sessions emit either when a newer event proves the
  // gap or when the event-time watermark passes last_ts + gap.
  // Money sums are tracked in exact integer cents so emission order never
  // perturbs totals.
  // -------------------------------------------------------------------

  /** The open-session state carried per user. */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, cents: Long)

  /** One emitted (closed) session. */
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      last_event: java.sql.Timestamp, n_events: Long, total_cents: Long)

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Stateful sessionization over a (watermarked) streaming events frame.
    * Scale: state is one OpenSession per active user — O(active users),
    * bounded by the event-time timeout; the shuffle is one hash exchange
    * on user_id, identical to session_window's.
    *
    * Out-of-order contract: an event within `gapMs` of the open session's
    * span extends it (either end); events more than a gap OLDER than the
    * session's start session among THEMSELVES within the micro-batch
    * (batch session_window semantics), merging into the open session if
    * their run grows to within a gap of its start, else closing when the
    * batch ends. With the default watermark delay (10 min) < gap (30 min)
    * the runtime's late-row filter makes the stray path unreachable; it
    * exists (and is spec-tested via the parameters) for configurations
    * where the delay exceeds the gap.
    */
  def statefulSessions(events: DataFrame, gapMs: Long = SessionGapMs,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[OpenSession]) =>
          var out = List.empty[SessionOut]
          def close(s: OpenSession): Unit =
            out ::= SessionOut(user, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.n, s.cents)
          if (state.hasTimedOut) {
            state.getOption.foreach(close)
            state.remove()
          } else {
            var cur = state.getOption
            // events more than a gap OLDER than the open session's start
            // can never join it, but CAN session among themselves — `stray`
            // accumulates them (sorted input ⇒ strays only extend upward)
            // so batch session_window semantics hold within the micro-batch
            var stray = Option.empty[OpenSession]
            // NOTE: the group's micro-batch rows buffer in memory for the
            // sort — fine for per-user event rates; a pathologically hot
            // key (bot traffic) needs upstream salting/filtering, the
            // standard skew guard for any per-key stateful op
            rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
              val ms = ts.getTime
              val cents = math.round(v * 100)
              cur match {
                case Some(s) if ms - s.lastMs <= gapMs
                    && ms >= s.startMs - gapMs =>
                  // merge only when the event is within the gap of the open
                  // session's SPAN. startMs may move DOWN: a not-yet-late
                  // out-of-order event from a later micro-batch can precede
                  // the open session's first event (session_window merges it
                  // the same way)
                  cur = Some(s.copy(startMs = math.min(s.startMs, ms),
                    lastMs = math.max(s.lastMs, ms),
                    n = s.n + 1, cents = s.cents + cents))
                case Some(_) if ms < cur.get.startMs - gapMs =>
                  // stray path: session the stray with its stray neighbors
                  // (an older stray run more than a gap below this event is
                  // final — nothing later can reach back down to it)
                  stray match {
                    case Some(st) if ms - st.lastMs <= gapMs =>
                      stray = Some(st.copy(lastMs = ms,
                        n = st.n + 1, cents = st.cents + cents))
                    case other =>
                      other.foreach(close)
                      stray = Some(OpenSession(ms, ms, 1, cents))
                  }
                case Some(s) =>
                  close(s)
                  cur = Some(OpenSession(ms, ms, 1, cents))
                case None =>
                  cur = Some(OpenSession(ms, ms, 1, cents))
              }
            }
            // a stray run that grew to within a gap of the open session's
            // start belongs to it (session_window would merge them); else
            // it is final — nothing in a later batch can be old enough to
            // extend it without being more than a gap below `cur` too
            (stray, cur) match {
              case (Some(st), Some(s)) if s.startMs - st.lastMs <= gapMs =>
                cur = Some(s.copy(startMs = st.startMs,
                  n = s.n + st.n, cents = s.cents + st.cents))
              case (Some(st), _) => close(st)
              case _ =>
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
          }
          out.reverseIterator
      }
  }

  // -------------------------------------------------------------------
  // Streaming first-touch attribution via mapGroupsWithState — the
  // running-min state shape (X6f): per user, the earliest event ever
  // seen, with a deterministic (ts, event_id) tiebreak. The batch face
  // is EventsDemos.firstTouch (a min_by aggregate, oracle-checked).
  // -------------------------------------------------------------------

  /** The per-user first event — both the state AND the emitted row. */
  case class FirstTouch(user_id: Long, first_ts: java.sql.Timestamp,
      first_event_id: Long, first_event_type: String)

  /** Streaming first-touch: emits each user's current first event on
    * every micro-batch that touches the user (Update mode — the LAST
    * emission per user is the answer; a keyed sink upserts it). Ties and
    * out-of-order arrivals are handled by the total (ts, event_id)
    * order at FULL timestamp precision (`Timestamp.compareTo` includes
    * nanos), so replaying batches in any split yields the same state.
    *
    * Scale: state is ONE small row per user ever seen — the attribution
    * contract ("first touch, forever") genuinely needs it; for an
    * unbounded id space use [[firstTouchStreamTtl]], which evicts on an
    * event-time horizon.
    * Shuffle is one hash exchange on user_id; per-batch work is a fold
    * over the group's rows (no sort, no buffering).
    */
  def firstTouchStream(events: DataFrame): Dataset[FirstTouch] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[FirstTouch, FirstTouch](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[FirstTouch]) =>
          def earlier(ts: java.sql.Timestamp, id: Long, cur: FirstTouch): Boolean = {
            val c = ts.compareTo(cur.first_ts)
            c < 0 || (c == 0 && id < cur.first_event_id)
          }
          var best = state.getOption
          rows.foreach { case (_, ts, id, et) =>
            if (best.forall(earlier(ts, id, _)))
              best = Some(FirstTouch(user, ts, id, et))
          }
          state.update(best.get) // rows is non-empty for a data-triggered group
          best.get
      }
  }

  /** [[firstTouchStream]] with a bounded attribution horizon — the
    * unbounded-id-space variant its contract calls for: a user's
    * first-touch state lives until the WATERMARK passes
    * `first_ts + ttl`, then is evicted (EventTimeTimeout). Events
    * arriving after eviction open a NEW attribution epoch with a fresh
    * first touch — the "first touch within a campaign window" semantics.
    * Requires a watermark on `ts` (the caller chooses the lateness
    * bound); emits via flatMap so timeout wakeups emit nothing.
    *
    * Scale: state is one small row per user seen WITHIN the horizon —
    * bounded by active users × ttl, not by the id space; eviction is the
    * state store's timestamp scan, no full-state sweep per batch.
    */
  def firstTouchStreamTtl(events: DataFrame, watermark: String,
      ttl: java.time.Duration): Dataset[FirstTouch] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FirstTouch, FirstTouch](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (_, _, state: GroupState[FirstTouch]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (user, rows, state: GroupState[FirstTouch]) =>
          def earlier(ts: java.sql.Timestamp, id: Long, cur: FirstTouch): Boolean = {
            val c = ts.compareTo(cur.first_ts)
            c < 0 || (c == 0 && id < cur.first_event_id)
          }
          var best = state.getOption
          rows.foreach { case (_, ts, id, et) =>
            if (best.forall(earlier(ts, id, _)))
              best = Some(FirstTouch(user, ts, id, et))
          }
          state.update(best.get)
          // an epoch opened entirely BEHIND the watermark (late first
          // touch) still lives one batch: a timeout at/before the
          // current watermark is rejected by the state store, so clamp
          // to watermark + 1ms
          state.setTimeoutTimestamp(
            math.max(best.get.first_ts.getTime + ttl.toMillis,
              state.getCurrentWatermarkMs() + 1L))
          Iterator.single(best.get)
      }
  }
}
