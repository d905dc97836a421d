package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

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
    * per micro-batch.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

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

  /** Wire an aggregated streaming DataFrame to an in-memory sink (used by
    * tests and local inspection); returns the started query's writer for
    * the caller to manage.
    */
  def toMemorySink(df: DataFrame, queryName: String): DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
}
