package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.SparkSpec

/** The events reader must handle BOTH physical `ts` layouts the harness has
  * shipped (round-4 regression: the files flipped from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and the unconditional nanos conversion broke every
  * events query). Pins the type-conditional dispatch in
  * [[Tables.events]] both ways.
  */
class TablesSpec extends SparkSpec {

  test("events reader passes micros-timestamp files through unchanged") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-ev-micros").toString
    val t = Timestamp.valueOf("2024-03-01 12:34:56.789123")
    Seq((1L, t, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val df = Tables.table(s, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select("ts").head().getTimestamp(0) == t)
  }

  test("events reader reads naive-micros (NTZ-inferred) files as TimestampType") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-ev-ntz").toString
    val ldt = java.time.LocalDateTime.parse("2024-03-01T12:34:56.789123")
    // LocalDateTime encodes as TIMESTAMP_NTZ → parquet naive micros, the
    // current harness layout
    Seq((1L, ldt, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val df = Tables.table(s, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // UTC session → identical wall-clock value
    assert(df.select("ts").head().getTimestamp(0) ==
      Timestamp.valueOf("2024-03-01 12:34:56.789123"))
  }

  test("events reader converts legacy Long-nanos ts to micros timestamps") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-ev-nanos").toString
    val micros = Timestamp.valueOf("2024-03-01 12:34:56.789123")
    val nanos = micros.getTime / 1000 * 1000000000L +
      micros.getNanos // epoch-seconds part in nanos + sub-second nanos
    Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    assert(s.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == LongType)
    val df = Tables.table(s, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select("ts").head().getTimestamp(0) == micros)
  }

  test("harness sf0.001 events reads with a timestamp ts for either layout") {
    val df = Tables.table(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}
