package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingEvents
import graft.streaming.StreamingEvents.Ev

/** Streaming semantics pinned against their batch twins: tumbling-window
  * counts must equal the batch aggregation; flatMapGroupsWithState
  * sessionization must emit exactly the closed sessions (the trailing
  * open session per user stays in state awaiting its event-time
  * timeout). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("upsertStream merges micro-batches; checkpoint restart is exactly-once") {
    val base = Files.createTempDirectory("graft_upsert")
    val (src, ckpt, tbl) = (s"$base/src", s"$base/ckpt", s"$base/tbl")
    val schema = "trip_id STRING, fare DOUBLE, year INT, month INT"
    def run(): Long = {
      val q = StreamingEvents.upsertStream(
        spark.readStream.schema(schema).parquet(src), tbl, "trip_id", ckpt)
      q.awaitTermination(120000)
      q.recentProgress.map(_.numInputRows).sum
    }
    Seq(("k1", 1.0, 2024, 1), ("k2", 2.0, 2024, 1))
      .toDF("trip_id", "fare", "year", "month").write.mode("append").parquet(src)
    assert(run() == 2) // persisted batch: the source is read exactly once
    // new file with an overlapping key: restart resumes from the
    // checkpoint and processes ONLY the new rows
    Seq(("k2", 20.0, 2024, 1), ("k3", 3.0, 2024, 2))
      .toDF("trip_id", "fare", "year", "month").write.mode("append").parquet(src)
    assert(run() == 2)
    val byKey = spark.read.parquet(tbl).collect()
      .map(r => r.getString(r.fieldIndex("trip_id")) -> r.getDouble(r.fieldIndex("fare"))).toMap
    assert(byKey == Map("k1" -> 1.0, "k2" -> 20.0, "k3" -> 3.0))
    // nothing new: restart is a no-op
    assert(run() == 0)
    assert(spark.read.parquet(tbl).count() == 3)
  }

  test("streaming tumbling counts equal the batch aggregation") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:55:00"), 7L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 11:05:00"), 8L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 11:20:00"), 7L, "view", 1.0, "{}"))
    val dir = Files.createTempDirectory("graft_stream").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    val q = StreamingEvents.tumblingCounts(StreamingEvents.fromParquetDir(spark, dir))
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("tumbling_test")
      .orderBy("window_start", "event_type")
      .as[(Timestamp, String, Long)].collect().toSeq
    assert(got == Seq(
      (ts("2024-01-01 10:00:00"), "click", 2L),
      (ts("2024-01-01 11:00:00"), "view", 2L)))
  }

  test("streaming sliding totals equal the batch sliding aggregation") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:40:00"), 7L, "click", 1.5, "{}"),
      (2L, ts("2024-01-01 11:10:00"), 7L, "click", 2.5, "{}"))
    val dir = Files.createTempDirectory("graft_sliding").toString
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(dir)

    val q = StreamingEvents.slidingTotals(
        spark.readStream.schema(df.schema).parquet(dir), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("sliding_test").orderBy("window_start").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("window_start").toString,
        r.getLong(2), r.getDouble(3))).toSeq
    // 10:40 → windows 10:00/10:30; 11:10 → 10:30/11:00 (10:30 holds both)
    assert(got == Seq(
      ("2024-01-01T10:00", 1L, 1.5),
      ("2024-01-01T10:30", 2L, 4.0),
      ("2024-01-01T11:00", 1L, 2.5)))
    // bit-comparable to the batch twin on the same input
    val batch = graft.operators.Events.sliding(spark.read.parquet(dir),
      "1 hour", "30 minutes").orderBy("window_start").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("window_start").toString,
        r.getLong(2), r.getDouble(3))).toSeq
    assert(batch == got)
  }

  test("stream-static enrichment join drops unmapped types, aggregates per tier") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.25, "{}"),
      (2L, ts("2024-01-01 10:25:00"), 8L, "view", 2.25, "{}"),
      (3L, ts("2024-01-01 10:45:00"), 7L, "purchase", 10.0, "{}"),
      (4L, ts("2024-01-01 10:50:00"), 9L, "unmapped", 99.0, "{}")) // no dim row
    val dir = Files.createTempDirectory("graft_static_join").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val dim = Seq("click" -> "engagement", "view" -> "engagement",
      "purchase" -> "conversion").toDF("event_type", "tier")
    val q = StreamingEvents.tierTotals(StreamingEvents.fromParquetDir(spark, dir), dim)
      .writeStream.format("memory").queryName("static_join_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("static_join_test")
      .select($"tier", $"n_events", $"total_value")
      .orderBy("tier").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("conversion", 1L, 10.0), ("engagement", 2L, 3.5)))
  }

  test("dropDuplicatesWithinWatermark dedups with bounded state") {
    // the production variant of stream_dedup_exact: state for a key is
    // dropped once the watermark passes it, so state is bounded by the
    // watermark horizon instead of the full key history
    val rows = Seq(
      ("a", ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-01 10:05:00")), // dup within the horizon
      ("b", ts("2024-01-01 10:30:00")))
    val dir = Files.createTempDirectory("graft_wmdedup").toString
    rows.toDF("k", "ts").write.mode("overwrite").parquet(dir)
    val q = spark.readStream.schema("k STRING, ts TIMESTAMP").parquet(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.format("memory").queryName("wmdedup_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("wmdedup_test").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("a", "b"))
  }

  test("stream-stream interval join equals the batch join on a bounded replay") {
    val imps = Seq((7L, ts("2024-01-01 10:00:00"), 0.0),
      (8L, ts("2024-01-01 10:00:00"), 0.0))
    val clicks = Seq(
      (7L, ts("2024-01-01 10:05:00"), 1.5), // inside the 10 min window
      (7L, ts("2024-01-01 10:20:00"), 2.5), // outside — dropped
      (9L, ts("2024-01-01 10:01:00"), 3.5)) // no impression — dropped
    val base = Files.createTempDirectory("graft_ssjoin")
    val (ldir, rdir) = (s"$base/l", s"$base/r")
    imps.toDF("user_id", "ts", "value").write.parquet(ldir)
    clicks.toDF("user_id", "ts", "value").write.parquet(rdir)
    def src(dir: String) =
      spark.readStream.schema("user_id LONG, ts TIMESTAMP, value DOUBLE").parquet(dir)
    val q = StreamingEvents.intervalJoin(src(ldir), src(rdir), "user_id", 10)
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ssjoin_test").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getDouble(3))).toSeq
    assert(got == Seq((7L, ts("2024-01-01 10:05:00"), 1.5)))
    // identical to the batch interval join on the same inputs
    val batch = StreamingEvents.intervalJoin(
      spark.read.parquet(ldir), spark.read.parquet(rdir), "user_id", 10)
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getDouble(3))).toSeq
    assert(batch == got)
  }

  test("streaming sessionize emits closed sessions, holds the open one") {
    val input = MemoryStream[Ev](spark)
    val q = StreamingEvents.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    input.addData(
      Ev(7L, ts("2024-01-01 10:00:00"), "a", 1.0),
      Ev(7L, ts("2024-01-01 10:10:00"), "a", 2.0),
      Ev(7L, ts("2024-01-01 11:30:00"), "a", 4.0), // closes session 1
      Ev(8L, ts("2024-01-01 09:00:00"), "b", 8.0))
    q.processAllAvailable()
    val got = spark.table("session_test")
      .orderBy("user_id", "session_start")
      .as[StreamingEvents.Session].collect().toSeq
    // user 7's first session closed by the in-batch gap; user 8's session
    // flushed by event-time timeout (its 09:30 timeout is behind the
    // watermark 10:30 = max ts 11:30 − 1 h). 7's second session (timeout
    // 12:00) is still open in state — correctly NOT emitted.
    assert(got == Seq(
      StreamingEvents.Session(7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3.0),
      StreamingEvents.Session(8L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1L, 8.0)))
    q.stop()
  }

  test("streaming sessionize merges in-gap late events, extending the start") {
    val input = MemoryStream[Ev](spark)
    val q = StreamingEvents.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("session_late_test")
      .outputMode("append").start()
    input.addData(
      Ev(7L, ts("2024-01-01 10:00:00"), "a", 1.0),
      Ev(7L, ts("2024-01-01 10:10:00"), "a", 2.0))
    q.processAllAvailable()
    // late but above-watermark event 20 min BEFORE the open session's
    // start: must merge and extend the start, not distort the aggregates
    input.addData(Ev(7L, ts("2024-01-01 09:40:00"), "a", 4.0))
    q.processAllAvailable()
    // a forward gap then closes the merged session
    input.addData(Ev(7L, ts("2024-01-01 11:30:00"), "a", 8.0))
    q.processAllAvailable()
    val got = spark.table("session_late_test")
      .as[StreamingEvents.Session].collect().toSeq
    assert(got == Seq(
      StreamingEvents.Session(7L, ts("2024-01-01 09:40:00"), ts("2024-01-01 10:10:00"), 3L, 7.0)))
    q.stop()
  }
}
