package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Sessionize

/** The custom Sessionize plan node: semantics must match the composable
  * lag+cumsum formulation exactly, and the physical plan must be ONE
  * exchange + ONE sort + SessionizeExec (the second window pass the
  * composable form pays is the thing the operator removes). */
class SessionizePlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private def events = Seq(
    (1L, ts(0), 5.0), (1L, ts(10), 1.0), (1L, ts(41), 2.0), // gap 31 > 30 splits
    (1L, ts(70), 3.0),                                      // 29 min: same session
    (2L, ts(0), 4.0), (2L, ts(200), 6.0),
    (3L, ts(5), 7.0)
  ).toDF("user_id", "ts", "value")
    .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("session assignment matches the lag+cumsum formulation") {
    val native = Sessionize(events, Seq("user_id"), "ts", gapMinutes = 30)
      .select(col("user_id"), col("ts"), col("session_idx"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    val composed = events
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("is_new", when($"prev".isNull ||
        unix_micros($"ts".cast("timestamp")) -
          unix_micros($"prev".cast("timestamp")) > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("ts"), col("session_idx"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    assert(native == composed)
    // spot-pin the boundary: 31-min gap splits, 29-min does not
    val byUser = Sessionize(events, Seq("user_id"), "ts", 30)
      .filter($"user_id" === 1L).orderBy($"ts")
      .collect().map(_.getLong(3)).toSeq
    assert(byUser == Seq(1L, 1L, 2L, 2L))
  }

  test("plan is one exchange + one sort + SessionizeExec; no Window") {
    val df = Sessionize(events, Seq("user_id"), "ts", 30)
    df.count() // finalize the adaptive plan
    val str = df.queryExecution.executedPlan.toString
    assert(str.contains("Sessionize"), s"SessionizeExec missing in:\n$str")
    assert(!str.contains("!Sessionize"),
      s"SessionizeExec invalid (missing attributes) in:\n$str")
    assert(!str.contains("Window"), s"window crept in:\n$str")
    assert("Exchange hashpartitioning".r.findAllIn(str).size == 1, s"exchanges:\n$str")
    assert("\\bSort\\b".r.findAllIn(str).size == 1, s"sorts:\n$str")
    // downstream per-key aggregation reuses the exchange: still one
    val agg = Sessionize(events, Seq("user_id"), "ts", 30)
      .groupBy($"user_id", $"session_idx").agg(count(lit(1)).as("n"))
    val aggStr = agg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(aggStr).size == 1,
      s"aggregation did not reuse the session partitioning:\n$aggStr")
  }

  test("null timestamps sort first and land in the key's first session") {
    val withNull = Seq(
      (1L, Option.empty[Timestamp], 0.0),
      (1L, Some(ts(0)), 1.0), (1L, Some(ts(100)), 2.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = Sessionize(withNull, Seq("user_id"), "ts", 30)
      .orderBy($"ts".asc_nulls_first)
      .collect().map(_.getLong(3)).toSeq
    // null first (session 1), ts(0) joins it (any gap from MinValue is
    // huge — so it opens session 2), ts(100) opens session 3
    assert(got.head == 1L && got.distinct.sorted == got.distinct,
      s"null-ts ordering broke: $got")
    assert(got.size == 3)
  }

  test("unknown column fails loudly; key change resets the index") {
    intercept[RuntimeException] { Sessionize(events, Seq("nope"), "ts", 30) }
    val idx = Sessionize(events, Seq("user_id"), "ts", 30)
      .filter($"user_id" === 3L).collect().map(_.getLong(3)).toSeq
    assert(idx == Seq(1L))
  }
}
