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

  test("null timestamps match the lag formulation: successor of a null starts fresh") {
    // lag semantics: a row whose predecessor's ts is null fires is_new
    // (lag returns the null), so each null row is its own session and
    // the first REAL timestamp opens a new one — pinned exactly, because
    // the old Long.MinValue-sentinel implementation overflowed
    // `t − lastTs` on the null→non-null boundary and glued ts(0) into
    // the nulls' session
    val withNull = Seq(
      (1L, Option.empty[Timestamp], 0.0),
      (1L, Some(ts(0)), 1.0), (1L, Some(ts(100)), 2.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = Sessionize(withNull, Seq("user_id"), "ts", 30)
      .orderBy($"ts".asc_nulls_first)
      .collect().map(_.getLong(3)).toSeq
    assert(got == Seq(1L, 2L, 3L), s"null-boundary sessions broke: $got")
    // consecutive nulls: every one fires is_new (lag hands each its
    // predecessor's null), and the count restarts per key
    val twoNulls = Seq(
      (1L, Option.empty[Timestamp], 0.0), (1L, Option.empty[Timestamp], 0.0),
      (1L, Some(ts(0)), 1.0),
      (2L, Option.empty[Timestamp], 0.0), (2L, Some(ts(5)), 1.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val byKey = Sessionize(twoNulls, Seq("user_id"), "ts", 30)
      // session_idx breaks the tie between the two equal null rows
      .orderBy($"user_id", $"ts".asc_nulls_first, $"session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(byKey == Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L)),
      s"consecutive-null sessions broke: $byKey")
  }

  test("unknown column fails loudly; key change resets the index") {
    intercept[RuntimeException] { Sessionize(events, Seq("nope"), "ts", 30) }
    val idx = Sessionize(events, Seq("user_id"), "ts", 30)
      .filter($"user_id" === 3L).collect().map(_.getLong(3)).toSeq
    assert(idx == Seq(1L))
  }
}
