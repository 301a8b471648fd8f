package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.Functions.stableRoundedSum

/** Event-stream batch operators over the `events` table (SURVEY §7.6):
  * gap-based sessionization, tumbling windows, and group-wise top-k.
  *
  * Scale notes: every operator here shuffles exactly once, on `user_id`
  * (or the window key) — the natural partitioning for event data at
  * 100 TB. Sessionization is the classic lag+cumsum formulation: one
  * window pass inside each user partition, no self-joins. The same
  * semantics are available incrementally for unbounded streams via
  * [[graft.streaming.StreamingEvents]].
  */
object Events {

  private def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** The session-boundary rule, shared by [[sessionize]] and every
    * session-derived analytic (e.g. the path entry): annotates each
    * event with `is_new` (gap since the user's previous event exceeds
    * `gapMinutes`) and the running `session_idx`. ONE definition so
    * consumers cannot drift on the boundary semantics. */
  def withSessionIndex(events: DataFrame, gapMinutes: Int = DefaultGapMinutes): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(order)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("is_new",
        when(prev.isNull || epochUs(col("ts")) - epochUs(prev) > gapUs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(running))
  }

  /** Default session gap — shared with the harness oracles. */
  val DefaultGapMinutes = 30

  /** Gap-based sessionization: a new session starts when the gap since
    * the user's previous event exceeds `gapMinutes`. Returns one row per
    * (user_id, session_idx) with start/end/count/value totals. */
  def sessionize(events: DataFrame, gapMinutes: Int = DefaultGapMinutes): DataFrame =
    withSessionIndex(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        stableRoundedSum(col("value"), 2).as("total_value"))

  /** Burst debounce — telemetry cleaning: events of the same
    * (user_id, event_type) arriving within `withinSeconds` of their
    * predecessor form one burst; only the burst's FIRST event survives,
    * annotated with the burst size. The burst boundary is the same
    * lag+cumsum shape as [[sessionize]] (a burst is a micro-session),
    * so the whole pass is one shuffle on the user key and two window
    * functions over the same partitioning — no self-joins, no second
    * exchange. */
  def debounce(events: DataFrame, withinSeconds: Long = 300L): DataFrame = {
    require(withinSeconds > 0, "withinSeconds must be positive")
    val order = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(order)
    val gapUs = withinSeconds * 1000000L
    events
      .withColumn("is_new",
        when(prev.isNull || epochUs(col("ts")) - epochUs(prev) > gapUs, 1).otherwise(0))
      .withColumn("burst_idx", sum(col("is_new")).over(running))
      .groupBy(col("user_id"), col("event_type"), col("burst_idx"))
      .agg(min(struct(col("ts"), col("event_id"))).as("first"),
        count(lit(1)).as("burst_size"))
      .select(col("user_id"), col("event_type"),
        col("first.event_id").as("event_id"), col("first.ts").as("ts"),
        col("burst_idx"), col("burst_size"))
  }

  /** Tumbling time windows via Spark's `window()` operator (epoch-aligned,
    * so a 1-hour window starts on the hour). Output key is the window
    * start, zone-less. */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts").cast("timestamp"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        stableRoundedSum(col("value"), 2).as("total_value"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sessionization via Spark's built-in `session_window` (same session
    * boundaries as [[sessionize]]; the built-in's window end is
    * `last event + gap`, so the observed end is reported via `max(ts)`).
    * Prefer this form when only per-session aggregates are needed — the
    * dedicated operator merges sessions inside the aggregation, with no
    * ranking window pass. */
  def sessionizeWindowed(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts").cast("timestamp"), s"$gapMinutes minutes"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        stableRoundedSum(col("value"), 2).as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")

  /** Sliding time windows: width `width`, advancing every `slide` —
    * each event lands in `width / slide` overlapping windows (Spark's
    * `window()` with a slide duration expands map-side, so this is still
    * ONE shuffle on the window key, with the input amplified by the
    * overlap factor before the partial aggregation — no self-joins).
    * Same output shape as [[tumbling]]. */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts").cast("timestamp"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        stableRoundedSum(col("value"), 2).as("total_value"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Per-event rolling features — the feature-engineering pass over an
    * event log: a trailing moving average/sum of `value` over the
    * previous `nPrev` events plus the current one, the delta from the
    * previous event's value, and the seconds elapsed since it. One
    * shuffle on `user_id`; every feature comes from the same
    * window-sort pass (row frames over the total order `(ts,
    * event_id)`). The frame sums accumulate in decimal, not double —
    * engines are free to reassociate sliding-frame aggregation (segment
    * trees vs sequential), and decimal accumulation makes the result
    * independent of that order, the same trick as
    * [[graft.expr.Functions.stableRoundedSum]]. */
  def rollingFeatures(events: DataFrame, nPrev: Int = 3): DataFrame = {
    require(nPrev > 0, "nPrev must be positive")
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trail = order.rowsBetween(-nPrev, Window.currentRow)
    val prevTs = lag(col("ts"), 1).over(order)
    val decSum = sum(col("value").cast("decimal(38,10)")).over(trail)
    events.select(
      col("user_id"), col("event_id"), col("ts"), col("value"),
      round(decSum.cast("double") / count(col("value")).over(trail), 6).as("roll_avg"),
      round(decSum, 6).cast("double").as("roll_sum"),
      round(col("value") - lag(col("value"), 1).over(order), 6).as("delta_value"),
      // floor-division to whole seconds (gaps are non-negative under the
      // window order, so floor == truncate and matches DuckDB's `//`)
      floor((epochUs(col("ts")) - epochUs(prevTs)) / lit(1000000L))
        .cast("long").as("secs_since_prev"))
  }

  /** Ordered-step behavioral funnel: how many users performed steps
    * 1..k IN ORDER (each step's first occurrence at or after the
    * previous step's first occurrence — the standard first-touch
    * funnel). Output is one row per step, `step` labeled
    * `"<idx>_<event_type>"`, with the cumulative user count reaching
    * it; the wide→long reshape is Spark's `unpivot`.
    *
    * Scale shape: ONE shuffle (per-user conditional-min aggregation
    * with map-side combine), then a single global 1-row aggregate and
    * a constant-size unpivot — output size is the step count however
    * large the event log. */
  def funnelSteps(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      s"funnel needs >= 2 distinct steps: $steps")
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col("event_type") === s, col("ts"))).as(s"t$i")
    }
    val perUser = events.filter(col("event_type").isin(steps: _*))
      .groupBy(col("user_id")).agg(mins.head, mins.tail: _*)
    // progressive depth: step i+1 only counts if its first ts exists and
    // is at-or-after step i's (a null first-ts fails the comparison)
    val depth = {
      var e = when(col("t0").isNull, 0)
      for (i <- 1 until steps.size)
        e = e.when(col(s"t$i").isNull || col(s"t$i") < col(s"t${i - 1}"), i)
      e.otherwise(steps.size)
    }
    val labels = steps.zipWithIndex.map { case (s, i) => s"${i + 1}_$s" }
    val countCols = labels.zipWithIndex.map { case (l, i) =>
      sum(when(col("depth") >= i + 1, 1).otherwise(0)).cast("long").as(l)
    }
    perUser.select(depth.as("depth"))
      .agg(countCols.head, countCols.tail: _*)
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        labels.map(col).toArray, "step", "n_users")
  }

  /** Group-wise top-k: the k highest-value events per user
    * (`row_number` ranking window, total-ordered by the unique event_id
    * tiebreak). */
  def topKPerUser(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("user_id", "rn", "event_id", "event_type", "value")
  }

  /** Same semantics as [[topKPerUser]] via the bounded typed aggregator
    * ([[graft.expr.TopKAggregator]]): the map-side partials keep only k
    * items per user, so the shuffle carries O(k · partitions) rows per
    * key instead of every event — the formulation that survives a
    * 100 TB event log with small k. */
  def topKPerUserAgg(events: DataFrame, k: Int = 3): DataFrame = {
    import events.sparkSession.implicits._
    val agg = udaf(graft.expr.TopKAggregator(k))
    events
      .groupBy(col("user_id"))
      .agg(agg(col("value"), col("event_id"), col("event_type")).as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "item")))
      .select(
        col("user_id"),
        (col("pos") + 1).cast("int").as("rn"),
        col("item._2").as("event_id"),
        col("item._3").as("event_type"),
        col("item._1").as("value"))
  }
}
