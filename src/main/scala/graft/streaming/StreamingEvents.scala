package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the batch event operators in
  * [[graft.operators.Events]] — unbounded sources, incremental state.
  *
  *  - [[tumblingCounts]]: watermarked tumbling-window aggregation
  *    (`readStream → window() → agg`), the streaming twin of
  *    `Events.tumbling`. State is bounded by the watermark horizon.
  *  - [[sessionize]]: gap-based sessions with explicit per-user state via
  *    `flatMapGroupsWithState` — the pattern for semantics Spark's
  *    built-in windows can't express. Sessions closed by a gap inside a
  *    batch are emitted immediately; the trailing open session is held in
  *    state and flushed on event-time timeout past the watermark.
  *
  * At scale both operators shuffle once on the grouping key per
  * micro-batch and keep per-key state O(1) — the state store grows with
  * the number of live keys, not events.
  */
object StreamingEvents extends Serializable {

  /** One event on the wire (timestamps µs, zone pinned UTC). */
  final case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  /** A closed session. */
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, total_value: Double)

  /** In-flight session state (public: the state-store encoder's generated
    * code must be able to construct it). `start`/`end` are epoch
    * MICROSECONDS — `Timestamp.getTime` would truncate to ms and corrupt
    * session bounds on µs-precision event data. */
  final case class OpenSession(start: Long, end: Long, n: Long, total: Double)

  /** Full-precision epoch µs of a Timestamp (getTime alone is ms). */
  def tsToUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Timestamp from epoch µs, sub-second carried via nanos. */
  def usToTs(us: Long): Timestamp = {
    val sec = Math.floorDiv(us, 1000000L)
    val t = new Timestamp(sec * 1000L)
    t.setNanos(((us - sec * 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming tumbling-window counts per event_type with a watermark
    * bounding state. `events` must carry an event-time `ts` column. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Streaming twin of [[graft.operators.Events.tumbling]] — identical
    * output schema and values on a bounded replay: tumbling totals with
    * the order-independent decimal sum, so the streaming result is
    * bit-comparable to the batch oracle. No watermark: meant for
    * Complete-mode verification replays and bounded backfills; for an
    * unbounded Append-mode deployment use [[tumblingCounts]]'s
    * watermarked shape to bound state. */
  def tumblingTotals(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts").cast("timestamp"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.expr.Functions.stableRoundedSum(col("value"), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming twin of [[graft.operators.Events.sliding]]: overlapping
    * windows of `width` advancing every `slide`, with the same
    * order-independent decimal sum, so a bounded replay is
    * bit-comparable to the batch oracle. Like [[tumblingTotals]], no
    * watermark — Complete-mode verification replays; add a watermark
    * for unbounded Append-mode deployments. */
  def slidingTotals(events: DataFrame, width: String = "1 hour",
                    slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts").cast("timestamp"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.expr.Functions.stableRoundedSum(col("value"), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Stream-static enrichment join — the lookup shape every production
    * pipeline has (events ⨝ dimension): each micro-batch joins a
    * STATIC bounded dimension, broadcast per batch, so the join adds
    * ZERO streaming state — only the downstream windowed aggregate
    * holds any. Inner semantics: stream rows without a dim match drop
    * (the dim defines the enrichment domain). Tumbling totals per
    * (window, tier) with the order-independent decimal sum, so a
    * bounded replay is bit-comparable to the batch oracle. */
  def tierTotals(stream: DataFrame, dim: DataFrame,
                 width: String = "1 hour"): DataFrame =
    stream.join(broadcast(dim), Seq("event_type"))
      .groupBy(window(col("ts").cast("timestamp"), width), col("tier"))
      .agg(count(lit(1)).as("n_events"),
        graft.expr.Functions.stableRoundedSum(col("value"), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("tier"), col("n_events"), col("total_value"))

  /** Stream-stream interval join — the attribution shape (impressions ⨝
    * clicks within a time window): equal keys AND the right timestamp
    * inside `[left.ts, left.ts + withinMinutes]`. BOTH the watermarks
    * and the two-sided time bound are load-bearing at scale: the
    * watermark lets Spark expire left-side state once no matching right
    * row can still arrive, and the interval condition bounds how long a
    * buffered row is joinable — without either, stream-stream join
    * state grows without bound. Output columns: the key, `l_ts`,
    * `r_ts`, and the right side's `value`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   withinMinutes: Int = 10,
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.select(col(key), col("ts").cast("timestamp").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as(s"graft_r_$key"),
        col("ts").cast("timestamp").as("r_ts"), col("value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
        col(key) === col(s"graft_r_$key") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"interval $withinMinutes minutes"))
      .select(col(key), col("l_ts"), col("r_ts"), col("value"))
  }

  /** Gap-based streaming sessionization with explicit state. Events
    * within a batch are processed in event-time order; a gap >
    * `gapMinutes` closes the running session. The final open session per
    * user stays in state until the event-time timeout fires (watermark
    * past `session_end + gap`). */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    def flush(userId: Long, s: OpenSession): Session =
      Session(userId, usToTs(s.start), usToTs(s.end), s.n, s.total)

    val fn: (Long, Iterator[Ev], GroupState[OpenSession]) => Iterator[Session] =
      (userId, evs, state) => {
        if (state.hasTimedOut) {
          val out = state.getOption.map(flush(userId, _)).iterator
          state.remove()
          out
        } else {
          val sorted = evs.toSeq.sortBy(e => (tsToUs(e.ts), e.value))
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = tsToUs(e.ts)
            open match {
              case Some(s) if t > s.end + gapUs =>
                // gap exceeded forward: close and start fresh
                closed += flush(userId, s)
                open = Some(OpenSession(t, t, 1, e.value))
              case Some(s) if t < s.start - gapUs =>
                // late event disjoint BEFORE the open session: emit it as
                // its own session immediately (no earlier state exists to
                // merge with) rather than corrupting the open session's
                // aggregates without moving its bounds
                closed += Session(userId, usToTs(t), usToTs(t), 1, e.value)
              case Some(s) =>
                // within the gap on either side: merge, extending bounds
                open = Some(OpenSession(math.min(s.start, t), math.max(s.end, t),
                  s.n + 1, s.total + e.value))
              case None =>
                open = Some(OpenSession(t, t, 1, e.value))
            }
          }
          open.foreach { s =>
            state.update(s)
            // timeout API is ms: round UP so the session never times out
            // a fraction of a ms before its true end+gap
            state.setTimeoutTimestamp(Math.floorDiv(s.end + gapUs + 999L, 1000L))
          }
          closed.result().iterator
        }
      }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** The production streaming-merge pattern: stream → `foreachBatch` →
    * [[graft.write.IncrementalWriter.deleteInsert]] upsert into the
    * (year, month)-partitioned table. Each micro-batch merges by key
    * with partition-pruned rewrites; because the merge is idempotent per
    * batch, `foreachBatch`'s at-least-once redelivery after a failure
    * yields exactly-once TABLE state, and the checkpoint makes restarts
    * resume from the first unprocessed batch. */
  def upsertStream(stream: DataFrame, path: String, keyCol: String,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // deleteInsert consumes its batch several times (size probe,
        // touched-partition set, key set, write); un-persisted, each pass
        // would re-read the micro-batch from the source
        val b = batch.toDF().persist()
        try graft.write.IncrementalWriter.deleteInsert(batch.sparkSession, b, path, keyCol)
        finally b.unpersist()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  private val AppendBatchTag = "append_batch_"

  /** Exactly-once STREAMING APPEND into a snapshot-versioned table —
    * the transactional twin of a raw file-sink append: each micro-batch
    * lands as ONE append commit, so readers see whole batches or
    * nothing (never a partially-written directory), every batch is
    * time-travelable, and downstream consumers pull exact per-batch
    * increments with [[graft.write.SnapshotTable.appendsBetween]] at
    * O(new data). The batch id rides the commit's op tag
    * (`append_batch_<id>`), so `foreachBatch`'s at-least-once
    * redelivery after a crash between commit and checkpoint write is
    * recognized by the newest-first op-tag walk and skipped — a batch
    * is never appended twice. State lives in the table; restart
    * recovery is the checkpoint replaying unprocessed files. Completes
    * the streaming-ingest trio with [[upsertStream]] (keyed merge) and
    * [[ivmStream]] (delta-aggregate). */
  def appendStream(stream: DataFrame, table: graft.write.SnapshotTable,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        appendApplyBatch(table, batch.toDF(), batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** One streaming-append micro-batch, idempotent by batch id: returns
    * false (no commit) when `batchId` is at or below the table's
    * last-applied append batch — the at-least-once replay case. O(1)
    * manifest reads in the steady state (the newest commit IS the last
    * append batch). */
  private[graft] def appendApplyBatch(table: graft.write.SnapshotTable,
                                      batch: DataFrame, batchId: Long): Boolean = {
    val lastApplied = table.findLatestOp(_.startsWith(AppendBatchTag))
      .map(_._2.stripPrefix(AppendBatchTag).toLong)
    if (lastApplied.exists(_ >= batchId)) false
    // an empty micro-batch (a trigger with no new files) must not land a
    // data-file-less _data dir — fsck would report it as damage, and
    // commitMergeMor refuses the same no-op-commit shape. Skipping the
    // commit is safe for idempotency: batch ids only grow, so a replay
    // of this empty batch re-skips and a later non-empty batch advances
    // the recorded high-water mark past it.
    else if (batch.isEmpty) true
    else {
      table.commitAppend(batch, opTag = s"$AppendBatchTag$batchId")
      true
    }
  }

  /** Streaming incremental view maintenance: each micro-batch of CDC
    * changelog rows (op = insert/delete) delta-merges into a snapshot-
    * versioned count/sum aggregate via [[graft.write.Ivm]] — the
    * derived-mart maintenance loop a changelog consumer actually runs.
    * State lives in the TABLE (one snapshot commit per batch; restart
    * recovery = checkpoint replays unprocessed files against the
    * committed aggregate), never in executor memory, and each batch
    * costs O(batch rows), never O(table). Because the delta algebra is
    * abelian, the final aggregate is independent of how the changelog
    * was sliced into micro-batches.
    *
    * Exactly-once under `foreachBatch`'s at-least-once redelivery: the
    * batch id is recorded IN the snapshot commit's op tag, so a batch
    * replayed after a crash between commit and checkpoint write is
    * recognized ([[ivmApplyBatch]]) and skipped — signed deltas are
    * never double-applied. (The sibling [[upsertStream]] gets the same
    * guarantee from `deleteInsert`'s per-batch idempotency instead.) */
  def ivmStream(stream: DataFrame, agg: graft.write.SnapshotTable,
                keys: Seq[String], nCol: String, sumCol: String,
                valueCol: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ivmApplyBatch(agg, batch.toDF(), batchId, keys, nCol, sumCol, valueCol)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  private val IvmBatchTag = "ivm_batch_"

  /** One IVM micro-batch, idempotent by batch id: returns false (no
    * commit) when `batchId` is at or below the snapshot history's
    * last-applied IVM batch — the at-least-once replay case. The tag
    * rides the SAME durable object as the state it produced (one commit
    * = state + high-water mark), so there is no second file to fall out
    * of sync with the aggregate. */
  private[graft] def ivmApplyBatch(agg: graft.write.SnapshotTable,
                                   batch: DataFrame, batchId: Long,
                                   keys: Seq[String], nCol: String,
                                   sumCol: String, valueCol: String): Boolean = {
    // newest-first walk, stopping at the first IVM-tagged commit: in
    // the steady state the newest commit IS the last IVM batch, so the
    // high-water-mark probe costs O(1) manifest reads per micro-batch
    // instead of one parse per retained version (O(versions) FS reads
    // per batch, O(n²) over a run). Batch ids apply in increasing
    // order, so the newest tag carries the max. NOTE: expire() on the
    // aggregate table must retain the last IVM-tagged commit for the
    // replay guard to hold — it always does while that commit is
    // CURRENT (expire keeps the live version); if maintenance commits
    // (compaction) land between batches, either keep `keepLast` above
    // the gap or pin the last IVM version with a tag().
    val lastApplied = agg.findLatestOp(_.startsWith(IvmBatchTag))
      .map(_._2.stripPrefix(IvmBatchTag).toLong)
    if (lastApplied.exists(_ >= batchId)) false
    else {
      // the merge consumes the batch twice (count + sum deltas ride
      // one agg, but the plan also feeds the outer join probe)
      val b = batch.persist()
      try {
        agg.commitOverwrite(graft.write.Ivm.applyCountSumDelta(
          agg.read(), b, keys, nCol, sumCol,
          col(valueCol).cast("decimal(38,10)")),
          opTag = s"$IvmBatchTag$batchId")
        true
      } finally { b.unpersist(); () }
    }
  }

  /** File-source stream over a directory of event parquet (µs
    * timestamps), for tests and replay. */
  def fromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    spark.readStream.schema(schema).parquet(dir)
  }
}
