package graft

import org.apache.spark.sql.DataFrame

/** Registry for ENTRY-SCOPED cached frames.
  *
  * Some operators persist an intermediate that feeds several consumers
  * within one query (e.g. `TextAnalysis.bigramScore`'s exploded bigram
  * stream, `tfIdfTop`'s term frequencies). Those blocks are dead the
  * moment the entry's action finishes, but `persist` alone keeps them
  * for the session — across a 139-entry verify/bench run that is an
  * unbounded cache footprint. Deliberately-session-lived caches (the
  * memoized taxi model DAG, Dedup's shared pairs cache) do NOT register
  * here; a blanket `spark.catalog.clearCache()` would evict those too
  * and re-run their populate per entry.
  *
  * Contract: operators call [[register]] instead of bare `persist`;
  * multi-entry harnesses ([[Verify]], [[Bench]]) call [[drain]] after
  * each entry completes. Single-query callers may ignore both — the
  * footprint is then one query's intermediates, same as before.
  */
object TransientCache {
  private val frames = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and track it for the next drain. */
  def register(df: DataFrame): DataFrame = synchronized {
    frames += df
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist (non-blocking) every frame registered since the last
    * drain. Safe to call when empty; safe to call twice. */
  def drain(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}
