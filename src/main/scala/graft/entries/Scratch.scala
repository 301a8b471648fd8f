package graft.entries

import org.apache.spark.sql.SparkSession

/** Scratch directories for harness entries that exercise the write path:
  * one deterministic dir per (tag, sfDir, session), cleared on allocation
  * so every entry run starts fresh. The SESSION is part of the key: two
  * sessions (parallel test suites in one JVM, or a forked tool JVM such
  * as PlanAudit's) may build the same shared fixture for the same sfDir
  * concurrently, and a path keyed on sfDir alone lets the second build's
  * clear-on-allocate DELETE files the first session's persisted frames
  * still reference (observed: EntryShapeSpec's snapcdc changelog read
  * FileNotFound while PlanAudit's child JVM rebuilt the fixture).
  * `math.abs` guard: `hashCode` can be `Int.MinValue`, whose abs is
  * itself — fold it to 0. */
object Scratch {
  def tmpPath(tag: String, d: String, s: SparkSession): String = {
    val h = math.abs(d.hashCode) match { case n if n < 0 => 0; case n => n }
    val sess = math.abs(System.identityHashCode(s)) match { case n if n < 0 => 0; case n => n }
    val path = s"/root/repo/target/graft_tmp/${tag}_${h}_$sess"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    path
  }
}
