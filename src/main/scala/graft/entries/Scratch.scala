package graft.entries

import org.apache.spark.sql.SparkSession

/** Scratch directories for harness entries that exercise the write path:
  * one deterministic dir per (tag, sfDir), cleared on allocation so every
  * entry run starts fresh. `math.abs` guard: `hashCode` can be
  * `Int.MinValue`, whose abs is itself — fold it to 0. */
object Scratch {
  def tmpPath(tag: String, d: String, s: SparkSession): String = {
    val h = math.abs(d.hashCode) match { case n if n < 0 => 0; case n => n }
    val path = s"/root/repo/target/graft_tmp/${tag}_$h"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    path
  }
}
