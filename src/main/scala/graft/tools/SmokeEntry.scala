package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev smoke of the driver contract: `SparkEntry.entry` must return rows. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    require(n > 0, "flagship entry returned no rows")
    spark.stop()
  }
}
