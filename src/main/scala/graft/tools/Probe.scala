package graft.tools

import graft.{GraftSession, Tables}

/** Dev-only sanity probe: print each testdata table's Spark schema + count. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      val df = Tables.table(spark, dir, n)
      println(s"== $n count=${df.count()} schema=${df.schema.simpleString}")
    }
    val ev = Tables.events(spark, dir)
    println(s"== events count=${ev.count()} schema=${ev.schema.simpleString}")
    ev.show(3, truncate = false)
    spark.stop()
  }
}
