package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.operators._

/** Stage-by-stage cost profile of the dedup pipeline at a given SF —
  * the measurement tool behind the shingle-persist and map-side-signature
  * decisions (run: `runMain graft.tools.ProfileDedup [sfDir]`). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.spread(Tables.documents(spark, d))
    time("tokens only")(docs.select(TextAnalysis.tokens(col("text")).as("t"))
      .select(sum(size(col("t")))).collect())
    time("shingles")(docs.select(TextAnalysis.shingles(col("text")).as("sh"))
      .select(sum(size(col("sh")))).collect())
    time("shingles+explode+md5")(docs.select(explode(TextAnalysis.shingles(col("text"))).as("s"))
      .select(max(md5(col("s")))).collect())
    time("minhash sigs map-side")(docs.select(col("doc_id"),
      TextAnalysis.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(Dedup.minhashSigCols(col("sh"), 12).map(c => sum(c)): _*).collect())
    time("full ngram entry")(Dedup.ngramJaccardPairs(docs, 0.5, 100)
      .write.format("noop").mode("overwrite").save())
    time("full minhash entry")(Dedup.minhashLsh(docs)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
