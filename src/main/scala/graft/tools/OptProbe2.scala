package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Round-17 phase probe #2: BPE training/apply cost split. */
object OptProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p2] ${(System.nanoTime() - t0) / 1e9}%6.2f s  $label")
    }
    val vocab = graft.operators.Bpe.wordVocab(Tables.documents(spark, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[p2] vocab rows=${vocab.count()}")
    (1 to 2).foreach { k =>
      var learned: Seq[(Int, String, String, Long)] = Seq.empty
      var fin: org.apache.spark.sql.DataFrame = null
      time(s"learnMerges(6) iter $k") {
        val r = graft.operators.Bpe.learnMerges(vocab, 6)
        learned = r._1; fin = r._2
      }
      time(s"apply-entry stats over final vocab iter $k") {
        val stats = fin.agg(
          count(lit(1)).as("n_word_forms"), sum(col("n")).as("n_words"),
          sum(col("n") * length(col("word"))).as("tokens_before"),
          sum(col("n") * size(split(col("s"), " "))).as("tokens_after"))
        val syms = fin.select(explode(split(col("s"), " ")).as("sym"))
          .agg(countDistinct(col("sym")).as("n_symbols"))
        stats.crossJoin(syms).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
