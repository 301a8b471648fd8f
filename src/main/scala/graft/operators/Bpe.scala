package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-level BPE tokenizer training — the classic
  * byte-pair-encoding merge loop (Sennrich et al. 2016) re-expressed as
  * vocabulary-sized Spark aggregations.
  *
  * Scale shape: the only corpus-sized pass is [[wordVocab]] (one
  * aggregation shuffle to the word-frequency table, Zipf-bounded far
  * below corpus size). Every merge round then runs on the vocabulary
  * alone: adjacent-pair counting is a map-side explode + one
  * vocabulary-sized aggregation, the argmax collects exactly ONE row to
  * the driver, and merge application is a narrow map over the cached
  * vocabulary — so training cost is independent of corpus size beyond
  * the initial count, which is exactly how production BPE trainers
  * (word-count preprocessed) behave.
  *
  * Determinism: pair counts are exact integers; the argmax tiebreak is
  * total (count desc, then both symbols ascending — ASCII-only symbols,
  * so engine collations agree); merge application is a FIXED number of
  * left-to-right non-overlapping literal `replace` passes (both Spark
  * and DuckDB scan-and-continue, so "t t t t" under merge (t,t)
  * converges identically), making every round replayable by an
  * unrolled SQL oracle.
  */
object Bpe {

  /** Lowercase-alpha word frequencies — the single corpus-sized pass. */
  def wordVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Initial symbol sequence: characters joined by single spaces. */
  def spacedChars(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Adjacent-symbol pair counts over a (n, s) vocabulary, weighted by
    * word frequency. Output: (lhs, rhs, pair_n). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("n"), split(col("s"), " ").as("sym"))
      .select(col("n"), explode(
        when(size(col("sym")) >= 2,
          transform(sequence(lit(0), size(col("sym")) - 2), i =>
            struct(element_at(col("sym"), i + 1).as("lhs"),
              element_at(col("sym"), i + 2).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("n")).as("pair_n"))

  /** Number of literal replace passes per merge — fixed and mirrored in
    * the oracle, so both engines apply a merge identically even on
    * pathological same-symbol runs that a single non-overlapping pass
    * leaves unfinished. */
  val MergePasses = 4

  /** Apply one learned merge to a symbol string: `MergePasses`
    * non-overlapping replaces of " lhs rhs " with " lhsrhs " on the
    * space-padded sequence. */
  def applyMerge(s: Column, lhs: String, rhs: String): Column = {
    val pat = lit(s" $lhs $rhs ")
    val rep = lit(s" $lhs$rhs ")
    val merged = (1 to MergePasses).foldLeft(concat(lit(" "), s, lit(" "))) {
      (c, _) => replace(c, pat, rep)
    }
    trim(merged)
  }

  /** Learn `merges` merge rules from a (word, n) vocabulary. Returns the
    * merge table rows (step, lhs, rhs, pair_n) and the vocabulary with
    * its final symbol column `s`. The input should be persisted by the
    * caller — each round re-reads it (narrowly) for the pair argmax. */
  def learnMerges(vocab: DataFrame, merges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(merges >= 1, "merges must be at least 1")
    var v = vocab.withColumn("s", spacedChars(col("word")))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to merges) {
      // ONE row to the driver per round — the argmax, not the vocabulary
      val best = pairCounts(v)
        .orderBy(col("pair_n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((step, l, r, n))
        v = v.withColumn("s", applyMerge(col("s"), l, r))
      }
    }
    (learned.toSeq, v)
  }
}
