package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training corpora: assign documents to
  * fixed-token-budget packs — the batching step between tokenization and
  * example writing in an LLM data pipeline.
  *
  * The rule is FIXED-BOUNDARY packing: documents are laid out in a
  * deterministic order and a document belongs to pack
  * `floor(tokens_before_it / maxTokens)`. That is a pure function of the
  * corpus (no greedy bin-packing state), so assignments are reproducible
  * and SQL-mirrorable.
  *
  * Scale shape: a single global running sum would serialize on one
  * partition, so packing runs WITHIN hash shards — the window partitions
  * by `shard` (one shuffle), shards pack independently in parallel, and
  * pack ids are per-shard. At 100 TB the shard count scales with the
  * cluster while each shard's window stays a linear in-partition pass.
  */
object Packing {

  val DefaultSeed = 11
  val DefaultShards = 8
  val DefaultMaxTokens = 2048

  /** Per-document pack assignment: (doc columns) + shard, n_tokens,
    * pack_id. Order within a shard is ascending `idCol` (unique ⇒ total
    * order ⇒ deterministic running sum).
    *
    * Column contract: the output ADDS `shard`, `n_tokens`, and `pack_id`
    * (and uses `cum_before` internally) — these names are RESERVED, and
    * an input already carrying any of them is refused rather than
    * silently clobbered. Callers with a pre-tokenized `n_tokens` column
    * should rename it and pass it as the `tokens` argument. */
  def packAssign(docs: DataFrame, idCol: Column, tokens: Column,
                 maxTokens: Int = DefaultMaxTokens,
                 nShards: Int = DefaultShards,
                 seed: Int = DefaultSeed): DataFrame = {
    require(maxTokens > 0 && nShards > 0, "maxTokens and nShards must be positive")
    // withColumn REPLACES an existing same-named column silently — refuse
    // rather than clobber caller data
    val clash = Seq("shard", "n_tokens", "pack_id", "cum_before")
      .filter(docs.columns.contains)
    require(clash.isEmpty,
      s"packAssign generates columns ${clash.mkString(", ")} which already exist on the input; rename them first")
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(Dedup.portableHash(idCol.cast("string"), seed),
        lit(nShards.toLong)))
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer division (Spark `div` ≡ DuckDB `//` for non-negatives):
      // double `/` + floor would be exact here but div keeps it integral
      .withColumn("pack_id", expr(s"cum_before div $maxTokens"))
      .drop("cum_before")
  }
}
