package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training corpora.
  *
  * The split is a pure function of the document id (seeded portable
  * hash → percent bucket), NOT a random draw: assignments are stable
  * across runs, cluster sizes, and engines — re-shuffling data between
  * train and eval silently invalidates every checkpoint trained so far,
  * so reproducibility is the entire point of the operator. Map-side
  * expression, zero shuffle; the hash goes through
  * [[Dedup.portableHash]] so a DuckDB oracle reproduces it bit-exactly.
  */
object Sampling {

  /** Default split parameters — referenced by the harness oracle SQL so
    * Spark side and oracle cannot drift independently. */
  val DefaultSeed = 7
  val DefaultTrainPct = 80
  val DefaultValPct = 10

  /** Seed for mixture weighting — deliberately distinct from
    * [[DefaultSeed]] so mixture inclusion is independent of the
    * train/val/test assignment (correlated buckets would skew the kept
    * corpus toward one split). */
  val DefaultMixtureSeed = 13

  /** Percent bucket in [0, 100) for an id column. */
  def bucket(id: Column, seed: Int): Column =
    pmod(Dedup.portableHash(id.cast("string"), seed), lit(100L))

  /** 'train' / 'val' / 'test' assignment by hash bucket:
    * [0, trainPct) → train, [trainPct, trainPct + valPct) → val,
    * the rest → test. */
  def splitAssign(id: Column, seed: Int = DefaultSeed,
                  trainPct: Int = DefaultTrainPct, valPct: Int = DefaultValPct): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percents: train=$trainPct val=$valPct")
    val b = bucket(id, seed)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Seeds for the corpus shuffle: the permutation key and the shard
    * assignment hash are independent (a shared hash would make shard
    * membership a function of within-shard position). Distinct from
    * every other sampling seed for the same independence reason. */
  val DefaultShuffleSeed = 29
  val DefaultShuffleShardSeed = 31

  /** Deterministic corpus shuffle key: sorting by
    * `(shuffleKey(id), id)` is a reproducible pseudo-random global
    * order — the "shuffle before writing training examples" step,
    * carrying no RNG state: any engine, run, or cluster size derives
    * the identical order. At scale the global sort is never executed
    * as one range sort: assign shards with [[shuffleShard]] (one hash
    * partition step) and order WITHIN each shard by the key — writers
    * then stream shards independently, exactly how packed training
    * shards are laid down. */
  def shuffleKey(id: Column, seed: Int = DefaultShuffleSeed): Column =
    Dedup.portableHash(id.cast("string"), seed)

  /** Shard assignment for the shuffled corpus (independent hash). */
  def shuffleShard(id: Column, nShards: Int,
                   seed: Int = DefaultShuffleShardSeed): Column = {
    require(nShards > 0, "nShards must be positive")
    pmod(Dedup.portableHash(id.cast("string"), seed), lit(nShards.toLong))
  }

  /** Weighted mixture inclusion — the domain-mixing step of a training
    * corpus: keep a row iff its hash bucket falls under its source's
    * target percentage (e.g. keep 100% of English, 40% of French).
    * Deterministic down-sampling per source; sources absent from
    * `weights` get 0 and are dropped. */
  def mixtureKeep(id: Column, source: Column, weights: Map[String, Int],
                  seed: Int = DefaultMixtureSeed): Column = {
    require(weights.values.forall(w => w >= 0 && w <= 100),
      s"mixture weights must be percentages: $weights")
    val pct = weights.foldLeft(lit(0)) { case (acc, (k, w)) =>
      when(source === k, lit(w)).otherwise(acc)
    }
    bucket(id, seed) < pct
  }

  /** Seed for temperature sampling — independent like every other seed. */
  val DefaultTemperatureSeed = 23

  /** Temperature-flattened mixture sampling — the count^α rebalancing
    * every multilingual / multi-source training corpus runs (as in
    * multilingual-LM sampling): source `s` keeps rows at rate
    * `sqrt(n_s) / sqrt(max_s n_s)`, i.e. α = 0.5, so the largest source
    * keeps everything and a source 100× smaller keeps 10× its
    * proportional share. α is FIXED at 0.5 deliberately: `sqrt` is
    * correctly rounded in IEEE-754 (identical bits in any engine),
    * while a general `pow(n, α)` is only faithfully rounded and may
    * differ in the last ulp between libm implementations — which would
    * flip keep-decisions on boundary hashes. The keep decision compares
    * the row's portable-hash uniform in (0, 1] against its source's
    * rate — deterministic, zero RNG state, stable across engines.
    *
    * Scale shape: one vocabulary-sized aggregate for the counts, the
    * rate table broadcast back onto the corpus, keep as a map-side
    * comparison — no corpus-sized shuffle. Output adds `rate` and
    * `keep` (reserved names, refused if present). */
  def temperatureKeep(df: DataFrame, sourceCol: String, id: Column,
                      seed: Int = DefaultTemperatureSeed): DataFrame = {
    val clash = Seq("rate", "keep", "n_src").filter(df.columns.contains)
    require(clash.isEmpty,
      s"temperatureKeep generates columns ${clash.mkString(", ")} which already exist; rename them first")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_src"))
    val rates = counts.withColumn("rate",
      sqrt(col("n_src").cast("double")) /
        max(sqrt(col("n_src").cast("double"))).over(Window.partitionBy()))
    val u = (Dedup.portableHash(id.cast("string"), seed) + HashUniformOffset)
      .cast("double") / lit(HashUniformDenominator).cast("double")
    df.join(broadcast(rates), Seq(sourceCol))
      .withColumn("keep", u <= col("rate")) // u ∈ (0,1] ⇒ the max source keeps ALL rows
  }

  /** Seed for stratified sampling — independent of every other sampling
    * seed (a shared hash would correlate the per-stratum sample with
    * split/mixture/shuffle membership). */
  val DefaultStratifiedSeed = 17

  /** Seed for weighted sampling — independent like every other seed. */
  val DefaultWeightedSeed = 19

  /** [[Dedup.portableHash]] emits 60-bit values; `(hash + 1) / 2^60`
    * is the uniform-in-(0, 1] transform. Interpolated into the
    * `sample_weighted` oracle so the two sides cannot drift. */
  val HashUniformOffset = 1
  val HashUniformDenominator = "1152921504606846976.0" // 2^60, exact in double

  /** Weighted sampling without replacement (Efraimidis–Spirakis): the
    * `n` rows per stratum with the largest `u^(1/w)` where `u` is the
    * portable-hash uniform in (0, 1] and `w` the row's weight —
    * inclusion probability proportional to weight, deterministic, no
    * RNG state. The +1 on the hash keeps `u` strictly positive so the
    * power is defined. Weights must be positive and are enforced
    * per-row (`w <= 0` raises rather than silently never-sampling the
    * row via `pow(u, 1/0) = 0` — or, for negative `w`, inverting the
    * sampling order). Same one-shuffle ranking-window shape (and skew
    * note) as [[stratifiedTake]]. */
  def weightedTake(df: DataFrame, stratum: Column, id: Column, weight: Column,
                   n: Int, seed: Int = DefaultWeightedSeed): DataFrame = {
    require(n > 0, "n must be positive")
    require(!df.columns.contains("rank_in_stratum"),
      "weightedTake generates rank_in_stratum, which already exists on the input; rename it first")
    val u = (Dedup.portableHash(id.cast("string"), seed) + HashUniformOffset)
      .cast("double") / lit(HashUniformDenominator).cast("double")
    val wChecked = when(weight > 0, weight).otherwise(raise_error(concat(
      lit("weightedTake requires positive weights; got "), weight.cast("string"))))
    val priority = pow(u, lit(1.0) / wChecked)
    val w = Window.partitionBy(stratum).orderBy(priority.desc, id)
    df.withColumn("rank_in_stratum", row_number().over(w).cast("int"))
      .filter(col("rank_in_stratum") <= n)
  }

  /** Seed for uniform negative sampling — independent like every other
    * seed. */
  val DefaultNegativeSeed = 23

  /** Deterministic uniform negative sampling for contrastive training:
    * `k` pseudo-random partner ids per document, never the document
    * itself. Requires DENSE ids `[0, N)` (validated up front with one
    * scalar aggregate — non-dense corpora reindex first): negative `j`
    * of id `i` is `(i + 1 + hash(i#j) mod (N−1)) mod N`, so the offset
    * lands in `[1, N−1]` and self-pairs are structurally impossible.
    * Zero data shuffles — the draw is a pure per-row expression over the
    * id DOMAIN, where an index-table formulation (the non-dense path)
    * would pay a global row-number plus a join. Output: (doc_id,
    * neg_rank 1..k, neg_id). */
  def negativePairs(docs: DataFrame, k: Int,
                    idCol: String = "doc_id",
                    seed: Int = DefaultNegativeSeed): DataFrame = {
    require(k > 0, "k must be positive")
    val stats = docs.agg(
      count(lit(1)), min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    val n = stats.getLong(0)
    require(n > 1, s"need at least 2 documents, got $n")
    require(stats.getLong(1) == 0L && stats.getLong(2) == n - 1,
      s"negativePairs requires dense ids [0, $n); got [${stats.getLong(1)}, ${stats.getLong(2)}]")
    val negs = (0 until k).map { j =>
      (col(idCol) + 1 +
        Dedup.portableHash(concat(col(idCol).cast("string"), lit("#" + j)), seed)
          % (n - 1)) % n
    }
    docs.select(col(idCol).as("doc_id"),
        posexplode(array(negs: _*)).as(Seq("j", "neg_id")))
      .select(col("doc_id"), (col("j") + 1).cast("int").as("neg_rank"), col("neg_id"))
  }

  /** Token-budget allocation across corpus sources (water-filling): the
    * mixture step that turns "weights + a global token budget" into
    * per-source token allocations. Each source gets
    * `min(cap, λ·w)` — proportional to its mixture weight `w` until its
    * available tokens `cap` run out — with the water level λ chosen so
    * the allocations sum to the budget (every source capped when the
    * budget exceeds the total). Closed form, no iteration: sources
    * sorted by cap/w (saturation order), the crossing found via prefix
    * cap / suffix weight sums, λ read at the crossing row.
    *
    * `stats` is the PER-SOURCE profile (source, w, cap) — O(sources)
    * rows, so the global-ordering windows here are bounded by the
    * source count, never the corpus (the corpus-sized work is the
    * aggregation that builds `stats`, which shuffles once on source).
    * Adds (alloc rounded to 2, saturated); budget = total cap ×
    * `budgetFraction`. */
  def waterFill(stats: DataFrame, budgetFraction: Double): DataFrame = {
    require(budgetFraction > 0, "budgetFraction must be positive")
    val ord = Window.orderBy(col("ratio"), col("source"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // w <= 0 would poison λ with Inf/NaN far from the bad row — raise
    // at the row instead (same per-row guard style as weightedTake)
    val wChecked = when(col("w") > 0 && col("cap") >= 0, col("w"))
      .otherwise(raise_error(concat(
        lit("waterFill requires w > 0 and cap >= 0; got (w, cap) = ("),
        col("w").cast("string"), lit(", "), col("cap").cast("string"), lit(")"))))
    stats
      .withColumn("ratio", col("cap") / wChecked)
      .withColumn("rn", row_number().over(ord))
      .withColumn("lam",
        (sum(col("cap")).over(all) * budgetFraction
          - coalesce(sum(col("cap")).over(
            ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
          / sum(col("w")).over(
            ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("first_pos", min(when(col("lam") < col("ratio"), col("rn"))).over(all))
      .withColumn("lam_star",
        min(when(col("rn") === col("first_pos"), col("lam"))).over(all))
      .withColumn("saturated",
        col("first_pos").isNull || col("rn") < col("first_pos"))
      .select(col("source"), col("w"), col("cap"),
        round(when(col("saturated"), col("cap"))
          .otherwise(col("lam_star") * col("w")), 2).as("alloc"),
        col("saturated"))
  }

  /** Stratified exact-N sample: the `n` rows per stratum with the
    * smallest `(portableHash(id), id)` — a deterministic uniform draw
    * with an EXACT per-stratum size (hash-percent sampling like
    * [[mixtureKeep]] only hits its rate in expectation, which is wrong
    * for "give me 10k eval docs per language"). Needs a DataFrame (not
    * a Column): the rank is a window over the stratum.
    *
    * One shuffle on the stratum key. Strata are typically few and
    * large, so the ranking window is the skew risk at 100 TB; when a
    * stratum outweighs a partition, pre-filter with a hash-bucket cut
    * (keep the smallest buckets only, sized to overshoot `n`) before
    * ranking — same two-phase shape as a top-k. Output adds
    * `rank_in_stratum` (1-based). */
  def stratifiedTake(df: DataFrame, stratum: Column, id: Column, n: Int,
                     seed: Int = DefaultStratifiedSeed): DataFrame = {
    require(n > 0, "n must be positive")
    require(!df.columns.contains("rank_in_stratum"),
      "stratifiedTake generates rank_in_stratum, which already exists on the input; rename it first")
    val w = Window.partitionBy(stratum)
      .orderBy(Dedup.portableHash(id.cast("string"), seed), id)
    df.withColumn("rank_in_stratum", row_number().over(w).cast("int"))
      .filter(col("rank_in_stratum") <= n)
  }
}
