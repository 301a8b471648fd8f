package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins, for when AQE's runtime skew
  * split isn't available (e.g. the skewed side feeds other operators that
  * pin the partitioning) or the skew is known ahead of time.
  *
  * The classic salt trick: the SKEWED (probe) side scatters each hot key
  * across `salts` sub-keys; the small (build) side is replicated once per
  * salt value. The join key becomes (key, salt), so one hot key's rows
  * spread over `salts` tasks instead of one straggler. Cost: build side
  * ×salts — keep the build side the smaller input.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Inner/left salted equi-join of a skewed `large` side against a
    * `small` side on `key`. Result equals `large.join(small, key, how)`
    * row-for-row; only the physical distribution changes. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, how: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(how == "inner" || how == "left" || how == "left_outer",
      s"salted join supports inner/left, got $how")
    // row-scoped salt: spreads a hot key's rows evenly; it only routes
    // distribution, never semantics. Derived DETERMINISTICALLY from row
    // content (not monotonically_increasing_id): on task/stage retry —
    // routine at 100 TB — recomputed rows must land on the same salt as
    // the shuffle files already fetched, or rows duplicate/vanish (the
    // round-robin-repartition failure class). Knowing limit of the
    // content hash: FULLY identical duplicate rows share a salt, so a hot
    // key made of byte-identical copies still lands in one bucket —
    // determinism under retries is non-negotiable at scale, and real fact
    // rows carry a distinguishing column; run exact dedup first if yours
    // do not.
    val salted = large.withColumn(SaltCol,
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val replicated = small.withColumn(SaltCol,
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, SaltCol), how).drop(SaltCol)
  }

  /** Per-group top-k under group skew. A plain ranking window shuffles
    * EVERY row of a group to one task — a 10⁹-row hot group lands on a
    * single reducer. Two stages instead: rows salt into `salts`
    * sub-groups, stage 1 keeps a LOCAL top-k per (group, salt) — at
    * most k·salts survivors per group — stage 2 ranks only the
    * survivors. Every true global top-k row is in its sub-group's local
    * top-k, so the result equals the plain window top-k row-for-row
    * while the hot group's bulk never converges on one task.
    *
    * The salt is content-derived, not random — same retry-safety
    * rationale as [[saltedJoin]]. The (orderCol DESC, tieCol ASC) order
    * must be total within a group (tieCol unique, e.g. a key column) or
    * rank assignment at equal sort keys is nondeterministic — true of
    * the plain window formulation too. Appends an `rn` column. */
  def saltedTopK(df: DataFrame, groupCols: Seq[String], orderCol: String,
                 tieCol: String, k: Int, salts: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(salts > 0, "salts must be positive")
    import org.apache.spark.sql.expressions.Window
    val local = Window.partitionBy((groupCols :+ SaltCol).map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol))
    val global = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol))
    df.withColumn(SaltCol,
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
      .withColumn("__local_rn", row_number().over(local))
      .filter(col("__local_rn") <= k)
      .drop(SaltCol, "__local_rn")
      .withColumn("rn", row_number().over(global).cast("int"))
      .filter(col("rn") <= k)
  }
}
