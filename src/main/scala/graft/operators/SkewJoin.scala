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
      pmod(xxhash64(large.columns.map(col): _*), lit(salts.toLong)))
    val replicated = small.withColumn(SaltCol,
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, SaltCol), how).drop(SaltCol)
  }
}
