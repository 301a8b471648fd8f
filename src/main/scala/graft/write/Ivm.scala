package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for count/sum aggregates off a CDC
  * changelog — the derived-table pattern a lakehouse consumer actually
  * runs: instead of re-aggregating the whole table after every commit,
  * aggregate ONLY the changelog (insert = +1, delete = −1) and merge the
  * per-group deltas into the stored aggregate. Cost per refresh is
  * O(changed rows), never O(table) — the property that keeps a daily
  * mart refresh constant-time as the 100 TB base table grows.
  *
  * Correctness rests on count/sum being ABELIAN-GROUP aggregates
  * (deletable): the signed delta-aggregate plus the old aggregate is
  * exactly the new aggregate, including decimal-exact sums when the
  * value column is accumulated in decimal (pass
  * [[graft.expr.Functions.stableSum]]'s cast — decimal addition is
  * associative, so base + inserts − deletes ≡ a full recompute
  * bit-for-bit). min/max are NOT deletable (a delete can expose an
  * unknown runner-up) — maintain those with the recompute path. */
object Ivm {

  /** Merge a [[SnapshotTable.changelog]] into a stored (keys, n, sum)
    * aggregate. `base` carries `keys :+ nCol :+ sumCol`; `log` carries
    * the changelog rows with their `op` column; `value` is the summed
    * expression over the log's columns (use the same decimal cast the
    * base aggregate used). Groups whose maintained count reaches 0 are
    * dropped (the group no longer exists in the table).
    *
    * The merge is a UNION + SUM, deliberately not a join + `+`: Spark's
    * decimal addition widens precision past 38 and silently rounds the
    * scale down (38,10 + 38,10 → 38,9 — one lost decimal digit per
    * merge, compounding across refreshes), while `sum` over
    * decimal(38,10) keeps the scale. Decimal `sum` is also what makes
    * the whole merge order-independent, so base + delta ≡ a full
    * recompute BIT-FOR-BIT (pinned by a randomized multiset property in
    * `PropertiesSpec`). One shuffle over (groups + changed rows) — never
    * a scan of the base table. */
  def applyCountSumDelta(base: DataFrame, log: DataFrame, keys: Seq[String],
                         nCol: String, sumCol: String, value: Column): DataFrame = {
    require(keys.nonEmpty, "at least one group key")
    val sign = when(col("op") === "insert", lit(1L))
      .when(col("op") === "delete", lit(-1L))
      .otherwise(raise_error(concat(lit("unknown changelog op: "), col("op"))))
    // NEGATE rather than multiply by the sign: decimal × integer also
    // widens precision and silently reduces the scale (38,10 → 38,6);
    // unary minus preserves the type exactly
    val signedValue = when(col("op") === "insert", value)
      .when(col("op") === "delete", -value)
    val deltaRows = log.select(
      keys.map(col) ++ Seq(sign.as(nCol), signedValue.as(sumCol)): _*)
    base.select(keys.map(col) ++ Seq(col(nCol), col(sumCol)): _*)
      .unionByName(deltaRows)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(nCol)).as(nCol), sum(col(sumCol)).as(sumCol))
      .filter(col(nCol) > 0)
  }
}
