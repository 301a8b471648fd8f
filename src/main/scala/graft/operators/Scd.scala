package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder — the lakehouse step that
  * turns an attribute-change event stream into versioned validity
  * intervals: one row per (key, run of equal attribute values) carrying
  * `valid_from` / `valid_to` / `version` / `is_current`. The reference
  * platform's dbt models materialize current-state dimensions; SCD2 is
  * the standard historized variant of that layer.
  *
  * Scale shape: both window passes partition on the key, so the whole
  * build is ONE shuffle — the run-start filter between them preserves
  * partitioning AND ordering, so the second window reuses the first's
  * exchange and sort. No self-joins, no driver state; at 100 TB the
  * cost is one sort of the change stream within key partitions.
  */
object Scd {

  /** Collapse `changes` into SCD2 rows.
    *
    * @param keyCol  dimension key column name
    * @param tsCol   change timestamp column name
    * @param attrCol tracked attribute column name
    * @param tieCol  unique tiebreak column name — makes the within-key
    *                order total, so runs (and therefore versions) are
    *                deterministic under equal timestamps
    *
    * A "run" is a maximal sequence of consecutive equal attribute
    * values (null-safe comparison: null → null is NOT a change). Each
    * run yields one row: `valid_from` = its first change's timestamp,
    * `valid_to` = the next run's `valid_from` (null on the live row),
    * `version` = 1-based run index per key, `is_current` on the last
    * run. Re-instated values ("A → B → A") correctly produce three
    * versions — runs compare ADJACENT values only. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           attrCol: String, tieCol: String): DataFrame = {
    // withColumn REPLACES same-named columns silently — refuse inputs
    // already carrying the generated (or internal) names, same contract
    // as Packing.packAssign
    val clash = Seq("valid_from", "valid_to", "version", "is_current",
      "graft_prev_attr", "graft_is_first").filter(changes.columns.contains)
    require(clash.isEmpty,
      s"scd2 generates columns ${clash.mkString(", ")} which already exist on the input; rename them first")
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val runStarts = changes
      .withColumn("graft_prev_attr", lag(col(attrCol), 1).over(order))
      .withColumn("graft_is_first", row_number().over(order) === 1)
      // null-safe change test: the FIRST row per key always starts a run
      // (flagged explicitly — a lag-is-null test would misfire when the
      // previous row's attribute is itself null)
      .filter(col("graft_is_first") || !(col(attrCol) <=> col("graft_prev_attr")))
    runStarts
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(order))
      .withColumn("version", row_number().over(order).cast("int"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
  }
}
