package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) as a pure transform — the dbt `merge`
  * incremental strategy and the lakehouse `MERGE INTO` statement,
  * expressed as one full-outer join:
  *
  *  - key matched in both → the SOURCE row wins (update),
  *  - source-only key → inserted,
  *  - target-only key → kept unchanged,
  *  - source row with the delete flag set → dropped from the result
  *    (whether or not the key existed — an insert+delete is a no-op).
  *
  * Scale shape: ONE shuffle of each side on the merge key, no
  * driver-side state; at 100 TB the usual deployment partition-prunes
  * the target to the key ranges the source touches first (see
  * [[graft.write.IncrementalWriter]] for the partition-level variant —
  * delete+insert by partition — which this row-level merge
  * complements). */
object Merge {

  /** Row-level merge of `source` into `target` on `key`. Both sides
    * must carry `key` and the same data columns; `source` may
    * additionally carry `deleteCol` (boolean) marking rows to drop. */
  def upsert(target: DataFrame, source: DataFrame, key: String,
             deleteCol: Option[String] = None): DataFrame = {
    val dataCols = target.columns.filterNot(_ == key).toSeq
    val required = key +: dataCols
    val missing = required.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"source is missing merge columns: ${missing.mkString(", ")}")
    // the internal delete-flag name must not collide with a data column
    // (the select below would emit two graft_del columns)
    require(!required.contains("graft_del"),
      "merge reserves the column name graft_del; rename it on the target first")
    // SQL MERGE raises on multiple source matches per key; the full-outer
    // join would instead silently FAN OUT the matched target row. Enforce
    // the same contract up front (one aggregate over the source — the
    // small batch side by construction).
    val dup = source.groupBy(col(key)).count().filter(col("count") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"merge source has multiple rows for $key=${dup.headOption.map(_.get(0)).orNull}; " +
        "deduplicate the source first (MERGE semantics forbid multiple matches)")
    val src = deleteCol match {
      case Some(dc) => source.select((required.map(col) :+ col(dc).as("graft_del")): _*)
      case None => source.select(required.map(col): _*)
        .withColumn("graft_del", lit(false))
    }
    val t = target.alias("t")
    val s = src.alias("s")
    val matchedSrc = col(s"s.$key").isNotNull
    t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      // null-safe drop test: unmatched target rows carry a null flag
      .filter(!coalesce(col("s.graft_del"), lit(false)))
      .select(coalesce(col(s"s.$key"), col(s"t.$key")).as(key) +:
        dataCols.map(c =>
          when(matchedSrc, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }

  /** Keyed table diff — the reconciliation operator (migration
    * validation, replica drift detection, CDC audit): one full-outer
    * join on the key, each matched pair compared null-safely column by
    * column. Emits ONLY disagreeing keys with a status —
    * `only_left` / `only_right` / `changed` — so the common case
    * (tables agree) returns an empty frame and never materializes the
    * agreeing mass. One shuffle per side on the key; the comparison is
    * a codegen'd conjunction, no row serialization or hashing pass.
    * Both sides must share `key` and `compareCols` (defaults to every
    * non-key column of `left`, which must then exist on `right`). */
  def tableDiff(left: DataFrame, right: DataFrame, key: String,
                compareCols: Seq[String] = Nil): DataFrame = {
    val cols = if (compareCols.nonEmpty) compareCols
      else left.columns.filterNot(_ == key).toSeq
    val missing = (key +: cols).filterNot(c =>
      left.columns.contains(c) && right.columns.contains(c))
    require(missing.isEmpty,
      s"tableDiff columns absent from a side: ${missing.mkString(", ")}")
    val l = left.select((key +: cols).map(col): _*).alias("l")
    val r = right.select((key +: cols).map(col): _*).alias("r")
    val same = cols.map(c => col(s"l.$c") <=> col(s"r.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    l.join(r, col(s"l.$key") === col(s"r.$key"), "full_outer")
      .withColumn("diff_status",
        when(col(s"r.$key").isNull, "only_left")
          .when(col(s"l.$key").isNull, "only_right")
          .when(!same, "changed"))
      .filter(col("diff_status").isNotNull)
      .select(coalesce(col(s"l.$key"), col(s"r.$key")).as(key), col("diff_status"))
  }
}
