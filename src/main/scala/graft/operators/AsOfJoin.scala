package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single right row with the largest
  * `rightTs <= leftTs` in the same key group (market-data / slowly-
  * changing-attribute lookup; an operator Spark has no built-in for).
  *
  * Implemented as the union + last-non-null-window formulation, NOT an
  * inequality join: both inputs are tagged and unioned, one ranking
  * window per key carries the latest right-side values forward in time
  * order, and the probe rows are then filtered back out. Cost is ONE
  * shuffle on the key and a per-key sort — where the naive
  * `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-window formulation
  * explodes to |matches-per-key|² intermediate rows, this stays linear in
  * |L| + |R|: the 100 TB-safe shape.
  *
  * Inner semantics (left rows with no right row at-or-before them are
  * dropped), matching DuckDB/kdb ASOF JOIN defaults — which is also what
  * the DuckDB oracle runs. Right-side (key, ts) pairs must be unique
  * (the standard as-of precondition; enforce upstream).
  */
object AsOfJoin {

  /** Join `left` to the latest `right` row per `key` with
    * `right.ts <= left.ts`. Right value columns (everything except key
    * and ts) are appended; the right timestamp is exposed as `asofTsCol`.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           asofTsCol: String = "asof_ts"): DataFrame = {
    val valueCols = right.columns.filter(c => c != key && c != tsCol).toSeq
    require(valueCols.nonEmpty, "right side needs at least one value column")
    val leftCols = left.columns.toSeq
    // a right value column sharing a LEFT column's name would be silently
    // merged by unionByName and corrupt the window fill — refuse loudly;
    // same for a right value column named like the asof output column
    // (it would duplicate a struct field and fail much later, cryptically)
    require((valueCols.toSet + asofTsCol).intersect(leftCols.toSet).isEmpty,
      s"right value/asof columns collide with left columns: " +
        s"${(valueCols.toSet + asofTsCol).intersect(leftCols.toSet).mkString(", ")}")
    require(!valueCols.contains(asofTsCol),
      s"right value column '$asofTsCol' collides with the asof output column " +
        "— rename it or pass a different asofTsCol")
    // side 0 = right (visible to same-instant left rows: ties sort first),
    // side 1 = left. The right row travels as ONE struct so the window
    // fill is atomic — filling value columns independently would stitch a
    // chimera from different right rows whenever a value is legitimately
    // NULL (the filled column would reach further back than the others).
    // a NULL right timestamp can never satisfy rightTs <= leftTs (ASOF
    // semantics; NULL sorts first and would otherwise fill forward) —
    // drop such rows up front
    val r = right.filter(col(tsCol).isNotNull).select(
      col(key), col(tsCol).as("__ts"), lit(0).as("__side"),
      struct(col(tsCol).as(asofTsCol) +: valueCols.map(col): _*).as("__rv"))
    val l = left.withColumn("__ts", col(tsCol)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1 && col("__rv").isNotNull)
      .select(leftCols.map(col) ++
        (asofTsCol +: valueCols).map(c => col(s"__rv.$c").as(c)): _*)
  }
}
