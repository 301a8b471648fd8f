package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.entries.{DataPipelineEntries, TaxiEntries, TpchEntries}
import graft.model.Marts
import graft.sources.TaxiDerive

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every graded operator to a `(spark, sfDir) => DataFrame`;
  * `oracleSql` carries the DuckDB-equivalent SQL the driver runs over the
  * same parquet tables. Entries live in `graft.entries.*`, grouped by
  * surface: reference parity ([[TaxiEntries]]) and general relational
  * operators ([[TpchEntries]]).
  */
object SparkEntry {

  /** Flagship: the full medallion chain (derived feeds → staging →
    * unified → enriched → cleaned → fct_trips → daily mart) on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val (y, g, f, h) = TaxiDerive.feeds(spark, "/root/testdata/sf0.001")
    Marts.fctTripsDaily(Pipeline.buildModels(y, g, f, h).fctTrips)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TaxiEntries.queries ++ TpchEntries.queries ++ DataPipelineEntries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    TaxiEntries.oracleSql ++ TpchEntries.oracleSql ++ DataPipelineEntries.oracleSql
}
