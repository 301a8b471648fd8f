package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic taxi-shaped raw feeds derived from the driver's TPC-H-ish
  * corpus (`TESTDATA.md`), so the reference's full medallion pipeline
  * (staging → marts, SURVEY §2) can be graded against the DuckDB oracle on
  * the same parquet tables the driver registers.
  *
  * Every expression here is mirrored 1:1 in DuckDB SQL by
  * [[graft.oracle.TaxiSql]]; the two must stay in lockstep — the pair is
  * covered by the round's CORRECTNESS harness. Only integer modulus,
  * whole-second timestamp arithmetic, and IEEE double ops are used, so both
  * engines produce bit-identical values.
  *
  * The derivations deliberately cover the reference's semantic edges
  * (FIXTURES.md §A): NULL pickup/dropoff timestamps, pickup == dropoff
  * (zero duration), negative distances and totals (dropped by the staging
  * validity filter P2), NULL location ids (surrogate-key sentinel + quality
  * flag), NULL passenger counts, >100-mile and >500-dollar outliers
  * (quality-flag boundaries), all 24 pickup hours and all 7 weekdays.
  */
object TaxiDerive {

  /** Whole-second timestamp shift — `unix_seconds` is exact here because
    * every source timestamp is a midnight date. The corpus timestamps are
    * TIMESTAMP_NTZ (zone-less, like the reference's Trino `timestamp(6)`);
    * the session is pinned to UTC so the NTZ↔instant casts around the
    * epoch arithmetic are identities. */
  private def addSecs(ts: Column, secs: Column): Column =
    timestamp_seconds(unix_seconds(ts.cast("timestamp")) + secs).cast("timestamp_ntz")

  private def nullTs = lit(null).cast("timestamp_ntz")

  /** Raw yellow feed from `lineitem` (schema per FIXTURES.md §A). */
  def yellow(lineitem: DataFrame): DataFrame = {
    val puOff = col("l_orderkey") % 86400
    val dur = (col("l_partkey") % 200) * 60 + col("l_suppkey") % 60
    lineitem.select(
      (col("l_suppkey") % 2 + 1).as("vendorid"),
      when(col("l_orderkey") % 101 === 0, nullTs)
        .otherwise(addSecs(col("l_shipdate"), puOff)).as("tpep_pickup_datetime"),
      when(col("l_orderkey") % 101 === 0 || col("l_orderkey") % 103 === 0, nullTs)
        .otherwise(addSecs(col("l_shipdate"), puOff + dur)).as("tpep_dropoff_datetime"),
      (col("l_partkey") % 250 + 1).as("pulocationid"),
      when(col("l_partkey") % 89 === 0, lit(null).cast("long"))
        .otherwise(col("l_suppkey") % 250 + 1).as("dolocationid"),
      when(col("l_suppkey") % 13 === 0, lit(null).cast("double"))
        .otherwise((col("l_linenumber") % 6 + 1).cast("double")).as("passenger_count"),
      (col("l_quantity") * 2.5 - 5.0).as("trip_distance"),
      (col("l_extendedprice") / 100.0).as("fare_amount"),
      when(col("l_returnflag") === "R" && col("l_orderkey") % 7 === 0, lit(-1.0))
        .otherwise(col("l_extendedprice") / 90.0).as("total_amount"),
      year(col("l_shipdate")).as("year"),
      month(col("l_shipdate")).as("month"),
      current_timestamp().as("loaded_at"))
  }

  /** Raw green feed from `lineitem` (lpep_* timestamp column names). */
  def green(lineitem: DataFrame): DataFrame = {
    val puOff = col("l_partkey") % 86400
    val dur = (col("l_suppkey") % 180) * 60 + col("l_orderkey") % 60
    lineitem.select(
      (col("l_partkey") % 2 + 1).as("vendorid"),
      when(col("l_orderkey") % 89 === 0, nullTs)
        .otherwise(addSecs(col("l_shipdate"), puOff)).as("lpep_pickup_datetime"),
      when(col("l_orderkey") % 89 === 0, nullTs)
        .otherwise(addSecs(col("l_shipdate"), puOff + dur)).as("lpep_dropoff_datetime"),
      (col("l_suppkey") % 100 + 1).as("pulocationid"),
      when(col("l_suppkey") % 71 === 0, lit(null).cast("long"))
        .otherwise(col("l_partkey") % 100 + 1).as("dolocationid"),
      when(col("l_partkey") % 17 === 0, lit(null).cast("double"))
        .otherwise((col("l_linenumber") % 4 + 1).cast("double")).as("passenger_count"),
      (col("l_quantity") * 1.5 - 3.0).as("trip_distance"),
      (col("l_extendedprice") / 120.0).as("fare_amount"),
      when(col("l_linestatus") === "F" && col("l_orderkey") % 11 === 0, lit(-5.0))
        .otherwise(col("l_extendedprice") / 80.0).as("total_amount"),
      year(col("l_shipdate")).as("year"),
      month(col("l_shipdate")).as("month"),
      current_timestamp().as("loaded_at"))
  }

  /** Raw fhv feed from `orders`. */
  def fhv(orders: DataFrame): DataFrame = {
    val puOff = col("o_orderkey") % 86400
    val dur = col("o_custkey") % 7200
    orders.select(
      when(col("o_orderkey") % 97 === 0, nullTs)
        .otherwise(addSecs(col("o_orderdate"), puOff)).as("pickup_datetime"),
      when(col("o_orderkey") % 97 === 0, nullTs)
        .otherwise(addSecs(col("o_orderdate"), puOff + dur)).as("dropoff_datetime"),
      (col("o_custkey") % 250 + 1).as("pulocationid"),
      when(col("o_custkey") % 83 === 0, lit(null).cast("long"))
        .otherwise(col("o_orderkey") % 250 + 1).as("dolocationid"),
      concat(lit("B"), lpad((col("o_orderkey") % 500).cast("string"), 5, "0"))
        .as("dispatching_base_num"),
      year(col("o_orderdate")).as("year"),
      month(col("o_orderdate")).as("month"),
      current_timestamp().as("loaded_at"))
  }

  /** Raw fhvhv feed from `orders`. */
  def fhvhv(orders: DataFrame): DataFrame = {
    val puOff = col("o_custkey") % 86400
    val dur = (col("o_orderkey") % 150) * 60 + col("o_custkey") % 60
    orders.select(
      concat(lit("HV"), (col("o_orderkey") % 4 + 2).cast("string")).as("hvfhs_license_num"),
      concat(lit("B"), lpad((col("o_custkey") % 300).cast("string"), 5, "0"))
        .as("dispatching_base_num"),
      when(col("o_custkey") % 101 === 0, nullTs)
        .otherwise(addSecs(col("o_orderdate"), puOff)).as("pickup_datetime"),
      when(col("o_custkey") % 101 === 0, nullTs)
        .otherwise(addSecs(col("o_orderdate"), puOff + dur)).as("dropoff_datetime"),
      (col("o_orderkey") % 250 + 1).as("pulocationid"),
      (col("o_custkey") % 250 + 1).as("dolocationid"),
      (col("o_totalprice") / 5000.0 - 1.0).as("trip_miles"),
      (col("o_totalprice") / 3000.0).as("base_passenger_fare"),
      year(col("o_orderdate")).as("year"),
      month(col("o_orderdate")).as("month"),
      current_timestamp().as("loaded_at"))
  }

  /** All four raw feeds for a scale-factor dir. The sources are spread
    * across cores first ([[Tables.spread]], a no-op on healthy multi-split
    * layouts): the md5 surrogate keys and enrichment expressions fuse into
    * the scan stage, which would otherwise run single-threaded over a
    * one-row-group file. */
  def feeds(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val li = Tables.spread(Tables.lineitem(spark, dir))
    val ord = Tables.spread(Tables.orders(spark, dir))
    (yellow(li), green(li), fhv(ord), fhvhv(ord))
  }
}
