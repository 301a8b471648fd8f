package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.Functions._

/** Staging layer: rename+cast projection (P1), validity filter (P2),
  * surrogate key (F1) per feed — reference
  * `dbt/models/staging/stg_nyc_taxi__{yellow,green,fhv,fhvhv}_trips.sql`.
  *
  * Each transform is a pure `DataFrame => DataFrame`: a narrow `select`
  * immediately after the scan, so Catalyst prunes unused raw columns out
  * of the parquet read, and the validity predicates sit directly over the
  * source so they push into parquet row-group filters. At 100 TB the raw
  * feeds are the widest tables in the system — this projection/pushdown is
  * what keeps the staging pass I/O-bound on ~10 of 19+ columns instead of
  * the full width.
  *
  * The incremental cut predicate (P3, `...yellow_trips.sql:13-17`) lives in
  * [[graft.write.IncrementalWriter]] since it only applies against an
  * existing target table.
  */
object Staging {

  /** Surrogate key over the raw pickup/location triple, exactly the
    * dbt_utils macro expansion (md5 of '-'-joined coalesced varchar casts)
    * with graft's canonical microsecond-precision timestamp rendering. */
  private def tripId(pickupRaw: Column, pu: Column, dol: Column): Column =
    surrogateKey(timestampKeyRepr(pickupRaw), pu, dol)

  /** `stg_nyc_taxi__yellow_trips.sql:20-47`. */
  def yellow(raw: DataFrame): DataFrame =
    raw.filter(
      col("tpep_pickup_datetime").isNotNull &&
        col("tpep_dropoff_datetime").isNotNull &&
        col("tpep_pickup_datetime") < col("tpep_dropoff_datetime") &&
        col("trip_distance") >= 0 &&
        col("total_amount") >= 0)
      .select(
        tripId(col("tpep_pickup_datetime"), col("pulocationid"), col("dolocationid")).as("trip_id"),
        col("vendorid").cast("long").as("vendor_id"),
        col("pulocationid").cast("long").as("pickup_location_id"),
        col("dolocationid").cast("long").as("dropoff_location_id"),
        col("tpep_pickup_datetime").cast("timestamp_ntz").as("pickup_datetime"),
        col("tpep_dropoff_datetime").cast("timestamp_ntz").as("dropoff_datetime"),
        col("passenger_count").cast("double").as("passenger_count"),
        col("trip_distance").cast("double").as("trip_distance_miles"),
        col("fare_amount").cast("double").as("fare_amount"),
        col("total_amount").cast("double").as("total_amount"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        lit("yellow").as("taxi_type"),
        current_timestamp().as("loaded_at"))

  /** `stg_nyc_taxi__green_trips.sql:20-47` — yellow with lpep_* columns. */
  def green(raw: DataFrame): DataFrame =
    yellow(raw
      .withColumnRenamed("lpep_pickup_datetime", "tpep_pickup_datetime")
      .withColumnRenamed("lpep_dropoff_datetime", "tpep_dropoff_datetime"))
      .withColumn("taxi_type", lit("green"))

  /** `stg_nyc_taxi__fhv_trips.sql:20-42`. */
  def fhv(raw: DataFrame): DataFrame =
    raw.filter(
      col("pickup_datetime").isNotNull &&
        col("dropoff_datetime").isNotNull &&
        col("pickup_datetime") < col("dropoff_datetime"))
      .select(
        tripId(col("pickup_datetime"), col("pulocationid"), col("dolocationid")).as("trip_id"),
        col("pulocationid").cast("long").as("pickup_location_id"),
        col("dolocationid").cast("long").as("dropoff_location_id"),
        col("pickup_datetime").cast("timestamp_ntz").as("pickup_datetime"),
        col("dropoff_datetime").cast("timestamp_ntz").as("dropoff_datetime"),
        col("dispatching_base_num").cast("string").as("dispatching_base_number"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        lit("fhv").as("taxi_type"),
        current_timestamp().as("loaded_at"))

  /** `stg_nyc_taxi__fhvhv_trips.sql:20-45`. */
  def fhvhv(raw: DataFrame): DataFrame =
    raw.filter(
      col("pickup_datetime").isNotNull &&
        col("dropoff_datetime").isNotNull &&
        col("pickup_datetime") < col("dropoff_datetime") &&
        col("trip_miles") >= 0)
      .select(
        tripId(col("pickup_datetime"), col("pulocationid"), col("dolocationid")).as("trip_id"),
        col("pulocationid").cast("long").as("pickup_location_id"),
        col("dolocationid").cast("long").as("dropoff_location_id"),
        col("pickup_datetime").cast("timestamp_ntz").as("pickup_datetime"),
        col("dropoff_datetime").cast("timestamp_ntz").as("dropoff_datetime"),
        col("trip_miles").cast("double").as("trip_distance_miles"),
        col("base_passenger_fare").cast("double").as("base_passenger_fare"),
        col("hvfhs_license_num").cast("string").as("hvfhs_license_number"),
        col("dispatching_base_num").cast("string").as("dispatching_base_number"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        lit("fhvhv").as("taxi_type"),
        current_timestamp().as("loaded_at"))
}
