package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes per layer (SURVEY.md §1). Raw feeds carry only the
  * columns the staging models consume plus the three ingest-stamped
  * metadata columns (`FIXTURES.md` §A; reference
  * `scripts/nyc_taxi/ingest_spark_bulk.py:141-144`).
  */
object TaxiSchemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) = StructField(n, t, nullable)

  private val ingestMeta = Seq(
    f("year", IntegerType), f("month", IntegerType), f("loaded_at", TimestampType))

  /** raw.yellow_trips — `stg_nyc_taxi__yellow_trips.sql:22-47`. */
  val rawYellow: StructType = StructType(Seq(
    f("vendorid", LongType),
    f("tpep_pickup_datetime", TimestampType),
    f("tpep_dropoff_datetime", TimestampType),
    f("pulocationid", LongType),
    f("dolocationid", LongType),
    f("passenger_count", DoubleType),
    f("trip_distance", DoubleType),
    f("fare_amount", DoubleType),
    f("total_amount", DoubleType)
  ) ++ ingestMeta)

  /** raw.green_trips — identical to yellow with lpep_* pickup/dropoff. */
  val rawGreen: StructType = StructType(Seq(
    f("vendorid", LongType),
    f("lpep_pickup_datetime", TimestampType),
    f("lpep_dropoff_datetime", TimestampType),
    f("pulocationid", LongType),
    f("dolocationid", LongType),
    f("passenger_count", DoubleType),
    f("trip_distance", DoubleType),
    f("fare_amount", DoubleType),
    f("total_amount", DoubleType)
  ) ++ ingestMeta)

  /** raw.fhv_trips — `stg_nyc_taxi__fhv_trips.sql:22-42`. */
  val rawFhv: StructType = StructType(Seq(
    f("pickup_datetime", TimestampType),
    f("dropoff_datetime", TimestampType),
    f("pulocationid", LongType),
    f("dolocationid", LongType),
    f("dispatching_base_num", StringType)
  ) ++ ingestMeta)

  /** raw.fhvhv_trips — `stg_nyc_taxi__fhvhv_trips.sql:22-45`. */
  val rawFhvhv: StructType = StructType(Seq(
    f("hvfhs_license_num", StringType),
    f("dispatching_base_num", StringType),
    f("pickup_datetime", TimestampType),
    f("dropoff_datetime", TimestampType),
    f("pulocationid", LongType),
    f("dolocationid", LongType),
    f("trip_miles", DoubleType),
    f("base_passenger_fare", DoubleType)
  ) ++ ingestMeta)

  /** The unified 17-column trip schema (`int_trips_unified.sql:10-96`);
    * column order is the reference's declared select order.
    * `pickup`/`dropoff` are TIMESTAMP_NTZ — the faithful mapping of the
    * reference's zone-less Trino `timestamp(6)` (staging casts whatever
    * zone flavor the raw feed carries; the session is pinned UTC).
    * `loaded_at` stays zoned: it is a `current_timestamp()` ingest stamp,
    * an instant by nature. */
  val unified: StructType = StructType(Seq(
    f("trip_id", StringType),
    f("taxi_type", StringType),
    f("vendor_id", LongType),
    f("pickup_location_id", LongType),
    f("dropoff_location_id", LongType),
    f("pickup_datetime", TimestampNTZType),
    f("dropoff_datetime", TimestampNTZType),
    f("passenger_count", DoubleType),
    f("trip_distance_miles", DoubleType),
    f("fare_amount", DoubleType),
    f("total_amount", DoubleType),
    f("base_passenger_fare", DoubleType),
    f("hvfhs_license_number", StringType),
    f("dispatching_base_number", StringType),
    f("year", IntegerType),
    f("month", IntegerType),
    f("loaded_at", TimestampType)
  ))

  /** Enrichment columns appended by int_trips_enriched (`:19-93`). */
  val enrichedExtra: Seq[String] = Seq(
    "trip_duration_seconds", "trip_duration_minutes", "trip_duration_hours",
    "avg_speed_mph", "cost_per_mile", "cost_per_minute",
    "pickup_hour", "pickup_day_of_week", "pickup_day_name", "time_of_day",
    "is_valid_duration", "is_valid_distance", "is_valid_fare",
    "is_high_quality_trip")
}
