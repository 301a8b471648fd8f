package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks: each check is a DataFrame of VIOLATING rows — the
  * dbt convention (`dbt test` fails when the compiled SELECT is non-empty,
  * SURVEY.md §3 entry point 3). `Checks.all` ports all 37 declared tests:
  * 35 generic (`dbt/models/{staging,intermediate,marts}/schema.yml`) + 2
  * singular (`dbt/tests/marts/assert_*.sql`).
  *
  * Each violation query is a filter directly over the model DataFrame, so
  * Catalyst fuses it with the model plan and pushes predicates into the
  * scan; running all checks over one cached mart costs one pass.
  */
object Checks {

  final case class Check(name: String, violations: DataFrame) {
    def passed: Boolean = violations.isEmpty
  }

  /** Generic test: `not_null` — violating rows have a null column. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** Generic test: `accepted_values`. dbt compiles this to
    * `GROUP BY col HAVING col NOT IN (...)` where a NULL passes under
    * three-valued logic (nullability is the separate `not_null` test), so
    * NULL rows are NOT violations here. */
  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.filter(!col(column).isin(values: _*))

  /** Generic test: `dbt_utils.accepted_range` (inclusive bounds; null
    * passes, matching dbt_utils' `where column is not null` template). */
  def acceptedRange(df: DataFrame, column: String,
                    min: Option[Double] = None, max: Option[Double] = None): DataFrame = {
    val c = col(column)
    val conds: Seq[Column] =
      min.map(m => c < m).toSeq ++ max.map(m => c > m).toSeq
    df.filter(c.isNotNull && conds.reduce(_ || _))
  }

  /** Singular: `assert_positive_fare.sql` — fails only if >5% of fct_trips
    * rows have non-positive fare/total. The two global aggregates are
    * single-row, combined via the reference's 1×1 implicit cross join (J1,
    * SURVEY §2.3) — the only join in the platform. */
  def assertPositiveFare(fctTrips: DataFrame): DataFrame = {
    // Both counts come from ONE aggregate over the input — a conditional
    // count and count(*) in the same pass — so the (possibly expensive)
    // upstream chain is scanned once, not once per side. The 1-row result
    // is collected and rebuilt as two local 1-row frames so the output
    // keeps the reference's 1×1 implicit cross-join shape (J1) with
    // nothing left persisted after the call.
    val spark = fctTrips.sparkSession
    import spark.implicits._
    val row = fctTrips.agg(
      coalesce(sum(when(col("fare_amount") <= 0 || col("total_amount") <= 0, 1L)), lit(0L)),
      count(lit(1))).head()
    val problem = Seq(row.getLong(0)).toDF("problem_count")
    val total = Seq(row.getLong(1)).toDF("total_count")
    problem.crossJoin(total)
      .withColumn("problem_percentage",
        col("problem_count") * 100.0 / col("total_count"))
      .filter(col("problem_percentage") > 5.0)
  }

  /** Singular: `assert_valid_speed.sql` — any row with speed <= 0 or > 100. */
  def assertValidSpeed(fctTrips: DataFrame): DataFrame =
    fctTrips.filter(col("avg_speed_mph") <= 0 || col("avg_speed_mph") > 100)

  private val taxiTypes = Seq("yellow", "green", "fhv", "fhvhv")
  private val timesOfDay = Seq("Morning", "Afternoon", "Evening", "Night")

  /** All 37 declared tests over the built models, keyed by layer. */
  def all(stgYellow: DataFrame, unified: DataFrame, enriched: DataFrame,
          cleaned: DataFrame, fct: DataFrame, daily: DataFrame,
          monthly: DataFrame): Seq[Check] = {

    // staging (12) — declared on the yellow model only (schema.yml:8-63)
    val staging =
      Seq("trip_id", "vendor_id", "pickup_datetime", "dropoff_datetime",
        "pickup_location_id", "dropoff_location_id", "trip_distance_miles",
        "total_amount", "year", "month")
        .map(c => Check(s"stg_yellow.$c.not_null", notNull(stgYellow, c))) ++
      Seq("trip_distance_miles", "total_amount")
        .map(c => Check(s"stg_yellow.$c.accepted_range_min0",
          acceptedRange(stgYellow, c, min = Some(0))))

    // intermediate (9) — schema.yml:4-45
    val intermediate = Seq(
      Check("int_unified.trip_id.not_null", notNull(unified, "trip_id")),
      Check("int_unified.taxi_type.not_null", notNull(unified, "taxi_type")),
      Check("int_unified.taxi_type.accepted_values",
        acceptedValues(unified, "taxi_type", taxiTypes)),
      Check("int_unified.pickup_datetime.not_null", notNull(unified, "pickup_datetime")),
      Check("int_enriched.trip_id.not_null", notNull(enriched, "trip_id")),
      Check("int_enriched.is_high_quality_trip.not_null",
        notNull(enriched, "is_high_quality_trip")),
      Check("int_enriched.time_of_day.accepted_values",
        acceptedValues(enriched, "time_of_day", timesOfDay)),
      Check("int_enriched.pickup_hour.accepted_range_0_23",
        acceptedRange(enriched, "pickup_hour", min = Some(0), max = Some(23))),
      Check("int_cleaned.trip_id.not_null", notNull(cleaned, "trip_id")))

    // marts (14) — schema.yml:4-87
    val marts = Seq(
      Check("fct_trips.trip_id.not_null", notNull(fct, "trip_id")),
      Check("fct_trips.taxi_type.not_null", notNull(fct, "taxi_type")),
      Check("fct_trips.taxi_type.accepted_values",
        acceptedValues(fct, "taxi_type", taxiTypes)),
      Check("fct_trips.pickup_datetime.not_null", notNull(fct, "pickup_datetime")),
      Check("fct_trips.is_high_quality_trip.not_null",
        notNull(fct, "is_high_quality_trip")),
      Check("fct_daily.trip_date.not_null", notNull(daily, "trip_date")),
      Check("fct_daily.taxi_type.not_null", notNull(daily, "taxi_type")),
      Check("fct_daily.total_trips.not_null", notNull(daily, "total_trips")),
      Check("fct_daily.total_trips.accepted_range_min0",
        acceptedRange(daily, "total_trips", min = Some(0))),
      Check("fct_monthly.year.not_null", notNull(monthly, "year")),
      Check("fct_monthly.month.not_null", notNull(monthly, "month")),
      Check("fct_monthly.taxi_type.not_null", notNull(monthly, "taxi_type")),
      Check("fct_monthly.total_trips.not_null", notNull(monthly, "total_trips")),
      Check("fct_monthly.total_trips.accepted_range_min0",
        acceptedRange(monthly, "total_trips", min = Some(0))))

    // singular (2) — dbt/tests/marts/
    val singular = Seq(
      Check("assert_positive_fare", assertPositiveFare(fct)),
      Check("assert_valid_speed", assertValidSpeed(fct)))

    staging ++ intermediate ++ marts ++ singular
  }
}
