package graft.oracle

/** DuckDB oracle SQL for the taxi medallion chain, mirroring
  * [[graft.sources.TaxiDerive]] + [[graft.model.Staging]] +
  * [[graft.model.Intermediate]] + [[graft.model.Marts]] expression by
  * expression (reference semantics: the SQL under `dbt/models/`).
  *
  * Dialect notes (why some expressions look unusual):
  *  - [[Dialect.rnd]] reproduces Spark's `round` on doubles exactly:
  *    Spark rounds `BigDecimal.valueOf(x)` — i.e. the SHORTEST DECIMAL
  *    REPRESENTATION of the double — HALF_UP. DuckDB's native
  *    `round(double)` uses float math and disagrees on values like 1.005,
  *    so the oracle casts through VARCHAR (DuckDB renders shortest repr
  *    too) into DECIMAL and rounds there.
  *  - Durations avoid DuckDB's `date_diff`, which counts BOUNDARY
  *    CROSSINGS, not elapsed units (Trino's `date_diff` is truncating
  *    elapsed — `int_trips_enriched.sql:19-21`); instead they floor-divide
  *    epoch-microsecond differences, exactly like
  *    [[graft.expr.Functions.secondsBetween]].
  *  - Integer sums are cast to BIGINT (DuckDB widens to HUGEINT, Spark
  *    keeps LongType).
  *  - `isodow` is DuckDB's ISO day-of-week 1=Mon..7=Sun — the Trino
  *    `day_of_week` semantics (`int_trips_enriched.sql:50`).
  */
object TaxiSql {

  object Dialect {
    /** Spark-equivalent HALF_UP double rounding (see class doc). */
    def rnd(x: String, n: Int): String =
      s"CAST(round(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(38,18)), $n) AS DOUBLE)"

    /** Order-independent double sum — mirror of
      * [[graft.expr.Functions.stableSum]]: each double's shortest decimal
      * representation (VARCHAR cast in DuckDB, `BigDecimal.valueOf` in
      * Spark) accumulated exactly in DECIMAL(38,10). */
    def decSum(x: String): String =
      s"sum(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(38,10)))"

    /** Mirror of [[graft.expr.Functions.stableRoundedSum]]. */
    def rndSum(x: String, n: Int): String =
      s"CAST(round(${decSum(x)}, $n) AS DOUBLE)"

    /** Mirror of [[graft.expr.Functions.stableAvg]]. */
    def stableAvg(x: String): String =
      s"CAST(${decSum(x)} AS DOUBLE) / count($x)"

    /** dbt_utils.generate_surrogate_key with graft's canonical µs
      * timestamp rendering (mirrors [[graft.expr.Functions.surrogateKey]]
      * + `timestampKeyRepr`). */
    def surrogateKeyTs(ts: String, a: String, b: String): String = {
      val sentinel = "'_dbt_utils_surrogate_key_null_'"
      s"""md5(concat_ws('-',
         |      coalesce(strftime($ts, '%Y-%m-%d %H:%M:%S.%f'), $sentinel),
         |      coalesce(CAST($a AS VARCHAR), $sentinel),
         |      coalesce(CAST($b AS VARCHAR), $sentinel)))""".stripMargin
    }
  }
  import Dialect._

  /** Raw-feed CTEs — mirror of [[graft.sources.TaxiDerive]]. */
  private val rawCtes: String =
    s"""raw_yellow AS (
       |  SELECT
       |    l_suppkey % 2 + 1 AS vendorid,
       |    CASE WHEN l_orderkey % 101 = 0 THEN NULL
       |         ELSE l_shipdate + to_seconds(l_orderkey % 86400) END AS tpep_pickup_datetime,
       |    CASE WHEN l_orderkey % 101 = 0 OR l_orderkey % 103 = 0 THEN NULL
       |         ELSE l_shipdate + to_seconds(l_orderkey % 86400 + (l_partkey % 200) * 60 + l_suppkey % 60) END AS tpep_dropoff_datetime,
       |    l_partkey % 250 + 1 AS pulocationid,
       |    CASE WHEN l_partkey % 89 = 0 THEN NULL ELSE l_suppkey % 250 + 1 END AS dolocationid,
       |    CASE WHEN l_suppkey % 13 = 0 THEN NULL ELSE CAST(l_linenumber % 6 + 1 AS DOUBLE) END AS passenger_count,
       |    l_quantity * 2.5 - 5.0 AS trip_distance,
       |    l_extendedprice / 100.0 AS fare_amount,
       |    CASE WHEN l_returnflag = 'R' AND l_orderkey % 7 = 0 THEN -1.0
       |         ELSE l_extendedprice / 90.0 END AS total_amount,
       |    CAST(year(l_shipdate) AS INTEGER) AS year,
       |    CAST(month(l_shipdate) AS INTEGER) AS month
       |  FROM lineitem
       |),
       |raw_green AS (
       |  SELECT
       |    l_partkey % 2 + 1 AS vendorid,
       |    CASE WHEN l_orderkey % 89 = 0 THEN NULL
       |         ELSE l_shipdate + to_seconds(l_partkey % 86400) END AS lpep_pickup_datetime,
       |    CASE WHEN l_orderkey % 89 = 0 THEN NULL
       |         ELSE l_shipdate + to_seconds(l_partkey % 86400 + (l_suppkey % 180) * 60 + l_orderkey % 60) END AS lpep_dropoff_datetime,
       |    l_suppkey % 100 + 1 AS pulocationid,
       |    CASE WHEN l_suppkey % 71 = 0 THEN NULL ELSE l_partkey % 100 + 1 END AS dolocationid,
       |    CASE WHEN l_partkey % 17 = 0 THEN NULL ELSE CAST(l_linenumber % 4 + 1 AS DOUBLE) END AS passenger_count,
       |    l_quantity * 1.5 - 3.0 AS trip_distance,
       |    l_extendedprice / 120.0 AS fare_amount,
       |    CASE WHEN l_linestatus = 'F' AND l_orderkey % 11 = 0 THEN -5.0
       |         ELSE l_extendedprice / 80.0 END AS total_amount,
       |    CAST(year(l_shipdate) AS INTEGER) AS year,
       |    CAST(month(l_shipdate) AS INTEGER) AS month
       |  FROM lineitem
       |),
       |raw_fhv AS (
       |  SELECT
       |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
       |         ELSE o_orderdate + to_seconds(o_orderkey % 86400) END AS pickup_datetime,
       |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
       |         ELSE o_orderdate + to_seconds(o_orderkey % 86400 + o_custkey % 7200) END AS dropoff_datetime,
       |    o_custkey % 250 + 1 AS pulocationid,
       |    CASE WHEN o_custkey % 83 = 0 THEN NULL ELSE o_orderkey % 250 + 1 END AS dolocationid,
       |    'B' || lpad(CAST(o_orderkey % 500 AS VARCHAR), 5, '0') AS dispatching_base_num,
       |    CAST(year(o_orderdate) AS INTEGER) AS year,
       |    CAST(month(o_orderdate) AS INTEGER) AS month
       |  FROM orders
       |),
       |raw_fhvhv AS (
       |  SELECT
       |    'HV' || CAST(o_orderkey % 4 + 2 AS VARCHAR) AS hvfhs_license_num,
       |    'B' || lpad(CAST(o_custkey % 300 AS VARCHAR), 5, '0') AS dispatching_base_num,
       |    CASE WHEN o_custkey % 101 = 0 THEN NULL
       |         ELSE o_orderdate + to_seconds(o_custkey % 86400) END AS pickup_datetime,
       |    CASE WHEN o_custkey % 101 = 0 THEN NULL
       |         ELSE o_orderdate + to_seconds(o_custkey % 86400 + (o_orderkey % 150) * 60 + o_custkey % 60) END AS dropoff_datetime,
       |    o_orderkey % 250 + 1 AS pulocationid,
       |    o_custkey % 250 + 1 AS dolocationid,
       |    o_totalprice / 5000.0 - 1.0 AS trip_miles,
       |    o_totalprice / 3000.0 AS base_passenger_fare,
       |    CAST(year(o_orderdate) AS INTEGER) AS year,
       |    CAST(month(o_orderdate) AS INTEGER) AS month
       |  FROM orders
       |)""".stripMargin

  /** Staging CTEs — mirror of [[graft.model.Staging]]
    * (`stg_nyc_taxi__*_trips.sql`). */
  private val stgCtes: String =
    s"""stg_yellow AS (
       |  SELECT
       |    ${surrogateKeyTs("tpep_pickup_datetime", "pulocationid", "dolocationid")} AS trip_id,
       |    CAST(vendorid AS BIGINT) AS vendor_id,
       |    CAST(pulocationid AS BIGINT) AS pickup_location_id,
       |    CAST(dolocationid AS BIGINT) AS dropoff_location_id,
       |    tpep_pickup_datetime AS pickup_datetime,
       |    tpep_dropoff_datetime AS dropoff_datetime,
       |    passenger_count,
       |    CAST(trip_distance AS DOUBLE) AS trip_distance_miles,
       |    CAST(fare_amount AS DOUBLE) AS fare_amount,
       |    CAST(total_amount AS DOUBLE) AS total_amount,
       |    year, month,
       |    'yellow' AS taxi_type
       |  FROM raw_yellow
       |  WHERE tpep_pickup_datetime IS NOT NULL AND tpep_dropoff_datetime IS NOT NULL
       |    AND tpep_pickup_datetime < tpep_dropoff_datetime
       |    AND trip_distance >= 0 AND total_amount >= 0
       |),
       |stg_green AS (
       |  SELECT
       |    ${surrogateKeyTs("lpep_pickup_datetime", "pulocationid", "dolocationid")} AS trip_id,
       |    CAST(vendorid AS BIGINT) AS vendor_id,
       |    CAST(pulocationid AS BIGINT) AS pickup_location_id,
       |    CAST(dolocationid AS BIGINT) AS dropoff_location_id,
       |    lpep_pickup_datetime AS pickup_datetime,
       |    lpep_dropoff_datetime AS dropoff_datetime,
       |    passenger_count,
       |    CAST(trip_distance AS DOUBLE) AS trip_distance_miles,
       |    CAST(fare_amount AS DOUBLE) AS fare_amount,
       |    CAST(total_amount AS DOUBLE) AS total_amount,
       |    year, month,
       |    'green' AS taxi_type
       |  FROM raw_green
       |  WHERE lpep_pickup_datetime IS NOT NULL AND lpep_dropoff_datetime IS NOT NULL
       |    AND lpep_pickup_datetime < lpep_dropoff_datetime
       |    AND trip_distance >= 0 AND total_amount >= 0
       |),
       |stg_fhv AS (
       |  SELECT
       |    ${surrogateKeyTs("pickup_datetime", "pulocationid", "dolocationid")} AS trip_id,
       |    CAST(pulocationid AS BIGINT) AS pickup_location_id,
       |    CAST(dolocationid AS BIGINT) AS dropoff_location_id,
       |    pickup_datetime, dropoff_datetime,
       |    CAST(dispatching_base_num AS VARCHAR) AS dispatching_base_number,
       |    year, month,
       |    'fhv' AS taxi_type
       |  FROM raw_fhv
       |  WHERE pickup_datetime IS NOT NULL AND dropoff_datetime IS NOT NULL
       |    AND pickup_datetime < dropoff_datetime
       |),
       |stg_fhvhv AS (
       |  SELECT
       |    ${surrogateKeyTs("pickup_datetime", "pulocationid", "dolocationid")} AS trip_id,
       |    CAST(pulocationid AS BIGINT) AS pickup_location_id,
       |    CAST(dolocationid AS BIGINT) AS dropoff_location_id,
       |    pickup_datetime, dropoff_datetime,
       |    CAST(trip_miles AS DOUBLE) AS trip_distance_miles,
       |    CAST(base_passenger_fare AS DOUBLE) AS base_passenger_fare,
       |    CAST(hvfhs_license_num AS VARCHAR) AS hvfhs_license_number,
       |    CAST(dispatching_base_num AS VARCHAR) AS dispatching_base_number,
       |    year, month,
       |    'fhvhv' AS taxi_type
       |  FROM raw_fhvhv
       |  WHERE pickup_datetime IS NOT NULL AND dropoff_datetime IS NOT NULL
       |    AND pickup_datetime < dropoff_datetime
       |    AND trip_miles >= 0
       |)""".stripMargin

  /** Intermediate + marts CTEs — mirror of [[graft.model.Intermediate]] and
    * [[graft.model.Marts]] (`int_trips_*.sql`, `fct_trips*.sql`). */
  private val modelCtes: String = {
    val secs = "(epoch_us(dropoff_datetime) - epoch_us(pickup_datetime)) // 1000000"
    s"""unified AS (
       |  SELECT trip_id, 'yellow' AS taxi_type, vendor_id,
       |         pickup_location_id, dropoff_location_id,
       |         pickup_datetime, dropoff_datetime,
       |         passenger_count, trip_distance_miles, fare_amount, total_amount,
       |         CAST(NULL AS DOUBLE) AS base_passenger_fare,
       |         CAST(NULL AS VARCHAR) AS hvfhs_license_number,
       |         CAST(NULL AS VARCHAR) AS dispatching_base_number,
       |         year, month
       |  FROM stg_yellow
       |  UNION ALL
       |  SELECT trip_id, 'green', vendor_id, pickup_location_id, dropoff_location_id,
       |         pickup_datetime, dropoff_datetime,
       |         passenger_count, trip_distance_miles, fare_amount, total_amount,
       |         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       |         year, month
       |  FROM stg_green
       |  UNION ALL
       |  SELECT trip_id, 'fhv', CAST(NULL AS BIGINT), pickup_location_id, dropoff_location_id,
       |         pickup_datetime, dropoff_datetime,
       |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       |         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), dispatching_base_number,
       |         year, month
       |  FROM stg_fhv
       |  UNION ALL
       |  SELECT trip_id, 'fhvhv', CAST(NULL AS BIGINT), pickup_location_id, dropoff_location_id,
       |         pickup_datetime, dropoff_datetime,
       |         CAST(NULL AS DOUBLE), trip_distance_miles, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       |         base_passenger_fare, hvfhs_license_number, dispatching_base_number,
       |         year, month
       |  FROM stg_fhvhv
       |),
       |enriched_base AS (
       |  SELECT *,
       |    $secs AS trip_duration_seconds,
       |    ($secs) // 60 AS trip_duration_minutes
       |  FROM unified
       |),
       |enriched AS (
       |  SELECT *,
       |    ${rnd("trip_duration_seconds / 3600.0", 2)} AS trip_duration_hours,
       |    CASE WHEN trip_duration_seconds > 0 AND trip_distance_miles > 0
       |         THEN ${rnd("trip_distance_miles / (trip_duration_seconds / 3600.0)", 2)}
       |         ELSE NULL END AS avg_speed_mph,
       |    CASE WHEN trip_distance_miles > 0 AND total_amount IS NOT NULL
       |         THEN ${rnd("total_amount / trip_distance_miles", 2)}
       |         ELSE NULL END AS cost_per_mile,
       |    CASE WHEN trip_duration_minutes > 0 AND total_amount IS NOT NULL
       |         THEN ${rnd("total_amount / trip_duration_minutes", 2)}
       |         ELSE NULL END AS cost_per_minute,
       |    CAST(hour(pickup_datetime) AS INTEGER) AS pickup_hour,
       |    CAST(isodow(pickup_datetime) AS INTEGER) AS pickup_day_of_week,
       |    CASE CAST(isodow(pickup_datetime) AS INTEGER)
       |      WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday'
       |      WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday' WHEN 6 THEN 'Saturday'
       |      WHEN 7 THEN 'Sunday' END AS pickup_day_name,
       |    CASE WHEN hour(pickup_datetime) BETWEEN 6 AND 11 THEN 'Morning'
       |         WHEN hour(pickup_datetime) BETWEEN 12 AND 17 THEN 'Afternoon'
       |         WHEN hour(pickup_datetime) BETWEEN 18 AND 22 THEN 'Evening'
       |         ELSE 'Night' END AS time_of_day,
       |    COALESCE(trip_duration_minutes BETWEEN 1 AND 180, FALSE) AS is_valid_duration,
       |    COALESCE(trip_distance_miles BETWEEN 0.1 AND 100.0, FALSE) AS is_valid_distance,
       |    COALESCE(total_amount BETWEEN 0.0 AND 500.0 OR total_amount IS NULL, FALSE) AS is_valid_fare,
       |    COALESCE(trip_duration_minutes BETWEEN 1 AND 180
       |             AND (trip_distance_miles BETWEEN 0.1 AND 100.0 OR trip_distance_miles IS NULL)
       |             AND (total_amount BETWEEN 0.0 AND 500.0 OR total_amount IS NULL)
       |             AND pickup_location_id IS NOT NULL AND dropoff_location_id IS NOT NULL,
       |             FALSE) AS is_high_quality_trip
       |  FROM enriched_base
       |),
       |cleaned AS (
       |  SELECT * FROM enriched
       |  WHERE (is_high_quality_trip = TRUE AND avg_speed_mph < 80) OR avg_speed_mph IS NULL
       |),
       |fct_trips AS (
       |  SELECT trip_id, taxi_type, pickup_location_id, dropoff_location_id,
       |         pickup_datetime, dropoff_datetime, year, month,
       |         pickup_hour, pickup_day_of_week, pickup_day_name, time_of_day,
       |         trip_distance_miles, trip_duration_minutes, trip_duration_hours,
       |         avg_speed_mph, fare_amount, total_amount, cost_per_mile, cost_per_minute,
       |         base_passenger_fare, passenger_count, vendor_id, hvfhs_license_number,
       |         dispatching_base_number, is_valid_duration, is_valid_distance,
       |         is_valid_fare, is_high_quality_trip
       |  FROM cleaned
       |),
       |fct_trips_daily AS (
       |  SELECT CAST(pickup_datetime AS DATE) AS trip_date, taxi_type, year, month,
       |    count(*) AS total_trips,
       |    count(DISTINCT pickup_location_id) AS unique_pickup_locations,
       |    count(DISTINCT dropoff_location_id) AS unique_dropoff_locations,
       |    ${rndSum("trip_distance_miles", 2)} AS total_distance_miles,
       |    ${rnd(stableAvg("trip_distance_miles"), 2)} AS avg_distance_miles,
       |    ${rnd("min(trip_distance_miles)", 2)} AS min_distance_miles,
       |    ${rnd("max(trip_distance_miles)", 2)} AS max_distance_miles,
       |    CAST(sum(trip_duration_minutes) AS BIGINT) AS total_duration_minutes,
       |    ${rnd("avg(trip_duration_minutes)", 2)} AS avg_duration_minutes,
       |    min(trip_duration_minutes) AS min_duration_minutes,
       |    max(trip_duration_minutes) AS max_duration_minutes,
       |    ${rnd(stableAvg("avg_speed_mph"), 2)} AS avg_speed_mph,
       |    ${rndSum("total_amount", 2)} AS total_revenue,
       |    ${rnd(stableAvg("total_amount"), 2)} AS avg_fare,
       |    ${rnd(stableAvg("cost_per_mile"), 2)} AS avg_cost_per_mile,
       |    ${rnd("avg(passenger_count)", 2)} AS avg_passengers,
       |    ${rnd("sum(passenger_count)", 0)} AS total_passengers,
       |    CAST(sum(CASE WHEN time_of_day = 'Morning' THEN 1 ELSE 0 END) AS BIGINT) AS trips_morning,
       |    CAST(sum(CASE WHEN time_of_day = 'Afternoon' THEN 1 ELSE 0 END) AS BIGINT) AS trips_afternoon,
       |    CAST(sum(CASE WHEN time_of_day = 'Evening' THEN 1 ELSE 0 END) AS BIGINT) AS trips_evening,
       |    CAST(sum(CASE WHEN time_of_day = 'Night' THEN 1 ELSE 0 END) AS BIGINT) AS trips_night
       |  FROM fct_trips
       |  GROUP BY 1, 2, 3, 4
       |),
       |fct_trips_monthly AS (
       |  SELECT year, month, taxi_type,
       |    make_date(year, month, 1) AS month_start_date,
       |    count(*) AS total_trips,
       |    count(DISTINCT pickup_location_id) AS unique_pickup_locations,
       |    count(DISTINCT dropoff_location_id) AS unique_dropoff_locations,
       |    count(DISTINCT CAST(pickup_datetime AS DATE)) AS days_with_trips,
       |    ${rndSum("trip_distance_miles", 2)} AS total_distance_miles,
       |    ${rnd(stableAvg("trip_distance_miles"), 2)} AS avg_distance_miles,
       |    ${rnd("CAST(sum(trip_duration_minutes) AS BIGINT) / 60.0", 2)} AS total_duration_hours,
       |    ${rnd("avg(trip_duration_minutes)", 2)} AS avg_duration_minutes,
       |    ${rnd(stableAvg("avg_speed_mph"), 2)} AS avg_speed_mph,
       |    ${rndSum("total_amount", 2)} AS total_revenue,
       |    ${rnd(stableAvg("total_amount"), 2)} AS avg_fare,
       |    ${rnd(s"CAST(${decSum("total_amount")} AS DOUBLE) / nullif(count(*), 0)", 2)} AS revenue_per_trip,
       |    ${rnd("sum(passenger_count)", 0)} AS total_passengers,
       |    ${rnd("avg(passenger_count)", 2)} AS avg_passengers,
       |    ${rnd("avg(CASE WHEN time_of_day = 'Morning' THEN 1.0 ELSE 0.0 END) * 100", 1)} AS pct_morning,
       |    ${rnd("avg(CASE WHEN time_of_day = 'Afternoon' THEN 1.0 ELSE 0.0 END) * 100", 1)} AS pct_afternoon,
       |    ${rnd("avg(CASE WHEN time_of_day = 'Evening' THEN 1.0 ELSE 0.0 END) * 100", 1)} AS pct_evening,
       |    ${rnd("avg(CASE WHEN time_of_day = 'Night' THEN 1.0 ELSE 0.0 END) * 100", 1)} AS pct_night,
       |    ${rnd("avg(CASE WHEN pickup_day_of_week IN (6, 7) THEN 1.0 ELSE 0.0 END) * 100", 1)} AS pct_weekend
       |  FROM fct_trips
       |  GROUP BY 1, 2, 3
       |)""".stripMargin
  }

  /** The full shared CTE chain; unreferenced CTEs cost DuckDB nothing. */
  val chain: String = s"WITH\n$rawCtes,\n$stgCtes,\n$modelCtes\n"

  /** A standalone oracle query selecting from one CTE of the chain. */
  def select(sql: String): String = chain + sql
}
