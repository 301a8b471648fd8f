package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable Column expressions reproducing the reference's declared scalar
  * semantics (SURVEY.md §2.8–§2.9). Every helper is a pure
  * `Column => Column` composition of built-in (codegen'd) functions — no
  * UDFs — so each stays inside whole-stage codegen and pushes down where
  * Catalyst allows.
  */
object Functions {

  /** dbt_utils.generate_surrogate_key: md5 over '-'-joined coalesced string
    * casts (reference `dbt/models/staging/stg_nyc_taxi__yellow_trips.sql:22-26`
    * via the dbt-utils macro). Null components become the macro's sentinel.
    *
    * Timestamp components must be rendered via one canonical formatter
    * before calling (see `timestampKeyRepr`) so hashes are deterministic
    * across engines.
    */
  val NullSentinel = "_dbt_utils_surrogate_key_null_"

  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))

  /** Canonical timestamp rendering for key hashing: microsecond
    * precision, `yyyy-MM-dd HH:mm:ss.SSSSSS` — matches Trino's
    * `cast(timestamp(6) as varchar)` inside the dbt_utils macro (the
    * reference's `trip_id` rendering) and DuckDB's
    * `strftime(ts, '%Y-%m-%d %H:%M:%S.%f')`. */
  def timestampKeyRepr(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** ISO day-of-week 1=Mon..7=Sun (Trino `day_of_week`,
    * `int_trips_enriched.sql:50`). Spark's `dayofweek` is 1=Sun..7=Sat —
    * the reference semantics need `weekday()+1`. */
  def isoDayOfWeek(ts: Column): Column = weekday(ts) + 1

  /** Day name from ISO dow via simple CASE (`int_trips_enriched.sql:51-59`). */
  def dayName(ts: Column): Column = {
    val names = Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")
    names.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (n, i)) =>
      when(isoDayOfWeek(ts) === (i + 1), lit(n)).otherwise(acc)
    }
  }

  /** Time-of-day buckets (`int_trips_enriched.sql:61-66`): hour 6–11
    * Morning, 12–17 Afternoon, 18–22 Evening, else Night. */
  def timeOfDay(ts: Column): Column = {
    val h = hour(ts)
    when(h.between(6, 11), "Morning")
      .when(h.between(12, 17), "Afternoon")
      .when(h.between(18, 22), "Evening")
      .otherwise("Night")
  }

  /** Trino `date_diff('second', t1, t2)` — truncating integer diff
    * (`int_trips_enriched.sql:19`). Full seconds elapsed. The casts make
    * this accept both TIMESTAMP and TIMESTAMP_NTZ (the engine's canonical
    * zone-less type; the session is pinned UTC so the cast is an
    * identity on the underlying micros). */
  def secondsBetween(t1: Column, t2: Column): Column =
    (unix_micros(t2.cast("timestamp")) - unix_micros(t1.cast("timestamp")))
      .cast("double").divide(1000000d).cast("long")

  /** Trino `date_diff('minute', t1, t2)`: full minutes elapsed
    * (truncation, not boundary count — `int_trips_enriched.sql:20`). */
  def minutesBetween(t1: Column, t2: Column): Column =
    floor(secondsBetween(t1, t2) / 60).cast("long")

  /** `round(seconds/3600.0, 2)` hours (`int_trips_enriched.sql:21`). */
  def hoursBetween(t1: Column, t2: Column): Column =
    round(secondsBetween(t1, t2) / 3600.0, 2)

  /** avg_speed_mph (`int_trips_enriched.sql:24-32`): miles over fractional
    * hours, guarded; NULL when duration or distance is non-positive. */
  def avgSpeedMph(miles: Column, seconds: Column): Column =
    when(seconds > 0 && miles > 0, round(miles / (seconds / lit(3600.0)), 2))
      .otherwise(lit(null).cast("double"))

  /** cost_per_mile (`int_trips_enriched.sql:35-39`). */
  def costPerMile(total: Column, miles: Column): Column =
    when(miles > 0 && total.isNotNull, round(total / miles, 2))
      .otherwise(lit(null).cast("double"))

  /** cost_per_minute (`int_trips_enriched.sql:42-46`). */
  def costPerMinute(total: Column, minutes: Column): Column =
    when(minutes > 0 && total.isNotNull, round(total / minutes, 2))
      .otherwise(lit(null).cast("double"))

  /** Quality flags (`int_trips_enriched.sql:69-93`). All are CASE-shaped in
    * the reference (`WHEN cond THEN true ELSE false`), so a null condition
    * yields false — hence the coalesce wrappers. Note the declared
    * asymmetry: null distance FAILS is_valid_distance but PASSES
    * is_high_quality_trip's distance clause; null fare passes both. */
  def isValidDuration(minutes: Column): Column =
    coalesce(minutes.between(1, 180), lit(false))

  def isValidDistance(miles: Column): Column =
    coalesce(miles.between(0.1, 100.0), lit(false))

  def isValidFare(total: Column): Column =
    coalesce(total.between(0.0, 500.0) || total.isNull, lit(false))

  def isHighQualityTrip(minutes: Column, miles: Column, total: Column,
                        puLoc: Column, doLoc: Column): Column =
    coalesce(
      minutes.between(1, 180) &&
        (miles.between(0.1, 100.0) || miles.isNull) &&
        (total.between(0.0, 500.0) || total.isNull) &&
        puLoc.isNotNull && doLoc.isNotNull,
      lit(false))

  /** `month_start_date` (`fct_trips_monthly.sql:19`): first day of the
    * (year, month) pair — `make_date` is the clean Spark form of the
    * reference's lpad/concat/cast chain. */
  def monthStartDate(year: Column, month: Column): Column =
    make_date(year, month, lit(1))

  /** Safe division with NULLIF-zero denominator (`fct_trips_monthly.sql:36`). */
  def safeDiv(num: Column, den: Column): Column =
    num / nullif(den, lit(0))

  /** Order-independent sum of a double column.
    *
    * A plain `sum(double)` depends on partition/merge order, so the same
    * query can produce last-ULP-different results run to run (and engine
    * to engine) — at 100 TB with thousands of partial aggregates that
    * nondeterminism is guaranteed. Accumulating the values' decimal
    * representations in `DECIMAL(38,10)` is exact, associative, and
    * commutative, so every plan shape yields bitwise-identical results.
    * Returns DECIMAL; pair with `round(_, n).cast("double")` (see
    * [[stableRoundedSum]]) to keep the reference's double-typed outputs. */
  def stableSum(c: Column): Column = sum(c.cast("decimal(38,10)"))

  /** `round(sum(x), n)` with order-independent accumulation. */
  def stableRoundedSum(c: Column, scale: Int): Column =
    round(stableSum(c), scale).cast("double")

  /** `avg(x)` with order-independent accumulation: exact decimal sum,
    * one double division at the end. */
  def stableAvg(c: Column): Column = stableSum(c).cast("double") / count(c)

  /** Sample standard deviation with order-independent accumulation:
    * `sqrt((Σx² − (Σx)²/n) / (n−1))` over exact decimal sums (the
    * square is taken per row in double — deterministic — and summed in
    * decimal). Built-in `stddev_samp` accumulates with Welford updates
    * whose result depends on partition order, so two runs (or two
    * engines) disagree in the last ulps; this formulation is
    * reproducible bit-for-bit. Null for n ≤ 1.
    *
    * The variance numerator is clamped at 0: for a constant-valued
    * group the double-precision `s·s/n` can land one ulp above `sq`,
    * and sqrt of that tiny negative would poison the group with NaN. */
  def stableStddev(c: Column): Column = {
    val n = count(c)
    val s = stableSum(c).cast("double")
    val sq = sum((c * c).cast("decimal(38,10)")).cast("double")
    when(n > 1, sqrt(greatest(sq - s * s / n, lit(0.0)) / (n - lit(1))))
  }

  /** Pearson correlation with order-independent accumulation — the
    * same decimal-sum treatment as [[stableStddev]] applied to all five
    * moments: `(n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))`.
    * Built-in `corr` uses streaming co-moment updates whose result
    * depends on partition order. Null when either variance is 0
    * (constant column — correlation undefined) or n ≤ 1. Rows where
    * EITHER side is null are excluded (pairwise-complete, matching the
    * SQL `corr` contract). */
  def stableCorr(x: Column, y: Column): Column = {
    val ok = x.isNotNull && y.isNotNull
    val n = count(when(ok, lit(1)))
    def dsum(c: Column) = sum(when(ok, c).cast("decimal(38,10)")).cast("double")
    val (sx, sy) = (dsum(x), dsum(y))
    val (sxx, syy, sxy) = (dsum(x * x), dsum(y * y), dsum(x * y))
    val vx = greatest(n * sxx - sx * sx, lit(0.0))
    val vy = greatest(n * syy - sy * sy, lit(0.0))
    when(n > 1 && vx > 0 && vy > 0, (n * sxy - sx * sy) / (sqrt(vx) * sqrt(vy)))
  }

  /** OLS slope of `y` on `x` with the same order-independent decimal
    * moment accumulation (and the same pairwise-complete / degenerate-
    * group NULL guards) as [[stableCorr]]:
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`. */
  def stableSlope(x: Column, y: Column): Column = {
    val ok = x.isNotNull && y.isNotNull
    val n = count(when(ok, lit(1)))
    def dsum(c: Column) = sum(when(ok, c).cast("decimal(38,10)")).cast("double")
    val (sx, sy, sxx, sxy) = (dsum(x), dsum(y), dsum(x * x), dsum(x * y))
    val vx = greatest(n * sxx - sx * sx, lit(0.0))
    when(n > 1 && vx > 0, (n * sxy - sx * sy) / vx)
  }

  /** OLS intercept companion of [[stableSlope]]:
    * `(Σy − slope·Σx) / n` — null exactly when the slope is. */
  def stableIntercept(x: Column, y: Column): Column = {
    val ok = x.isNotNull && y.isNotNull
    val n = count(when(ok, lit(1)))
    def dsum(c: Column) = sum(when(ok, c).cast("decimal(38,10)")).cast("double")
    val (sx, sy) = (dsum(x), dsum(y))
    (sy - stableSlope(x, y) * sx) / n
  }
}
