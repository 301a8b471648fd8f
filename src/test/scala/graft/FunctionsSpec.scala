package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Functions._

/** Pins the semantic-trap functions (SURVEY §7.5): ISO dow, truncating
  * date_diff, HALF_UP round, surrogate-key determinism, bucket edges,
  * quality-flag truth tables. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("isoDayOfWeek: 1=Monday .. 7=Sunday across a full week") {
    // 2024-01-01 is a Monday
    val df = (1 to 7).map(d => ts(f"2024-01-0$d%01d 12:00:00")).toDF("t")
    val got = df.select(isoDayOfWeek($"t")).as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3, 4, 5, 6, 7))
  }

  test("dayName matches ISO numbering") {
    val df = Seq(ts("2024-01-06 00:00:00"), ts("2024-01-07 00:00:00")).toDF("t")
    assert(df.select(dayName($"t")).as[String].collect().toSeq ==
      Seq("Saturday", "Sunday"))
  }

  test("timeOfDay bucket edges at hours 5/6/11/12/17/18/22/23") {
    val df = Seq(5, 6, 11, 12, 17, 18, 22, 23)
      .map(h => ts(f"2024-01-01 $h%02d:00:00")).toDF("t")
    assert(df.select(timeOfDay($"t")).as[String].collect().toSeq ==
      Seq("Night", "Morning", "Morning", "Afternoon", "Afternoon",
        "Evening", "Evening", "Night"))
  }

  test("secondsBetween/minutesBetween truncate (Trino date_diff semantics)") {
    val df = Seq((ts("2024-01-01 10:00:59"), ts("2024-01-01 10:01:01"))).toDF("a", "b")
    val r = df.select(
      secondsBetween($"a", $"b").as("s"),
      minutesBetween($"a", $"b").as("m")).head()
    assert(r.getLong(0) == 2L)  // 2 full seconds
    assert(r.getLong(1) == 0L)  // 0 full minutes, not 1 boundary crossing
  }

  test("surrogateKey is deterministic and null-sentinel'd") {
    val df = Seq((Some(1L), "x"), (None, "x")).toDF("k", "s")
    val keys = df.select(surrogateKey($"k", $"s")).as[String].collect()
    assert(keys(0) == keys.head && keys(0).length == 32)
    // null component uses the dbt_utils sentinel, not empty string
    val manual = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${NullSentinel}-x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(keys(1) == manual)
  }

  test("avgSpeedMph guards zero duration/distance with NULL") {
    val df = Seq(
      (5.0, 1800L),  // 10 mph
      (0.0, 1800L),  // null
      (5.0, 0L)      // null
    ).toDF("miles", "secs")
    val got = df.select(avgSpeedMph($"miles", $"secs")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(10.0), None, None))
  }

  test("quality flags: boundary truth table") {
    // (minutes, miles, total, pu, do) → (validDur, validDist, validFare, hq)
    val rows = Seq(
      (0L, 5.0, 20.0, Some(1L), Some(2L), false, true, true, false),
      (1L, 5.0, 20.0, Some(1L), Some(2L), true, true, true, true),
      (180L, 5.0, 20.0, Some(1L), Some(2L), true, true, true, true),
      (181L, 5.0, 20.0, Some(1L), Some(2L), false, true, true, false),
      (30L, 0.05, 20.0, Some(1L), Some(2L), true, false, true, false),
      (30L, 0.1, 20.0, Some(1L), Some(2L), true, true, true, true),
      (30L, 100.0, 20.0, Some(1L), Some(2L), true, true, true, true),
      (30L, 101.0, 20.0, Some(1L), Some(2L), true, false, true, false),
      (30L, 5.0, 500.0, Some(1L), Some(2L), true, true, true, true),
      (30L, 5.0, 501.0, Some(1L), Some(2L), true, true, false, false),
      (30L, 5.0, -1.0, Some(1L), Some(2L), true, true, false, false),
      (30L, 5.0, 20.0, None, Some(2L), true, true, true, false))
    val df = rows.map { case (m, mi, t, pu, d, _, _, _, _) => (m, mi, t, pu, d) }
      .toDF("minutes", "miles", "total", "pu", "do")
    val got = df.select(
      isValidDuration($"minutes"), isValidDistance($"miles"),
      isValidFare($"total"), isHighQualityTrip($"minutes", $"miles", $"total", $"pu", $"do"))
      .collect()
    rows.zip(got).foreach { case ((m, mi, t, _, _, ed, edi, ef, ehq), r) =>
      assert((r.getBoolean(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)) ==
        ((ed, edi, ef, ehq)), s"case minutes=$m miles=$mi total=$t")
    }
  }

  test("null distance fails is_valid_distance but can pass is_high_quality_trip") {
    val df = Seq((30L, Option.empty[Double], Some(20.0), Some(1L), Some(2L)))
      .toDF("minutes", "miles", "total", "pu", "do")
    val r = df.select(
      isValidDistance($"miles"),
      isHighQualityTrip($"minutes", $"miles", $"total", $"pu", $"do")).head()
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }

  test("null total passes is_valid_fare (fhv/fhvhv)") {
    val df = Seq(Tuple1(Option.empty[Double])).toDF("total")
    assert(df.select(isValidFare($"total")).head().getBoolean(0))
  }

  test("monthStartDate builds first-of-month") {
    val df = Seq((2024, 2)).toDF("y", "m")
    assert(df.select(monthStartDate($"y", $"m")).head().getDate(0).toString == "2024-02-01")
  }

  test("round is HALF_UP like Trino/DuckDB, not banker's") {
    val df = Seq(2.5, 3.5, 2.345).toDF("x")
    val got = df.select(round($"x", 0), round($"x", 2)).collect()
    assert(got(0).getDouble(0) == 3.0)
    assert(got(1).getDouble(0) == 4.0)
  }

  test("stableStddev matches the textbook sample stddev; null for n<=1") {
    import graft.expr.Functions.stableStddev
    // stddev_samp(2,4,4,4,5,5,7,9) = 2.138089935299395
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val got = df.agg(stableStddev($"x")).head().getDouble(0)
    assert(math.abs(got - 2.138089935299395) < 1e-12)
    // order-independent: reversed input gives the identical bits
    val rev = Seq(9.0, 7.0, 5.0, 5.0, 4.0, 4.0, 4.0, 2.0).toDF("x")
      .agg(stableStddev($"x")).head().getDouble(0)
    assert(got == rev)
    assert(Seq(1.0).toDF("x").agg(stableStddev($"x")).head().isNullAt(0))
    // constant group: s·s/n can exceed Σx² by an ulp in double — the
    // clamp must yield 0.0, never NaN
    val const = Seq.fill(1000)(0.07).toDF("x").agg(stableStddev($"x")).head().getDouble(0)
    assert(const == 0.0, s"constant column stddev must be 0, got $const")
  }

  test("stableCorr: perfect/anti correlation, constant-column null, order-independent") {
    import graft.expr.Functions.stableCorr
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    assert(math.abs(df.agg(stableCorr($"x", $"y")).head().getDouble(0) - 1.0) < 1e-12)
    val anti = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(math.abs(anti.agg(stableCorr($"x", $"y")).head().getDouble(0) + 1.0) < 1e-12)
    // constant y: correlation undefined → null (built-in corr gives NaN)
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(const.agg(stableCorr($"x", $"y")).head().isNullAt(0))
    // identical bits whatever the input order
    val a = Seq((1.0, 9.0), (2.0, 3.0), (5.0, 7.0), (8.0, 1.0)).toDF("x", "y")
      .agg(stableCorr($"x", $"y")).head().getDouble(0)
    val b = Seq((8.0, 1.0), (5.0, 7.0), (2.0, 3.0), (1.0, 9.0)).toDF("x", "y")
      .agg(stableCorr($"x", $"y")).head().getDouble(0)
    assert(a == b)
  }

  test("stableSlope/stableIntercept recover a known line, null on degenerate groups") {
    import graft.expr.Functions.{stableIntercept, stableSlope}
    // y = 3x + 2 exactly
    val df = Seq((0.0, 2.0), (1.0, 5.0), (2.0, 8.0), (3.0, 11.0)).toDF("x", "y")
    val r = df.agg(stableSlope($"x", $"y"), stableIntercept($"x", $"y")).head()
    assert(math.abs(r.getDouble(0) - 3.0) < 1e-12 && math.abs(r.getDouble(1) - 2.0) < 1e-12)
    // constant x: slope undefined → both null
    val const = Seq((4.0, 1.0), (4.0, 2.0)).toDF("x", "y")
    val c = const.agg(stableSlope($"x", $"y"), stableIntercept($"x", $"y")).head()
    assert(c.isNullAt(0) && c.isNullAt(1))
  }
}
