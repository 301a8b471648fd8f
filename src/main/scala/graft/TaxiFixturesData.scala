package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.schema.TaxiSchemas

/** Deterministic raw-feed fixtures covering the edge cases the models
  * branch on (FIXTURES.md §A): null timestamps, pickup >= dropoff,
  * negative distance/amount, zero duration/distance, quality-flag
  * boundaries (0/1/180/181 min; 0.05/0.1/100/101 mi; -1/0/500/501 $),
  * time-of-day bucket edges (hours 5/6/11/12/17/18/22/23), all seven
  * weekdays, duplicate surrogate-key triples, and rows in two (year,
  * month) partitions.
  */
object TaxiFixturesData {

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val loaded = ts("2024-03-01 00:00:00")

  /** yellow rows: (vendorid, pickup, dropoff, pu, do, pax, dist, fare, total, y, m).
    * 2024-01-01 is a Monday. */
  val yellowRows: Seq[Row] = Seq(
    // clean 30-min 5-mile trip, Monday 07:00 (Morning)
    Row(1L, ts("2024-01-01 07:00:00"), ts("2024-01-01 07:30:00"), 10L, 20L, 2.0, 5.0, 20.0, 25.0, 2024, 1, loaded),
    // hour-bucket edges: 05 Night / 06 Morning / 11 Morning / 12 Afternoon
    Row(1L, ts("2024-01-02 05:30:00"), ts("2024-01-02 05:50:00"), 11L, 21L, 1.0, 3.0, 10.0, 12.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-03 06:00:00"), ts("2024-01-03 06:20:00"), 11L, 21L, 1.0, 3.0, 10.0, 12.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-04 11:59:00"), ts("2024-01-04 12:19:00"), 11L, 21L, 1.0, 3.0, 10.0, 12.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-05 12:00:00"), ts("2024-01-05 12:20:00"), 11L, 21L, 1.0, 3.0, 10.0, 12.0, 2024, 1, loaded),
    // 17 Afternoon / 18 Evening / 22 Evening / 23 Night, covering Sat+Sun
    Row(2L, ts("2024-01-06 17:30:00"), ts("2024-01-06 17:50:00"), 12L, 22L, 1.0, 2.0, 8.0, 10.0, 2024, 1, loaded),
    Row(2L, ts("2024-01-07 18:00:00"), ts("2024-01-07 18:20:00"), 12L, 22L, 1.0, 2.0, 8.0, 10.0, 2024, 1, loaded),
    Row(2L, ts("2024-01-06 22:59:00"), ts("2024-01-06 23:19:00"), 12L, 22L, 1.0, 2.0, 8.0, 10.0, 2024, 1, loaded),
    Row(2L, ts("2024-01-07 23:00:00"), ts("2024-01-07 23:20:00"), 12L, 22L, 1.0, 2.0, 8.0, 10.0, 2024, 1, loaded),
    // duration boundaries: 59s (invalid), 60s (valid=1min), 180min, 181min
    Row(1L, ts("2024-01-08 10:00:00"), ts("2024-01-08 10:00:59"), 13L, 23L, 1.0, 0.5, 4.0, 5.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-09 10:00:00"), ts("2024-01-09 10:01:00"), 13L, 23L, 1.0, 0.5, 4.0, 5.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-10 10:00:00"), ts("2024-01-10 13:00:00"), 13L, 23L, 1.0, 30.0, 80.0, 95.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-11 10:00:00"), ts("2024-01-11 13:01:00"), 13L, 23L, 1.0, 30.0, 80.0, 95.0, 2024, 1, loaded),
    // distance boundaries: 0.05 (invalid), 0.1, 100 (valid), 101 (invalid)
    Row(1L, ts("2024-01-12 09:00:00"), ts("2024-01-12 09:30:00"), 14L, 24L, 1.0, 0.05, 4.0, 5.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-13 09:00:00"), ts("2024-01-13 09:30:00"), 14L, 24L, 1.0, 0.1, 4.0, 5.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-14 09:00:00"), ts("2024-01-14 12:00:00"), 14L, 24L, 1.0, 100.0, 200.0, 250.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-15 09:00:00"), ts("2024-01-15 12:00:00"), 14L, 24L, 1.0, 101.0, 200.0, 250.0, 2024, 1, loaded),
    // fare boundaries: total 0 (valid), 500 (valid), 501 (invalid)
    Row(1L, ts("2024-01-16 09:00:00"), ts("2024-01-16 09:30:00"), 15L, 25L, 1.0, 2.0, 0.0, 0.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-17 09:00:00"), ts("2024-01-17 11:00:00"), 15L, 25L, 1.0, 40.0, 400.0, 500.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-18 09:00:00"), ts("2024-01-18 11:00:00"), 15L, 25L, 1.0, 40.0, 400.0, 501.0, 2024, 1, loaded),
    // speed > 80mph (cleaned drops): 90 miles in 1h
    Row(1L, ts("2024-01-19 09:00:00"), ts("2024-01-19 10:00:00"), 16L, 26L, 1.0, 90.0, 150.0, 180.0, 2024, 1, loaded),
    // zero-distance trip → null speed → passes cleaned regardless of quality
    Row(1L, ts("2024-01-20 09:00:00"), ts("2024-01-20 09:20:00"), 16L, 26L, 1.0, 0.0, 5.0, 6.0, 2024, 1, loaded),
    // duplicate surrogate-key triple (same pickup/pu/do as first row)
    Row(2L, ts("2024-01-01 07:00:00"), ts("2024-01-01 07:45:00"), 10L, 20L, 3.0, 6.0, 22.0, 28.0, 2024, 1, loaded),
    // second partition (2024-02)
    Row(1L, ts("2024-02-01 08:00:00"), ts("2024-02-01 08:30:00"), 17L, 27L, 1.0, 4.0, 15.0, 18.0, 2024, 2, loaded),
    // rows the validity filter must drop:
    Row(1L, null, ts("2024-01-21 09:10:00"), 18L, 28L, 1.0, 2.0, 8.0, 9.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-21 09:00:00"), null, 18L, 28L, 1.0, 2.0, 8.0, 9.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-21 09:00:00"), ts("2024-01-21 09:00:00"), 18L, 28L, 1.0, 2.0, 8.0, 9.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-21 10:00:00"), ts("2024-01-21 09:00:00"), 18L, 28L, 1.0, 2.0, 8.0, 9.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-21 11:00:00"), ts("2024-01-21 11:30:00"), 18L, 28L, 1.0, -1.0, 8.0, 9.0, 2024, 1, loaded),
    Row(1L, ts("2024-01-21 12:00:00"), ts("2024-01-21 12:30:00"), 18L, 28L, 1.0, 2.0, 8.0, -9.0, 2024, 1, loaded)
  )

  val greenRows: Seq[Row] = Seq(
    Row(2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:24:00"), 30L, 40L, 1.0, 4.0, 14.0, 17.0, 2024, 1, loaded),
    Row(2L, ts("2024-01-02 19:00:00"), ts("2024-01-02 19:40:00"), 31L, 41L, 2.0, 7.0, 24.0, 29.0, 2024, 1, loaded),
    Row(2L, ts("2024-02-03 03:00:00"), ts("2024-02-03 03:15:00"), 32L, 42L, 1.0, 2.5, 9.0, 11.0, 2024, 2, loaded),
    Row(2L, ts("2024-01-04 10:00:00"), ts("2024-01-04 09:00:00"), 33L, 43L, 1.0, 2.0, 8.0, 9.0, 2024, 1, loaded) // dropped
  )

  /** fhv rows: (pickup, dropoff, pu, do, base, y, m) — no distance/fare ⇒
    * null speed ⇒ always passes cleaned; null distance fails
    * is_valid_distance but not is_high_quality_trip. */
  val fhvRows: Seq[Row] = Seq(
    Row(ts("2024-01-01 08:00:00"), ts("2024-01-01 08:25:00"), 50L, 60L, "B00001", 2024, 1, loaded),
    Row(ts("2024-01-02 14:00:00"), ts("2024-01-02 14:02:00"), 51L, 61L, "B00002", 2024, 1, loaded),
    Row(ts("2024-01-03 21:00:00"), null, 52L, 62L, "B00003", 2024, 1, loaded) // dropped
  )

  val fhvhvRows: Seq[Row] = Seq(
    Row("HV0003", "B02764", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00"), 70L, 80L, 5.5, 21.0, 2024, 1, loaded),
    Row("HV0005", "B02510", ts("2024-01-02 16:00:00"), ts("2024-01-02 16:45:00"), 71L, 81L, 8.2, 32.5, 2024, 1, loaded),
    Row("HV0003", "B02764", ts("2024-01-03 12:00:00"), ts("2024-01-03 12:20:00"), 72L, 82L, -2.0, 15.0, 2024, 1, loaded) // dropped
  )

  def rawYellow(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(yellowRows, 4), TaxiSchemas.rawYellow)

  def rawGreen(spark: SparkSession): DataFrame = {
    val rows = greenRows
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), TaxiSchemas.rawGreen)
  }

  def rawFhv(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(fhvRows, 2), TaxiSchemas.rawFhv)

  def rawFhvhv(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(fhvhvRows, 2), TaxiSchemas.rawFhvhv)
}
