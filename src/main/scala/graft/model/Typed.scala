package graft.model

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, Dataset}

/** The unified trip record as a typed view (SURVEY §1.4). The engine's
  * semantics are declared over untyped DataFrames (the faithful mapping
  * of the reference's SQL), but a `Dataset[Trip]` facade gives compile-
  * time safety to library consumers writing their own logic over the
  * unified schema — field renames or type drift become compile errors at
  * the call site instead of runtime AnalysisExceptions. */
final case class Trip(
  trip_id: String,
  taxi_type: String,
  vendor_id: Option[Long],
  pickup_location_id: Option[Long],
  dropoff_location_id: Option[Long],
  pickup_datetime: LocalDateTime,
  dropoff_datetime: LocalDateTime,
  passenger_count: Option[Double],
  trip_distance_miles: Option[Double],
  fare_amount: Option[Double],
  total_amount: Option[Double],
  base_passenger_fare: Option[Double],
  hvfhs_license_number: Option[String],
  dispatching_base_number: Option[String],
  year: Int,
  month: Int,
  loaded_at: Timestamp)

object Typed {

  /** Typed view over [[Intermediate.unify]]'s output (zero-copy: the
    * encoder binds by column name over the same plan). */
  def trips(unified: DataFrame): Dataset[Trip] = {
    import unified.sparkSession.implicits._
    unified.as[Trip]
  }
}
