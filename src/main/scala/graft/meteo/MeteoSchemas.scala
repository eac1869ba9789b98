package graft.meteo

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Data model of the meteo ETL domain, re-expressed for Spark.
  *
  * Mirrors the reference's pydantic/SQLAlchemy models:
  *  - raw open-meteo payload:   etl/models.py:46-58 (`RawMeteo`/`MeteoPayload`)
  *  - weather observation row:  etl/models.py:31-43 (`WeatherRecord`),
  *                              etl/db.py:92-123 (`Observation`)
  *  - fetch job ledger:         etl/db.py:52-90 (`FetchMetadata`)
  *  - fetch event:              streaming/schemas/fetch_event.avsc
  */
object MeteoSchemas {

  /** The eight parallel hourly arrays of an open-meteo forecast payload. */
  val hourlySchema: StructType = StructType(Seq(
    StructField("time", ArrayType(StringType)),
    StructField("temperature_2m", ArrayType(DoubleType)),
    StructField("precipitation", ArrayType(DoubleType)),
    StructField("soil_temperature_18cm", ArrayType(DoubleType)),
    StructField("soil_moisture_9_to_27cm", ArrayType(DoubleType)),
    StructField("wind_speed_10m", ArrayType(DoubleType)),
    StructField("wind_direction_10m", ArrayType(DoubleType)),
    StructField("cloud_cover", ArrayType(DoubleType))))

  /** Top-level payload: location + hourly arrays (extra keys ignored,
    * matching pydantic's default tolerance). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("hourly", hourlySchema)))

  /** One observation row (the reference's `weather_observations` table;
    * uniqueness on (latitude, longitude, timestamp) enforced by
    * [[graft.ops.Upsert]], not a constraint). */
  case class Observation(
      latitude: Double,
      longitude: Double,
      timestamp: Timestamp,
      temperature: Option[Double],
      precipitation: Option[Double],
      soil_temperature: Option[Double],
      soil_moisture: Option[Double],
      wind_speed: Option[Double],
      wind_direction: Option[Double],
      cloud_cover: Option[Double])

  /** Fetch job states (etl/db.py:37-49). */
  object FetchStatus {
    val Pending = "pending"
    val Error = "error"
    val Success = "success"
    val finished: Set[String] = Set(Error, Success)
  }

  /** One state transition of a fetch job. The reference mutates a row in
    * place (INSERT then UPDATE); at lake scale we keep an append-only
    * transition log and resolve current state with a last-write-wins
    * window — same observable semantics, no random writes. */
  case class FetchTransition(
      fetch_id: String,
      seq: Long,
      at: Timestamp,
      request_url: String,
      request_params: Map[String, String],
      status: String,
      response_status: Option[Int],
      error_data: Option[String],
      payload_path: Option[String])

  /** Fetch event, field-for-field with fetch_event.avsc. */
  val fetchEventSchema: StructType = StructType(Seq(
    StructField("fetch_id", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("path", StringType, nullable = true),
    StructField("params", MapType(StringType, StringType), nullable = false),
    StructField("finished_at", LongType, nullable = false))) // timestamp-millis
}
