package graft.meteo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalizes raw open-meteo payloads into observation rows.
  *
  * The reference does this row-at-a-time in Python
  * (etl/models.py:66-88, `MeteoPayload.to_records`: zip eight parallel
  * hourly arrays into per-timestamp records, rounding lat/lon to one
  * decimal). Here the same transform is a single declarative plan —
  * `from_json` → `arrays_zip` → `explode` — that runs fully inside
  * whole-stage codegen and scales to any number of payloads with zero
  * driver involvement.
  */
object PayloadNormalizer {

  /** Hourly metric name in the payload → observation column name
    * (etl/models.py:75-84). */
  val metricMap: Seq[(String, String)] = Seq(
    "temperature_2m" -> "temperature",
    "precipitation" -> "precipitation",
    "soil_temperature_18cm" -> "soil_temperature",
    "soil_moisture_9_to_27cm" -> "soil_moisture",
    "wind_speed_10m" -> "wind_speed",
    "wind_direction_10m" -> "wind_direction",
    "cloud_cover" -> "cloud_cover")

  /** Parse a column of raw payload JSON into the typed payload struct. */
  def parse(payloadJson: Column): Column =
    from_json(payloadJson, MeteoSchemas.payloadSchema)

  /** `df` must carry a string column `payloadCol` (one raw payload per
    * row) and any passthrough columns (e.g. fetch_id). Returns one row per
    * (payload, hour) with the observation schema; passthrough columns are
    * preserved.
    *
    * Scale: explode is narrow (no shuffle); a 100 TB bronze directory
    * normalizes embarrassingly parallel, one task per input split.
    */
  def normalize(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val p = parse(col(payloadCol))
    val zipped = arrays_zip(
      col("_p.hourly.time") +: metricMap.map(m => col(s"_p.hourly.${m._1}")): _*)
    df.withColumn("_p", p)
      .withColumn("_h", explode(zipped))
      .select(
        df.columns.filter(_ != payloadCol).map(col) ++ Seq(
          round(col("_p.latitude"), 1).as("latitude"),
          round(col("_p.longitude"), 1).as("longitude"),
          to_timestamp(col("_h.time"), "yyyy-MM-dd'T'HH:mm").as("timestamp")) ++
          metricMap.map { case (raw, out) => col(s"_h.$raw").as(out) }: _*)
  }
}
