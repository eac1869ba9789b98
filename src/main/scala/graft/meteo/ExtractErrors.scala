package graft.meteo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The extract-stage error taxonomy (reference `etl/app.py:168-198`,
  * `_handle_etl_error`; exercised by `tests/etl/test_extract.py`).
  *
  * A fetch attempt fails one of four ways, each with a distinct
  * `(response_status, error_data)` ledger imprint:
  *   - HTTP error (ExtractError): the upstream status code is preserved
  *     and `error_data` carries the response body verbatim;
  *   - malformed payload (JSONDecodeError): transport succeeded (200)
  *     but the body does not parse — `error_data = {"error":"Invalid
  *     JSON"}`;
  *   - load failure (LoadError): payload parsed but the sink rejected it
  *     — 200 with `{"error":"Load error"}`;
  *   - anything else: 500 with the message and `source=internal`.
  *
  * Classification order matters and mirrors the reference control flow:
  * transport errors preempt parse errors preempt load errors (a 404's
  * HTML body is NOT reported as invalid JSON).
  *
  * Everything is narrow, codegen'd column logic — classification of a
  * 100 TB fetch log is a scan, no shuffle; the rollup is one map-side-
  * combined aggregation.
  */
object ExtractErrors {

  val KindHttp = "http"
  val KindInvalidJson = "invalid_json"
  val KindLoad = "load"

  /** Classify fetch attempts. Input columns: `fetch_id`, `http_status`
    * (int), `body` (string, nullable), `load_error` (boolean).
    * `bodyValid` is the caller's payload-parse predicate (schemas vary
    * by source); a NULL body is never valid. Output adds `status`
    * (success|error), `error_kind`, `response_status`, `error_data` —
    * the ledger imprint of [[MeteoSchemas.FetchTransition]]. */
  def classify(attempts: DataFrame, bodyValid: Column): DataFrame = {
    val httpFailed = col("http_status") >= 400
    val jsonFailed = !coalesce(bodyValid, lit(false))
    val loadFailed = coalesce(col("load_error"), lit(false))
    attempts
      .withColumn("error_kind",
        when(httpFailed, KindHttp)
          .when(jsonFailed, KindInvalidJson)
          .when(loadFailed, KindLoad))
      .withColumn("status",
        when(col("error_kind").isNull, MeteoSchemas.FetchStatus.Success)
          .otherwise(MeteoSchemas.FetchStatus.Error))
      .withColumn("response_status",
        when(httpFailed, col("http_status")).otherwise(lit(200)).cast("int"))
      .withColumn("error_data",
        when(httpFailed, col("body"))
          .when(jsonFailed, lit("""{"error":"Invalid JSON"}"""))
          .when(loadFailed, lit("""{"error":"Load error"}""")))
  }

  /** Failed attempts with their raw bodies — the dead-letter feed a
    * pipeline parks for replay/debugging. */
  def deadLetters(classified: DataFrame): DataFrame =
    classified.filter(col("status") === MeteoSchemas.FetchStatus.Error)
      .select(col("fetch_id"), col("error_kind"), col("response_status"),
        col("body"))

  /** Error rollup: jobs per (error_kind, response_status) with a sample
    * error payload — the operational view of the failure mix. */
  def errorRollup(classified: DataFrame): DataFrame =
    classified.filter(col("status") === MeteoSchemas.FetchStatus.Error)
      .groupBy(col("error_kind"), col("response_status"))
      .agg(count(lit(1)).cast("long").as("n_jobs"),
        min(col("error_data")).as("sample_error"))
      .orderBy("error_kind", "response_status")

  /** Classified attempts as ledger transitions, ready for
    * [[FetchLedger.finish]]: the ERROR path lands with
    * `response_status` + `error_data` populated, the reference's
    * fetch_and_store failure imprint (etl/app.py:148-156). */
  def toTransitions(classified: DataFrame, seq: Column, at: Column,
      requestUrl: Column, requestParams: Column,
      payloadPath: Column): DataFrame =
    classified.select(
      col("fetch_id"), seq.as("seq"), at.as("at"),
      requestUrl.as("request_url"), requestParams.as("request_params"),
      col("status"), col("response_status"), col("error_data"),
      when(col("status") === MeteoSchemas.FetchStatus.Success, payloadPath)
        .as("payload_path"))
}
