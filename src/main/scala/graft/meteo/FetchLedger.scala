package graft.meteo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Upsert

/** The fetch-metadata job ledger.
  *
  * The reference tracks each fetch job in a mutable Postgres row:
  * INSERT pending (etl/load.py:61-82) then UPDATE with outcome
  * (etl/load.py:85-118). Here the ledger is an append-only log of
  * [[MeteoSchemas.FetchTransition]] rows; `currentState` resolves the
  * newest transition per job — identical observable lifecycle
  * (pending → success|error with response_status/error_data/payload_path/
  * finished_at), but append-only writes scale on object storage.
  */
object FetchLedger {
  import MeteoSchemas._

  /** Ledger rows for a batch of newly started fetches (status=pending). */
  def begin(spark: SparkSession, jobs: Seq[(String, String, Map[String, String])],
      at: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    jobs.map { case (id, url, params) =>
      FetchTransition(id, 0L, at, url, params, FetchStatus.Pending, None, None, None)
    }.toDF()
  }

  /** Transition a set of jobs to a finished state. `outcomes` maps
    * fetch_id → (status, response_status, error_data, payload_path). */
  def finish(ledger: DataFrame,
      outcomes: DataFrame): DataFrame =
    ledger.unionByName(outcomes)

  /** Newest transition per job — the reference's fetch_metadata table view. */
  def currentState(ledger: DataFrame): DataFrame =
    Upsert.latestByKey(ledger, Seq("fetch_id"), col("seq"), Seq(col("at")))

  /** Jobs whose current status is finished (error|success). */
  def finished(ledger: DataFrame): DataFrame =
    currentState(ledger).filter(col("status").isin(FetchStatus.finished.toSeq: _*))

  /** Per-status job counts + latest transition time — the operational
    * health rollup behind the dashboard's status tiles. */
  def statusRollup(ledger: DataFrame): DataFrame =
    currentState(ledger)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_jobs"), max(col("at")).as("last_transition"))
      .orderBy("status")
}
