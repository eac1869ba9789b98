package graft.meteo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** The analytics surface of the reference's Streamlit dashboard
  * (dashboard/queries.py, dashboard/streamlit_app.py), as reusable
  * DataFrame operators over an observations table.
  */
object Dashboard {

  /** `COUNT(DISTINCT (longitude, latitude))` — dashboard/queries.py:1. */
  def countLocations(obs: DataFrame): Long =
    obs.select(countDistinct(col("longitude"), col("latitude"))).head().getLong(0)

  /** Most recent rows feed — streamlit_app.py:21 (ORDER BY timestamp). */
  def recent(obs: DataFrame, limit: Int = 5000): DataFrame =
    obs.orderBy(col("timestamp")).limit(limit)

  /** pandas `.describe()` for a set of metric columns, computed
    * distributed and exactly: count/mean/std/min/max per metric, one row
    * per metric. Decimal sums make mean/std independent of partition
    * order (see graft.functions.Exact).
    *
    * Single-pass: the metrics are melted to (metric, value) rows with
    * one `explode` and aggregated in one shuffle — a per-metric
    * aggregate-and-union would scan the table once per metric, which at
    * lake scale turns a dashboard tile into k full-table reads. */
  def describe(df: DataFrame, metrics: Seq[String]): DataFrame = {
    val melted = df
      .select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).cast("double").as("v"))): _*)).as("mv"))
      .select(col("mv.metric").as("metric"), col("mv.v").as("v"))
      .filter(col("v").isNotNull)
    melted.groupBy("metric").agg(
        count(lit(1)).as("n"),
        sum(dec(col("v"))).cast("double").as("_s"),
        sum(dec(col("v")) * dec(col("v"))).cast("double").as("_ss"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .select(
        col("metric"), col("n"),
        round(col("_s") / col("n"), 6).as("mean"),
        round(sqrt((col("_ss") - col("_s") * col("_s") / col("n")) /
          (col("n") - 1)), 6).as("std"),
        col("min_v"), col("max_v"))
      .orderBy("metric")
  }
}
