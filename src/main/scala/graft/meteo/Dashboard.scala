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
    * order (see graft.functions.Exact). */
  def describe(df: DataFrame, metrics: Seq[String]): DataFrame = {
    val perMetric = metrics.map { m =>
      val c = col(m)
      df.filter(c.isNotNull).agg(
        lit(m).as("metric"),
        count(lit(1)).as("n"),
        sum(dec(c)).cast("double").as("_s"),
        sum(dec(c) * dec(c)).cast("double").as("_ss"),
        min(c).cast("double").as("min_v"),
        max(c).cast("double").as("max_v"))
    }
    perMetric.reduce(_ unionByName _)
      .select(
        col("metric"), col("n"),
        round(col("_s") / col("n"), 6).as("mean"),
        round(sqrt((col("_ss") - col("_s") * col("_s") / col("n")) /
          (col("n") - 1)), 6).as("std"),
        col("min_v"), col("max_v"))
      .orderBy("metric")
  }
}
