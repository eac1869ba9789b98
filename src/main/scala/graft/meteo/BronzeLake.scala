package graft.meteo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The raw-payload bronze lake.
  *
  * The reference writes one JSON file per fetch under
  * `bronze/YYYY/MM/DD/{source}_{fetch_id}.json` (streaming/load.py:18-33).
  * The Spark-native equivalent is a date-partitioned table: payloads are
  * rows (payload string + fetch metadata), laid out by
  * `partitionBy(year, month, day)` so downstream reads prune to the days
  * they need — the property the reference's path scheme encodes, now
  * visible to the optimizer.
  */
object BronzeLake {

  /** Stamp partition columns derived from the fetch time. */
  def withDateParts(df: DataFrame, tsCol: String = "fetched_at"): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))

  /** Append a batch of raw payloads to the lake root. */
  def write(df: DataFrame, root: String, tsCol: String = "fetched_at"): Unit =
    withDateParts(df, tsCol)
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .parquet(root)

  /** Read back, optionally pruned to one day (partition filters only —
    * no data files outside the day are touched). */
  def read(spark: SparkSession, root: String,
      day: Option[(Int, Int, Int)] = None): DataFrame = {
    val df = spark.read.parquet(root)
    day.fold(df) { case (y, m, d) =>
      df.filter(col("year") === y && col("month") === m && col("day") === d)
    }
  }
}
