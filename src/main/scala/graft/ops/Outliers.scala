package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) z-score — the data-quality gate a meteo feed needs for
  * spike detection (a stuck sensor shifts the mean and stddev; it
  * doesn't shift the median).
  *
  * Exact discrete medians via rank arithmetic (percentile_disc
  * semantics, deterministic tie-break on the id column) so the result
  * is engine-reproducible where interpolating quantile built-ins are
  * not.
  *
  * Scale shape: both medians come from RANK-SELECTION
  * ([[Quantiles.groupDiscQuantile]] — histogram locate + bucket probe),
  * so the fact is never sorted and parallelism never collapses to the
  * group count (a `Window.partitionBy(key)` with a handful of keys
  * sorts a 100 TB feed in a handful of tasks); the median/MAD tables
  * are group-cardinality-sized and broadcast back onto the rows. For
  * cardinalities where even exact selection is too hot, the sketch
  * path ([[Sketches]]) replaces the rank step; this operator is the
  * exact, oracle-gated form.
  */
object Outliers {

  // percentile_disc over NON-NULL values (rank ceil(n/2), id tie-break)
  // — groupDiscQuantile filters nulls and matches the rank arithmetic
  // of the oracle formulation exactly
  private def discMedian(df: DataFrame, key: String, v: String, id: String,
      as: String): DataFrame =
    Quantiles.groupDiscQuantile(df, key, v, Seq(id), 0.5, as)

  /** Rows whose |value − median| exceeds `k` × MAD, with the per-group
    * robust statistics attached. */
  def robustZ(df: DataFrame, key: String, valCol: String, idCol: String,
      k: Double): DataFrame = {
    val med = discMedian(df, key, valCol, idCol, "med")
    val d = df.join(broadcast(med), key)
      .withColumn("dev", abs(col(valCol) - col("med")))
    val mad = discMedian(d, key, "dev", idCol, "mad")
    d.join(broadcast(mad), key)
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col(idCol), col(key), col(valCol),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        round(col("dev"), 6).as("dev"))
  }
}
