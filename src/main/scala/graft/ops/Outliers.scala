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
  * Scale shape: both window passes partition on the SAME key, so the
  * plan shuffles once and reuses the partitioning for the second
  * sort; the median/MAD tables are group-cardinality-sized and
  * broadcast back onto the rows. For cardinalities where an exact
  * per-key sort is too hot, the sketch path ([[Sketches]]) replaces
  * the rank step; this operator is the exact, oracle-gated form.
  */
object Outliers {

  private def discMedian(df: DataFrame, key: String, v: String, id: String,
      as: String): DataFrame = {
    val wRank = Window.partitionBy(key).orderBy(col(v), col(id))
    val wAll = Window.partitionBy(key)
    // percentile_disc is defined over NON-NULL values: unfiltered, nulls
    // would rank first and shift (or null out) the median
    df.filter(col(v).isNotNull)
      .select(col(key), col(v),
        row_number().over(wRank).as("rn"), count(lit(1)).over(wAll).as("n"))
      .groupBy(key)
      .agg(min(when(col("rn") === ceil(lit(0.5) * col("n")).cast("long"),
        col(v))).as(as))
  }

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
