package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate (sketch-based) aggregates: the constant-memory summary
  * path for lake-scale dashboard metrics.
  *
  * Exact `COUNT(DISTINCT key)` shuffles every distinct key and exact
  * percentiles sort the column; at 100 TB both are often the most
  * expensive aggregates in a dashboard refresh. Spark's native sketches
  * — HyperLogLog++ for distinct counts, KLL-style quantile summaries
  * for percentiles — are mergeable partial aggregates: each task builds
  * a fixed-size sketch and only sketches cross the wire, so cost is
  * O(data) map-side with O(sketch) shuffle regardless of cardinality.
  *
  * These are deliberately [T]-gated (ScalaTest bounds vs the exact
  * answers) rather than oracle-gated: DuckDB's approx functions use
  * different sketch parameters, so cross-engine equality is not defined.
  */
object Sketches {

  /** Per-group approximate summary: HLL++ distinct count of
    * `distinctCol` (relative error `rsd`) and approximate percentiles
    * of `valueCol` (rank error ≤ n / `accuracy`). */
  def approxSummary(df: DataFrame, groupCols: Seq[String],
      distinctCol: String, valueCol: String,
      percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99),
      rsd: Double = 0.05, accuracy: Int = 10000): DataFrame = {
    val pctArr = array(percentiles.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
        percentile_approx(col(valueCol), pctArr, lit(accuracy))
          .as("approx_percentiles"),
        count(lit(1)).as("n"))
  }

  /** Exact twin of [[approxSummary]] (for spec bounds and for callers
    * who can afford it at their scale). */
  def exactSummary(df: DataFrame, groupCols: Seq[String],
      distinctCol: String, valueCol: String,
      percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    val pctArr = array(percentiles.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        countDistinct(col(distinctCol)).as("exact_distinct"),
        percentile(col(valueCol), pctArr).as("exact_percentiles"),
        count(lit(1)).as("n"))
  }
}
