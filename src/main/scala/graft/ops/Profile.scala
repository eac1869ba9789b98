package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiling (the lake's `ANALYZE TABLE` / data-quality
  * summary): per column — row count, null count, exact distinct count,
  * lexicographic-cast min/max.
  *
  * One aggregate over one scan: the multi-column DISTINCT aggregates
  * plan through Spark's Expand (each input row fans out once per
  * distinct column, partially aggregated map-side) — the table is still
  * read ONCE, which at 100 TB is the whole game; a per-column loop of
  * separate aggregates would scan it once per column. The wide one-row
  * result is melted to (column, stats) rows with `stack` at the end,
  * where it costs nothing.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(lit(1)).as(s"${c}__n"),
      count(col(c)).as(s"${c}__cnt"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__n, ${c}__n - ${c}__cnt, ${c}__nd, ${c}__min, ${c}__max")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) " +
        "as (col_name, n, n_nulls, n_distinct, min_s, max_s)")
  }
}
