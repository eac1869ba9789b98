package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking + running sum.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole input
  * into ONE task — fine for a 31-row presentation sort, fatal for a
  * 100 TB-corpus vocabulary (billions of distinct tokens). This operator
  * computes the identical `row_number()` + running-`sum()` result with a
  * two-phase plan that stays parallel end to end:
  *
  *  1. `repartitionByRange` on the sort key → partition i holds a
  *     contiguous, disjoint key range, and range partition ids ascend in
  *     sort order (AQE coalescing merges only ADJACENT ranges, so the
  *     invariant survives re-planning).
  *  2. A per-partition window (`partitionBy(pid)`) computes the local
  *     rank and local prefix sum — parallelism = number of ranges.
  *  3. Per-partition row/value totals (one row per range — thousands,
  *     never billions) get their exclusive prefix offsets via a window
  *     over that tiny table, then broadcast-join back: global rank =
  *     local rank + rows before this range, same for the running sum.
  *
  * The only single-task step touches `numRanges` rows, so the plan
  * survives a 1000-executor corpus: each range sorts its own slice, and
  * nothing ever materializes the full ordering in one place.
  */
object Ranking {

  /** Global 1-based row_number over `sortCols`, no running sum. Same
    * two-phase plan as [[globalRankCumsum]]. A per-GROUP rank with few
    * distinct groups (e.g. 3 return flags over a 100 TB fact table)
    * should NOT use `Window.partitionBy(group)` — parallelism collapses
    * to the group count; instead rank globally with the group leading
    * the sort key and subtract the group's broadcast start offset. */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rank", numRanges: Int = 0): DataFrame =
    globalRankCumsum(df, sortCols, lit(0L), rankCol, "__cum_unused",
      numRanges).drop("__cum_unused")

  /** Adds `rankCol` (global 1-based row_number over `sortCols`) and
    * `cumCol` (running sum of `valueCol` in that order). `sortCols` must
    * be a total order (ties across range boundaries would make local
    * ranks ambiguous — pass a tie-breaking column, as row_number would
    * need anyway for a deterministic result). */
  def globalRankCumsum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      rankCol: String = "rank", cumCol: String = "cum",
      numRanges: Int = 0): DataFrame = {
    val n = if (numRanges > 0) numRanges
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol)
    val wLoc = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val local = ranged
      .withColumn("__lrank", row_number().over(wLoc))
      .withColumn("__lcum", sum(col("__v"))
        .over(wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-range totals: ≤ n rows, aggregated map-side off the same range
    // exchange (ReusedExchange), so the corpus is ranged exactly once
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__sum"))
      .withColumn("__rank_off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn("__cum_off", coalesce(sum(col("__sum")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__rank_off"), col("__cum_off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, (col("__lrank") + col("__rank_off")).cast("long"))
      .withColumn(cumCol, col("__lcum") + col("__cum_off"))
      .drop("__pid", "__v", "__lrank", "__lcum", "__rank_off", "__cum_off")
  }
}
