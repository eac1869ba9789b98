package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for each left row, the most recent
  * right row with `rightTime <= leftTime` on the same key.
  *
  * Spark has no native as-of join; the classic distributed formulation
  * is union-then-window: tag both sides, union on a common schema, and
  * take the last non-null right payload over a (key, time, side)-ordered
  * running frame. ONE shuffle on the key, no range-join explosion, no
  * per-left-row subquery — at 100 TB the cost is the same as a single
  * window aggregate over the combined stream.
  *
  * Right rows sort before left rows at equal timestamps (side 0 < 1), so
  * a right row AT the left timestamp is visible, matching `l.ts >= r.ts`
  * ASOF semantics. If the right side can hold several rows per
  * (key, time), dedupe it first (e.g. [[Upsert.latestByKey]]) — the
  * operator requires at most one, for determinism.
  */
object AsOfJoin {

  /** @param payload right-side column names to carry to the output
    *                (null where no right row is at-or-before the left
    *                 row); must not clash with left's column names. */
  def lastAtOrBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftExtra = left.columns.toSeq.filterNot(keys.contains)
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload ${payload.intersect(left.columns.toSeq)} clashes with left columns")

    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftExtra.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .select(
        (keys ++ leftExtra).map(col) ++
          Seq(col("__side")) ++
          payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
