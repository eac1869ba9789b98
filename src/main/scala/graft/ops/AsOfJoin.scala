package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
    *                 row); must not clash with left's column names.
    *
    * The payload travels as ONE struct, not per-column `last` calls: the
    * struct is non-null for every right row even when its fields are
    * null, so a null field in the matched row stays null instead of
    * being backfilled from an older right row (per-column ignoreNulls
    * would stitch values from different right rows). */
  def lastAtOrBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftExtra = left.columns.toSeq.filterNot(keys.contains)
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload ${payload.intersect(left.columns.toSeq)} clashes with left columns")

    val pType = StructType(payload.map(p => right.schema(p)))
    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftExtra.map(col) :+
        lit(null).cast(pType).as("__p"): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .select(
        (keys ++ leftExtra).map(col) ++
          Seq(col("__side"), last(col("__p"), ignoreNulls = true).over(w).as("__p")): _*)
      .filter(col("__side") === 1)
      .select((keys ++ leftExtra).map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }
}
