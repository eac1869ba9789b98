package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) queries — "the options no other option
  * beats on every axis": multi-criteria shortlists (cheapest-and-
  * smallest part, fastest-and-cheapest supplier) that no single ORDER
  * BY can express. Börzsönyi et al. (ICDE 2001) named the operator;
  * engines still don't ship it, so it must compose from windows.
  *
  * The 2-D minimize/minimize case has an exact sort-free distributed
  * form (no self-join, no NOT EXISTS over the fact): a row (x, y) is
  * dominated iff a strictly-cheaper-x row has y ≤ its y, or an equal-x
  * row has strictly smaller y. Reduce to the (group, x) grid with
  * min(y) (map-side combine — the only pass over the fact), prefix-min
  * that grid per group, and keep rows where y == the grid min at their
  * x and the prefix-min of earlier x is strictly larger. Equal (x, y)
  * twins are BOTH kept (neither strictly beats the other) — the
  * standard skyline tie contract.
  *
  * Scale: the fact shuffles once on the group key; the prefix-min
  * window runs over the (group × distinct x) GRID, co-partitioned with
  * the grid aggregation — groups parallelize, and a group's window
  * sees only its own distinct x values. Dominance here is transitive
  * and the skyline is a union-respecting reduction (skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B))), so per-partition pre-filtering
  * composes if a caller ever needs an ungrouped frontier at corpus
  * scale.
  */
object Skyline {

  /** Per-group 2-D skyline, both axes MINIMIZED. Maximize an axis by
    * passing its negation. Returns the input columns of skyline rows.
    * NULL coordinates drop (a row with no value on an axis is not
    * comparable, and every engine orders NULLs differently — callers
    * route them to their own lane). */
  def skyline2D(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val base = df.filter(xCol.isNotNull && yCol.isNotNull)
      .withColumn("__g", groupCol)
      .withColumn("__x", xCol)
      .withColumn("__y", yCol)
    val grid = base.groupBy(col("__g"), col("__x"))
      .agg(min(col("__y")).as("__my"))
    val wPrev = Window.partitionBy(col("__g")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = grid
      .withColumn("__pmin", min(col("__my")).over(wPrev))
      // a grid point survives iff no cheaper-x point is ≤ on y
      .filter(col("__pmin").isNull || col("__pmin") > col("__my"))
      .select(col("__g"), col("__x"), col("__my"))
    base
      .join(frontier,
        Seq("__g", "__x"))
      .filter(col("__y") === col("__my"))
      .drop("__g", "__x", "__y", "__my")
  }
}
