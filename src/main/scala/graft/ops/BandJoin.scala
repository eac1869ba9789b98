package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal band (proximity) self-join: pairs of rows sharing a key
  * whose timestamps lie within `bandSeconds` of each other.
  *
  * A naive formulation is an equi-join on the key with a |Δt| ≤ band
  * residual predicate — per-key quadratic, which explodes on hot keys
  * (a key with 10⁶ rows implies 10¹² comparisons). This implementation
  * buckets time into band-width cells and equi-joins on (key, cell):
  * any in-band pair is at most one cell apart, so probing the three
  * neighboring cells (cell-1, cell, cell+1) from one side finds every
  * pair exactly once — each pair matches on the single probe value that
  * equals the build row's cell, so no post-join dedup is needed. Cost is
  * bounded by cell co-occupancy, not per-key row count, and the shuffle
  * key (key, cell) spreads a hot key across its time range.
  */
object BandJoin {

  /** All (id_a < id_b) pairs with equal `keyCol` and |Δts| ≤ `bandSeconds`.
    * Timestamps compare at microsecond precision (exact integers). */
  def pairsWithin(events: DataFrame, keyCol: String, idCol: String,
      tsCol: String, bandSeconds: Long): DataFrame = {
    val bandUs = bandSeconds * 1000000L
    val e = events.select(
      col(keyCol).as("k"), col(idCol).as("id"),
      unix_micros(col(tsCol)).as("us"))
      .withColumn("cell", floor(col("us") / bandUs))
    val probe = e.withColumn("jcell",
      explode(array(col("cell") - 1, col("cell"), col("cell") + 1)))
    probe.as("a").join(e.as("b"),
        col("a.k") === col("b.k") && col("a.jcell") === col("b.cell") &&
        col("a.id") < col("b.id") &&
        abs(col("a.us") - col("b.us")) <= bandUs)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        abs(col("a.us") - col("b.us")).as("delta_us"))
  }

  /** Interval OVERLAP join between two interval tables (the range-join
    * classic Spark's optimizer can't equi-plan: `sa <= eb AND sb <= ea`
    * alone is a broadcast-nested-loop over everything). Each interval
    * replicates to the timeline cells it covers (an interval of length
    * L costs ⌈L/W⌉ + 1 rows — bounded replication, not pair blowup) and
    * candidates meet by cell equi-join. Exactly-once WITHOUT a distinct
    * pass: a pair overlapping across several shared cells is emitted
    * only in the one cell containing the overlap's START
    * (max(sa, sb) — a cell both sides provably cover), so the join
    * predicate itself canonicalizes. Shuffle key = cell: a time-skewed
    * interval load spreads across its span.
    *
    * Inputs: (idCol, sCol, eCol) with INCLUSIVE integer endpoints
    * (caller converts dates/timestamps to integer coordinates).
    * `cellWidth` trades replication (long intervals) against cell
    * co-occupancy (dense timelines); a good default is the typical
    * interval length. Output: (id_a, id_b, overlap) where overlap =
    * min(ea, eb) − max(sa, sb) + 1 coordinate units.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      idCol: String = "id", sCol: String = "s", eCol: String = "e",
      cellWidth: Long = 32L): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    def repl(df: DataFrame) = df.select(
        col(idCol).as("id"), col(sCol).as("s"), col(eCol).as("e"))
      .withColumn("cell", explode(sequence(
        floor(col("s") / cellWidth), floor(col("e") / cellWidth))))
    repl(left).as("a").join(repl(right).as("b"),
        col("a.cell") === col("b.cell") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e") &&
        floor(greatest(col("a.s"), col("b.s")) / cellWidth) === col("a.cell"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (least(col("a.e"), col("b.e")) -
          greatest(col("a.s"), col("b.s")) + 1).as("overlap"))
  }
}
