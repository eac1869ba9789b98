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
}
