package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full MERGE / CDC-apply semantics: reconcile a base snapshot with a
  * change log of inserts/updates/deletes.
  *
  * [[Upsert]] covers the reference's last-write-wins `ON CONFLICT DO
  * UPDATE` (etl/load.py:21); a CDC feed additionally carries DELETEs and
  * multiple changes per key. Semantics here: the latest change per key
  * (by `seqCol`) decides — `D` removes the row, `I`/`U` replace the full
  * payload (including explicit update-to-NULL), keys without changes
  * pass through.
  *
  * Plan shape: a DISJOINT UNION, not a full-outer join. With the change
  * log reduced to one row per key and the base a snapshot (unique per
  * key — the precondition MERGE itself needs to be well-defined), the
  * merged table is exactly
  *
  *   (surviving changes: latest op ≠ D, full change payload)
  *   ∪ (base rows whose key has NO change: anti-join on the key)
  *
  * which beats the equivalent `full_outer` + coalesce/when projection
  * everywhere that matters at scale:
  *  - rows stay NARROW: the anti-join carries base columns only, never
  *    a both-sides-wide outer row;
  *  - built-in pushdown works UNAIDED: key predicates, PAYLOAD
  *    predicates (sound here — every output row's payload comes wholly
  *    from one branch, where the join form could not push payload
  *    predicates at all), and column pruning all reach both scans
  *    through Union/anti-join;
  *  - aggregates over the merged view map-side combine straight off the
  *    union (no wide outer-join row assembly first), and the anti-join
  *    preserves the base side's partitioning where FullOuter reports
  *    unknown partitioning and forces a re-shuffle of merged-width rows.
  *
  * Scale shape: one window pass over the change log (shuffled on key —
  * a day's CDC feed, orders of magnitude smaller than base), one
  * anti-join of base against the reduced change keys (AQE broadcasts
  * the key set when small, so base often avoids shuffling entirely);
  * at lake scale pair this with [[Upsert.mergePartitioned]]'s partition
  * pruning so only touched partitions rewrite.
  */
object Merge {

  /** Apply `changes` (base schema + `opCol` ∈ {I,U,D} + a sequence
    * column) to `base`. Keys must be non-null on both sides, and `base`
    * must be unique per key (it is a snapshot). */
  def applyChangeLog(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String,
      seqCol: Column): DataFrame = {
    val payload = base.columns.toSeq
    // seq ties must resolve DETERMINISTICALLY (a replayed feed can carry
    // U and D at the same seq): op descending (U beats I beats D — a
    // write wins over a delete), then a payload hash as the total-order
    // tie-break so equal-seq equal-op rows pick the same winner on every
    // run and partitioning.
    val latest = Upsert.latestByKey(changes, keys, seqCol,
        tieBreak = Seq(col(opCol),
          xxhash64((payload :+ opCol).map(col): _*)))
      .select((payload :+ opCol).map(col): _*)
    val survivingChanges = latest.filter(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    // anti-join against ALL latest-change keys (deletes included): any
    // change on a key supersedes the base row, surviving or not
    val untouchedBase = base.join(
      latest.select(keys.map(col): _*), keys, "left_anti")
    survivingChanges.unionByName(untouchedBase)
  }
}
