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
  * Scale shape: one window pass over the change log (shuffled on key —
  * a day's CDC feed, orders of magnitude smaller than base), then ONE
  * full-outer shuffle join on the key. AQE broadcasts the reduced
  * change set when it's small; at lake scale pair this with
  * [[Upsert.mergePartitioned]]'s partition pruning so only touched
  * partitions rewrite.
  */
object Merge {

  /** Apply `changes` (base schema + `opCol` ∈ {I,U,D} + a sequence
    * column) to `base`. Keys must be non-null on both sides. */
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
    val b = base.as("b")
    val c = latest.as("c")
    val cond = keys.map(k => col(s"b.$k") === col(s"c.$k")).reduce(_ && _)
    val changePresent = col(s"c.${keys.head}").isNotNull
    b.join(c, cond, "full_outer")
      .filter(!(changePresent && col(s"c.$opCol") === "D"))
      .select(payload.map { cn =>
        val v: Column =
          if (keys.contains(cn)) coalesce(col(s"c.$cn"), col(s"b.$cn"))
          else when(changePresent, col(s"c.$cn")).otherwise(col(s"b.$cn"))
        v.as(cn)
      }: _*)
  }
}
