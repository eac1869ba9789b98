package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the lake-ops "table diff" between two
  * versions of a keyed silver table (before/after a backfill, a
  * migration, or an independent re-derivation of the same table).
  *
  * Scale shape: both sides project to (key, fingerprint) BEFORE the
  * comparison join, so the one full-outer shuffle carries a key and an
  * 8-byte hash per row — never the payload. At 100 TB the diff costs
  * two pruned scans (only key + fingerprinted columns read, pushdown
  * intact) plus one narrow-row shuffle; fetching actual payloads for
  * the (typically tiny) changed-key set is a second, targeted
  * semi-join by the caller. Rows are assumed unique per key per
  * snapshot — the silver-table invariant the upsert operator enforces.
  *
  * The fingerprint expression is caller-supplied so its string
  * normalization can follow the engine-parity discipline (integers and
  * strings verbatim; doubles via an exact integer form such as
  * `floor(x * 100)` — see the q41 query), mirroring how the reference's
  * load path treats the row payload as the unit of change
  * (`etl/load.py:21-58`, ON CONFLICT DO UPDATE).
  */
object Reconcile {

  /** Per-key diff classification between two snapshots: one row per key
    * present in either side, with `status` ∈
    * {added, removed, changed, unchanged} (relative old → new). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], fingerprint: Column): DataFrame =
    diffInternal(oldDf, newDf, keyCols, fingerprint)
      .withColumnRenamed(DiffCol, "status")

  /** The diff under a collision-safe internal column name, so
    * [[changeFeed]] can join it back against user tables that may
    * themselves carry a `status` column (the public name appears only
    * on public outputs). */
  private val DiffCol = "__diff_status"
  private def diffInternal(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], fingerprint: Column): DataFrame = {
    val o = oldDf.select(keyCols.map(col) :+ fingerprint.as("__fp_old"): _*)
    val n = newDf.select(keyCols.map(col) :+ fingerprint.as("__fp_new"): _*)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") === col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as(DiffCol): _*)
  }

  /** Reconciliation summary: per-status key counts plus min/max key as
    * a drill-down anchor (and a stronger equality gate than counts
    * alone). The summary is 4 rows however large the snapshots are. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      keyCol: String, fingerprint: Column): DataFrame =
    snapshotDiff(oldDf, newDf, Seq(keyCol), fingerprint)
      .groupBy("status")
      .agg(count(lit(1)).as("n_keys"),
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"))

  /** Derive the CDC change feed that transforms `oldDf` into `newDf`:
    * `op` = I for added keys (new payload), U for changed keys (new
    * payload), D for removed keys (old payload, carried so the feed is
    * self-describing). Keys with equal fingerprints emit NOTHING — the
    * feed is minimal under the fingerprint's notion of change.
    *
    * This is the inverse of [[Merge.applyChangeLog]]:
    * `applyChangeLog(old, changeFeed(old, new) + any seq, keys, "op")`
    * reproduces `new` exactly (spec-proven) — the reconcile lane and
    * the CDC lane are round-trip consistent, so a lake can diff two
    * independently-produced snapshots and replay the result as an
    * ordinary change log (e.g. to incrementally refresh downstream
    * tables after a backfill).
    *
    * Scale shape: status resolution is the narrow (key, fingerprint)
    * compare of [[snapshotDiff]]; payloads are fetched AFTER by two
    * targeted joins on the (typically tiny) non-unchanged key sets —
    * wide rows never ride the full-outer compare. */
  def changeFeed(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], fingerprint: Column): DataFrame = {
    val st = diffInternal(oldDf, newDf, keyCols, fingerprint)
    val iu = newDf
      .join(st.filter(col(DiffCol).isin("added", "changed")), keyCols)
      .withColumn("op",
        when(col(DiffCol) === "added", lit("I")).otherwise(lit("U")))
      .drop(DiffCol)
    val d = oldDf
      .join(st.filter(col(DiffCol) === "removed"), keyCols)
      .withColumn("op", lit("D"))
      .drop(DiffCol)
    iu.unionByName(d)
  }
}
