package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the (user, day) ACTIVITY SET behind
  * [[graft.ops.Behavior.growthAccounting]] / `activeUsers`: each
  * micro-batch appends its own compacted (u, d) pairs; consumers read
  * the union and distinct it.
  *
  * Why this needs NO versioned-state machinery (contrast
  * [[StreamingRollup]], whose counts double on replay): the state is a
  * SET and set union is associative, commutative and IDEMPOTENT — an
  * at-least-once redelivery appends duplicate pairs that the
  * distinct-on-read collapses, so any fold order and any replay
  * converge to exactly the batch-computed state (the
  * [[graft.ops.Resample.m4State]] argument, in the streaming lane).
  * Append-only parquet is the cheapest write path that preserves it.
  *
  * Per-batch cost ∝ batch size (one map-side-combined distinct);
  * reading costs the accumulated (users × days) pairs — compact
  * periodically by rewriting the directory with [[compact]] when the
  * append count grows (a maintenance job, not a correctness need).
  */
object StreamingActivity {

  private val usPerDay = 86400L * 1000000L

  /** Fold one micro-batch of raw events into the stored activity set. */
  def foldBatch(batch: DataFrame, stateDir: String,
      userCol: String = "user_id", tsCol: String = "ts"): Unit =
    batch
      .select(col(userCol).as("u"),
        expr(s"unix_micros($tsCol) div $usPerDay").as("d"))
      .distinct()
      .write.mode("append").parquet(stateDir)

  /** Backfill the activity state from a historical feed in ONE append:
    * `batchExpr` labels each event with the micro-batch that owns it
    * and the per-batch distinct runs label-aware in one pass, so the
    * written rows are exactly the multiset N sequential [[foldBatch]]
    * calls append (a (user, day) active in two batches lands twice —
    * absorbed by [[current]]'s distinct, the same set algebra that
    * makes replays safe). Streamed folds — including an at-least-once
    * replay of a bootstrapped batch — take over seamlessly
    * (spec-proven interchangeable). */
  def bootstrap(events: DataFrame, batchExpr: org.apache.spark.sql.Column,
      stateDir: String, userCol: String = "user_id",
      tsCol: String = "ts"): Unit =
    events
      .select(col(userCol).as("u"),
        expr(s"unix_micros($tsCol) div $usPerDay").as("d"),
        batchExpr.cast("long").as("__b"))
      .distinct()
      .drop("__b")
      .write.mode("append").parquet(stateDir)

  /** The current distinct activity set. */
  def current(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir).distinct()

  /** Growth accounting over the folded state — identical semantics to
    * the one-shot batch operator on the union of all folded batches. */
  def growth(spark: SparkSession, stateDir: String): DataFrame =
    graft.ops.Behavior.growthFromDays(current(spark, stateDir))

  /** Rewrite the state directory as one compacted distinct snapshot
    * (bounds accumulated replay/append duplicates; safe to skip). */
  def compact(spark: SparkSession, stateDir: String): Unit = {
    val snap = current(spark, stateDir).localCheckpoint(true)
    snap.write.mode("overwrite").parquet(stateDir)
  }
}
