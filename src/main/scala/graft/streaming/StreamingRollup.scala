package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.IncrementalAgg

/** Streaming maintenance of the [[IncrementalAgg]] rollup: each
  * micro-batch folds its OWN partial state into the stored state table
  * — per-batch cost ∝ batch size + key cardinality, never ingest
  * history (the dashboard rollup a 100 TB feed can actually afford).
  *
  * Idempotence under at-least-once replay (the [[graft.ops.DedupIndex]]
  * lesson): state versions are written to `v=<batchId>` subdirectories
  * with overwrite mode, and a batch always merges from the newest
  * version STRICTLY BELOW its own id — a retried batch rebuilds its
  * version from the same predecessor instead of double-counting itself.
  */
object StreamingRollup {

  private def versions(fs: FileSystem, root: String): Seq[Long] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** Fold one batch into the state table (exposed for direct use and
    * for the spec's replay test). */
  def foldBatch(batch: DataFrame, batchId: Long, keys: Seq[String],
      valCol: String, stateDir: String, keepVersions: Int = 3): Unit = {
    // a retried batch merges from the newest version BELOW its id — with
    // fewer than 2 retained versions that predecessor may already be
    // deleted and the replay would silently reset the rollup
    require(keepVersions >= 2, s"keepVersions=$keepVersions breaks replay")
    val spark = batch.sparkSession
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = versions(fs, stateDir).filter(_ < batchId)
    val batchState = IncrementalAgg.state(batch, keys, valCol)
    val merged =
      if (prev.isEmpty) batchState
      else IncrementalAgg.merge(
        Seq(spark.read.parquet(s"$stateDir/v=${prev.max}"), batchState), keys)
    merged.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
    // retain a recovery horizon, drop the rest
    versions(fs, stateDir).sorted.dropRight(keepVersions)
      .foreach(v => fs.delete(new Path(s"$stateDir/v=$v"), true))
  }

  /** Start the maintenance sink over a streaming DataFrame. */
  def maintain(events: DataFrame, keys: Seq[String], valCol: String,
      stateDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) foldBatch(batch, batchId, keys, valCol, stateDir)
        ()
      }
      .start()

  /** The current rollup, finalized to dashboard statistics. */
  def current(spark: SparkSession, stateDir: String, keys: Seq[String])
      : DataFrame = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(fs, stateDir)
    require(vs.nonEmpty, s"no rollup state at $stateDir")
    IncrementalAgg.finalize(
      spark.read.parquet(s"$stateDir/v=${vs.max}"), keys)
  }
}
