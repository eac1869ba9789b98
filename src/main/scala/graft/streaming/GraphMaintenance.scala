package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Graph

/** Streaming maintenance of the event-type transition graph
  * ([[Graph.transitionEdges]]): each micro-batch derives its own
  * transitions — including the bridge from every user's LAST
  * previously-seen event into the batch (per-user carry-in state) —
  * and folds the counts into a cumulative edge table. Per-batch cost ∝
  * batch size + active users + graph size, never ingest history; the
  * current PageRank is always [[Graph.pagerank]] of the newest edge
  * version, graph-sized work.
  *
  * Replay safety follows the [[StreamingRollup]] recipe: both the edge
  * table and the per-user state are written to `v=<batchId>` versions
  * with overwrite mode, and a batch always reads the newest version
  * STRICTLY BELOW its own id — an at-least-once retry rebuilds its
  * version from the same predecessor instead of double-counting.
  *
  * Assumes per-user event-time-ordered arrival across batches (the
  * carry-in row precedes the batch's rows); late cross-batch stragglers
  * would need watermark reordering upstream, same caveat class as the
  * other ordered streaming lanes.
  */
object GraphMaintenance {

  private def versions(fs: FileSystem, root: String): Seq[Long] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** Fold one batch of raw events into the edge + state tables
    * (exposed for direct use and the spec's replay test). */
  def foldBatch(batch: DataFrame, batchId: Long, stateDir: String,
      edgeDir: String, keepVersions: Int = 3): Unit = {
    require(keepVersions >= 2, s"keepVersions=$keepVersions breaks replay")
    val spark = batch.sparkSession
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ev = batch.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"))

    val prevState = versions(fs, stateDir).filter(_ < batchId) match {
      case Nil => None
      case vs => Some(spark.read.parquet(s"$stateDir/v=${vs.max}"))
    }
    val tagged = prevState match {
      case Some(st) => ev.withColumn("__carry", lit(false))
        .unionByName(st.withColumn("__carry", lit(true)))
      case None => ev.withColumn("__carry", lit(false))
    }
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // dst must be a batch row: carry-in rows only ever SUPPLY a src
    // (their own transition was counted by the batch that ingested them)
    val batchEdges = tagged
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull && !col("__carry"))
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))

    val prevEdges = versions(fs, edgeDir).filter(_ < batchId) match {
      case Nil => None
      case vs => Some(spark.read.parquet(s"$edgeDir/v=${vs.max}"))
    }
    val merged = prevEdges match {
      case Some(pe) => pe.unionByName(batchEdges)
        .groupBy("src", "dst").agg(sum("w").as("w"))
      case None => batchEdges
    }
    merged.write.mode("overwrite").parquet(s"$edgeDir/v=$batchId")

    // new per-user state: latest event over carry-in ∪ batch
    val latest = tagged
      .withColumn("__r", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__r") === 1)
      .select("user_id", "ts", "event_id", "event_type")
    latest.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")

    Seq(stateDir, edgeDir).foreach { dir =>
      versions(fs, dir).sorted.dropRight(keepVersions)
        .foreach(v => fs.delete(new Path(s"$dir/v=$v"), true))
    }
  }

  /** Start the maintenance sink over a streaming event DataFrame. */
  def maintain(events: DataFrame, stateDir: String, edgeDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) foldBatch(batch, batchId, stateDir, edgeDir)
        ()
      }
      .start()

  /** The newest cumulative edge table. */
  def currentEdges(spark: SparkSession, edgeDir: String): DataFrame = {
    val fs = new Path(edgeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(fs, edgeDir)
    require(vs.nonEmpty, s"no edge state at $edgeDir")
    spark.read.parquet(s"$edgeDir/v=${vs.max}")
  }

  /** PageRank of the maintained graph — graph-sized work on demand. */
  def currentRanks(spark: SparkSession, edgeDir: String,
      iterations: Int = 3): DataFrame =
    Graph.pagerank(currentEdges(spark, edgeDir), iterations)
}
