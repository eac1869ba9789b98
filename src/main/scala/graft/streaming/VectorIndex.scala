package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.VectorOps.cosineWithNorms
import graft.ops.Similarity

/** Incremental IVF vector index: ANN over a corpus that arrives as a
  * stream (the vector counterpart of [[graft.ops.DedupIndex]]).
  *
  * Ingest: each micro-batch assigns ONLY ITS OWN vectors to their
  * nearest cell (broadcast argmax against the centroid set) and appends
  * them to a cid-partitioned parquet index — per-batch cost ∝ batch,
  * never corpus. Batches land under `batch=<id>` with overwrite, so an
  * at-least-once replay rebuilds the same files instead of duplicating
  * rows (the [[graft.ops.DedupIndex]] idempotence pattern).
  *
  * Query: probe the `nProbe` nearest cells and score ONLY those — the
  * `cid` filter hits the PARTITION layout, so the scan opens the probed
  * cells' directories and skips the rest of the index on disk
  * (spec-asserted `PartitionFilters`). Query cost ∝ probed cells at any
  * corpus size.
  */
object VectorIndex {

  /** Assign one batch to cells and append it to the index (idempotent
    * per batchId). */
  def appendBatch(batch: DataFrame, centroids: DataFrame, indexDir: String,
      batchId: Long, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    Similarity.cellAssignments(batch, centroids, keep = 1, idCol, vecCol)
      .write.mode("overwrite")
      .partitionBy("cid")
      .parquet(s"$indexDir/batch=$batchId")

  /** Start the streaming ingest sink. */
  def ingest(vectors: DataFrame, centroids: DataFrame, indexDir: String,
      checkpointDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          appendBatch(batch, centroids, indexDir, batchId, idCol, vecCol)
        ()
      }
      .start()

  /** Top-k neighbors for `queries` against the indexed corpus. The
    * probed cell ids are a driver-side list bounded by
    * |queries|·nProbe — they become a partition-pruning IN filter. */
  def queryTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
      centroids: DataFrame, nProbe: Int = 4, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = Similarity.cellAssignments(queries, centroids, nProbe,
        idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("cid"),
        col("e").as("qe"), col("nrm").as("qn"))
    // untyped get: centroid ids are whatever type idCol carries
    val probedCells = probes.select("cid").distinct()
      .collect().map(_.get(0)).toSeq
    val index = spark.read.option("basePath", indexDir).parquet(indexDir)
      .filter(col("cid").isin(probedCells: _*)) // partition pruning
      .select(col("vec_id"), col("cid"), col("e").as("ce"), col("nrm").as("cn"))
    val scored = probes.join(index, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosineWithNorms(col("qe"), col("ce"), col("qn"), col("cn")), 6)
          .as("cosine"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id")), k)
      .orderBy("query_id", "neighbor_id")
  }
}
