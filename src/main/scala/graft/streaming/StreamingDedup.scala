package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.DedupIndex

/** Near-duplicate detection AT INGEST: a document stream flows through
  * the persistent [[DedupIndex]] — each micro-batch sketches itself,
  * joins the accumulated band index (cross-batch candidates) and itself
  * (in-batch candidates), and appends to the index; confirmed near-dup
  * pairs land in `pairsDir` as they are discovered.
  *
  * This is the streaming complement of the batch dedup family: the
  * corpus is never re-sketched, state lives in parquet (restart-safe via
  * the checkpoint — a replayed batch re-emits the same pairs and
  * re-appends the same index rows, which downstream last-write-wins
  * consumers tolerate), and per-batch cost tracks batch size.
  */
object StreamingDedup {

  def nearDupPairs(docs: DataFrame, indexRoot: String, pairsDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val pairs = DedupIndex.append(batch.sparkSession, indexRoot, batch,
            idCol, textCol, threshold = threshold)
          pairs.write.mode("append").parquet(pairsDir)
          pairs.unpersist()
        }
        ()
      }
      .start()
}
