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
  * corpus is never re-sketched, state lives in parquet, and per-batch
  * cost tracks batch size. Restart-safe: the index append is idempotent
  * (each batch overwrites its own `batch=<id>` partition, keyed by
  * foreachBatch's replay-stable batchId), so an at-least-once replay
  * can only re-emit the same pair rows to `pairsDir` — which downstream
  * last-write-wins consumers tolerate — never corrupt the index.
  */
object StreamingDedup {

  def nearDupPairs(docs: DataFrame, indexRoot: String, pairsDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // the returned pair frame is a lazy read-back of the index
          // partitions the append just wrote — run it NOW, before any
          // later batch extends the index dirs it lists
          DedupIndex.append(batch.sparkSession, indexRoot, batch,
              batchId, idCol, textCol, threshold = threshold)
            .write.mode("append").parquet(pairsDir)
        }
        ()
      }
      .start()
}
