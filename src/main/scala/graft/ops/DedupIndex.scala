package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent incremental MinHash-LSH dedup index — the steady-state
  * shape of near-dup detection at lake scale.
  *
  * The one-shot [[Dedup.minHashLsh]] re-sketches the whole corpus per
  * run; at 100 TB that's the dominant cost and it is pure recompute.
  * This index persists two tables under `root`:
  *   - `bands/`    (doc_id, band, bkey) — the joinable LSH rows
  *   - `shingles/` (doc_id, s)          — shingle sets for exact verify
  * A new batch sketches ONLY itself, joins its bands against the stored
  * bands (new×old) and itself (new×new), verifies Jaccard exactly, and
  * appends its rows — per-batch cost is proportional to the batch, not
  * the corpus. The band join key (band, bkey) is a uniform hash → no
  * skew.
  *
  * Each batch owns the partition directory `batch=<batchId>` in both
  * tables and writes it with OVERWRITE: an at-least-once replay (e.g. a
  * foreachBatch retry after the append but before the checkpoint commit)
  * rewrites the same rows instead of duplicating them, so the index
  * never accumulates duplicate sketch rows and verify joins stay 1:1.
  */
object DedupIndex {

  private def bandsDir(root: String) = s"$root/bands"
  private def shinglesDir(root: String) = s"$root/shingles"

  private def exists(spark: SparkSession, dir: String): Boolean =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(dir))

  /** Sketch `newDocs`, emit near-dup pairs against the index AND within
    * the batch, then write the batch's sketch rows into its own index
    * partition (idempotent under replay — see class doc).
    * Returns (id_a, id_b, jaccard) with id_a < id_b, UNORDERED — pairs
    * are output-sized, so a consumer that needs order sorts once at the
    * end instead of paying a global sort per batch. Doc ids must be
    * globally unique across all batches; `batchId` must be unique per
    * batch and stable across retries of the same batch (foreachBatch's
    * batchId has exactly this contract).
    * `indexFiles` bounds the file count of each batch's index
    * partition: micro-batches at the session's shuffle parallelism
    * would otherwise write 32+ near-empty files per batch per table,
    * and every LATER append re-lists and re-opens all of them — the
    * classic small-files tax, paid once per write but once per batch
    * forever after on the read side. */
  def append(spark: SparkSession, root: String, newDocs: DataFrame,
      batchId: Long,
      idCol: String = "doc_id", textCol: String = "text",
      numPerms: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, indexFiles: Int = 4): DataFrame = {
    val sh = Dedup.shingleSets(newDocs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBands = Dedup.bandTable(sh, numPerms, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val haveIndex = exists(spark, bandsDir(root))
    // exclude THIS batch's partition: on a replay its rows are already
    // in the index and would duplicate candidates and verify rows
    val oldBands =
      if (haveIndex) spark.read.parquet(bandsDir(root))
        .filter(col("batch") =!= batchId)
        .select(newBands.columns.toSeq.map(col): _*)
      else null
    // candidates: new×new (self-join) ∪ new×old (index join)
    val selfCand = newBands.as("a").join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val cand = (if (!haveIndex) selfCand
      else selfCand.unionByName(
        newBands.as("n").join(oldBands.as("o"),
            col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
          .select(least(col("n.doc_id"), col("o.doc_id")).as("id_a"),
            greatest(col("n.doc_id"), col("o.doc_id")).as("id_b"))
          .filter(col("id_a") =!= col("id_b"))))
      .distinct()
    val allShingles =
      if (haveIndex) sh.unionByName(spark.read.parquet(shinglesDir(root))
        .filter(col("batch") =!= batchId)
        .select(sh.columns.toSeq.map(col): _*))
      else sh
    val pairs = Dedup.verifyJaccard(cand, allShingles, threshold)
      // materialize BEFORE the appends below extend the index dirs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()

    newBands.coalesce(indexFiles).write.mode("overwrite")
      .parquet(s"${bandsDir(root)}/batch=$batchId")
    sh.coalesce(indexFiles).write.mode("overwrite")
      .parquet(s"${shinglesDir(root)}/batch=$batchId")
    sh.unpersist(); newBands.unpersist()
    pairs
  }
}
