package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Sketch `newDocs`, write the batch's sketch rows into its own index
    * partition (idempotent under replay — see class doc), and emit the
    * batch's near-dup pairs against the index AND within the batch.
    *
    * The index partitions land FIRST and the returned pair frame reads
    * them back: the batch's own rows come off its just-written
    * partition and the cross-batch side off the others (self-exclusion
    * by the `batch` partition column, so a replay still never joins
    * against its own earlier rows). One lazy read-back plan replaces
    * the old materialize-then-append ordering — one fewer action per
    * batch, and the pair job scans output-sized parquet instead of
    * re-deriving the sketch lineage.
    *
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
    Dedup.bandTable(sh, numPerms, bands)
      .coalesce(indexFiles).write.mode("overwrite")
      .parquet(s"${bandsDir(root)}/batch=$batchId")
    sh.coalesce(indexFiles).write.mode("overwrite")
      .parquet(s"${shinglesDir(root)}/batch=$batchId")
    sh.unpersist()
    pairsOfBatch(spark, root, batchId, threshold)
  }

  /** Backfill an EMPTY index from a historical corpus in ONE pass:
    * `batchExpr` labels each doc with the batch partition that owns it,
    * the corpus is sketched once, and a single partitioned write lands
    * every `batch=<id>` directory of both tables at once — the same
    * directory layout and rows N sequential [[append]] calls produce
    * (each batch partition compacted to one file), minus N−1 batches of
    * scheduling constants (the [[graft.streaming.VectorIndex.bootstrap]]
    * pattern applied to the dedup lane). Streamed appends — including
    * an at-least-once replay of a bootstrapped batch — take over
    * seamlessly: replay overwrites its own partition and joins the
    * rest, exactly as after sequential appends (spec-proven
    * interchangeable). Pair emission for the backfilled corpus is one
    * [[allPairs]] scan — per-batch emission resumes with the appends. */
  def bootstrap(spark: SparkSession, root: String, docs: DataFrame,
      batchExpr: Column,
      idCol: String = "doc_id", textCol: String = "text",
      numPerms: Int = 64, bands: Int = 16): Unit = {
    val sh = Dedup.shingleSets(
        docs.withColumn("__batch", batchExpr.cast("long")),
        idCol, textCol, carry = Seq("__batch"))
      .withColumnRenamed("__batch", "batch")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.bandTable(sh, numPerms, bands, carry = Seq("batch"))
      .repartition(col("batch")) // one file per batch partition
      .write.mode("overwrite").partitionBy("batch")
      .parquet(bandsDir(root))
    sh.repartition(col("batch"))
      .write.mode("overwrite").partitionBy("batch")
      .parquet(shinglesDir(root))
    sh.unpersist()
  }

  /** Near-dup pairs of ONE batch against the index (cross-batch, both
    * directions canonicalized id_a < id_b) and within itself — read
    * entirely off the stored index partitions. */
  def pairsOfBatch(spark: SparkSession, root: String, batchId: Long,
      threshold: Double = 0.5): DataFrame = {
    val bands = spark.read.parquet(bandsDir(root))
    val nb = bands.filter(col("batch") === batchId)
      .select("doc_id", "band", "bkey")
    val ob = bands.filter(col("batch") =!= batchId)
      .select("doc_id", "band", "bkey")
    val selfCand = nb.as("a").join(nb.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val crossCand = nb.as("n").join(ob.as("o"),
        col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
      .select(least(col("n.doc_id"), col("o.doc_id")).as("id_a"),
        greatest(col("n.doc_id"), col("o.doc_id")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val sh = spark.read.parquet(shinglesDir(root)).select("doc_id", "s")
    Dedup.verifyJaccard(
      selfCand.unionByName(crossCand).distinct(), sh, threshold)
  }

  /** Every near-dup pair in the index — the full-index report a
    * backfill emits once ([[bootstrap]]), and the union-equality anchor
    * for the incremental path: the per-batch emissions of sequential
    * [[append]]s, distinct-unioned, equal exactly this (each pair
    * surfaces when its LATER batch lands; spec-proven). */
  def allPairs(spark: SparkSession, root: String,
      threshold: Double = 0.5): DataFrame = {
    val bands = spark.read.parquet(bandsDir(root))
      .select("doc_id", "band", "bkey")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sh = spark.read.parquet(shinglesDir(root)).select("doc_id", "s")
    Dedup.verifyJaccard(cand, sh, threshold)
  }
}
