package graft.queries

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the driver-gated incremental-fold parity
  * queries (`stream_dedup_parity`, `stream_index_parity`,
  * `stream_retrieval_parity`): each builds an EPHEMERAL on-disk state,
  * folds hash-split micro-batches (plus an at-least-once replay)
  * through it, collects the result, and deletes the state — so the
  * gate's cost should be the FOLD, not the sandbox's disk or the
  * engine's corpus-scale planning machinery. */
private[queries] object GateHarness {

  /** tmpfs-backed temp dir when the host has one: the state is
    * created, folded through, and deleted inside one query, and small
    * parquet commits on a virtualized ext4 add multi-second
    * journal-latency outliers that read as operator variance. A
    * production index lives on an object store; its write path is not
    * these gates' claim. */
  def ephemeralDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** Run `body` under micro-batch engine scoping, restoring the
    * session confs after: AQE off (a micro-batch plan is batch-sized
    * and known — per-stage adaptive re-planning turns each fold step
    * into ~10 separate jobs whose scheduling constants dominate the
    * fold; measured 8.3 s → 5.0 s on the dedup parity sweep) and
    * narrow shuffle width (fanning a corpus/4 batch into the session's
    * full shuffle width just multiplies task-launch constants — the
    * standard foreachBatch tuning). */
  def microBatchScoped[T](spark: SparkSession, shuffle: Int = 8)(body: => T): T = {
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufWas = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", shufWas)
    }
  }

  /** Depth-first delete of the ephemeral state. */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala.toSeq
      .sortBy(-_.getNameCount)
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
