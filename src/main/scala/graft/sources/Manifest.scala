package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal manifest-based table format: versioned snapshots with
  * ATOMIC commits and time travel over plain parquet — the
  * transactional skin a silver lake table needs once writers and
  * readers overlap (the reference's Postgres tables get this from the
  * database for free; a directory of parquet files does not).
  *
  * Layout under a table root:
  * {{{
  *   _data/<version>-<uuid>/part-*.parquet   -- immutable data files
  *   _manifests/v<version>.json              -- file list per version
  * }}}
  *
  * Correctness comes from two properties, not from locking:
  *  - data files are write-once (each commit writes to a fresh
  *    directory, never touching previous versions' files);
  *  - a version EXISTS iff its manifest file exists, and the manifest
  *    is published by an atomic rename from a temp name — readers
  *    either see a complete version or none of it, never a partial
  *    file list (rename is atomic on HDFS/local; on object stores the
  *    PUT of the manifest object plays the same role).
  *
  * Readers resolve `latestVersion` once and then read a CONSISTENT
  * snapshot regardless of concurrent commits — the reason dashboards
  * over a live silver table need this layer at all. Old versions stay
  * readable (time travel — [[graft.ops.Reconcile.snapshotDiff]] /
  * `changeFeed` between two versions of the same table composes
  * directly) until [[vacuum]] retires them.
  *
  * Scale shape: the manifest holds file PATHS (thousands), never rows;
  * commit cost is the parquet write + one rename; version resolution
  * is one directory listing. Optimistic concurrency: [[commit]] claims
  * version n = latest+1 by the rename's create-if-absent semantics —
  * a losing concurrent writer fails its rename and retries on n+1.
  */
object Manifest {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = s"$root/_manifests"

  /** All committed versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(manifestDir(root))
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Commit `df` as the next version of the table; returns the version
    * committed. Retries on manifest-rename collision (another writer
    * claimed the version first). */
  def commit(df: DataFrame, root: String, maxRetries: Int = 5): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (true) {
      val v = latestVersion(spark, root).getOrElse(-1L) + 1L
      val dataDir = s"$root/_data/$v-$uuid"
      df.write.mode("errorifexists").parquet(dataDir)
      val files = f.listStatus(new Path(dataDir)).toSeq
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted
      val body = files.map(p => "\"" + p.replace("\\", "\\\\")
        .replace("\"", "\\\"") + "\"").mkString("[", ",", "]")
      val tmp = new Path(manifestDir(root), s".tmp-$v-$uuid.json")
      f.mkdirs(new Path(manifestDir(root)))
      val out = f.create(tmp, false)
      out.write(body.getBytes("UTF-8")); out.close()
      // atomic publish: rename fails (returns false) if v<n>.json exists
      // — the losing writer cleans up and retries on the next version
      if (f.rename(tmp, new Path(manifestDir(root), s"v$v.json"))) return v
      f.delete(tmp, false)
      f.delete(new Path(dataDir), true)
      attempt += 1
      if (attempt > maxRetries)
        throw new IllegalStateException(
          s"manifest commit lost $maxRetries races at $root")
    }
    -1L // unreachable
  }

  private def manifestFiles(spark: SparkSession, root: String, v: Long)
      : Seq[String] = {
    val p = new Path(manifestDir(root), s"v$v.json")
    val f = fs(spark, root)
    require(f.exists(p), s"no version $v at $root")
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // manifest bodies are a flat JSON string array written by commit()
    body.stripPrefix("[").stripSuffix("]").split(",").toSeq
      .filter(_.nonEmpty)
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  /** Read a committed snapshot: the latest by default, or any retained
    * `version` (time travel). The file list is resolved ONCE, so the
    * read is consistent under concurrent commits. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root))
      .getOrElse(throw new IllegalArgumentException(s"no versions at $root"))
    spark.read.parquet(manifestFiles(spark, root, v): _*)
  }

  /** Retire all but the newest `keep` versions: manifests first (a
    * version stops existing the moment its manifest is gone), then any
    * data directory no surviving manifest references. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1)
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val dead = vs.dropRight(keep)
    dead.foreach(v => f.delete(new Path(manifestDir(root), s"v$v.json"), false))
    val live = vs.takeRight(keep)
      .flatMap(v => manifestFiles(spark, root, v))
      .map(p => new Path(p).getParent.getName).toSet
    val dataRoot = new Path(s"$root/_data")
    if (f.exists(dataRoot))
      f.listStatus(dataRoot).toSeq.map(_.getPath)
        .filterNot(p => live.contains(p.getName))
        .foreach(p => f.delete(p, true))
  }
}
