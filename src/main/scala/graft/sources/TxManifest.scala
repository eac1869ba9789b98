package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table atomic commit over [[Manifest]] tables — the lake analog
  * of the reference's multi-statement Postgres flow, where
  * `fetch_and_store` leaves `fetch_metadata` and `weather_observations`
  * mutually consistent (etl/load.py:61-118, etl/app.py:96-156): a
  * reader never observes the observations of a fetch whose ledger row
  * is missing, or vice versa.
  *
  * [[Manifest.commit]] is atomic PER TABLE; committing a ledger table
  * and an observations table as two independent manifests leaves a
  * window (crash between the two renames) where exactly one is
  * published — a torn state a database transaction cannot produce.
  * This layer closes it with one more level of the same trick the
  * per-table manifest already uses:
  *
  * {{{
  *   txRoot/
  *     _txlog/v<n>.json          -- {"table": version, ...} per tx
  *     <table>/_data/...         -- ordinary Manifest tables
  *     <table>/_manifests/...
  * }}}
  *
  * A transaction EXISTS iff its `_txlog/v<n>.json` exists, and that
  * file is published by one atomic no-overwrite rename. [[commit]]
  * first commits every table's DataFrame as that table's next Manifest
  * version (each individually atomic, none yet referenced), then
  * publishes the tx record binding {table → version} for ALL of them —
  * carrying forward the previous tx's pins for tables this tx did not
  * touch, so any tx describes a FULL consistent snapshot. Readers that
  * resolve through [[read]]/[[snapshot]] therefore see either every
  * table at its new version or every table at its old one; a crash
  * between table commits leaves orphan table versions that no tx
  * references (invisible, reclaimed by [[vacuum]] — NOT by plain
  * per-table [[Manifest.vacuum]], whose newest-K-by-number retention
  * would keep exactly those orphans and delete the tx-pinned
  * snapshot), exactly like a rolled-back transaction.
  *
  * Concurrency: same optimistic loop as [[Manifest.commit]] — the tx
  * number is claimed by the rename's create-if-absent semantics, a
  * losing writer re-reads the new latest tx, re-merges its pins, and
  * retries on n+1 (its per-table versions stay valid: table manifests
  * are append-only). Concurrent transactions over DISJOINT table sets
  * merge cleanly (each retry re-merges the other's pins); two
  * transactions writing the SAME table are last-published-wins at the
  * tx level — the semantics of the reference's own last UPDATE — so
  * multi-writer pipelines should partition table ownership or
  * serialize commits externally. Same filesystem scope as
  * [[Manifest]]: the rename must fail on an existing destination
  * (HDFS/POSIX; not plain S3 PUT).
  *
  * Scale shape: a tx record is a handful of (name, version) pairs —
  * commit cost is the tables' parquet writes plus N+1 renames; nothing
  * here grows with data volume.
  */
object TxManifest {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def txDir(txRoot: String) = s"$txRoot/_txlog"

  private def tableRoot(txRoot: String, table: String) = s"$txRoot/$table"

  /** All published transactions, ascending (empty for a fresh root). */
  def txVersions(spark: SparkSession, txRoot: String): Seq[Long] = {
    val dir = new Path(txDir(txRoot))
    val f = fs(spark, txRoot)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted
  }

  def latestTx(spark: SparkSession, txRoot: String): Option[Long] =
    txVersions(spark, txRoot).lastOption

  /** The {table → manifest version} pins of transaction `tx`. */
  def tableVersions(spark: SparkSession, txRoot: String, tx: Long)
      : Map[String, Long] = {
    val p = new Path(txDir(txRoot), s"v$tx.json")
    val f = fs(spark, txRoot)
    require(f.exists(p), s"no transaction $tx at $txRoot")
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // bodies are flat {"name":123,...} written by commit(); table names
    // are caller-chosen path segments (no quotes/control chars), so a
    // quote-delimited scan is exact
    val pat = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\\d+)".r
    pat.findAllMatchIn(body)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
        -> m.group(2).toLong)
      .toMap
  }

  /** Atomically publish one snapshot spanning all of `tables`: commit
    * each DataFrame as its table's next [[Manifest]] version, then
    * publish a single tx record pinning every table — the new versions
    * become visible to tx readers all at once or not at all. Returns
    * the tx number. Table names become path segments under `txRoot`
    * and must match `[A-Za-z0-9._-]+` (not dots-only, not starting
    * with '_'). */
  def commit(spark: SparkSession, txRoot: String,
      tables: Map[String, DataFrame], maxRetries: Int = 5): Long =
    commitAt(spark, txRoot, tables, Map.empty, maxRetries)

  /** [[commit]] plus `pinned`: {table → ALREADY-COMMITTED manifest
    * version} pairs to bind into the same transaction — for tables the
    * caller committed itself (e.g. via [[Manifest.commitAppend]], which
    * plain commit() can't express). The pinned versions stay invisible
    * to tx readers until this tx record publishes, exactly like the
    * freshly committed ones. */
  def commitAt(spark: SparkSession, txRoot: String,
      tables: Map[String, DataFrame], pinned: Map[String, Long],
      maxRetries: Int = 5): Long = {
    require(tables.nonEmpty || pinned.nonEmpty, "empty transaction")
    // names become path segments AND flat-JSON keys: restrict to a
    // safe charset (no separators, quotes, backslashes or control
    // chars — keeps tableRoot inside txRoot and the record parser
    // exact) and reject the '.'/'..' traversal names
    (tables.keys ++ pinned.keys).foreach { t =>
      require(t.matches("[A-Za-z0-9._-]+") && !t.matches("\\.+") &&
        !t.startsWith("_"),
        s"bad table name: '$t' (allowed: [A-Za-z0-9._-]+, not dots-only, " +
          "not starting with '_')")
    }
    val f = fs(spark, txRoot)
    // phase 1: per-table commits — individually atomic, invisible to tx
    // readers until phase 2 publishes the record that references them.
    // Sorted for a deterministic commit order (diagnosability, not
    // correctness).
    val committed = tables.toSeq.sortBy(_._1).map { case (t, df) =>
      t -> Manifest.commit(df, tableRoot(txRoot, t))
    }.toMap ++ pinned
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (true) {
      // phase 2: publish {prev pins ++ this tx's tables} as tx n+1.
      // Resolve the latest tx ONCE per attempt: deriving pins and the
      // claimed number from two separate listings could pair tx n−1's
      // pins with number n+1 if a concurrent tx published in between,
      // silently dropping that tx's pins even though our rename wins.
      // With one resolution, a tx publishing after it makes our rename
      // fail and we re-merge against it on retry.
      val last = latestTx(spark, txRoot)
      val prev = last.map(tableVersions(spark, txRoot, _))
        .getOrElse(Map.empty[String, Long])
      val pins = prev ++ committed
      val n = last.getOrElse(-1L) + 1L
      val body = pins.toSeq.sortBy(_._1).map { case (t, v) =>
        "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + v
      }.mkString("{", ",", "}")
      val tmp = new Path(txDir(txRoot), s".tmp-$n-$uuid.json")
      f.mkdirs(tmp.getParent)
      val out = f.create(tmp, false)
      out.write(body.getBytes("UTF-8")); out.close()
      if (f.rename(tmp, new Path(txDir(txRoot), s"v$n.json"))) return n
      // lost the tx-number race: the table versions stay committed
      // (append-only manifests), only the record retries with re-merged
      // pins on the next number
      f.delete(tmp, false)
      attempt += 1
      if (attempt > maxRetries)
        throw new IllegalStateException(
          s"tx commit lost $maxRetries races at $txRoot")
    }
    -1L // unreachable
  }

  /** Read `table` at the snapshot of transaction `tx` (latest tx by
    * default) — the ONLY read path with cross-table consistency:
    * resolving the tx once and reading every table through it yields
    * the table states some single transaction published together. */
  def read(spark: SparkSession, txRoot: String, table: String,
      tx: Option[Long] = None): DataFrame = {
    val n = tx.orElse(latestTx(spark, txRoot))
      .getOrElse(throw new IllegalArgumentException(
        s"no transactions at $txRoot"))
    val pins = tableVersions(spark, txRoot, n)
    val v = pins.getOrElse(table, throw new IllegalArgumentException(
      s"table '$table' not in transaction $n at $txRoot"))
    Manifest.read(spark, tableRoot(txRoot, table), Some(v))
  }

  /** Tx-aware space reclamation — the ONLY safe vacuum for tx-managed
    * tables: retain the newest `keepTx` transaction records, then
    * shrink every table to EXACTLY the versions those records pin.
    *
    * Plain [[Manifest.vacuum]] retains the newest K versions BY
    * NUMBER; after a torn commit (phase-1 table versions committed,
    * tx record never published) the orphans ARE each table's newest
    * versions while the latest tx pins older ones — newest-K
    * retention deletes the pinned manifests (then their data dirs)
    * and destroys the committed snapshot every tx reader resolves.
    * Here retention follows the tx records instead: pinned versions
    * survive regardless of age, orphans (pre-history AND torn-commit
    * leftovers) are reclaimed regardless of recency. */
  def vacuum(spark: SparkSession, txRoot: String, keepTx: Int = 2): Unit = {
    require(keepTx >= 1)
    val f = fs(spark, txRoot)
    val txs = txVersions(spark, txRoot)
    require(txs.nonEmpty, s"no transactions at $txRoot")
    val kept = txs.takeRight(keepTx)
    // pins carry forward on commit, so the union over kept txs names
    // every live version of every table ever committed
    val retainByTable = kept.flatMap(tableVersions(spark, txRoot, _).toSeq)
      .groupBy(_._1).map { case (t, tv) => t -> tv.map(_._2).toSet }
    // retired tx records go FIRST (a tx stops existing the moment its
    // record is gone), then each table shrinks to its retained pins
    txs.dropRight(keepTx).foreach(v =>
      f.delete(new Path(txDir(txRoot), s"v$v.json"), false))
    retainByTable.foreach { case (t, retain) =>
      Manifest.vacuumTo(spark, tableRoot(txRoot, t), retain)
    }
  }

  /** All tables of one transaction, resolved together (latest by
    * default): the multi-table consistent-snapshot read. */
  def snapshot(spark: SparkSession, txRoot: String,
      tx: Option[Long] = None): Map[String, DataFrame] = {
    val n = tx.orElse(latestTx(spark, txRoot))
      .getOrElse(throw new IllegalArgumentException(
        s"no transactions at $txRoot"))
    tableVersions(spark, txRoot, n).map { case (t, v) =>
      t -> Manifest.read(spark, tableRoot(txRoot, t), Some(v))
    }
  }
}
