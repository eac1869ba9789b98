package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout maintenance for a parquet lake: small-file
  * compaction, z-order clustering, and per-file pruning statistics —
  * the OPTIMIZE / data-skipping lane a 100 TB table lives or dies by
  * (a day of streaming micro-batches leaves thousands of KB-sized
  * files; scans pay per file opened, not per byte).
  *
  * All three are distributed dataflow end-to-end: the file list is the
  * only driver-side small data, bins are assigned by prefix-sum inside
  * hash lanes (no global sort), and the rewrite routes every bin
  * wholly into one task via `repartition(bin)` + `partitionBy(bin)` —
  * no per-bin driver loop.
  */
object Layout {

  /** List the data files under `root` (recursively — micro-batch sinks
    * and partitioned tables nest) as a (path, bytes) DataFrame. The
    * filesystem is resolved FROM THE PATH, not the cluster default —
    * `FileSystem.get(conf)` would bind hdfs:// and throw on an s3a://
    * lake path. */
  def listFiles(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet"))
        files += ((s.getPath.toString, s.getLen))
    }
    import spark.implicits._
    files.toSeq.toDF("path", "bytes")
  }

  /** Assign each file to a compaction bin of ~`targetBytes`:
    * size-descending first-fit-by-prefix-sum inside `lanes` hash lanes
    * (each lane packs independently — the window never sees more than
    * one lane; bins overflow by at most one file, the standard
    * bin-packing relaxation). Bin ids are globally unique. */
  def planBins(files: DataFrame, targetBytes: Long, lanes: Int = 32): DataFrame = {
    val lane = pmod(xxhash64(col("path")), lit(lanes))
    val w = Window.partitionBy("lane").orderBy(col("bytes").desc, col("path"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.withColumn("lane", lane)
      .withColumn("start", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin",
        col("lane") * lit(1000000L) + (col("start") / lit(targetBytes)).cast("long"))
      .select("path", "bytes", "bin")
  }

  /** Compact `root` into `out`: one parquet file per bin. The
    * bin→task routing is a hash repartition on the bin id; partitionBy
    * then splits each task's rows by bin directory, so every bin is
    * exactly one output file regardless of how bins share tasks. */
  def compact(spark: SparkSession, root: String, out: String,
      targetBytes: Long, lanes: Int = 32): Long = {
    val files = listFiles(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // directory read: partition discovery stays on, so hive-partitioned
    // tables keep their partition columns through the rewrite
    compactFrom(spark.read.parquet(root), files, out, targetBytes, lanes)
  }

  /** [[compact]] over an EXPLICIT (path, bytes) file list — the form a
    * manifest-managed table needs (its snapshot is a file list, not a
    * directory; see [[Manifest.optimizeCompact]]). Leaf-file reads do
    * no partition discovery, which is exactly right there: a manifest
    * table's schema is its data schema. */
  def compactFiles(spark: SparkSession, files: Seq[(String, Long)],
      out: String, targetBytes: Long, lanes: Int = 32): Long =
    compactFrom(spark.read.parquet(files.map(_._1): _*), files, out,
      targetBytes, lanes)

  private def compactFrom(src: DataFrame, files: Seq[(String, Long)],
      out: String, targetBytes: Long, lanes: Int): Long = {
    val spark = src.sparkSession
    import spark.implicits._
    val plan = planBins(files.toDF("path", "bytes"), targetBytes, lanes)
    val nBins = plan.select("bin").distinct().count()
    // join on the scheme-normalized FULL path: input_file_name() renders
    // file:///p, FileStatus.getPath file:/p — same path, different
    // scheme spelling. Basenames are NOT a safe key (part-00000.parquet
    // recurs in every nested partition directory).
    val canon = (c: Column) => regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
    val routed = src
      .withColumn("__path", canon(input_file_name()))
      .join(broadcast(plan.select(canon(col("path")).as("__path"), col("bin"))),
        "__path")
      .drop("__path")
    // the inner join would SILENTLY DROP rows whose file the plan missed
    // (a listing/normalization gap) — for a maintenance op that replaces
    // the table, fail loudly instead. One extra count against a rewrite-
    // sized job is noise.
    val (inRows, outRows) = (src.count(), routed.count())
    require(outRows == inRows,
      s"compaction would lose rows: $inRows in source, $outRows routed")
    routed.repartition(nBins.toInt.max(1), col("bin"))
      .write.mode("overwrite").partitionBy("bin").parquet(out)
    nBins
  }

  /** Morton (z-order) interleave of two 16-bit bucket ids — pure
    * shift/mask integer ops, whole-stage-codegen friendly. */
  def zInterleave(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      val x1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
      val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
      (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Rewrite `df` clustered by the z-order of two numeric columns into
    * ~`nFiles` range-partitioned files: each file covers a compact
    * rectangle of the (cA, cB) space, so a predicate on EITHER column
    * prunes most files by min/max stats (one-dimensional sort layouts
    * only prune on the sort key). Buckets are min/max-scaled 16-bit
    * ranks — cheap and deterministic; swap in quantile boundaries for
    * heavily skewed dimensions. */
  def zorderWrite(df: DataFrame, cA: String, cB: String, nFiles: Int,
      out: String, quantileBuckets: Boolean = false): Unit = {
    val zd =
      if (!quantileBuckets) {
        val stats = df.agg(
          min(col(cA)).cast("double").as("amin"), max(col(cA)).cast("double").as("amax"),
          min(col(cB)).cast("double").as("bmin"), max(col(cB)).cast("double").as("bmax"))
        def bucket(c: Column, lo: Column, hi: Column): Column =
          least(lit(65535L), floor(
            (c.cast("double") - lo) / (hi - lo + lit(1e-12)) * 65536.0)).cast("long")
        df.crossJoin(broadcast(stats))
          .withColumn("__z", zInterleave(
            bucket(col(cA), col("amin"), col("amax")),
            bucket(col(cB), col("bmin"), col("bmax"))))
          .drop("amin", "amax", "bmin", "bmax")
      } else {
        // skewed dimensions: equi-DEPTH buckets from sampled quantile
        // boundaries (256 per dim, scaled to the 16-bit grid) — linear
        // scaling would crowd a heavy tail into a handful of cells and
        // the z-curve would degenerate to a 1-D sort on the other dim.
        // ONE multi-column approxQuantile pass computes both dimensions'
        // boundaries; they ship as a literal array, bucket id =
        // #boundaries ≤ x (a 256-element codegen'd HOF per row —
        // write-path cost only).
        val bs = df.stat.approxQuantile(Array(cA, cB),
          (1 until 256).map(_ / 256.0).toArray, 0.01)
        def bucket(c: String, b: Array[Double]): Column = {
          val arr = array(b.toSeq.map(lit): _*)
          (size(filter(arr, x => x <= col(c).cast("double"))).cast("long")
            * lit(256L))
        }
        df.withColumn("__z", zInterleave(
          bucket(cA, bs(0)), bucket(cB, bs(1))))
      }
    zd.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }

  /** Per-file min/max pruning statistics for `cols` — the skipping
    * index a scan planner consults before opening files. */
  def fileStats(spark: SparkSession, root: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(root)
      .withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /** Fraction of files a point-equality predicate on `c` must open,
    * given the stats table: the pruning selectivity the layout earns. */
  def pruneFraction(stats: DataFrame, c: String, value: Double): Double = {
    val total = stats.count().toDouble
    val hit = stats.filter(col(s"${c}_min") <= value && col(s"${c}_max") >= value)
      .count().toDouble
    hit / total
  }
}
