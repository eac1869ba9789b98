package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact per-group interpolated quantiles (percentile_cont semantics)
  * by distributed rank-selection — the fact table is never sorted.
  *
  * Two jobs end to end:
  *
  *  1. Histogram pass: per (group, value-bucket) row counts — one
  *     map-side-combined aggregation, collected (groups × occupied
  *     buckets rows — an aggregate, not data; group counts are also
  *     read off it, so there is no separate stats pass). Buckets are
  *     ORDER-PRESERVING WITHOUT A DOMAIN SCAN: the high bits of the
  *     sign-folded IEEE-754 bit pattern ([[graft.functions.DoubleBits]]
  *     — for x ≥ 0 the bits ascend with the value; for x < 0 the
  *     magnitude bits are negated), i.e. sign + exponent + leading
  *     mantissa bits — ~2⁸ sub-buckets per binade at the default
  *     shift, adaptive resolution wherever the data lives.
  *  2. Probe pass: target ranks `lo+1`/`lo+2` (`lo = floor((n−1)·p)`)
  *     are located on the prefix-summed histogram driver-side; the
  *     fact is re-scanned filtered to those few buckets (broadcast
  *     local relation), survivors — thousands of rows, not the fact —
  *     ranked with a (group, bucket)-partitioned window, and the two
  *     picked values per (group, p) interpolated.
  *
  * Versus ranking the whole table (even range-parallel two-phase
  * ranking), this never shuffle-sorts the fact: the full-table work is
  * two pruned columnar scans with partial aggregation. At 100 TB that
  * is the difference between re-laying-out the table and reading it
  * twice. Group count is assumed dashboard-shaped — the histogram
  * collect is HARD-GUARDED at [[MaxHistRows]] rows and fails with a
  * pointer at [[quantilesSketch]] (the mergeable-sketch path with no
  * driver collect and unbounded group cardinality) instead of OOMing.
  * Rows PER group are unbounded in both paths, which is the dimension
  * that matters.
  *
  * Selected values are exact: bucketing only routes rows — equal
  * values share a bucket by construction, the bucket id is monotone in
  * the value, in-bucket order is (value, tieCols) — so results are
  * bit-identical to the full-sort formulation and the DuckDB
  * rank-arithmetic oracle (lo/frac use the same IEEE double ops in all
  * three places).
  *
  * `valueCol` must be non-null DoubleType.
  */
object Quantiles {

  /** Monotone bucket id from the double's bit pattern: sign-folded
    * bits, arithmetic-shifted so equal-high-bit values share a bucket. */
  private def bitBucket(x: Column, shift: Int): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.DoubleBits(
        org.apache.spark.sql.GraftColumnBridge.expression(x)))
    shiftright(when(b >= 0, b).otherwise(-b.bitwiseAND(lit(Long.MaxValue))),
      shift)
  }

  /** Ceiling on (group × occupied-bucket) histogram rows the exact
    * paths will collect to the driver. ~2M rows ≈ tens of MB — far
    * below driver heap, far above any dashboard-shaped group count.
    * Beyond it the caller is pointed at [[quantilesSketch]] instead of
    * OOMing the driver. */
  val MaxHistRows: Int = 2 << 20

  /** Collect the located histogram with a hard row guard: the limit
    * executes on the executors (CollectLimit), so an over-sized
    * histogram costs one aggregate and a clear error — never a
    * driver-sized fetch of (groups × buckets) rows. */
  private def guardedCollect(hist: DataFrame, maxRows: Int): Array[Row] = {
    val rows = hist.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"exact rank-selection would collect > $maxRows (group × value-bucket) " +
        "histogram rows to the driver; this group cardinality / value spread " +
        "needs the mergeable-sketch path (Quantiles.quantilesSketch), which " +
        "never collects")
    rows
  }

  /** Per-group quantiles from Spark's native mergeable quantile sketch
    * (`percentile_approx`, a Greenwald-Khanna summary): ONE pass, one
    * map-side-combined aggregation, fixed-size per-group state, and —
    * unlike the exact rank-selection paths — nothing ever reaches the
    * driver, so group cardinality is unbounded. The returned value is
    * an element of the data whose exact rank is within n/`accuracy` of
    * the target rank ⌈p·n⌉.
    *
    * This is the 100 TB default; the exact paths below stay for
    * dashboard-shaped group counts where bit-exact interpolated
    * quantiles are wanted (and are what the oracle gates).
    *
    * Returns (key, p, q_approx, n) — one row per (group, percentile).
    */
  def quantilesSketch(df: DataFrame, keyCol: String, valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    val x = col(valueCol)
    val pArr = array(ps.map(lit): _*)
    df.filter(x.isNotNull)
      .groupBy(col(keyCol))
      .agg(percentile_approx(x, pArr, lit(accuracy)).as("__qs"),
        count(lit(1)).as("n"))
      .select(col(keyCol),
        explode(arrays_zip(pArr.as("p"), col("__qs").as("q_approx"))).as("z"),
        col("n"))
      .select(col(keyCol), col("z.p").as("p"),
        col("z.q_approx").as("q_approx"), col("n"))
  }

  /** Distributed error-bound audit of [[quantilesSketch]]: for every
    * (group, p) the sketch value's EXACT rank interval is checked
    * against the target rank ± n/`accuracy` — the sketch's published
    * guarantee — entirely with joins and aggregates (no collect). The
    * boolean is deterministic even though the sketch value itself may
    * vary with partial-merge order, which is what makes this form
    * oracle-gateable.
    *
    * Returns (key, p, n, within_bound).
    */
  def sketchRankCheck(df: DataFrame, keyCol: String, valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val sk = quantilesSketch(df, keyCol, valueCol, ps, accuracy)
    val x = col(valueCol)
    val in = df.filter(x.isNotNull).select(col(keyCol), x)
    // one aggregated pass over the fact per sketch row set: the sketch
    // table is (groups × |ps|) rows — broadcast it onto the fact
    in.join(broadcast(sk), Seq(keyCol))
      .groupBy(col(keyCol), col("p"), col("n"))
      .agg(sum(when(x < col("q_approx"), 1L).otherwise(0L)).as("__lt"),
        sum(when(x <= col("q_approx"), 1L).otherwise(0L)).as("__le"))
      .select(col(keyCol), col("p"), col("n"),
        // value occupies exact ranks (__lt+1 .. __le); target rank
        // t = ceil(p·n); guarantee: interval overlaps t ± n/accuracy
        (col("__le") >= ceil(col("p") * col("n")) - col("n") / accuracy - 1 &&
          col("__lt") + 1 <= ceil(col("p") * col("n")) + col("n") / accuracy + 1)
          .as("within_bound"))
  }

  /** Exact per-group DISCRETE quantile (percentile_disc semantics: the
    * value at rank ceil(p·n) over non-null values, ties ordered by
    * `tieCols`) by the same histogram-locate + bucket-probe plan as
    * [[groupQuantiles]] — one target rank per group, no interpolation,
    * and the fact table is never sorted. Returns (key, outCol). */
  def groupDiscQuantile(df: DataFrame, keyCol: String, valueCol: String,
      tieCols: Seq[String], p: Double, outCol: String,
      bucketShift: Int = 44, maxHistRows: Int = MaxHistRows): DataFrame =
    groupDiscQuantiles(df, keyCol, valueCol, tieCols, Seq(p),
      bucketShift, maxHistRows)
      .select(col(keyCol), col("q_disc").as(outCol))

  /** Exact per-group DISCRETE quantiles for SEVERAL percentiles from ONE
    * histogram pass and ONE probe pass: every target rank ceil(p·n) is
    * located on the same prefix-summed histogram, the fact is re-scanned
    * once filtered to the union of target buckets, and each in-bucket
    * rank match emits its (p, value) row. Returns (key, p, q_disc).
    *
    * This is the plan q30-shaped queries want: three percentiles cost
    * one extra row in a broadcast locate table each — not three jobs,
    * and never a rank of the whole fact. */
  def groupDiscQuantiles(df: DataFrame, keyCol: String, valueCol: String,
      tieCols: Seq[String], ps: Seq[Double],
      bucketShift: Int = 44, maxHistRows: Int = MaxHistRows): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    val spark = df.sparkSession
    val in = df.filter(col(valueCol).isNotNull)
    val key = col(keyCol)
    val x = col(valueCol)
    val keyField = df.schema(keyCol)
    val bucket = bitBucket(x, bucketShift)

    val histRows = guardedCollect(
      in.groupBy(key, bucket.as("__b")).agg(count(lit(1)).as("__cnt")),
      maxHistRows)
    val located = histRows.groupBy(_.get(0)).toSeq.flatMap { case (k, rows) =>
      val hs = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val before = hs.scanLeft(0L)(_ + _._2)
      val n = before.last
      ps.map { p =>
        val t = math.ceil(p * n).toLong
        val i = hs.indices.findLast(i => before(i) < t).get
        Row(k, p, t, hs(i)._1, before(i))
      }
    }
    val locSchema = StructType(Seq(keyField,
      StructField("p", DoubleType), StructField("__t", LongType),
      StructField("__b", LongType), StructField("__before", LongType)))
    val locatedDf = spark.createDataFrame(
      java.util.Arrays.asList(located: _*), locSchema)
    val probeDf = spark.createDataFrame(
      java.util.Arrays.asList(
        located.map(r => Row(r.get(0), r.getLong(3))).distinct: _*),
      StructType(Seq(keyField, StructField("__b", LongType))))

    in.withColumn("__b", bucket)
      .join(broadcast(probeDf), Seq(keyCol, "__b"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(key, col("__b"))
          .orderBy(x +: tieCols.map(col): _*)))
      .join(broadcast(locatedDf), Seq(keyCol, "__b"))
      .filter(col("__before") + col("__r") === col("__t"))
      .select(key, col("p"), x.as("q_disc"))
  }

  def groupQuantiles(df: DataFrame, keyCol: String, valueCol: String,
      tieCols: Seq[String], ps: Seq[Double],
      bucketShift: Int = 44, maxHistRows: Int = MaxHistRows): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val spark = df.sparkSession
    val key = col(keyCol)
    val x = col(valueCol)
    val keyField = df.schema(keyCol)
    val bucket = bitBucket(x, bucketShift)

    // pass 1: histogram (collected: groups × occupied buckets, guarded)
    val histRows = guardedCollect(
      df.groupBy(key, bucket.as("__b")).agg(count(lit(1)).as("__cnt")),
      maxHistRows)

    // locate each target rank's bucket + exclusive prefix offset
    val located = histRows.groupBy(_.get(0)).toSeq.flatMap { case (k, rows) =>
      val hs = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val before = hs.scanLeft(0L)(_ + _._2)
      val n = before.last
      def bucketAt(t: Long): (Long, Long) = {
        // last i with before(i) < t (before is sorted ascending)
        val i = hs.indices.findLast(i => before(i) < t).get
        (hs(i)._1, before(i))
      }
      ps.flatMap { p =>
        val lo = math.floor((n - 1) * p).toLong
        val frac = (n - 1) * p - math.floor((n - 1) * p)
        Seq(lo + 1, lo + 2).filter(_ <= n).map { t =>
          val (b, off) = bucketAt(t)
          Row(k, p, lo, frac, t, b, off)
        }
      }
    }
    val locSchema = StructType(Seq(keyField,
      StructField("p", DoubleType), StructField("lo", LongType),
      StructField("frac", DoubleType), StructField("__t", LongType),
      StructField("__b", LongType), StructField("__before", LongType)))
    val locatedDf = spark.createDataFrame(
      java.util.Arrays.asList(located: _*), locSchema)
    val probeDf = spark.createDataFrame(
      java.util.Arrays.asList(
        located.map(r => Row(r.get(0), r.getLong(5))).distinct: _*),
      StructType(Seq(keyField, StructField("__b", LongType))))

    // pass 2: probe only target buckets, rank inside (group, bucket)
    val picked = df
      .withColumn("__b", bucket)
      .join(broadcast(probeDf), Seq(keyCol, "__b"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(key, col("__b"))
          .orderBy(x +: tieCols.map(col): _*)))
      .join(broadcast(locatedDf), Seq(keyCol, "__b"))
      .filter(col("__before") + col("__r") === col("__t"))
    picked.groupBy(key, col("p"))
      .agg(
        min(when(col("__t") === col("lo") + 1, x)).as("xlo"),
        min(when(col("__t") === col("lo") + 2, x)).as("xhi"),
        min(col("frac")).as("f"))
      .select(key, col("p"),
        round(col("xlo") + col("f") *
          (coalesce(col("xhi"), col("xlo")) - col("xlo")), 6).as("quantile"))
  }
}
