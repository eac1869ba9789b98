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
  * twice. Group count is assumed dashboard-shaped (the histogram must
  * collect — ≤ ~1e4 groups is comfortable); rows PER group are
  * unbounded, which is the dimension that matters.
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

  /** Exact per-group DISCRETE quantile (percentile_disc semantics: the
    * value at rank ceil(p·n) over non-null values, ties ordered by
    * `tieCols`) by the same histogram-locate + bucket-probe plan as
    * [[groupQuantiles]] — one target rank per group, no interpolation,
    * and the fact table is never sorted. Returns (key, outCol). */
  def groupDiscQuantile(df: DataFrame, keyCol: String, valueCol: String,
      tieCols: Seq[String], p: Double, outCol: String,
      bucketShift: Int = 44): DataFrame = {
    require(p > 0 && p <= 1)
    val spark = df.sparkSession
    val in = df.filter(col(valueCol).isNotNull)
    val key = col(keyCol)
    val x = col(valueCol)
    val keyField = df.schema(keyCol)
    val bucket = bitBucket(x, bucketShift)

    val histRows = in.groupBy(key, bucket.as("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()
    val located = histRows.groupBy(_.get(0)).toSeq.map { case (k, rows) =>
      val hs = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val before = hs.scanLeft(0L)(_ + _._2)
      val t = math.ceil(p * before.last).toLong
      val i = hs.indices.findLast(i => before(i) < t).get
      Row(k, t, hs(i)._1, before(i))
    }
    val locSchema = StructType(Seq(keyField,
      StructField("__t", LongType), StructField("__b", LongType),
      StructField("__before", LongType)))
    val locatedDf = spark.createDataFrame(
      java.util.Arrays.asList(located: _*), locSchema)

    in.withColumn("__b", bucket)
      .join(broadcast(locatedDf), Seq(keyCol, "__b"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(key, col("__b"))
          .orderBy(x +: tieCols.map(col): _*)))
      .filter(col("__before") + col("__r") === col("__t"))
      .select(key, x.as(outCol))
  }

  def groupQuantiles(df: DataFrame, keyCol: String, valueCol: String,
      tieCols: Seq[String], ps: Seq[Double],
      bucketShift: Int = 44): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val spark = df.sparkSession
    val key = col(keyCol)
    val x = col(valueCol)
    val keyField = df.schema(keyCol)
    val bucket = bitBucket(x, bucketShift)

    // pass 1: histogram (collected: groups × occupied buckets)
    val histRows = df.groupBy(key, bucket.as("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()

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
