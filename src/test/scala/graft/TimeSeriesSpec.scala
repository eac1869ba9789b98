package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.ops.Resample

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("gapfillLinear fills interior holes by linear interpolation") {
    // key a: observed at hours 0 (v=10) and 3 (v=40) → hours 1,2
    // interpolated at 20, 30; key b: no holes
    val df = Seq(
      ("a", ts(0, 15), 10.0), ("a", ts(3, 45), 40.0),
      ("b", ts(5), 1.0), ("b", ts(6), 2.0)).toDF("k", "t", "x")
    val out = Resample.gapfillLinear(df, "k", "t", "x")
      .orderBy("k", "h").collect()
    assert(out.length == 6) // a: hours 0..3, b: hours 5..6
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getAs[Double]("v_filled")).toSeq ==
      Seq(10.0, 20.0, 30.0, 40.0))
    assert(a.map(_.getAs[String]("src")).toSeq ==
      Seq("observed", "interpolated", "interpolated", "observed"))
    assert(out.filter(_.getString(0) == "b")
      .forall(_.getAs[String]("src") == "observed"))
  }

  test("gapfillLinear averages multiple observations in one grid cell") {
    val df = Seq(("a", ts(0, 1), 1.0), ("a", ts(0, 59), 3.0))
      .toDF("k", "t", "x")
    val out = Resample.gapfillLinear(df, "k", "t", "x").collect()
    assert(out.length == 1 && out.head.getAs[Double]("v_filled") == 2.0)
  }

  test("gapfill on real events leaves no nulls and preserves observed cells") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val out = Resample.gapfillLinear(ev, "event_type", "ts", "value")
    assert(out.filter(col("v_filled").isNull).count() == 0)
    // every observed hourly mean survives unchanged
    val base = ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 6).as("v"))
    val joined = base.join(out, Seq("event_type", "h"))
    assert(joined.count() == base.count())
    assert(joined.filter(col("v") =!= col("v_filled")).count() == 0)
  }

  test("robustZ flags only the spike: hand-computed median and MAD") {
    // values 1..9 plus a 100 spike: disc-median = 5, devs sorted
    // 0,1,1,2,2,3,3,4,4,95 → MAD = 2; k=3 → only dev 95 flagged
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("k", "id", "x")
    val out = graft.ops.Outliers.robustZ(df, "k", "x", "id", 3.0).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("x") == 100.0)
    assert(out.head.getAs[Double]("med") == 5.0)
    assert(out.head.getAs[Double]("mad") == 2.0)
    assert(out.head.getAs[Double]("dev") == 95.0)
  }

  test("range-interval rolling window matches a naive per-row computation") {
    val q = queries.TimeSeries.q32.run(spark, "/root/testdata/sf0.001")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    // naive: self-join on customer with the 7-day band condition
    val l = o.as("l"); val r = o.as("r")
    val naive = l.join(r,
        col("l.o_custkey") === col("r.o_custkey") &&
        col("r.o_orderdate") <= col("l.o_orderdate") &&
        col("r.o_orderdate") >= col("l.o_orderdate") - expr("interval 7 days"))
      .groupBy(col("l.o_orderkey").as("o_orderkey"))
      .agg(round(sum(col("r.o_totalprice").cast("decimal(18,2)"))
        .cast("double"), 2).as("exp_spend"),
        count(lit(1)).as("exp_n"))
    val cmp = q.join(naive, "o_orderkey")
    assert(cmp.filter(col("spend_7d") =!= col("exp_spend") ||
      col("n_7d") =!= col("exp_n")).count() == 0)
  }

  test("edge cases: single-point series, empty changes, empty frames") {
    // gapfill: a key with ONE observation yields exactly that grid cell
    val one = Seq(("k", ts(4), 7.0)).toDF("k", "t", "x")
    val g = Resample.gapfillLinear(one, "k", "t", "x").collect()
    assert(g.length == 1 && g.head.getAs[Double]("v_filled") == 7.0 &&
      g.head.getAs[String]("src") == "observed")

    // merge: empty change log is the identity
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val noChanges = Seq.empty[(Long, String, String, Long)]
      .toDF("k", "s", "op", "seq")
    val merged = graft.ops.Merge
      .applyChangeLog(base, noChanges, Seq("k"), "op", col("seq"))
      .orderBy("k").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // outliers: constant series (MAD = 0) flags nothing at any k
    val const = (1 to 20).map(i => ("g", i.toLong, 5.0)).toDF("k", "id", "x")
    assert(graft.ops.Outliers.robustZ(const, "k", "x", "id", 3.0).count() == 0)

    // profile: empty relation — zero rows, zero distinct, null min/max
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val p = graft.ops.Profile.profile(empty, Seq("id", "s")).collect()
    assert(p.length == 2)
    assert(p.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0 &&
      r.getLong(3) == 0 && r.isNullAt(4) && r.isNullAt(5)))
  }

  test("review regressions: nulls in values, hostile column names, nested compact") {
    // gapfill: null readings don't deflate a cell mean; all-null cell is a hole
    val withNulls = Seq(
      ("k", ts(0), Some(2.0)), ("k", ts(0, 30), None),
      ("k", ts(1), None),                       // all-null hour → hole
      ("k", ts(2), Some(6.0))).toDF("k", "t", "x")
    val g = Resample.gapfillLinear(withNulls, "k", "t", "x")
      .orderBy("h").collect()
    assert(g.map(_.getAs[Double]("v_filled")).toSeq == Seq(2.0, 4.0, 6.0))
    assert(g.map(_.getAs[String]("src")).toSeq ==
      Seq("observed", "interpolated", "observed"))

    // outliers: nulls neither shift the median nor appear as outliers
    val nv = (Seq.fill(3)(Option.empty[Double]) ++
      (1 to 9).map(d => Some(d.toDouble)) :+ Some(100.0)).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("k", "id", "x")
    val flagged = graft.ops.Outliers.robustZ(nv, "k", "x", "id", 3.0).collect()
    assert(flagged.length == 1 && flagged.head.getAs[Double]("x") == 100.0)
    assert(flagged.head.getAs[Double]("med") == 5.0) // as if nulls absent

    // profile: dotted/spaced column names survive (no identifier parsing)
    val weird = Seq((1L, "a"), (2L, "b")).toDF("the key", "v.alue")
    val p = graft.ops.Profile.profile(weird, Seq("the key", "v.alue"))
      .orderBy("col_name").collect()
    assert(p.map(_.getString(0)).toSeq == Seq("the key", "v.alue"))
    assert(p.forall(_.getLong(1) == 2))

    // compact: nested (partitioned) source layout, duplicate basenames
    val dir = java.nio.file.Files.createTempDirectory("nestedcompact")
    val root = dir.resolve("t").toString
    val out = dir.resolve("o").toString
    val src = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0), (4L, "y", 4.0))
      .toDF("id", "part", "v")
    src.write.partitionBy("part").parquet(root) // part-*.parquet recurs per dir
    graft.sources.Layout.compact(spark, root, out, targetBytes = 1L << 30, lanes = 1)
    val back = spark.read.parquet(out).select("id", "part", "v")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq == Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0), (4L, "y", 4.0)))
  }

  test("m4Downsample: exactly the envelope rows per bucket, struct " +
      "tie-breaks deterministic, no window over the raw series") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val e = Seq(
      // bucket A: min(3.0@:10), max(9.0@:20), first(5.0@:05), last(7.0@:50)
      (1L, ts("2024-01-01 00:05:00"), "a", 5.0),
      (2L, ts("2024-01-01 00:10:00"), "a", 3.0),
      (3L, ts("2024-01-01 00:20:00"), "a", 9.0),
      (4L, ts("2024-01-01 00:50:00"), "a", 7.0),
      // bucket B: equal values — id breaks the min/max tie
      (5L, ts("2024-01-01 01:10:00"), "a", 4.0),
      (6L, ts("2024-01-01 01:20:00"), "a", 4.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = graft.ops.Resample.m4Downsample(e)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(5))).toSet
    val bA = ts("2024-01-01 00:00:00").getTime / 1000 / 3600
    val bB = bA + 1
    assert(out == Set(
      (bA, "min", 2L), (bA, "max", 3L), (bA, "first", 1L), (bA, "last", 4L),
      // ties: min picks the earlier (ts,id), max the later
      (bB, "min", 5L), (bB, "max", 6L), (bB, "first", 5L), (bB, "last", 6L)))
    // single aggregation — no window/sort over the raw series
    val plan = graft.ops.Resample.m4Downsample(e)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      s"M4 must be a pure aggregation, not a window:\n$plan")
  }

  test("m4Downsample buckets pre-1970 timestamps with floor semantics " +
      "(epoch −10 lands in bucket −1, matching SQL `//`)") {
    import java.sql.Timestamp
    val e = Seq(
      (1L, new Timestamp(-10_000L), "a", 1.0),   // epoch −10 s
      (2L, new Timestamp(10_000L), "a", 2.0))    // epoch +10 s
      .toDF("event_id", "ts", "event_type", "value")
    val buckets = graft.ops.Resample.m4Downsample(e)
      .select("bucket").distinct().collect().map(_.getLong(0)).toSet
    assert(buckets == Set(-1L, 0L),
      s"truncating division would fold epoch −10 into bucket 0: $buckets")
  }

  test("ewmaHalf: hand-computed series; short-history renormalization; " +
      "bit-stable across repartitioning") {
    def day(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 13:00:00")
    // key a: daily means 8, 4, 2 (one reading per day)
    val df = Seq(("a", day(1), 8.0), ("a", day(2), 4.0), ("a", day(3), 2.0))
      .toDF("k", "t", "x")
    val got = Resample.ewmaHalf(df, "k", "t", "x", lags = 8)
      .orderBy("d").collect().map(_.getAs[Double]("ewma")).toSeq
    // t1: 8/1; t2: (4 + 0.5*8)/(1.5) = 8/1.5; t3: (2 + 0.5*4 + 0.25*8)/1.75
    assert(got == Seq(8.0, 8.0 / 1.5, 6.0 / 1.75), got)
    // truncation: with lags=2 the third day forgets day 1 entirely
    val t2 = Resample.ewmaHalf(df, "k", "t", "x", lags = 2)
      .orderBy("d").collect().map(_.getAs[Double]("ewma")).toSeq
    assert(t2 == Seq(8.0, 8.0 / 1.5, 4.0 / 1.5), t2)
    // determinism: same bits whatever the input partitioning
    val e = Tables.events(spark, sfDir)
    val a = Resample.ewmaHalf(e, "event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val b = Resample.ewmaHalf(e.repartition(7), "event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(a == b && a.nonEmpty, "ewma bits depend on partitioning")
  }

  // ---- Hampel filter (round 5: rolling robust spike gate) ------------

  private def feed(rows: ((Long, Long), Double)*) = {
    rows.map { case ((id, sec), v) => (id, sec, v) }
      .toDF("event_id", "sec", "value")
      .select(col("event_id"), lit("k").as("event_type"),
        timestamp_seconds(col("sec")).as("ts"), col("value"))
  }

  test("hampel flags only the local spike (hand-computed frame " +
      "median/MAD, discrete ranks, edge frames included)") {
    val df = feed(
      1L -> 0L -> 10.0, 2L -> 60L -> 11.0, 3L -> 120L -> 10.0,
      4L -> 180L -> 12.0, 5L -> 240L -> 100.0, 6L -> 300L -> 11.0,
      7L -> 360L -> 10.0, 8L -> 420L -> 12.0, 9L -> 480L -> 11.0)
    val out = graft.ops.Outliers.hampel(df).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L), s"got ${out.toSeq}")
    // spike frame rows 2..8 sorted (10,10,11,11,12,12,100): med=11 (rank 4),
    // |dev| sorted (0,0,1,1,1,1,89): mad=1
    assert(out.head.getDouble(3) == 11.0 && out.head.getDouble(4) == 1.0)
  }

  test("hampel vs robustZ: a level-shifted tail is NOT a rolling " +
      "anomaly (drift tolerance is the point of the rolling form)") {
    // first half ~10, second half ~50 with no local spikes
    val rows = (1L to 20L).map(i =>
      (i, i * 60L) -> (if (i <= 10) 10.0 + (i % 3) else 50.0 + (i % 3)))
    val df = feed(rows: _*)
    assert(graft.ops.Outliers.hampel(df).count() == 0,
      "smooth drift must not flag under a rolling gate")
    // the global-median gate flags the shifted tail wholesale
    assert(graft.ops.Outliers.robustZ(
      df, "event_type", "value", "event_id", 3.0).count() > 0)
  }

  test("hampelPartitioned == hampel on a contract-satisfying feed " +
      "(every bucket dense), all rows compared via k = -1") {
    // 2 keys x 300 rows, one per minute -> 60 rows per hourly bucket
    import spark.implicits._
    val rows = for (k <- Seq("a", "b"); i <- 1L to 300L) yield
      (k.hashCode * 1000L + i, k, i * 60L,
        ((i * 37 + k.length * 11) % 100).toDouble)
    val df = rows.toDF("event_id", "event_type", "sec", "value")
      .select(col("event_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"), col("value"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0),
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        java.lang.Double.doubleToLongBits(r.getDouble(4)))).toSet
    val plain = canon(graft.ops.Outliers.hampel(df, k = -1.0))
    val parted = canon(graft.ops.Outliers.hampelPartitioned(df, k = -1.0))
    assert(plain.nonEmpty && plain == parted,
      "bucket-parallel frames must be bit-identical to the plain window")
  }

  test("hampelPartitioned density contract: an EMPTY intermediate " +
      "bucket diverges (true neighbor two buckets away is not borrowed)") {
    // bucket 0 holds 4 rows, bucket 1 empty, bucket 2 holds 4 rows:
    // bucket 2's first frames need bucket-0 rows the lane never borrows
    val df = feed(
      1L -> 0L -> 1.0, 2L -> 60L -> 2.0, 3L -> 120L -> 3.0,
      4L -> 180L -> 4.0,
      5L -> 7200L -> 5.0, 6L -> 7260L -> 6.0, 7L -> 7320L -> 7.0,
      8L -> 7380L -> 8.0)
    def medOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val plain = medOf(graft.ops.Outliers.hampel(df, k = -1.0))
    val parted = medOf(graft.ops.Outliers.hampelPartitioned(df, k = -1.0))
    assert(plain(5L) != parted(5L),
      "expected documented divergence on the contract violation")
  }

  // ---- seasonalDecompose (round 5) -----------------------------------

  test("seasonalDecompose: constant series decomposes to trend=const, " +
      "seasonal=0, resid=0 exactly") {
    val rows = (0L until 96L).map(h => (h * 3600L + 60L, 42.5))
    val df = rows.toDF("sec", "x")
      .select(lit("k").as("event_type"),
        timestamp_seconds(col("sec")).as("ts"), col("x").as("value"))
    val out = graft.ops.Resample.seasonalDecompose(df).collect()
    assert(out.length == 96)
    assert(out.forall(r => r.getDouble(2) == 42.5 &&
      r.getDouble(3) == 42.5 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.0))
  }

  test("seasonalDecompose: planted hour-of-day effect surfaces in the " +
      "seasonal profile, reconstruction identity holds") {
    // 5 days hourly: base 100, +24 spike at hod 6
    val rows = for (d <- 0 until 5; h <- 0 until 24) yield
      ((d * 24 + h) * 3600L, if (h == 6) 124.0 else 100.0)
    val df = rows.toDF("sec", "x")
      .select(lit("k").as("event_type"),
        timestamp_seconds(col("sec")).as("ts"), col("x").as("value"))
    val out = graft.ops.Resample.seasonalDecompose(df).collect()
    assert(out.length == 120)
    val byHod = out.groupBy(r =>
      (r.getTimestamp(1).getTime / 3600000L) % 24)
    // hod-6 seasonal clearly positive, everything else mildly negative
    assert(byHod(6L).forall(_.getDouble(4) > 10.0))
    assert(byHod.filter(_._1 != 6L).values.flatten
      .forall(r => r.getDouble(4) < 1.0))
    // v == trend + seasonal + resid (decimal-exact, double-ulp slack)
    assert(out.forall(r => math.abs(r.getDouble(2) -
      (r.getDouble(3) + r.getDouble(4) + r.getDouble(5))) < 1e-9))
    // residuals stay small relative to the planted structure
    assert(out.forall(r => math.abs(r.getDouble(5)) < 10.0))
  }

  test("hampelRangeParallel == hampel on REAL events (sparse data " +
      "included) across lane sizes and range counts, k = -1 full compare") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0),
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        java.lang.Double.doubleToLongBits(r.getDouble(4)))).toSet
    val plain = canon(graft.ops.Outliers.hampel(ev, k = -1.0))
    for ((ls, nr) <- Seq((7, 0), (64, 3), (1 << 16, 5))) {
      val rp = canon(graft.ops.Outliers.hampelRangeParallel(ev, k = -1.0,
        laneSize = ls, numRanges = nr))
      assert(plain == rp,
        s"rank-lane hampel diverged at laneSize=$ls numRanges=$nr")
    }
    // tiny data, lanes far larger AND far smaller than the row count
    val few = ev.filter(org.apache.spark.sql.functions.col("event_id") < 40)
    val fewPlain = canon(graft.ops.Outliers.hampel(few, k = -1.0))
    for (ls <- Seq(7, 1 << 20)) {
      assert(canon(graft.ops.Outliers.hampelRangeParallel(few, k = -1.0,
        laneSize = ls)) == fewPlain, s"tiny-data divergence at laneSize=$ls")
    }
  }

  test("lttb elects the true largest-triangle point (hand-computed " +
      "planted series; r5 advisor found the area formula flipped)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one key, buckets 0/1/2 (bucketSeconds=3600). Anchors: bucket-0
    // mean 0.0 at xl=0.5h, bucket-2 mean 2.0 at xr=2.5h. With
    // x = xl + δ and a = v − yl, the true 2·area is |2δ − 2h·a| (µs
    // scale) while the r5 flipped form scores |2δ + 2h·a| — so:
    //   A = (1.9h, 0.1): true 2.6h, flipped 3.0h
    //   B = (1.2h, 0.9): true 0.4h, flipped 3.2h
    // The true formula elects A; the flipped one elected B.
    val usPerH = 3600L * 1000000L
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val rows = Seq(
      (1L, t(usPerH / 2), 0.0),           // bucket 0 (anchor mean 0.0)
      (2L, t(5L * usPerH / 2), 2.0),      // bucket 2 (anchor mean 2.0)
      (10L, t(19L * usPerH / 10), 0.1),   // A
      (11L, t(12L * usPerH / 10), 0.9))   // B
      .map { case (id, ts, v) => (id, ts, v, "k") }
      .toDF("event_id", "ts", "value", "event_type")
    val got = graft.ops.Resample.lttbDownsample(rows)
      .filter(col("bucket") === 1).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("id") == 10L,
      s"elected id ${got(0).getAs[Long]("id")}, expected A (id 10) — " +
        "area formula is not electing the largest triangle")
    assert(math.abs(got(0).getAs[Double]("area") - 2.6 * usPerH) < 1.0)
  }

  test("m4 state is mergeable and replay-idempotent: split + merge " +
      "(with a duplicated batch) equals the one-shot downsample") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val oneShot = graft.ops.Resample.m4Downsample(ev)
      .collect().map(_.toString).sorted.toSeq
    val parts = (0 until 3).map(r =>
      graft.ops.Resample.m4State(ev.filter(col("event_id") % 3 === r)))
    // merge out of order AND replay batch 0 — min/max idempotence must
    // absorb the duplicate
    val merged = graft.ops.Resample.m4Finalize(
      graft.ops.Resample.m4Merge(Seq(parts(2), parts(0), parts(1), parts(0))))
      .collect().map(_.toString).sorted.toSeq
    assert(merged == oneShot, "merged/replayed state diverged from one-shot")
  }

  test("stream_m4_parity fold shape: sequential pairwise m4Merge in " +
      "arrival order (with an at-least-once replay) equals one-shot") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val oneShot = graft.ops.Resample.m4Downsample(ev)
      .collect().map(_.toString).sorted.toSeq
    // the gate's exact shape: per-batch state, left fold state := state
    // ⊔ batch — foreachBatch maintenance, not a single n-way union
    val folded = Seq(0, 1, 1, 2, 3)
      .map(b => graft.ops.Resample.m4State(
        ev.filter(pmod(col("event_id"), lit(4)) === b)))
      .reduce((s, b) => graft.ops.Resample.m4Merge(Seq(s, b)))
    val got = graft.ops.Resample.m4Finalize(folded)
      .collect().map(_.toString).sorted.toSeq
    assert(got == oneShot, "sequential fold diverged from one-shot")
  }

  test("theilSen: one wild outlier day cannot bend the trend line — " +
      "hand-computed lower medians") {
    def day(d: Int) = Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00")
    // days 0..3 follow m = 2d + 5 exactly; day 4 explodes to 1000.
    // pair slopes: 2.0 six times, then 248.75, 331, 495.5, 989 →
    // lower median (rank 5 of 10) = 2.0; residuals (at epoch-day x):
    // 5-2·D0 four times, 992-2·D0 once → lower median = 5 - 2·D0
    val df = Seq(
      ("a", day(0), 5.0), ("a", day(1), 7.0), ("a", day(2), 9.0),
      ("a", day(3), 11.0), ("a", day(4), 1000.0)).toDF("k", "t", "x")
    val out = Resample.theilSen(df, "k", "t", "x").collect()
    assert(out.length == 1)
    val r = out.head
    val d0 = java.time.LocalDate.of(2024, 3, 1).toEpochDay.toDouble
    assert((r.getLong(1), r.getLong(2)) == ((5L, 10L)))
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 5.0 - 2.0 * d0,
      s"slope ${r.getDouble(3)} intercept ${r.getDouble(4)}")
    // OLS on the same series for contrast: the outlier drags the
    // fitted slope to ~148 — Theil-Sen's 29% breakdown is the point
  }

  test("crossCorrelation: perfectly correlated, anti-correlated, and " +
      "constant series — hand-signed r, zero-variance NULL") {
    def day(d: Int) = Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00")
    val rows = (0 until 5).flatMap { d =>
      Seq(("up", day(d), d + 1.0),        // 1,2,3,4,5
        ("down", day(d), 10.0 - d),       // 10..6 → r(up,down) = -1
        ("flat", day(d), 7.0))            // zero variance → NULL
    }
    import spark.implicits._
    val df = rows.toDF("k", "t", "x")
    val got = graft.ops.Resample.crossCorrelation(df, "k", "t", "x")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("down", "up")).contains(-1.0), s"got $got")
    assert(got(("down", "flat")).isEmpty && got(("flat", "up")).isEmpty)
    // linear transforms preserve |r| = 1: up vs 3·up − 2 would be 1.0;
    // here down = −up + 11 → exactly −1 after the double close
  }

  test("theilSen: within-day rows average (decimal-exact) before " +
      "pairing; even pair counts take the LOWER median") {
    def at(d: Int, h: Int) = Timestamp.valueOf(f"2024-03-${d + 1}%02d $h%02d:00:00")
    // day 0 mean = (1+3)/2 = 2, days 1..3 values 4, 7, 8 →
    // slopes: (0,1)=2, (0,2)=2.5, (0,3)=2, (1,2)=3, (1,3)=2, (2,3)=1 →
    // sorted 1,2,2,2,2.5,3 → lower median (rank 3 of 6) = 2
    val df = Seq(
      ("a", at(0, 1), 1.0), ("a", at(0, 23), 3.0), ("a", at(1, 5), 4.0),
      ("a", at(2, 5), 7.0), ("a", at(3, 5), 8.0)).toDF("k", "t", "x")
    val r = Resample.theilSen(df, "k", "t", "x").collect().head
    assert((r.getLong(1), r.getLong(2)) == ((4L, 6L)))
    assert(r.getDouble(3) == 2.0, s"slope ${r.getDouble(3)}")
  }
}
