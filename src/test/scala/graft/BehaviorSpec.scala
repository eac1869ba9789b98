package graft

import java.sql.Timestamp

import graft.ops.Behavior

class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: cohorts by own first day, integer week buckets") {
    // cohort A (week 0 of anchor): u1 active weeks 0,1; u2 week 0 only.
    // cohort B (week 1 of anchor): u3 active weeks 0,2 — and u3's day-13
    // event is still that user's week 1 (12 days after THEIR first day).
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-09 10:00:00")),
      (2L, t("2024-01-02 10:00:00")),
      (3L, t("2024-01-08 10:00:00")), (3L, t("2024-01-20 10:00:00")),
      (3L, t("2024-01-21 23:00:00"))
    ).toDF("user_id", "ts")
    val r = Behavior.cohortRetention(ev)
      .orderBy("cohort_week", "week_offset").collect()
    val rows = r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getLong(3), x.getDouble(4))).toSeq
    assert(rows == Seq(
      (0L, 0L, 2L, 2L, 1.0),   // u1+u2 in week 0
      (0L, 1L, 1L, 2L, 0.5),   // only u1 returns
      (1L, 0L, 1L, 1L, 1.0),   // u3's own week 0
      (1L, 1L, 1L, 1L, 1.0)))  // u3 day 12 AND 13 → one week-1 cell
  }

  test("funnel: strictly-after ordering, first-touch attribution, monotone") {
    val ev = Seq(
      // u1 completes in order: view < click < purchase
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 10:05:00")),
      (1L, "purchase", t("2024-01-01 10:10:00")),
      // u2: click BEFORE first view — not a stage-2 conversion; the
      // purchase after the view without a qualifying click doesn't count
      (2L, "click", t("2024-01-01 09:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      (2L, "purchase", t("2024-01-01 11:00:00")),
      // u3: view then click, no purchase
      (3L, "view", t("2024-01-01 08:00:00")),
      (3L, "click", t("2024-01-01 08:30:00")),
      // u4: purchase only — never enters the funnel
      (4L, "purchase", t("2024-01-01 07:00:00")),
      // u5: first-touch trap — purchase sits between first view and
      // first qualifying click, so it must NOT count (strictly after
      // the stage-2 time)
      (5L, "view", t("2024-01-01 10:00:00")),
      (5L, "purchase", t("2024-01-01 10:30:00")),
      (5L, "click", t("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = Behavior.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(4L, 3L, 1L)) // views, clicks, purchases
    assert(r.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    assert(r(0).getDouble(3) == 1.0 && r(0).getDouble(4) == 1.0)
    assert(r(1).getDouble(4) == 0.75)          // 3/4 step conversion
    assert(r(2).getDouble(3) == 0.25)          // 1/4 overall
    assert(math.abs(r(2).getDouble(4) - 0.333333) < 1e-9) // 1/3 step, round 6
  }

  test("incremental retention: per-batch matrix equals one-shot on the " +
      "union; a late-arriving earlier event re-cohorts its user; replay " +
      "is idempotent") {
    val root = java.nio.file.Files
      .createTempDirectory("retention-index").toString
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val b1 = Seq(
      (1L, t("2024-01-08 10:00:00")), (1L, t("2024-01-16 10:00:00")),
      (2L, t("2024-01-09 10:00:00"))).toDF("user_id", "ts")
    // u1's TRUE first event (Jan 1) arrives late, in batch 2 — u1 must
    // move from the week-1 cohort to week 0 and its offsets must shift
    val b2 = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (3L, t("2024-01-17 10:00:00"))).toDF("user_id", "ts")
    val b3 = Seq(
      (2L, t("2024-01-23 10:00:00"))).toDF("user_id", "ts")
    var union = b1
    for ((b, id) <- Seq(b1 -> 0L, b2 -> 1L, b3 -> 2L)) {
      union = if (id == 0L) b else union.unionByName(b)
      val inc = Behavior.retentionAppend(spark, root, b, id)
      assert(m(inc) == m(Behavior.cohortRetention(union)), s"batch $id")
    }
    // replaying batch 1 (same batchId) must not change the matrix
    val replay = Behavior.retentionAppend(spark, root, b2, 1L)
    assert(m(replay) == m(Behavior.cohortRetention(union)))
  }

  test("retentionBootstrap: one-pass backfill state is interchangeable " +
      "with sequential appends — same matrix, replays and later appends " +
      "continue from it seamlessly") {
    import org.apache.spark.sql.functions.{col, pmod}
    val rootA = java.nio.file.Files
      .createTempDirectory("ret-boot").toString
    val rootB = java.nio.file.Files
      .createTempDirectory("ret-seq").toString
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val ev = Seq(
      (1L, t("2024-01-08 10:00:00")), (2L, t("2024-01-09 10:00:00")),
      (3L, t("2024-01-01 10:00:00")), (4L, t("2024-01-17 10:00:00")),
      (5L, t("2024-01-23 10:00:00")), (6L, t("2024-01-05 10:00:00")))
      .toDF("user_id", "ts")
    val boot = Behavior.retentionBootstrap(spark, rootA, ev,
      pmod(col("user_id"), org.apache.spark.sql.functions.lit(3)))
    for (b <- 0L to 2L)
      Behavior.retentionAppend(spark, rootB,
        ev.filter(pmod(col("user_id"),
          org.apache.spark.sql.functions.lit(3)) === b), b)
    val oneShot = m(Behavior.cohortRetention(ev))
    assert(m(boot) == oneShot, "bootstrap != one-shot")
    // replay of a bootstrapped batch through the APPEND path: idempotent
    val replay = Behavior.retentionAppend(spark, rootA,
      ev.filter(pmod(col("user_id"),
        org.apache.spark.sql.functions.lit(3)) === 1), 1L)
    assert(m(replay) == oneShot, "replay over bootstrap not idempotent")
    // a genuinely NEW batch continues from the bootstrapped state
    val b4 = Seq((9L, t("2024-01-30 10:00:00"))).toDF("user_id", "ts")
    val grown = Behavior.retentionAppend(spark, rootA, b4, 3L)
    assert(m(grown) == m(Behavior.cohortRetention(ev.unionByName(b4))))
  }

  test("activeUsersBootstrap: one-pass backfill equals sequential " +
      "appends and the one-shot metric; append replay stays idempotent") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def day(d: Int) = new Timestamp(d * 86400000L + 12 * 3600000L)
    val root = java.nio.file.Files.createTempDirectory("dauboot").toString
    val ev = Seq((1L, day(0)), (2L, day(1)), (1L, day(3)), (3L, day(2)),
      (4L, day(0)), (2L, day(4))).toDF("user_id", "ts")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("day").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val boot = rows(Behavior.activeUsersBootstrap(spark, root, ev,
      pmod(col("user_id"), lit(3))))
    assert(boot == rows(Behavior.activeUsers(ev)), "bootstrap != one-shot")
    val replay = rows(Behavior.activeUsersAppend(spark, root,
      ev.filter(pmod(col("user_id"), lit(3)) === 1), 1L))
    assert(replay == boot, "replay over bootstrap not idempotent")
  }

  test("StreamingActivity bootstrap: one-append backfill writes the " +
      "row multiset sequential folds append; growth equal, fold replay " +
      "over bootstrap absorbed by the set algebra") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.streaming.StreamingActivity
    def day(d: Int) = new Timestamp(d * 86400000L + 12 * 3600000L)
    // user 1 active on day 0 in two DIFFERENT batches (events 1 and 4):
    // sequential folds append that (u, d) twice — the bootstrap must too
    val ev = Seq((1L, 1L, day(0)), (2L, 2L, day(1)), (1L, 4L, day(0)),
      (3L, 3L, day(2)), (4L, 5L, day(0)), (2L, 6L, day(4)))
      .toDF("user_id", "event_id", "ts")
    val batchOf = pmod(col("event_id"), lit(3))
    val base = java.nio.file.Files.createTempDirectory("actboot")
    val seqDir = base.resolve("seq").toString
    for (b <- 0L to 2L)
      StreamingActivity.foldBatch(ev.filter(batchOf === b), seqDir)
    val bDir = base.resolve("boot").toString
    StreamingActivity.bootstrap(ev, batchOf, bDir)
    def multiset(dir: String) =
      spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(multiset(bDir) == multiset(seqDir),
      "bootstrap rows differ from sequential folds (multiset)")
    def growth(dir: String) =
      StreamingActivity.growth(spark, dir).orderBy("day").collect().toSeq
    assert(growth(bDir) == growth(seqDir))
    // replay batch 1 through the real fold: extra rows, same set
    StreamingActivity.foldBatch(ev.filter(batchOf === 1), bDir)
    assert(growth(bDir) == growth(seqDir),
      "growth changed after replay over bootstrap")
  }

  test("funnel conversion window: a click outside maxStepGap does not " +
      "convert; the first IN-WINDOW click does") {
    val ev = Seq(
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-03 10:00:01")),  // > 2 days after view
      (2L, "view", t("2024-01-01 10:00:00")),
      (2L, "click", t("2024-01-02 09:00:00"))   // within 2 days
    ).toDF("user_id", "event_type", "ts")
    val gapped = Behavior.funnel(ev, Seq("view", "click"),
        maxStepGapSeconds = Some(2L * 86400))
      .orderBy("stage").collect()
    assert(gapped.map(_.getLong(2)).toSeq == Seq(2L, 1L))
    // without a window both convert
    val open = Behavior.funnel(ev, Seq("view", "click"))
      .orderBy("stage").collect()
    assert(open.map(_.getLong(2)).toSeq == Seq(2L, 2L))
  }

  test("funnel is monotone on real data and retention week0 is 1.0") {
    val ev = Tables.events(spark, sfDir)
    val f = Behavior.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
    assert(f.map(_.getLong(2)).toSeq.reverse.sorted.sameElements(
      f.map(_.getLong(2)).toSeq.reverse))
    val ret = Behavior.cohortRetention(ev).collect()
    assert(ret.filter(_.getLong(1) == 0L).forall(_.getDouble(4) == 1.0))
    assert(ret.forall(r => r.getLong(2) <= r.getLong(3)))
  }

  test("activeUsers: DAU/WAU/MAU equal a brute-force per-day distinct " +
      "count, including gap days and window tails") {
    // u1 active days 0 and 9 (gap 1..8); u2 day 0 only; u3 days 8,40
    def day(d: Int, h: Int = 12) =
      new Timestamp(d * 86400000L + h * 3600000L)
    val ev = Seq(
      (1L, day(0)), (1L, day(0, 14)), (1L, day(9)),
      (2L, day(0)), (3L, day(8)), (3L, day(40))
    ).toDF("user_id", "ts")
    val got = Behavior.activeUsers(ev).orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force over the same (user, day) activity
    val act = Seq(1L -> 0, 1L -> 9, 2L -> 0, 3L -> 8, 3L -> 40)
    def distinctIn(d: Long, w: Int) =
      act.collect { case (u, ad) if ad <= d && ad > d - w => u }.distinct.size.toLong
    val want = (0L to 40L).map(d => (d, distinctIn(d, 1), distinctIn(d, 7),
      distinctIn(d, 30)))
    assert(got.toSeq == want, s"got ${got.take(12).mkString(",")}")
    // spot anchors: day 1 has zero DAU but u1/u2 still in WAU; u1's
    // day-9 activity supports MAU through day 38 and no further
    assert(got(1) == ((1L, 0L, 2L, 2L)) && got(38) == ((38L, 0L, 0L, 1L)) &&
      got(39) == ((39L, 0L, 0L, 0L)))
  }

  test("activeUsersAppend: incremental metrics equal the one-shot on " +
      "the union; cross-batch repeats dedup; replay idempotent") {
    def day(d: Int) = new Timestamp(d * 86400000L + 12 * 3600000L)
    val root = java.nio.file.Files.createTempDirectory("dauidx").toString
    val b1 = Seq((1L, day(0)), (2L, day(1))).toDF("user_id", "ts")
    // u1 repeats day 0 in batch 2 (cross-batch dup) + new day 3
    val b2 = Seq((1L, day(0)), (1L, day(3))).toDF("user_id", "ts")
    Behavior.activeUsersAppend(spark, root, b1, 1L)
    val got = Behavior.activeUsersAppend(spark, root, b2, 2L)
      .orderBy("day").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val oneShot = Behavior.activeUsers(b1.unionByName(b2))
      .orderBy("day").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == oneShot.toSeq, "incremental != one-shot")
    assert(got(0)._2 == 1L && got(3)._2 == 1L)
    // at-least-once replay of batch 2: identical metrics
    val replay = Behavior.activeUsersAppend(spark, root, b2, 2L)
      .orderBy("day").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(replay.toSeq == got.toSeq, "replay must be idempotent")
  }

  // ---- rfmSegments (round 5) -----------------------------------------

  test("rfmSegments: hand-built 8-customer corpus — integer quartile " +
      "boundaries, desc ranks for F/M, custkey tie-breaks, segments") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import java.sql.Date
    def day(d: Int) = Date.valueOf(f"2024-02-$d%02d")
    // cust i: i orders, last on day (28-i+1), total spend 9000-1000*i
    val rows = (1 to 8).flatMap { i =>
      val big = (9000 - 1000 * i - (i - 1)).toDouble
      (1 to i).map { j =>
        val d = day(28 - i + 1 - (i - j)) // j-th order, last lands at 28-i+1
        (i.toLong, d, if (j == i) big else 1.0)
      }
    }
    val orders = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.ops.Behavior.rfmSegments(orders)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getString(7)))).toMap
    // gmax = day 28 (cust 1); r_days(i) = i-1; rank_r = i
    // n_orders = i -> rank_f = 9-i; monetary = 9000-1000i -> rank_m = i
    // quartile(rank) over n=8: (rank-1)*4 div 8 + 1
    def qr(rank: Int) = ((rank - 1) * 4) / 8 + 1
    for (i <- 1 to 8) {
      val (rd, no, rq, fq, mq, seg) = got(i.toLong)
      assert(rd == (i - 1).toLong && no == i.toLong)
      assert(rq == qr(i).toLong, s"cust $i r_q $rq != ${qr(i)}")
      assert(fq == qr(9 - i).toLong, s"cust $i f_q $fq != ${qr(9 - i)}")
      assert(mq == qr(i).toLong, s"cust $i m_q $mq != ${qr(i)}")
      assert(seg == s"${qr(i)}${qr(9 - i)}${qr(i)}")
    }
  }

  // ---- windowed funnel (round 5) -------------------------------------

  test("funnel with a conversion deadline: a step beyond the window " +
      "does not convert, within-window behavior matches the plain form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400L
    val rows = Seq(
      // user 1 converts every stage within a day
      (1L, "view", 0L), (1L, "click", 3600L), (1L, "purchase", 7200L),
      // user 2: click arrives 2 days after the view -> stage 2 misses
      (2L, "view", 0L), (2L, "click", 2 * day), (2L, "purchase", 2 * day + 10),
      // user 3: click in time, purchase 2 days after the click -> stage 3 misses
      (3L, "view", 0L), (3L, "click", 1800L), (3L, "purchase", 1800L + 2 * day))
      .toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val steps = Seq("view", "click", "purchase")
    val boxed = graft.ops.Behavior.funnel(rows, steps,
        maxStepGapSeconds = Some(day))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(boxed == Map(1 -> 3L, 2 -> 2L, 3 -> 1L), s"got $boxed")
    // without the deadline all three users convert fully
    val plain = graft.ops.Behavior.funnel(rows, steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(plain == Map(1 -> 3L, 2 -> 3L, 3 -> 3L), s"got $plain")
  }

  test("growthAccounting: planted lifecycle — new, retained, " +
      "resurrected, churned flows conserve DAU") {
    import org.apache.spark.sql.functions._
    def ts(day: Int) = new Timestamp(day * 86400000L + 3600000L)
    // u1: d0,d1 (new -> retained; churns on d2)
    // u2: d0, d2 (new; churns d1; resurrects d2; churns d3)
    val df = Seq(
      (1L, ts(0)), (1L, ts(1)),
      (2L, ts(0)), (2L, ts(2)))
      .toDF("user_id", "ts")
    val got = Behavior.growthAccounting(df)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"))).toMap
    assert(got(0L) == ((2L, 0L, 0L, 0L)))
    assert(got(1L) == ((0L, 1L, 0L, 1L)))   // u1 retained, u2 churned
    assert(got(2L) == ((0L, 0L, 1L, 1L)))   // u2 back, u1 churned
    assert(got(3L) == ((0L, 0L, 0L, 1L)))   // u2 churns past the feed
    // conservation: DAU(d) = new + retained + resurrected
    val dau = df.select(expr("unix_micros(ts) div 86400000000").as("d"),
        col("user_id")).distinct()
      .groupBy("d").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((d, (n, r2, rs, _)) <- got if dau.contains(d))
      assert(n + r2 + rs == dau(d), s"flow conservation broke on day $d")
  }

  test("seasonalAnomalies flags a planted spike against the seasonal " +
      "pattern and stays silent on a clean periodic series") {
    import org.apache.spark.sql.functions._
    def hts(h: Int) = new Timestamp(h * 3600000L)
    // clean 24h pattern for 4 days, one corrupted hour
    val clean = for (h <- 0 until 96) yield
      ("a", hts(h), 10.0 + (h % 24))
    val spiked = clean.map { case (k, t, v) =>
      if (t == hts(50)) (k, t, v + 500.0) else (k, t, v) }
    // classical decomposition has EDGE effects (the centered trend
    // window truncates at the series boundaries), so the clean-series
    // contract is interior silence, not global silence
    def interior(h: Timestamp) =
      h.getTime >= hts(12).getTime && h.getTime < hts(84).getTime
    val quiet = graft.ops.Resample.seasonalAnomalies(
        clean.toDF("event_type", "ts", "value")).collect()
    assert(!quiet.exists(r => interior(r.getAs[Timestamp]("h"))),
      "clean periodic series must not flag interior hours")
    val flagged = graft.ops.Resample.seasonalAnomalies(
      spiked.toDF("event_type", "ts", "value")).collect()
    assert(flagged.exists(_.getAs[Timestamp]("h") == hts(50)),
      "the planted spike hour must be flagged")
    // the spike dominates every other flag (its neighbors flag too —
    // a ±500 outlier leaks into the non-robust trend/seasonal means —
    // but only as low-amplitude echoes)
    val byResid = flagged.map(r =>
      r.getAs[Timestamp]("h") -> math.abs(r.getAs[Double]("resid")))
    val top = byResid.maxBy(_._2)
    assert(top._1 == hts(50), s"largest residual must be the spike, got $top")
    assert(byResid.filter(_._1 != hts(50)).forall(_._2 < top._2 * 0.6),
      "echo flags must stay well below the spike residual")
  }
}
