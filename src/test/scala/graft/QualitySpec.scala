package graft

import org.apache.spark.sql.functions._

import graft.ops.Quality
import graft.ops.Quality.Check

/** Specs for the lake-governance audits (SURVEY §2.9). */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("rowAudit: exact violation counts, null semantics explicit per " +
      "check, all checks fold into one pass over the input") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "O"), (2L, "F"), (null, "X"), (4L, null), (5L, "P"))
      .toDF("k", "st")
    val out = Quality.rowAudit(df, Seq(
        Check("k_not_null", col("k").isNull),
        // null-VIOLATES form: unknown domain membership is a violation
        Check("st_domain", !coalesce(col("st").isin("O", "F", "P"), lit(false))),
        // null-TOLERATED form: unknown range is not this check's problem
        Check("k_range", coalesce(!col("k").between(1, 4), lit(false)))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // st_domain: 'X' + the NULL st; k_range: only 5 (NULL k tolerated,
    // caught by k_not_null instead)
    assert(out == Map("k_not_null" -> ((1L, 5L)), "st_domain" -> ((2L, 5L)),
      "k_range" -> ((1L, 5L))), out)
    // one scan total: every check is a column in the same aggregate
    val plan = Quality.rowAudit(df, Seq(
        Check("a", col("k").isNull), Check("b", col("st").isNull)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1,
      s"adding a check must not add a scan:\n$plan")
  }

  test("uniqueAudit and fkAudit: duplicate keys and orphans counted " +
      "exactly, NULL child keys count as orphans") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq[java.lang.Long](1L, 1L, 2L, 9L, null).toDF("ck")
    val uq = Quality.uniqueAudit(child, Seq("ck"), "ck_unique").head()
    // 5 rows, distinct non-null {1,2,9} = 3 → countDistinct ignores null
    assert(uq.getString(0) == "ck_unique" && uq.getLong(1) == 2L)
    val fk = Quality.fkAudit(child, "ck", parent, "pk", "child_fk").head()
    assert(fk.getString(0) == "child_fk" && fk.getLong(1) == 2L &&
      fk.getLong(2) == 5L) // orphan 9L + the NULL key
  }

  test("kAnonymity flags only groups under k; keySkewHistogram buckets " +
      "per-key counts by floor(log2)") {
    val d = Seq(("en", "a"), ("en", "a"), ("en", "a"),
      ("en", "b"), ("de", "a")).toDF("lang", "src")
    val risk = Quality.kAnonymity(d, Seq(col("lang"), col("src")), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(risk == Set(("en", "b", 1L), ("de", "a", 1L)), risk)

    // keys with counts 1,1,2,7 → buckets 0(x2),1,2
    val rows = (Seq.fill(7)(10L) ++ Seq(20L, 20L, 30L, 40L)).toDF("k")
    val hist = Quality.keySkewHistogram(rows, "k")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(hist == Map(0L -> ((2L, 2L, 1L)), 1L -> ((1L, 2L, 2L)),
      2L -> ((1L, 7L, 7L))), hist)
  }

  test("StreamingQuality: per-batch audits fold to the one-shot audit " +
      "on the union; at-least-once replay is idempotent") {
    import graft.streaming.StreamingQuality
    val root = java.nio.file.Files.createTempDirectory("qgate").toString
    val checks = Seq(
      Check("k_not_null", col("k").isNull),
      Check("v_range", coalesce(!col("v").between(0, 100), lit(false))))
    def batchDf(rows: Seq[(java.lang.Long, java.lang.Long)]) =
      rows.toDF("k", "v")
    val b1 = batchDf(Seq((1L, 10L), (null, 20L), (3L, 500L)))
    val b2 = batchDf(Seq((4L, -5L), (5L, 50L)))
    StreamingQuality.foldBatch(b1, 1L, checks, root)
    StreamingQuality.foldBatch(b2, 2L, checks, root)
    def cur() = StreamingQuality.current(spark, root)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = cur()
    val oneShot = Quality.rowAudit(b1.unionByName(b2), checks)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == oneShot, s"incremental $got != one-shot $oneShot")
    assert(got == Map("k_not_null" -> ((1L, 5L)), "v_range" -> ((2L, 5L))))
    // replay batch 2: same totals, not double counts
    StreamingQuality.foldBatch(b2, 2L, checks, root)
    assert(cur() == got, "replay must be idempotent")
  }

  test("rowAuditBy: the grouped battery equals the flat audit run " +
      "per slice, slice for slice") {
    val checks = Seq(
      Check("k_not_null", col("k").isNull),
      Check("v_range", coalesce(!col("v").between(0, 100), lit(false))))
    val rows = Seq[(String, java.lang.Long, java.lang.Long)](
      ("a", 1L, 10L), ("a", null, 20L), ("b", 3L, 500L),
      ("b", 4L, -5L), ("c", 5L, 50L), ("c", null, -1L), ("c", 6L, 60L))
      .toDF("g", "k", "v")
    val grouped = graft.ops.Quality.rowAuditBy(rows, checks, Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val slices = Seq("a", "b", "c")
    val flat = slices.flatMap { g =>
      graft.ops.Quality.rowAudit(rows.filter(col("g") === g), checks)
        .collect()
        .map(r => (g, r.getString(0)) -> (r.getLong(1), r.getLong(2)))
    }.toMap
    assert(grouped == flat, s"grouped $grouped != per-slice flat $flat")
    assert(grouped(("b", "v_range")) == ((2L, 2L)))
  }

  test("StreamingQuality bootstrap: one-pass prefix states equal " +
      "sequential folds version-for-version; fold replay over " +
      "bootstrap idempotent") {
    import graft.streaming.StreamingQuality
    val base = java.nio.file.Files.createTempDirectory("qboot")
    val checks = Seq(
      Check("k_not_null", col("k").isNull),
      Check("v_range", coalesce(!col("v").between(0, 100), lit(false))))
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (null, 20L), (3L, 500L), (4L, -5L), (5L, 50L),
      (6L, 60L), (null, -1L)).toDF("k", "v")
    val batchOf = pmod(coalesce(col("k"), lit(0L)), lit(3))
    val seqDir = base.resolve("seq").toString
    for (b <- Seq(0, 1, 2))
      StreamingQuality.foldBatch(rows.filter(batchOf === b), b, checks, seqDir)
    val bDir = base.resolve("boot").toString
    StreamingQuality.bootstrap(rows, batchOf, checks, bDir,
      batches = Seq(0L, 1L, 2L))
    def st(root: String, v: Long) =
      spark.read.parquet(s"$root/v=$v").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (v <- 0L to 2L)
      assert(st(bDir, v) == st(seqDir, v),
        s"bootstrap prefix state v=$v differs from the sequential fold")
    // the real fold path replays batch 1 over the bootstrapped state
    StreamingQuality.foldBatch(rows.filter(batchOf === 1), 1, checks, bDir)
    for (v <- 0L to 2L)
      assert(st(bDir, v) == st(seqDir, v),
        s"state v=$v differs after replay over bootstrap")
  }

  // ---- distributionDrift (round 5) -----------------------------------

  test("distributionDrift: disjoint halves give tvd=1/chisq=1, " +
      "identical halves give 0/0 (hand-computed, rational arithmetic)") {
    import spark.implicits._
    // key a: ref all in bucket 0 (value 5), cur all in bucket 1 (25)
    val a = (0L until 10L).map(i => ("a", i, 5.0)) ++
      (100L until 110L).map(i => ("a", i, 25.0))
    // key b: same distribution both halves (half bucket 0, half bucket 1)
    val b = (0L until 10L).map(i => ("b", i, if (i % 2 == 0) 5.0 else 25.0)) ++
      (100L until 110L).map(i => ("b", i, if (i % 2 == 0) 5.0 else 25.0))
    val df = (a ++ b).toDF("event_type", "sec", "value")
      .select(col("event_type"), timestamp_seconds(col("sec")).as("ts"),
        col("value"))
    val got = Quality.distributionDrift(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
    // mid = floor((0+109)/2) = 54 -> ref is sec <= 54
    // a: p=(1,0), q=(0,1): tvd = 0.5*(1+1) = 1; chi = (0-1)^2/1 = 1
    assert(got("a") == ((10L, 10L, 1.0, 1.0)), s"got ${got("a")}")
    assert(got("b") == ((10L, 10L, 0.0, 0.0)), s"got ${got("b")}")
  }

  test("distributionDrift: null values excluded, q=0 buckets count " +
      "toward tvd but not chi-square") {
    import spark.implicits._
    // ref: buckets {0:2, 1:2}; cur: bucket {1:4} -> bucket 0 has q=0
    val rows = Seq(("k", 0L, Some(5.0)), ("k", 1L, Some(5.0)),
      ("k", 2L, Some(25.0)), ("k", 3L, Some(25.0)), ("k", 4L, None),
      ("k", 100L, Some(25.0)), ("k", 101L, Some(25.0)),
      ("k", 102L, Some(25.0)), ("k", 103L, Some(25.0)))
    val df = rows.toDF("event_type", "sec", "value")
      .select(col("event_type"), timestamp_seconds(col("sec")).as("ts"),
        col("value"))
    val r = Quality.distributionDrift(df).collect()(0)
    // p=(0.5,0.5), q=(0,1): tvd = 0.5*(0.5+0.5) = 0.5
    // chi: bucket0 q=0 -> 0; bucket1 (0.5-1)^2/1 = 0.25
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.25,
      s"got ${r.getDouble(4)}, ${r.getDouble(5)}")
  }
}
