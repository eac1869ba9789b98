package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ranking

/** Regression net for VERDICT r5 item 1 — the intermittent wrong-answer
  * in the two-phase rank path (driver-recorded q48_rfm/q51_calibration
  * hash mismatches). The r6 fix embeds the boundary array as a
  * plan-time literal, so the window branch and the offsets branch can
  * no longer disagree on a row's range id. This spec pins the two
  * properties that make that structural:
  *
  *   1. rank results are IDENTICAL across sessions with different
  *      shuffle-partition counts (different numRanges → different
  *      boundary arrays → same ranks — boundary-independence);
  *   2. every rank-consuming gated query returns byte-identical content
  *      when run twice in one JVM (the driver-sweep habitat).
  */
class DeterminismSpec extends SparkTestBase {

  /** Canonical content of a result: rows sorted by their full string
    * form — order-insensitive, value-exact. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(c => col(s"`$c`"))
    df.select(cols: _*).collect().map(_.toString()).sorted.toSeq
  }

  /** The gated queries whose output is a direct function of
    * Ranking.globalRank content (VERDICT r5: "every one of the 17
    * rank-consuming gated queries is weak" until pinned). */
  private val rankConsumers = Seq(
    "q48_rfm", "q51_calibration", "q50_auc", "q55_pareto",
    "data_curriculum", "data_epoch_shuffle", "data_quota",
    "data_sample_stratified", "text_vocab_stats", "ts_hampel",
    "q30_percentile_disc_mode", "q34_outliers", "ts_lttb",
    "dedup_sorted_neighborhood", "dedup_sorted_multi",
    "data_mix_temperature", "data_split", "data_triplets",
    "data_shard_balance", "q56_avg_precision", "search_rrf_fusion",
    "q57_pr_curve") // round 9: PR curve rides globalRankCumsum

  test("globalRank is a permutation of 1..n and equals the single-task " +
      "window for every numRanges (boundary-independence)") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 131) % 97, (i * 17) % 1000, i))
      .toDF("grp", "v", "id").repartition(7)
    val expected = df.orderBy(col("v").desc, col("id"))
      .select(col("id")).collect().map(_.getInt(0)).toSeq
    for (n <- Seq(1, 2, 5, 32)) {
      val ranked = Ranking.globalRank(df,
        Seq(col("v").desc, col("id")), "r", numRanges = n)
      val got = ranked.orderBy("r").select("id", "r").collect()
      assert(got.map(_.getLong(1)).toSeq == (1L to 500L).toSeq,
        s"numRanges=$n: ranks are not a permutation of 1..n")
      assert(got.map(_.getInt(0)).toSeq == expected,
        s"numRanges=$n: rank order diverges from the window ordering")
    }
  }

  test("globalRanksSharedSample: each rank equals its independent " +
      "globalRank (shared uniform sample only moves range balance, " +
      "never a rank)") {
    import spark.implicits._
    val df = (1 to 400).map(i => ((i * 131) % 97, (i * 17) % 50, i))
      .toDF("a", "b", "id").repartition(5)
    val sorts = Seq(
      (Seq(col("a"), col("id")), "r1"),
      (Seq(col("b").desc, col("id")), "r2"),
      (Seq(col("a").desc, col("b"), col("id")), "r3"))
    val shared = Ranking.globalRanksSharedSample(df, sorts)
    sorts.zip(shared).foreach { case ((sc, name), got) =>
      val want = Ranking.globalRank(df, sc, name)
        .orderBy(name).select("id").collect().map(_.getInt(0)).toSeq
      val have = got.orderBy(name).select("id").collect()
        .map(_.getInt(0)).toSeq
      assert(have == want, s"rank $name diverges under the shared sample")
    }
  }

  test("globalRankCumsum running sum matches the window form across " +
      "range counts") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i % 13, (i * 7) % 50, i))
      .toDF("k", "v", "id")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expected = df.withColumn("cum", sum(col("v")).over(w))
      .orderBy("v", "id").select("id", "cum").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    for (n <- Seq(1, 3, 16)) {
      val got = Ranking.globalRankCumsum(df, Seq(col("v"), col("id")),
        col("v").cast("long"), "r", "cum", numRanges = n)
        .orderBy("r").select("id", "cum").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(got == expected, s"numRanges=$n: running sum diverges")
    }
  }

  test("EVERY oracle-gated query is byte-identical across two runs in " +
      "one session — the whole-surface wrong-answer tripwire") {
    // the driver gate compares one run against DuckDB; this pins the
    // weaker-but-broader property that protects it — no gated query's
    // content may depend on run-to-run scheduling (sf0.001 keeps the
    // 145-query double sweep cheap)
    val gated = SparkEntry.oracleSql.keys.toSeq.sorted
    for (q <- gated) {
      val fn = SparkEntry.queries(q)
      val a = canon(fn(spark, sfDir))
      val b = canon(fn(spark, sfDir))
      assert(a == b, s"$q: two runs in one session diverge " +
        s"(first diff: ${a.zip(b).find(p => p._1 != p._2)})")
    }
  }

  test("rank-consuming gated queries are byte-identical across two runs " +
      "and across shuffle-partition counts (driver-sweep habitat)") {
    // two sessions over the shared context with DIFFERENT partition
    // counts: numRanges (and so the boundary literal) differ, results
    // must not
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.shuffle.partitions", "3")
    graft.plans.TopK.ensureRegistered(s3)
    val s7 = spark.newSession()
    s7.conf.set("spark.sql.shuffle.partitions", "7")
    graft.plans.TopK.ensureRegistered(s7)
    for (q <- rankConsumers.filter(SparkEntry.queries.contains)) {
      val fn = SparkEntry.queries(q)
      val a = canon(fn(s3, sfDir))
      val b = canon(fn(s7, sfDir))
      val a2 = canon(fn(s3, sfDir))
      assert(a == a2, s"$q: two runs in one session diverge")
      assert(a == b, s"$q: results differ between 3- and 7-partition " +
        s"sessions (first diff: ${a.zip(b).find(p => p._1 != p._2)})")
    }
  }
}
