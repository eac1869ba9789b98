package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: 10× scale-up stress for the round-2 operators (the SURVEY
  * §4 "would this survive a scale-up" check, measured rather than
  * argued). Replicates the sf0.1 tables 10× with shifted ids — and for
  * the time-series ops with NEW keys, so key cardinality scales with
  * data (the lake shape: more stations, not denser ones).
  *
  * Usage: runMain graft.Stress [sfDir]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep10(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 10).map(i => shift(df, i)).reduce(_ unionByName _)

    val ev = Tables.events(spark, sfDir)
    val ev10 = rep10(ev) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L))
        .withColumn("event_type", concat(col("event_type"), lit(s"_$i")))
    }
    val docs10 = rep10(Tables.documents(spark, sfDir)) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }
    val orders10 = rep10(Tables.orders(spark, sfDir)) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
    }

    def time(name: String)(action: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = action
      println(f"STRESS $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("gapfill_10x") {
      ops.Resample.gapfillLinear(ev10, "event_type", "ts", "value").count()
    }
    time("outliers_10x") {
      ops.Outliers.robustZ(ev10, "event_type", "value", "event_id", 3.0).count()
    }
    time("chunk_dedup_10x") {
      ops.Dedup.chunkDupFraction(docs10).count()
    }
    time("fuzzy_vocab_10x") {
      ops.FuzzyJoin.vocabPairs(docs10).count()
    }
    time("profile_10x") {
      ops.Profile.profile(orders10, Seq("o_orderkey", "o_custkey",
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
        .count()
    }
    time("merge_cdc_10x") {
      val changes = orders10.filter(col("o_orderkey") % 7 === 0)
        .withColumn("op", when(col("o_orderkey") % 3 === 0, "D").otherwise("U"))
        .withColumn("seq", lit(1))
      ops.Merge.applyChangeLog(orders10, changes, Seq("o_orderkey"), "op",
        col("seq")).count()
    }
    time("incr_rollup_10x") {
      ops.IncrementalAgg.finalize(
        ops.IncrementalAgg.merge(
          (0 until 4).map(r => ops.IncrementalAgg.state(
            ev10.filter(col("user_id") % 4 === r), Seq("event_type"), "value")),
          Seq("event_type")),
        Seq("event_type")).count()
    }
    // ---- round-3 operators ----
    time("surprisal_10x") {
      ops.TextAnalysis.unigramSurprisal(docs10).count()
    }
    time("bm25_10x") {
      ops.TextAnalysis.bm25(docs10, Seq("spark", "join", "vector", "the"))
        .count()
    }
    time("inverted_idx_10x") {
      ops.TextAnalysis.invertedIndex(docs10).count()
    }
    time("bpe_merges_10x") {
      ops.TextAnalysis.bpeMerges(docs10).count()
    }
    time("epoch_shuffle_10x") {
      ops.Splits.epochShuffle(docs10, "doc_id", 1).count()
    }
    time("curriculum_10x") {
      ops.Splits.curriculum(
        ops.TextAnalysis.qualityScore(docs10).select("doc_id", "quality"),
        "doc_id", "quality").count()
    }
    time("quantiles_10x") {
      // 10× rows AND 10× groups via the replicated event types
      ops.Quantiles.groupQuantiles(
        ev10.select(col("event_type").as("k"),
          col("value").cast("double").as("x"), col("event_id")),
        "k", "x", Seq("event_id"), Seq(0.25, 0.5, 0.75)).count()
    }
    time("pagerank_10x") {
      // 10× events; the replicated suffix keeps the graph 10× wider too
      ops.Graph.pagerank(ops.Graph.transitionEdges(ev10)).count()
    }
    // ---- round-4 (session 3) operators ----
    time("sorted_nbhd_10x") {
      // replicas are identical texts with shifted ids → every doc gains
      // 9 sort-adjacent twins; candidates stay N·window by construction
      ops.Dedup.sortedNeighborhood(docs10).count()
    }
    time("bigram_surp_10x") {
      ops.TextAnalysis.bigramSurprisal(docs10).count()
    }
    time("grouped_hh_10x") {
      val occ = docs10.select(col("source"),
          explode(graft.functions.Hashing.tokens(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
      ops.Sketches.groupedHeavyHitters(occ, "source", "token", 450L).count()
    }
    time("triangles_10x") {
      ops.Graph.triangles(ops.Graph.transitionEdges(ev10)).count()
    }
    time("snapshot_diff_10x") {
      val fp = graft.functions.Hashing.hash60(concat_ws("|",
        col("o_orderstatus"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("string")))
      val nw = orders10.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
      ops.Reconcile.changeFeed(orders10.filter(col("o_orderkey") % 10 =!= 0),
        nw, Seq("o_orderkey"), fp).count()
    }
    time("ewma_10x") {
      // 10× rows AND 10× series via the replicated event types
      ops.Resample.ewmaHalf(ev10, "event_type", "ts", "value").count()
    }
    time("survivorship_10x") {
      ops.Dedup.survivorship(docs10).count()
    }
    time("active_users_10x") {
      // 10× users; the day span stays fixed (denser days — the lake shape)
      ops.Behavior.activeUsers(ev10).count()
    }
    // ---- round-5 operators ----
    time("auc_10x") {
      // 10× scored rows; distinct scores scale with rows — the prefix
      // sum over distinct scores is the part that must stay parallel
      ops.Eval.aucRankSum(orders10, col("o_totalprice"),
        col("o_orderstatus") === "F").count()
    }
    time("calibration_10x") {
      ops.Eval.calibrationBins(orders10, col("o_totalprice"),
        col("o_orderstatus") === "F", col("o_orderkey")).count()
    }
    time("rfm_10x") {
      // 10× customers via the shifted custkeys riding the order shift
      ops.Behavior.rfmSegments(orders10.withColumn("o_custkey",
        col("o_custkey") + expr("o_orderkey div 100000000") *
          lit(10000000L))).count()
    }
    time("basket_10x") {
      // 10× baskets over the same item universe — pair supports grow,
      // wedge mass stays Σ C(basket_width, 2) per basket
      val li10 = rep10(Tables.lineitem(spark, sfDir)) { (d, i) =>
        d.withColumn("l_orderkey",
          col("l_orderkey") + lit(i.toLong * 100000000L))
      }
      ops.Association.basketRules(li10, "l_orderkey", "l_partkey",
        minSupport = 3, maxBasket = 16).count()
    }
    time("event_ngrams_10x") {
      // 10× users → 10× windows, same per-user history length
      ops.Behavior.eventNgrams(ev10, n = 3, k = 20).count()
    }
    time("autocorr_10x") {
      // 10× keys (replicated event types) → 10× grid cells
      ops.Resample.autocorr(ev10).count()
    }
    time("changepoint_10x") {
      ops.Resample.cusumChangepoint(ev10).count()
    }
    time("growth_10x") {
      // 10× users, fixed day span (denser days)
      ops.Behavior.growthAccounting(ev10).count()
    }
    time("pareto_10x") {
      ops.Behavior.paretoCurve(orders10).count()
    }
    time("anomaly_10x") {
      // 10× keys → 10× grids; windows stay grid-sized
      ops.Resample.seasonalAnomalies(ev10).count()
    }
    time("lttb_10x") {
      ops.Resample.lttbDownsample(ev10).count()
    }
    spark.stop()
  }
}
