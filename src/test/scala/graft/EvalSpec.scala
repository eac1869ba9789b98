package graft

import org.apache.spark.sql.functions._

import graft.meteo.RetryLadder
import graft.ops.{Association, Behavior, Eval, Ranking, Resample, Similarity, Splits}

/** Round-5 additions: rank-sum AUC, calibration, k-fold, basket rules,
  * event n-grams, autocorrelation, CUSUM, IVF range search, the retry
  * ladder — and the Ranking determinism regression the round was
  * actually about. */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Ranking soundness regression (round-5 root cause) ----

  test("globalRank survives pruned-payload branch divergence: ranks are " +
      "a contiguous permutation even when the offsets branch prunes " +
      "columns the window branch keeps") {
    // the q51 shape that broke the old repartitionByRange construction:
    // a payload column (__y) the offsets branch prunes away, plus a
    // broadcast count join downstream — 15k distinct doubles
    val n = 15000
    val df = spark.range(n).select(
      (hash(col("id")).cast("double") / 7.0).as("s"),
      col("id").as("tb"),
      (col("id") % 3).as("payload"))
    val ranked = Ranking.globalRank(df, Seq(col("s"), col("tb")), "rk")
    val total = ranked.agg(count(lit(1))).head().getLong(0)
    val distinct = ranked.select("rk").distinct().count()
    val mx = ranked.agg(max("rk"), min("rk")).head()
    assert(total == n && distinct == n)
    assert(mx.getLong(0) == n && mx.getLong(1) == 1L)
    // composed form: equal-count bins must be EXACTLY equal
    val bins = Eval.calibrationBins(df, col("s"), col("payload") === 0,
        col("tb"), buckets = 10)
      .select("n").as[Long].collect().toSeq
    assert(bins == Seq.fill(10)(1500L), s"uneven bins: $bins")
  }

  test("globalRank handles desc + nulls ordering in the boundary fold") {
    val df = Seq[(java.lang.Double, Long)](
      (3.0, 1L), (null, 2L), (1.0, 3L), (2.0, 4L), (null, 5L), (9.0, 6L))
      .toDF("v", "id")
    val got = Ranking.globalRank(df, Seq(col("v").desc, col("id")), "rk")
      .orderBy("rk").select("id").as[Long].collect().toSeq
    // desc → NULLS LAST by default: 9,3,2,1 then nulls by id
    assert(got == Seq(6L, 1L, 4L, 3L, 2L, 5L))
  }

  // ---- AUC ----

  test("aucRankSum matches the hand-computed tie-aware AUC") {
    // pos scores {3, 2}, neg {1, 2}: pairs (3>1)=1 (3>2)=1 (2>1)=1
    // (2=2)=0.5 → U=3.5 of 4 → AUC 0.875, u2=7
    val df = Seq((3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)).toDF("s", "y")
    val r = Eval.aucRankSum(df, col("s"), col("y") === 1).head()
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Long]("u2") == 7L)
    assert(math.abs(r.getAs[Double]("auc") - 0.875) < 1e-12)
  }

  test("aucRankSum: perfect separation gives 1.0, reversed gives 0.0") {
    val perfect = Seq((5.0, 1), (4.0, 1), (1.0, 0), (2.0, 0)).toDF("s", "y")
    assert(Eval.aucRankSum(perfect, col("s"), col("y") === 1)
      .head().getAs[Double]("auc") == 1.0)
    val reversed = Seq((1.0, 1), (2.0, 1), (5.0, 0), (4.0, 0)).toDF("s", "y")
    assert(Eval.aucRankSum(reversed, col("s"), col("y") === 1)
      .head().getAs[Double]("auc") == 0.0)
  }

  test("groupedAucRankSum: independent per-slice rank sums — perfect, " +
      "reversed, tied, and single-class slices in one pass") {
    val df = Seq(
      ("A", 1.0, 0), ("A", 2.0, 0), ("A", 3.0, 1),   // perfect → 1.0
      ("B", 1.0, 1), ("B", 2.0, 0),                   // reversed → 0.0
      ("D", 1.0, 1), ("D", 1.0, 0),                   // one tied pair → 0.5
      ("C", 1.0, 1), ("C", 2.0, 1))                   // single class → NULL
      .toDF("g", "s", "y")
    val got = Eval.groupedAucRankSum(df, col("g"), col("s"), col("y") === 1)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(r.fieldIndex("auc"))) None
         else Some(r.getAs[Double]("auc")))).toMap
    assert(got == Map("A" -> Some(1.0), "B" -> Some(0.0),
      "D" -> Some(0.5), "C" -> None), s"got $got")
    // every slice agrees with the global operator run on it alone
    for (g <- Seq("A", "B", "D")) {
      val solo = Eval.aucRankSum(df.filter(col("g") === g),
        col("s"), col("y") === 1).head().getAs[Double]("auc")
      assert(got(g).contains(solo), s"slice $g diverged from global form")
    }
  }

  // ---- k-fold ----

  test("kfold: every group lands whole in one fold, assignment is stable") {
    val df = spark.range(1000).select(
      (col("id") % 37).as("g"), col("id"))
    val folds = Splits.kfold(df, "g", k = 5)
    val perGroup = folds.groupBy("g")
      .agg(countDistinct("fold").as("nf"))
      .agg(max("nf")).head().getLong(0)
    assert(perGroup == 1L, "a group straddled folds")
    val again = Splits.kfold(df, "g", k = 5)
    assert(folds.select("g", "fold").distinct()
      .except(again.select("g", "fold").distinct()).count() == 0)
    assert(folds.select("fold").distinct().count() == 5)
  }

  // ---- basket rules ----

  test("basketRules: supports, confidence, lift and the basket cap") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b,c} 5:{a,b} and a mega
    // basket 9 wider than the cap that must vanish from ALL counts
    val rows = Seq(
      (1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"),
      (3, "c"), (4, "b"), (4, "c"), (5, "a"), (5, "b")) ++
      (1 to 5).map(i => (9, s"x$i"))
    val df = rows.toDF("b", "i")
    val out = Association.basketRules(df, "b", "i",
      minSupport = 2, maxBasket = 4).collect()
    val ab = out.find(r => r.getAs[String]("item_a") == "a" &&
      r.getAs[String]("item_b") == "b").get
    assert(ab.getAs[Long]("support_ab") == 3L)
    assert(ab.getAs[Long]("support_a") == 4L)
    assert(ab.getAs[Long]("support_b") == 4L)
    assert(math.abs(ab.getAs[Double]("confidence") - 0.75) < 1e-12)
    // lift = 3·5 / (4·4)
    assert(math.abs(ab.getAs[Double]("lift") - 15.0 / 16.0) < 1e-12)
    assert(!out.exists(r => r.getAs[String]("item_a").startsWith("x")),
      "capped basket leaked into pairs")
  }

  test("basketRules: packed-pair counting (integral ids) equals the " +
      "struct path on every column") {
    val rows = Seq(
      (1, 7L), (1, 8L), (1, Int.MaxValue.toLong), (2, 7L), (2, 8L),
      (3, 8L), (3, Int.MaxValue.toLong))
    val df = rows.toDF("b", "i")
    def run(pack: Boolean) =
      Association.basketRules(df, "b", "i", minSupport = 1,
          maxBasket = 16, packPairs = pack)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
        .toSet
    val packed = run(true)
    assert(packed == run(false), "packed != struct path")
    assert(packed.exists(t => t._1 == 7L && t._2 == 8L && t._3 == 2L))
  }

  // ---- event n-grams ----

  test("eventNgrams counts planted per-user runs in (ts, id) order") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val df = Seq(
      (1L, ts(1), 11L, "v"), (1L, ts(2), 12L, "c"), (1L, ts(3), 13L, "p"),
      (2L, ts(1), 21L, "v"), (2L, ts(2), 22L, "c"), (2L, ts(3), 23L, "p"),
      (3L, ts(1), 31L, "v"), (3L, ts(2), 32L, "c"), (3L, ts(3), 33L, "e"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.eventNgrams(df, n = 3, k = 5).collect()
    assert(got.head.getAs[String]("ngram") == "v>c>p")
    assert(got.head.getAs[Long]("n_runs") == 2L)
    assert(got.map(_.getAs[String]("ngram")).contains("v>c>e"))
    // cross-user sequences must never merge
    assert(got.map(_.getAs[Long]("n_runs")).sum == 3L)
  }

  // ---- autocorrelation / CUSUM ----

  test("autocorr: planted alternating series has negative lag-1, " +
      "positive lag-2 correlation") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 48).map { h =>
      ("a", new java.sql.Timestamp(t0.getTime + h * 3600000L),
        if (h % 2 == 0) 10.0 else -10.0)
    }
    val df = rows.toDF("event_type", "ts", "value")
    val acf = Resample.autocorr(df, maxLag = 2).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    assert(acf(1L) < -0.9, s"lag1 ${acf(1L)}")
    assert(acf(2L) > 0.9, s"lag2 ${acf(2L)}")
  }

  test("cusumChangepoint finds the hour of a planted level shift") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def hts(h: Int) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    // 24 hours at 0, then 24 hours at 10 — |cusum| peaks at the last
    // pre-shift hour (h=23)
    val rows = (0 until 48).map(h => ("a", hts(h),
      if (h < 24) 0.0 else 10.0))
    val got = Resample.cusumChangepoint(rows.toDF("event_type", "ts", "value"))
      .head()
    assert(got.getAs[java.sql.Timestamp]("change_h") == hts(23))
    assert(got.getAs[Long]("n_cells") == 48L)
  }

  // ---- IVF range search ----

  test("ivfRangeSearch with all cells probed equals the brute-force " +
      "radius scan; fewer probes give a subset") {
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 5)
    val cents = embs.filter(col("vec_id") < 8)
    val tau = 0.2
    val full = Similarity.ivfRangeSearch(embs, queries, cents, tau,
      nProbe = 8).select("query_id", "neighbor_id")
    val brute = Similarity.bruteForceTopK(embs, queries, k = 100000)
      .filter(col("cosine") >= tau).select("query_id", "neighbor_id")
    assert(full.except(brute).count() == 0 && brute.except(full).count() == 0)
    val probed = Similarity.ivfRangeSearch(embs, queries, cents, tau,
      nProbe = 2).select("query_id", "neighbor_id")
    assert(probed.except(full).count() == 0, "probe subset exceeded full scan")
  }

  // ---- retry ladder ----

  private final class Scripted(script: Seq[RetryLadder.Attempt])
      extends RetryLadder.Transport {
    var calls = 0
    var headersSeen: List[Map[String, String]] = Nil
    def request(method: String, url: String, params: Map[String, String],
        headers: Map[String, String]): RetryLadder.Attempt = {
      headersSeen = headers :: headersSeen
      val r = script(math.min(calls, script.size - 1))
      calls += 1
      r
    }
  }
  private def ok(body: String = "{}") =
    Right(RetryLadder.Response(200, Map.empty, body))
  private def status(s: Int, h: Map[String, String] = Map.empty) =
    Right(RetryLadder.Response(s, h, ""))

  test("retry ladder: urllib3 schedule on the forcelist, success passes " +
      "through, User-Agent on every attempt") {
    val t = new Scripted(Seq(status(503), status(502), ok()))
    var waits = List.empty[Double]
    val out = RetryLadder.execute(t, "GET", "u", Map.empty, "graft/1.0")(
      w => waits ::= w)
    assert(out.result.toOption.get.status == 200)
    assert(out.attempts == 3)
    // first retry immediate (0), second waits 0.5·2^1 = 1.0
    assert(out.waitsSeconds == Seq(0.0, 1.0))
    assert(waits.reverse == List(1.0)) // zero waits don't sleep
    assert(t.headersSeen.forall(_("User-Agent") == "graft/1.0"))
  }

  test("retry ladder: Retry-After overrides computed backoff") {
    val t = new Scripted(Seq(
      status(503, Map("Retry-After" -> "7")), ok()))
    val out = RetryLadder.execute(t, "GET", "u", Map.empty, "ua")(_ => ())
    assert(out.waitsSeconds == Seq(7.0))
  }

  test("retry ladder: budget exhaustion returns the LAST response " +
      "(raise_on_status=False) after exactly 5 retries") {
    val t = new Scripted(Seq.fill(10)(status(500)))
    val out = RetryLadder.execute(t, "GET", "u", Map.empty, "ua")(_ => ())
    assert(out.attempts == 6) // 1 initial + 5 retries
    assert(out.result.toOption.get.status == 500)
  }

  test("retry ladder: non-GET never retries; transport errors do") {
    val t = new Scripted(Seq(status(503), ok()))
    val post = RetryLadder.execute(t, "POST", "u", Map.empty, "ua")(_ => ())
    assert(post.attempts == 1 && post.result.toOption.get.status == 503)
    val t2 = new Scripted(Seq(
      Left(new java.io.IOException("conn reset")), ok()))
    val conn = RetryLadder.execute(t2, "GET", "u", Map.empty, "ua")(_ => ())
    assert(conn.attempts == 2 && conn.result.isRight)
  }

  test("retry ladder: non-forcelist errors (404) return immediately") {
    val t = new Scripted(Seq(status(404), ok()))
    val out = RetryLadder.execute(t, "GET", "u", Map.empty, "ua")(_ => ())
    assert(out.attempts == 1 && out.result.toOption.get.status == 404)
  }

  // ---- knn graph + pareto ----

  test("knnGraph: mutual flag is exactly edge-reciprocity; probing " +
      "all cells reproduces brute-force edges") {
    val embs = Tables.embeddings(spark, sfDir)
    val cents = embs.filter(col("vec_id") < 8)
    val g = Similarity.knnGraph(embs, cents, nProbe = 8, k = 3)
    val edges = g.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = g.filter(col("mutual")).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual == edges.filter { case (a, b) => edges((b, a)) },
      "mutual must equal reciprocity over the edge set")
    // probe-all == per-query brute-force top-3
    val brute = Similarity.bruteForceTopK(embs, embs, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == brute, "all-cells knn graph must equal brute force")
  }

  test("paretoCurve: bands partition the customers, revenue adds up, " +
      "cumulative share is monotone and ends at 1") {
    val orders = Tables.orders(spark, sfDir)
    val bands = graft.ops.Behavior.paretoCurve(orders).collect()
    assert(bands.map(_.getAs[Long]("band")).toSeq == (1L to 10L))
    val nCust = orders.select("o_custkey").distinct().count()
    assert(bands.map(_.getAs[Long]("n_cust")).sum == nCust)
    val shares = bands.map(_.getAs[Double]("cum_share")).toSeq
    assert(shares == shares.sorted, "cum_share must be monotone")
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // concentration: the top band out-earns the bottom band
    // (revenue is exact decimal internally, double at the output edge)
    assert(bands.head.getAs[Double]("revenue") >
      bands.last.getAs[Double]("revenue"))
  }

  test("tripletMine: positives are a cyclic same-label bijection, " +
      "negatives are wrong-label, assembly is deterministic") {
    val embs = Tables.embeddings(spark, sfDir)
    val cents = embs.filter(col("vec_id") < 8)
    val t = Similarity.tripletMine(embs, cents).collect()
    assert(t.nonEmpty)
    val labels = embs.select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- t) {
      val (a, p, ng) = (r.getAs[Long]("anchor_id"),
        r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))
      assert(a != p, "anchor paired with itself")
      assert(labels(a) == labels(p), "positive label mismatch")
      assert(labels(a) != labels(ng), "negative shares the label")
    }
    // cyclic bijection: within a label every vector is someone's
    // positive exactly once (labels here all have >= 2 members)
    val posCounts = t.groupBy(_.getAs[Long]("pos_id")).view.mapValues(_.size)
    assert(posCounts.values.forall(_ == 1),
      "cyclic positive must be a bijection")
    val again = Similarity.tripletMine(embs, cents).collect()
    assert(t.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "triplet assembly must be deterministic")
  }

  test("RangeBucketCount native range-id equals the HOF fold across " +
      "directions, null orders and mixed types") {
    val df = Seq[(java.lang.Double, String, Long)](
      (3.0, "b", 1L), (null, "a", 2L), (1.0, null, 3L), (2.0, "c", 4L),
      (null, "d", 5L), (9.0, "a", 6L), (2.0, "c", 7L))
      .toDF("v", "s", "id")
    val sortSpecs = Seq(
      Seq(col("v").asc_nulls_first, col("s"), col("id")),
      Seq(col("v").desc_nulls_last, col("s").desc, col("id")),
      Seq(col("s").asc_nulls_last, col("v").desc_nulls_first, col("id")))
    for (sorts <- sortSpecs) {
      val decomposed = sorts.map(Ranking.decompose)
      val fields = decomposed.map(_._1)
      val dirs = decomposed.map(d => (d._2, d._3))
      val bnd = Ranking.boundaryRow(df, fields, dirs, numRanges = 3)
      val native = org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.RangeBucketCount(
          org.apache.spark.sql.GraftColumnBridge.expression(col("__bnd")),
          fields.map(org.apache.spark.sql.GraftColumnBridge.expression),
          dirs.map(_._1), dirs.map(_._2)))
      val both = df.crossJoin(broadcast(bnd))
        .select(col("id"), native.as("n"),
          Ranking.pidViaHof(col("__bnd"), sorts).as("h"))
        .collect()
      assert(both.forall(r => r.getInt(1) == r.getInt(2)),
        s"native vs HOF diverged: ${both.mkString(",")}")
    }
  }

  // ---- degenerate inputs ----

  test("degenerate inputs: empty and singleton frames flow through the " +
      "rank, basket, growth and triplet paths without errors") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Long)].toDF("s", "tb")
    assert(Ranking.globalRank(empty, Seq(col("s"), col("tb")), "rk")
      .count() == 0L)
    val one = Seq((5.0, 1L)).toDF("s", "tb")
    val oneRanked = Ranking.globalRank(one, Seq(col("s"), col("tb")), "rk")
      .head()
    assert(oneRanked.getAs[Long]("rk") == 1L)
    assert(Association.basketRules(
      Seq.empty[(Long, String)].toDF("b", "i"), "b", "i").count() == 0L)
    // single user, single day: new on d, churned on d+1
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val g = Behavior.growthAccounting(Seq((7L, t0)).toDF("user_id", "ts"))
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_churned"))).toMap
    assert(g.values.map(_._1).sum == 1L && g.values.map(_._2).sum == 1L)
    // single-class AUC is NULL (no rankable pairs) — under ANSI mode an
    // unguarded division would throw DIVIDE_BY_ZERO and kill the job
    val oneClass = Seq((1.0, 1), (2.0, 1)).toDF("s", "y")
    val aucRow = Eval.aucRankSum(oneClass, col("s"), col("y") === 1).head()
    assert(aucRow.isNullAt(aucRow.fieldIndex("auc")))
  }

  test("recallAtK: exact self-comparison is 1.0, zero-overlap queries still appear") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L)).toDF("query_id", "neighbor_id")
    // query 1: 2/3 recovered; query 2: nothing recovered
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 98L), (2L, 97L), (2L, 96L)).toDF("query_id", "neighbor_id")
    val out = Eval.recallAtK(exact, approx).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (2L, 0.666667))
    assert(out(2L) == (0L, 0.0), "a fully-missed query must not vanish")
    val self = Eval.recallAtK(exact, exact).collect()
    assert(self.forall(_.getDouble(3) == 1.0))
    // on the real corpus: IVF nProbe=4 recall against brute force is
    // high but its top-k lists are NOT the exact ones (the metric
    // measures something non-trivial)
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = embs.filter(col("vec_id") < 10)
    val r = Eval.recallAtK(
      Similarity.bruteForceTopK(embs, q),
      Similarity.ivfTopK(embs, q, embs.filter(col("vec_id") < 16)))
      .agg(avg("recall")).head().getDouble(0)
    assert(r > 0.2 && r <= 1.0, s"IVF mean recall $r out of plausible band")
  }

  test("averagePrecision: hand-computed AP, perfect ranking = 1.0, " +
      "all-positives = 1.0") {
    import spark.implicits._
    // ranking by score desc: ranks 1..5 = labels 1,0,1,1,0
    // AP = (1/1 + 2/3 + 3/4) / 3 with per-term 6-decimal rounding
    val d = Seq((50.0, 1L, true), (40.0, 2L, false), (30.0, 3L, true),
      (20.0, 4L, true), (10.0, 5L, false)).toDF("sc", "id", "lab")
    val got = graft.ops.Eval.averagePrecision(
      d, col("sc"), col("lab"), col("id")).head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 5L)
    val exp = ((BigDecimal(1.0) +
        BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP) +
        BigDecimal(0.75)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got.getDouble(2) - exp) < 1e-9,
      s"ap ${got.getDouble(2)} != $exp")
    // perfect ranking: positives occupy the top ranks
    val perfect = Seq((9.0, 1L, true), (8.0, 2L, true), (1.0, 3L, false))
      .toDF("sc", "id", "lab")
    assert(graft.ops.Eval.averagePrecision(
      perfect, col("sc"), col("lab"), col("id")).head().getDouble(2) == 1.0)
    // degenerate: every row positive
    val allPos = Seq((2.0, 1L, true), (1.0, 2L, true)).toDF("sc", "id", "lab")
    assert(graft.ops.Eval.averagePrecision(
      allPos, col("sc"), col("lab"), col("id")).head().getDouble(2) == 1.0)
    // degenerate: zero positives — AP is a defined 0.0, never null
    // (a clean shard with no flagged rows is a legitimate input)
    val noPos = Seq((2.0, 1L, false), (1.0, 2L, false)).toDF("sc", "id", "lab")
    val zp = graft.ops.Eval.averagePrecision(
      noPos, col("sc"), col("lab"), col("id")).head()
    assert(zp.getLong(0) == 0L && !zp.isNullAt(2) && zp.getDouble(2) == 0.0)
  }

  test("prCurve: hand-computed confusion counts and ratios at every " +
      "cutoff; zero-positive corpus stays defined") {
    import spark.implicits._
    // 10 rows ranked by score desc = ids 1..10; positives at ranks
    // 1, 2, 7. bins=5 → cutoffs at ranks 2, 4, 6, 8, 10.
    val d = (1 to 10).map(i =>
        ((11 - i).toDouble, i.toLong, Set(1, 2, 7).contains(i)))
      .toDF("sc", "id", "lab")
    val got = graft.ops.Eval.prCurve(
        d, col("sc"), col("lab"), col("id"), bins = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 0L, 1L, 1.0, 0.666667, 0.8),
      (2L, 4L, 2L, 2L, 1L, 0.5, 0.666667, 0.571429),
      (3L, 6L, 2L, 4L, 1L, 0.333333, 0.666667, 0.444444),
      (4L, 8L, 3L, 5L, 0L, 0.375, 1.0, 0.545455),
      (5L, 10L, 3L, 7L, 0L, 0.3, 1.0, 0.461538)), got.mkString(", "))
    // zero positives: recall and F1 pinned to 0 (the AP convention)
    val noPos = (1 to 4).map(i => ((5 - i).toDouble, i.toLong, false))
      .toDF("sc", "id", "lab")
    val zp = graft.ops.Eval.prCurve(
        noPos, col("sc"), col("lab"), col("id"), bins = 2)
      .collect()
    assert(zp.forall(r => r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0 &&
      r.getDouble(7) == 0.0), zp.mkString(", "))
  }

  test("rankMetrics: closed-form MRR and NDCG on a hand-built list, " +
      "perfect retrieval scores 1.0, full miss scores 0") {
    import spark.implicits._
    // exact top-3 per query: neighbors by descending score 30,20,10
    val exact = Seq(
      (1L, 101L, 0.9), (1L, 102L, 0.8), (1L, 103L, 0.7),
      (2L, 201L, 0.9), (2L, 202L, 0.8), (2L, 203L, 0.7),
      (3L, 301L, 0.9), (3L, 302L, 0.8), (3L, 303L, 0.7)
    ).toDF("query_id", "neighbor_id", "cosine")
    // q1: perfect; q2: first hit at rank 2, one other hit at rank 3;
    // q3: zero hits
    val approx = Seq(
      (1L, 101L, 0.9), (1L, 102L, 0.8), (1L, 103L, 0.7),
      (2L, 999L, 0.95), (2L, 202L, 0.8), (2L, 201L, 0.7),
      (3L, 901L, 0.9), (3L, 902L, 0.8), (3L, 903L, 0.7)
    ).toDF("query_id", "neighbor_id", "cosine")
    val got = graft.ops.Eval.rankMetrics(exact, approx).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(got(1L) == ((3L, 1.0, 1.0)), s"q1: ${got(1L)}")
    // q2: hits at approx ranks 2,3 → mrr 0.5,
    // dcg = g(2)+g(3) = 0.630930+0.5; idcg = g(1)+g(2)+g(3)
    val g = (r: Int) => BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ndcg2 = BigDecimal((g(2) + g(3)) / (g(1) + g(2) + g(3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L)._1 == 2L && got(2L)._2 == 0.5, s"q2: ${got(2L)}")
    assert(math.abs(got(2L)._3 - ndcg2) < 1e-9, s"q2 ndcg: ${got(2L)._3}")
    assert(got(3L) == ((0L, 0.0, 0.0)), s"q3: ${got(3L)}")
  }
}
