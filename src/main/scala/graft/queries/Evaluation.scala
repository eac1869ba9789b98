package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftQuery, QueryPack, Tables}
import graft.ops.{Association, Behavior, Eval, Splits}

/** SURVEY.md §2.9 — model-evaluation and mining surface added in
  * round 5: rank-sum AUC, calibration bins, group-aware k-fold,
  * market-basket rules, and event-sequence n-grams. Everything is
  * engine-exact (integer/decimal aggregates, IEEE division only on
  * exact operands) so every entry is oracle-gated.
  */
object Evaluation extends QueryPack {

  /** Tie-aware Mann-Whitney AUC: o_totalprice as the "score" for the
    * binary outcome "order finalized" (o_orderstatus = 'F'). 2U is an
    * exact integer; AUC one IEEE division. */
  val q50Auc = GraftQuery(
    "q50_auc",
    Some("""
      WITH s AS (
        SELECT o_totalprice AS sc,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pos,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS neg
        FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
      c AS (
        SELECT pos, neg,
               COALESCE(SUM(neg) OVER (ORDER BY sc
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS negbelow
        FROM s)
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(SUM(pos * (2 * negbelow + neg)) AS BIGINT) AS u2,
             CAST(SUM(pos * (2 * negbelow + neg)) AS DOUBLE) /
               (2.0 * SUM(pos) * SUM(neg)) AS auc
      FROM c""".stripMargin.trim)) { (spark, dir) =>
    Eval.aucRankSum(Tables.orders(spark, dir),
      col("o_totalprice"), col("o_orderstatus") === "F")
  }

  /** Sliced evaluation: q50's exact rank-sum AUC per order priority —
    * the per-segment model audit (does the score discriminate equally
    * across cohorts?). One map-side-combined (group, score) collapse;
    * the negative prefix runs per group over distinct scores (see
    * [[graft.ops.Eval.groupedAucRankSum]] for the giant-slice
    * alternative). */
  val q61GroupAuc = GraftQuery(
    "q61_group_auc",
    Some("""
      WITH b AS (
        SELECT o_orderpriority AS grp, o_totalprice AS s,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pos,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS neg
        FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2),
      c AS (
        SELECT grp, pos, neg,
               SUM(neg) OVER (PARTITION BY grp ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - neg AS negbelow
        FROM b)
      SELECT grp, CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(SUM(pos * (2 * negbelow + neg)) AS BIGINT) AS u2,
             CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
               CAST(SUM(pos * (2 * negbelow + neg)) AS DOUBLE) /
                 (2.0 * SUM(pos) * SUM(neg)) END AS auc
      FROM c GROUP BY grp ORDER BY grp""".stripMargin.trim)) { (spark, dir) =>
    Eval.groupedAucRankSum(Tables.orders(spark, dir),
        col("o_orderpriority"), col("o_totalprice"),
        col("o_orderstatus") === "F")
      .orderBy("grp")
  }

  /** Average precision on the same score/outcome pair — the PR-curve
    * summary (rank-sum form, decimal-summed precisions; the ROC AUC's
    * imbalance-robust twin). */
  val q56AvgPrecision = GraftQuery(
    "q56_avg_precision",
    Some("""
      WITH b AS (
        SELECT o_totalprice AS sc, o_orderkey AS tb,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders WHERE o_totalprice IS NOT NULL),
      r AS (
        SELECT y, ROW_NUMBER() OVER (ORDER BY sc DESC, tb) AS rk,
               SUM(y) OVER (ORDER BY sc DESC, tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
        FROM b),
      t AS (SELECT COUNT(*) AS n FROM b),
      p AS (SELECT COUNT(*) AS n_pos,
          SUM(CAST(ROUND(CAST(tp AS DOUBLE)/rk, 6) AS DECIMAL(18,6))) AS s
        FROM r WHERE y = 1)
      SELECT CAST(p.n_pos AS BIGINT) AS n_pos, CAST(t.n AS BIGINT) AS n,
        CASE WHEN p.n_pos = 0 THEN 0.0
             ELSE ROUND(CAST(p.s AS DOUBLE) / p.n_pos, 6) END AS avg_precision
      FROM p, t""".stripMargin.trim)) { (spark, dir) =>
    Eval.averagePrecision(Tables.orders(spark, dir),
      col("o_totalprice"), col("o_orderstatus") === "F", col("o_orderkey"))
  }

  /** Precision/recall curve at decile rank cutoffs over the same
    * score/outcome pair — the operating-point view (round 9): each
    * decile boundary is a candidate decision threshold; confusion
    * counts are pure integer rank math, the three ratios fixed-order
    * IEEE divisions, F1's 0/0 edge pinned to 0. */
  val q57PrCurve = GraftQuery(
    "q57_pr_curve",
    Some("""
      WITH b AS (
        SELECT o_totalprice AS sc, o_orderkey AS tb,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders WHERE o_totalprice IS NOT NULL),
      r AS (
        SELECT y, ROW_NUMBER() OVER (ORDER BY sc DESC, tb) AS rk,
               SUM(y) OVER (ORDER BY sc DESC, tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               COUNT(*) OVER () AS n,
               SUM(y) OVER () AS n_pos
        FROM b),
      g AS (
        SELECT ((rk - 1) * 10) // n + 1 AS bin, MAX(rk) AS cut,
               MAX_BY(tp, rk) AS tp, MAX(n_pos) AS n_pos
        FROM r GROUP BY 1)
      SELECT CAST(bin AS BIGINT) AS bin, CAST(cut AS BIGINT) AS cut_rank,
        CAST(tp AS BIGINT) AS tp, CAST(cut - tp AS BIGINT) AS fp,
        CAST(n_pos - tp AS BIGINT) AS fn,
        ROUND(CAST(tp AS DOUBLE) / cut, 6) AS prec,
        CASE WHEN n_pos = 0 THEN 0.0
             ELSE ROUND(CAST(tp AS DOUBLE) / n_pos, 6) END AS recall,
        CASE WHEN tp = 0 THEN 0.0
             ELSE ROUND(2 * (CAST(tp AS DOUBLE) / cut) * (CAST(tp AS DOUBLE) / n_pos)
                    / (CAST(tp AS DOUBLE) / cut + CAST(tp AS DOUBLE) / n_pos), 6)
        END AS f1
      FROM g ORDER BY bin""".stripMargin.trim)) { (spark, dir) =>
    Eval.prCurve(Tables.orders(spark, dir),
      col("o_totalprice"), col("o_orderstatus") === "F", col("o_orderkey"))
  }

  /** Decile calibration of the same score/outcome pair: bins by pure
    * integer rank math over (score, orderkey), per bin exact counts +
    * decimal score sum + the two IEEE plot ratios. */
  val q51Calibration = GraftQuery(
    "q51_calibration",
    Some("""
      WITH b AS (
        SELECT o_totalprice AS sc, o_orderkey AS tb,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders WHERE o_totalprice IS NOT NULL),
      r AS (
        SELECT sc, y,
               ROW_NUMBER() OVER (ORDER BY sc, tb) AS rk,
               COUNT(*) OVER () AS n
        FROM b),
      g AS (
        SELECT (rk - 1) * 10 // n + 1 AS bin, COUNT(*) AS n,
               SUM(y) AS n_pos,
               CAST(SUM(CAST(sc AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS score_sum
        FROM r GROUP BY 1)
      SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
             CAST(n_pos AS BIGINT) AS n_pos,
             ROUND(CAST(score_sum AS DOUBLE), 6) AS score_sum,
             ROUND(CAST(score_sum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_score,
             CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate
      FROM g ORDER BY bin""".stripMargin.trim)) { (spark, dir) =>
    Eval.calibrationBins(Tables.orders(spark, dir),
      col("o_totalprice"), col("o_orderstatus") === "F", col("o_orderkey"))
  }

  /** Group-aware 5-fold assignment on the event log keyed by user —
    * every user's events share a fold. Gated on the per-fold census
    * (events + distinct users). */
  val dataKfold = GraftQuery(
    "data_kfold",
    Some("""
      WITH f AS (
        SELECT ('0x'||substr(md5('kfold:'||CAST(user_id AS VARCHAR)),1,15))::BIGINT % 5 AS fold,
               user_id
        FROM events)
      SELECT CAST(fold AS BIGINT) AS fold,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM f GROUP BY 1 ORDER BY 1""".stripMargin.trim)) { (spark, dir) =>
    Splits.kfold(Tables.events(spark, dir), "user_id", 5)
      .groupBy("fold")
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("user_id")).cast("long").as("n_users"))
      .orderBy("fold")
  }

  /** Market-basket rules over parts co-ordered in the same order:
    * support ≥ 3, basket width capped at 16 (the cap is part of the
    * gated semantics — the oracle replicates it). */
  val q52Basket = GraftQuery(
    "q52_basket",
    Some("""
      WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      kept AS (SELECT b FROM it GROUP BY b HAVING COUNT(*) <= 16),
      rel AS (SELECT it.b, it.i FROM it JOIN kept USING (b)),
      nb AS (SELECT COUNT(DISTINCT b) AS n FROM rel),
      supp AS (SELECT i, COUNT(*) AS s FROM rel GROUP BY 1),
      p AS (
        SELECT a.i AS item_a, b2.i AS item_b, COUNT(*) AS support_ab
        FROM rel a JOIN rel b2 ON a.b = b2.b AND a.i < b2.i
        GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      SELECT CAST(p.item_a AS BIGINT) AS item_a,
             CAST(p.item_b AS BIGINT) AS item_b,
             CAST(p.support_ab AS BIGINT) AS support_ab,
             CAST(sa.s AS BIGINT) AS support_a,
             CAST(sb.s AS BIGINT) AS support_b,
             CAST(p.support_ab AS DOUBLE) / CAST(sa.s AS DOUBLE) AS confidence,
             CAST(p.support_ab * nb.n AS DOUBLE) /
               CAST(sa.s * sb.s AS DOUBLE) AS lift
      FROM p JOIN supp sa ON sa.i = p.item_a
             JOIN supp sb ON sb.i = p.item_b
             CROSS JOIN nb
      ORDER BY item_a, item_b""".stripMargin.trim)) { (spark, dir) =>
    Association.basketRules(Tables.lineitem(spark, dir),
        "l_orderkey", "l_partkey", minSupport = 3, maxBasket = 16)
      .orderBy("item_a", "item_b")
  }

  /** Top-20 length-3 action runs per user ((ts, event_id) total order)
    * — the sequence-mining view of the event log. */
  val q53EventNgrams = GraftQuery(
    "q53_event_ngrams",
    Some("""
      WITH l AS (
        SELECT event_type,
               LAG(event_type, 2) OVER w AS e2,
               LAG(event_type, 1) OVER w AS e1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      g AS (
        SELECT e2 || '>' || e1 || '>' || event_type AS ngram, COUNT(*) AS n_runs
        FROM l WHERE e2 IS NOT NULL AND e1 IS NOT NULL
        GROUP BY 1)
      SELECT ngram, CAST(n_runs AS BIGINT) AS n_runs
      FROM g ORDER BY n_runs DESC, ngram LIMIT 20""".stripMargin.trim)) {
    (spark, dir) =>
      Behavior.eventNgrams(Tables.events(spark, dir), n = 3, k = 20)
  }

  override def all: Seq[GraftQuery] =
    Seq(q50Auc, q51Calibration, q56AvgPrecision, q57PrCurve, dataKfold,
      q52Basket, q53EventNgrams, q61GroupAuc)
}
