package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{GraftQuery, QueryPack, Tables}
import graft.functions.Exact._

/** SURVEY.md §2.2 — the relational query-engine surface.
  *
  * Shapes mirror the analytics the reference's dashboard/DB layer runs
  * (aggregation, dedup-by-key, recency windows: dashboard/queries.py,
  * dashboard/streamlit_app.py) generalized to the full set of operators a
  * Spark analytics engine must cover: multi-aggregate groupBy, pushdown
  * scans, broadcast/shuffle joins, semi/anti joins, ranked and running
  * windows, rollups, sessionization, time-window aggregation.
  *
  * Scale notes are per-query; everything is a declarative plan (Catalyst
  * does pushdown/pruning/partial agg) and every join states its intended
  * distribution strategy.
  */
object Relational extends QueryPack {

  /** Q1-style pricing summary: single shuffle, map-side partial agg,
    * decimal-exact money math. Grouping cardinality is tiny (6 groups), so
    * the reduce side is trivially small at any scale. */
  val q01 = GraftQuery(
    "q01_pricing_summary",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
             CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS DOUBLE) AS sum_disc_price,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
             ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
             CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim)) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactRoundSum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))), 2)
          .as("sum_disc_price"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Selective scan: predicate + projection must reach the parquet reader
    * (PushedFilters / ReadSchema) — at 100 TB this is the difference
    * between reading 4 columns of a slice and the whole table. */
  val q02 = GraftQuery(
    "q02_filter_project",
    Some("""
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00' AND l_quantity >= 45
      ORDER BY l_orderkey, l_linenumber
    """.stripMargin.trim)) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp") &&
        col("l_quantity") >= 45)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** TPC-H Q3 shape: customer (broadcastable dim at test SF; shuffle join
    * at 100 TB — Catalyst/AQE picks by size) ⋈ orders ⋈ lineitem, then
    * top-k via TakeOrderedAndProject (no global sort materialization). */
  val q03 = GraftQuery(
    "q03_join_agg_topk",
    Some("""
      SELECT o_orderkey, o_orderdate,
             CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    """.stripMargin.trim)) { (spark, dir) =>
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(exactRoundSum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_orderdate", "revenue")
  }

  /** Dimension broadcast join: part is small relative to lineitem at every
    * SF (classic star dim) — broadcast() avoids shuffling the fact table. */
  val q04 = GraftQuery(
    "q04_broadcast_join",
    Some("""
      SELECT p_brand,
             CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand
    """.stripMargin.trim)) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        exactRoundSum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** EXISTS as left-semi join: no right-side duplication, the probe table
    * never materializes matched rows — minimal shuffle payload. */
  val q05 = GraftQuery(
    "q05_semi_join",
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      ORDER BY c_custkey
    """.stripMargin.trim)) { (spark, dir) =>
    val cust = Tables.customer(spark, dir)
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000)
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** NOT EXISTS as left-anti join. */
  val q06 = GraftQuery(
    "q06_anti_join",
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      ORDER BY c_custkey
    """.stripMargin.trim)) { (spark, dir) =>
    val cust = Tables.customer(spark, dir)
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Top-N per group via ranked window; at scale this is the candidate for
    * the TopKPerKey physical operator (SURVEY §2.8) — a full sort per key
    * is wasteful when N is small. */
  val q07 = GraftQuery(
    "q07_window_topk",
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn
    """.stripMargin.trim)) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Running aggregate: decimal accumulator so the running sum is exact and
    * engine-order-independent (double accumulation would drift). */
  val q08 = GraftQuery(
    "q08_running_sum",
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey
    """.stripMargin.trim)) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Hierarchical ROLLUP; null grouping slots coalesced to a sentinel so
    * row identity is engine-neutral (no null-ordering ambiguity). */
  val q09 = GraftQuery(
    "q09_rollup",
    Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS DOUBLE) AS total_spend
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority
    """.stripMargin.trim)) { (spark, dir) =>
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        exactRoundSum(dec(col("o_totalprice")), 2).as("total_spend"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_spend"))
      .orderBy("status", "priority")
  }

  /** Gap-based sessionization: lag + cumulative flag sum — two windows over
    * one shuffle on user_id (same partitioning reused across both). */
  val q10 = GraftQuery(
    "q10_sessionize",
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """.stripMargin.trim)) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        exactSum(col("value")).as("session_value"))
      .select("user_id", "session_id", "n_events", "session_start",
        "session_end", "session_value")
      .orderBy("user_id", "session_id")
  }

  /** Tumbling time-window aggregate (batch analog of the streaming health
    * agg, SURVEY §2.7); epoch-aligned 6h buckets. */
  val q11 = GraftQuery(
    "q11_windowed_agg",
    Some("""
      SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2
    """.stripMargin.trim)) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        exactSum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Star-schema rollup: two tiny dims broadcast, one shuffle on the fact
    * join key, then low-cardinality agg. */
  val q12 = GraftQuery(
    "q12_multi_join_star",
    Some("""
      SELECT r_name, n_name,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS DOUBLE) AS total_spend
      FROM region
      JOIN nation   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """.stripMargin.trim)) { (spark, dir) =>
    val geo = broadcast(
      Tables.nation(spark, dir).join(
        broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey")))
    val custGeo = Tables.customer(spark, dir)
      .join(geo, col("c_nationkey") === col("n_nationkey"))
    Tables.orders(spark, dir)
      .join(custGeo, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        exactRoundSum(dec(col("o_totalprice")), 2).as("total_spend"))
      .orderBy("r_name", "n_name")
  }

  override def all: Seq[GraftQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12)
}
