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

  override def all: Seq[GraftQuery] = Seq(q01, q02, q03)
}
