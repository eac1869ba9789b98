package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational3

class Relational3Spec extends SparkTestBase {

  test("q24 grouping sets emits exactly the requested lattice") {
    val rows = Relational3.q24.run(spark, sfDir).collect()
    // (prio,status) + (prio) + grand total — no (status)-only stratum
    val strata = rows.map(r => (r.getAs[Long]("g_prio"), r.getAs[Long]("g_status")))
      .distinct.toSet
    assert(strata == Set((0L, 0L), (0L, 1L), (1L, 1L)), s"got $strata")
    val grand = rows.filter(_.getAs[Long]("g_prio") == 1L)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") ==
      Tables.orders(spark, sfDir).count())
    // each stratum's n sums to the grand total
    val perPrio = rows.filter(r =>
      r.getAs[Long]("g_prio") == 0L && r.getAs[Long]("g_status") == 1L)
    assert(perPrio.map(_.getAs[Long]("n")).sum == grand.head.getAs[Long]("n"))
  }

  test("q25 array battery: absent-element position is 0, first3 ordered") {
    val rows = Relational3.q25.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows.take(50)) {
      assert(r.getAs[Long]("n_uniq") <= r.getAs[Long]("n_tok"))
      assert(r.getAs[Long]("pos_the") >= 0) // 0 = absent, never null
      val f3 = r.getAs[String]("first3").split(",")
      assert(f3.sameElements(f3.sorted), "first3 must be sorted")
      assert(f3.headOption.contains(r.getAs[String]("first_tok")))
    }
  }

  test("q26 regex battery: no-match extract returns empty string") {
    val rows = Relational3.q26.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("second_word") != null))
    assert(rows.forall(_.getAs[Long]("n_numbers") >= 0))
  }

  test("q27 conditional battery: null paths actually execute") {
    val rows = Relational3.q27.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val opens = rows.count(_.getAs[String]("status_or_open") == "open")
    assert(opens > 0, "NULLIF('O') branch never fired")
    assert(rows.exists(_.getAs[Long]("prio_was_urgent") == 1L))
    for (r <- rows.take(100)) {
      assert(r.getAs[Double]("floor150k") >= 150000.0)
      assert(r.getAs[Double]("cap150k") <= 150000.0)
    }
  }

  test("q28 correlated subqueries are decorrelated into joins") {
    val df = Relational3.q28.run(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("scalar-subquery"),
      s"scalar subquery survived optimization:\n$optimized")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // spot-check one order against a direct computation
    val o = rows.maxBy(_.getAs[Long]("n_heavy"))
    val direct = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") === o.getAs[Long]("o_orderkey") &&
        col("l_quantity") > 45).count()
    assert(o.getAs[Long]("n_heavy") == direct)
  }

  test("q29 frame battery: first/last frames agree at partition edges") {
    val rows = Relational3.q29.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    for ((_, rs) <- byUser.take(20)) {
      val sorted = rs.sortBy(_.getAs[Long]("event_id"))
      // running-first is constant per partition; suffix-last ends at itself
      assert(sorted.map(_.getAs[String]("first_type")).distinct.length == 1)
      assert(sorted.last.getAs[String]("last_type") ==
        sorted.last.getAs[String]("first_type") ||
        sorted.length > 1)
      assert(sorted.head.getAs[String]("lag2") == "<none>")
    }
  }

  test("q30 discrete percentiles are elements of the data; mode is argmax") {
    val rows = Relational3.q30.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("value"))
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val vals = ev.filter(_._1 == t).map(_._2).sorted
      for (p <- Seq("p25", "p50", "p95")) {
        val v = r.getAs[Double](p)
        assert(vals.exists(x => math.abs(x - v) < 1e-6),
          s"$p=$v for $t is not an element of the data (percentile_disc)")
      }
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"))
    }
  }
}
