package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Quantiles

/** Rank-selection quantiles vs the naive full-sort formulation —
  * bit-identical on every edge the bucketing could get wrong. */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference: the straightforward window-rank percentile_cont. */
  private def reference(df: org.apache.spark.sql.DataFrame,
      ps: Seq[Double]): Seq[String] = {
    val w = Window.partitionBy("k").orderBy(col("x"), col("id"))
    df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("k")))
      .withColumn("p", explode(array(ps.map(lit(_)): _*)))
      .withColumn("lo", floor((col("n") - 1) * col("p")).cast("long"))
      .withColumn("frac",
        (col("n") - 1) * col("p") - floor((col("n") - 1) * col("p")))
      .filter(col("rn") === col("lo") + 1 || col("rn") === col("lo") + 2)
      .groupBy("k", "p")
      .agg(min(when(col("rn") === col("lo") + 1, col("x"))).as("xlo"),
        min(when(col("rn") === col("lo") + 2, col("x"))).as("xhi"),
        min(col("frac")).as("f"))
      .select(col("k"), col("p"),
        round(col("xlo") + col("f") *
          (coalesce(col("xhi"), col("xlo")) - col("xlo")), 6).as("quantile"))
      .collect().map(_.toString).sorted.toSeq
  }

  private def run(df: org.apache.spark.sql.DataFrame,
      ps: Seq[Double]): Seq[String] =
    Quantiles.groupQuantiles(df, "k", "x", Seq("id"), ps)
      .collect().map(_.toString).sorted.toSeq

  test("matches the full-sort reference on mixed-sign values, " +
      "boundary ps and single-row groups") {
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val df = Seq(
      ("a", -5.5, 1L), ("a", -0.25, 2L), ("a", 0.0, 3L), ("a", 3.5, 4L),
      ("a", 1e12, 5L), ("a", -1e-9, 6L),
      ("b", 42.0, 7L), // single-row group: every p selects the row
      ("c", 1.0, 8L), ("c", 2.0, 9L))
      .toDF("k", "x", "id")
    assert(run(df, ps) == reference(df, ps))
  }

  test("constant-valued group (all rows share one bucket) and exact " +
      "tie runs spanning the target rank") {
    val ps = Seq(0.5, 0.9)
    val df = ((1L to 20L).map(i => ("const", 7.25, i)) ++
      (1L to 30L).map(i => ("ties", (i / 10L).toDouble, i)))
      .toDF("k", "x", "id")
    assert(run(df, ps) == reference(df, ps))
  }

  test("pseudo-random data agrees with the reference (hash-derived " +
      "values, no rand())") {
    val ps = Seq(0.1, 0.5, 0.99)
    val df = (1L to 5000L).map { i =>
      val h = graft.functions.Hashing.hash60Local(s"q:$i")
      (s"g${i % 7}", (h % 100000L).toDouble / 100.0 - 300.0, i)
    }.toDF("k", "x", "id")
    assert(run(df, ps) == reference(df, ps))
  }

  test("sketch path: every (group, p) value is an element of the group " +
      "within the published rank-error bound; no collect in the plan") {
    val ps = Seq(0.1, 0.5, 0.9)
    val df = (1L to 20000L).map { i =>
      val h = graft.functions.Hashing.hash60Local(s"sk:$i")
      (s"g${i % 5}", (h % 1000000L).toDouble / 1000.0, i)
    }.toDF("k", "x", "id")
    val audit = Quantiles.sketchRankCheck(df, "k", "x", ps, accuracy = 1000)
      .collect()
    assert(audit.length == 5 * ps.length)
    assert(audit.forall(_.getAs[Boolean]("within_bound")))
    // and the raw sketch values really are data elements per group
    val vals = df.groupBy("k").agg(collect_set("x").as("xs"))
    val joined = Quantiles.quantilesSketch(df, "k", "x", ps)
      .join(vals, "k")
      .withColumn("is_member", array_contains(col("xs"), col("q_approx")))
    assert(joined.collect().forall(_.getAs[Boolean]("is_member")))
  }

  test("exact path is one lazy program: no driver round-trip in the " +
      "plan, and high group cardinality (the old guard's trigger) just " +
      "works") {
    // one group per row: the shape that tripped the r4 MaxHistRows
    // guard (histogram rows = groups). With the distributed locate
    // there is no driver histogram to guard.
    // spark.range input: the only LocalTableScan a plan could contain
    // would be a driver-collected locate table
    val df = spark.range(1, 3001).select(
      concat(lit("k"), col("id")).as("k"),
      col("id").cast("double").as("x"), col("id"))
    val q = Quantiles.groupQuantiles(df, "k", "x", Seq("id"), Seq(0.5))
    // the r4 form embedded collected histogram rows as a LocalTableScan;
    // its absence proves construction never touches the driver
    assert(!q.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "exact rank-selection must not round-trip through the driver")
    val got = q.collect()
    assert(got.length == 3000 &&
      got.forall(r => r.getDouble(2) == r.getString(0).drop(1).toDouble),
      "singleton groups: the median of one value is that value")
    val disc = Quantiles.groupDiscQuantile(df, "k", "x", Seq("id"), 0.5, "m")
    assert(!disc.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(disc.count() == 3000)
  }
}
