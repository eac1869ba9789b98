package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.ops.Upsert

/** Lake-scale techniques: partition-bounded MERGE and bucketed
  * co-located joins (the SURVEY §4 claims, exercised). */
class LakeSpec extends SparkTestBase {
  import spark.implicits._

  test("mergePartitioned rewrites only the partitions present in the batch") {
    val root = Files.createTempDirectory("silver").resolve("obs").toString
    def rows(d: String, k: Int, v: String, ver: Long) = (d, k, v, ver)
    val day1 = Seq(rows("2026-01-01", 1, "a", 1L), rows("2026-01-01", 2, "b", 1L))
    val day2 = Seq(rows("2026-01-02", 3, "c", 1L))
    val day3 = Seq(rows("2026-01-03", 4, "d", 1L))
    val init = (day1 ++ day2 ++ day3).toDF("day", "key", "payload", "ver")
    Upsert.mergePartitioned(spark, root, init, Seq("day", "key"),
      col("ver"), "day")

    // capture per-partition file state before the second merge
    def fileState(day: String): Set[(String, Long)] = {
      val dir = new java.io.File(s"$root/day=$day")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val before2 = fileState("2026-01-02")
    val before3 = fileState("2026-01-03")

    // batch touches ONLY day1: update key=1, insert key=9
    val batch = Seq(rows("2026-01-01", 1, "a2", 2L), rows("2026-01-01", 9, "z", 2L))
      .toDF("day", "key", "payload", "ver")
    Upsert.mergePartitioned(spark, root, batch, Seq("day", "key"),
      col("ver"), "day")

    val after = spark.read.parquet(root)
    assert(after.count() == 5)
    assert(after.filter(col("key") === 1).head().getAs[String]("payload") == "a2")
    assert(after.filter(col("key") === 2).head().getAs[String]("payload") == "b")
    assert(fileState("2026-01-02") == before2, "untouched partition rewritten!")
    assert(fileState("2026-01-03") == before3, "untouched partition rewritten!")
  }

  test("bucketed tables join without a shuffle exchange") {
    val n = 1000
    (1 to n).map(i => (i.toLong, s"cust$i")).toDF("key", "name")
      .write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("cust_bucketed")
    (1 to 5 * n).map(i => (i.toLong % n + 1, i * 10.0)).toDF("key", "amount")
      .write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("orders_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bucketed")
        .join(spark.table("cust_bucketed"), "key")
        .groupBy("name").agg(sum("amount").as("total"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // co-located: no shuffle on the JOIN key (the groupBy(name)
      // aggregation exchange afterwards is expected and unrelated)
      assert(!plan.contains("Exchange hashpartitioning(key"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() == n)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approximate distinct-count tracks exact within tolerance") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = df.select(countDistinct(col("l_partkey"), col("l_suppkey")))
      .head().getLong(0)
    val approx = df.select(approx_count_distinct(
      concat_ws("|", col("l_partkey"), col("l_suppkey")), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
