package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopK, TopKPerKeyExec}

class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  private def data = (1 to 1000).map(i => (i % 7, i * 31 % 997, i))
    .toDF("key", "score", "id").repartition(5)

  test("TopK.perKey matches the window row_number formulation exactly") {
    val topk = TopK.perKey(data, Seq("key"),
      Seq(col("score").desc, col("id")), k = 3)
      .orderBy("key", "score", "id").collect()
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val expected = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy("key", "score", "id").collect()
    assert(topk.toSeq == expected.toSeq)
  }

  test("physical plan uses TopKPerKeyExec, not Window+Sort") {
    val df = TopK.perKey(data, Seq("key"), Seq(col("score").desc, col("id")), 3)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec in:\n$plan")
    assert(plan.contains("Exchange"), "keys must be clustered (one shuffle)")
    assert(!plan.contains("Window"), "no window operator")
  }

  test("k larger than group size returns whole groups; ascending works") {
    val small = Seq((1, 10), (1, 20), (2, 5)).toDF("key", "v")
    val r = TopK.perKey(small, Seq("key"), Seq(col("v")), k = 10)
      .orderBy("key", "v").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(r.toSeq == Seq((1, 10), (1, 20), (2, 5)))
  }
}
