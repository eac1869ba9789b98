package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed silver tables: co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is the shuffle
  * of both sides. Bucketing spends that shuffle ONCE at write time:
  * `bucketBy(n, keys)` hash-partitions rows into a fixed number of
  * per-key-range files, and every later join or aggregation on the
  * bucket keys consumes the layout directly — the planner emits
  * SortMergeJoin / HashAggregate with no Exchange on the bucketed side.
  * For a silver table that is joined on its natural key by every
  * downstream query (observations by location, documents by doc_id),
  * write-once-shuffle-never-again is the right trade.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable` — plain
  * `parquet(path)` writes cannot record bucket spec), backed by parquet
  * under the warehouse dir. Both join sides must share the bucket count
  * (or divide evenly) for the co-located plan.
  */
object Bucketed {

  /** Write `df` as a bucketed, in-bucket-sorted parquet table. */
  def write(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on `keys`. With matching bucket
    * specs the physical plan has no shuffle on either side (the spec
    * asserts this), and in-bucket sort order feeds SortMergeJoin without
    * a re-sort. */
  def cojoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** True if the executed plan of `df` contains any shuffle exchange —
    * the property bucketing exists to eliminate. */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    var found = false
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        found = true
      case _ => ()
    }
    found
  }
}
