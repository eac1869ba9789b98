package graft

import org.apache.spark.sql.functions._

import graft.ops.IndexTune

/** The IVF auto-tune sweep (SURVEY §2 29v): the frontier must be
  * MONOTONE — at fixed nCells, probing more cells only ever ADDS
  * candidates, and a top-k over a candidate superset can only swap
  * global-top-k members for global-top-k members (anything displacing a
  * true hit ranks above it in the same total order, so it is itself a
  * true hit) — recall@k is non-decreasing in nProbe, reaching exactly
  * 1.0 when every cell is probed (the candidate set IS the corpus). */
class IndexTuneSpec extends SparkTestBase {

  test("recallFrontier: grid complete and ordered, recall non-decreasing " +
      "in nProbe per cell count, exhaustive probe reaches recall 1.0") {
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 6)
    val rows = IndexTune.recallFrontier(embs, queries,
      cellCounts = Seq(4, 8), probes = Seq(1, 2, 4, 8), k = 5,
      refineIters = 1)
    assert(rows.map(r => (r.n_cells, r.n_probe)) ==
      Seq((4, 1), (4, 2), (4, 4), (8, 1), (8, 2), (8, 4), (8, 8)),
      s"grid wrong: ${rows.map(r => (r.n_cells, r.n_probe))}")
    for ((nc, g) <- rows.groupBy(_.n_cells)) {
      val recalls = g.sortBy(_.n_probe).map(_.mean_recall)
      assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"recall not monotone in nProbe at nCells=$nc: $recalls")
    }
    // nProbe == nCells probes every cell — the candidate set is the
    // whole corpus, so the retrieval IS brute force: recall exactly 1
    for (r <- rows if r.n_probe == r.n_cells)
      assert(r.mean_recall == 1.0,
        s"exhaustive probe not exact at nCells=${r.n_cells}: ${r.mean_recall}")
    assert(rows.forall(_.wall_sec > 0.0))
  }

  test("recallFrontier releases every cache it creates") {
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 4)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    IndexTune.recallFrontier(embs, queries, Seq(4), Seq(1, 4), k = 3,
      refineIters = 1)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}
