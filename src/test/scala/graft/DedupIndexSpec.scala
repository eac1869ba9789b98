package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, DedupIndex}

class DedupIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val baseWords = (1 to 40).map(i => s"word$i")
  private def doc(id: Long, change: Int = -1): (Long, String) =
    id -> baseWords.zipWithIndex
      .map { case (w, i) => if (i == change) s"CH$id" else w }.mkString(" ")
  private def unrelated(id: Long): (Long, String) =
    id -> (100 to 140).map(i => s"z${id}w$i").mkString(" ")

  test("incremental index finds cross-batch and in-batch near-dups, " +
      "matching the one-shot operator on the union") {
    val root = Files.createTempDirectory("dedupidx").resolve("idx").toString

    // batch 1: one doc + one unrelated
    val b1 = Seq(doc(1), unrelated(50)).toDF("doc_id", "text")
    val p1 = DedupIndex.append(spark, root, b1, batchId = 1).collect()
    assert(p1.isEmpty, "no dups within batch 1")

    // batch 2: near-dup of doc 1 (cross-batch) + two in-batch near-dups
    val b2 = Seq(doc(2, change = 20), doc(10, change = 5), doc(11, change = 5),
      unrelated(60)).toDF("doc_id", "text")
    val p2 = DedupIndex.append(spark, root, b2, batchId = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // one-shot operator over the union, restricted to pairs touching b2
    val union = b1.unionByName(b2)
    val b2Ids = Set(2L, 10L, 11L, 60L)
    val expected = Dedup.minHashLsh(union).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => b2Ids(p._1) || b2Ids(p._2)).toSet
    assert(p2 == expected, s"got $p2 expected $expected")
    assert(p2.contains((1L, 2L)), "cross-batch pair found via the index")
    assert(p2.contains((10L, 11L)), "in-batch pair found")

    // replay of batch 2 (at-least-once retry): same batchId overwrites
    // its own index partition — output identical, index not duplicated
    val p2replay = DedupIndex.append(spark, root, b2, batchId = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2replay == p2, s"replay changed output: $p2replay vs $p2")

    // batch 3: another near-dup; index now holds both earlier batches
    val p3 = DedupIndex.append(spark, root,
        Seq(doc(3, change = 30)).toDF("doc_id", "text"), batchId = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 3 is a near-dup of every earlier perturbation of the base doc
    // (exactly once per pair — a replay-duplicated index would emit dups)
    assert(p3 == Set((1L, 3L), (2L, 3L), (3L, 10L), (3L, 11L)), s"got $p3")
    val bandRows = spark.read.parquet(s"$root/bands")
    assert(bandRows.count() == bandRows.dropDuplicates("doc_id", "band").count(),
      "index holds duplicate band rows after replay")
  }

  test("streaming dedup-at-ingest emits cross-batch pairs as they arrive") {
    import graft.streaming.StreamingDedup
    val base = Files.createTempDirectory("sdedup")
    val in = base.resolve("in"); Files.createDirectories(in)
    val idx = base.resolve("idx").toString
    val pairsDir = base.resolve("pairs").toString
    val ckpt = base.resolve("ckpt").toString

    def writeBatch(name: String, docs: Seq[(Long, String)]): Unit =
      Files.writeString(in.resolve(name), docs.map { case (id, t) =>
        s"""{"doc_id":$id,"text":"$t"}""" }.mkString("\n"))

    writeBatch("b0.json", Seq(doc(1), unrelated(50)))
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .json(in.toString)
    val q = StreamingDedup.nearDupPairs(stream, idx, pairsDir, ckpt)
    try {
      q.processAllAvailable()
      writeBatch("b1.json", Seq(doc(2, change = 20), unrelated(60)))
      q.processAllAvailable()
    } finally q.stop()

    val pairs = spark.read.parquet(pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("vector index: batched ingest equals one-shot IVF; probes prune partitions") {
    import graft.streaming.VectorIndex
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("vecidx")
    val idx = dir.resolve("index").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = embs.filter(col("vec_id") < 16)
    val q = embs.filter(col("vec_id") < 10)
    // two batches cover the corpus
    VectorIndex.appendBatch(embs.filter(col("vec_id") % 2 === 0), centroids, idx, 0L)
    VectorIndex.appendBatch(embs.filter(col("vec_id") % 2 === 1), centroids, idx, 1L)
    val got = VectorIndex.queryTopK(spark, idx, q, centroids)
    val expected = Similarity.ivfTopK(embs, q, centroids)
    assert(got.collect().toSeq == expected.collect().toSeq,
      "indexed query must equal the one-shot IVF result")
    // replay of batch 1 (at-least-once) must not duplicate index rows
    VectorIndex.appendBatch(embs.filter(col("vec_id") % 2 === 1), centroids, idx, 1L)
    assert(VectorIndex.queryTopK(spark, idx, q, centroids).collect().toSeq ==
      expected.collect().toSeq)
    // the scan prunes to the probed cells' directories
    val probedPlan = {
      val df = VectorIndex.queryTopK(spark, idx, q, centroids)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(probedPlan.contains("PartitionFilters: ["), probedPlan)
    assert(probedPlan.contains("cid#"), probedPlan)
  }

  test("vector index bootstrap: one-pass backfill is interchangeable " +
      "with sequential appends — same query results, append replay " +
      "idempotent on top of it") {
    import graft.streaming.VectorIndex
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("vecboot")
    val idx = dir.resolve("index").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = embs.filter(col("vec_id") < 16)
    val q = embs.filter(col("vec_id") < 10)
    VectorIndex.bootstrap(embs, centroids, idx, col("vec_id") % 2)
    val expected = Similarity.ivfTopK(embs, q, centroids).collect().toSeq
    assert(VectorIndex.queryTopK(spark, idx, q, centroids)
      .collect().toSeq == expected,
      "bootstrapped query must equal the one-shot IVF result")
    // replay of a bootstrapped batch through the real append path
    VectorIndex.appendBatch(embs.filter(col("vec_id") % 2 === 1),
      centroids, idx, 1L)
    assert(VectorIndex.queryTopK(spark, idx, q, centroids)
      .collect().toSeq == expected, "replay over bootstrap not idempotent")
  }

  test("index refresh: drifted cells re-train, one vector provably " +
      "migrates, and the converged cell's files are never rewritten") {
    import graft.streaming.VectorIndex
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("vecrefresh")
    val idx = dir.resolve("index").toString
    val cidx = dir.resolve("compact").toString
    def f(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // cell 100 is exactly converged (members symmetric about the seed);
    // cell 101's mean drifts toward member 30; cell 102's seed is off
    // its members' mean. Member 30 starts in 101 (cos .722 vs .692) but
    // after one Lloyd round the refreshed 102 centroid wins (.760 vs
    // .745) — the one designed migration.
    val vecs = (Seq(
      1L -> f(1, 0.25, 0, 0), 2L -> f(1, -0.25, 0, 0),
      30L -> f(0, 0.72, 0.69, 0)) ++
      (10L until 30L).map(i => i -> f(0, 1, 0, 0)) ++
      (40L until 44L).map(i => i -> f(0, 0.1, 1, 0)))
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      100L -> f(1, 0, 0, 0), 101L -> f(0, 1, 0, 0), 102L -> f(0, 0, 1, 0))
      .toDF("vec_id", "embedding")
    VectorIndex.appendBatch(vecs, centroids, idx, 0L)
    VectorIndex.compact(spark, idx, cidx)

    def listing(cid: Long): Seq[(String, Long, Long)] = {
      val d = java.nio.file.Paths.get(cidx, s"cid=$cid")
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)).sorted
      finally s.close()
    }
    val before100 = listing(100L)
    assert(before100.nonEmpty)

    val newCent = VectorIndex.refresh(spark, cidx, centroids, iters = 1)
    // converged cell: byte-identical files, never opened for write
    assert(listing(100L) == before100,
      "undrifted cell was rewritten during refresh")
    // the migrating vector landed in cell 102; every vector exactly once
    // (partition-column inference reads cid back as int — normalize)
    val after = spark.read.option("basePath", cidx).parquet(cidx)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    assert(after.count() == vecs.count())
    assert(after.select("vec_id").distinct().count() == vecs.count())
    assert(after.filter(col("vec_id") === 30L).head().getAs[Long]("cid") == 102L)
    // post-refresh cells equal the exact one-shot assignment against the
    // refreshed centroids
    val want = Similarity.cellAssignments(vecs, newCent, keep = 1)
      .select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = after.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("index refresh under distribution drift: recall at fixed nProbe " +
      "is non-decreasing vs the stale-centroid index") {
    import graft.streaming.VectorIndex
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("vecdrift")
    val idx = dir.resolve("index").toString
    val cidx = dir.resolve("compact").toString
    val rng = new scala.util.Random(7)
    val dim = 8
    def noisy(axis: Int): Seq[Float] =
      Seq.tabulate(dim)(d =>
        ((if (d == axis) 1.0 else 0.0) + rng.nextGaussian() * 0.1).toFloat)
    // first half clusters on axes 0/1 (what the centroids saw), second
    // half drifts to axes 4/5 (unseen region)
    val vecs = ((0L until 32L).map(i => i -> noisy((i % 2).toInt)) ++
      (32L until 64L).map(i => i -> noisy(4 + (i % 2).toInt)))
      .toDF("vec_id", "embedding")
    val stale = vecs.filter(col("vec_id") < 4)
    VectorIndex.appendBatch(vecs, stale, idx, 0L)
    VectorIndex.compact(spark, idx, cidx)

    val queries = vecs.filter(col("vec_id") % 8 === 0)
    val brute = Similarity.bruteForceTopK(vecs, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(centroids: org.apache.spark.sql.DataFrame): Double = {
      val got = VectorIndex.queryTopK(spark, cidx, queries, centroids,
          nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    val staticRecall = recall(stale)
    val refreshed = VectorIndex.refresh(spark, cidx, stale, iters = 3)
    val newRecall = recall(refreshed)
    assert(newRecall >= staticRecall - 1e-9,
      s"refresh hurt recall: $staticRecall -> $newRecall")
    assert(newRecall > 0.5, s"refreshed recall unreasonably low: $newRecall")
  }

  test("streaming hard negatives: batched folds equal the one-shot " +
      "operator on the union; replay is idempotent") {
    import graft.streaming.StreamingRetrieval
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("sret")
    val hn = dir.resolve("hn").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = embs.filter(col("vec_id") < 16)
      .select("vec_id", "embedding")
    val nCells = centroids.count().toInt
    val queries = embs.filter(col("vec_id") < 10)
    val b1 = embs.filter(col("vec_id") % 2 === 0)
    val b2 = embs.filter(col("vec_id") % 2 === 1)
    // probe EVERY cell: the fold is then exact, so two batched folds
    // must reproduce brute force over the full corpus
    StreamingRetrieval.foldHardNegatives(b1, 1L, hn, queries, centroids,
      k = 5, nProbe = nCells)
    StreamingRetrieval.foldHardNegatives(b2, 2L, hn, queries, centroids,
      k = 5, nProbe = nCells)
    val got = StreamingRetrieval.hardNegativesCurrent(spark, hn)
      .collect().toSeq
    val want = Similarity.hardNegatives(embs, queries, k = 5)
      .collect().toSeq
    assert(got == want, "fold(b1); fold(b2) must equal one-shot(b1 ∪ b2)")
    // at-least-once replay of batch 2 rebuilds the same state
    StreamingRetrieval.foldHardNegatives(b2, 2L, hn, queries, centroids,
      k = 5, nProbe = nCells)
    assert(StreamingRetrieval.hardNegativesCurrent(spark, hn)
      .collect().toSeq == want)
    // a bounded probe budget returns a (per-query) subset-or-equal set
    // with never-higher cosines — the ANN recall trade, not corruption
    val hnP = dir.resolve("hnp").toString
    StreamingRetrieval.foldHardNegatives(b1, 1L, hnP, queries, centroids,
      k = 5, nProbe = 2)
    StreamingRetrieval.foldHardNegatives(b2, 2L, hnP, queries, centroids,
      k = 5, nProbe = 2)
    val pruned = StreamingRetrieval.hardNegativesCurrent(spark, hnP)
      .collect()
    val bestExact = want.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getDouble(2)).max).toMap
    assert(pruned.nonEmpty)
    assert(pruned.forall(r => r.getDouble(2) <= bestExact(r.getLong(0)) + 1e-9))
  }

  test("streaming MaxSim: per-batch max-folds reproduce the one-shot " +
      "scores exactly at any batch split") {
    import graft.streaming.StreamingRetrieval
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("smax")
    val ms = dir.resolve("ms").toString
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = embs.filter(col("label") < 3)
    // split mid-document: vectors of one corpus doc span batches, the
    // case where a per-doc (rather than per-vector) fold would break
    val b1 = embs.filter(col("vec_id") % 3 =!= 0)
    val b2 = embs.filter(col("vec_id") % 3 === 0)
    StreamingRetrieval.foldMaxSim(b1, 1L, ms, queries)
    StreamingRetrieval.foldMaxSim(b2, 2L, ms, queries)
    val got = StreamingRetrieval.maxSimCurrent(spark, ms).collect().toSeq
    val want = Similarity.maxSimScores(embs, queries)
      .orderBy("q_doc", "c_doc").collect().toSeq
    assert(got == want, "fold(b1); fold(b2) must equal one-shot(b1 ∪ b2)")
    // replay idempotence
    StreamingRetrieval.foldMaxSim(b2, 2L, ms, queries)
    assert(StreamingRetrieval.maxSimCurrent(spark, ms).collect().toSeq == want)
  }

  test("dedup index bootstrap: one-pass backfill is interchangeable with " +
      "sequential appends — same index rows, same pair union, append " +
      "replay over bootstrap idempotent") {
    val docs = Seq(doc(1), doc(2, change = 20), doc(10, change = 5),
      doc(11, change = 5), unrelated(50), unrelated(60), doc(3, change = 30))
      .toDF("doc_id", "text")
    val batchOf = pmod(col("doc_id"), lit(3))
    // sequential fold reference, including the at-least-once replay of
    // batch 1 — the shape the parity gate replaces with bootstrap+replay
    val seqRoot = Files.createTempDirectory("dedupseq").resolve("idx").toString
    val seqPairs = Seq(0, 1, 1, 2).map { b =>
      DedupIndex.append(spark, seqRoot, docs.filter(batchOf === b), b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }.reduce(_ ++ _)
    // bootstrap + replay (the gate shape)
    val bRoot = Files.createTempDirectory("dedupboot").resolve("idx").toString
    DedupIndex.bootstrap(spark, bRoot, docs, batchOf)
    val replay = DedupIndex.append(spark, bRoot, docs.filter(batchOf === 1), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val all = DedupIndex.allPairs(spark, bRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(replay.subsetOf(all),
      "replay rows must already be in the full-index scan")
    assert(all == seqPairs,
      s"bootstrap pair union differs from sequential folds: $all vs $seqPairs")
    // index CONTENT identical table-for-table, batch ownership included
    def rows(root: String, table: String): Seq[String] =
      spark.read.parquet(s"$root/$table").collect()
        .map(_.toString).sorted.toSeq
    assert(rows(bRoot, "bands") == rows(seqRoot, "bands"),
      "bands table differs between bootstrap and sequential appends")
    assert(rows(bRoot, "shingles") == rows(seqRoot, "shingles"),
      "shingles table differs between bootstrap and sequential appends")
    // the replay overwrote its partition rather than duplicating it
    val bandRows = spark.read.parquet(s"$bRoot/bands")
    assert(bandRows.count() ==
      bandRows.dropDuplicates("doc_id", "band").count(),
      "index holds duplicate band rows after replay over bootstrap")
  }

  test("hard-negative bootstrap: one-pass prefix states equal sequential " +
      "folds version-for-version; fold replay over bootstrap idempotent") {
    import graft.streaming.StreamingRetrieval
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = embs.filter(col("vec_id") < 16)
      .select("vec_id", "embedding")
    val queries = embs.filter(col("vec_id") < 10)
    val batchOf = pmod(col("vec_id"), lit(3))
    val dir = java.nio.file.Files.createTempDirectory("sretboot")
    val seqDir = dir.resolve("seq").toString
    for (b <- Seq(0, 1, 2))
      StreamingRetrieval.foldHardNegatives(
        embs.filter(batchOf === b), b, seqDir, queries, centroids)
    val bDir = dir.resolve("boot").toString
    StreamingRetrieval.bootstrapHardNegatives(embs, batchOf, bDir,
      queries, centroids, batches = Seq(0L, 1L, 2L))
    def st(root: String, v: Long): Seq[String] =
      spark.read.parquet(s"$root/v=$v").collect()
        .map(_.toString).sorted.toSeq
    for (v <- 0L to 2L)
      assert(st(bDir, v) == st(seqDir, v),
        s"bootstrap prefix state v=$v differs from the sequential fold")
    // the real fold path replays batch 1 over the bootstrapped state:
    // v=1 rebuilds byte-equal from v=0, nothing double-counts
    StreamingRetrieval.foldHardNegatives(
      embs.filter(batchOf === 1), 1, bDir, queries, centroids)
    for (v <- 0L to 2L)
      assert(st(bDir, v) == st(seqDir, v),
        s"state v=$v differs after replay over bootstrap")
  }
}
