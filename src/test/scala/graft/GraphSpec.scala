package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Specs for the transition-graph + PageRank operators (SURVEY §2.9). */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def events(rows: (Long, Int, Long, String)*) =
    rows.map { case (id, m, u, t) => (id, ts(m), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("transitionEdges: per-user lag with ts order and event_id " +
      "tie-break, weighted by count") {
    val e = events(
      (1L, 1, 1L, "A"), (2L, 2, 1L, "B"), (3L, 3, 1L, "C"),
      (4L, 1, 2L, "A"), (5L, 2, 2L, "B"),
      // same ts for user 3: event_id breaks the tie → A before B
      (6L, 1, 3L, "A"), (7L, 1, 3L, "B"))
    val got = Graph.transitionEdges(e).orderBy("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", "B", 3L), ("B", "C", 1L)))
  }

  test("pagerank: integer fixed-point recurrence, hand-computed 3-node " +
      "chain, bit-exact") {
    // Graph: A→B (w=2), B→C (w=1). N=3, SCALE=1e6.
    // r0 = 333333 each; teleport = 15e6 div 300 = 50000.
    // r1: A=50000, B=50000+(85*333333)div 100=333333, C=333333.
    // r2: A=50000, B=50000+(85*((50000*2) div 2)) div 100=92500, C=333333.
    // r3: A=50000, B=92500, C=50000+(85*92500) div 100=128625.
    val edges = Seq(("A", "B", 2L), ("B", "C", 1L)).toDF("src", "dst", "w")
    val got = Graph.pagerank(edges, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> 50000L, "B" -> 92500L, "C" -> 128625L), got)
    // total rank never exceeds the injected mass
    assert(got.values.sum <= 3L * 1000000L)
  }

  test("pagerank: unbounded power iteration stays flat — 23 rounds run, " +
      "checkpoint cuts match the uncut recurrence bit-exactly") {
    // a cycle so rank keeps circulating (no fixed point in few rounds)
    val edges = Seq(("A", "B", 1L), ("B", "C", 1L), ("C", "A", 1L))
      .toDF("src", "dst", "w")
    // driver-side replica of the integer recurrence
    def ref(iters: Int): Map[String, Long] = {
      val scale = 1000000L
      var r = Map("A" -> scale / 3, "B" -> scale / 3, "C" -> scale / 3)
      val pred = Map("A" -> "C", "B" -> "A", "C" -> "B")
      for (_ <- 0 until iters)
        r = r.map { case (n, _) =>
          n -> ((15L * scale) / (100L * 3) + 85L * r(pred(n)) / 100L)
        }
      r
    }
    // 23 crosses four checkpoint cuts (5/10/15/20) plus a tail
    val got = Graph.pagerank(edges, iterations = 23)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ref(23), s"checkpointed iteration diverged: $got vs ${ref(23)}")
  }

  test("GraphMaintenance: incremental edges equal the one-shot operator " +
      "on the union, cross-batch bridges counted, replay idempotent") {
    import graft.streaming.GraphMaintenance
    val root = java.nio.file.Files.createTempDirectory("graphidx")
    val (stateDir, edgeDir) =
      (root.resolve("state").toString, root.resolve("edges").toString)
    def full(rows: (Long, Int, Long, String)*) = events(rows: _*)
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))

    // batch 1: user 1 A→B, user 2 lone A
    val b1 = full((1L, 1, 1L, "A"), (2L, 2, 1L, "B"), (3L, 1, 2L, "A"))
    GraphMaintenance.foldBatch(b1, 1L, stateDir, edgeDir)
    // batch 2: user 1 B(carry)→C, user 2 A(carry)→B, user 3 in-batch A→B
    val b2 = full((4L, 3, 1L, "C"), (5L, 4, 2L, "B"),
      (6L, 1, 3L, "A"), (7L, 2, 3L, "B"))
    GraphMaintenance.foldBatch(b2, 2L, stateDir, edgeDir)

    def edges() = GraphMaintenance.currentEdges(spark, edgeDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = edges()
    val oneShot = Graph.transitionEdges(b1.unionByName(b2))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == oneShot, s"incremental $got != one-shot $oneShot")
    assert(got.contains(("B", "C", 1L)) && got.contains(("A", "B", 3L)),
      "cross-batch bridge transitions missing")

    // at-least-once replay of batch 2: same edge table, not double counts
    GraphMaintenance.foldBatch(b2, 2L, stateDir, edgeDir)
    assert(edges() == got, "replay must be idempotent")

    // ranks come straight off the maintained graph
    val ranks = GraphMaintenance.currentRanks(spark, edgeDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Graph.pagerank(Graph.transitionEdges(b1.unionByName(b2)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks == direct)
  }

  test("triangles: exact census on crafted graphs — path-free, K4, " +
      "hub wedge, duplicate/reversed/self-loop edges collapse") {
    def tri(edges: (String, String)*) =
      Graph.triangles(edges.map { case (s, d) => (s, d, 1L) }
          .toDF("src", "dst", "w"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    // a path has no triangles; every node still reported
    assert(tri(("A", "B"), ("B", "C"), ("C", "D")) ==
      Set(("A", 1L, 0L), ("B", 2L, 0L), ("C", 2L, 0L), ("D", 1L, 0L)))
    // K4: 4 triangles, each node in C(3,2)=3 of them; duplicate,
    // reversed and self-loop edges must not change the census
    val k4 = for {
      a <- Seq("A", "B", "C", "D"); b <- Seq("A", "B", "C", "D")
      if a != b
    } yield (a, b) // both directions + (via map below) self loops
    val got = tri(k4 ++ Seq(("A", "A"), ("A", "B"), ("B", "A")): _*)
    assert(got == Set(("A", 3L, 3L), ("B", 3L, 3L), ("C", 3L, 3L), ("D", 3L, 3L)))
    // hub-and-spoke (star): many wedges at the hub in the naive
    // formulation, zero triangles — and with degree orientation the hub
    // (max degree) is never a wedge pivot, so no quadratic blowup
    val star = (1 to 8).map(i => ("HUB", s"S$i"))
    assert(tri(star: _*).forall(_._3 == 0L))
    // one closed spoke pair → exactly one triangle, each node once
    val got2 = tri(star :+ (("S1", "S2")): _*)
    assert(got2.count(_._3 == 1L) == 3 &&
      got2.filter(_._3 == 1L).map(_._1) == Set("HUB", "S1", "S2"))
  }

  test("pagerank: deterministic across runs (integer arithmetic has no " +
      "fold-order dependence)") {
    val e = Tables.events(spark, sfDir)
    val edges = Graph.transitionEdges(e)
    val a = Graph.pagerank(edges).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Graph.pagerank(edges.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b, "rank depends on physical partitioning")
    assert(a.nonEmpty)
  }

  // ---- bipartiteLinkPredict (round 5) --------------------------------

  test("bipartiteLinkPredict: hand graph — common-neighbor counts, " +
      "jaccard, minCommon filter, singleton items contribute nothing") {
    import spark.implicits._
    val e = Seq(
      ("i1", "A"), ("i1", "B"), ("i1", "C"),
      ("i2", "A"), ("i2", "B"),
      ("i3", "B"), ("i3", "C"),
      ("i4", "D")).toDF("item", "node")
    val got = graft.ops.Graph.bipartiteLinkPredict(e, "item", "node",
        minCommon = 2, itemCap = 1000)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // deg: A=2, B=3, C=2; pairs >= 2 common: (A,B) cn=2, (B,C) cn=2
    assert(got == Set(
      ("A", "B", 2L, 0.666667), ("B", "C", 2L, 0.666667)), s"got $got")
  }

  test("bipartiteLinkPredict: itemCap excludes ubiquitous items from " +
      "candidates AND degrees (consistent capped relation)") {
    import spark.implicits._
    val e = Seq(
      ("i1", "A"), ("i1", "B"), ("i1", "C"), // hot: 3 nodes > cap 2
      ("i2", "A"), ("i2", "B"),
      ("i3", "B"), ("i3", "C")).toDF("item", "node")
    val got = graft.ops.Graph.bipartiteLinkPredict(e, "item", "node",
        minCommon = 1, itemCap = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // capped relation: A={i2}, B={i2,i3}, C={i3}
    assert(got == Set(
      ("A", "B", 1L, 0.5), ("B", "C", 1L, 0.5)), s"got $got")
  }

  test("bipartiteLinkPredict: packed-pair counting (integral ids) equals " +
      "the struct path bit-for-bit; an id beyond 2^31 raises loudly") {
    import spark.implicits._
    // long ids near the 2^31 boundary (packable maximum included)
    val big = Int.MaxValue.toLong
    val e = Seq(
      (10L, 1L), (10L, 2L), (10L, big),
      (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, big)).toDF("item", "node")
    def run(pack: Boolean) =
      graft.ops.Graph.bipartiteLinkPredict(e, "item", "node",
          minCommon = 1, itemCap = 1000, packPairs = pack)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val packed = run(true)
    assert(packed == run(false), "packed != struct path")
    assert(packed.contains((2L, big, 2L, 0.666667)), s"got $packed")
    // out-of-domain id → loud executor error, never a silent wrong count
    val bad = Seq((1L, big + 1L), (1L, 2L)).toDF("item", "node")
    val ex = intercept[Exception] {
      graft.ops.Graph.bipartiteLinkPredict(bad, "item", "node",
        minCommon = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("packPairs=false")),
      s"expected the packed-domain error, got: $ex")
  }

  test("connectedComponents: chains close transitively, components " +
      "labeled by their min node, direction irrelevant") {
    import spark.implicits._
    // two components: {1,2,3,4} via a chain with mixed edge direction,
    // {7,8} separate; node 9 isolated (absent from edges → unlabeled)
    val e = Seq((2L, 1L), (2L, 3L), (4L, 3L), (8L, 7L))
      .toDF("src", "dst")
    val got = graft.ops.Graph.connectedComponents(e, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L), s"got $got")
  }

  test("labelPropagation: two cliques joined by a weak bridge end up " +
      "in two communities (one connected component), deterministic " +
      "min-label ties — hand-computed 3-round trace") {
    import spark.implicits._
    val e = Seq(
      (1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),   // triangle A
      (4L, 5L, 10L), (4L, 6L, 10L), (5L, 6L, 10L),   // triangle B
      (3L, 4L, 1L))                                   // bridge
      .toDF("src", "dst", "w")
    val got = graft.ops.Graph.labelPropagation(e, "src", "dst", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"got $got")
    // same graph, one component — LPA is strictly finer
    val cc = graft.ops.Graph.connectedComponents(e, "src", "dst")
      .select("component_id").distinct().count()
    assert(cc == 1L)
  }

  test("labelPropagation: weight wins over count — one heavy edge " +
      "outvotes two light neighbors") {
    import spark.implicits._
    // star: 1-2 heavy, 2-3 and 2-4 light
    val e = Seq((1L, 2L, 10L), (2L, 3L, 1L), (2L, 4L, 1L))
      .toDF("src", "dst", "w")
    val got = graft.ops.Graph.labelPropagation(e, "src", "dst", "w",
        iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // round 1: node 2 sees {1:10, 3:1, 4:1} → 1 (heavy edge beats the
    // 2-vote light side's combined... they carry distinct labels, but
    // even the sum 2 < 10); leaves adopt 2; node 1 adopts 2
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 2L), s"got $got")
  }
}
