package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftQuery, QueryPack, Tables}
import graft.ops.Graph

/** SURVEY.md §2.9 — graph analytics over the event log: the weighted
  * event-type transition graph (a Markov chain over states, aggregated
  * from the raw per-user stream) and a deterministic integer fixed-point
  * PageRank over it. Both oracle-gated: counts are exact integers, and
  * the PageRank recurrence is pure integer arithmetic (see
  * `graft.ops.Graph`), so the DuckDB oracle unrolls the identical
  * computation with bit-equal results.
  */
object GraphQueries extends QueryPack {

  /** Shared oracle CTEs: the lag-derived weighted edge list, node set,
    * node count and out-degree table. */
  private val EDGES =
    """e AS (SELECT prev AS src, event_type AS dst, CAST(COUNT(*) AS BIGINT) AS w
      |        FROM (SELECT user_id, event_type,
      |                LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |              FROM events)
      |        WHERE prev IS NOT NULL GROUP BY 1, 2),
      |      nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
      |      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      |      outd AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM e GROUP BY src)""".stripMargin

  /** The transition matrix itself — per (prev state, state) event-count
    * weights. The 100 TB work is here (one per-user lag window + one
    * map-side-combined count); everything downstream is graph-sized. */
  val graphTransitions = GraftQuery(
    "graph_transitions",
    Some(s"""
      WITH $EDGES
      SELECT src, dst, w FROM e ORDER BY src, dst""".trim)) { (spark, dir) =>
    Graph.transitionEdges(Tables.events(spark, dir)).orderBy("src", "dst")
  }

  /** Integer fixed-point PageRank, 3 iterations, unrolled in the oracle
    * as r0 → (c1,r1) → (c2,r2) → (c3,r3) with the identical recurrence
    * (`//` floors like Spark's `div` on the non-negative operands). */
  val graphPagerank = GraftQuery(
    "graph_pagerank",
    Some {
      val iters = (1 to 3).map { i =>
        s"""c$i AS (SELECT e.dst AS node, CAST(SUM((r.rank_fp * e.w) // o.outw) AS BIGINT) AS c
           |        FROM e JOIN r${i - 1} r ON r.node = e.src JOIN outd o ON o.src = e.src
           |        GROUP BY e.dst),
           |      r$i AS (SELECT nodes.node,
           |          (15 * 1000000) // (100 * n) + (85 * COALESCE(c.c, 0)) // 100 AS rank_fp
           |        FROM nodes CROSS JOIN nn LEFT JOIN c$i c ON c.node = nodes.node)"""
          .stripMargin }
        .mkString(",\n      ")
      s"""
      WITH $EDGES,
      r0 AS (SELECT node, 1000000 // n AS rank_fp FROM nodes CROSS JOIN nn),
      $iters
      SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp FROM r3 ORDER BY node""".trim
    }) { (spark, dir) =>
    Graph.pagerank(Graph.transitionEdges(Tables.events(spark, dir)))
      .select(col("node"), col("rank_fp").cast("long").as("rank_fp"))
      .orderBy("node")
  }

  /** Degree-oriented exact triangle census over the undirected
    * transition graph: per-node degree + triangle participation. The
    * orientation (edges point at the (degree, id)-larger endpoint)
    * bounds wedge generation by O(√m) out-degrees and finds each
    * triangle exactly once — no /6, no distinct pass (see
    * `graft.ops.Graph.triangles`). Oracle mirrors the orientation. */
  val graphTriangles = GraftQuery(
    "graph_triangles",
    Some(s"""
      WITH $EDGES,
      und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM e WHERE src <> dst),
      deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
              FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
              GROUP BY node),
      o AS (SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
                        THEN u ELSE v END AS a,
                   CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
                        THEN v ELSE u END AS b
            FROM und JOIN deg d1 ON d1.node = u JOIN deg d2 ON d2.node = v),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM o e1 JOIN o e2 ON e2.a = e1.b
                        JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
      pern AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
               FROM (SELECT x AS node FROM tri UNION ALL
                     SELECT y AS node FROM tri UNION ALL
                     SELECT z AS node FROM tri)
               GROUP BY node)
      SELECT d.node, d.deg, COALESCE(p.tri_cnt, 0) AS tri_cnt
      FROM deg d LEFT JOIN pern p ON p.node = d.node
      ORDER BY d.node""".trim)) { (spark, dir) =>
    Graph.triangles(Graph.transitionEdges(Tables.events(spark, dir)))
      .orderBy("node")
  }

  /** Bipartite link prediction: supplier pairs co-supplying >= 3 parts
    * (distinct (part, supplier) relation off the lineitem feed),
    * common-neighbor count + Jaccard over the node projection;
    * wedge-bounded with a DF-style item cap (see
    * [[graft.ops.Graph.bipartiteLinkPredict]]). */
  val graphLinkPredict = GraftQuery(
    "graph_link_predict",
    Some("""
      WITH e AS (SELECT DISTINCT l_partkey AS item, l_suppkey AS node FROM lineitem),
      hot AS (SELECT item FROM e GROUP BY item HAVING count(*) > 1000),
      cold AS (SELECT * FROM e WHERE item NOT IN (SELECT item FROM hot)),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM cold GROUP BY node),
      p AS (SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS cn
            FROM cold x JOIN cold y ON x.item = y.item AND x.node < y.node
            GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT p.a, p.b, p.cn,
        ROUND(p.cn / CAST(da.deg + db.deg - p.cn AS DOUBLE), 6) AS jaccard
      FROM p JOIN deg da ON da.node = p.a JOIN deg db ON db.node = p.b
      ORDER BY a, b""".trim)) { (spark, dir) =>
    graft.ops.Graph.bipartiteLinkPredict(
        Tables.lineitem(spark, dir), "l_partkey", "l_suppkey")
      .orderBy("a", "b")
  }

  override def all: Seq[GraftQuery] =
    Seq(graphTransitions, graphPagerank, graphTriangles, graphLinkPredict)
}
