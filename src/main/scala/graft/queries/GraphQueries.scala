package graft.queries

import org.apache.spark.sql.functions._
import graft.Env
import graft.ops.{GraphOps, RelOps}

/** Graph / link-analysis operators over the co-purchase graph (parts linked
  * when they appear in the same order) — the connectivity-signal surface a
  * corpus pipeline runs on document-similarity or citation graphs: hub
  * degrees, triangle/clustering structure, PageRank propagation. All three
  * hash-match DuckDB oracles (PageRank's iterations are unrolled CTEs with
  * the same decimal-sum determinism contract as GraphOps.pageRank).
  *
  * The x101/x102 graph is thinned to repeat-co-purchases (weight ≥ 2):
  * measured 2.5k–3.9k edges across sf0.001→sf0.1 (the thinning threshold
  * tracks basket repetition, not table size), so iterative analytics run
  * on an affinity graph orders of magnitude smaller than the raw pair
  * fan-out — the same shape as running PageRank on near-dup edges rather
  * than all candidate pairs.
  */
object GraphQueries {

  /** Shared oracle CTEs: distinct pair edges + the weight-thinned graph. */
  private val edgeCtes =
    """p AS (SELECT la.l_partkey AS a, lb.l_partkey AS b, count(*) AS w
      |  FROM lineitem la JOIN lineitem lb
      |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
      |  GROUP BY 1, 2),
      |e AS (SELECT a, b FROM p WHERE w >= 2)""".stripMargin

  private val pagerankRound: String =
    """SELECT d.id, d.deg, round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
      |    + CAST(0.85 AS DOUBLE)
      |      * CAST(sum(CAST(r.r / r.deg AS DECIMAL(38,15))) AS DOUBLE), 12) AS r
      |  FROM sym s JOIN %s r ON s.a = r.id JOIN deg d ON s.b = d.id
      |  GROUP BY d.id, d.deg""".stripMargin

  val all: Seq[Query] = Seq(

    // X100: co-purchase hub degrees — top-20 most-connected parts on the
    // FULL distinct-pair graph. One co-partitioned self-join on the order
    // key (pair fan-out bounded by basket size), one degree aggregate, a
    // broadcast name join, global top-k (TakeOrderedAndProject).
    Query("x100_copurchase_degree",
      Some(s"""WITH $edgeCtes,
             |deg AS (SELECT id, count(*) AS degree FROM
             |  (SELECT a AS id FROM p UNION ALL SELECT b FROM p) u GROUP BY id)
             |SELECT pt.p_partkey, pt.p_name, d.degree
             |FROM deg d JOIN part pt ON d.id = pt.p_partkey
             |ORDER BY d.degree DESC, pt.p_partkey LIMIT 20""".stripMargin),
      env => {
        // pinned: degrees() symmetrizes with a two-branch union, which
        // would otherwise recompute the co-occurrence aggregate per branch
        val edges = GraphOps.coOccurrenceEdges(
          env.lineitem.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey")
          .select("a", "b").localCheckpoint()
        val deg = GraphOps.degrees(edges)
        val named = deg.join(
          broadcast(env.part.select("p_partkey", "p_name")),
          deg("id") === col("p_partkey"))
        RelOps.topK(20, Seq(desc("degree"), col("p_partkey")))(named)
          .select("p_partkey", "p_name", "degree")
      }),

    // X101: triangle census of the repeat-co-purchase graph — edge count,
    // wedge count Σd(d-1)/2, exact triangles, global clustering
    // coefficient. Spark side counts via degree-ordered orientation
    // (O(sqrt(m)) out-degree bound — survives hubs that the oracle's naive
    // a<b<c wedge join would square); GraphOpsSpec pins the two counts
    // equal, and the oracle cross-checks on every run.
    Query("x101_triangle_census",
      Some(s"""WITH $edgeCtes,
             |deg AS (SELECT id, count(*) AS degree FROM
             |  (SELECT a AS id FROM e UNION ALL SELECT b FROM e) u GROUP BY id),
             |tri AS (SELECT e1.a, e1.b, e2.b AS c FROM e e1
             |  JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT (SELECT count(*) FROM e) AS n_edges,
             |  (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
             |  (SELECT count(*) FROM tri) AS n_triangles,
             |  round(CAST(3.0 AS DOUBLE) * (SELECT count(*) FROM tri)
             |    / (SELECT sum(degree * (degree - 1) // 2) FROM deg), 6) AS clustering_coeff""".stripMargin),
      env => GraphOps.triangleStats(
        GraphOps.coOccurrenceEdges(
          env.lineitem.select("l_orderkey", "l_partkey"),
          "l_orderkey", "l_partkey", minWeight = 2L)
          .select("a", "b"))),

    // X102: 3-iteration PageRank over the repeat-co-purchase graph — the
    // propagation quality signal (a part's rank ≈ how central it is to
    // repeat-purchase behavior; on a document graph, the same operator is
    // the web-corpus quality prior). Oracle unrolls the three rounds as
    // CTEs with identical arithmetic: per-round DECIMAL(38,15) contribution
    // sums (order-free) + round-to-12, so ranks are bit-identical and the
    // full-precision ORDER BY r agrees across engines.
    Query("x102_pagerank",
      Some(s"""WITH $edgeCtes,
             |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT a AS id, count(*) AS deg FROM sym GROUP BY a),
             |nn AS (SELECT count(*) AS n FROM deg),
             |r0 AS (SELECT id, deg, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r FROM deg),
             |r1 AS (${pagerankRound.format("r0")}),
             |r2 AS (${pagerankRound.format("r1")}),
             |r3 AS (${pagerankRound.format("r2")})
             |SELECT id, deg, round(r, 9) AS rank FROM r3
             |ORDER BY r DESC, id LIMIT 20""".stripMargin),
      env => {
        val ranks = GraphOps.pageRank(
          GraphOps.coOccurrenceEdges(
            env.lineitem.select("l_orderkey", "l_partkey"),
            "l_orderkey", "l_partkey", minWeight = 2L)
            .select("a", "b"),
          iters = 3)
        // ranks is localCheckpoint-backed; the harness sweep (Verify/Bench
        // finally block) frees the blocks after the result is consumed.
        RelOps.topK(20, Seq(desc("r"), col("id")))(ranks)
          .select(col("id"), col("deg"), round(col("r"), 9).as("rank"))
      }),

    // X103: multi-source BFS distances — minimum hops from the 3
    // lowest-id nodes to everything reachable within 4, on the thinned
    // graph. Spark expands a FRONTIER per round (work O(edges incident to
    // the frontier), first discovery = min distance, so no path
    // explosion); the oracle's recursive CTE enumerates (id, hops) pairs
    // and min-aggregates — same answer, the formulation a single node
    // affords. The full distance table hash-matches, not just a summary.
    Query("x103_bfs_hops",
      Some(s"""WITH RECURSIVE $edgeCtes,
             |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
             |srcs AS (SELECT id FROM (SELECT a AS id FROM e UNION SELECT b FROM e) u
             |         ORDER BY id LIMIT 3),
             |bfs(id, hops) AS (
             |  SELECT id, 0 FROM srcs
             |  UNION
             |  SELECT s.b, b.hops + 1 FROM bfs b JOIN sym s ON s.a = b.id
             |  WHERE b.hops < 4)
             |SELECT id, min(hops) AS hops FROM bfs GROUP BY id ORDER BY id""".stripMargin),
      env => {
        // pinned once: the edge aggregate feeds both the source pick and
        // the BFS (which re-pins internally — cheap copy of 2.5k rows —
        // so the expensive co-occurrence aggregate runs exactly once)
        val edges = GraphOps.coOccurrenceEdges(
          env.lineitem.select("l_orderkey", "l_partkey"),
          "l_orderkey", "l_partkey", minWeight = 2L)
          .select("a", "b").localCheckpoint()
        val nodes = edges.select(col("a").as("id"))
          .union(edges.select(col("b").as("id"))).distinct()
        val sources = RelOps.topK(3, Seq(col("id")))(nodes)
        GraphOps.shortestHops(edges, sources, maxHops = 4)
          .orderBy("id")
      })
  )
}
