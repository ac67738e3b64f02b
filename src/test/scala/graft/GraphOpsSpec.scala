package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Pins the graph operators: triangle counting via degree-ordered
  * orientation must equal the naive a<b<c wedge join (on fixtures with
  * known counts AND on a pseudo-random graph), and pageRank must match
  * hand-derived closed forms on symmetric fixtures plus conserve total
  * rank mass on arbitrary graphs.
  */
class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("a", "b")

  private def naiveTriangles(e: DataFrame): Long =
    e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()

  test("triangleStats: K4 has 4 triangles, 12 wedges, coefficient 1.0") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val row = GraphOps.triangleStats(k4).head()
    assert(row.getAs[Long]("n_edges") == 6L)
    assert(row.getAs[Long]("n_wedges") == 12L)
    assert(row.getAs[Long]("n_triangles") == 4L)
    assert(row.getAs[Double]("clustering_coeff") == 1.0)
  }

  test("triangleStats: K4 minus an edge has 2 triangles") {
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(GraphOps.triangleStats(g).head().getAs[Long]("n_triangles") == 2L)
  }

  test("triangleStats: star graph has 0 triangles, n-choose-2 wedges") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    val row = GraphOps.triangleStats(star).head()
    assert(row.getAs[Long]("n_triangles") == 0L)
    assert(row.getAs[Long]("n_wedges") == 10L) // 5 choose 2 at the hub
  }

  test("triangleStats equals the naive wedge join on a pseudo-random graph") {
    // ~200 nodes, hash-derived edges (deterministic), skewed degrees via
    // modular clustering — exercises the orientation tie-breaks
    val g = spark.range(0, 3000)
      .select((pmod(col("id") * 2654435761L, lit(199)) + 1).as("a"),
        (pmod(col("id") * 40503L + 7, lit(199)) + 1).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val got = GraphOps.triangleStats(g).head().getAs[Long]("n_triangles")
    assert(got == naiveTriangles(g))
  }

  test("pageRank on a regular graph is uniform at every iteration") {
    // C4 cycle: all degrees 2, symmetric — rank stays exactly 1/4
    val c4 = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val ranks = GraphOps.pageRank(c4, iters = 3)
      .select("id", "r").as[(Long, Double)].collect().toMap
    assert(ranks.size == 4)
    ranks.values.foreach(r => assert(math.abs(r - 0.25) < 1e-9))
  }

  test("pageRank on a 3-star: closed form after one iteration") {
    // hub 1 with leaves 2,3,4 (N=4, d=0.85):
    // leaf' = 0.15/4 + 0.85 * (r_hub/deg_hub) = 0.0375 + 0.85 * (0.25/3)
    // hub'  = 0.15/4 + 0.85 * 3*(r_leaf/1) = 0.0375 + 0.85*0.75
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L))
    val ranks = GraphOps.pageRank(star, iters = 1)
      .select("id", "r").as[(Long, Double)].collect().toMap
    assert(math.abs(ranks(1L) - (0.0375 + 0.85 * 0.75)) < 1e-9)
    Seq(2L, 3L, 4L).foreach { leaf =>
      assert(math.abs(ranks(leaf) - (0.0375 + 0.85 * 0.25 / 3)) < 1e-9)
    }
  }

  test("pageRank conserves total rank mass (no dangling nodes)") {
    val g = spark.range(0, 500)
      .select((pmod(col("id") * 48271L, lit(73)) + 1).as("a"),
        (pmod(col("id") * 16807L + 3, lit(73)) + 1).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val total = GraphOps.pageRank(g, iters = 4)
      .agg(sum("r")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("coOccurrenceEdgesByBasket equals the self-join on duplicate-free incidence") {
    val inc = spark.range(0, 4000)
      .select((col("id") % 613).as("g"), (col("id") % 89).as("item"))
      .distinct()
    val a = GraphOps.coOccurrenceEdges(inc, "g", "item")
      .as[(Long, Long, Long)].collect().toSet
    val b = GraphOps.coOccurrenceEdgesByBasket(inc, "g", "item")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("coOccurrenceEdges equals the self-join formulation ON duplicate-" +
    "carrying incidence (multiplicity preserved, equal-value pairs dropped)") {
    // group 10 holds item 1 TWICE: pair (1,2) must count multiplicity
    // 2·1 = 2, and the duplicate must NOT produce a degenerate (1,1) edge
    val inc = Seq((10L, 1L), (10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (20L, 3L), (30L, 3L)).toDF("g", "item")
    val basket = GraphOps.coOccurrenceEdges(inc, "g", "item")
      .as[(Long, Long, Long)].collect().toSet
    val selfJoin = GraphOps.coOccurrenceEdgesBySelfJoin(inc, "g", "item")
      .as[(Long, Long, Long)].collect().toSet
    assert(basket === selfJoin)
    assert(basket.contains((1L, 2L, 3L)), s"got $basket") // 2 from g=10 + 1 from g=20
    assert(!basket.exists { case (a, b, _) => a == b })
  }

  test("coOccurrenceEdges counts shared groups and respects minWeight") {
    val inc = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L)).toDF("g", "item")
    val all = GraphOps.coOccurrenceEdges(inc, "g", "item")
      .as[(Long, Long, Long)].collect().toSet
    assert(all == Set((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val thinned = GraphOps.coOccurrenceEdges(inc, "g", "item", minWeight = 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(thinned == Set((1L, 2L, 3L)))
  }

  test("shortestHops: min distances on a path + branch, hop cap respected, " +
      "disconnected component unreached") {
    // 1-2-3-4-5 path, 3-6 branch, {8,9} a separate component
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L), (8L, 9L))
    val src = Seq(1L).toDF("id")
    val got = GraphOps.shortestHops(g, src, maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 6L -> 3, 5L -> 4))
    // hop cap truncates discovery, never distorts distances below it
    val capped = GraphOps.shortestHops(g, src, maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("shortestHops: multi-source takes the MINIMUM over sources and " +
      "edges are traversed undirected") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // sources at both ends: middle node 3 is 2 hops from either
    val got = GraphOps.shortestHops(g, Seq(1L, 5L).toDF("id"), maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
    // a<b edge (4,5) reached walking b->a proves symmetrization
    val fromEnd = GraphOps.shortestHops(g, Seq(5L).toDF("id"), maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(fromEnd(1L) == 4)
  }
}
