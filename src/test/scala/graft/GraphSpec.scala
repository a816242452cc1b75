package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Connected components (large-star/small-star): correctness against a
  * brute-force transitive closure, adversarial shapes (long chains — the
  * case naive min-propagation needs O(n) rounds for), normalization, and
  * the min-id labeling contract. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Reference labeling: repeated relaxation on the driver. */
  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var label = nodes.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((a, b) <- edges) {
        val m = math.min(label(a), label(b))
        if (label(a) != m) { label += a -> m; changed = true }
        if (label(b) != m) { label += b -> m; changed = true }
      }
    }
    label
  }

  test("two disjoint components labeled by their min ids") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L))
    assert(cc(edges) == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (adversarial diameter for min-propagation)") {
    val n = 200L
    val edges = (1L until n).map(i => (i + 1, i))
    val got = cc(edges)
    assert(got.size == n)
    assert(got.values.forall(_ == 1L))
  }

  test("self-loops, duplicates and reversed edges are normalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute-force closure on a mixed random-ish graph") {
    // deterministic pseudo-random graph: hub, chain, cycle, singles pairs
    val edges = Seq(
      (10L, 11L), (10L, 12L), (10L, 13L), (13L, 14L),          // hub tree
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 30L),          // cycle
      (50L, 60L), (61L, 51L), (51L, 50L), (60L, 61L),          // tangled
      (70L, 71L),                                              // pair
      (2L, 80L), (80L, 3L))                                    // bridge
    assert(cc(edges) == bruteForce(edges))
  }

  test("empty edge list yields empty labeling") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("shared-child star is NOT a fixpoint (review regression)") {
    // {(1,5),(2,5)}: no parent is also a child, but node 5 has two
    // parents — the weak convergence test accepted this as converged and
    // emitted node 5 in TWO clusters. One component, min id 1.
    assert(cc(Seq((1L, 5L), (2L, 5L))) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("multi-parent shape mid-iteration converges to one component") {
    // {(1,3),(1,10),(2,3),(2,11)}: reachable as a frontier mid-iteration;
    // children 3 has parents 1 and 2 — all five nodes are one component
    val got = cc(Seq((1L, 3L), (1L, 10L), (2L, 3L), (2L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("representatives picks highest score, ties to smallest node") {
    val labeled = Seq(
      (2L, 1L, 10), (1L, 1L, 30), (3L, 1L, 30),   // cluster 1: 1 and 3 tie on score
      (5L, 5L, 7), (6L, 5L, 9))                   // cluster 5: 6 wins on score
      .toDF("node", "cluster", "score")
    val reps = Graph.representatives(labeled, "node", "cluster", "score")
      .select("cluster", "node").as[(Long, Long)].collect().toSet
    assert(reps == Set((1L, 1L), (5L, 6L)))
  }

  test("cluster column plugs into keeper selection") {
    val labeled = Graph.connectedComponents(
      Seq((4L, 2L), (2L, 7L), (9L, 8L)).toDF("a", "b"), "a", "b")
    val keepers = labeled.filter(col("node") === col("cluster"))
      .select("node").as[Long].collect().sorted
    assert(keepers.toSeq == Seq(2L, 8L))
  }

  test("pageRank: 2-cycle is uniform, mass sums to 1") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("id")
    val pr = Graph.pageRank(edges, nodes, "src", "dst", "id", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr(1L) - 0.5) < 1e-12 && math.abs(pr(2L) - 0.5) < 1e-12)
  }

  test("pageRank: star center accumulates; hand-computed 1 iteration") {
    // 1→3, 2→3, 3→1 ; N=3, p0=1/3, d=0.85
    // after 1 iter: pr(3) = 0.15/3 + 0.85*(1/3 + 1/3) = 0.61666...
    //   pr(1) = 0.15/3 + 0.85*(1/3) = 0.33333... ; pr(2) = 0.15/3 = 0.05
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val pr = Graph.pageRank(edges, nodes, "src", "dst", "id", iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr(3L) - (0.05 + 0.85 * (2.0 / 3.0))) < 1e-12)
    assert(math.abs(pr(1L) - (0.05 + 0.85 / 3.0)) < 1e-12)
    assert(math.abs(pr(2L) - 0.05) < 1e-12)
  }

  test("pageRank: mass conserved and dangling-free graph converges") {
    // every node has an out-link → Σ pr = 1 at any iteration
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val total = Graph.pageRank(edges, nodes, "src", "dst", "id", iters = 8)
      .agg(sum("pr")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9)
    // self-loops are dropped: a pure self-loop node becomes a sink for
    // its own edge but still receives the teleport share
    val withSelf = Seq((1L, 2L), (2L, 1L), (3L, 3L)).toDF("src", "dst")
    val pr3 = Graph.pageRank(withSelf, Seq(1L, 2L, 3L).toDF("id"),
        "src", "dst", "id", iters = 3)
      .filter(col("id") === 3L).select("pr").as[Double].head()
    assert(math.abs(pr3 - 0.05) < 1e-12) // (1-d)/N only
  }
}
