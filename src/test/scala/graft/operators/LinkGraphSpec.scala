package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSuite {
  import spark.implicits._

  test("pagerank: uniform on a symmetric cycle, mass approximately " +
    "conserved") {
    // 4-cycle: every node has in-degree 1 and out-degree 1 → rank stays
    // uniform at scale/n every round (integer arithmetic is exact here)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    val got = LinkGraph.pagerank(spark, edges, n = 4L, iters = 3)
      .orderBy("node").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(got.map(_.getLong(1)).toSeq ===
      Seq.fill(4)(250000000L))
  }

  test("pagerank: sink node accumulates, dangling mass redistributes") {
    // star into node 0, which has no outlinks (dangling)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r1 = LinkGraph.pagerank(spark, edges, n = 4L, iters = 1)
      .orderBy("node").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // round 1 by hand at scale 1e9: rank0 = 250000000 each.
    // dangling = node 0's 250000000; dm/n = 62500000.
    // node 0: base + 85*(3*250000000 + 62500000)/100
    val base = (15L * 250000000L) / 100L
    assert(r1(0L) === base + (85L * (750000000L + 62500000L)) / 100L)
    // nodes 1..3 get only the dangling share
    assert(r1(1L) === base + (85L * 62500000L) / 100L)
    assert(r1(1L) === r1(2L) && r1(2L) === r1(3L))
    // total mass stays within integer-truncation slack of scale
    val total = r1.values.sum
    assert(total <= 1000000000L && total > 999999900L)
  }

  test("syntheticHostEdges: deterministic, no self-loops, in range") {
    val docs = spark.range(200).select(col("id").as("doc_id"))
    val e1 = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 16)
      .orderBy("src", "dst").collect().toSeq
    val e2 = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 16)
      .orderBy("src", "dst").collect().toSeq
    assert(e1 === e2)
    assert(e1.nonEmpty)
    assert(e1.forall { r =>
      val (s, d) = (r.getLong(0), r.getLong(1))
      s != d && s >= 0 && s < 16 && d >= 0 && d < 16
    })
    // distinct collapsed parallel edges
    assert(e1.size === e1.distinct.size)
  }

  test("personalizedPagerank: one-round mass flow is exact; converged " +
      "ranks decay with distance from the seed") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    val r1 = LinkGraph.personalizedPagerank(spark, cycle, 4L, Seq(0L), 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1 by hand: all mass at the seed, one hop pushes 85% to 1
    assert(r1 === Map(0L -> 150000000L, 1L -> 850000000L,
      2L -> 0L, 3L -> 0L))
    val r = LinkGraph.personalizedPagerank(spark, cycle, 4L, Seq(0L), 20)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L) && r(2L) > r(3L))
    val total = r.values.sum
    assert(total <= 1000000000L && total > 999999000L)
  }

  test("hits: one round of mutual reinforcement, hand-computed with " +
      "the integer L1 renormalization") {
    // 2 is the strong authority (two hubs point at it), 0 the strong
    // hub (points at both authorities)
    val edges = Seq((0L, 2L), (1L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = LinkGraph.hits(spark, edges, n = 4L, iters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // h0 = 250000 each; a(2)=500000, a(3)=250000 → Σ=750000 →
    // a'(2)=666666, a'(3)=333333; h(0)=999999, h(1)=666666 →
    // Σ=1666665 → h'(0)=600000, h'(1)=400000 (both divisions exact)
    assert(got === Map(
      0L -> ((600000L, 0L)), 1L -> ((400000L, 0L)),
      2L -> ((0L, 666666L)), 3L -> ((0L, 333333L))))
  }

  test("hits: an empty graph renormalizes to all-zero, never " +
      "NULL/divide-by-zero; out-of-range PPR seeds are rejected") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = LinkGraph.hits(spark, empty, n = 3L, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got === Seq((0L, 0L, 0L), (1L, 0L, 0L), (2L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      LinkGraph.hits(spark, empty, n = 10L, iters = 1, scale = 5L)
    }
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      LinkGraph.personalizedPagerank(spark, edges, n = 4L,
        seeds = Seq(100L), iters = 1)
    }
  }

  test("triangleCounts: each triangle counted once per corner, " +
      "reverse/parallel edges collapse, non-members absent") {
    // triangle 0-1-2 (with a reversed duplicate edge) + pendant 2-3
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (0L, 2L), (2L, 3L))
      .toDF("src", "dst")
    val got = LinkGraph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("triangleCounts: two triangles sharing an edge") {
    // 0-1-2 and 1-2-3: edge (1,2) shared — 1 and 2 sit in two each
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val got = LinkGraph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("bfsHops: hop distances on a path, bounded by rounds, " +
      "direction-agnostic") {
    // path 0-1-2-3-4-5, edges deliberately mixed-direction
    val edges = Seq((1L, 0L), (1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L))
      .toDF("src", "dst")
    val got = LinkGraph.bfsHops(spark, edges, Seq(0L), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("bfsHops: multiple seeds take the nearest, seed distance wins " +
      "over a longer rediscovery") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = LinkGraph.bfsHops(spark, edges, Seq(0L, 3L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("pagerank: more in-links means more rank") {
    // 1,2,3 all point at 0; 0 points at 1 — 0 must outrank 2 and 3
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val r = LinkGraph.pagerank(spark, edges, n = 4L, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L) && r(2L) === r(3L))
  }
}
