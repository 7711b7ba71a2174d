package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Lloyd's k-means over array columns (Clustering.kmeansFit /
  * assignCells) and SemDeDup semantic near-dup pairs. */
class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  // two tight direction-clusters in 3-d: {0,2,4} point along +x,
  // {1,3,5} along +y; first-k init (k=2) seeds one centroid in each
  // cluster (ids 0 and 1), so Lloyd's should converge immediately.
  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.1f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.1f, 0.9f, 0.0f)),
    (4L, Array(0.95f, 0.05f, 0.0f)),
    (5L, Array(0.0f, 0.95f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("kmeans separates direction clusters and assignment is stable") {
    val cents = Clustering.kmeansFit(corpus, "vec_id", "embedding",
      k = 2, iters = 3)
    assert(cents.count() === 2)
    val assigned = Clustering.assignCells(corpus, "vec_id", "embedding", cents)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    // x-cluster {0,2,4} together, y-cluster {1,3,5} together
    assert(assigned(0L) === assigned(2L) && assigned(2L) === assigned(4L))
    assert(assigned(1L) === assigned(3L) && assigned(3L) === assigned(5L))
    assert(assigned(0L) !== assigned(1L))
    // deterministic: a second run yields identical assignments
    val again = Clustering.assignCells(corpus, "vec_id", "embedding",
        Clustering.kmeansFit(corpus, "vec_id", "embedding", k = 2, iters = 3))
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    assert(again === assigned)
  }

  test("assignCells breaks cosine ties toward the lowest cell id") {
    val cents = Seq(
      (7L, Array(1.0, 0.0, 0.0)),
      (3L, Array(1.0, 0.0, 0.0))
    ).toDF("cell_id", "centroid")
    val got = Clustering.assignCells(corpus, "vec_id", "embedding", cents)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 3L))
  }

  test("a cell that loses every member drops out (k shrinks)") {
    // k=3 seeds ids 0,1,2; after one update the two x-like seeds (0,2)
    // and the y seed (1) compete — id 0 and id 2 both sit in the
    // x-cluster, so one of them may capture everything x-like. With
    // iters high enough the result must still cover all vectors.
    val cents = Clustering.kmeansFit(corpus, "vec_id", "embedding",
      k = 3, iters = 4)
    val nCells = cents.count()
    assert(nCells >= 1 && nCells <= 3)
    val assigned = Clustering.assignCells(corpus, "vec_id", "embedding", cents)
    assert(assigned.count() === 6)
  }

  test("semanticDupPairs finds near-dups only within a cell, id_a < id_b") {
    val cents = Clustering.kmeansFit(corpus, "vec_id", "embedding",
      k = 2, iters = 3)
    val pairs = Clustering.semanticDupPairs(corpus, "vec_id", "embedding",
      cents, threshold = 0.98)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.98 })
    // 0·4 = (1,0,0)·(.95,.05,0) → cos ≈ 0.9986 — must be found
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 4L })
    // cross-cluster pairs (e.g. 0 vs 1, cos ≈ 0.1) must not appear
    assert(!pairs.exists { case (a, b, _) => a == 0L && b == 1L })
  }

  test("assignCells refuses duplicate cell_ids with a caller-facing message") {
    val cents = Seq(
      (3L, Array(1.0, 0.0, 0.0)),
      (3L, Array(0.0, 1.0, 0.0)),
      (5L, Array(0.0, 0.0, 1.0))
    ).toDF("cell_id", "centroid")
    val e = intercept[IllegalArgumentException] {
      Clustering.assignCells(corpus, "vec_id", "embedding", cents)
    }
    assert(e.getMessage.contains("duplicate cell_id"))
    assert(e.getMessage.contains("3"))
  }

  test("semanticDupPairs rail refuses a fixed-k quadratic plan; the " +
      "explicit hatch runs it") {
    val cents = Clustering.kmeansFit(corpus, "vec_id", "embedding",
      k = 2, iters = 3)
    // 6 vectors in 2 cells of 3 → Σ c(c−1)/2 = 6 candidate pairs;
    // a budget of 5 must refuse with the evidence in the message
    val e = intercept[IllegalArgumentException] {
      Clustering.semanticDupPairs(corpus, "vec_id", "embedding", cents,
        threshold = 0.98, maxCandidatePairs = 5L)
    }
    assert(e.getMessage.contains("estimated candidate pairs 6"))
    assert(e.getMessage.contains("maxCandidatePairs=5"))
    assert(e.getMessage.contains("Long.MaxValue"))
    // the explicit fixed-k hatch produces exactly the default-rail rows
    val railed = Clustering.semanticDupPairs(corpus, "vec_id",
        "embedding", cents, threshold = 0.98)
      .as[(Long, Long, Double)].collect().toSet
    val hatch = Clustering.semanticDupPairs(corpus, "vec_id",
        "embedding", cents, threshold = 0.98,
        maxCandidatePairs = Long.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(hatch === railed && hatch.nonEmpty)
  }

  test("prototypesPrune drops the most prototypical per cell, keeps the hard") {
    val cents = Clustering.kmeansFit(corpus, "vec_id", "embedding",
      k = 2, iters = 3)
    // 3 members per cell; ceil(0.34·3)=2 pruned → exactly 1 kept per cell
    val got = Clustering.prototypesPrune(corpus, "vec_id", "embedding",
        cents, pruneFrac = 0.34)
      .select("vec_id", "cell_id", "ccos", "proto_rank", "n_cell", "keep")
      .as[(Long, Long, Double, Int, Long, Boolean)].collect().toSeq
    assert(got.length === 6)
    assert(got.forall(_._5 == 3L))
    val byCell = got.groupBy(_._2)
    byCell.values.foreach { cell =>
      // ranks are 1..n within the cell, ordered by descending ccos
      assert(cell.map(_._4).sorted === Seq(1, 2, 3))
      val kept = cell.filter(_._6)
      assert(kept.length === 1)
      // the kept example is the cell's LEAST prototypical (lowest ccos)
      assert(kept.head._3 === cell.map(_._3).min)
      assert(kept.head._4 === 3)
    }
  }

  test("prototypesPrune boundary fractions: 0 keeps all, 1 keeps none") {
    val cents = Clustering.kmeansFit(corpus, "vec_id", "embedding",
      k = 2, iters = 3)
    val all = Clustering.prototypesPrune(corpus, "vec_id", "embedding",
      cents, pruneFrac = 0.0)
    assert(all.filter(col("keep")).count() === 6)
    val none = Clustering.prototypesPrune(corpus, "vec_id", "embedding",
      cents, pruneFrac = 1.0)
    assert(none.filter(col("keep")).count() === 0)
    intercept[IllegalArgumentException] {
      Clustering.prototypesPrune(corpus, "vec_id", "embedding",
        cents, pruneFrac = 1.5)
    }
  }
}
