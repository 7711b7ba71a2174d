package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** DSIR invariants: selection pulls toward the target distribution, the
  * λ table covers the full bucket space, scores are partitioning-
  * invariant (integer-scaled sums), and resampling nests. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  // two clearly separated vocabularies: "good" docs share the target's
  // tokens, "bad" docs use a disjoint vocabulary
  private def corpus: DataFrame =
    ((0L until 30L).map(i => (i, s"alpha beta gamma delta tok$i")) ++
      (30L until 60L).map(i => (i, s"zig zag zork quux junk$i")))
      .toDF("doc_id", "text")

  private def target: DataFrame =
    (100L until 110L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")

  test("target-like docs score above off-target docs") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", target, 128)
      .as[(Long, Double)].collect().toMap
    val good = (0L until 30L).map(w).min
    val bad = (30L until 60L).map(w).max
    assert(good > bad,
      s"min target-like $good should exceed max off-target $bad")
  }

  test("logratio table is dense over [0, dim) with zero-count smoothing") {
    val lam = Dsir.logRatioTable(corpus, "doc_id", "text", target, 64)
    assert(lam.count() === 64)
    assert(lam.select("slot").as[Long].collect().toSet === (0L until 64L).toSet)
  }

  test("weights are invariant to input partitioning") {
    def w(df: DataFrame): Map[Long, Double] =
      Dsir.importanceWeights(df, "doc_id", "text", target, 128)
        .as[(Long, Double)].collect().toMap
    assert(w(corpus.repartition(7)) === w(corpus.coalesce(1)))
  }

  test("resample nests: top-5 of a 10-sample is the 5-sample") {
    def ids(k: Int): Seq[Long] =
      Dsir.resample(corpus, "doc_id", "text", target, 128, k)
        .orderBy("sample_score", "doc_id")
        .select("doc_id").as[Long].collect().toSeq
    assert(ids(10).take(5) === ids(5))
  }

  test("resample draws target-like docs overwhelmingly") {
    val picked = Dsir.resample(corpus, "doc_id", "text", target, 128, 10)
      .select("doc_id").as[Long].collect().toSet
    // exp(logratio) gaps are astronomic between the two vocab groups
    assert(picked.forall(_ < 30L), s"off-target doc selected: $picked")
  }

  test("a doc with no target-overlapping features still gets a score") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", target, 128)
    assert(w.count() === 60)
    assert(w.filter(col("logratio").isNull).count() === 0)
  }
}
