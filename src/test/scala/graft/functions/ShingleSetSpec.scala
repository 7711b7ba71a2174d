package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.Dedup

/** Native shingle-set + sorted-merge Jaccard vs the composable
  * explode/distinct/join pipeline: identical jaccard values per pair. */
class ShingleSetSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"),
    (3L, "a wholly different document about storage engines and shuffles"),
    (4L, "short one"),
    (5L, ""),
    (6L, "the quick brown fox jumps over the lazy dog again and again"),
    (7L, "repeated shingle repeated shingle repeated shingle"),
    (8L, "unicode héllo wörld shingles appear here tôo")
  ).toDF("doc_id", "text")

  test("shingle_set equals distinct exploded shingles, sorted") {
    val viaExplode = Dedup.shingles(corpus, "doc_id", "text", n = 3)
      .distinct().groupBy("doc_id")
      .agg(sort_array(collect_list("shingle")).as("expected"))
    val native = corpus.select(col("doc_id"),
      ShingleSet.shingle_set(lower(substring(col("text"), 1, 4096)), 3)
        .as("got"))
    val mismatch = viaExplode.join(native, "doc_id")
      .filter(col("expected") =!= col("got"))
    assert(mismatch.count() === 0)
  }

  test("jaccardFromText equals the composable jaccard on all pairs") {
    val ids = corpus.select("doc_id").as[Long].collect()
    val pairs = (for (a <- ids; b <- ids if a < b) yield (a, b))
      .toSeq.toDF("id_a", "id_b")
    val sh = Dedup.shingles(corpus, "doc_id", "text", n = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val composable = rows(Dedup.jaccard(pairs, sh, "doc_id"))
    val native = rows(Dedup.jaccardFromText(pairs, corpus, "doc_id", "text",
      n = 3))
    assert(native === composable)
    // sanity: exact dup pair scores 1.0, near-dup close, disjoint 0
    val m = native.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((1L, 6L)) === 1.0)
    assert(m((1L, 2L)) > 0.5 && m((1L, 2L)) < 1.0)
    assert(m((1L, 3L)) === 0.0)
  }
}
