package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.Dedup

/** Native one-pass SimHash vs the composable explode×bits pipeline. */
class SimHashSigSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text altogether here"),
    (4L, "one"),
    (5L, ""),
    (6L, "  spaced   out\ttokens  "),
    (7L, "MiXeD Case TEXT"),
    (8L, ("repeat me " * 300).trim),
    (9L, "unicode héllo wörld tokens")
  ).toDF("doc_id", "text")

  test("native fingerprints equal the explode+groupBy pipeline") {
    val pipeline = Dedup.simhash(corpus, "doc_id", "text", bits = 16)
    val native = Dedup.simhashNative(corpus, "doc_id", "text", bits = 16)
    val mismatch = pipeline.alias("p").join(native.alias("n"), "doc_id")
      .filter(col("p.fingerprint") =!= col("n.fingerprint"))
    assert(mismatch.count() === 0)
    assert(native.count() === 9)
  }

  test("bit-width variants agree; near-dup docs land near in Hamming") {
    val p8 = Dedup.simhash(corpus, "doc_id", "text", bits = 8)
    val n8 = Dedup.simhashNative(corpus, "doc_id", "text", bits = 8)
    assert(p8.alias("p").join(n8.alias("n"), "doc_id")
      .filter(col("p.fingerprint") =!= col("n.fingerprint")).count() === 0)

    val fp = n8.as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // docs 1 and 2 differ by one word; doc 3 is unrelated
    assert(hamming(fp(1L), fp(2L)) <= hamming(fp(1L), fp(3L)))
  }
}
