package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.Dedup

/** Native one-pass MinHash signature vs the composable
  * shingles→md5→groupBy-min pipeline: value-for-value parity on texts
  * covering every tokenization edge the split/shingle path produces. */
class MinHashSigSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
    (3L, "short doc"),                    // fewer tokens than the window
    (4L, "one"),                          // single token
    (5L, ""),                             // empty text
    (6L, "  leading and trailing spaces  "), // empty split tokens
    (7L, "tabs\tand\nnewlines   collapse"),
    (8L, "MiXeD Case TEXT lowercases"),
    (9L, ("repeat me " * 300).trim),      // > maxChars truncation
    (10L, "unicode: héllo wörld ünïcode tokens")
  ).toDF("doc_id", "text")

  test("native signature equals the explode+groupBy pipeline, all edges") {
    val viaPipeline = Dedup.minhashSignature(
      Dedup.shingles(corpus, "doc_id", "text", n = 3), "doc_id", numHashes = 8)
    val native = Dedup.minhashSignatureFromText(corpus, "doc_id", "text",
      numHashes = 8, n = 3)
    val joined = viaPipeline.alias("p").join(native.alias("m"), "doc_id")
    val mismatches = (0 until 8).map(i =>
      joined.filter(col(s"p.h$i") =!= col(s"m.h$i")).count()).sum
    assert(mismatches === 0)
    assert(native.count() === 10)
    // dup docs produce identical signatures
    val sigs = native.filter(col("doc_id") <= 2)
      .drop("doc_id").distinct().count()
    assert(sigs === 1)
  }

  test("parameter variants stay in parity (k=4, n=2, tight maxChars)") {
    val viaPipeline = Dedup.minhashSignature(
      Dedup.shingles(corpus, "doc_id", "text", n = 2, maxChars = 64),
      "doc_id", numHashes = 4)
    val native = Dedup.minhashSignatureFromText(corpus, "doc_id", "text",
      numHashes = 4, n = 2, maxChars = 64)
    val joined = viaPipeline.alias("p").join(native.alias("m"), "doc_id")
    val mismatches = (0 until 4).map(i =>
      joined.filter(col(s"p.h$i") =!= col(s"m.h$i")).count()).sum
    assert(mismatches === 0)
  }
}
