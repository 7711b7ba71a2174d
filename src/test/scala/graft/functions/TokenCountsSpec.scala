package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.{TextAnalysis, Vectorize}

/** The per-doc count kernels vs the relational explode → groupBy paths
  * they replaced: row-for-row identical (terms/slots, counts, and for
  * the kernels' arrays, ascending key order). */
class TokenCountsSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox the quick dog"),
    (2L, "a a a b b c"),
    (3L, ""),
    (4L, "   leading and trailing   "),
    (5L, "unicode héllo wörld héllo"),
    (6L, "single"),
    (7L, "x\ty\nz x\ty")
  ).toDF("doc_id", "text")

  private def toks = split(lower(col("text")), "\\s+")

  test("token_tf equals explode → groupBy(doc, term) counts") {
    val relational = corpus
      .select(col("doc_id"), explode(toks).as("__term"))
      .groupBy("doc_id", "__term").agg(count(lit(1)).as("__tf"))
    val kernel = corpus
      .select(col("doc_id"), explode(TokenTf.token_tf(toks)).as("__e"))
      .select(col("doc_id"), col("__e.term").as("__term"),
        col("__e.tf").as("__tf"))
    assert(kernel.exceptAll(relational).count() === 0)
    assert(relational.exceptAll(kernel).count() === 0)
    // ascending term order inside each array
    val arrays = corpus.select(TokenTf.token_tf(toks).as("a"))
      .select(col("a.term").as("terms")).as[Seq[String]].collect()
    arrays.foreach(ts => assert(ts === ts.sorted))
  }

  test("slot_tf equals explode → termSlot → groupBy(doc, slot) counts") {
    for (dim <- Seq(1, 7, 64)) {
      val relational = corpus
        .select(col("doc_id"), explode(toks).as("__term"))
        .select(col("doc_id"),
          Vectorize.termSlot(col("__term"), dim).as("slot"))
        .groupBy("doc_id", "slot").agg(count(lit(1)).as("cnt"))
      val kernel = corpus
        .select(col("doc_id"),
          explode(SlotTf.slot_tf(toks, dim)).as("__e"))
        .select(col("doc_id"), col("__e.slot").as("slot"),
          col("__e.cnt").as("cnt"))
      assert(kernel.exceptAll(relational).count() === 0, s"dim=$dim")
      assert(relational.exceptAll(kernel).count() === 0, s"dim=$dim")
    }
  }

  test("ngram_slot_tf equals the unigram+bigram explode path") {
    for (dim <- Seq(16, 256)) {
      val t = TextAnalysis.tokens(col("text"))
      val n = size(t)
      val bigrams = zip_with(
        slice(t, lit(1), greatest(n - 1, lit(0))),
        slice(t, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      val relational = corpus
        .select(col("doc_id"), explode(concat(t, bigrams)).as("__f"))
        .select(col("doc_id"), Vectorize.termSlot(col("__f"), dim).as("slot"))
        .groupBy("doc_id", "slot").agg(count(lit(1)).as("cnt"))
      val kernel = corpus
        .select(col("doc_id"),
          explode(NgramSlotTf.ngram_slot_tf(t, dim)).as("__e"))
        .select(col("doc_id"), col("__e.slot").as("slot"),
          col("__e.cnt").as("cnt"))
      assert(kernel.exceptAll(relational).count() === 0, s"dim=$dim")
      assert(relational.exceptAll(kernel).count() === 0, s"dim=$dim")
    }
  }

  test("empty and null arrays") {
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None),
      (3L, Some(Seq("a", "b", "a")))).toDF("id", "t")
    val got = df.select(col("id"), TokenTf.token_tf(col("t")).as("tf"),
        SlotTf.slot_tf(col("t"), 8).as("st"),
        NgramSlotTf.ngram_slot_tf(col("t"), 8).as("ng"))
      .orderBy("id").collect()
    assert(got(0).getSeq[Any](1).isEmpty)
    assert(got(0).getSeq[Any](2).isEmpty)
    assert(got(0).getSeq[Any](3).isEmpty)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got(2).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 2L), ("b", 1L)))
  }
}
