package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** word2phrase scoring and phrase merging (Phrases). */
class PhrasesSpec extends SparkSuite {
  import spark.implicits._

  // "new york" appears 4×, its parts appear only in the phrase;
  // "of the" co-occurs but both parts are everywhere (low score)
  private def docs = Seq(
    (0L, "new york is one of the places of the coast"),
    (1L, "new york and new york of the hills"),
    (2L, "the of the of of new york the"))
    .toDF("doc_id", "text")

  test("score matches the hand-applied word2phrase formula") {
    val got = Phrases.phraseScores(docs, "doc_id", "text",
        delta = 1.0, minCount = 2L, threshold = 0.0)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // corpus: 26 tokens, c(new)=4 c(york)=4 c(new york)=4
    val expect = BigDecimal((4.0 - 1.0) * 26 / (4.0 * 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("new", "york"))._1 === 4L)
    assert(got(("new", "york"))._2 === expect)
  }

  test("discount δ kills pairs at or below it; minCount filters") {
    val s = Phrases.phraseScores(docs, "doc_id", "text",
        delta = 4.0, minCount = 2L, threshold = 0.0)
      .as[(String, String, Long, Double)].collect()
    // c(new york)=4 → score (4-4)·N/... = 0, not > 0
    assert(!s.exists(r => r._1 == "new" && r._2 == "york"))
  }

  test("mergePhrases fuses exactly the listed phrases, boundary-safe") {
    val out = Phrases.mergePhrases(docs, "text",
        Seq(("new", "york"), ("of", "the")), "phrased")
      .orderBy("doc_id").select("phrased").as[String].collect()
    assert(out(0) === "new_york is one of_the places of_the coast")
    assert(out(1) === "new_york and new_york of_the hills")
    // "the of the of of new york the": greedy left-to-right — the
    // first "of the" consumed the middle 'the'; lone of/the untouched
    assert(out(2) === "the of_the of of new_york the")
  }

  test("merge order matters and is the caller's list order") {
    val d = Seq((0L, "a b c")).toDF("doc_id", "text")
    val ab = Phrases.mergePhrases(d, "text",
      Seq(("a", "b"), ("b", "c")), "p").select("p").as[String].head()
    val bc = Phrases.mergePhrases(d, "text",
      Seq(("b", "c"), ("a", "b")), "p").select("p").as[String].head()
    assert(ab === "a_b c")
    assert(bc === "a b_c")
  }

  test("topPhrases returns (w1, w2) ranked by score desc") {
    val top = Phrases.topPhrases(docs, "doc_id", "text", k = 1,
      delta = 1.0, minCount = 2L, threshold = 0.0)
    assert(top === Seq(("new", "york")))
  }
}
