package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unigram-LM quality scoring semantics (the column-expression text
  * operators are covered by the DuckDB oracles; the model/score split
  * and OOV floor need unit-level checks). */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("unigramLogLoss: common text scores lower than rare; OOV pays the floor") {
    val reference = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.unigramModel(reference, "text")
    // vocabulary: the=3, cat=2, sat=2, ran=1, dog=1; total=9
    val m = model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("the" -> 3L, "cat" -> 2L, "sat" -> 2L,
      "ran" -> 1L, "dog" -> 1L))

    val scored = TextAnalysis.unigramLogLoss(
      Seq((10L, "the cat sat"), (11L, "cat ran dog"),
        (12L, "zzz qqq www")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // common trigram < rare words < pure OOV
    assert(scored(10L) < scored(11L))
    assert(scored(11L) < scored(12L))
    // OOV floor: every token unseen → -ln(1/(9+1)) = ln(10)
    assert(math.abs(scored(12L) - math.log(10.0)) < 1e-4)
    // exact common-case value: avg(-ln(3/10), -ln(2/10), -ln(2/10))
    val expect = -(math.log(0.3) + 2 * math.log(0.2)) / 3
    assert(math.abs(scored(10L) - expect) < 1e-4)
  }

  test("c4Rules: line filters, page kills, and text reconstruction") {
    val good = "here is a good first sentence.\n" +
      "and here is a second good one!\n" +
      "short line.\n" + // < 5 words → dropped
      "a third sentence closes the page?\n" +
      "no terminal punctuation so dropped here"
    val js = "click here to enable javascript on your page.\n" +
      "a normal line that survives the filter.\n" +
      "another normal line that also survives fine.\n" +
      "and one more normal line to clear minimum!"
    val lorem = "lorem ipsum dolor sit amet consectetur adipiscing.\n" +
      "this page would otherwise have enough lines here.\n" +
      "because all three of them end properly."
    val code = "this page has function signatures like f() {\n" +
      "so it gets dropped entirely as code even though.\n" +
      "it would have enough proper lines otherwise ok."
    val out = TextAnalysis.c4Rules(
      Seq((1L, good), (2L, js), (3L, lorem), (4L, code))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(6))).toMap
    // good: 5 lines, 3 survive (short + unpunctuated dropped) → keep
    assert(out(1L)._1 === 5L && out(1L)._2 === 3L && out(1L)._4 === true)
    assert(out(1L)._3 ===
      "here is a good first sentence.\nand here is a second good one!\n" +
        "a third sentence closes the page?")
    // javascript line dropped → only 3 survive → still keeps (== minLines)
    assert(out(2L)._2 === 3L && out(2L)._4 === true)
    assert(!out(2L)._3.contains("javascript"))
    // lorem ipsum and curly-brace pages die regardless of line count
    assert(out(3L)._4 === false && out(4L)._4 === false)
  }

  test("bigramLogLoss: hand-computed interpolated probabilities") {
    import spark.implicits._
    // ref "a b a b": bigrams (a,b)=2 (b,a)=1; contexts a=2 b=1;
    // unigrams a=2 b=2, total=4
    val ref = Seq((9L, "a b a b")).toDF("doc_id", "text")
    val doc = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogLoss(doc, "doc_id", "text", ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // (a,b): ½·(2/2) + ½·(2/5) = 0.7 ; (b,c): ½·0 + ½·(1/5) = 0.1
    val want = BigDecimal((-math.log(0.7) - math.log(0.1)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq((1L, 2L, want))) // one-token doc 2 emits no row
  }

  test("kneserNeyLogLoss: discount, escape mass, continuation floor " +
      "hand-computed") {
    import spark.implicits._
    // ref "a b a b a c": bigrams (a,b)=2 (b,a)=2 (a,c)=1;
    // ctx a: c1=3 n1f=2, b: c1=2 n1f=1; cont a=1 b=1 c=1; types nt=3
    val ref = Seq((9L, "a b a b a c")).toDF("doc_id", "text")
    val doc = Seq(
      (1L, "a b"),   // seen bigram: (2-.75)/3 + (.75·2/3)·(1/3)
      (2L, "c a"),   // unseen CONTEXT c → pure continuation 1/3
      (3L, "a z")    // seen ctx, unseen cont → escape × 1/(nt+1) floor
    ).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLogLoss(doc, "doc_id", "text", ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    def r4(p: Double): Double = BigDecimal(-math.log(p))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      (1L, 1L, r4(1.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3))),
      (2L, 1L, r4(1.0 / 3)),
      (3L, 1L, r4((0.75 * 2 / 3) * 0.25))))
  }
}
