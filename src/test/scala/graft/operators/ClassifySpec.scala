package graft.operators

import graft.SparkSuite

/** Multinomial Naive Bayes: model math, smoothing, vocab cap, OOV and
  * no-hit semantics, tie-breaks. */
class ClassifySpec extends SparkSuite {
  import spark.implicits._

  private val train = Seq(
    ("spam", "buy pills now"),
    ("spam", "buy now buy"),
    ("ham", "meeting notes today"),
    ("ham", "notes for the meeting")
  ).toDF("label", "text")

  private def ln6(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong

  test("model grid is complete and matches hand-computed smoothing") {
    val m = Classify.nbFit(train, "label", "text", vocabSize = 100)
    val rows = m.collect().map(r =>
      ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // vocab = all 8 distinct terms; every (class, term) pair present
    assert(rows.size == 16)
    // priors: 2/4 each
    assert(rows(("spam", "buy"))._2 == ln6(0.5))
    assert(rows(("ham", "buy"))._2 == ln6(0.5))
    // spam tokens: buy=3, pills=1, now=2 → total 6; V=8
    assert(rows(("spam", "buy"))._1 == ln6((3.0 + 1) / (6 + 8)))
    assert(rows(("spam", "meeting"))._1 == ln6(1.0 / 14))
    // ham tokens: meeting=2, notes=2, today=1, for=1, the=1 → total 7
    assert(rows(("ham", "meeting"))._1 == ln6(3.0 / 15))
  }

  test("vocab cap keeps the top-V terms by (count desc, term asc)") {
    val m = Classify.nbFit(train, "label", "text", vocabSize = 3)
    val vocab = m.select("term").distinct().as[String].collect().toSet
    // counts: buy 3, meeting 2, notes 2, now 2 → top-3 ties broken
    // alphabetically: buy, meeting, notes
    assert(vocab == Set("buy", "meeting", "notes"))
  }

  test("prediction picks the argmax class; OOV tokens are ignored") {
    val m = Classify.nbFit(train, "label", "text", vocabSize = 100)
    val test = Seq((1L, "buy pills"), (2L, "meeting notes"),
      (3L, "unseen words only")).toDF("doc_id", "text")
    val byId = Classify.nbPredict(m, test, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2))))
      .toMap
    assert(byId(1L)._1 == "spam")
    assert(byId(2L)._1 == "ham")
    // doc 3: no vocab hits → priors only → tie at ln(0.5) → label asc
    assert(byId(3L)._1 == "ham")
    assert(byId(3L)._2 == ln6(0.5) / 1e6)
  }

  test("scores are exact integer-scaled log sums") {
    val m = Classify.nbFit(train, "label", "text", vocabSize = 100)
    val test = Seq((1L, "buy buy pills")).toDF("doc_id", "text")
    val out = Classify.nbPredict(m, test, "doc_id", "text").collect().head
    val expected = (ln6(0.5) + 2 * ln6(4.0 / 14) + ln6(2.0 / 14)) / 1e6
    assert(out.getString(1) == "spam")
    assert(out.getDouble(2) == expected)
  }

  test("nbMargin: top-2 pivot matches prediction, exact subtraction, " +
      "prior-tie docs get margin 0") {
    val m = Classify.nbFit(train, "label", "text", vocabSize = 100)
    val test_ = Seq((1L, "buy pills"), (3L, "unseen words only"))
      .toDF("doc_id", "text")
    val out = Classify.nbMargin(m, test_, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getString(2), r.getDouble(3)))).toMap
    // doc 1: spam wins; margin = spamScore - hamScore, both exact
    val spamScore = (ln6(0.5) + ln6(4.0 / 14) + ln6(2.0 / 14)) / 1e6
    val hamScore = (ln6(0.5) + ln6(1.0 / 15) + ln6(1.0 / 15)) / 1e6
    assert(out(1L)._1 == "spam" && out(1L)._2 == "ham")
    assert(out(1L)._3 ==
      BigDecimal(spamScore - hamScore)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 3: no vocab hits → equal priors → margin exactly 0, labels
    // ordered alphabetically by the tie rule
    assert(out(3L) == (("ham", "spam", 0.0)))
  }

  test("nbMargin rejects a single-class model instead of returning " +
      "null margins") {
    val m = Classify.nbFit(Seq(("only", "x y")).toDF("label", "text"),
      "label", "text", vocabSize = 10)
    val test_ = Seq((1L, "x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Classify.nbMargin(m, test_, "doc_id", "text")
    }
    assert(e.getMessage.contains(">= 2 classes"))
  }

  test("a class absent from the vocab-hit space still scores") {
    // vocab restricted so one class owns all vocab terms
    val skew = Seq(("a", "x x x"), ("b", "y")).toDF("label", "text")
    val m = Classify.nbFit(skew, "label", "text", vocabSize = 1) // vocab = {x}
    val test = Seq((1L, "y y")).toDF("doc_id", "text")
    // y is OOV → priors only: a has 2/3 of docs? no — 1/2 each; tie → "a"
    val out = Classify.nbPredict(m, test, "doc_id", "text").collect().head
    assert(out.getString(1) == "a")
  }

  test("frozen-projection nbPredict/nbMargin == the join-shaped " +
      "scoredRanked oracle, row for row") {
    import org.apache.spark.sql.functions._
    val m = Classify.nbFit(train, "label", "text", vocabSize = 100)
    val docs = Seq(
      (1L, "buy pills now now"), (2L, "meeting notes"),
      (3L, "zzz qqq"), (4L, "buy meeting"), (5L, ""),
      (6L, "notes buy notes pills"), (7L, "the the the"),
      (8L, "today for now")
    ).toDF("doc_id", "text")
    val ranked = Classify.scoredRanked(m, docs, "doc_id", "text")
    val oldPredict = ranked.filter(col("__rn") === 1)
      .select("doc_id", "label", "score")
    val oldMargin = ranked.filter(col("__rn") <= 2)
      .groupBy("doc_id")
      .agg(
        max(when(col("__rn") === 1, col("label"))).as("top_label"),
        max(when(col("__rn") === 2, col("label"))).as("second_label"),
        round(max(when(col("__rn") === 1, col("score"))) -
          max(when(col("__rn") === 2, col("score"))), 6).as("margin"))
    val newPredict = Classify.nbPredict(m, docs, "doc_id", "text")
    val newMargin = Classify.nbMargin(m, docs, "doc_id", "text")
    assert(newPredict.exceptAll(oldPredict).count() === 0)
    assert(oldPredict.exceptAll(newPredict).count() === 0)
    assert(newMargin.exceptAll(oldMargin).count() === 0)
    assert(oldMargin.exceptAll(newMargin).count() === 0)
  }

  test("nbScoreFrozen == nbPredict per doc: argmax, exact scores, ties, " +
      "OOV-only and repeated-token docs") {
    val m = Classify.nbFit(train, "label", "text", vocabSize = 100)
    val docs = Seq(
      (1L, "buy pills now now"),           // repeated token counts twice
      (2L, "meeting notes"),
      (3L, "zzz qqq"),                     // OOV-only → priors-only tie
      (4L, "buy meeting"),                 // contested
      (5L, "")                             // empty text
    ).toDF("doc_id", "text")
    val joined = Classify.nbPredict(m, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    val frozen = Classify.nbFreeze(m)
    assert(frozen.labels === Seq("ham", "spam"))
    val inline = Classify.nbScoreFrozen(frozen, docs, "text")
      .select("doc_id", "predicted", "score")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(inline === joined)
    // every input column survives the projection
    val cols = Classify.nbScoreFrozen(frozen, docs, "text").columns.toSeq
    assert(cols === Seq("doc_id", "text", "predicted", "score"))
    // reserved-column refusal
    val bad = docs.withColumn("predicted",
      org.apache.spark.sql.functions.lit("x"))
    intercept[IllegalArgumentException] {
      Classify.nbScoreFrozen(frozen, bad, "text")
    }
  }
}
