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
}
