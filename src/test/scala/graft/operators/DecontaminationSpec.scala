package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Decontamination semantics: the broadcast-set overlap counts must equal
  * the composable exploded-join form, contaminated docs are exactly those
  * sharing an n-gram with the eval set, and the map-only plan really has
  * no corpus-side exchange. */
class DecontaminationSpec extends SparkSuite {
  import spark.implicits._

  // eval doc "a b c d"; train t1 shares "b c d", t2 shares nothing,
  // t3 is an exact copy, t4 is a single word (shingle = itself)
  private def evalDocs: DataFrame =
    Seq((100L, "a b c d")).toDF("doc_id", "text")
  private def corpus: DataFrame = Seq(
    (1L, "x y b c d z"), (2L, "p q r s t u"),
    (3L, "a b c d"), (4L, "w"))
    .toDF("doc_id", "text")

  private def report: Map[Long, (Long, Long)] =
    Decontamination.contamination(corpus, "doc_id", "text",
      Decontamination.evalNgramSet(evalDocs, "text", n = 3), n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("overlap counts: shared / disjoint / identical / short docs") {
    // eval 3-grams: {a b c, b c d}
    assert(report(1L) === (4L, 1L)) // shares "b c d"
    assert(report(2L) === (4L, 0L))
    assert(report(3L) === (2L, 2L)) // identical: both 3-grams shared
    assert(report(4L) === (1L, 0L)) // "w" vs eval set: no overlap
  }

  test("matches the composable exploded-join form") {
    val evalSh = Dedup.shingles(evalDocs, "doc_id", "text", n = 3)
      .select("shingle").distinct()
    val joined = Dedup.shingles(corpus, "doc_id", "text", n = 3)
      .distinct()
      .join(evalSh, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    report.foreach { case (id, (_, shared)) =>
      assert(joined.getOrElse(id, 0L) === shared, s"doc $id")
    }
  }

  test("decontaminate drops exactly the overlapping docs") {
    val kept = Decontamination.decontaminate(corpus, "doc_id", "text",
      Decontamination.evalNgramSet(evalDocs, "text", n = 3), n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
  }

  test("bloom path flags exactly the joined path's contaminated docs") {
    val evalTable = Decontamination.evalNgramTable(evalDocs, "text", n = 3)
    val bloomed = Decontamination.contaminationBloom(
      corpus, "doc_id", "text", evalTable, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val joined = Decontamination.contaminationJoined(
      corpus, "doc_id", "text", evalTable, n = 3)
      .filter(col("n_shared") >= 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bloomed === joined)
    assert(bloomed.keySet === Set(1L, 3L)) // zero-hit docs absent by contract
  }

  test("bloom false positives never reach the output (exact verify)") {
    // a sketch this small (16 items / 50% fpp over a disjoint 200-gram
    // corpus) WILL fire false positives; the verify join must kill every
    // one — the report is identical to the honest-sized sketch's
    val evalTable = Decontamination.evalNgramTable(evalDocs, "text", n = 3)
    val noise = (10L until 60L).map(i =>
      (i, s"n${i}a n${i}b n${i}c n${i}d n${i}e n${i}f"))
    val wide = corpus.union(noise.toDF("doc_id", "text"))
    def run(items: Long, fpp: Double): Map[Long, (Long, Long)] =
      Decontamination.contaminationBloom(wide, "doc_id", "text", evalTable,
        n = 3, expectedItems = items, fpp = fpp)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tiny = run(16L, 0.5)
    assert(tiny === run(1L << 20, 0.01))
    assert(tiny.keySet === Set(1L, 3L))
  }

  test("decontaminateBloom keeps exactly the clean docs") {
    val evalTable = Decontamination.evalNgramTable(evalDocs, "text", n = 3)
    val kept = Decontamination.decontaminateBloom(
      corpus, "doc_id", "text", evalTable, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
  }

  test("empty eval vocabulary: bloom path reports nothing contaminated") {
    // BloomFilterAggregate over zero rows yields a null sketch;
    // might_contain(null, …) is null → the prefilter keeps nothing and
    // the report is empty — same answer the joined path gives
    val emptyEval = Decontamination.evalNgramTable(
      evalDocs.filter(lit(false)), "text", n = 3)
    val out = Decontamination.contaminationBloom(
      corpus, "doc_id", "text", emptyEval, n = 3)
    assert(out.count() === 0L)
    val kept = Decontamination.decontaminateBloom(
      corpus, "doc_id", "text", emptyEval, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("bloom probe is a map-side filter under the verify join") {
    val evalTable = Decontamination.evalNgramTable(evalDocs, "text", n = 3)
    val df = Decontamination.contaminationBloom(
      corpus, "doc_id", "text", evalTable, n = 3)
    val plan = df.queryExecution.executedPlan.toString
    // the probe must sit in a Filter (before any exchange the semi-join
    // needs), not be rewritten into a join condition
    assert(plan.contains("might_contain"), s"no bloom probe in:\n$plan")
    val filterLine = plan.linesIterator
      .find(l => l.contains("Filter") && l.contains("might_contain"))
    assert(filterLine.nonEmpty, s"bloom probe not a Filter in:\n$plan")
  }

  test("corpus side of the plan is exchange-free") {
    val df = Decontamination.contamination(corpus, "doc_id", "text",
      Decontamination.evalNgramSet(evalDocs, "text", n = 3), n = 3)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the one-row eval aggregate's broadcast;
    // corpus rows must never hash-shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus rows shuffled:\n$plan")
  }

  test("evalNgramBloom rejects degenerate sizing up front") {
    import spark.implicits._
    val ev = Seq("a b c").toDF("text")
      .select(explode(split(col("text"), " ")).as("eval_ngram"))
    for ((items, fpp) <- Seq((0L, 0.01), (100L, 0.0), (100L, 1.0)))
      assertThrows[IllegalArgumentException] {
        Decontamination.evalNgramBloom(ev, items, fpp)
      }
  }
}
