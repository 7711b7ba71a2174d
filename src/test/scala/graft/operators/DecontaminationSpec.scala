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

  test("corpus side of the plan is exchange-free") {
    val df = Decontamination.contamination(corpus, "doc_id", "text",
      Decontamination.evalNgramSet(evalDocs, "text", n = 3), n = 3)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the one-row eval aggregate's broadcast;
    // corpus rows must never hash-shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus rows shuffled:\n$plan")
  }
}
