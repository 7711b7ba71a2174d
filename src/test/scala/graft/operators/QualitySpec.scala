package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSuite {
  import spark.implicits._
  import Quality._

  // (id, grp, v, flag) with one violation of each kind planted
  private lazy val df = Seq(
    (Some(1L), "a", Some(5.0), "X"),
    (Some(2L), "a", Some(50.0), "Y"),  // range violation
    (None, "b", Some(3.0), "X"),       // null id
    (Some(4L), "b", None, "Z"),        // null v: NOT a range violation
    (Some(5L), "c", Some(7.0), "Q"),   // accepted-values violation
    (Some(5L), "c", Some(8.0), "X"),   // duplicate (id) with row above
    (Some(9L), "zz", Some(1.0), "X")   // grp has no dim row -> FK viol
  ).toDF("id", "grp", "v", "flag")

  private lazy val dim = Seq("a", "b", "c").toDF("g")

  test("validate: one verdict per rule with exact violation counts") {
    val got = validate(df, Seq(
        NotNull("id"),
        InRange("v", 0.0, 10.0),
        AcceptedValues("flag", Seq("X", "Y", "Z")),
        Unique(Seq("id")),
        ForeignKey(Seq("grp"), dim, Seq("g"))))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("accepted_values(flag)", 7L, 1L, false),
      ("foreign_key(grp)", 7L, 1L, false),
      ("in_range(v,0.0,10.0)", 7L, 1L, false),
      ("not_null(id)", 7L, 1L, false),
      // 7 rows, 6 distinct ids (null counts as a key value): 1 excess
      ("unique(id)", 7L, 1L, false)))
  }

  test("a clean table passes every rule; null FK keys are NotNull's business") {
    val clean = Seq((Some(1L), "a"), (Some(2L), "b"),
      (None, "c") // null key: not an FK violation
    ).toDF("id", "grp")
    val got = validate(clean, Seq(
        Unique(Seq("id", "grp")),
        ForeignKey(Seq("id"), Seq(1L, 2L).toDF("k"), Seq("k"))))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("foreign_key(id)", 3L, 0L, true),
      ("unique(id,grp)", 3L, 0L, true)))
  }

  test("row+unique rules share ONE corpus aggregate (single Expand, " +
      "no per-rule scans in the verdict plan)") {
    // the corpus pass runs eagerly at validate() time and is
    // checkpointed; the returned plan reads only the one-row result
    // (plus FK anti-joins when present)
    val verdicts = validate(df, Seq(NotNull("id"),
      InRange("v", 0.0, 10.0), Unique(Seq("id"))))
    val p = verdicts.queryExecution.executedPlan.toString
    assert(!p.contains("LocalTableScan [id"),
      s"verdict plan re-scans the corpus:\n$p")
  }
}
