package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Gap sessionization: split rules, tie-breaks, determinism, and the
  * one-shuffle plan shape. */
class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  // user 1: [0,10] gap [100,110] gap [400]; user 2: single event
  private def events: DataFrame = Seq(
    (1L, 0L, "a"), (1L, 10L, "b"), (1L, 100L, "c"), (1L, 110L, "d"),
    (1L, 400L, "e"), (2L, 5L, "f")
  ).toDF("user_id", "ts", "eid")

  test("byGap splits on gaps strictly greater than gapS") {
    val got = Sessionize.byGap(events, Seq("user_id"), "ts", gapS = 50L)
      .select("user_id", "ts", "session_seq")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 100L, 2L), (1L, 110L, 2L),
      (1L, 400L, 3L), (2L, 5L, 1L)))
  }

  test("a gap of exactly gapS stays inside the session") {
    val df = Seq((1L, 0L, "a"), (1L, 50L, "b"), (1L, 101L, "c"))
      .toDF("user_id", "ts", "eid")
    val seqs = Sessionize.byGap(df, Seq("user_id"), "ts", gapS = 50L)
      .orderBy("ts").select("session_seq").as[Long].collect().toSeq
    assert(seqs === Seq(1L, 1L, 2L))
  }

  test("equal timestamps: tieBreak makes numbering deterministic") {
    val df = Seq((1L, 0L, "b"), (1L, 0L, "a"), (1L, 60L, "c"))
      .toDF("user_id", "ts", "eid")
    def run(d: DataFrame): Seq[(String, Long)] =
      Sessionize.byGap(d, Seq("user_id"), "ts", 50L, tieBreak = Seq("eid"))
        .select("eid", "session_seq").as[(String, Long)]
        .collect().sortBy(_._1).toSeq
    val got = run(df)
    assert(got === Seq(("a", 1L), ("b", 1L), ("c", 2L)))
    assert(got === run(df.repartition(7)))
  }

  test("sessionStats: counts, bounds, duration, extra aggs") {
    val got = Sessionize.sessionStats(
      events.withColumn("v", lit(2.0)), Seq("user_id"), "ts", 50L,
      tieBreak = Seq("eid"), extraAggs = Seq(sum("v").as("total_v")))
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "start_ts", "end_ts",
        "duration_s", "total_v")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 2L, 0L, 10L, 10L, 4.0),
      (1L, 2L, 2L, 100L, 110L, 10L, 4.0),
      (1L, 3L, 1L, 400L, 400L, 0L, 2.0),
      (2L, 1L, 1L, 5L, 5L, 0L, 2.0)))
  }

  test("plan: ONE exchange for byGap (lag and running sum share the " +
      "key partition), no join nodes") {
    val plan = Sessionize.byGap(events, Seq("user_id"), "ts", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <=1 exchange:\n$plan")
  }
}
