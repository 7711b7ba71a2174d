package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def events(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  test("funnel: earliest-first sequential completion inside the window") {
    val df = events(
      // user 1: clean 3-stage completion
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // user 2: purchase BEFORE click — depth 2 only
      (2L, 100L, "view"), (2L, 150L, "purchase"), (2L, 200L, "click"),
      // user 3: click outside the window
      (3L, 100L, "view"), (3L, 100000L, "click"),
      // user 4: never viewed — not in output
      (4L, 100L, "click"), (4L, 200L, "purchase"))
    val got = Funnel.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowS = 1000L)
      .orderBy("user_id")
    assert(got.columns.toSeq ===
      Seq("user_id", "s1_ts", "s2_ts", "s3_ts", "funnel_depth"))
    assert(got.collect().toSeq === Seq(
      Row(1L, 100L, 200L, 300L, 3),
      Row(2L, 100L, 200L, null, 2),
      Row(3L, 100L, null, null, 1)))
  }

  test("funnel: earliest stage-1 anchors the window even if a later " +
    "entry would convert") {
    // entering at ts=100 misses the click at 5000 (window 1000); the
    // second view at 4900 WOULD catch it, but earliest-first semantics
    // anchor at 100 — this pins the anchor rule
    val df = events(
      (1L, 100L, "view"), (1L, 4900L, "view"), (1L, 5000L, "click"))
    val got = Funnel.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click"), windowS = 1000L)
    assert(got.collect().toSeq === Seq(Row(1L, 100L, null, 1)))
  }

  test("funnel: same-timestamp events never advance two stages at once") {
    val df = events(
      (1L, 100L, "view"), (1L, 100L, "click"), (1L, 200L, "click"))
    val got = Funnel.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click"), windowS = 1000L)
    // the ts=100 click ties stage 1's completion — strict > skips it
    assert(got.collect().toSeq === Seq(Row(1L, 100L, 200L, 2)))
  }

  test("cohortRetention: triangle counts, offsets, and ppm rates") {
    val wk = 604800L
    val df = Seq(
      // users 1,2 start week 0; user 1 returns weeks 1 and 2
      (1L, 10L), (1L, wk + 5L), (1L, 2 * wk + 5L),
      (2L, 20L),
      // user 3 starts week 1, returns week 2; two events same week
      // count once
      (3L, wk + 1L), (3L, wk + 2L), (3L, 2 * wk + 1L))
      .toDF("user_id", "ts")
    val got = Funnel.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
    assert(got.collect().toSeq === Seq(
      Row(0L, 0L, 2L, 2L, 1000000L),
      Row(0L, 1L, 1L, 2L, 500000L),
      Row(0L, 2L, 1L, 2L, 500000L),
      Row(1L, 0L, 1L, 1L, 1000000L),
      Row(1L, 1L, 1L, 1L, 1000000L)))
  }

  test("funnel matches a brute-force sequential-min reference on " +
    "random event sets") {
    val rnd = new scala.util.Random(42)
    val stages = Seq("s0", "s1", "s2")
    val types = stages :+ "zz"
    val w = 20L
    for (_ <- 1 to 10) {
      val evs = Seq.fill(150)((rnd.nextInt(8).toLong,
        rnd.nextInt(60).toLong, types(rnd.nextInt(types.size))))
      val df = evs.toDF("user_id", "ts", "event_type")
      val got = Funnel.funnel(df, "user_id", "ts", "event_type",
          stages, w)
        .collect().map { r =>
          r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))
        }.toMap
      val exp = evs.groupBy(_._1).flatMap { case (u, es) =>
        def minAt(st: String, after: Long, cap: Long): Option[Long] =
          es.filter(e => e._3 == st && e._2 > after && e._2 <= cap)
            .map(_._2).minOption
        es.filter(_._3 == "s0").map(_._2).minOption.map { a =>
          val t2 = minAt("s1", a, a + w)
          val t3 = t2.flatMap(b => minAt("s2", b, a + w))
          val depth = 1 + t2.size + t3.size
          u -> ((Some(a), t2, t3, depth))
        }
      }
      assert(got === exp)
    }
  }

  test("funnel plan: one shuffle, stage filter pushed to the scan") {
    val df = events((1L, 100L, "view"))
    val plan = Funnel.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowS = 1000L)
      .queryExecution.executedPlan.toString
    // exactly one exchange: the per-user groupBy (orderBy not applied)
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }
}
