package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Funnel

// top-level: an inner case class would capture the suite as $outer and
// drop the encoder to interpreted mode (see DocumentStreamSpec)
final case class FunnelStreamEvent(user_id: Long, ts: Long,
                                   event_type: String)

/** Streaming funnel: watermark-closed windows emit exactly the batch
  * fold's row, out-of-order and anchor-lowering arrivals included. */
class FunnelStreamSpec extends SparkSuite {
  import spark.implicits._

  private val Stages = Seq("view", "click", "purchase")

  private def run(batches: Seq[Seq[FunnelStreamEvent]])
      : Seq[(Long, Option[Long], Option[Long], Option[Long], Int)] = {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelStreamEvent]
    val out = FunnelStream.funnelCompletions(
      input.toDF().withColumn("event_time", col("ts").cast("timestamp")),
      "user_id", "event_time", "event_type", Stages,
      windowS = 100L, watermark = "10 seconds")
    val name = s"funnel_out_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name)
        .select("user_id", "s1_ts", "s2_ts", "s3_ts", "funnel_depth")
        .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
        .collect().sortBy(_._1).toSeq
    } finally q.stop()
  }

  private def batchReference(events: Seq[FunnelStreamEvent])
      : Seq[(Long, Option[Long], Option[Long], Option[Long], Int)] =
    Funnel.funnel(
      events.map(e => (e.user_id, e.ts, e.event_type))
        .toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Stages, windowS = 100L)
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().sortBy(_._1).toSeq

  test("watermark-closed funnels emit once and equal the batch fold") {
    val events = Seq(
      // user 1: full conversion inside the window
      FunnelStreamEvent(1L, 10L, "view"),
      FunnelStreamEvent(1L, 30L, "click"),
      FunnelStreamEvent(1L, 60L, "purchase"),
      // user 2: purchase outside the 100 s window
      FunnelStreamEvent(2L, 10L, "view"),
      FunnelStreamEvent(2L, 50L, "click"),
      FunnelStreamEvent(2L, 300L, "purchase"),
      // user 3: clicks only — never enters, never emits
      FunnelStreamEvent(3L, 10L, "click"))
    val flush = Seq(FunnelStreamEvent(999L, 100000L, "click"))
    val got = run(Seq(events, flush, flush))
    assert(got === batchReference(events))
    assert(got.map(_._1) === Seq(1L, 2L))
  }

  test("out-of-order arrival and a late anchor-lowering view are exact") {
    val b1 = Seq(FunnelStreamEvent(1L, 50L, "click"))     // no anchor yet
    val b2 = Seq(FunnelStreamEvent(1L, 45L, "view"))      // anchor 45
    val b3 = Seq(FunnelStreamEvent(1L, 60L, "purchase"),
      FunnelStreamEvent(1L, 42L, "view"))                 // anchor -> 42
    val flush = Seq(FunnelStreamEvent(999L, 100000L, "click"))
    val got = run(Seq(b1, b2, b3, flush, flush))
    assert(got === Seq((1L, Some(42L), Some(50L), Some(60L), 3)))
    assert(got === batchReference(b1 ++ b2 ++ b3))
  }

  test("an event truncating into the window after the watermark touches " +
      "its end is still counted (strict finalize boundary)") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, String)]
    val out = FunnelStream.funnelCompletions(
      input.toDF().toDF("user_id", "ts", "event_type")
        .withColumn("event_time", col("ts").cast("timestamp")),
      "user_id", "event_time", "event_type", Seq("view", "click"),
      windowS = 100L, watermark = "10 seconds")
    val name = s"funnel_bd_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      // anchor at 10 → window end 110 (inclusive)
      input.addData((1L, 10.0, "view")); q.processAllAvailable()
      // advance the watermark to EXACTLY 110.0
      input.addData((999L, 120.0, "click")); q.processAllAvailable()
      // poke user 1 while wm == window end: finalizing here would lose
      // the admissible straggler below (the pre-fix behavior); the view
      // at 115 only seeds the next funnel and keeps wm at 110
      input.addData((1L, 115.0, "view")); q.processAllAvailable()
      // admissible (110.4 > wm 110) and truncates INTO the window (110)
      input.addData((1L, 110.4, "click")); q.processAllAvailable()
      input.addData((999L, 100000.0, "click")); q.processAllAvailable()
      input.addData((999L, 100000.0, "click")); q.processAllAvailable()
      val got = spark.table(name)
        .select("user_id", "s1_ts", "s2_ts", "funnel_depth")
        .as[(Long, Option[Long], Option[Long], Int)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got === Seq(
        (1L, Some(10L), Some(110L), 2),   // the straggler counted
        (1L, Some(115L), None, 1)))       // the 115 view's own funnel
    } finally q.stop()
  }

  test("after a funnel finalizes, a later entry starts a new funnel") {
    val b1 = Seq(
      FunnelStreamEvent(1L, 10L, "view"),
      FunnelStreamEvent(1L, 20L, "click"))
    // jump the watermark past 10+100 to close the first funnel, and
    // enter again — repeating-funnel semantics emit a second row
    val b2 = Seq(FunnelStreamEvent(1L, 500L, "view"),
      FunnelStreamEvent(1L, 520L, "purchase"))
    val flush = Seq(FunnelStreamEvent(999L, 100000L, "click"))
    val got = run(Seq(b1, b2, flush, flush))
    assert(got === Seq(
      (1L, Some(10L), Some(20L), None, 2),
      (1L, Some(500L), None, None, 1)))
  }
}
