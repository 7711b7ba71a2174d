package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Sessionize

// top-level: an inner case class would capture the suite as $outer and
// drop the encoder to interpreted mode (see DocumentStreamSpec)
final case class SessionEvent(user_id: Long, ts: Long, v: Double)

/** Streaming sessionization: session_window gap semantics match the
  * batch operator, sessions emit once watermark-closed. */
class SessionStreamSpec extends SparkSuite {
  import spark.implicits._

  private def run(events: Seq[SessionEvent], lateFlush: SessionEvent)
      : Seq[(Long, Long, Long, Long, Long, Double)] = {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = SessionStream.sessionStats(
      input.toDF().withColumn("event_time", col("ts").cast("timestamp")),
      Seq("user_id"), "event_time", gapS = 50L, watermark = "10 seconds",
      extraAggs = Seq(sum("v").as("total_v")))
    val name = s"sess_out_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far past every session end to flush
      input.addData(lateFlush)
      q.processAllAvailable()
      spark.table(name)
        .select("user_id", "n_events", "start_ts", "end_ts", "duration_s",
          "total_v")
        .as[(Long, Long, Long, Long, Long, Double)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    } finally q.stop()
  }

  test("sessions split on gaps > gapS, exactly-gapS gaps merge, " +
      "stats match the batch operator") {
    // user 1: [0,10,60] (gaps 10, 50=gapS → ONE session), [200] after a
    // 140 s gap; user 2: one event
    val events = Seq(
      SessionEvent(1L, 0L, 1.0), SessionEvent(1L, 10L, 2.0),
      SessionEvent(1L, 60L, 3.0), SessionEvent(1L, 200L, 4.0),
      SessionEvent(2L, 5L, 5.0))
    val flush = SessionEvent(99L, 100000L, 0.0)
    val got = run(events, flush)
    // the flush event's own session is still open at end-of-stream, so
    // only the watermark-closed sessions appear
    val expected = Seq(
      (1L, 3L, 0L, 60L, 60L, 6.0),
      (1L, 1L, 200L, 200L, 0L, 4.0),
      (2L, 1L, 5L, 5L, 0L, 5.0))
    assert(got === expected.sortBy(r => (r._1, r._3)))

    // batch parity: Sessionize.sessionStats over the same rows produces
    // the same (user, start, end, count, duration, total) set
    val batch = Sessionize.sessionStats(
      events.map(e => (e.user_id, e.ts, e.v))
        .toDF("user_id", "ts", "v"),
      Seq("user_id"), "ts", gapS = 50L,
      extraAggs = Seq(sum("v").as("total_v")))
      .select("user_id", "n_events", "start_ts", "end_ts", "duration_s",
        "total_v")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got === batch)
  }

  test("a session stays open (unemitted) until the watermark passes it") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = SessionStream.sessionStats(
      input.toDF().withColumn("event_time", col("ts").cast("timestamp")),
      Seq("user_id"), "event_time", gapS = 50L, watermark = "10 seconds")
    val name = s"sess_open_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      input.addData(SessionEvent(1L, 0L, 1.0))
      q.processAllAvailable()
      // watermark is still at -10 s; the session [0,51) is not closed
      assert(spark.table(name).isEmpty)
      input.addData(SessionEvent(2L, 500L, 1.0))
      q.processAllAvailable()
      // watermark 490 s > 51 s: user 1's session has emitted exactly once
      val users = spark.table(name).select("user_id").as[Long].collect()
      assert(users.toSeq === Seq(1L))
    } finally q.stop()
  }
}
