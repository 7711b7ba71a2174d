package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Stage
import graft.sources.PointsStore
import graft.streaming.StreamingIngest.RawPoint

/** Event-time (watermark) ingest job: append-mode windows land in the
  * points store exactly once, closed windows only — no upsert machinery
  * needed on the read side. */
class EventTimeIngestSpec extends SparkSuite {
  import spark.implicits._

  test("watermarked rollup writes final windows to a pruned-readable store") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val store = java.nio.file.Files.createTempDirectory("et_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("et_ckpt").toString
    val stage = Stage(points = 1000, precisionS = 60, stage0 = false)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawPoint]
    val q = StreamingIngest.startEventTimeIngestJob(input.toDS(), stage,
      store, ckpt, watermark = "30 seconds").start()
    try {
      // minute 0 and minute 1 points, then advance event time far enough
      // that the watermark (max event time - 30 s) closes both windows
      input.addData(
        RawPoint("m.a", 10L, 1.0), RawPoint("m.a", 20L, 3.0),
        RawPoint("m.a", 70L, 5.0))
      q.processAllAvailable()
      input.addData(RawPoint("m.a", 300L, 7.0)) // watermark → 270 s
      q.processAllAvailable()
      input.addData(RawPoint("m.a", 600L, 9.0)) // closes the 300 s window
      q.processAllAvailable()

      val got = PointsStore.read(spark, store, stage, 0L, 600L)
        .orderBy("ts")
        .select("metric_id", "ts", "value", "count")
        .as[(String, Long, Double, Double)].collect().toSeq
      // windows 0 and 60 closed by the 300 s point; window 300 closed by
      // the 600 s point; the 600 s window is still open → absent
      assert(got === Seq(
        ("m.a", 0L, 4.0, 2.0), ("m.a", 60L, 5.0, 1.0),
        ("m.a", 300L, 7.0, 1.0)))

      // a too-late point (before the watermark) is dropped, not upserted
      input.addData(RawPoint("m.a", 15L, 100.0))
      q.processAllAvailable()
      val after = PointsStore.read(spark, store, stage, 0L, 60L)
        .select("value").as[Double].collect().toSeq
      assert(after === Seq(4.0))
    } finally q.stop()
  }

  test("event-time rollup equals the batch rollup once windows close") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val store = java.nio.file.Files.createTempDirectory("et_eq").toString
    val ckpt = java.nio.file.Files.createTempDirectory("et_eq_ck").toString
    val stage = Stage(points = 1000, precisionS = 60, stage0 = false)
    val pts = (0 until 200).map(i =>
      RawPoint(s"m.${i % 5}", (i.toLong * 37) % 3000, i * 0.5))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawPoint]
    val q = StreamingIngest.startEventTimeIngestJob(input.toDS(), stage,
      store, ckpt, watermark = "30 seconds").start()
    try {
      input.addData(pts: _*)
      q.processAllAvailable()
      // sentinel advances the watermark far enough to close every window
      input.addData(RawPoint("m.sentinel", 100000L, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = PointsStore.read(spark, store, stage, 0L, 3600L)
      .select("metric_id", "ts", "value", "count")
      .as[(String, Long, Double, Double)].collect().toSet
    val batch = graft.operators.Downsample.rollupStage(
      pts.toDF("metric_id", "ts", "value")
        .withColumn("aggregator", lit("average")), stage.precisionS)
      .select("metric_id", "ts", "value", "count")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
