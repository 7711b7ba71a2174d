package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite
import graft.model._
import graft.operators.Downsample
import graft.streaming.StreamingIngest.{OutPoint, RawPoint}

/** Lambda-architecture consistency: streaming the real event corpus
  * through the incremental path and resolving emissions with
  * last-write-wins must equal the batch rollup of the same points —
  * the property that lets backfills and live ingest share one store. */
class StreamBatchEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  test("streamed emissions (LWW-merged) == batch rollup on sf0.001 events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // ts is nanosecond longs in older driver testdata, timestamp in newer
    val tsS = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => unix_timestamp(col("ts"))
    }
    val raw = ev
      .select(
        concat(lit("ev."), col("event_type"), lit("."), col("user_id") % 10)
          .as("metric"),
        tsS.as("ts"),
        col("value"))
      .as[RawPoint].collect().sortBy(_.ts)

    // stream in 4 arrival-ordered chunks; capacity ample so nothing ages
    // out mid-stream (matching batch visibility of all points)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawPoint]
    val out = StreamingIngest.downsampleFlow(input.toDS(),
      StreamBatchEquivalenceSpec.lookupMeta, capacity = 64, idleTimeoutMs = 0)
    val q = out.writeStream.format("memory").queryName("sbe_out")
      .outputMode(OutputMode.Append).start()
    try {
      raw.grouped(math.max(raw.length / 4, 1)).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val emissions = spark.table("sbe_out").as[OutPoint].collect()
      // last emission per (metric, stage, ts) wins (upsert semantics)
      val streamed = emissions.zipWithIndex
        .groupBy { case (p, _) => (p.metric, p.stage, p.ts) }
        .map { case (_, es) => es.maxBy(_._2)._1 }
        .filter(_.stage == "8640*600s_aggr")
        .map(p => (p.metric, p.ts, p.value, p.count)).toSet

      // batch view of the same points (no step collisions in this corpus,
      // so LWW at stage0 is the identity)
      val batch = Downsample.rollupStage(
        raw.toSeq.toDF("metric_id", "ts", "value")
          .withColumn("aggregator", lit("total")), 600)
        .select(col("metric_id"), col("ts"), col("value"), col("count"))
        .as[(String, Long, Double, Double)].collect().toSet

      assert(streamed.nonEmpty)
      assert(streamed === batch)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS sbe_out")
    }
  }
}

object StreamBatchEquivalenceSpec {
  // stage0 60 s (no collisions in the corpus), stage1 600 s
  val lookupMeta: String => MetricMetadata = _ => MetricMetadata(
    aggregator = Aggregator.Total,
    retention = Retention.fromString("1440*60s:8640*600s"))
}
