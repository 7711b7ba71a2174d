package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Golden-value ports of the reference PointGrouper tests
  * (tests/test_accessor.py:225-266) plus the end-to-end "easily queryable"
  * series (tests/test_utils.py:116-137, tests/plugins/test_graphite.py:86-98)
  * against the Spark transforms. */
class DownsampleSpec extends SparkSuite {
  import spark.implicits._

  private def rows(r: (String, Long, Double, Double, Int)*) =
    r.toSeq.toDF("metric_id", "ts", "value", "count", "replica")
      .withColumn("aggregator", lit("average"))

  test("stage0 passthrough at source precision (test_accessor.py:225-236)") {
    val df = rows(("m", 0L, 1.0, 1.0, 0), ("m", 60L, 2.0, 1.0, 0), ("m", 120L, 3.0, 1.0, 0))
    val got = Downsample.pointGrouper(df, targetPrecisionS = 60)
      .orderBy("ts").select("ts", "value").as[(Long, Double)].collect()
    assert(got.toSeq === Seq((0L, 1.0), (60L, 2.0), (120L, 3.0)))
  }

  test("aggregate stage0 rows into one step (test_accessor.py:238-248)") {
    // three points in one 180 s step, average -> 2.0
    val df = rows(("m", 0L, 1.0, 1.0, 0), ("m", 60L, 2.0, 1.0, 0), ("m", 120L, 3.0, 1.0, 0))
    val got = Downsample.pointGrouper(df, targetPrecisionS = 180)
      .select("ts", "value").as[(Long, Double)].collect()
    assert(got.toSeq === Seq((0L, 2.0)))
  }

  test("merge keeps (value,count) partials (test_accessor.py:250-257)") {
    val df = rows(("m", 0L, 1.0, 1.0, 0), ("m", 60L, 2.0, 1.0, 0), ("m", 120L, 3.0, 1.0, 0))
      .withColumn("aggregator", lit("total"))
    val got = Downsample.rollupAggregatedStage(df, precisionS = 180)
      .select("ts", "value", "count").as[(Long, Double, Double)].collect()
    assert(got.toSeq === Seq((0L, 6.0, 3.0)))
  }

  test("densest replica wins per step (test_accessor.py:256-266)") {
    // replica 0: two steps with count 1+2; replica 1: one step with count 4.
    // Step 0: only r0 -> value 1.0. Step 60: r1 has more points -> 2.0/4.
    val df = rows(
      ("m", 0L, 1.0, 1.0, 0), ("m", 60L, 2.0, 2.0, 0), ("m", 60L, 2.0, 4.0, 1))
    val got = Downsample.pointGrouper(df, targetPrecisionS = 60)
      .orderBy("ts").select("ts", "value").as[(Long, Double)].collect()
    assert(got.toSeq === Seq((0L, 1.0), (60L, 0.5)))
  }

  test("shard unpack: writers within a replica aggregate together " +
      "(test_accessor.py:256-266, accessor.py:40-63)") {
    import graft.model.Shard
    // the reference golden case uses raw shards 0xFFFF (replica 3) and
    // 0x0000 (replica 0): step 0 has only replica 3 → 1/1 = 1.0; step 60
    // has replica 3 (count 2) vs replica 0 (count 4) → replica 0 → 0.5
    val df = Seq(
      ("m", 0L, 1.0, 1.0, 0xFFFF), ("m", 60L, 2.0, 2.0, 0xFFFF),
      ("m", 60L, 2.0, 4.0, 0x0000))
      .toDF("metric_id", "ts", "value", "count", "shard")
      .withColumn("aggregator", lit("average"))
    val got = Downsample.pointGrouper(
      Downsample.withReplicaFromShard(df), targetPrecisionS = 60)
      .orderBy("ts").select("ts", "value").as[(Long, Double)].collect()
    assert(got.toSeq === Seq((0L, 1.0), (60L, 0.5)))

    // two DIFFERENT writers of replica 0 outvote one writer of replica 1:
    // their counts sum per replica (2+2=4 > 3), so replica 0's combined
    // average (10+20)/4 = 7.5 wins — grouping by raw shard would instead
    // pick replica 1's 9.0
    val w = Seq(
      ("m", 0L, 10.0, 2.0, Shard.pack(0, 7)),
      ("m", 0L, 20.0, 2.0, Shard.pack(0, 8)),
      ("m", 0L, 27.0, 3.0, Shard.pack(1, 9)))
      .toDF("metric_id", "ts", "value", "count", "shard")
      .withColumn("aggregator", lit("average"))
    val got2 = Downsample.pointGrouper(
      Downsample.withReplicaFromShard(w), targetPrecisionS = 60)
      .select("ts", "value").as[(Long, Double)].collect()
    assert(got2.toSeq === Seq((0L, 7.5)))
    assert(Shard.unpack(Shard.pack(3, 0x3FFF)) === (3, 0x3FFF))
    assert(Shard.unpack(0xFFFF) === (3, 0x3FFF))
    assert(Shard.unpack(0x0000) === (0, 0))
  }

  test("xFilesFactor nulls under-filled windows (metric.py:691-698)") {
    // target 120 s from source 60 s → expected 2 points per window.
    // window 0: 2/2 = 1.0 ≥ xff — kept; window 120: 1/2 = 0.5 < 0.6 → NaN
    val df = rows(("m", 0L, 1.0, 1.0, 0), ("m", 60L, 3.0, 1.0, 0),
        ("m", 120L, 5.0, 1.0, 0))
      .withColumn("xff", lit(0.6))
    val got = Downsample.pointGrouper(df, targetPrecisionS = 120,
        xffSourcePrecisionS = Some(60L))
      .orderBy("ts").select("ts", "value").as[(Long, Double)].collect()
    assert(got.length === 2)
    assert(got(0) === ((0L, 2.0)))
    assert(got(1)._1 === 120L && got(1)._2.isNaN)

    // boundary: known/expected == xff is NOT below the factor — kept
    // (whisper nulls only when the known fraction is strictly less)
    val half = rows(("m", 120L, 5.0, 1.0, 0)).withColumn("xff", lit(0.5))
    val gotHalf = Downsample.pointGrouper(half, targetPrecisionS = 120,
        xffSourcePrecisionS = Some(60L))
      .select("ts", "value").as[(Long, Double)].collect()
    assert(gotHalf.toSeq === Seq((120L, 5.0)))
  }

  test("easily queryable series: avg per minute = index (test_utils.py:116-137)") {
    val start = 864000L
    val pts = (0 until 60).flatMap { i =>
      Seq((start + i * 60 + 0, -1.0), (start + i * 60 + 15, 1.0),
        (start + i * 60 + 30, i * 3.0))
    }
    val df = pts.toDF("ts", "value")
      .withColumn("metric_id", lit("test.metric"))
      .withColumn("count", lit(1.0))
      .withColumn("replica", lit(0))
      .withColumn("aggregator", lit("average"))
    val got = Downsample.pointGrouper(df, targetPrecisionS = 60)
      .orderBy("ts").select("value").as[Double].collect()
    assert(got.toSeq === (0 until 60).map(_.toDouble))

    // minimum -> all -1; maximum/last -> 3*i (test_utils.py:117-122)
    val gotMin = Downsample.pointGrouper(
      df.withColumn("aggregator", lit("minimum")), 60)
      .orderBy("ts").select("value").as[Double].collect()
    assert(gotMin.toSeq === Seq.fill(60)(-1.0))
    val gotMax = Downsample.pointGrouper(
      df.withColumn("aggregator", lit("maximum")), 60)
      .orderBy("ts").select("value").as[Double].collect()
    // period 0: max(-1, 1, 0) = 1; afterwards 3i dominates
    assert(gotMax.toSeq === 1.0 +: (1 until 60).map(_ * 3.0))
    val gotLast = Downsample.pointGrouper(
      df.withColumn("aggregator", lit("last")), 60)
      .orderBy("ts").select("value").as[Double].collect()
    assert(gotLast.toSeq === (0 until 60).map(_ * 3.0))
  }

  test("NaN handling flows through grouped aggregation (metric.py:340-370)") {
    val df = rows(
      ("m", 0L, Double.NaN, 1.0, 0), ("m", 15L, 2.0, 1.0, 0),
      ("m", 120L, Double.NaN, 1.0, 0))
    val got = Downsample.pointGrouper(df, targetPrecisionS = 60)
      .orderBy("ts").select("ts", "value").as[(Long, Double)].collect()
    assert(got(0) === ((0L, 2.0)))       // NaN skipped in average
    assert(got(1)._1 === 120L && got(1)._2.isNaN) // all-NaN step stays NaN
  }

  test("dense spine fills gaps with null (plugins/graphite.py:182-219)") {
    val series = Seq(("m", 0L, 1.0), ("m", 120L, 3.0))
      .toDF("metric_id", "ts", "value")
    val got = Downsample.denseSpine(series, 0, 240, 60)
      .orderBy("ts").select("value").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(1.0), None, Some(3.0), None))
  }

  test("batch rollup matches the incremental downsampler's committed state") {
    // Feed a random-ish sequence through the incremental path, then check
    // the batch rollup of the same points produces the same final
    // (ts, value, count) per stage1 step (last-write-wins applied).
    val retention = graft.model.Retention.fromString("3*10s:3*100s")
    val meta = graft.model.MetricMetadata(
      aggregator = graft.model.Aggregator.Total, retention = retention)
    val pts = Seq((0L, 1.0), (1L, 2.0), (10L, 15.0), (30L, 25.0),
      (60L, 150.0), (300L, 1500.0), (300L, 1501.0))
    val inc = new graft.streaming.MetricAggregates(meta, 3)
    val emitted = inc.update(pts)
    // final emission per (stage, ts) — what a last-write-wins store keeps
    val incFinal = emitted.groupBy(e => (e.stage.toString, e.ts))
      .map { case (k, es) => (k._1, k._2, es.last.value, es.last.count) }
      .toSet

    val df = pts.zipWithIndex
      .map { case ((ts, v), i) => ("m", ts, v, i.toLong) }
      .toDF("metric_id", "ts", "value", "seq")
      .withColumn("aggregator", lit("total"))
    val deduped = Downsample.lastWriteWins(df, 10, col("seq"))
    val stage1 = Downsample.rollupStage(deduped, 100)
      .select("ts", "value", "count").as[(Long, Double, Double)].collect()
    val batchSet = stage1.map { case (ts, v, c) => ("3*100s_aggr", ts, v, c) }.toSet
    assert(batchSet === incFinal.filter(_._1 == "3*100s_aggr"))
  }
}
