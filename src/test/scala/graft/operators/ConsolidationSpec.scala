package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.model.{Retention, Stage}
import graft.sources.{MetricCatalog, PointsStore}

/** graphite-web maxDataPoints consolidation planned server-side, and
  * xFilesFactor enforcement on the consolidated read. */
class ConsolidationSpec extends SparkSuite {
  import spark.implicits._

  test("planConsolidated widens the step to fit the budget") {
    val ret = Retention.fromString("3600*60s:2160*3600s")
    // 3600 steps of 60 s, budget 1000 → factor 4 → step 240 s
    val p = TimeSeriesReader.planConsolidated(ret, 0L, 3600 * 60L,
      nowS = 3600 * 60L, maxDataPoints = 1000)
    assert(p.stepS === 240L)
    assert((p.endS - p.startS) / p.stepS <= 1000)
    // a budget larger than the window changes nothing
    val p2 = TimeSeriesReader.planConsolidated(ret, 0L, 3600 * 60L,
      nowS = 3600 * 60L, maxDataPoints = 100000)
    assert(p2.stepS === 60L)
  }

  test("consolidated spine stays inside the requested window and budget") {
    val ret = Retention.fromString("3600*60s:2160*3600s")
    // [120, 720) = 10 fine steps, budget 4 → factor 3 → step 180 anchored
    // at 120 (NOT floor-aligned out to 0); slots = ceil(600/180) = 4
    val p = TimeSeriesReader.planConsolidated(ret, 120L, 720L,
      nowS = 720L, maxDataPoints = 4)
    assert(p.stepS === 180L)
    assert(p.startS === 120L && p.endS === 720L)
    assert((p.endS - p.startS + p.stepS - 1) / p.stepS <= 4)

    val store = java.nio.file.Files.createTempDirectory("consol_anchor").toString
    val stage0 = Stage(60, 60, stage0 = true)
    val pts = (2 until 12).map(i => ("m.x", i * 60L, i.toDouble)) // ts 120..660
    PointsStore.write(pts.toDF("metric_id", "ts", "value")
      .withColumn("count", lit(1.0)).withColumn("replica", lit(0)),
      store, stage0)
    val catalog = MetricCatalog.withDerivedColumns(Seq("m.x").toDF("name"))
      .withColumn("id", col("name"))
      .withColumn("aggregator", lit("average"))
      .withColumn("retention", lit("60*60s:24*3600s"))
    val got = TimeSeriesReader.findAndFetchPlanned(spark, catalog, store,
      "m.x", 120L, 720L, nowS = 720L, maxDataPoints = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // windows anchor at 120: [120,300)→3, [300,480)→6, [480,660)→9, [660,720)→11
    assert(got.toSeq === Seq((120L, 3.0), (300L, 6.0), (480L, 9.0), (660L, 11.0)))
    assert(got.forall { case (ts, _) => ts >= 120L && ts < 720L })
  }

  test("consolidated read applies xFilesFactor from the catalog") {
    val store = java.nio.file.Files.createTempDirectory("consol").toString
    val stage0 = Stage(60, 60, stage0 = true)
    // m.full: every 60 s slot of [0, 240); m.sparse: only one point per
    // 240 s window → at step 240 (xff 0.5) sparse windows null out
    val pts =
      (0 until 4).map(i => ("m.full", i * 60L, 1.0 * i)) ++
        Seq(("m.sparse", 0L, 9.0), ("m.sparse", 240L, 9.0))
    PointsStore.write(pts.toDF("metric_id", "ts", "value")
      .withColumn("count", lit(1.0)).withColumn("replica", lit(0)),
      store, stage0)
    val catalog = MetricCatalog.withDerivedColumns(
      Seq("m.full", "m.sparse").toDF("name"))
      .withColumn("id", col("name"))
      .withColumn("aggregator", lit("average"))
      .withColumn("retention", lit("60*60s:24*3600s"))
      .withColumn("xfilesfactor", lit(0.5))

    // budget 2 over a 480 s window at 60 s → factor 4 → step 240
    val got = TimeSeriesReader.findAndFetchPlanned(spark, catalog, store,
      "m.*", 0L, 480L, nowS = 480L, maxDataPoints = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val byKey = got.map(x => (x._1, x._2) -> x._3).toMap
    // full metric: 4/4 slots in window 0 → kept, avg = (0+1+2+3)/4
    assert(byKey(("m.full", 0L)) === Some(1.5))
    // sparse: 1/4 slots < 0.5 → NaN
    assert(byKey(("m.sparse", 0L)).exists(_.isNaN))
    assert(byKey(("m.sparse", 240L)).exists(_.isNaN))
    // without a budget, the raw 60 s series comes back un-nulled
    val raw = TimeSeriesReader.findAndFetchPlanned(spark, catalog, store,
      "m.sparse", 0L, 480L, nowS = 480L)
      .filter(col("value").isNotNull && !isnan(col("value")))
    assert(raw.count() === 2)
  }
}
