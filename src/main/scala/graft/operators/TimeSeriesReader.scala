package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Metric, Retention, Stage}
import graft.sources.{MetricCatalog, PointsStore}

/** The Finder/Reader facade: glob → metrics → aligned window → pruned
  * scan → re-aggregation → dense series, mirroring the reference read
  * lifecycle (SURVEY.md §3.1; plugins/graphite.py:61-496).
  *
  * Planning (stage pick, window alignment) is pure driver-side logic on
  * [[graft.model.Retention]]; data movement is one pruned scan plus the
  * [[Downsample.pointGrouper]] shuffle.
  */
object TimeSeriesReader {

  /** A planned fetch: the aligned window and chosen stage
    * (metric.py:593-623). */
  final case class FetchPlan(startS: Long, endS: Long, stage: Stage, stepS: Long)

  def plan(retention: Retention, startS: Long, endS: Long, nowS: Long): FetchPlan = {
    val (s, e, stage) = retention.alignTimeWindow(startS, endS, nowS)
    FetchPlan(s, e, stage, stage.precisionS)
  }

  /** Fetch one metric's dense series from a points store directory.
    * Returns rows (ts, value) covering every step of the aligned window,
    * with nulls where no data exists (plugins/graphite.py:182-219). */
  def fetchSeries(spark: SparkSession, baseDir: String, metric: Metric,
      startS: Long, endS: Long, nowS: Long): DataFrame = {
    val p = plan(metric.retention, startS, endS, nowS)
    val clampedStart = math.max(p.startS, p.endS - p.stage.durationS)
    val rows = PointsStore.read(spark, baseDir, p.stage, clampedStart, p.endS,
      Seq(metric.id))
      .withColumn("aggregator", lit(metric.aggregator.name))
    val series = Downsample.pointGrouper(rows, p.stepS)
    Downsample.denseSpine(series, p.startS, p.endS, p.stepS)
      .select(col("ts"), col("value"))
      .orderBy("ts")
  }

  /** Resolve a glob against the catalog and fetch every matching series,
    * one result row per (name, ts) — the find+fetch_async flow
    * (plugins/graphite.py:365-412,142-225) as a single plan: the glob
    * filter prunes the catalog scan, a broadcast join attaches metadata,
    * and one grouped pass re-aggregates all series together. */
  def findAndFetch(spark: SparkSession, catalog: DataFrame, baseDir: String,
      glob: String, stage: Stage, startS: Long, endS: Long): DataFrame = {
    val metrics = MetricCatalog.globMetrics(catalog, glob)
      .select(col("id").as("metric_id"), col("name"), col("aggregator"))
    val rows = PointsStore.read(spark, baseDir, stage, startS, endS)
      .drop("aggregator")
      .join(broadcast(metrics), Seq("metric_id"))
    Downsample.pointGrouper(rows, stage.precisionS)
      .join(broadcast(metrics.select("metric_id", "name")), Seq("metric_id"))
      .select(col("name"), col("ts"), col("value"))
      .orderBy("name", "ts")
  }

  /** Planned multi-metric read — the full find+fetch lifecycle
    * (plugins/graphite.py:365-412,142-225) as ONE job per retention class:
    * resolve the glob, group the matched metrics by retention driver-side
    * (the match list is bounded by the glob cap, so this is planning
    * metadata, not data), pick the stage + aligned window per retention
    * (metric.py:593-623), then run a single pruned scan + pointGrouper +
    * dense spine per group. Plan fan-out = #distinct retentions (typically
    * a handful), never #metrics — a glob matching 5,000 metrics is still
    * one scan, unlike a per-metric plan/union loop.
    *
    * Every found leaf gets a dense vector — metrics with no points in the
    * window come back all-null (plugins/graphite.py:182-219). */
  def findAndFetchPlanned(spark: SparkSession, catalog: DataFrame,
      baseDir: String, glob: String, startS: Long, endS: Long,
      nowS: Long, maxMetrics: Int = 5000): DataFrame = {
    import spark.implicits._
    val matched = MetricCatalog.globMetrics(catalog, glob, maxMetrics)
      .select("name", "id", "aggregator", "retention").collect()
    if (matched.isEmpty)
      return Seq.empty[(String, Long, Double)].toDF("name", "ts", "value")
    val groups = matched.groupBy(_.getAs[String]("retention")).toSeq.sortBy(_._1)
    groups.map { case (retStr, rows) =>
      val p = plan(Retention.fromString(retStr), startS, endS, nowS)
      val clampedStart = math.max(p.startS, p.endS - p.stage.durationS)
      val metas = rows.toSeq.map(r => (r.getAs[String]("id"),
        r.getAs[String]("name"), r.getAs[String]("aggregator")))
      val metaDf = metas.toDF("metric_id", "name", "aggregator")
      val scan = PointsStore
        .read(spark, baseDir, p.stage, clampedStart, p.endS, metas.map(_._1))
        .drop("aggregator")
        .join(broadcast(metaDf.select("metric_id", "aggregator")), Seq("metric_id"))
      val series = Downsample.pointGrouper(scan, p.stepS)
      val spine = spark.range(p.startS, p.endS, p.stepS).select(col("id").as("ts"))
      broadcast(metaDf.select("metric_id", "name")).crossJoin(spine)
        .join(series, Seq("metric_id", "ts"), "left")
        .select(col("name"), col("ts"), col("value"))
    }.reduce(_ unionByName _).orderBy("name", "ts")
  }
}
