package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.glob.Glob
import graft.operators.Downsample
import graft.sources.MetricCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY.md §2 over
  * the driver-provided testdata; [[oracleSql]] carries the equivalent DuckDB
  * SQL. The `events` table doubles as the time-series corpus: each row is a
  * point of metric `ev.<event_type>.<user_id%10>` with replica
  * `user_id % 2`, mirroring the reference's (metric, ts, value, replica)
  * data model (biggraphite/drivers/cassandra.py:740-782, accessor.py:40-63).
  *
  * Oracle-parity rules used throughout:
  *  - timestamps → epoch seconds as BIGINT in both engines
  *  - arithmetic doubles rounded to 4-6 decimals in both engines
  *    (pass-through values stay raw: same parquet bits on both sides)
  *  - every query ends with a deterministic ORDER BY
  */
object SparkEntry {

  // ---- shared view builders -------------------------------------------

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Epoch seconds for a raw `ts` column that is either a timestamp or
    * (with spark.sql.legacy.parquet.nanosAsLong) nanosecond longs. Integral
    * division avoids double rounding at the 1.7e18 ns scale. */
  private def tsSeconds(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
    case _ => unix_timestamp(col("ts"))
  }

  /** events → points(name, ts, value, replica, event_id). */
  private def points(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
    ev.select(
      concat(lit("ev."), col("event_type"), lit("."), (col("user_id") % 10)).as("name"),
      tsSeconds(ev).as("ts"),
      col("value"),
      (col("user_id") % 2).cast("int").as("replica"),
      col("event_id"))
  }

  private val PointsCte =
    """points AS (
      |  SELECT 'ev.' || event_type || '.' || (user_id % 10) AS name,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS ts,
      |         value,
      |         CAST(user_id % 2 AS INT) AS replica,
      |         event_id
      |  FROM events
      |)""".stripMargin

  /** Day-1 window of the synthetic corpus (events start 2024-01-01 UTC). */
  private val T0 = 1704067200L

  private def stepTs(precisionS: Long): Column =
    (floor(col("ts") / precisionS) * precisionS).cast("long")

  // ---- flagship -------------------------------------------------------

  /** Flagship: the full read path (find glob → fetch → downsample →
    * replica-resolve → dense spine) on sf0.001; driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val pts = points(spark, dir)
      .filter(col("name").rlike(Glob.toRegex("ev.*.*")))
      .filter(col("ts") >= T0 && col("ts") < T0 + 7 * 86400)
      .withColumn("metric_id", col("name"))
      .withColumn("aggregator", lit("average"))
      .withColumn("count", lit(1.0))
    val series = Downsample.pointGrouper(pts, targetPrecisionS = 3600)
    Downsample.denseSpine(series, T0, T0 + 86400, 3600)
      .withColumnRenamed("metric_id", "name")
      .orderBy("name", "ts")
  }

  // ---- queries --------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: the five aggregators in one grouped pass (metric.py:197-370)
    "a1_aggregators" -> { (s, dir) =>
      points(s, dir).groupBy("name").agg(
        round(sum(col("value")), 4).as("total_v"),
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"),
        round(sum(col("value")) / count(lit(1)), 4).as("avg_v"),
        round(max_by(col("value"), col("ts") * 10000000L + col("event_id")), 4).as("last_v"),
        count(lit(1)).as("cnt"))
        .orderBy("name")
    },

    // A3: stage0 → aggregated stage (sum,count) partials at 1 h precision
    "a3_downsample" -> { (s, dir) =>
      val pts = points(s, dir)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator", lit("average"))
      Downsample.rollupStage(pts, precisionS = 3600)
        .select(col("metric_id").as("name"), col("ts"),
          round(col("value"), 4).as("sum_v"), col("count").cast("long").as("cnt"))
        .orderBy("name", "ts")
    },

    // A3b: two-level rollup 60 s → 3600 s equals the direct 3600 s rollup
    // (merge of (value,count) partials, metric.py:218-261)
    "a3_downsample_2stage" -> { (s, dir) =>
      val pts = points(s, dir)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator", lit("total"))
      val stage1 = Downsample.rollupStage(pts, precisionS = 60)
      Downsample.rollupAggregatedStage(stage1, precisionS = 3600)
        .select(col("metric_id").as("name"), col("ts"),
          round(col("value"), 4).as("sum_v"), col("count").cast("long").as("cnt"))
        .orderBy("name", "ts")
    },

    // A5: read-time re-aggregation + densest-replica pick
    // (accessor.py:413-584)
    "a5_pointgrouper" -> { (s, dir) =>
      val pts = points(s, dir)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator", lit("average"))
        .withColumn("count", lit(1.0))
      Downsample.pointGrouper(pts, targetPrecisionS = 3600)
        .select(col("metric_id").as("name"), col("ts"),
          round(col("value"), 4).as("value"))
        .orderBy("name", "ts")
    },

    // A7: dense time-spine materialization (plugins/graphite.py:182-219)
    "a7_dense_spine" -> { (s, dir) =>
      val pts = points(s, dir)
        .filter(col("ts") >= T0 && col("ts") < T0 + 86400)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator", lit("average"))
        .withColumn("count", lit(1.0))
      val series = Downsample.pointGrouper(pts, targetPrecisionS = 3600)
        .withColumn("value", round(col("value"), 4))
      Downsample.denseSpine(series, T0, T0 + 86400, 3600)
        .select(col("metric_id").as("name"), col("ts"), col("value"))
        .orderBy("name", "ts")
    },

    // A8/J7: carbonlink-style hot/cold union with hot points winning
    // (plugins/graphite.py:196-205)
    "a8_hot_cold_union" -> { (s, dir) =>
      val cutoff = T0 + 20 * 86400
      val base = points(s, dir)
      val cold = base.filter(col("ts") < cutoff).groupBy("name", "replica")
        .agg(round(sum("value"), 4).as("value")).withColumn("src", lit(0))
      val hot = base.filter(col("ts") >= cutoff).groupBy("name", "replica")
        .agg(round(sum("value") * 2, 4).as("value")).withColumn("src", lit(1))
      val w = Window.partitionBy("name", "replica").orderBy(col("src").desc)
      cold.unionByName(hot)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("name", "replica", "value", "src")
        .orderBy("name", "replica")
    },

    // A9: per-namespace stats (cli/command_stats.py:54-94)
    "a9_stats" -> { (s, dir) =>
      points(s, dir)
        .groupBy(split(col("name"), "\\.").getItem(1).as("ns"))
        .agg(countDistinct("name").as("metrics"),
          count(lit(1)).as("points"),
          round(sum("value"), 4).as("sum_value"))
        .orderBy("ns")
    },

    // A10: disk usage estimate, 24 bytes/point (cli/command_du.py:24-75)
    "a10_du" -> { (s, dir) =>
      points(s, dir).groupBy("name")
        .agg((count(lit(1)) * 24).as("bytes"))
        .orderBy("name")
    },

    // A11/J6: cross-cluster diff — replicas as the two clusters, full outer
    // pairing, relative gap, dissymmetry percentiles
    // (cli/clusters_diff.py:148-247)
    "a11_clusters_diff" -> { (s, dir) =>
      val base = points(s, dir)
      def cluster(r: Int) = base.filter(col("replica") === r)
        .groupBy(col("name"), stepTs(3600).as("ts"))
        .agg(sum("value").as(s"v$r"))
      val joined = cluster(0).join(cluster(1), Seq("name", "ts"), "full_outer")
        .withColumn("gap",
          when(col("v0").isNull || col("v1").isNull, lit(1.0))
            .otherwise(abs(col("v0") - col("v1")) / greatest(col("v0"), col("v1"))))
      joined.groupBy("name").agg(avg("gap").as("g"))
        .agg(round(percentile(col("g"), lit(0.5)), 6).as("p50"),
          round(percentile(col("g"), lit(0.9)), 6).as("p90"),
          round(percentile(col("g"), lit(0.99)), 6).as("p99"),
          count(lit(1)).as("n"))
    },

    // F3: glob → anchored regex as the authoritative filter
    // (glob_utils.py:165-211)
    "f3_glob_regex" -> { (s, dir) =>
      points(s, dir).select("name").distinct()
        .filter(col("name").rlike(Glob.toRegex("ev.*.3")))
        .orderBy("name")
    },

    // F5: component predicates on p0..pN + depth + regex post-filter
    // (drivers/cassandra_sasi.py:67-272)
    "f5_glob_predicates" -> { (s, dir) =>
      val catalog = MetricCatalog.withDerivedColumns(
        points(s, dir).select("name").distinct())
      MetricCatalog.globMetrics(catalog, "ev.{click,view}.*")
        .select("name").orderBy("name")
    },

    // F9: directory glob (drivers/cassandra.py:2071-2076; ES terms-agg
    // derivation elasticsearch.py:587-629)
    "f9_dir_glob" -> { (s, dir) =>
      val catalog = points(s, dir).select("name").distinct()
      MetricCatalog.globDirectories(catalog, "ev.*").orderBy("name")
    },

    // F10: result cap (drivers/cassandra.py:2149-2176)
    "f10_result_cap" -> { (s, dir) =>
      val catalog = MetricCatalog.withDerivedColumns(
        points(s, dir).select("name").distinct())
      MetricCatalog.globMetrics(catalog, "ev.**", maxMetrics = 5)
        .select("name").orderBy("name")
    },

    // S5: pruned range scan of one series (drivers/cassandra.py:1846-1919)
    "s5_point_fetch" -> { (s, dir) =>
      points(s, dir)
        .filter(col("name") === "ev.click.3" &&
          col("ts") >= T0 && col("ts") < T0 + 7 * 86400)
        .select("name", "ts", "value", "event_id")
        .orderBy("ts", "event_id")
    },

    // J1: points ⋈ metadata broadcast join with per-metric aggregator
    // dispatch (plugins/graphite.py:108-116)
    "j1_points_metadata" -> { (s, dir) =>
      val pts = points(s, dir)
      val catalog = pts.select("name").distinct()
        .withColumn("aggregator",
          when(split(col("name"), "\\.").getItem(1).isin("click", "purchase"), "total")
            .otherwise("average"))
      pts.join(broadcast(catalog), Seq("name"))
        .groupBy(col("name"), col("aggregator"), stepTs(21600).as("ts"))
        .agg(sum("value").as("sum_v"), count(lit(1)).as("cnt"))
        .select(col("name"), col("ts"),
          round(when(col("aggregator") === "total", col("sum_v"))
            .otherwise(col("sum_v") / col("cnt")), 4).as("value"))
        .orderBy("name", "ts")
    },

    // J3: repair — orphan points without catalog entry (left anti,
    // drivers/cassandra.py:2734-2842)
    "j3_repair_orphans" -> { (s, dir) =>
      val pts = points(s, dir)
      val catalog = pts.select("name").distinct()
        .filter(split(col("name"), "\\.").getItem(2) =!= "7")
      pts.join(catalog, Seq("name"), "left_anti")
        .select("name").distinct().orderBy("name")
    },

    // J4: repair — missing parent directories (anti-join over the ancestor
    // closure, drivers/cassandra.py:2844-2934)
    "j4_missing_dirs" -> { (s, dir) =>
      val catalog = points(s, dir).select("name").distinct()
      val existing = catalog.sparkSession.range(1).select(lit("ev").as("name"))
      MetricCatalog.missingDirectories(catalog, existing).orderBy("name")
    },

    // J5: clean — empty directories (drivers/cassandra.py:2936-3050)
    "j5_empty_dirs" -> { (s, dir) =>
      val catalog = points(s, dir).select("name").distinct()
      val existing = MetricCatalog.directories(catalog)
        .unionByName(catalog.sparkSession.range(1)
          .select(lit("ev.stale").as("name")))
        .unionByName(catalog.sparkSession.range(1)
          .select(lit("zz.old").as("name")))
      MetricCatalog.emptyDirectories(existing, catalog).orderBy("name")
    },

    // M2: clean expired metrics — last-seen before cutoff at
    // (type, user) grain (drivers/cassandra.py:3052-3141)
    "m2_clean_expired" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      ev.select(concat(lit("ev."), col("event_type"), lit("."), col("user_id")).as("name"),
          tsSeconds(ev).as("ts"))
        .groupBy("name").agg(max("ts").as("updated_on"))
        .filter(col("updated_on") < T0 + 23 * 86400)
        .orderBy("name")
    },

    // M7: delete subtree by glob (cli/command_delete.py:26-55)
    "m7_delete_subtree" -> { (s, dir) =>
      points(s, dir)
        .filter(!col("name").rlike(Glob.toRegex("ev.click.**")))
        .groupBy("name").agg(count(lit(1)).as("cnt"))
        .orderBy("name")
    },

    // C1: scalar name functions — sanitize/depth/parent
    // (metric.py:106-194)
    "c1_name_functions" -> { (s, dir) =>
      val dirty = table(s, dir, "events").select(
        concat(lit(".."), col("event_type"), lit(".x.."), col("user_id") % 10)
          .as("dirty")).distinct()
      val parts = filter(split(col("dirty"), "\\."), x => x =!= "")
      dirty.select(
        col("dirty"),
        concat_ws(".", parts).as("clean"),
        size(parts).as("depth"),
        concat(concat_ws(".", slice(parts, lit(1), size(parts) - 1)), lit("."))
          .as("parent"))
        .orderBy("dirty")
    },

    // U1: set operations on user cohorts (union/intersect/except)
    "u1_set_ops" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      def cohort(t: String) = ev.filter(col("event_type") === t)
        .select("user_id").distinct()
      val click = cohort("click"); val view = cohort("view")
      val both = click.intersect(view).agg(count(lit(1)).as("n_both"))
      val either = click.union(view).distinct().agg(count(lit(1)).as("n_either"))
      val only = click.except(view).agg(count(lit(1)).as("n_click_only"))
      both.crossJoin(either).crossJoin(only)
    },

    // W2: top-k per group via ranking window (SURVEY §2.6)
    "w2_topk_per_group" -> { (s, dir) =>
      val totals = table(s, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(round(sum("value"), 4).as("total"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("total").desc, col("user_id").asc)
      totals.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("event_type", "user_id", "total", "rn")
        .orderBy("event_type", "rn")
    })

  // ---- oracle SQL -----------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "a1_aggregators" ->
      s"""WITH $PointsCte
         |SELECT name,
         |  round(sum(value), 4) AS total_v,
         |  round(min(value), 4) AS min_v,
         |  round(max(value), 4) AS max_v,
         |  round(sum(value) / count(*), 4) AS avg_v,
         |  round(arg_max(value, ts * 10000000 + event_id), 4) AS last_v,
         |  count(*) AS cnt
         |FROM points GROUP BY name ORDER BY name""".stripMargin,

    "a3_downsample" ->
      s"""WITH $PointsCte
         |SELECT name, (ts // 3600) * 3600 AS ts,
         |  round(sum(value), 4) AS sum_v, count(*) AS cnt
         |FROM points GROUP BY 1, 2 ORDER BY name, ts""".stripMargin,

    "a3_downsample_2stage" ->
      s"""WITH $PointsCte
         |SELECT name, (ts // 3600) * 3600 AS ts,
         |  round(sum(value), 4) AS sum_v, count(*) AS cnt
         |FROM points GROUP BY 1, 2 ORDER BY name, ts""".stripMargin,

    "a5_pointgrouper" ->
      s"""WITH $PointsCte,
         |g AS (
         |  SELECT name, (ts // 3600) * 3600 AS ts, replica,
         |         sum(value) AS sum_v, count(*) AS cnt
         |  FROM points GROUP BY 1, 2, 3),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY name, ts ORDER BY cnt DESC, replica ASC) AS rn
         |  FROM g)
         |SELECT name, ts, round(sum_v / cnt, 4) AS value
         |FROM r WHERE rn = 1 ORDER BY name, ts""".stripMargin,

    "a7_dense_spine" ->
      s"""WITH $PointsCte,
         |windowed AS (SELECT * FROM points WHERE ts >= $T0 AND ts < $T0 + 86400),
         |g AS (
         |  SELECT name, (ts // 3600) * 3600 AS ts, replica,
         |         sum(value) AS sum_v, count(*) AS cnt
         |  FROM windowed GROUP BY 1, 2, 3),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY name, ts ORDER BY cnt DESC, replica ASC) AS rn
         |  FROM g),
         |series AS (
         |  SELECT name, ts, round(sum_v / cnt, 4) AS value FROM r WHERE rn = 1),
         |spine AS (SELECT unnest(range($T0, $T0 + 86400, 3600)) AS ts),
         |names AS (SELECT DISTINCT name FROM windowed)
         |SELECT names.name AS name, spine.ts AS ts, series.value AS value
         |FROM names CROSS JOIN spine
         |LEFT JOIN series ON series.name = names.name AND series.ts = spine.ts
         |ORDER BY name, ts""".stripMargin,

    "a8_hot_cold_union" ->
      s"""WITH $PointsCte,
         |cold AS (
         |  SELECT name, replica, round(sum(value), 4) AS value, 0 AS src
         |  FROM points WHERE ts < $T0 + 20 * 86400 GROUP BY 1, 2),
         |hot AS (
         |  SELECT name, replica, round(sum(value) * 2, 4) AS value, 1 AS src
         |  FROM points WHERE ts >= $T0 + 20 * 86400 GROUP BY 1, 2),
         |u AS (SELECT * FROM cold UNION ALL SELECT * FROM hot),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY name, replica ORDER BY src DESC) AS rn
         |  FROM u)
         |SELECT name, replica, value, src FROM r WHERE rn = 1
         |ORDER BY name, replica""".stripMargin,

    "a9_stats" ->
      s"""WITH $PointsCte
         |SELECT split_part(name, '.', 2) AS ns,
         |  count(DISTINCT name) AS metrics,
         |  count(*) AS points,
         |  round(sum(value), 4) AS sum_value
         |FROM points GROUP BY 1 ORDER BY ns""".stripMargin,

    "a10_du" ->
      s"""WITH $PointsCte
         |SELECT name, count(*) * 24 AS bytes
         |FROM points GROUP BY name ORDER BY name""".stripMargin,

    "a11_clusters_diff" ->
      s"""WITH $PointsCte,
         |c0 AS (
         |  SELECT name, (ts // 3600) * 3600 AS ts, sum(value) AS v0
         |  FROM points WHERE replica = 0 GROUP BY 1, 2),
         |c1 AS (
         |  SELECT name, (ts // 3600) * 3600 AS ts, sum(value) AS v1
         |  FROM points WHERE replica = 1 GROUP BY 1, 2),
         |j AS (
         |  SELECT coalesce(c0.name, c1.name) AS name,
         |    CASE WHEN v0 IS NULL OR v1 IS NULL THEN 1.0
         |         ELSE abs(v0 - v1) / greatest(v0, v1) END AS gap
         |  FROM c0 FULL OUTER JOIN c1 ON c0.name = c1.name AND c0.ts = c1.ts),
         |per_name AS (SELECT name, avg(gap) AS g FROM j GROUP BY name)
         |SELECT round(quantile_cont(g, 0.5), 6) AS p50,
         |  round(quantile_cont(g, 0.9), 6) AS p90,
         |  round(quantile_cont(g, 0.99), 6) AS p99,
         |  count(*) AS n
         |FROM per_name""".stripMargin,

    "f3_glob_regex" ->
      s"""WITH $PointsCte
         |SELECT DISTINCT name FROM points
         |WHERE regexp_matches(name, '${Glob.toRegex("ev.*.3")}')
         |ORDER BY name""".stripMargin,

    "f5_glob_predicates" ->
      s"""WITH $PointsCte
         |SELECT DISTINCT name FROM points
         |WHERE split_part(name, '.', 1) = 'ev'
         |  AND split_part(name, '.', 2) IN ('click', 'view')
         |  AND len(string_split(name, '.')) = 3
         |ORDER BY name""".stripMargin,

    "f9_dir_glob" ->
      """SELECT DISTINCT 'ev.' || event_type AS name FROM events
        |ORDER BY name""".stripMargin,

    "f10_result_cap" ->
      s"""WITH $PointsCte
         |SELECT DISTINCT name FROM points ORDER BY name LIMIT 5""".stripMargin,

    "s5_point_fetch" ->
      s"""WITH $PointsCte
         |SELECT name, ts, value, event_id FROM points
         |WHERE name = 'ev.click.3' AND ts >= $T0 AND ts < $T0 + 7 * 86400
         |ORDER BY ts, event_id""".stripMargin,

    "j1_points_metadata" ->
      s"""WITH $PointsCte,
         |cat AS (
         |  SELECT DISTINCT name,
         |    CASE WHEN split_part(name, '.', 2) IN ('click', 'purchase')
         |         THEN 'total' ELSE 'average' END AS aggregator
         |  FROM points)
         |SELECT p.name AS name, (p.ts // 21600) * 21600 AS ts,
         |  round(CASE WHEN cat.aggregator = 'total' THEN sum(p.value)
         |        ELSE sum(p.value) / count(*) END, 4) AS value
         |FROM points p JOIN cat ON p.name = cat.name
         |GROUP BY p.name, cat.aggregator, (p.ts // 21600) * 21600
         |ORDER BY name, ts""".stripMargin,

    "j3_repair_orphans" ->
      s"""WITH $PointsCte
         |SELECT DISTINCT name FROM points
         |WHERE split_part(name, '.', 3) = '7'
         |ORDER BY name""".stripMargin,

    "j4_missing_dirs" ->
      """SELECT DISTINCT 'ev.' || event_type AS name FROM events
        |ORDER BY name""".stripMargin,

    "j5_empty_dirs" ->
      """SELECT * FROM (VALUES ('ev.stale'), ('zz.old')) AS t(name)
        |ORDER BY name""".stripMargin,

    "m2_clean_expired" ->
      s"""WITH metrics AS (
         |  SELECT 'ev.' || event_type || '.' || user_id AS name,
         |         max(CAST(floor(epoch(ts)) AS BIGINT)) AS updated_on
         |  FROM events GROUP BY 1)
         |SELECT name, updated_on FROM metrics
         |WHERE updated_on < $T0 + 23 * 86400
         |ORDER BY name""".stripMargin,

    "m7_delete_subtree" ->
      s"""WITH $PointsCte
         |SELECT name, count(*) AS cnt FROM points
         |WHERE NOT regexp_matches(name, '${Glob.toRegex("ev.click.**")}')
         |GROUP BY name ORDER BY name""".stripMargin,

    "c1_name_functions" ->
      """WITH dirty AS (
        |  SELECT DISTINCT '..' || event_type || '.x..' || (user_id % 10) AS dirty
        |  FROM events),
        |parsed AS (
        |  SELECT dirty,
        |    list_filter(string_split(dirty, '.'), x -> x != '') AS parts
        |  FROM dirty)
        |SELECT dirty,
        |  array_to_string(parts, '.') AS clean,
        |  len(parts) AS depth,
        |  array_to_string(parts[1:len(parts)-1], '.') || '.' AS parent
        |FROM parsed ORDER BY dirty""".stripMargin,

    "u1_set_ops" ->
      """WITH click AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
        |SELECT
        |  (SELECT count(*) FROM (SELECT * FROM click INTERSECT SELECT * FROM v)) AS n_both,
        |  (SELECT count(*) FROM (SELECT * FROM click UNION SELECT * FROM v)) AS n_either,
        |  (SELECT count(*) FROM (SELECT * FROM click EXCEPT SELECT * FROM v)) AS n_click_only""".stripMargin,

    "w2_topk_per_group" ->
      """WITH totals AS (
        |  SELECT event_type, user_id, round(sum(value), 4) AS total
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY total DESC, user_id ASC) AS rn
        |  FROM totals)
        |SELECT event_type, user_id, total, rn FROM r WHERE rn <= 3
        |ORDER BY event_type, rn""".stripMargin)
}
