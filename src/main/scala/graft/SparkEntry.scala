package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.glob.Glob
import graft.operators.{Dedup, Downsample, Packing, Sampling, SeriesFunctions, Similarity, TextAnalysis, Urls}
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

  private def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // the testdata carries TIMESTAMP(NANOS) columns Spark rejects by
    // default; settable at runtime, so guard here in case the caller's
    // session (e.g. the driver harness) did not configure it
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** The x2 embedding-curation chain, parameterized by the k-means
    * configuration: k-means cells → SemDeDup pair drop at 0.7 →
    * SSL-prototype pruning of survivors → leakage-safe split on the
    * semantic dup clusters. The oracled query runs it at d8's fixed
    * (k=8, 2 rounds); the soak's `x2_sqrtn` variant runs the SAME body
    * at d8b's k≈√N — the pair stage's documented corpus-scale
    * operating point (Σcell² ≈ N^1.5 instead of N²/k; docs/SCALE.md).
    * `private[graft]` so Soak can drive the variant without a
    * duplicate chain; `maxCandidatePairs` is the pair stage's scale
    * rail, which the soak's fixed-k leg opens deliberately to keep
    * the quadratic regime measurable. */
  private[graft] def x2Chain(s: SparkSession, dir: String,
      k: Int, iters: Int,
      maxCandidatePairs: Long =
        graft.operators.Clustering.DefaultMaxCandidatePairs): DataFrame = {
    import graft.operators.{Clustering, Dedup}
    val emb = table(s, dir, "embeddings")
    val cents = Clustering.kmeansFit(emb, "vec_id", "embedding", k, iters)
    // pair list feeds TWO consumers (drop set + components)
    val pairs = Clustering.semanticDupPairs(emb, "vec_id", "embedding",
        cents, threshold = 0.7, maxCandidatePairs)
      .localCheckpoint(true)
    val dropIds = pairs.select(col("id_b").as("vec_id")).distinct()
    val survivors = emb.join(dropIds, Seq("vec_id"), "left_anti")
    val kept = Clustering.prototypesPrune(survivors, "vec_id",
        "embedding", cents, pruneFrac = 0.3)
      .filter(col("keep"))
      .select("vec_id")
    val comps = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
    Dedup.leakageSafeSplit(emb.join(kept, "vec_id"), "vec_id", comps)
      .orderBy("vec_id")
  }

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

  /** DuckDB mirror of [[hourlySeries]]: replica-resolved hourly averages
    * on a dense 2-day spine (same shape the a7 oracle builds). */
  private lazy val SeriesCte =
    s"""$PointsCte,
       |windowed AS (
       |  SELECT * FROM points WHERE ts >= $T0 AND ts < $T0 + 2 * 86400),
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
       |spine AS (SELECT unnest(range($T0, $T0 + 2 * 86400, 3600)) AS ts),
       |names AS (SELECT DISTINCT name FROM windowed),
       |base AS (
       |  SELECT n.name, s.ts, se.value
       |  FROM names n CROSS JOIN spine s
       |  LEFT JOIN series se ON se.name = n.name AND se.ts = s.ts)""".stripMargin

  /** Canonical fetched-series fixture for the graphite-function queries:
    * two days of hourly averages per metric on a dense spine — nullable
    * `value` slots are graphite's None, so the g* oracles exercise the
    * null semantics of every transform. */
  private def hourlySeries(s: SparkSession, dir: String): DataFrame = {
    val pts = points(s, dir)
      .filter(col("ts") >= T0 && col("ts") < T0 + 2 * 86400)
      .withColumn("metric_id", col("name"))
      .withColumn("aggregator", lit("average"))
      .withColumn("count", lit(1.0))
    val series = Downsample.pointGrouper(pts, targetPrecisionS = 3600)
      .withColumn("value", round(col("value"), 4))
    Downsample.denseSpine(series, T0, T0 + 2 * 86400, 3600)
      .select(col("metric_id").as("name"), col("ts"), col("value"))
  }

  private def stepTs(precisionS: Long): Column =
    (floor(col("ts") / precisionS) * precisionS).cast("long")

  /** Fixed per-(prefix, dataset) scratch dir, RECURSIVELY WIPED on every
    * call. Queries that stage an on-disk store before probing it must
    * reuse ONE directory per dataset: a per-run `createTempDirectory`
    * leaks a store copy per bench rep / soak leg (the disk-fill class
    * the r9 review caught on zo1), and append-mode writers
    * ([[graft.sources.PointsStore.write]]) would compound rows across
    * runs if the fixed dir were not wiped first. Callers are the
    * sequential bench/soak/verify harnesses — never concurrent on one
    * (prefix, dataset). */
  private[graft] def freshTmpDir(prefix: String, dataset: String): String = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_${prefix}_" + java.lang.Integer.toHexString(dataset.hashCode))
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete(_))
    }
    Files.createDirectories(p)
    p.toString
  }

  // ---- flagship -------------------------------------------------------

  /** Flagship: the FULL storage lifecycle on sf0.001 — ingest into a real
    * partitioned PointsStore (stage0 LWW + stage1 rollup), build the
    * catalog, then glob → planned multi-metric read → dense hourly
    * series (SURVEY §3.1/§3.2). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import graft.model.Retention
    import graft.operators.TimeSeriesReader
    import graft.sources.PointsStore
    val store = freshTmpDir("entry", dir)
    val ret = Retention.fromString("1440*60s:720*3600s")
    val pts = points(spark, dir)
      .withColumn("metric_id", col("name"))
      .withColumn("aggregator", lit("average"))
    val stage0 = Downsample.lastWriteWins(pts, ret.stage0.precisionS,
        col("ts") * 10000000L + col("event_id"))
      .select(col("metric_id"), col("ts"), col("value"),
        lit(1.0).as("count"), lit(0).as("replica"))
    val st1 = ret.stages(1)
    // both stages in one write job, one commit (the ingest fast path)
    PointsStore.writeMulti(Seq(
      (stage0, ret.stage0, 1),
      (Downsample.rollupStage(pts, st1.precisionS)
        .select(col("metric_id"), col("ts"), col("value"), col("count"),
          lit(0).as("replica")), st1, 1)),
      store)
    val catalog = MetricCatalog.withDerivedColumns(
      pts.select("name").distinct())
      .withColumn("id", col("name"))
      .withColumn("aggregator", lit("average"))
      .withColumn("retention", lit(ret.toString))
    TimeSeriesReader.findAndFetchPlanned(spark, catalog, store,
      "ev.*.*", T0, T0 + 86400, nowS = T0 + 30 * 86400)
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

    // A5b: 16-bit shard parity (2-bit replica ‖ 14-bit writer,
    // accessor.py:40-63) — points carry raw shard ids with ~25 writers
    // per replica; replica resolution must unpack the replica bits and
    // aggregate ACROSS writers before picking the densest replica
    // (accessor.py:468-505). Grouping by raw shard would fragment the
    // counts and pick differently — the oracle discriminates.
    "a5b_shard_writers" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val pts = ev.select(
        concat(lit("ev."), col("event_type"), lit("."), (col("user_id") % 10)).as("metric_id"),
        tsSeconds(ev).as("ts"), col("value"),
        lit(1.0).as("count"),
        // shard = pack(replica = user_id%2, writer = user_id%50)
        (((col("user_id") % 2) * 16384) + (col("user_id") % 50)).cast("int").as("shard"))
        .withColumn("aggregator", lit("average"))
      Downsample.pointGrouper(
        Downsample.withReplicaFromShard(pts), targetPrecisionS = 3600)
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
      import graft.operators.ClustersDiff
      val base = points(s, dir)
      def cluster(r: Int) = base.filter(col("replica") === r)
        .groupBy(col("name"), stepTs(3600).as("ts"))
        .agg(sum("value").as("value"))
      ClustersDiff.diffReport(cluster(0), cluster(1))
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

    // F11: combined find — leaves + branches for one glob, the
    // find_nodes surface (plugins/graphite.py:405-412)
    "f11_find_nodes" -> { (s, dir) =>
      val catalog = MetricCatalog.withDerivedColumns(
        points(s, dir).select("name").distinct())
      graft.operators.TimeSeriesReader.findNodes(catalog, "ev.**")
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

    // M1: Accessor.map's shardable full scan (accessor.py:395-410,
    // drivers/cassandra.py token-range splits): a maintenance-worker
    // fleet divides the catalog into content-addressed shards; the
    // shard expression is the same md5-derived one as dataloader
    // sharding, so any engine reproduces the identical split
    "m1_sharded_scan" -> { (s, dir) =>
      val catalog = MetricCatalog.withDerivedColumns(
        points(s, dir).select("name").distinct())
      Sampling.shuffleShard(catalog, col("name"), seed = "map", nShards = 4)
        .filter(col("shard") === 0)
        .select(col("name"), col("shard"))
        .orderBy("name")
    },

    // M2: clean expired metrics — last-seen before cutoff at
    // (type, user) grain (drivers/cassandra.py:3052-3141), run against
    // the DATED catalog layout (30-day updated_on partitions, the ES
    // dated-index analog): the expired scan's month predicate prunes
    // whole partition dirs at plan time (PlanShapeSpec pins this)
    "m2_clean_expired" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val cat = ev.select(
          concat(lit("ev."), col("event_type"), lit("."), col("user_id")).as("name"),
          tsSeconds(ev).as("ts"))
        .groupBy("name").agg(max("ts").as("updated_on"))
      val tmp = freshTmpDir("m2cat", dir)
      MetricCatalog.writeDated(cat, tmp)
      // nowS − maxAgeS = T0 + 23 d − 1 ⟺ updated_on < T0 + 23 d
      MetricCatalog.expiredMetrics(s.read.parquet(tmp),
          nowS = T0 + 24 * 86400, maxAgeS = 86400 + 1)
        .select(col("name"), col("updated_on"))
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
        size(parts).cast("long").as("depth"),
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
        .select(col("event_type"), col("user_id"), col("total"),
          col("rn").cast("long").as("rn"))
        .orderBy("event_type", "rn")
    },

    // AJ1: backward as-of join — purchase→last-click attribution per
    // user (pandas merge_asof / DuckDB ASOF JOIN semantics). A naive
    // SQL encoding is an inequality join Catalyst can only nested-loop;
    // AsOfJoin resolves it as ONE window over a tagged union — zero
    // join nodes in the plan (operators/AsOfJoin.scala)
    "aj1_asof_attribution" -> { (s, dir) =>
      import graft.operators.AsOfJoin
      val ev = table(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_type"),
        tsSeconds(ev).as("ts"), col("value"), col("event_id"))
      val purchases = base.filter(col("event_type") === "purchase").drop("event_type")
      val clicks = base.filter(col("event_type") === "click").drop("event_type")
      AsOfJoin.asofBackward(purchases, clicks, Seq("user_id"), "ts", "ts",
        rightPrefix = "click_")
        .withColumn("gap_s", col("ts") - col("click_ts"))
        .orderBy("event_id")
    },

    // AJ2: forward as-of with tolerance — each error to the NEXT
    // purchase by the same user within one hour, unmatched dropped
    // (error-to-conversion latency)
    "aj2_asof_next_purchase" -> { (s, dir) =>
      import graft.operators.AsOfJoin
      val ev = table(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_type"),
        tsSeconds(ev).as("ts"), col("value"), col("event_id"))
      val errors = base.filter(col("event_type") === "error").drop("event_type")
      val purchases = base.filter(col("event_type") === "purchase").drop("event_type")
      AsOfJoin.asofForward(errors, purchases, Seq("user_id"), "ts", "ts",
        rightPrefix = "purchase_", toleranceS = Some(3600L), inner = true)
        .withColumn("latency_s", col("purchase_ts") - col("ts"))
        .orderBy("event_id")
    },

    // AJ3: the bucketed as-of (the low-key-cardinality / deep-history
    // 100 TB shape: partition by (key, day-bucket), carry-in routed via
    // a metadata-scale cumulative window) — view→last-signup. Same
    // semantics as aj1's plain form, so the same ASOF oracle applies
    "aj3_asof_bucketed" -> { (s, dir) =>
      import graft.operators.AsOfJoin
      val ev = table(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_type"),
        tsSeconds(ev).as("ts"), col("value"), col("event_id"))
      val views = base.filter(col("event_type") === "view").drop("event_type")
      val signups = base.filter(col("event_type") === "signup").drop("event_type")
      AsOfJoin.asofBackwardBucketed(views, signups, Seq("user_id"), "ts", "ts",
        bucketSpanS = 86400L, rightPrefix = "signup_")
        .withColumn("since_signup_s", col("ts") - col("signup_ts"))
        .orderBy("event_id")
    },

    // RJ1: binned range join — views inside [click, click+1h) per user
    // as an equi-join on (user, time-bin) + residual filter: a hash
    // join where the naive BETWEEN join is a cartesian
    "rj1_range_join_binned" -> { (s, dir) =>
      import graft.operators.AsOfJoin
      val ev = table(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_type"),
        tsSeconds(ev).as("ts"), col("value"), col("event_id"))
      val intervals = base.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts").as("lo"),
          (col("ts") + 3600L).as("hi"))
      val views = base.filter(col("event_type") === "view").drop("event_type")
      AsOfJoin.rangeJoinBinned(intervals, "lo", "hi", views, "ts",
        Seq("user_id"), binSpanS = 3600L, pointPrefix = "view_")
        .orderBy("event_id", "view_event_id")
    },

    // S2: metric auto-create on first write — incoming names minus the
    // existing catalog (left anti), with derived tree columns
    // (plugins/carbon.py:210-230,310-369). The name grain includes the
    // props key so genuinely-new names appear after the cutoff at every
    // scale factor (the anti-join filters ~7% of incoming as existing).
    "s2_metric_autocreate" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val pts = ev.select(
        concat(lit("ev."), col("event_type"), lit("."), col("user_id"),
          lit(".k"), get_json_object(col("props"), "$.k")).as("name"),
        tsSeconds(ev).as("ts"))
      val cutoff = T0 + 15 * 86400
      val existing = pts.filter(col("ts") < cutoff).select("name").distinct()
      val incoming = pts.filter(col("ts") >= cutoff).select("name").distinct()
      MetricCatalog.withDerivedColumns(
        incoming.join(existing, Seq("name"), "left_anti"))
        .select(col("name"), col("p0"), col("p1"), col("p2"), col("p3"),
          col("depth").cast("long").as("depth"), col("parent"))
        .orderBy("name")
    },

    // E1: the FULL storage lifecycle end-to-end over a real PointsStore —
    // write (stage0 LWW + stage1 rollup, partitioned parquet store) →
    // catalog with derived columns → glob resolution → planned
    // multi-metric read (stage pick by window age → pruned scan →
    // pointGrouper → dense spine). Mirrors SURVEY §3.1/§3.2; the oracle
    // recomputes the same hourly series directly from events.
    "e1_storage_read_path" -> { (s, dir) =>
      import graft.model.{Retention, Stage}
      import graft.operators.{Downsample, TimeSeriesReader}
      import graft.sources.PointsStore
      val store = freshTmpDir("e1", dir)
      val retention = "1440*60s:720*3600s" // 1 day fine, 30 days hourly
      val ret = Retention.fromString(retention)
      val pts = points(s, dir)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator",
          when(split(col("name"), "\\.").getItem(1).isin("click", "purchase"),
            "total").otherwise("average"))
      // ingest: stage0 last-write-wins + stage1 (value,count) partials
      val stage0 = Downsample.lastWriteWins(pts, ret.stage0.precisionS,
          col("ts") * 10000000L + col("event_id"))
        .select(col("metric_id"), col("ts"), col("value"),
          lit(1.0).as("count"), lit(0).as("replica"))
      val st1 = ret.stages(1)
      val stage1 = Downsample.rollupStage(pts, st1.precisionS)
        .select(col("metric_id"), col("ts"), col("value"), col("count"),
          lit(0).as("replica"))
      // both stages in one write job, one commit (the ingest fast path)
      PointsStore.writeMulti(Seq((stage0, ret.stage0, 1), (stage1, st1, 1)),
        store)
      // catalog: id = name keeps the store join oracle-checkable
      val catalog = MetricCatalog.withDerivedColumns(
        pts.select("name").distinct())
        .withColumn("id", col("name"))
        .withColumn("aggregator",
          when(split(col("name"), "\\.").getItem(1).isin("click", "purchase"),
            "total").otherwise("average"))
        .withColumn("retention", lit(retention))
      // read 2 days starting 30 days before `now` → stage1 (hourly) pick
      val nowS = T0 + 30 * 86400
      TimeSeriesReader.findAndFetchPlanned(s, catalog, store,
        "ev.{click,view}.*", T0, T0 + 2 * 86400, nowS)
        .select(col("name"), col("ts"), round(col("value"), 4).as("value"))
        .orderBy("name", "ts")
    },

    // E2: consolidated read over the real store — maxDataPoints widens
    // the step (96 hourly slots → 48 two-hour slots) inside the same
    // grouped pass, and xFilesFactor (0.75) NaNs two-hour windows backed
    // by only one of the two expected hourly partials (whisper
    // consolidation semantics; graphite-web does this client-side).
    "e2_consolidated_read" -> { (s, dir) =>
      import graft.model.Retention
      import graft.operators.{Downsample, TimeSeriesReader}
      import graft.sources.PointsStore
      val store = freshTmpDir("e2", dir)
      val ret = Retention.fromString("1440*60s:720*3600s")
      val pts = points(s, dir)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator", lit("average"))
      val st1 = ret.stages(1)
      PointsStore.write(
        Downsample.rollupStage(pts, st1.precisionS)
          .select(col("metric_id"), col("ts"), col("value"), col("count"),
            lit(0).as("replica")),
        store, st1, writeSalt = 1)
      val catalog = MetricCatalog.withDerivedColumns(
        pts.select("name").distinct())
        .withColumn("id", col("name"))
        .withColumn("aggregator", lit("average"))
        .withColumn("retention", lit(ret.toString))
        .withColumn("xfilesfactor", lit(0.75))
      TimeSeriesReader.findAndFetchPlanned(s, catalog, store, "ev.**",
        T0, T0 + 4 * 86400, nowS = T0 + 30 * 86400, maxDataPoints = 48)
        .select(col("name"), col("ts"), round(col("value"), 4).as("value"))
        .orderBy("name", "ts")
    },

    // E4: the COMPLETE graphite render flow as one plan — store write →
    // glob → planned read → perSecond rate → summarize(2h, max) →
    // highestMax(3) → aliasByNode(1,2): what graphite-web does per-series
    // in Python (plugins/graphite.py:142-225 hands it FetchedSeries)
    // runs here as window functions + grouped aggregates downstream of
    // the same pruned store scan. Values round to 4 right after the
    // fetch so the rate/rank arithmetic is bit-identical cross-engine.
    "e4_render_pipeline" -> { (s, dir) =>
      import graft.model.Retention
      import graft.operators.{Downsample, SeriesFunctions, TimeSeriesReader}
      import graft.sources.PointsStore
      val store = freshTmpDir("e4", dir)
      val ret = Retention.fromString("1440*60s:720*3600s")
      val pts = points(s, dir)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator", lit("average"))
      val st1 = ret.stages(1)
      PointsStore.write(
        Downsample.rollupStage(pts, st1.precisionS)
          .select(col("metric_id"), col("ts"), col("value"), col("count"),
            lit(0).as("replica")),
        store, st1, writeSalt = 1)
      val catalog = MetricCatalog.withDerivedColumns(
        pts.select("name").distinct())
        .withColumn("id", col("name"))
        .withColumn("aggregator", lit("average"))
        .withColumn("retention", lit(ret.toString))
      val fetched = TimeSeriesReader.findAndFetchPlanned(s, catalog, store,
        "ev.*.*", T0, T0 + 2 * 86400, nowS = T0 + 30 * 86400)
        .withColumn("value", round(col("value"), 4))
      val rate = SeriesFunctions.perSecond(fetched)
      val summ = SeriesFunctions.summarize(rate, intervalS = 7200, fn = "max")
      SeriesFunctions.aliasByNode(
        SeriesFunctions.highest(summ, n = 3, by = "max"), Seq(1, 2))
        .select(col("name"), col("ts"),
          round(col("value") * 1e6, 4).as("rate_u"))
        .orderBy("name", "ts")
    },

    // E3: planned read across TWO retention classes in one call — the
    // glob matches metrics whose retentions pick different stages
    // (hourly vs 2-hourly), so the planned read runs one pruned scan per
    // class and unions exactly two branches (BgutilSpec asserts the plan
    // shape; this checks the VALUES against the oracle).
    "e3_multi_retention_read" -> { (s, dir) =>
      import graft.model.Retention
      import graft.operators.{Downsample, TimeSeriesReader}
      import graft.sources.PointsStore
      val store = freshTmpDir("e3", dir)
      val retA = Retention.fromString("1440*60s:720*3600s")   // hourly read
      val retB = Retention.fromString("2880*60s:360*7200s")   // 2-hourly read
      val isA = split(col("name"), "\\.").getItem(1).isin("click", "purchase")
      val pts = points(s, dir)
        .withColumn("metric_id", col("name"))
        .withColumn("aggregator", lit("average"))
      // both retention classes in one write job, one commit
      PointsStore.writeMulti(Seq(
        (Downsample.rollupStage(pts.filter(isA), retA.stages(1).precisionS)
          .select(col("metric_id"), col("ts"), col("value"), col("count"),
            lit(0).as("replica")), retA.stages(1), 1),
        (Downsample.rollupStage(pts.filter(!isA), retB.stages(1).precisionS)
          .select(col("metric_id"), col("ts"), col("value"), col("count"),
            lit(0).as("replica")), retB.stages(1), 1)),
        store)
      val catalog = MetricCatalog.withDerivedColumns(
        pts.select("name").distinct())
        .withColumn("id", col("name"))
        .withColumn("aggregator", lit("average"))
        .withColumn("retention",
          when(isA, retA.toString).otherwise(retB.toString))
      TimeSeriesReader.findAndFetchPlanned(s, catalog, store, "ev.**",
        T0, T0 + 2 * 86400, nowS = T0 + 30 * 86400)
        .select(col("name"), col("ts"), round(col("value"), 4).as("value"))
        .orderBy("name", "ts")
    },

    // M5: touch/read_on refresh with deterministic sampling — the
    // reference samples 10% of reads (drivers/cassandra.py:303,1921-1935);
    // here the sample is content-addressed (md5 prefix) so it is
    // reproducible in any engine
    "m5_touch_sampling" -> { (s, dir) =>
      points(s, dir).select("name").distinct()
        .filter(substring(md5(col("name")), 1, 1).isin("0", "1", "2"))
        .orderBy("name")
    },

    // M6: copy a subtree under a new prefix (cli/command_copy.py:37-190)
    "m6_copy_subtree" -> { (s, dir) =>
      points(s, dir)
        .filter(col("name").rlike(Glob.toRegex("ev.view.**")))
        .withColumn("new_name",
          regexp_replace(col("name"), "^ev\\.view\\.", "copy.view."))
        .groupBy("new_name").agg(count(lit(1)).as("cnt"),
          round(sum("value"), 4).as("sum_v"))
        .orderBy("new_name")
    },

    // D1: exact dedup by content hash (hash-groupBy)
    "d1_dedup_exact" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"))
        .withColumn("n_dupes", col("n_docs") - col("n_unique"))
        .orderBy("source")
    },

    // D2: MinHash + LSH banding candidate pairs (8 hashes, 8 bands).
    // Signatures come from the native one-pass MinHashSig expression —
    // no shingle explode, no shuffle before the banding groupBy
    "d2_minhash_lsh" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text",
        numHashes = 8, n = 3)
      Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8, bands = 8,
        maxBucketSize = 5000)
        .orderBy("id_a", "id_b")
    },

    // D3: SimHash 16-bit fingerprints — native one-pass expression
    // (no exploded token×bit rows, no shuffle)
    "d3_simhash" -> { (s, dir) =>
      Dedup.simhashNative(table(s, dir, "documents"), "doc_id", "text",
        bits = 16)
        .orderBy("doc_id")
    },

    // D12: SimHash near-dup PAIRS — Manku-style block banding over the
    // 16-bit fingerprints (k+1 = 3 blocks; any pair within hamming 2
    // shares a block by pigeonhole) + exact popcount verification.
    // Complete by construction — the oracle brute-forces the same set
    "d12_simhash_pairs" -> { (s, dir) =>
      val fp = Dedup.simhashNative(table(s, dir, "documents"),
        "doc_id", "text", bits = 16)
      Dedup.simhashNearDupPairs(fp, "doc_id", bits = 16, k = 2)
        .orderBy("id_a", "id_b")
    },

    // D12b: the same pair search at the WIDEST fingerprint this
    // construction affords (31 bits) — the scale path the d12 scaladoc
    // names: block selectivity grows 2^(bits/(k+1)), so wider
    // fingerprints shrink both the candidate buckets AND the
    // fingerprint-saturation false pairs (16 bits = 65k distinct values
    // saturates long before web scale; Manku's paper uses 64). Same
    // completeness contract, same brute-force oracle
    "d12b_simhash_pairs_wide" -> { (s, dir) =>
      val fp = Dedup.simhashNative(table(s, dir, "documents"),
        "doc_id", "text", bits = 31)
      Dedup.simhashNearDupPairs(fp, "doc_id", bits = 31, k = 2)
        .orderBy("id_a", "id_b")
    },

    // D4: exact n-gram Jaccard verification of the LSH candidates
    "d4_ngram_jaccard" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      // fully native dedup plan: one-pass signatures, and verification
      // over per-doc shingle SETS (ShingleSet + sorted-merge intersect) —
      // the exploded (doc, shingle) relation never exists anywhere
      val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text",
        numHashes = 8, n = 3)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8, bands = 8,
        maxBucketSize = 5000)
      Dedup.jaccardFromText(pairs, docs, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    },

    // D6: duplicate-cluster resolution — connected components over the
    // verified (jaccard ≥ 0.5) pairs by min-label propagation; each doc
    // maps to its cluster (= smallest member id), the keep-one set
    "d6_dup_clusters" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text",
        numHashes = 8, n = 3)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8, bands = 8,
        maxBucketSize = 5000)
      val dup = Dedup.jaccardFromText(pairs, docs, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
      Dedup.connectedComponents(dup)
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    },

    // D7: leakage-safe train/val/test split — assignment hashes the dup
    // CLUSTER, so near-duplicate documents can never straddle splits
    "d7_split_leakage_safe" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text",
        numHashes = 8, n = 3)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8, bands = 8,
        maxBucketSize = 5000)
      val dup = Dedup.jaccardFromText(pairs, docs, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
      Dedup.leakageSafeSplit(docs, "doc_id", Dedup.connectedComponents(dup))
        .orderBy("doc_id")
    },

    // D5: embedding-cosine near-dup pairs, blocked by label
    "d5_embedding_dedup" -> { (s, dir) =>
      Dedup.cosinePairs(table(s, dir, "embeddings"), "vec_id", "embedding",
        "label", threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // K1: brute-force cosine top-k (broadcast query set, single corpus scan)
    "k1_knn_brute" -> { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      Similarity.bruteForceKnn(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    // K2: LSH-bucketed ANN (deterministic hyperplanes, per-bucket top-k)
    // with multi-probe: each query also scans the 4 buckets at Hamming
    // distance 1 — the config the recall sweep showed is actually useful
    // (AnnRecallSpec: 0.43-0.52 recall vs 0.17 single-probe)
    "k2_knn_lsh" -> { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      Similarity.lshKnn(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", k = 3, planes = 4, multiProbe = true)
        .orderBy("query_id", "rank")
    },

    // K4: int8-quantized brute-force top-k — the memory-scale variant
    // (4× smaller corpus; cosine is scale-invariant so per-vector
    // symmetric quantization preserves ranking up to rounding)
    "k4_knn_quantized" -> { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      Similarity.bruteForceKnnQuantized(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    // KM1: Lloyd's k-means (2 iterations, deterministic first-k init)
    // then final assignment — the trained coarse quantizer behind
    // IVF ANN and SemDeDup. Oracle = the same iterations unrolled as CTEs
    "km1_kmeans" -> { (s, dir) =>
      import graft.operators.Clustering
      val emb = table(s, dir, "embeddings")
      val cents = Clustering.kmeansFit(emb, "vec_id", "embedding",
        k = 4, iters = 2)
      Clustering.assignCells(emb, "vec_id", "embedding", cents)
        .select(col("vec_id"), col("cell_id"), col("ccos").as("cos"))
        .orderBy("vec_id")
    },

    // D8: SemDeDup — semantic near-dup pairs within trained k-means
    // cells (cluster-blocked pairwise, never corpus²)
    "d8_semdedup" -> { (s, dir) =>
      import graft.operators.Clustering
      val emb = table(s, dir, "embeddings")
      val cents = Clustering.kmeansFit(emb, "vec_id", "embedding",
        k = 8, iters = 2)
      Clustering.semanticDupPairs(emb, "vec_id", "embedding", cents,
        threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // D8b: SemDeDup at the RECOMMENDED cell count k≈√N (Abbas et al.
    // 2023) — Σcell² ≈ N²/k = N^1.5 candidate pairs, the scale shape
    // that holds when the corpus grows. k derives from the corpus size
    // at plan time (driver-side count of a metadata-scale relation);
    // the oracle derives its k from the same count (sqrtNkSql).
    "d8b_semdedup_sqrtn" -> { (s, dir) =>
      import graft.operators.Clustering
      val emb = table(s, dir, "embeddings")
      val k = math.max(1, math.sqrt(emb.count().toDouble).toInt)
      val cents = Clustering.kmeansFit(emb, "vec_id", "embedding",
        k = k, iters = 1)
      Clustering.semanticDupPairs(emb, "vec_id", "embedding", cents,
        threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // K3: IVF ANN — deterministic coarse quantizer (first-nCells
    // centroids), single-probe cell scan
    "k3_knn_ivf" -> { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      Similarity.ivfKnn(emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        emb, "vec_id", "embedding", k = 3, nCells = 5)
        .orderBy("query_id", "rank")
    },

    // K5: IVF ANN over the TRAINED k-means quantizer — cells from
    // Clustering.kmeansFit instead of k3's first-nCells heuristic;
    // same single-probe inverted-file scan shape
    "k5_knn_ivf_trained" -> { (s, dir) =>
      import graft.operators.Clustering
      val emb = table(s, dir, "embeddings")
      val cents = Clustering.kmeansFit(emb, "vec_id", "embedding",
        k = 8, iters = 2)
      Similarity.ivfKnnTrained(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        emb, "vec_id", "embedding", k = 3, centroids = cents)
        .orderBy("query_id", "rank")
    },

    // K6: the PERSISTED index (train once / probe many): build a real
    // on-disk IVF index — centroids + cell-partitioned postings with
    // precomputed norms — then multi-probe it (nProbe=2). Only the
    // probed cells' partition directories are read (partition pruning,
    // SimilarityIndexSpec pins the file count); the oracle models the
    // same two-cell probe from the same deterministic training
    "k6_knn_ivf_index" -> { (s, dir) =>
      // fixed per-dataset path, overwritten by the build each run — a
      // per-run temp dir leaks a corpus-scale index copy per bench rep
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k6ivf_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx,
        k = 8, iters = 2)
      Similarity.ivfIndexKnn(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        idx, "vec_id", "embedding", k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    },

    // K7: product quantization (Jégou et al. 2011) — train 4 subspace
    // codebooks (ksub=8, one Lloyd's round), encode the corpus to 4
    // codes + a reconstruction norm, then ADC top-k from the per-query
    // distance table. The corpus float vectors are never read at query
    // time — the codes relation (~64× smaller) is the only scan
    "k7_knn_pq" -> { (s, dir) =>
      import graft.operators.ProductQuantization
      val emb = table(s, dir, "embeddings")
      val cb = ProductQuantization.pqTrain(emb, "vec_id", "embedding",
        m = 4, ksub = 8, iters = 1)
      val enc = ProductQuantization.pqEncode(emb, "vec_id", "embedding", cb)
      ProductQuantization.pqKnn(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        enc, cb, "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rank")
    },

    // K8: IVF-PQ (FAISS IndexIVFPQ shape, non-residual) — the k6
    // inverted file with k7's PQ codes as the postings: probe 2 cells,
    // ADC-score only those cells' partitions, floats never on disk in
    // the postings at all. Coarse quantizer matches k6 (k=8, 2 rounds);
    // PQ matches k7 (m=4, ksub=8, 1 round)
    "k8_knn_ivfpq" -> { (s, dir) =>
      import graft.operators.ProductQuantization
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k8ivfpq_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      ProductQuantization.buildIvfPqIndex(emb, "vec_id", "embedding", idx,
        kCells = 8, coarseIters = 2, m = 4, ksub = 8, pqIters = 1)
      ProductQuantization.ivfPqKnn(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        idx, "vec_id", "embedding", k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    },

    // K9: residual IVF-PQ (FAISS's by_residual default) — PQ quantizes
    // v − centroid(cell(v)); residuals live in a smaller ball, so the
    // same m/ksub budget reconstructs far tighter. Same coarse probe as
    // k8; scoring adds the per-(query,cell) centroid dot to the
    // residual ADC sum
    "k9_knn_ivfpq_residual" -> { (s, dir) =>
      import graft.operators.ProductQuantization
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k9ivfpqr_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      ProductQuantization.buildIvfPqIndex(emb, "vec_id", "embedding", idx,
        kCells = 8, coarseIters = 2, m = 4, ksub = 8, pqIters = 1,
        byResidual = true)
      ProductQuantization.ivfPqKnn(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        idx, "vec_id", "embedding", k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    },

    // K10: index APPEND (FAISS add()) — build the IVF index on the
    // first 250 vectors only (train + postings), then append the rest
    // WITHOUT retraining: new vectors are assigned against the
    // persisted centroids and their postings land in the existing cell
    // partitions. The probe sees old + new postings through the same
    // partition pruning. Oracle: k-means trained on vec_id < 250, final
    // assignment over everything
    "k10_ivf_append" -> { (s, dir) =>
      // fixed path: the build's STATIC overwrite truncates the whole
      // postings dir, so the previous run's appended postings are gone
      // before this run's append lands — per-run state never compounds
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k10ivf_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      Similarity.buildIvfIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", idx, k = 8, iters = 2)
      Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= 250),
        "vec_id", "embedding", idx)
      Similarity.ivfIndexKnn(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        idx, "vec_id", "embedding", k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    },

    // K11: index RETRAIN + generation swap — the drift answer FAISS
    // spells "train a new index and swap", done in place: build a
    // deliberately STALE quantizer on the first half (k=4, 1 round),
    // append the rest unretrained (k10's shape), then retrainIvfIndex
    // re-clusters the CURRENT postings at the k6 configuration (k=8,
    // 2 rounds), writes a fresh generation and atomically swaps the
    // MANIFEST pointer the probe resolves through. Oracle = k6's SQL
    // verbatim: a retrained index must answer EXACTLY as a fresh build
    // over the full corpus — that equality is the lifecycle's
    // correctness contract (ids survive retraining, so k-means over
    // the postings is k-means over the original vectors)
    "k11_ivf_retrain" -> { (s, dir) =>
      // fixed per-dataset path (the k6/k10 lifecycle rule): the build's
      // generation reset wipes the previous run's manifest + gen dirs
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k11ivf_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      Similarity.buildIvfIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", idx, k = 4, iters = 1)
      Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= 250),
        "vec_id", "embedding", idx)
      Similarity.retrainIvfIndex(s, idx, k = 8, iters = 2)
      Similarity.ivfIndexKnn(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        idx, "vec_id", "embedding", k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    },

    // K12: the maintenance recall probe's per-query evidence — for each
    // query, how many of its brute-force top-3 the persisted index
    // returns at nProbe=1 (the fixed-probe recall that decays under
    // drift). Distributed join-count, no driver-side set compare; the
    // oracle mirrors BOTH ranking sides (kmeans-CTE IVF probe + brute
    // force) and the hit join in SQL.
    "k12_recall_probe" -> { (s, dir) =>
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k12ivf_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx,
        k = 8, iters = 2)
      Similarity.recallProbeRows(s, idx,
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nProbe = 1)
        .orderBy("query_id")
    },

    // K12B: the HELD-OUT recall probe — recallProbeWith's external
    // query-set contract pinned cross-engine: the index holds ONLY
    // vec_id < 450, the query rows (450..454) were never indexed, and
    // the evidence counts how many of each held-out query's
    // brute-force top-3 (over the indexed corpus) the nProbe=1 probe
    // returns. The production shape: recall measured on a true
    // held-out sample instead of the index's own postings (k12)
    "k12b_recall_probe_heldout" -> { (s, dir) =>
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k12bivf_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      Similarity.buildIvfIndex(emb.filter(col("vec_id") < 450),
        "vec_id", "embedding", idx, k = 8, iters = 2)
      Similarity.recallProbeRows(s, idx,
        emb.filter(col("vec_id") >= 450 && col("vec_id") < 455),
        "vec_id", "embedding", k = 3, nProbe = 1)
        .orderBy("query_id")
    },

    // K13: IVF-PQ RETRAIN from source + generation swap — the PQ drift
    // answer (FAISS IndexIVFPQ retrains from the source vectors; the
    // persisted postings are CODES, so k11's retrain-from-postings
    // cannot apply): stale coarse+PQ quantizers trained on the first
    // half (kCells=4, 1 round), append the rest unretrained (k10's
    // shape), then rebuildIvfPqIndex re-trains BOTH quantizers from
    // the full source at the k8 configuration, writes a fresh
    // generation, and atomically swaps the MANIFEST pointer the probe
    // resolves through. Oracle = k8's SQL verbatim: a rebuilt index
    // must answer EXACTLY as a fresh build over the full corpus — the
    // PQ lifecycle's correctness contract
    "k13_ivfpq_rebuild" -> { (s, dir) =>
      import graft.operators.ProductQuantization
      // fixed per-dataset path (the k6/k10/k11 lifecycle rule): the
      // build's generation reset wipes the previous run's manifest +
      // generation dirs
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k13ivfpq_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      ProductQuantization.buildIvfPqIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", idx, kCells = 4, coarseIters = 1,
        m = 4, ksub = 8, pqIters = 1)
      ProductQuantization.appendToIvfPqIndex(
        emb.filter(col("vec_id") >= 250), "vec_id", "embedding", idx)
      ProductQuantization.rebuildIvfPqIndex(emb, "vec_id", "embedding",
        idx, kCells = 8, coarseIters = 2, m = 4, ksub = 8, pqIters = 1)
      ProductQuantization.ivfPqKnn(
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        idx, "vec_id", "embedding", k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    },

    // K13B: the PQ recall probe's per-query evidence — for each query,
    // how many of its TRUE (float, brute-force) top-3 the IVF-PQ index
    // returns at nProbe=1. Unlike k12 this folds BOTH loss sources a
    // PQ deployment monitors: the coarse probe miss AND the
    // code-reconstruction error reordering the shortlist. Exact side
    // ranks the SOURCE vectors (PQ postings are codes); index side is
    // the full ADC path through the persisted index
    "k13b_ivfpq_recall" -> { (s, dir) =>
      import graft.operators.ProductQuantization
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_k13bivfpq_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val emb = table(s, dir, "embeddings")
      ProductQuantization.buildIvfPqIndex(emb, "vec_id", "embedding", idx,
        kCells = 8, coarseIters = 2, m = 4, ksub = 8, pqIters = 1)
      ProductQuantization.recallProbeRows(s, idx, emb,
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nProbe = 1)
        .orderBy("query_id")
    },

    // MM2: frame-sampling plumbing — every 4th frame of each payload
    // (frames = 256-byte spans), with a per-frame byte tag; the explode /
    // per-frame-extraction shape a video pipeline runs before decode
    // (operators.Multimodal.sampleFrames is the library form)
    "mm2_frame_sample" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val media = docs.select(col("doc_id"), col("text"))
        .withColumn("n_frames",
          floor((octet_length(col("text")) + 255) / 256).cast("int"))
      media.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          ascii(expr("substring(text, frame_idx * 256 + 1, 1)"))
            .cast("long").as("frame_tag"))
        .orderBy("doc_id", "frame_idx")
    },

    // MM3: REAL container-header probing (not the codec stub): build
    // byte-exact PNG and WAV files in-plan (unhex over header hex —
    // signature, IHDR, RIFF/fmt/data at their true offsets), then
    // parse them back with the native graft_media_probe expression.
    // The oracle verifies the round trip against the closed form the
    // headers were built from. Map-only, whole-stage codegen
    "mm3_media_probe" -> { (s, dir) =>
      import graft.operators.Multimodal
      def beHex32(c: Column): Column = lpad(hex(c), 8, "0")
      def leHex32(c: Column): Column = {
        val x = lpad(hex(c), 8, "0")
        concat(substring(x, 7, 2), substring(x, 5, 2),
          substring(x, 3, 2), substring(x, 1, 2))
      }
      def leHex16(c: Column): Column = {
        val x = lpad(hex(c), 4, "0")
        concat(substring(x, 3, 2), substring(x, 1, 2))
      }
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val w = col("n_chars") % 1024 + 16
      val h = col("doc_id") % 768 + 16
      val chans = col("doc_id") % 3 + 1
      val rate = col("doc_id") % 8 * 1000 + 8000
      val blockAlign = chans * 2 // 16-bit PCM
      val byteRate = rate * blockAlign
      val dataSize = col("n_chars") * 4
      val pngHex = concat(lit("89504E470D0A1A0A"), lit("0000000D"),
        lit("49484452"), beHex32(w), beHex32(h), lit("0806000000"),
        lit("DEADBEEF"))
      val wavHex = concat(lit("52494646"), leHex32(dataSize + 36),
        lit("57415645"), lit("666D7420"), lit("10000000"), lit("0100"),
        leHex16(chans), leHex32(rate), leHex32(byteRate),
        leHex16(blockAlign), lit("1000"), lit("64617461"),
        leHex32(dataSize))
      val media = docs.select(col("doc_id"),
        unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(wavHex))
          .as("payload"))
      Multimodal.probeMeta(media, "doc_id", "payload")
        .orderBy("doc_id")
    },

    // PR1: dataset-card corpus profile per source — volume, exact-dup
    // rate, token-length quantiles in ONE grouped pass (exact mode here
    // for the oracle; operators.Profile.datasetCard(exact=false) swaps
    // the distinct count for a HyperLogLog++ sketch at scale)
    "pr1_dataset_card" -> { (s, dir) =>
      import graft.operators.Profile
      Profile.datasetCard(table(s, dir, "documents"), "source", "text",
        exact = true)
        .orderBy("source")
    },

    // PR4: per-slice token heavy hitters — top 5 tokens per language,
    // one (group, token) partial-aggregated shuffle then a salted
    // two-stage top-k (local top-k per (group, salt) cell, final rank
    // over <= k*salts survivors) so no group's vocabulary ever funnels
    // through one partition; deterministic (cnt DESC, token) ties
    "pr4_top_tokens" -> { (s, dir) =>
      import graft.operators.Profile
      Profile.topTokens(table(s, dir, "documents"), "lang", "text", k = 5)
        .orderBy("lang", "rk")
    },

    // PR5: the SKETCH path for pr4 — graft_frequent_items (Misra-Gries,
    // the repo's one TypedImperativeAggregate) gives per-group heavy
    // hitters with hard bounded state: the shuffle carries one
    // <= capacity-counter summary per (partition, group), never the
    // vocabulary. Exact (max_err 0, oracle-able) while capacity covers
    // each partial's distinct tokens — the bound regime is
    // property-tested in FrequentItemsSpec
    "pr5_top_tokens_sketch" -> { (s, dir) =>
      import graft.operators.Profile
      Profile.topTokensSketch(table(s, dir, "documents"), "lang", "text",
          k = 5, capacity = 4096)
        .orderBy("lang", "rk")
    },

    // PR6: the curation-card LIFECYCLE oracled end to end — three
    // curationBatch triggers build the store + increment log, a
    // rebuildCard folds the first two into the folded_thru summary, a
    // third batch lands live above the watermark, and a STALE folded
    // increment (a rebuild crash's leftover, planted as a copy of
    // batch 2's increment at batch_seq=1) must be MASKED by the
    // watermark. The oracle recomputes the expected totals from
    // `documents` directly: per content key the winner is the earliest
    // (batch, doc_id) pair — batches partition on doc_id % 3, so the
    // winner is argmin(doc_id % 3, doc_id) — and the card sums the
    // winners per source. Exercises the gate → route → history-dedup →
    // increment → fold → mask algebra cross-engine
    "pr6_curation_card_lifecycle" -> { (s, dir) =>
      import graft.streaming.DocumentStream
      val store = freshTmpDir("pr6store", dir)
      val card = freshTmpDir("pr6card", dir)
      val docs = table(s, dir, "documents")
      // frozen router model — affects routing labels only, never the
      // card totals; trained on a deterministic subset
      val model = graft.operators.Classify.nbFit(
        docs.filter(col("doc_id") % 5 =!= 0), "lang", "text",
        vocabSize = 24).localCheckpoint(true)
      def slice(i: Int) = docs.filter(col("doc_id") % 3 === i)
      DocumentStream.curationBatch(slice(0), 0L, "text", "doc_id",
        "source", model, 0.0, store, card)
      DocumentStream.curationBatch(slice(1), 1L, "text", "doc_id",
        "source", model, 0.0, store, card)
      DocumentStream.rebuildCard(s, store, card, "text", "source")
      DocumentStream.curationBatch(slice(2), 2L, "text", "doc_id",
        "source", model, 0.0, store, card)
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(card, "batch_seq=2"),
        new java.io.File(card, "batch_seq=1"))
      DocumentStream.curationCard(s, card, "source").orderBy("source")
    },

    // PR3: multi-granularity dataset card — ONE rollup pass yields the
    // (source, lang), per-source, and grand-total cards from the same
    // partial aggregates; subtotal rows carry NULLs (ANSI ROLLUP)
    "pr3_rollup_card" -> { (s, dir) =>
      import graft.operators.Profile
      Profile.datasetCardRollup(table(s, dir, "documents"),
        Seq("source", "lang"), "text")
        .orderBy(asc_nulls_first("source"), asc_nulls_first("lang"))
    },

    // X8: the event-analytics composite — one per-user 360 row from the
    // new family: gap sessions (se1), funnel progression (fu1, depth 0
    // when never entered), cohort week (co1), activity bounds. All
    // pieces key on user_id, so the joins co-partition on the same
    // exchange the per-user aggregates produce
    "x8_user360" -> { (s, dir) =>
      import graft.operators.{Funnel, Sessionize}
      val ev = table(s, dir, "events")
      val base = ev.select(col("user_id"), tsSeconds(ev).as("ts"),
        col("event_id"), col("event_type"))
      val sess = Sessionize.sessionStats(base, Seq("user_id"), "ts",
          gapS = 1800L, tieBreak = Seq("event_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("total_events"))
      val fun = Funnel.funnel(base, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), windowS = 86400L)
        .select(col("user_id"), col("funnel_depth"))
      val cohort = base.groupBy("user_id")
        .agg(floor(min(col("ts")) / 604800L).cast("long")
            .as("cohort_week"),
          max(col("ts")).as("last_seen_ts"))
      sess.join(cohort, Seq("user_id"))
        .join(fun, Seq("user_id"), "left")
        .withColumn("funnel_depth",
          coalesce(col("funnel_depth"), lit(0)).cast("int"))
        .select("user_id", "n_sessions", "total_events", "cohort_week",
          "last_seen_ts", "funnel_depth")
        .orderBy("user_id")
    },

    // X9: curation against a PRE-SEEDED store — the redeployment shape
    // pr6 doesn't cover: a PREVIOUS deployment curated one slice into
    // the store (its card retired with it), then a NEW deployment
    // streams two batches against that non-empty history with a fresh
    // card. Pins, in one cross-engine fold: (a) admission — seeded
    // history suppresses stream duplicates exactly like stream-written
    // history (the anti-join has no notion of "who" wrote a key);
    // (b) the fresh card counts ONLY what the new deployment admitted
    // (n_docs == n_stream, both computed independently store-side);
    // (c) routing — the frozen-NB labels of the admitted stream docs
    // (n_stream_en), reproduced in SQL by the cl1 argmax chain. The
    // model is frozen ONCE across all three triggers (the deployment
    // contract). Batch seqs: seed 100, stream 0..1 — store rows carry
    // their deployment's stamp
    "x9_seeded_curation" -> { (s, dir) =>
      import graft.streaming.DocumentStream
      val seedCard = freshTmpDir("x9seedcard", dir)
      val store = freshTmpDir("x9store", dir)
      val card = freshTmpDir("x9card", dir)
      val docs = table(s, dir, "documents")
      val frozen = graft.operators.Classify.nbFreeze(
        graft.operators.Classify.nbFit(
          docs.filter(col("doc_id") % 5 =!= 0), "lang", "text",
          vocabSize = 24))
      // previous deployment: seeds the store, card retired with it
      DocumentStream.curationBatch(docs.filter(col("doc_id") % 3 === 0),
        100L, "text", "doc_id", "source", frozen, 0.0, store, seedCard)
      // new deployment over non-empty history: fresh card
      DocumentStream.curationBatch(docs.filter(col("doc_id") % 3 === 1),
        0L, "text", "doc_id", "source", frozen, 0.0, store, card)
      DocumentStream.curationBatch(docs.filter(col("doc_id") % 3 === 2),
        1L, "text", "doc_id", "source", frozen, 0.0, store, card)
      val storeAgg = s.read.parquet(store)
        .groupBy(col("source"))
        .agg(
          sum(when(col("batch_seq") < 100L, 1L).otherwise(0L))
            .as("n_stream"),
          sum(when(col("batch_seq") === 100L, 1L).otherwise(0L))
            .as("n_seed"),
          sum(when(col("batch_seq") < 100L &&
              col("predicted") === "en", 1L).otherwise(0L))
            .as("n_stream_en"))
      DocumentStream.curationCard(s, card, "source")
        .join(storeAgg, Seq("source"))
        .orderBy("source")
    },

    // H1: the pricing-summary rollup (TPC-H Q1 shape) over lineitem —
    // one partial-aggregating pass, all sums/avgs mergeable map-side;
    // rounded identically on both engines since double-sum order
    // differs across partitionings
    "h1_pricing_summary" -> { (s, dir) =>
      def r2(c: Column) = floor(c * 100L + 0.5) / 100L
      val li = table(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_price"),
          r2(avg(col("l_quantity"))).as("avg_qty"),
          (floor(avg(col("l_discount")) * 10000L + 0.5) / 10000L)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // H3: shipping priority (TPC-H Q3 shape) — the fact table joins a
    // BROADCAST filtered dimension; top-10 by revenue with the sort on
    // the ROUNDED value + key so the cut is deterministic cross-engine
    "h3_shipping_priority" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "o_orderpriority")
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg((floor(sum(col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))) * 100L + 0.5) / 100L)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          unix_timestamp(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // H5: local-supplier revenue (TPC-H Q5 shape) — the 6-relation
    // star: fact table shuffles once on orderkey, every dimension
    // (region→nation, customer, supplier) broadcasts; the
    // same-nation customer/supplier constraint rides the supplier join
    "h5_local_supplier" -> { (s, dir) =>
      val nat = table(s, dir, "nation")
        .join(broadcast(table(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = table(s, dir, "customer")
        .join(broadcast(nat.select(col("n_nationkey").as("__nk"))),
          col("c_nationkey") === col("__nk"))
        .select("c_custkey", "c_nationkey")
      val supp = table(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select("o_orderkey", "o_custkey")
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice",
          "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(supp),
          li("l_suppkey") === supp("s_suppkey") &&
            cust("c_nationkey") === supp("s_nationkey"))
        .join(broadcast(nat),
          supp("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((floor(sum(col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))) * 100L + 0.5) / 100L)
          .as("revenue"))
        .orderBy("n_name")
    },

    // H14: promo revenue share (TPC-H Q14 shape) — lineitem ⋈ BROADCAST
    // part with a conditional aggregate: the CASE rides the same pass
    // as the total, one scan, one broadcast, one one-row result
    "h14_promo_revenue" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-07-01")))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val part = table(s, dir, "part").select("p_partkey", "p_type")
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .agg(
          (floor(sum(when(col("p_type").startsWith("PROMO"), rev)
            .otherwise(lit(0.0))) * 100L + 0.5) / 100L)
            .as("promo_revenue"),
          (floor(sum(rev) * 100L + 0.5) / 100L).as("total_revenue"))
        .withColumn("promo_ppm",
          floor(col("promo_revenue") * 1000000L / col("total_revenue"))
            .cast("long"))
    },

    // H18: large-volume orders (TPC-H Q18 shape) — a HAVING on the
    // fact aggregate, then the qualifying keys (display-sized) join
    // back to orders/customer as a broadcast semi-ish star
    "h18_large_orders" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("__sumq"))
        .filter(col("__sumq") > 200.0)
        .select(col("l_orderkey").as("o_orderkey"),
          (floor(col("__sumq") * 100L + 0.5) / 100L).as("sum_qty"))
      val ord = table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      val cust = table(s, dir, "customer").select("c_custkey", "c_name")
      ord.join(broadcast(big), "o_orderkey")
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy("o_orderkey")
    },

    // H17: small-quantity-order revenue (TPC-H Q17 shape) — the
    // CORRELATED SCALAR SUBQUERY (`l_quantity < 0.2 * avg(l_quantity)
    // for the same part`) decorrelated into ONE pass: the brand/size
    // part filter broadcasts into the fact scan, and the per-part avg
    // is a window over the filtered rows — the filtered fact exchanges
    // once on l_partkey and is never scanned twice (the agg+join-back
    // decorrelation would re-read it, the exact d17-class double
    // branch). Revenue sums integer cents so the one-row result is
    // order-independent
    "h17_small_qty_revenue" -> { (s, dir) =>
      val p = table(s, dir, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_size") <= 15)
        .select("p_partkey")
      val li = table(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val w = Window.partitionBy("l_partkey")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .withColumn("__avgq", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.2) * col("__avgq"))
        .agg(sum(floor(col("l_extendedprice") * 100L + 0.5).cast("long"))
          .as("__c"))
        .select((floor(col("__c") / lit(7.0) + 0.5) / 100L)
          .as("avg_yearly"))
    },

    // H21: suppliers who kept orders waiting (TPC-H Q21 shape) — the
    // EXISTS/NOT-EXISTS multi-condition self-join pair: a supplier's
    // late lineitem qualifies iff ANOTHER supplier shipped on the same
    // order (left_semi) and NO OTHER supplier was also late (left_anti).
    // The finished-order fact rows are materialized ONCE
    // (localCheckpoint) and feed all three sides, each self-join
    // co-keyed on l_orderkey; supplier and nation broadcast. "Late" =
    // shipped more than 90 days after the order date (the synthetic
    // tables carry no commit/receipt dates)
    "h21_waiting_suppliers" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val lo = table(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 90 DAY")).as("late"))
        .localCheckpoint(true)
      val l2 = lo.select(col("l_orderkey").as("__ok"),
        col("l_suppkey").as("__sk"))
      val l3 = lo.filter(col("late"))
        .select(col("l_orderkey").as("__ok3"), col("l_suppkey").as("__sk3"))
      val supp = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_7"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      lo.filter(col("late"))
        .join(l2, col("l_orderkey") === col("__ok") &&
          col("l_suppkey") =!= col("__sk"), "left_semi")
        .join(l3, col("l_orderkey") === col("__ok3") &&
          col("l_suppkey") =!= col("__sk3"), "left_anti")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // H13: customer order-count distribution (TPC-H Q13 shape) — the
    // LEFT-JOIN-COUNT histogram: orders pre-aggregate to one row per
    // customer BEFORE the join (the raw fact never rides the customer
    // join), customers with no qualifying orders keep count 0 via the
    // left join, then the distribution is a second tiny groupBy.
    // Priority class 1-URGENT stands in for Q13's comment-regex filter
    "h13_order_count_distribution" -> { (s, dir) =>
      val perCust = table(s, dir, "orders")
        .filter(!col("o_orderpriority").startsWith("1-"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("__n"))
      table(s, dir, "customer").select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("__n"), lit(0L)).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // H16: supplier variety per part class (TPC-H Q16 shape) — the
    // DISTINCT-COUNT over ANTI-JOINED dims: lineitem's (part, supplier)
    // pairs stand in for partsupp, the part filter broadcasts INTO the
    // fact scan before the distinct, complained-about suppliers
    // (negative balance — no comment column) leave via a broadcast
    // anti-join, then count(DISTINCT supplier) per (brand, type, size)
    "h16_part_supplier_variety" -> { (s, dir) =>
      val p = table(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#45" &&
          col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = table(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      table(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count(lit(1)).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // H2: minimum-cost supplier per part (TPC-H Q2 shape) — the
    // CORRELATED MIN() SUBQUERY over a dim chain
    // (supplier⋈nation⋈region), decorrelated to ONE windowed pass:
    // lineitem aggregates to its (part, supplier) cheapest-price
    // relation (the partsupp analog — the synthetic schema has no
    // partsupp) with the EUROPE supplier chain and the part filter both
    // broadcast INTO that single fact scan, and the per-part minimum is
    // a window min over the already-restricted aggregate — no
    // agg+join-back second fact read (the h17/d17 rule)
    "h2_min_cost_supplier" -> { (s, dir) =>
      val eu = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .join(broadcast(table(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val p = table(s, dir, "part")
        .filter(col("p_type") === "ECONOMY" && col("p_size") <= 10)
        .select("p_partkey")
      val ps = table(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(min("l_extendedprice").as("supplycost"))
      val w = Window.partitionBy("p_partkey")
      ps.withColumn("__min", min(col("supplycost")).over(w))
        .filter(col("supplycost") === col("__min"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supplycost")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
    },

    // H20: part-promotion suppliers (TPC-H Q20 shape) — the NESTED IN
    // with a per-key aggregate threshold: the part-name IN-list
    // broadcasts into the one date-pruned lineitem scan, the
    // (supplier, part) shipped-quantity aggregate applies the HAVING
    // threshold, and the surviving supplier keys semi-join the
    // nation-filtered supplier dim (dim-sized left side, so the
    // aggregate never widens past its own keys)
    "h20_part_promotion_suppliers" -> { (s, dir) =>
      val pp = table(s, dir, "part")
        .filter(col("p_name").startsWith("small"))
        .select("p_partkey")
      val qual = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum("l_quantity").as("__sq"))
        .filter(col("__sq") > 40.0)
        .select("l_suppkey")
      table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name").isin("NATION_2", "NATION_6", "NATION_11"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    },

    // H22: dormant high-balance customers per name-code bucket (TPC-H
    // Q22 shape) — the SUBSTRING-BUCKET ANTI-JOIN: the code bucket is
    // the last two chars of c_name (the synthetic schema has no phone),
    // the above-average test is EXACT integer arithmetic against a
    // one-row broadcast (cents·n > Σcents — no float division to flip a
    // boundary row; cents ≤ 1e6 and n ≤ 1e9-class keep the product well
    // under 2^63), and "dormant" anti-joins the recent-orders fact
    // projected to its single key column — the shuffle carries custkeys,
    // never order rows. The filtered customer slice materializes once
    // and feeds both the threshold and the main pass (the h21 rule)
    "h22_sales_opportunity" -> { (s, dir) =>
      val codes = Seq("01", "12", "23", "34", "45", "56", "67")
      val sel = table(s, dir, "customer")
        .select(expr("right(c_name, 2)").as("cntrycode"),
          col("c_custkey"), col("c_acctbal"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("__cents"))
        .filter(col("cntrycode").isin(codes: _*))
        .localCheckpoint(true)
      val st = sel.filter(col("c_acctbal") > 0)
        .agg(sum("__cents").as("__sc"), count(lit(1)).as("__n"))
      val recent = table(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
        .select("o_custkey")
      sel.crossJoin(broadcast(st))
        .filter(col("__cents") * col("__n") > col("__sc"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          (sum("__cents") / 100.0).as("totacctbal"))
        .orderBy("cntrycode")
    },

    // H4: order priority checking (TPC-H Q4 shape) — EXISTS with a
    // MIXED equi + non-equi condition: a quarter's orders survive iff
    // some lineitem of theirs shipped more than 30 days after the
    // order date (the commit<receipt standin). One co-keyed left_semi
    // on l_orderkey, quarter filter pruning orders BEFORE the join
    "h4_order_priority_check" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-04-01")))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = table(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 30 DAY"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // H6: forecasting revenue change (TPC-H Q6 shape) — the pure
    // scan-aggregate: every predicate (shipdate window, discount band,
    // quantity cap) pushes to the parquet scan, no join anywhere, and
    // the revenue sums per-row integer cents so the one-row answer is
    // order-independent
    "h6_forecast_revenue" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg((sum(floor(col("l_extendedprice") * col("l_discount")
            * 100 + 0.5).cast("long")) / 100.0).as("revenue"))
    },

    // H10: returned-item reporting (TPC-H Q10 shape) — top-20 customers
    // by lost revenue: the returned-lineitem fact joins the
    // quarter-filtered orders CO-KEYED on l_orderkey, aggregates to one
    // row per customer BEFORE the dim joins (customer/nation broadcast
    // onto customer-count rows, never lineitems), then a global top-20
    // by exact integer-cent revenue
    "h10_returned_items" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-04-01")))
        .select("o_orderkey", "o_custkey")
      val li = table(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long").as("__cents"))
      val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum("__cents").as("__c"))
      val cust = table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
      perCust.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("c_acctbal"), (col("__c") / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // H12: shipping priority classes (TPC-H Q12 shape) — the
    // CONDITIONAL TWO-COUNT pivot: the date-pruned lineitem fact joins
    // orders co-keyed on the order key (both fact-sized — no broadcast
    // pretense), then one grouped pass pivots priorities into
    // high/low counts per return flag (the ship-mode standin)
    "h12_priority_shipping" -> { (s, dir) =>
      val hi = Seq("1-URGENT", "2-HIGH")
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .select("l_orderkey", "l_returnflag")
      val ord = table(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin(hi: _*), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin(hi: _*), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // H19: discounted revenue over DISJUNCTIVE predicates (TPC-H Q19
    // shape): the part side pre-filters to the three branches' HULL
    // (brand set × max size band) before broadcasting — the classic
    // Q19 rewrite that turns an un-pushable OR into a pushed dim
    // filter — and the per-branch (brand, size, quantity) residual
    // disjunction applies after the join; revenue sums integer cents
    "h19_disjunctive_revenue" -> { (s, dir) =>
      val p = table(s, dir, "part")
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#3") &&
          col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
      val li = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      def branch(b: String, sHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === b && col("p_size").between(1, sHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#12", 5, 1, 11) ||
          branch("Brand#23", 10, 10, 20) ||
          branch("Brand#3", 15, 20, 30))
        .agg((sum(floor(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")) * 100 + 0.5).cast("long"))
          / 100.0).as("revenue"))
    },

    // H7: two-nation volume shipping (TPC-H Q7 shape) — the DISJUNCTIVE
    // NATION PAIR: lineitem joins orders co-keyed on the order key, the
    // supplier→nation and customer→nation chains broadcast (each
    // pre-filtered to the two nations, so the broadcast rows shrink
    // before the fact sees them), and the (supp, cust) ≠-pair
    // disjunction applies after both chains attach; revenue sums
    // integer cents per (supp_nation, cust_nation, year)
    "h7_volume_shipping" -> { (s, dir) =>
      val pair = Seq("NATION_3", "NATION_7")
      val supp = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name").isin(pair: _*))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name").isin(pair: _*))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = table(s, dir, "orders").select("o_orderkey", "o_custkey")
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long").as("__cents"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((sum("__cents") / 100.0).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // H8: national market share (TPC-H Q8 shape) — the SHARE OF A
    // GROUPED SUM: one fact pass carries BOTH the focal nation's
    // conditional sum and the total per year, so the share needs no
    // self-join or second scan; the ratio is exact bigint arithmetic
    // (cents·10⁶ div total — sound while total < 2^63/10⁶ ≈ 92T cents)
    // so no float division can flip a digit cross-engine
    "h8_market_share" -> { (s, dir) =>
      val market = table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")
          .join(broadcast(table(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val supp = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val part = table(s, dir, "part")
        .filter(col("p_type") === "STANDARD").select("p_partkey")
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long").as("__cents"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(market), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_5", col("__cents"))
            .otherwise(0L)).as("__nc"),
          sum("__cents").as("__tc"))
        .select(col("o_year"),
          expr("(__nc * 1000000) div __tc").as("share_ppm"),
          (col("__nc") / 100.0).as("nation_revenue"),
          (col("__tc") / 100.0).as("total_revenue"))
        .orderBy("o_year")
    },

    // H9: product-type profit (TPC-H Q9 shape) — profit per (supplier
    // nation, order year) for one part family: the fact joins orders
    // co-keyed (year comes from the order), the name-filtered part and
    // the supplier→nation chain broadcast, and per-row profit is the
    // difference of two integer-cent roundings (revenue minus
    // retail-cost·qty — the schema has no partsupp, so p_retailprice
    // stands in for ps_supplycost), summed exactly
    "h9_product_profit" -> { (s, dir) =>
      val part = table(s, dir, "part")
        .filter(col("p_name").contains("bolt"))
        .select("p_partkey", "p_retailprice")
      val supp = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val ord = table(s, dir, "orders").select("o_orderkey", "o_orderdate")
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long") -
           floor(col("p_retailprice") * 100 + 0.5).cast("long") *
            col("l_quantity").cast("long")).as("__pc"))
        .groupBy("nation", "o_year")
        .agg((sum("__pc") / 100.0).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // H11: important stock (TPC-H Q11 shape) — the GROUP-VS-GLOBAL
    // HAVING: per-part value (supply-cost·qty over one nation's
    // suppliers; lineitem is the partsupp analog) aggregates ONCE and
    // is checkpointed, the global total derives from that same
    // aggregate as a one-row BROADCAST (never a second fact scan), and
    // the threshold test is exact bigint (value·10⁴ > total — sound
    // while total < 2^63/10⁴)
    "h11_important_stock" -> { (s, dir) =>
      val supp = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val perPart = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
            col("l_quantity").cast("long")).as("__vc"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"),
          "left_semi")
        .groupBy("l_partkey")
        .agg(sum("__vc").as("__pv"))
        .localCheckpoint(true) // feeds the global total AND the filter
      val total = perPart.agg(sum("__pv").as("__gv"))
      perPart.crossJoin(broadcast(total))
        .filter(col("__pv") * 10000L > col("__gv"))
        .select(col("l_partkey"), (col("__pv") / 100.0).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },

    // H15: top supplier (TPC-H Q15 shape) — MAX OVER AN AGGREGATE
    // VIEW: the quarter's per-supplier revenue aggregates once and is
    // checkpointed, its maximum comes back as a one-row broadcast, and
    // the equality filter (exact integer cents — ties would ALL
    // surface, as in the spec's view semantics) picks the top
    // supplier(s) before the display-sized supplier dim broadcasts in
    "h15_top_supplier" -> { (s, dir) =>
      val rev = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01")))
        .select(col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long").as("__cents"))
        .groupBy("l_suppkey")
        .agg(sum("__cents").as("__rc"))
        .localCheckpoint(true) // feeds the max row AND the filter
      val top = rev.agg(max("__rc").as("__mx"))
      rev.crossJoin(broadcast(top))
        .filter(col("__rc") === col("__mx"))
        .join(broadcast(table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("__rc") / 100.0).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // ER1: exact edit-distance self-join over the customer-key
    // vocabulary — symmetric-delete (SymSpell) candidate generation:
    // depth-1 deletion neighborhoods joined on the shared variant, a
    // GUARANTEED superset for any string length (q-gram prefix filters
    // are not), then codegen'd levenshtein(threshold) verification.
    // Every shuffle is vocabulary-scale; no all-pairs anywhere.
    "er1_fuzzy_ed_join" -> { (s, dir) =>
      import graft.operators.EntityResolution
      EntityResolution
        .editDistancePairs(table(s, dir, "customer"), "c_name", k = 1)
        .orderBy("name_a", "name_b")
    },

    // ER2: dirty-record → master-data assignment — each customer key
    // mapped to the nearest key of the high-balance "master" registry
    // within one edit (ties: smaller distance, then lexicographic
    // master; null when none). The per-key argmin is min(struct(...)),
    // a partial-aggregatable fold — never a window, so a dirty key
    // matching many masters funnels nothing.
    "er2_nearest_master" -> { (s, dir) =>
      import graft.operators.EntityResolution
      val cust = table(s, dir, "customer")
      val masters = cust.filter(col("c_acctbal") >= 9000.0)
      EntityResolution.nearestMaster(cust, "c_name", masters, "c_name",
          k = 1)
        .select("c_custkey", "c_name", "master_name", "dist")
        .orderBy("c_custkey")
    },

    // ZO1: Z-order layout scan — lineitem re-clustered on
    // (l_orderkey, l_partkey) by quantile-bucket bit interleave, then
    // a two-dimensional range predicate aggregated over the laid-out
    // copy. The ANSWER is layout-independent (the oracle is plain SQL
    // on the original table); the point of the layout — file-level
    // min/max pruning on BOTH dimensions — is pinned in LayoutSpec.
    "zo1_zorder_scan" -> { (s, dir) =>
      import graft.operators.Layout
      // fixed per-dataset path, overwritten each run: the layout copy
      // is fact-table-scale, so repeated runs (bench reps, soak legs)
      // must reuse one directory rather than leak a copy per run
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_zo1_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Layout.zorderWrite(table(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey"), out, nFiles = 32,
        cutsSampleFraction = 0.05) // cuts from a sample, like any
                                   // range partitioner's boundaries
      s.read.parquet(out)
        .filter(col("l_orderkey").between(1000, 2999) &&
          col("l_partkey").between(200, 599))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (floor(sum(col("l_quantity")) * 100 + 0.5) / 100L)
            .as("sum_qty"),
          (floor(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            * 100 + 0.5) / 100L).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // CD1: SCD type-2 dimension build from the event changelog — LWW
    // within identical (user, second) via a partial-aggregatable
    // max(struct), consecutive no-op updates compressed, intervals
    // from ONE key-partitioned window pair (lag + lead share the
    // exchange). Per-window state = one user's compressed history.
    "cd1_scd2_intervals" -> { (s, dir) =>
      import graft.operators.Scd
      val ev = table(s, dir, "events")
      val log = ev.select(col("user_id"), tsSeconds(ev).as("ts"),
        col("event_id"), col("event_type"))
      Scd.scd2(log, Seq("user_id"), "ts", "event_id", Seq("event_type"))
        .orderBy("user_id", "valid_from")
    },

    // CD2: point-in-time snapshot of the SCD2 dimension — each user's
    // state as of one instant; a pure interval filter over cd1's
    // output (file-prunable on both bounds when stored sorted).
    "cd2_pit_snapshot" -> { (s, dir) =>
      import graft.operators.Scd
      val ev = table(s, dir, "events")
      val log = ev.select(col("user_id"), tsSeconds(ev).as("ts"),
        col("event_id"), col("event_type"))
      Scd.snapshotAt(
          Scd.scd2(log, Seq("user_id"), "ts", "event_id", Seq("event_type")),
          lit(1704844800L)) // 2024-01-10T00:00:00Z
        .select("user_id", "event_type", "valid_from")
        .orderBy("user_id")
    },

    // CD3: CDC extraction — diff two point-in-time snapshots of the
    // SCD2 dimension into a changelog (insert/delete/update; unchanged
    // dropped). ONE co-keyed full outer join on presence markers; the
    // shared scd2 relation is checkpointed so the two snapshots read
    // one materialization, not two window recomputes.
    "cd3_snapshot_diff" -> { (s, dir) =>
      import graft.operators.Scd
      val ev = table(s, dir, "events")
      val log = ev.select(col("user_id"), tsSeconds(ev).as("ts"),
        col("event_id"), col("event_type"))
      val scd = Scd.scd2(log, Seq("user_id"), "ts", "event_id",
        Seq("event_type")).localCheckpoint(true)
      Scd.snapshotDiff(
          Scd.snapshotAt(scd, lit(1704844800L)) // 2024-01-10
            .select("user_id", "event_type"),
          Scd.snapshotAt(scd, lit(1706140800L)) // 2024-01-25
            .select("user_id", "event_type"),
          Seq("user_id"), Seq("event_type"))
        .orderBy("user_id")
    },

    // DQ1: data-quality gate — Deequ-style expectations, one verdict
    // row per rule. Row rules + uniqueness fold into ONE corpus
    // aggregate (mixed distinct/non-distinct over one scan); the FK
    // rule is one anti-join against the distinct order keys.
    "dq1_expectations" -> { (s, dir) =>
      import graft.operators.Quality._
      validate(table(s, dir, "lineitem"), Seq(
        NotNull("l_orderkey"),
        InRange("l_discount", 0.0, 0.1),
        InRange("l_quantity", 1.0, 25.0),
        AcceptedValues("l_returnflag", Seq("A", "N", "R")),
        Unique(Seq("l_orderkey", "l_linenumber")),
        ForeignKey(Seq("l_orderkey"), table(s, dir, "orders"),
          Seq("o_orderkey"))))
    },

    // SE5: RFM user segmentation — recency/frequency/monetary quartiles
    // via THREE exact global ntiles, each a range shuffle
    // (Ranking.withGlobalNtile — never a single-partition window);
    // anchor fixed just past the data window so recency is deterministic
    "se5_rfm" -> { (s, dir) =>
      import graft.operators.Ranking
      val anchor = 1706745600L // 2024-02-01T00:00Z
      val ev = table(s, dir, "events")
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), tsSeconds(ev).as("ts"), col("value"))
        .groupBy("user_id")
        .agg((lit(anchor) - max(col("ts"))).as("recency_s"),
          count(lit(1)).as("frequency"),
          (floor(sum(col("value")) * 10000L + 0.5) / 10000L)
            .as("monetary"))
      val r = Ranking.withGlobalNtile(pu, 4, "r_bucket",
        col("recency_s").asc, col("user_id").asc)
      val f = Ranking.withGlobalNtile(r, 4, "f_bucket",
        col("frequency").desc, col("user_id").asc)
      val m = Ranking.withGlobalNtile(f, 4, "m_bucket",
        col("monetary").desc, col("user_id").asc)
      m.withColumn("rfm_segment",
          (col("r_bucket") * 100 + col("f_bucket") * 10 +
            col("m_bucket")).cast("long"))
        .select("user_id", "recency_s", "frequency", "monetary",
          "r_bucket", "f_bucket", "m_bucket", "rfm_segment")
        .orderBy("user_id")
    },

    // SE4: event-transition matrix — per-user lead() gives consecutive
    // (from, to) event-type pairs in one user-keyed window pass; the
    // 25-cell matrix gets integer ppm row probabilities (transitions
    // materialized once — two consumers: counts and row totals)
    "se4_event_transitions" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = ev
        .select(col("user_id"), tsSeconds(ev).as("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .localCheckpoint(true)
      val tot = trans.groupBy("from_type").agg(sum("n_trans").as("__t"))
      trans.join(broadcast(tot), "from_type")
        .withColumn("prob_ppm",
          floor((col("n_trans") * 1000000L) / col("__t")).cast("long"))
        .select("from_type", "to_type", "n_trans", "prob_ppm")
        .orderBy("from_type", "to_type")
    },

    // SE3: semi-structured props — from_json (typed, codegen'd) pulls
    // the payload field out of the events' JSON column; integer sums so
    // the rollup is exact in any engine
    "se3_props_extract" -> { (s, dir) =>
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val ev = table(s, dir, "events")
      ev.select(col("event_type"),
          from_json(col("props"), StructType(Seq(
            StructField("k", LongType)))).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // SE2: sliding-window traffic — native window() (1 h window, 15 min
    // slide: each event lands in its 4 overlapping windows map-side, no
    // self-join), counts and 4-decimal value sums per (window, type)
    "se2_sliding_counts" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val base = ev.select(tsSeconds(ev).cast("timestamp").as("et"),
        col("event_type"), col("value"))
      base.groupBy(window(col("et"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          (floor(sum(col("value")) * 10000L + 0.5) / 10000L)
            .as("total_value"))
        .select(col("window.start").cast("long").as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // T1: n-gram/stopword-heuristic language ID
    "t1_langid" -> { (s, dir) =>
      TextAnalysis.langId(table(s, dir, "documents"), "text")
        .select(col("doc_id"),
          col("score_en").cast("long").as("score_en"),
          col("score_de").cast("long").as("score_de"),
          col("score_fr").cast("long").as("score_fr"),
          col("score_es").cast("long").as("score_es"),
          col("pred_lang"))
        .orderBy("doc_id")
    },

    // T2: heuristic quality scoring
    "t2_quality" -> { (s, dir) =>
      TextAnalysis.qualityScore(table(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("stopword_ratio"), col("avg_word_len"), col("quality_score"))
        .orderBy("doc_id")
    },

    // T3: whitespace + BPE-ish token counting
    "t3_tokens" -> { (s, dir) =>
      TextAnalysis.tokenCounts(table(s, dir, "documents"), "text")
        .select(col("doc_id"),
          col("ws_tokens").cast("long").as("ws_tokens"),
          col("subword_tokens").cast("long").as("subword_tokens"))
        .orderBy("doc_id")
    },

    // T4: winnowing-style document fingerprint over word 4-grams
    "t4_fingerprint" -> { (s, dir) =>
      TextAnalysis.fingerprint(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // T5: PII redaction — the corpus carries no PII, so the query plants
    // deterministic synthetic PII (email/IP/SSN/phone derived from
    // doc_id+source) and verifies both the counts and the md5 of the
    // redacted text against the oracle running the SAME patterns
    "t5_pii_redact" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val id = col("doc_id").cast("string")
      val aug = docs.select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), id, lit("@"), col("source"), lit(".com"),
          lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0.12"),
          lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" tel 800-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          when(col("doc_id") % 3 === 0, " alt bob@example.org").otherwise(""))
          .as("text"))
      TextAnalysis.redactPii(aug, "text")
        .select(col("doc_id"),
          col("n_email").cast("long").as("n_email"),
          col("n_ip").cast("long").as("n_ip"),
          col("n_ssn").cast("long").as("n_ssn"),
          col("n_phone").cast("long").as("n_phone"),
          substring(md5(col("redacted")), 1, 16).as("red_hash"))
        .orderBy("doc_id")
    },

    // T6: Gopher-style repetition filters — top-2-gram fraction and
    // duplicate-2-gram fraction per document
    "t6_repetition" -> { (s, dir) =>
      TextAnalysis.repetitionStats(table(s, dir, "documents"), "doc_id",
        "text", n = 2)
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          col("top_n"), col("top_ratio"), col("dup_ratio"))
        .orderBy("doc_id")
    },

    // T8: Gopher quality rules (Rae et al. 2021 A1.1) — the standard
    // web-corpus pre-filter as one codegen'd map pass (minWords lowered
    // to 20 so the short synthetic docs exercise both rule outcomes)
    "t8_gopher_rules" -> { (s, dir) =>
      TextAnalysis.gopherRules(table(s, dir, "documents"), "doc_id", "text",
        minWords = 20)
        .orderBy("doc_id")
    },

    // T9: C4 line-level cleaning (Raffel et al. 2020 §2.2). The synthetic
    // docs have no newlines/punctuation, so the fixture deterministically
    // re-chunks tokens into 10-word "lines", appending '.' when the
    // chunk index % 3 != 2 — every rule then fires both ways.
    "t9_c4_rules" -> { (s, dir) =>
      val toks = split(col("text"), "\\s+")
      val nChunks = ceil(size(toks) / 10.0).cast("int")
      val lined = concat_ws("\n",
        transform(sequence(lit(0), nChunks - 1), i =>
          concat(array_join(slice(toks, i * 10 + 1, lit(10)), " "),
            when(i % 3 =!= 2, lit(".")).otherwise(lit("")))))
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), lined.as("lined_text"))
      TextAnalysis.c4Rules(docs, "doc_id", "lined_text")
        .orderBy("doc_id")
    },

    // D10: corpus-level boilerplate line removal (CCNet/RefinedWeb) —
    // same deterministic 5-word re-chunking as t9 so chunk repeats
    // across the synthetic corpus become "boilerplate"
    "d10_boilerplate" -> { (s, dir) =>
      val toks = split(col("text"), "\\s+")
      val nChunks = ceil(size(toks) / 5.0).cast("int")
      val lined = concat_ws("\n",
        transform(sequence(lit(0), nChunks - 1), i =>
          array_join(slice(toks, i * 5 + 1, lit(5)), " ")))
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), lined.as("lined_text"))
      Dedup.dropBoilerplateLines(docs, "doc_id", "lined_text",
        maxOccurrences = 2, minChars = 1)
        .orderBy("doc_id")
    },

    // P5: mixture sampling to a token budget (Pile/DoReMi-style domain
    // weights): keep-rate = min(1, budget·frac / stratumTokens),
    // content-addressed at 1/65536 granularity
    // P9: temperature-scaled mixture (UniMax) — domain weights DERIVED
    // from corpus sizes (frac ∝ tokens^(1/T)), no hand-tuned fractions;
    // the planner rides p5's machinery, the filter is the same
    // content-addressed scan-pruning map pass
    "p9_temperature_mixture" -> { (s, dir) =>
      Sampling.temperatureMixture(table(s, dir, "documents"),
        col("doc_id"), col("source"), col("n_chars"),
        temperature = 2.0, tokenBudget = 20000L)
        .select(col("doc_id"), col("source"),
          (floor(col("keep_rate") * 1000000L + 0.5) / 1000000L).as("keep_rate"))
        .orderBy("doc_id")
    },

    "p5_mixture_sample" -> { (s, dir) =>
      Sampling.mixtureSample(table(s, dir, "documents"),
        col("doc_id"), col("source"), col("n_chars"),
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.15, "src3" -> 0.05),
        tokenBudget = 20000L)
        .select(col("doc_id"), col("source"),
          (floor(col("keep_rate") * 1000000L + 0.5) / 1000000L).as("keep_rate"))
        .orderBy("doc_id")
    },

    // P7: weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    // exponential clock, u content-addressed from 8 md5 nibbles) —
    // probability ∝ document length. One scan + TakeOrdered top-k; the
    // same draw reproduces in any md5-capable engine
    "p7_weighted_sample" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      Sampling.weightedSample(docs, col("doc_id"),
        col("n_chars").cast("double") + 1.0, k = 100)
        .withColumn("sample_score",
          floor(col("sample_score") * 1000000L + 0.5) / 1000000L)
        .orderBy("doc_id")
    },

    // P8: the per-stratum form — k docs per language, probability ∝
    // length inside each stratum (balanced domain mixing); one ranking
    // window per stratum
    "p8_weighted_stratum" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      Sampling.weightedSamplePerStratum(docs, col("doc_id"), col("lang"),
        col("n_chars").cast("double") + 1.0, k = 20)
        .withColumn("sample_score",
          floor(col("sample_score") * 1000000L + 0.5) / 1000000L)
        .orderBy("doc_id")
    },

    // SE1: gap sessionization of the event stream — per-user sessions
    // split on >30 min silence, one window pass (lag → start flags →
    // running sum), then per-session stats with one more shuffle
    "se1_sessionize" -> { (s, dir) =>
      import graft.operators.Sessionize
      val ev = table(s, dir, "events")
      val base = ev.select(col("user_id"), tsSeconds(ev).as("ts"),
        col("event_id"), col("value"))
      Sessionize.sessionStats(base, Seq("user_id"), "ts", gapS = 1800L,
        tieBreak = Seq("event_id"),
        extraAggs = Seq(
          (floor(sum(col("value")) * 10000L + 0.5) / 10000L)
            .as("total_value")))
        .orderBy("user_id", "session_seq")
    },

    // FU1: ordered conversion funnel view→click→purchase inside a
    // 1-day window anchored at funnel entry — ONE shuffle, the
    // sequential-min recurrence folded per user over its time-sorted
    // events (no per-stage join cascade; see Funnel.funnel)
    "fu1_funnel" -> { (s, dir) =>
      import graft.operators.Funnel
      val ev = table(s, dir, "events")
      Funnel.funnel(
        ev.select(col("user_id"), tsSeconds(ev).as("ts"),
          col("event_type")),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowS = 86400L)
        .orderBy("user_id")
    },

    // CO1: weekly cohort retention triangle — first-touch epoch week
    // per user, distinct-active (cohort, offset) cells, integer
    // parts-per-million rates (division rounds identically everywhere)
    "co1_cohort_retention" -> { (s, dir) =>
      import graft.operators.Funnel
      val ev = table(s, dir, "events")
      Funnel.cohortRetention(
        ev.select(col("user_id"), tsSeconds(ev).as("ts")),
        "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    },

    // PG1: host-graph PageRank (damping 0.85, 5 rounds, rank mass in
    // integer parts-per-1e9) over the content-addressed synthetic
    // link graph — the crawl-centrality quality prior RefinedWeb-style
    // curation joins in next to content scores; integer scaling makes
    // every per-round sum order-independent, so the iterative result
    // is bit-exact across engines
    "pg1_pagerank" -> { (s, dir) =>
      import graft.operators.LinkGraph
      val docs = table(s, dir, "documents")
      val edges = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 64)
      LinkGraph.pagerank(s, edges, n = 64L, iters = 5)
        .select(col("node").as("host_id"), col("rank_scaled"))
        .orderBy("host_id")
    },

    // PG2: centrality gate — host PageRank joined back to documents as
    // a keep signal (keep = the doc's source host carries more than the
    // uniform share of rank mass); the rank table is node-count-sized,
    // so the join back to the corpus is a broadcast
    "pg2_centrality_gate" -> { (s, dir) =>
      import graft.operators.LinkGraph
      val docs = table(s, dir, "documents")
      val edges = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 64)
      val ranks = LinkGraph.pagerank(s, edges, n = 64L, iters = 5)
        .withColumnRenamed("node", "host_id")
      docs.select(col("doc_id"),
          LinkGraph.sourceHost(col("doc_id"), 64).as("host_id"))
        .join(broadcast(ranks), "host_id")
        .withColumn("keep",
          when(col("rank_scaled") > lit(1000000000L / 64L), 1)
            .otherwise(0).cast("int"))
        .select("doc_id", "host_id", "rank_scaled", "keep")
        .orderBy("doc_id")
    },

    // PG3: per-host triangle participation — the local-clustering
    // signal (spam farms are triangle-dense); canonical a<b<c two-join
    // enumeration, each triangle counted once per corner
    "pg3_triangles" -> { (s, dir) =>
      import graft.operators.LinkGraph
      val docs = table(s, dir, "documents")
      val edges = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 64)
      LinkGraph.triangleCounts(edges)
        .select(col("node").as("host_id"), col("n_triangles"))
        .orderBy("host_id")
    },

    // PG4: bounded BFS hop distance from host 0 over the undirected
    // graph — 4 relaxation sweeps, each one join + one integer min
    // (bit-exact); unreached hosts are absent
    "pg4_bfs_hops" -> { (s, dir) =>
      import graft.operators.LinkGraph
      val docs = table(s, dir, "documents")
      val edges = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 64)
      LinkGraph.bfsHops(s, edges, Seq(0L), rounds = 4)
        .select(col("node").as("host_id"), col("hops"))
        .orderBy("host_id")
    },

    // PG5: personalized PageRank from host 0 — teleport and dangling
    // mass return to the seed, so rank measures PROXIMITY to it
    // (related-host discovery / topic-focused crawl scoring); same
    // integer-scaled bit-exact recurrence as pg1
    "pg5_personalized_ppr" -> { (s, dir) =>
      import graft.operators.LinkGraph
      val docs = table(s, dir, "documents")
      val edges = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 64)
      LinkGraph.personalizedPagerank(s, edges, n = 64L, seeds = Seq(0L),
          iters = 5)
        .select(col("node").as("host_id"), col("rank_scaled"))
        .orderBy("host_id")
    },

    // PG6: HITS hubs/authorities — Kleinberg's pair to PageRank with
    // integer L1 renormalization each half-round (exact SQL `div`:
    // the quotient's fraction can sit below double precision), 3
    // mutual-reinforcement rounds
    "pg6_hits" -> { (s, dir) =>
      import graft.operators.LinkGraph
      val docs = table(s, dir, "documents")
      val edges = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 64)
      LinkGraph.hits(s, edges, n = 64L, iters = 3)
        .select(col("node").as("host_id"), col("hub_scaled"),
          col("auth_scaled"))
        .orderBy("host_id")
    },

    // PG7: host-graph connected components — mirror-domain clusters
    // (the same min-label convergence loop the duplicate-cluster
    // pipeline uses, on the link graph instead of near-dup pairs);
    // nodes without edges are absent, like d6
    "pg7_components" -> { (s, dir) =>
      import graft.operators.{Dedup, LinkGraph}
      val docs = table(s, dir, "documents")
      val edges = LinkGraph.syntheticHostEdges(docs, "doc_id", hosts = 64)
        .select(col("src").as("id_a"), col("dst").as("id_b"))
      Dedup.connectedComponents(edges)
        .select(col("id").as("host_id"), col("cluster"))
        .orderBy("host_id")
    },

    // R5: positional phrase search — exact consecutive-token match via
    // the anchor trick (every posting votes for occurrence-start
    // pos - offset; an anchor with votes from ALL phrase offsets is a
    // hit). Probe phrases are 3-token mid-doc slices of every 89th
    // document, so each query's own doc must appear
    "r5_phrase_query" -> { (s, dir) =>
      import graft.operators.Retrieval
      val docs = table(s, dir, "documents")
      val qsrc = docs.filter(col("doc_id") % 89 === 0)
        .select(col("doc_id").as("query_id"),
          split(lower(col("text")), "\\s+").as("__ph0"))
        .filter(size(col("__ph0")) >= 13)
        .select(col("query_id"),
          concat_ws(" ", slice(col("__ph0"), 11, 3)).as("qtext"))
      Retrieval.phraseSearch(docs, "doc_id", "text",
          qsrc, "query_id", "qtext")
        .orderBy("query_id", "doc_id")
    },

    // R6: r5's phrase search against a PERSISTED positional index
    // (build once, probe many — the r1/r2 relationship): the probe
    // reads only the phrase terms' term-bucket partitions, so the
    // corpus never re-scans per query batch. Same query set and same
    // oracle as r5 — the index path must reproduce live matching
    // exactly
    "r6_phrase_index" -> { (s, dir) =>
      import graft.operators.Retrieval
      // fixed per-dataset path, overwritten each run (the zo1 pattern):
      // the positional index is corpus-scale, so repeated runs (bench
      // reps, soak legs) must reuse one directory, never leak a copy
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_r6idx_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val docs = table(s, dir, "documents")
      Retrieval.buildPhraseIndex(docs, "doc_id", "text", idx)
      val qsrc = docs.filter(col("doc_id") % 89 === 0)
        .select(col("doc_id").as("query_id"),
          split(lower(col("text")), "\\s+").as("__ph0"))
        .filter(size(col("__ph0")) >= 13)
        .select(col("query_id"),
          concat_ws(" ", slice(col("__ph0"), 11, 3)).as("qtext"))
      Retrieval.phraseIndexSearch(qsrc, "query_id", "qtext", idx)
        .orderBy("query_id", "doc_id")
    },

    // P1: greedy sequence packing into 256-token context windows,
    // sharded by doc_id % 8 (deterministic, oracle = recursive CTE)
    "p1_sequence_packing" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val withTok = docs.select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tokens"))
      Packing.packGreedy(withTok, "doc_id", "n_tokens",
        capacity = 256, numShards = 8)
        .orderBy("doc_id")
    },

    // P2: stratified sampling / language mixing — per-language keep rates
    // in sixteenths of the md5 keyspace, content-addressed on doc_id
    "p2_stratified_sample" -> { (s, dir) =>
      Sampling.stratifiedSample(table(s, dir, "documents"),
        col("doc_id"), col("lang"),
        Map("en" -> 8, "de" -> 4, "fr" -> 12, "zh" -> 2),
        defaultSixteenths = 16)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // G1: graphite rate functions (derivative / nonNegativeDerivative /
    // perSecond) over a dense hourly series — the render transforms
    // graphite-web applies per-point in Python run here as one
    // window-function plan (functions.py semantics; see SeriesFunctions)
    "g1_rate_functions" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val d = SeriesFunctions.derivative(base)
        .select(col("name"), col("ts"), round(col("value"), 4).as("deriv"))
      val nn = SeriesFunctions.nonNegativeDerivative(base)
        .select(col("name"), col("ts"), round(col("value"), 4).as("nn_deriv"))
      val ps = SeriesFunctions.perSecond(base)
        .select(col("name"), col("ts"), round(col("value") * 1e6, 4).as("per_sec_u"))
      d.join(nn, Seq("name", "ts")).join(ps, Seq("name", "ts"))
        .orderBy("name", "ts")
    },

    // G15: z-score anomaly flags per series — per-name mean/σ is a
    // series-count-sized broadcast; the flag derives from the ROUNDED
    // z so the |z|>2 boundary decision is deterministic cross-engine
    "g15_anomaly_flags" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val stats = base.filter(col("value").isNotNull)
        .groupBy("name")
        .agg(avg("value").as("__mu"), stddev_pop(col("value")).as("__sd"))
      base.join(broadcast(stats), Seq("name"))
        .filter(col("value").isNotNull && col("__sd") > 0)
        .withColumn("z",
          round((col("value") - col("__mu")) / col("__sd"), 4))
        .withColumn("is_anomaly", (abs(col("z")) > 2.0).cast("int"))
        .select(col("name"), col("ts"), col("value"), col("z"),
          col("is_anomaly"))
        .orderBy("name", "ts")
    },

    // G2: graphite window functions — trailing movingAverage(4),
    // running integral (None slots stay None but don't reset the
    // accumulator), keepLastValue forward-fill. All three share the
    // per-series window spec, so they run as window columns over ONE
    // base scan (a single Window node) — not three scans glued by joins.
    "g2_window_functions" -> { (s, dir) =>
      hourlySeries(s, dir).select(
        col("name"), col("ts"),
        round(SeriesFunctions.movingAverageCol(points = 4), 4).as("mavg"),
        round(SeriesFunctions.integralCol, 4).as("integ"),
        round(SeriesFunctions.keepLastValueCol, 4).as("filled"))
        .orderBy("name", "ts")
    },

    // G3: summarize(2h, sum) re-bucketing, then cross-series combines
    // (sumSeries / averageSeries / countSeries) per slot, aliased like
    // graphite's sumSeries(ev.click.*) target
    "g3_summarize_combine" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
        .filter(col("name").startsWith("ev.click."))
      val summ = SeriesFunctions.summarize(base, intervalS = 7200, fn = "sum")
      val sums = SeriesFunctions.combineSeries(summ, "sum", "sum_click")
        .select(col("ts"), round(col("value"), 4).as("sum_v"))
      val avgs = SeriesFunctions.combineSeries(summ, "avg", "avg_click")
        .select(col("ts"), round(col("value"), 4).as("avg_v"))
      val counts = SeriesFunctions.combineSeries(summ, "count", "n_click")
        .select(col("ts"), col("value").cast("long").as("n_series"))
      sums.join(avgs, Seq("ts")).join(counts, Seq("ts")).orderBy("ts")
    },

    // G4: highestMax(3) series selection + aliasByNode(1, 2) relabel —
    // two-pass top-n (tiny per-series aggregate + broadcast semi-join),
    // never a global sort of the points
    "g4_highest_series" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      SeriesFunctions.aliasByNode(
        SeriesFunctions.highest(base, n = 3, by = "max"), Seq(1, 2))
        .select(col("name"), col("ts"), round(col("value"), 4).as("value"))
        .orderBy("name", "ts")
    },

    // MM1: multimodal binary-column plumbing (payload as opaque blob +
    // typed metadata extraction; see operators.Multimodal for the
    // partition-batched decode path)
    "mm1_multimodal_meta" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lower(hex(substring(col("payload"), 1, 4))).as("magic"),
          (ascii(substring(col("payload").cast("string"), 1, 1)) % 3)
            .cast("long").as("kind_tag"),
          (floor(octet_length(col("payload")) / 256) + 1).cast("long").as("n_frames"))
        .orderBy("doc_id")
    },

    // D9: duplicate-passage detection — the token spans of each document
    // that occur more than once anywhere in the corpus (substring-level
    // dedup at 5-gram granularity, the Spark analog of suffix-array
    // dedup); overlapping duplicated windows merge into maximal spans
    "d9_duplicate_spans" -> { (s, dir) =>
      Dedup.duplicateSpans(table(s, dir, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id", "span_start")
    },

    // D13: exact-substring REMOVAL — rewrite each doc with d9's
    // corpus-duplicated spans cut out (Lee et al. 2021's second half)
    "d13_span_removal" -> { (s, dir) =>
      Dedup.removeDuplicateSpans(table(s, dir, "documents"),
        "doc_id", "text", k = 5)
        .orderBy("doc_id")
    },

    // D15: cross-corpus dedup — today's batch (src0) LSH-checked against
    // the reference corpus (everything else), exact-Jaccard verified;
    // the batch side drives every join, the reference never self-joins
    "d15_cross_corpus_dedup" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      Dedup.crossCorpusNearDups(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"),
        "doc_id", "text", numHashes = 8, bands = 8, threshold = 0.5)
        .orderBy("new_id", "ref_id")
    },

    // D14: SSL-prototype pruning (Sorscher et al. 2022) — drop the 30%
    // most prototypical (closest-to-centroid) examples per k-means cell,
    // keep the hard ones; shares d8's trained cells and its one-window-
    // per-cell scale shape
    "d14_prototypes" -> { (s, dir) =>
      import graft.operators.Clustering
      val emb = table(s, dir, "embeddings")
      val cents = Clustering.kmeansFit(emb, "vec_id", "embedding",
        k = 8, iters = 2)
      Clustering.prototypesPrune(emb, "vec_id", "embedding", cents,
          pruneFrac = 0.3)
        .withColumn("proto_rank", col("proto_rank").cast("long"))
        .orderBy("vec_id")
    },

    // R1: BM25 top-k retrieval — probe queries are trimmed mid-doc
    // slices of every 97th document (each query's own doc should
    // surface); the corpus is scored against the BROADCAST query set,
    // so every shuffle is hits-sized (inverted-index shape)
    "r1_bm25_topk" -> { (s, dir) =>
      import graft.operators.Retrieval
      val docs = table(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          trim(substring(col("text"), 40, 60)).as("qtext"))
      Retrieval.bm25TopK(docs, "doc_id", "text",
          queries, "query_id", "qtext", k = 10)
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("query_id", "rk")
    },

    // R2: the same retrieval against a PERSISTED inverted index —
    // term-bucket-partitioned postings built once, probed reading only
    // the query terms' partitions (k6's train-once/probe-many pattern
    // applied to text). Same oracle as r1: the index path must
    // reproduce live scoring exactly
    "r2_bm25_index_topk" -> { (s, dir) =>
      import graft.operators.Retrieval
      // fixed per-dataset path, overwritten each run (the zo1 pattern):
      // the index is corpus-scale, so repeated runs (bench reps, soak
      // legs) must reuse one directory rather than leak a copy per run
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_r2idx_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val docs = table(s, dir, "documents")
      Retrieval.buildTextIndex(docs, "doc_id", "text", idx)
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          trim(substring(col("text"), 40, 60)).as("qtext"))
      Retrieval.bm25IndexTopK(queries, "query_id", "qtext", idx, k = 10)
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("query_id", "rk")
    },

    // D18: containment near-dup scoring (Broder) — the asymmetric
    // doc-in-doc measure over the SAME LSH candidate pairs as d4:
    // containment ≥ 0.8 on either side catches a small doc swallowed
    // by a big one where symmetric Jaccard stays low
    "d18_containment" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text",
        numHashes = 8, n = 3)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8,
        bands = 8, maxBucketSize = 5000)
      Dedup.containmentFromText(pairs, docs, "doc_id", "text", n = 3)
        .filter(col("containment_a") >= 0.8 || col("containment_b") >= 0.8)
        .orderBy("id_a", "id_b")
    },

    // D17: quality-aware cluster collapse — keep each duplicate
    // cluster's BEST-quality member (RefinedWeb-style), not an arbitrary
    // one: d6's connected components + t2's quality score + one window
    // per cluster. Singletons represent themselves, so this is a total
    // keep/drop decision over the corpus
    "d17_cluster_representatives" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text",
        numHashes = 8, n = 3)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8,
        bands = 8, maxBucketSize = 5000)
      val dup = Dedup.jaccardFromText(pairs, docs, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
      val comps = Dedup.connectedComponents(dup)
      val q = TextAnalysis.qualityScore(docs, "text")
        .select(col("doc_id"), col("quality_score"))
      Dedup.clusterRepresentatives(docs, "doc_id", q, "quality_score",
          comps)
        .orderBy("doc_id")
    },

    // V1: hashed TF-IDF document vectors (feature hashing, HashingTF
    // shape) — text → fixed-dim vector with NO vocabulary collection;
    // the dense face feeds the k-means/ANN/SemDeDup ladder in place of
    // the embeddings table. Oracle compares the sparse explosion of the
    // dense vector (slot hash = the cross-engine md5-nibble idiom)
    "v1_tfidf_vectors" -> { (s, dir) =>
      import graft.operators.Vectorize
      val docs = table(s, dir, "documents")
      Vectorize.tfidfVectors(docs, "doc_id", "text", dim = 64)
        .select(col("doc_id"), posexplode(col("vec")).as(Seq("slot", "weight")))
        .filter(col("weight") =!= 0.0)
        .select(col("doc_id"), col("slot").cast("long").as("slot"),
          col("weight"))
        .orderBy("doc_id", "slot")
    },

    // R3: TF-IDF cosine top-k — the VECTOR twin of r1's BM25 over the
    // same probe queries: query vectors broadcast, corpus side joined
    // only on active slots, ranking windowed by query. Lexical (r1) and
    // vector (r3) retrieval from one corpus scan family
    "r3_tfidf_knn" -> { (s, dir) =>
      import graft.operators.Vectorize
      val docs = table(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          trim(substring(col("text"), 40, 60)).as("qtext"))
      Vectorize.tfidfKnn(docs, "doc_id", "text",
          queries, "query_id", "qtext", dim = 64, k = 10)
        .orderBy("query_id", "rk")
    },

    // R4: hybrid retrieval — RRF fusion of the lexical (r1 BM25) and
    // vector (r3 TF-IDF cosine) top-10 lists over the same probe
    // queries: the rank-based combiner every hybrid search engine
    // defaults to. Contributions are fixed-point (10⁹ div (60+rk)) so
    // the fused score is exact in any addition order
    "r4_hybrid_rrf" -> { (s, dir) =>
      import graft.operators.Retrieval
      val docs = table(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          trim(substring(col("text"), 40, 60)).as("qtext"))
      // one shared corpus pass feeds both retrieval faces (row-identical
      // to rrfFuse(bm25TopK, tfidfKnn) — RetrievalSpec pins it)
      Retrieval.hybridRrfTopK(docs, "doc_id", "text",
          queries, "query_id", "qtext", dim = 64, k = 10)
        .orderBy("query_id", "rk")
    },

    // CL1: trained text classifier — multinomial Naive Bayes (the
    // in-engine analog of the fastText-style corpus-gating classifiers:
    // CCNet LM filter, DCLM quality model). Train = one groupBy pass on
    // the 4/5 holdout; model = broadcast (vocab × classes) grid; score =
    // map-side join over the 1/5 test split. Integer-scaled log-space
    // sums make the scores bit-exact across engines
    "cl1_nb_classify" -> { (s, dir) =>
      import graft.operators.Classify
      val docs = table(s, dir, "documents")
      val model = Classify.nbFit(docs.filter(col("doc_id") % 5 =!= 0),
        "lang", "text", vocabSize = 24, alpha = 1.0)
      Classify.nbPredict(model, docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text")
        .orderBy("doc_id")
    },

    // CL2: classification margin (top-1 minus top-2 score) — the
    // uncertainty-sampling signal: route low-margin docs to labeling /
    // human review, trust high-margin ones. Integer-scaled scores make
    // the subtraction exact across engines
    "cl2_nb_margin" -> { (s, dir) =>
      import graft.operators.Classify
      val docs = table(s, dir, "documents")
      val model = Classify.nbFit(docs.filter(col("doc_id") % 5 =!= 0),
        "lang", "text", vocabSize = 24, alpha = 1.0)
      Classify.nbMargin(model, docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text")
        .orderBy("doc_id")
    },

    // X3: text → semantic curation with NO external embedder — the
    // closed loop the v1 vectorizer exists for: hashed TF-IDF vectors →
    // trained k-means cells → SSL-prototype pruning (d14's op over text-
    // derived vectors). Unlike x1/x2 (bench-only composites), the whole
    // chain is DuckDB-oracle-able end-to-end
    // X1: the nightly text-curation chain as ONE oracled plan — URL
    // dedup (d11) → Gopher quality gate (t8's rules minus the stopword
    // floor, which the synthetic corpus can never pass — the same
    // reason the chain omits C4's terminal-punctuation rule) →
    // minhash/LSH/jaccard near-dup pairs at 0.8 (d2/d4) → duplicate
    // clusters (d6) → leakage-safe split (d7). Bench times this same
    // queries entry.
    "x1_curation_pipeline" -> { (s, dir) =>
      import graft.operators.{Dedup, TextAnalysis, Urls}
      val docs = table(s, dir, "documents")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/d/"), col("doc_id") % 200)
      val urlKept = Urls.dedupByUrl(docs.withColumn("url", url))
        .filter(col("kept") === 1).drop("url", "canon_url", "kept")
      val quality = TextAnalysis.gopherRules(urlKept, "doc_id", "text",
          minWords = 20)
        .filter(col("rule_words") && col("rule_mean_len") &&
          col("rule_symbols") && col("rule_alpha"))
        .select("doc_id")
      val kept = urlKept.join(quality, "doc_id").select("doc_id", "text")
      val sigs = Dedup.minhashSignatureFromText(kept, "doc_id", "text")
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id")
      val dups = Dedup.jaccardFromText(pairs, kept, "doc_id", "text")
        .filter(col("jaccard") >= 0.8)
      val comps = Dedup.connectedComponents(dups)
      Dedup.leakageSafeSplit(kept, "doc_id", comps)
        .orderBy("doc_id")
    },

    // X2: the embedding-side curation chain as ONE oracled plan —
    // k-means cells (km1) → SemDeDup pair drop at 0.7 (d8) →
    // SSL-prototype pruning of the survivors (d14) → leakage-safe
    // split keyed on the semantic dup clusters (d6/d7 on vectors).
    "x2_embedding_pipeline" -> { (s, dir) =>
      x2Chain(s, dir, k = 8, iters = 2)
    },

    // X2_SQRTN: the SAME chain at d8b's k≈√N operating point — the
    // pair stage's corpus-scale configuration (Σcell² ≈ N^1.5 instead
    // of fixed-k's N²/k; the measured 100× trade is 44 s vs 678 s,
    // docs/SCALE.md). k derives from the corpus size at plan time
    // (driver-side count of a metadata-scale aggregate, the d8b
    // convention); the oracle derives its k from the same count
    // (sqrtNkSql), so a gate-dataset size change moves both sides
    "x2_sqrtn" -> { (s, dir) =>
      val n = table(s, dir, "embeddings").count()
      x2Chain(s, dir, k = math.max(1, math.sqrt(n.toDouble).toInt),
        iters = 1)
    },

    // X5: the prepare-pretraining-data chain as ONE oracled plan — NB
    // classifier routing on margin (cl2) → temperature-scaled mixture
    // (p9, budget 500k) → strided chunking → chunk-hash dedup → greedy
    // packing (x4's chain) — with the BPE merge count (bp1) trained on
    // the same mixed text riding along as a constant column.
    "x5_pretrain_prep_pipeline" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.operators.{Bpe, Classify, Packing, Sampling}
      val docs = table(s, dir, "documents")
      val model = Classify.nbFit(docs.filter(col("doc_id") % 5 =!= 0),
        "lang", "text", vocabSize = 24)
      // keep docs whose predicted language the router trusts. The id
      // set is CHECKPOINTED: the mixture's eager stratum totals, the
      // chunk chain, and the BPE word counts all sit downstream, and
      // without the cut each re-executes the whole NB scoring pass —
      // the pipeline's dominant stage ran ~4x (this round's
      // attribution of the r10 note "NB scoring dominates"). One
      // doc_id column, the cheapest thing to pin
      val routed = Classify.nbMargin(model, docs, "doc_id", "text")
        .filter(col("margin") > 0).select("doc_id")
        .localCheckpoint(true)
      val kept = docs.join(routed, "doc_id")
      // budget-bounded (500k tokens) → checkpoint is small at ANY
      // corpus scale; feeds chunking AND the BPE trainer
      val mixed = Sampling.temperatureMixture(kept, col("doc_id"),
        col("source"), col("n_chars"), temperature = 2.0,
        tokenBudget = 500000L)
        .localCheckpoint(true)
      val chunks = Packing.chunkWindows(mixed, "doc_id", "text",
        window = 128, stride = 64)
      val w = Window.partitionBy("chunk_hash")
        .orderBy(col("doc_id"), col("chunk_idx"))
      val uniq = chunks.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select((col("doc_id") * 1048576L + col("chunk_idx")).as("chunk_id"),
          col("n_tokens"))
      val packed = Packing.packGreedy(uniq, "chunk_id", "n_tokens",
        capacity = 256, numShards = 8)
      val (merges, _) = Bpe.trainMerges(Bpe.wordFreqs(mixed, "text"),
        rounds = 8)
      packed.crossJoin(merges.agg(count(lit(1)).as("n_merges")))
        .orderBy("chunk_id")
    },

    "x3_text_semantic_pipeline" -> { (s, dir) =>
      import graft.operators.{Clustering, Vectorize}
      val docs = table(s, dir, "documents")
      val vecs = Vectorize.tfidfVectors(docs, "doc_id", "text", dim = 64)
        .localCheckpoint(true) // feeds seed filter, assigns, prune
      val cents = Clustering.kmeansFit(vecs, "doc_id", "vec",
        k = 8, iters = 3)
      Clustering.prototypesPrune(vecs, "doc_id", "vec", cents,
          pruneFrac = 0.3)
        .withColumn("proto_rank", col("proto_rank").cast("long"))
        .orderBy("doc_id")
    },

    // LR1: logistic regression trained IN-ENGINE by full-batch GD over
    // hashed TF-IDF features — the learned corpus-gating classifier
    // (kmeans' iterative shape: broadcast model, two aggregations per
    // round, every margin/gradient sum integer-scaled at the row level
    // so trajectories replay bit-identically under any partitioning).
    // Train on the 4/5 split (y = lang=='en'); the 1/5 holdout is
    // scored through the FROZEN deployment path (freeze + native
    // HashedTfidfMargin projection — no explode/join/groupBy in the
    // scoring stage; bit-equal to predict(), LogRegSpec pins it)
    "lr1_logreg_gate" -> { (s, dir) =>
      import graft.operators.LogReg
      val docs = table(s, dir, "documents")
      val labels = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      // text-native training straight to the frozen deployment model:
      // per round two projections + one dim-bounded shuffle, no joins
      // (bit-equal to the relational fit over tfidfSparse — LogRegSpec
      // pins the trajectory), and the corpus idf computed FOR training
      // is the frozen model's idf — one corpus pass total, not the
      // fitText-then-rebuild-idf two
      val model = LogReg.fitTextFrozen(docs, "doc_id", "text", labels,
        dim = 16, eta = 0.5, rounds = 4)
      LogReg.scoreFrozen(model, docs.filter(col("doc_id") % 5 === 0), "text")
        .select("doc_id", "score", "predicted")
        .orderBy("doc_id")
    },

    // EV1-EV3: in-engine evaluation of the lr1 gate on its holdout —
    // the measurement half of a deployed classifier. ev1: AUC-ROC via
    // the Mann-Whitney rank statistic over the distinct-score
    // histogram (average ranks for ties; every term an exact multiple
    // of 0.5, so the sum is order-free cross-engine). ev2:
    // 10-bucket reliability diagram (integer-scaled bucket means, the
    // LogReg idiom). ev3: threshold-0.5 confusion + derived rates.
    // Oracle = the lr1 training CTEs + the same statistics in SQL.
    "ev1_auc_roc" -> { (s, dir) =>
      import graft.operators.ModelEval
      ModelEval.aucRoc(lr1Scored(s, dir), "score", "y")
    },
    "ev2_calibration" -> { (s, dir) =>
      import graft.operators.ModelEval
      ModelEval.calibrationBuckets(lr1Scored(s, dir), "score", "y",
        buckets = 10)
    },
    "ev3_confusion" -> { (s, dir) =>
      import graft.operators.ModelEval
      ModelEval.confusionAt(lr1Scored(s, dir), "score", "y",
        threshold = 0.5)
    },
    // EV5: per-slice gate quality — AUC by corpus source, the fully
    // distributed (partitioned-window) face of the rank statistic;
    // single-class slices report NULL auc
    "ev5_auc_by_source" -> { (s, dir) =>
      import graft.operators.ModelEval
      ModelEval.aucRocBy(lr1Scored(s, dir), "score", "y", "source")
    },
    // EV4: the full operating curve — one confusion row per distinct
    // score as threshold, strictest to laxest (the PR curve's exact
    // points; cumulative integer counts over the distinct-score
    // histogram, never a per-threshold corpus pass)
    "ev4_pr_curve" -> { (s, dir) =>
      import graft.operators.ModelEval
      ModelEval.operatingPoints(lr1Scored(s, dir), "score", "y")
    },

    // DS1: DSIR importance weights (Xie et al. 2023) — hashed unigram+
    // bigram distributions of target (lang='en') vs raw (everything),
    // per-bucket log-likelihood ratio, per-doc importance score. λ is
    // integer-scaled so the per-doc sum is exact in any addition order
    "ds1_dsir_weights" -> { (s, dir) =>
      import graft.operators.Dsir
      val docs = table(s, dir, "documents")
      Dsir.importanceWeights(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"), dim = 256)
        .orderBy("doc_id")
    },

    // DS2: DSIR selection — 150 docs without replacement, probability ∝
    // exp(importance): the actual "make the raw corpus look like the
    // target" resampling step, via the content-addressed E-S clock
    "ds2_dsir_resample" -> { (s, dir) =>
      import graft.operators.Dsir
      val docs = table(s, dir, "documents")
      Dsir.resample(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"), dim = 256, k = 150)
        .withColumn("sample_score",
          floor(col("sample_score") * 1000000L + 0.5) / 1000000L)
        .orderBy("doc_id")
    },

    // PR2: corpus version diff — what changed between dataset snapshots
    // (crawl N vs N+1), the dataset-versioning twin of a11's
    // clustersdiff: per source, docs added / removed / changed /
    // unchanged by content hash. v2 is constructed deterministically
    // from v1 (drops, edits, additions) so the oracle sees both sides
    "pr2_corpus_diff" -> { (s, dir) =>
      import graft.operators.Profile
      val a = table(s, dir, "documents")
      val b = a.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(a.filter(col("doc_id") % 17 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L))
      Profile.corpusDiff(a, b, "doc_id", "text", "source")
        .orderBy("grp", "status")
    },

    // X4: training-sequence endgame as ONE oracled chain — strided
    // chunking (p6) → chunk-level exact dedup keeping the first
    // occurrence → greedy sequence packing (p1) of the survivors: the
    // documents-to-context-windows step that actually feeds a trainer
    "x4_chunk_dedup_pack" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val chunks = Packing.chunkWindows(table(s, dir, "documents"),
        "doc_id", "text", window = 128, stride = 64)
      val w = Window.partitionBy("chunk_hash")
        .orderBy(col("doc_id"), col("chunk_idx"))
      val uniq = chunks.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        // 2^20 chunk slots per doc (67M tokens at stride 64) — far above
        // any real document, and collision-free up to doc_id ~8.8e12
        .select((col("doc_id") * 1048576L + col("chunk_idx")).as("chunk_id"),
          col("n_tokens"))
      Packing.packGreedy(uniq, "chunk_id", "n_tokens",
          capacity = 256, numShards = 8)
        .orderBy("chunk_id")
    },

    // BP1: BPE tokenizer TRAINING as a Spark plan (Sennrich et al.
    // 2016) — subword vocabulary induction over the word-frequency
    // table: one corpus scan for counts, then every merge round runs at
    // vocabulary scale (distinct words), not corpus scale. The learned
    // merge list is the output
    "bp1_bpe_merges" -> { (s, dir) =>
      import graft.operators.Bpe
      val words = Bpe.wordFreqs(table(s, dir, "documents"), "text")
      val (merges, _) = Bpe.trainMerges(words, rounds = 8)
      merges.orderBy("round")
    },

    // BP2: the trained tokenizer DEPLOYED — the frozen merge list
    // applied to every distinct word as ONE chained map-only projection
    // (how a tokenizer runs in production: merges are metadata, no
    // per-round actions)
    "bp2_bpe_segment" -> { (s, dir) =>
      import graft.operators.Bpe
      val words = Bpe.wordFreqs(table(s, dir, "documents"), "text")
      val (merges, _) = Bpe.trainMerges(words, rounds = 8)
      val ms = merges.orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.segment(words.select("word"), "word", ms)
        .select("word", "segmented").orderBy("word")
    },

    // BP3: unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece
    // unigram model) — the top-down sibling of bp1: seed an
    // over-complete piece inventory from substring counts, then 2 EM
    // rounds of greedy-segment → re-count → prune, all at
    // distinct-word scale with integer-scaled log-probs (the DuckDB
    // mirror unrolls the same rounds, the greedy walk as a recursive
    // CTE). Output = the final inventory with counts + log-probs
    "bp3_unigram_train" -> { (s, dir) =>
      import graft.operators.{Bpe, Unigram}
      val words = Bpe.wordFreqs(table(s, dir, "documents"), "text")
      Unigram.train(words, rounds = 2, keepMulti = 256)
        .select(col("piece"), col("cnt").as("piece_count"),
          col("logp").as("logp_scaled"))
        .orderBy(col("piece_count").desc, col("piece"))
    },

    // BP3b: the trained unigram inventory DEPLOYED — frozen piece
    // table broadcast into one map-only greedy segmentation over the
    // distinct words (bp2's relationship to bp1)
    "bp3b_unigram_segment" -> { (s, dir) =>
      import graft.operators.{Bpe, Unigram}
      val words = Bpe.wordFreqs(table(s, dir, "documents"), "text")
      val vocab = Unigram.train(words, rounds = 2, keepMulti = 256)
      Unigram.segment(words, "word", vocab)
        .select("word", "segmented").orderBy("word")
    },

    // T7: unigram-LM quality score (CCNet-style) — train token
    // frequencies on sources ≠ src0, score EVERY doc by average negative
    // log-likelihood; src0-only vocabulary pays the smoothed OOV floor
    "t7_unigram_logloss" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val model = TextAnalysis.unigramModel(
        docs.filter(col("source") =!= "src0"), "text")
      TextAnalysis.unigramLogLoss(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    },

    // T11: interpolated bigram LM log-loss — the CCNet-style perplexity
    // bucket signal one step up from t7 (½ bigram MLE + ½ unigram with
    // OOV floor); model trained on every non-src0 source
    "t11_bigram_logloss" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      TextAnalysis.bigramLogLoss(docs, "doc_id", "text",
          docs.filter(col("source") =!= "src0"))
        .orderBy("doc_id")
    },

    // T15: interpolated Kneser-Ney bigram log-loss — absolute discount,
    // context-escape mass, continuation lower-order model (the
    // "francisco problem" fix); same reference split as t11 so the two
    // smoothers are directly comparable per doc
    "t15_kneser_ney" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      TextAnalysis.kneserNeyLogLoss(docs, "doc_id", "text",
          docs.filter(col("source") =!= "src0"))
        .orderBy("doc_id")
    },

    // T13: CCNet perplexity buckets (Wenzek et al. 2020) — the corpus in
    // head/middle/tail thirds by bigram-LM log-loss. The thirds are an
    // EXACT global ntile(3) built from a range shuffle
    // (Ranking.withGlobalNtile), never a single-partition window
    "t13_perplexity_buckets" -> { (s, dir) =>
      import graft.operators.Ranking
      val docs = table(s, dir, "documents")
      val nll = TextAnalysis.bigramLogLoss(docs, "doc_id", "text",
        docs.filter(col("source") =!= "src0"))
      Ranking.withGlobalNtile(nll, 3, "bucket_id",
          col("avg_nll").asc, col("doc_id").asc)
        .withColumn("ppl_bucket",
          when(col("bucket_id") === 1, "head")
            .when(col("bucket_id") === 2, "middle")
            .otherwise("tail"))
        .select(col("doc_id"), col("avg_nll"), col("bucket_id"),
          col("ppl_bucket"))
        .orderBy("doc_id")
    },

    // X6: the data-selection endgame as ONE oracled chain — DSIR
    // importance resampling toward the English target (ds2) → quality
    // scoring (t2) → curriculum order (cu1) over exactly the selected
    // docs: pick the right data, then feed it to the trainer in the
    // right order
    "x6_dsir_curriculum" -> { (s, dir) =>
      import graft.operators.Dsir
      val docs = table(s, dir, "documents")
      val sel = Dsir.resample(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), dim = 256, k = 150)
        .select("doc_id")
      val kept = docs.join(sel, "doc_id")
      val q = TextAnalysis.qualityScore(kept, "text")
        .select(col("doc_id"), col("quality_score"))
      Sampling.curriculumOrder(q, col("doc_id"), col("quality_score"),
          bands = 3, seed = "ep0")
        .select(col("doc_id"), col("quality_score"), col("band"),
          col("position"))
        .orderBy("doc_id")
    },

    // CU1: curriculum training order — quality tiers (band 1 = best
    // t2-score third), deterministic within-band shuffle, global
    // 1-based training position; both ranks from range shuffles
    "cu1_curriculum_order" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val q = TextAnalysis.qualityScore(docs, "text")
        .select(col("doc_id"), col("quality_score"))
      Sampling.curriculumOrder(q, col("doc_id"), col("quality_score"),
          bands = 3, seed = "ep0")
        .select(col("doc_id"), col("quality_score"), col("band"),
          col("position"))
        .orderBy("doc_id")
    },

    // PH1: word2phrase collocation mining (Mikolov et al. 2013) —
    // bigrams co-occurring far above chance, scored
    // (cab−δ)·N/(ca·cb), the phrase pass that fuses "new york"-class
    // units before tokenizer training
    "ph1_phrase_mining" -> { (s, dir) =>
      import graft.operators.Phrases
      Phrases.phraseScores(table(s, dir, "documents"), "doc_id", "text",
          delta = 3.0, minCount = 3L, threshold = 1.0)
        .orderBy("w1", "w2")
    },

    // PH2: the mined phrases DEPLOYED — top-10 by score fused into
    // single tokens over every document as one chained map-only
    // projection (the Bpe.segment deployment idiom)
    "ph2_phrase_merge" -> { (s, dir) =>
      import graft.operators.Phrases
      val docs = table(s, dir, "documents")
      val top = Phrases.topPhrases(docs, "doc_id", "text", k = 10,
        delta = 3.0, minCount = 3L, threshold = 1.0)
      Phrases.mergePhrases(docs, "text", top, "phrased")
        .select(col("doc_id"), col("phrased"))
        .orderBy("doc_id")
    },

    // T14: CCNet buckets PER LANGUAGE (the paper's actual shape —
    // Wenzek et al. bucket each language's corpus separately): grouped
    // exact ntile(3) by bigram-LM log-loss inside each lang. The grouped
    // rank is range-partitioned (Ranking.withGroupedNtile), never a
    // one-task-per-language window — the scale case is 5 languages each
    // owning a fifth of a 100 TB corpus
    "t14_ccnet_lang_buckets" -> { (s, dir) =>
      import graft.operators.Ranking
      val docs = table(s, dir, "documents")
      val nll = TextAnalysis.bigramLogLoss(docs, "doc_id", "text",
          docs.filter(col("source") =!= "src0"))
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      Ranking.withGroupedNtile(nll, 3, "bucket_id", Seq("lang"),
          col("avg_nll").asc, col("doc_id").asc)
        .withColumn("ppl_bucket",
          when(col("bucket_id") === 1, "head")
            .when(col("bucket_id") === 2, "middle")
            .otherwise("tail"))
        .select(col("doc_id"), col("lang"), col("avg_nll"),
          col("bucket_id"), col("ppl_bucket"))
        .orderBy("doc_id")
    },

    // T12: NFC normalization (native graft_nfc expression vs DuckDB's
    // nfc_normalize) — the ASCII corpus gets a synthetic composed /
    // decomposed 'café' suffix by doc parity, so the oracle proves the
    // two forms converge to one hash and the decomposed length shrinks
    "t12_nfc_normalize" -> { (s, dir) =>
      import graft.functions.NfcNormalize
      val raw = concat(substring(col("text"), 1, 64),
        when(col("doc_id") % 2 === 0, lit(" cafe\u0301"))
          .otherwise(lit(" caf\u00e9")))
      table(s, dir, "documents").select(col("doc_id"),
          length(raw).cast("long").as("len_raw"),
          length(NfcNormalize.nfc(raw)).cast("long").as("len_nfc"),
          md5(NfcNormalize.nfc(raw)).as("h"))
        .orderBy("doc_id")
    },

    // DC1: benchmark decontamination — per training doc, how many of its
    // distinct 3-grams appear in the eval set (source = src0). The eval
    // vocabulary is collapsed to ONE sorted-array row and broadcast; each
    // corpus doc computes its overlap in a single native merge pass
    // (ShingleSet → SortedIntersectCount), zero corpus shuffles
    "dc1_decontaminate" -> { (s, dir) =>
      import graft.operators.Decontamination
      val docs = table(s, dir, "documents")
      val evalSet = Decontamination.evalNgramSet(
        docs.filter(col("source") === "src0"), "text", n = 3)
      Decontamination.contamination(
        docs.filter(col("source") =!= "src0"), "doc_id", "text", evalSet, n = 3)
        .orderBy("doc_id")
    },

    // DC2: the join-path decontamination for eval vocabularies too large
    // for one array row — multi-row n-gram table + semi-join, same
    // column contract as dc1 (here over a 2-source eval set)
    "dc2_decontaminate_joined" -> { (s, dir) =>
      import graft.operators.Decontamination
      val docs = table(s, dir, "documents")
      val evalTable = Decontamination.evalNgramTable(
        docs.filter(col("source").isin("src0", "src1")), "text", n = 3)
      Decontamination.contaminationJoined(
        docs.filter(!col("source").isin("src0", "src1")), "doc_id", "text",
        evalTable, n = 3)
        .orderBy("doc_id")
    },

    // DC3: bloom-prefilter decontamination — the 100 TB shape of dc2:
    // a native BloomFilterAggregate sketch of the eval vocabulary kills
    // definite non-matches map-side, and only the bloom-positive n-grams
    // reach the exact-verify semi-join (false positives die there, so
    // the report is exact). Contaminated docs only, by contract.
    "dc3_decontaminate_bloom" -> { (s, dir) =>
      import graft.operators.Decontamination
      val docs = table(s, dir, "documents")
      val evalTable = Decontamination.evalNgramTable(
        docs.filter(col("source").isin("src0", "src1")), "text", n = 3)
      Decontamination.contaminationBloom(
        docs.filter(!col("source").isin("src0", "src1")), "doc_id", "text",
        evalTable, n = 3)
        .orderBy("doc_id")
    },

    // P3: per-domain cap (RefinedWeb-style) — keep ≤ 10 docs per source,
    // chosen content-addressed (md5 rank) so reruns keep the same docs
    "p3_domain_cap" -> { (s, dir) =>
      Sampling.capPerStratum(table(s, dir, "documents"),
        col("doc_id"), col("source"), cap = 10)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    },

    // P4: deterministic corpus shuffle + dataloader sharding —
    // reproducible global order (range sort on md5(seed‖id)) and a
    // content-addressed shard in [0, 8)
    "p4_shuffle_shard" -> { (s, dir) =>
      Sampling.shuffleShard(table(s, dir, "documents"),
        col("doc_id"), seed = "epoch0", nShards = 8)
        .select(col("doc_id"), col("shuffle_key"), col("shard"))
        .orderBy("doc_id")
    },

    // G5: groupByNode(1, 'sum') — graphite's fleet rollup: collapse all
    // series sharing name component 1 (the event type) slot-by-slot
    "g5_group_by_node" -> { (s, dir) =>
      SeriesFunctions.groupByNode(hourlySeries(s, dir), node = 1, fn = "sum")
        .select(col("name"), col("ts"), round(col("value"), 4).as("value"))
        .orderBy("name", "ts")
    },

    // G6: series filtering + pointwise transforms — averageAbove(0.5)
    // selection, then asPercent-of-slot-total, logarithm (None for ≤ 0),
    // and clamp into [0, 5] over the surviving series
    "g6_percent_pointwise" -> { (s, dir) =>
      val base = SeriesFunctions.averageAbove(hourlySeries(s, dir), 0.5)
      val pct = SeriesFunctions.asPercent(base)
        .select(col("name"), col("ts"), round(col("value"), 4).as("pct"))
      val lg = SeriesFunctions.logarithm(base)
        .select(col("name"), col("ts"), round(col("value"), 4).as("log_v"))
      val cl = SeriesFunctions.clamp(base, Some(0.0), Some(5.0))
        .select(col("name"), col("ts"), round(col("value"), 4).as("clamped"))
      pct.join(lg, Seq("name", "ts")).join(cl, Seq("name", "ts"))
        .orderBy("name", "ts")
    },

    // G7: round-4 render breadth — exclude (regex filter), currentAbove
    // (last-value filter), movingMedian, moving stdev, integralByInterval
    // (resetting running sum), sortSeries (materialized legend order)
    "g7_render_breadth" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val kept = SeriesFunctions.currentAbove(
        SeriesFunctions.exclude(base, "\\.0$"), 0.5)
      // median of an even window of 4-decimal inputs lands exactly on a
      // 5th-decimal midpoint, where HALF_UP (Spark) and HALF_EVEN
      // rounding diverge — round at 5 decimals (identity on those
      // values) so the oracle compare is rounding-mode-independent
      val med = SeriesFunctions.movingMedian(kept, 4)
        .select(col("name"), col("ts"), round(col("value"), 5).as("med4"))
      // degenerate windows (2 present points, or 2+2 equal pairs) give
      // sd = |a−b|/2 — exactly 5 decimals for 4-decimal inputs, i.e. a
      // rounding midpoint at 4 dp; round at 5 (identity there) like med4
      val sd = SeriesFunctions.stdev(kept, 4)
        .select(col("name"), col("ts"), round(col("value"), 5).as("sd4"))
      val ib = SeriesFunctions.integralByInterval(kept, 6 * 3600)
        .select(col("name"), col("ts"), round(col("value"), 4).as("integ"))
      val ord = SeriesFunctions.sortSeries(kept, by = "maxima")
        .select(col("name"), col("ts"), col("series_order"))
      med.join(sd, Seq("name", "ts")).join(ib, Seq("name", "ts"))
        .join(ord, Seq("name", "ts"))
        .orderBy("name", "ts")
    },

    // G8: grep + cross-series average + alias — the "one fleet line with
    // a readable legend" chain every dashboard uses
    "g8_grep_alias" -> { (s, dir) =>
      val clicks = SeriesFunctions.grep(hourlySeries(s, dir), "^ev\\.click\\.")
      SeriesFunctions.aliasSeries(
        SeriesFunctions.combineSeries(clicks, "sum", "tmp"), "fleet.click.sum")
        .select(col("name"), col("ts"), round(col("value"), 4).as("value"))
        .orderBy("ts")
    },

    // G9: second render wave — transformNull, changed, delay,
    // graphite's non-interpolating nPercentile, and hitcount re-bucketed
    // to 6 h, all on one hourly frame
    "g9_render_breadth2" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val filled = SeriesFunctions.transformNull(base, 0.0)
      val fv = filled.select(col("name"), col("ts"),
        round(col("value"), 4).as("fv"))
      val chg = SeriesFunctions.changed(filled).select(
        col("name"), col("ts"), col("value").as("chg"))
      val dlv = SeriesFunctions.delay(filled, 2).select(
        col("name"), col("ts"), round(col("value"), 4).as("dlv"))
      val p75 = SeriesFunctions.nPercentile(base, 75).select(
        col("name"), col("ts"), round(col("value"), 4).as("p75"))
      val hc = SeriesFunctions.hitcount(base, 6 * 3600).select(
        col("name"), col("ts").as("__hts"), round(col("value"), 4).as("hc6"))
      fv.join(chg, Seq("name", "ts")).join(dlv, Seq("name", "ts"))
        .join(p75, Seq("name", "ts"))
        .withColumn("__hts", (floor(col("ts") / (6 * 3600)) * (6 * 3600)).cast("long"))
        .join(hc, Seq("name", "__hts"), "left").drop("__hts")
        .orderBy("name", "ts")
    },

    // G10: fourth render wave — scaleToSeconds (step-derived rescale),
    // isNonNull, interpolate (linear gap fill), exponentialMovingAverage
    // (sequential per-series recurrence vs the oracle's closed form),
    // smartSummarize (query-start-aligned buckets), and
    // sumSeriesWithWildcards collapsed onto the first two components
    "g10_render_breadth3" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val from = T0 - 1800 // off-grid start so smart buckets differ from summarize's
      val sps = SeriesFunctions.scaleToSeconds(base, 60).select(
        col("name"), col("ts"),
        (floor(col("value") * 10000 + 0.5) / 10000).as("sps"))
      val nn = SeriesFunctions.isNonNull(base).select(
        col("name"), col("ts"), col("value").as("nn"))
      // interpolated halves land exactly on 5-decimal midpoints where
      // Spark's decimal-string HALF_UP and DuckDB's binary round diverge;
      // floor(x·1e4+0.5)/1e4 is the same double op on both engines
      val itp = SeriesFunctions.interpolate(base).select(
        col("name"), col("ts"),
        (floor(col("value") * 10000 + 0.5) / 10000).as("itp"))
      val ema = SeriesFunctions.exponentialMovingAverage(
        SeriesFunctions.transformNull(base, 0.0), 6).select(
        col("name"), col("ts"), round(col("value"), 4).as("ema6"))
      val ss = SeriesFunctions.smartSummarize(base, 7200, "sum", from).select(
        col("name"), col("ts").as("__bts"), round(col("value"), 4).as("ss2h"))
      val ws = SeriesFunctions.seriesWithWildcards(base, "sum", Seq(2)).select(
        col("name").as("__wname"), col("ts"), round(col("value"), 4).as("wsum"))
      sps.join(nn, Seq("name", "ts")).join(itp, Seq("name", "ts"))
        .join(ema, Seq("name", "ts"))
        .withColumn("__bts",
          (floor((col("ts") - from) / 7200) * 7200 + from).cast("long"))
        .join(ss, Seq("name", "__bts"), "left").drop("__bts")
        .withColumn("__wname",
          concat_ws(".", slice(split(col("name"), "\\."), 1, 2)))
        .join(ws, Seq("__wname", "ts"), "left").drop("__wname")
        .orderBy("name", "ts")
    },

    // G11: series-selection stats — mostDeviant (top-7 by population
    // variance) and averageOutsidePercentile (means outside the [30, 70]
    // band) as membership flags over the per-series aggregate frame
    "g11_series_filters" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val md = SeriesFunctions.mostDeviant(base, 7)
        .select("name").distinct().withColumn("md7", lit(1))
      val aop = SeriesFunctions.averageOutsidePercentile(base, 70)
        .select("name").distinct().withColumn("aop70", lit(1))
      // no variance/mean VALUE columns: both sit on exact decimal
      // midpoints for this fixture while the two engines' aggregates
      // differ at ulp level — an unfixable rounding straddle. The flags
      // (plus the exact point count) are the operator outputs anyway.
      base.groupBy("name").agg(count(col("value")).as("cnt"))
        .join(md, Seq("name"), "left").join(aop, Seq("name"), "left")
        .withColumn("md7", coalesce(col("md7"), lit(0)))
        .withColumn("aop70", coalesce(col("aop70"), lit(0)))
        .orderBy("name")
    },

    // G12: cross-series combines — weightedAverage pairing click values
    // with view weights by the instance node, multiplySeries over the
    // click family (sorted fold), percentileOfSeries at 60 across all
    // series per slot
    "g12_weighted_combine" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val clicks = SeriesFunctions.grep(base, "^ev\\.click\\.")
      val views = SeriesFunctions.grep(base, "^ev\\.view\\.")
      // ONE weighted-average series across all instance pairs
      // (graphite semantics: Σ(v·w)/Σ(w) per slot)
      val wa = SeriesFunctions.weightedAverage(clicks, views, Seq(2)).select(
        col("ts"), round(col("value"), 4).as("wa"))
      val mul = SeriesFunctions.multiplySeries(clicks, "mul").select(
        col("ts"), round(col("value"), 6).as("mul"))
      val pos = SeriesFunctions.percentileOfSeries(base, 60, "pos").select(
        col("ts"), round(col("value"), 4).as("pos60"))
      wa.join(mul, Seq("ts"), "left").join(pos, Seq("ts"), "left")
        .select("ts", "wa", "mul", "pos60")
        .orderBy("ts")
    },

    // G13: render breadth wave 5 — stacked (draw-stacking as data),
    // minMax normalization, asPercent against an EXPLICIT total series,
    // aggregateWithWildcards(range) collapsing the instance node. All
    // four are window/grouped passes over one hourly base; division
    // outputs use the floor(x·1e4+0.5)/1e4 midpoint-proof rounding
    "g13_render_breadth4" -> { (s, dir) =>
      val base = hourlySeries(s, dir)
      val stk = SeriesFunctions.stacked(base).select(
        col("name"), col("ts"), round(col("value"), 4).as("stk"))
      val mm = SeriesFunctions.minMax(base).select(
        col("name"), col("ts"),
        (floor(col("value") * 10000 + 0.5) / 10000).as("mm"))
      val ap = SeriesFunctions.asPercentOf(base,
          base.filter(col("name") === "ev.click.0")).select(
        col("name"), col("ts"),
        (floor(col("value") * 10000 + 0.5) / 10000).as("ap"))
      val wr = SeriesFunctions.seriesWithWildcards(base, "range", Seq(2))
        .select(col("name").as("__wname"), col("ts"),
          round(col("value"), 4).as("wrange"))
      stk.join(mm, Seq("name", "ts")).join(ap, Seq("name", "ts"))
        .withColumn("__wname",
          concat_ws(".", slice(split(col("name"), "\\."), 1, 2)))
        .join(wr, Seq("__wname", "ts"), "left").drop("__wname")
        .orderBy("name", "ts")
    },

    // G14: render breadth wave 6 — movingWindow (general trailing
    // window), removeBetweenPercentile / removeEmptySeries membership
    // flags, reduceSeries (per-instance click/view ratio keyed by the
    // name minus the reduce node), diffSeriesLists (rank-paired
    // pointwise diff), and aggregate's xFilesFactor. Division output
    // uses the floor(x·1e4+0.5)/1e4 midpoint-proof rounding; sums and
    // diffs of 4-decimal inputs are 4-decimal exact
    "g14_render_breadth5" -> { (s, dir) =>
      // eight branches + the pairwise rank probes all re-derive the
      // hourly base; checkpoint the 2,400-row frame once (the same
      // reused-relation pattern as SemDeDup's cell assignment)
      val base = hourlySeries(s, dir).localCheckpoint(true)
      val clicks = SeriesFunctions.grep(base, "^ev\\.click\\.")
      val views = SeriesFunctions.grep(base, "^ev\\.view\\.")
      val mw = SeriesFunctions.movingWindow(base, 4, "sum").select(
        col("name"), col("ts"), round(col("value"), 4).as("mw4"))
      val rb = SeriesFunctions.removeBetweenPercentile(base, 80)
        .select("name").distinct().withColumn("rb80", lit(1))
      val re = SeriesFunctions.removeEmptySeries(base, 0.3)
        .select("name").distinct().withColumn("re30", lit(1))
      val rs = SeriesFunctions.reduceSeries(base, "divideSeries", 1,
          Seq("click", "view"))
        .select(col("name").as("__key"), col("ts"),
          (floor(col("value") * 10000 + 0.5) / 10000).as("rsv"))
      val ds = SeriesFunctions.pairwiseSeriesLists(clicks, views, "diff")
        .select(regexp_extract(col("name"), "^diffSeries\\(([^,]+),", 1)
          .as("name"), col("ts"), round(col("value"), 4).as("dsv"))
      val xc = SeriesFunctions.combineSeriesXff(clicks, "sum", "x", 0.2)
        .select(col("ts"), round(col("value"), 4).as("xcv"))
      base.select(col("name"), col("ts"))
        .join(mw, Seq("name", "ts"))
        .join(rb, Seq("name"), "left").join(re, Seq("name"), "left")
        .withColumn("rb80", coalesce(col("rb80"), lit(0)))
        .withColumn("re30", coalesce(col("re30"), lit(0)))
        .withColumn("__key", concat_ws(".",
          split(col("name"), "\\.").getItem(0),
          split(col("name"), "\\.").getItem(2)))
        .join(rs, Seq("__key", "ts"), "left").drop("__key")
        .join(ds, Seq("name", "ts"), "left")
        .join(xc, Seq("ts"), "left")
        .orderBy("name", "ts")
    },

    // D11: URL canonicalization + per-URL dedup — the crawl pipeline's
    // first dedup stage. The corpus has no URL column, so the fixture
    // synthesizes deterministic URLs exercising every rule (scheme/host
    // case, www, default port, tracking + unordered params, fragment,
    // trailing slash); ~40 path slots per source give each canonical
    // key a handful of duplicates to resolve
    "d11_url_dedup" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://WWW."))
          .otherwise(lit("http://")),
        col("source"), lit(".Example.COM"),
        when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
        // %11: authority-only URL — the query attaches straight to the
        // host with no '/' (the shape that used to fold the query into
        // the host); otherwise the usual /Docs/<slot> path
        when(col("doc_id") % 11 === 0, lit(""))
          .otherwise(concat(lit("/Docs/"), col("doc_id") % 40,
            when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")))),
        when(col("doc_id") % 5 === 0, lit("?utm_source=feed&b=2&a=1"))
          .otherwise(lit("?a=1&b=2")),
        when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))
      Urls.dedupByUrl(docs.withColumn("url", url))
        .select(col("doc_id"), col("canon_url"), col("kept"))
        .orderBy("doc_id")
    },

    // P6: fixed-token-window chunking with stride (128-token windows
    // stepping by 64 — overlapping pretraining context windows), one
    // row per chunk with an md5 chunk key for chunk-level exact dedup
    "p6_chunk_windows" -> { (s, dir) =>
      Packing.chunkWindows(table(s, dir, "documents"),
          "doc_id", "text", window = 128, stride = 64)
        .orderBy("doc_id", "chunk_idx")
    },

    // T10: character/token Shannon entropy — the cheap gibberish /
    // compressibility signal before an LM perplexity pass, as ONE
    // native codegen'd pass per document (no exploded doc×char
    // relation); the oracle rebuilds both histograms relationally
    "t10_entropy" -> { (s, dir) =>
      import graft.functions.TextEntropy
      table(s, dir, "documents").select(col("doc_id"),
          round(TextEntropy.char_entropy(substring(col("text"), 1, 2048)), 4)
            .as("char_h"),
          round(TextEntropy.token_entropy(substring(col("text"), 1, 2048)), 4)
            .as("token_h"))
        .orderBy("doc_id")
    })

  // ---- oracle SQL -----------------------------------------------------

  /** Shared DuckDB CTEs for the dedup oracles: word 3-shingles and the
    * 8-hash minhash signature with 8 single-row bands. */
  private val ShinglesCte =
    """base AS (
      |  SELECT doc_id,
      |         string_split_regex(lower(substr(text, 1, 4096)), '\s+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
      |  FROM base, LATERAL unnest(range(1, greatest(len(toks) - 2, 1) + 1)) t(i))""".stripMargin

  /** Shared DuckDB CTEs for the bigram-LM oracles (t11, t13): reference
    * bigram/context/unigram counts over the non-src0 sources and the
    * per-(doc, pair) interpolated negative log-likelihood `nll`. */
  private val BigramNllCtes =
    """reft AS (
      |  SELECT string_split_regex(lower(text), '\s+') AS t
      |  FROM documents WHERE source <> 'src0'),
      |refpairs AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2
      |  FROM reft, LATERAL unnest(range(1, len(t))) u(i)),
      |bi AS (SELECT w1, w2, count(*) AS cb FROM refpairs GROUP BY 1, 2),
      |ctx AS (SELECT w1, sum(cb) AS c1 FROM bi GROUP BY 1),
      |uni AS (
      |  SELECT tok, count(*) AS c FROM (
      |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      |    FROM documents WHERE source <> 'src0') GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM uni),
      |dp AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      |        FROM documents) d,
      |  LATERAL unnest(range(1, len(t))) u(i)),
      |nll AS (
      |  SELECT dp.doc_id,
      |    -ln(0.5 * coalesce(bi.cb / ctx.c1, 0)
      |      + 0.5 * coalesce(uni.c / (tot.total + 1),
      |          1.0 / (tot.total + 1))) AS v
      |  FROM dp CROSS JOIN tot
      |  LEFT JOIN bi ON bi.w1 = dp.w1 AND bi.w2 = dp.w2
      |  LEFT JOIN ctx ON ctx.w1 = dp.w1
      |  LEFT JOIN uni ON uni.tok = dp.w2)""".stripMargin

  /** BM25 oracle — shared verbatim by r1 (live scoring) and r2 (the
    * persisted-index path, which must reproduce it exactly). */
  /** BM25 oracle chain ending in the ranked `rk` CTE — shared by r1/r2
    * and composable with [[TfidfKnnCtes]] (names are disjoint) for the
    * r4 hybrid fusion. */
  private val Bm25Ctes =
    """dt AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      |  FROM documents),
      |tk AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM dt),
      |q AS (
      |  SELECT doc_id AS query_id,
      |         trim(substr(text, 40, 60)) AS qtext
      |  FROM documents WHERE doc_id % 97 = 0),
      |qt AS (
      |  SELECT query_id,
      |    unnest(list_distinct(string_split_regex(lower(qtext), '\s+')))
      |      AS term
      |  FROM q),
      |stats AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM dt),
      |dfq AS (
      |  SELECT term, count(DISTINCT tk.doc_id) AS dfr
      |  FROM tk JOIN (SELECT DISTINCT term FROM qt) USING (term)
      |  GROUP BY 1),
      |idf AS (
      |  SELECT term, ln(1 + (s.n - dfr + 0.5) / (dfr + 0.5)) AS idf
      |  FROM dfq CROSS JOIN stats s),
      |hits AS (
      |  SELECT qt.query_id, tk.doc_id, tk.dl, tk.term, count(*) AS tf
      |  FROM tk JOIN qt USING (term) GROUP BY 1, 2, 3, 4),
      |ts AS (
      |  SELECT h.query_id, h.doc_id,
      |    round(i.idf * h.tf * (1.2 + 1)
      |      / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avgdl)), 6)
      |      AS tscore
      |  FROM hits h JOIN idf i USING (term) CROSS JOIN stats s),
      |sc AS (
      |  SELECT query_id, doc_id, round(sum(tscore), 4) AS score
      |  FROM ts GROUP BY 1, 2),
      |rk AS (
      |  SELECT query_id, doc_id, score,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id) AS BIGINT) AS rk
      |  FROM sc)""".stripMargin

  private val Bm25OracleSql =
    s"""WITH $Bm25Ctes
      |SELECT query_id, doc_id, score, rk FROM rk
      |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** `termSlot` (Vectorize) in DuckDB terms: first 4 md5 nibbles of
    * `expr` parsed base-16 via strpos, mod `dim`. */
  private def slotSql(expr: String, dim: Int): String =
    s"""(  (strpos('0123456789abcdef', substr(md5($expr), 1, 1)) - 1) * 4096
       | + (strpos('0123456789abcdef', substr(md5($expr), 2, 1)) - 1) * 256
       | + (strpos('0123456789abcdef', substr(md5($expr), 3, 1)) - 1) * 16
       | + (strpos('0123456789abcdef', substr(md5($expr), 4, 1)) - 1)
       |) % $dim""".stripMargin

  /** [[graft.operators.Sampling.digestInt]] with 8 nibbles in DuckDB
    * terms: first 8 md5 nibbles of `expr` parsed base-16, mod `m`. */
  private def digest8ModSql(expr: String, m: Int): String =
    s"""((  (strpos('0123456789abcdef', substr(md5($expr), 1, 1)) - 1) * 268435456
       |  + (strpos('0123456789abcdef', substr(md5($expr), 2, 1)) - 1) * 16777216
       |  + (strpos('0123456789abcdef', substr(md5($expr), 3, 1)) - 1) * 1048576
       |  + (strpos('0123456789abcdef', substr(md5($expr), 4, 1)) - 1) * 65536
       |  + (strpos('0123456789abcdef', substr(md5($expr), 5, 1)) - 1) * 4096
       |  + (strpos('0123456789abcdef', substr(md5($expr), 6, 1)) - 1) * 256
       |  + (strpos('0123456789abcdef', substr(md5($expr), 7, 1)) - 1) * 16
       |  + (strpos('0123456789abcdef', substr(md5($expr), 8, 1)) - 1)
       |) % $m)""".stripMargin

  /** PageRank oracle (mirrors [[graft.operators.LinkGraph]]): the
    * synthetic host graph, out-degrees, and `iters` unrolled rounds of
    * the integer-scaled recurrence (per-edge contribution = rank
    * integer-div out-degree; dangling mass redistributed uniformly;
    * damping 85/100 in integer arithmetic). Ends in `r<iters>`. */
  /** The synthetic host graph in DuckDB terms (`pgn` nodes, `pge`
    * distinct directed edges) — mirrors
    * [[graft.operators.LinkGraph.syntheticHostEdges]]; shared by the
    * PageRank, triangle, and BFS oracles. */
  private def hostGraphCtes(hosts: Int): String = {
    val src = digest8ModSql("'pgs:' || CAST(doc_id AS VARCHAR)", hosts)
    val dst = digest8ModSql("'pgd:' || CAST(doc_id AS VARCHAR)", hosts)
    s"""pgn AS (SELECT CAST(range AS BIGINT) AS node FROM range($hosts)),
      |pge AS (SELECT DISTINCT src, dst FROM (
      |  SELECT $src AS src,
      |         $dst AS dst
      |  FROM documents) WHERE src <> dst)""".stripMargin
  }

  private def pagerankCtes(hosts: Int, iters: Int,
                           scale: Long = 1000000000L): String = {
    val base = (15L * (scale / hosts)) / 100L
    val head =
      s"""${hostGraphCtes(hosts)},
        |pgo AS (SELECT src, count(*) AS odeg FROM pge GROUP BY src),
        |r0 AS (SELECT node, CAST(${scale / hosts} AS BIGINT) AS rank
        |       FROM pgn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""dg$i AS (
        |  SELECT COALESCE(SUM(rank), 0) AS dm
        |  FROM r${i - 1} r LEFT JOIN pgo o ON r.node = o.src
        |  WHERE o.src IS NULL),
        |in$i AS (
        |  SELECT e.dst AS node, SUM(r.rank // o.odeg) AS inc
        |  FROM pge e
        |  JOIN r${i - 1} r ON e.src = r.node
        |  JOIN pgo o ON e.src = o.src
        |  GROUP BY e.dst),
        |r$i AS (
        |  SELECT n.node,
        |    CAST($base + (85 * (COALESCE(i.inc, 0) + d.dm // $hosts)) // 100
        |      AS BIGINT) AS rank
        |  FROM pgn n
        |  LEFT JOIN in$i i ON n.node = i.node
        |  CROSS JOIN dg$i d)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** DSIR oracle chain (mirrors [[graft.operators.Dsir]]): hashed
    * unigram+bigram feature counts per doc (`ddc`), raw and target
    * (lang='en') bucket distributions with add-one smoothing over the
    * full [0, dim) space, and the integer-scaled λ table (`dlam`).
    * MATERIALIZED where two consumers read a CTE. */
  private def dsirCtes(dim: Int): String =
    s"""ddt AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |  FROM documents),
       |dfeat AS (
       |  SELECT doc_id, unnest(t) AS f FROM ddt
       |  UNION ALL
       |  SELECT d.doc_id, d.t[u.i] || ' ' || d.t[u.i + 1] AS f
       |  FROM ddt d, LATERAL unnest(range(1, len(d.t))) u(i)),
       |ddc AS MATERIALIZED (
       |  SELECT doc_id, ${slotSql("f", dim)} AS slot, count(*) AS cnt
       |  FROM dfeat GROUP BY 1, 2),
       |drawc AS (SELECT slot, sum(cnt) AS c FROM ddc GROUP BY 1),
       |dtgtc AS (
       |  SELECT slot, sum(cnt) AS c FROM ddc
       |  JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
       |drt AS (SELECT coalesce(sum(c), 0) AS t FROM drawc),
       |dtt AS (SELECT coalesce(sum(c), 0) AS t FROM dtgtc),
       |dslots AS (SELECT unnest(range(0, $dim)) AS slot),
       |dlam AS MATERIALIZED (
       |  SELECT s.slot,
       |    CAST(floor((ln((coalesce(tc.c, 0) + 1.0) / (dtt.t + $dim))
       |              - ln((coalesce(rc.c, 0) + 1.0) / (drt.t + $dim)))
       |      * 1000000 + 0.5) AS BIGINT) AS lam
       |  FROM dslots s
       |  LEFT JOIN dtgtc tc USING (slot)
       |  LEFT JOIN drawc rc USING (slot)
       |  CROSS JOIN drt CROSS JOIN dtt)""".stripMargin

  /** t2 quality-score oracle chain ending in `qscore` — shared by t2
    * and cu1's curriculum banding. */
  private lazy val QualityCtes =
    s"""t AS (
       |  SELECT doc_id, text,
       |    string_split_regex(lower(text), '\\s+') AS toks,
       |    len(regexp_replace(text, '\\s+', '', 'g')) AS alpha_len
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, len(toks) AS n_tokens, alpha_len,
       |    ${graft.operators.TextAnalysis.StopwordMarkers.values.flatten.toSeq.distinct
          .map(w => s"len(list_filter(toks, x -> x = '$w'))").mkString(" + ")} AS stop_cnt
       |  FROM t),
       |qscore AS (
       |  SELECT doc_id, n_tokens,
       |    floor(stop_cnt / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5) / 1000000 AS stopword_ratio,
       |    floor(alpha_len / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5) / 1000000 AS avg_word_len,
       |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
       |      (1.0 - stop_cnt / CAST(n_tokens AS DOUBLE)) * 0.3 +
       |      least(alpha_len / CAST(n_tokens AS DOUBLE) / 8.0, 1.0) * 0.3) * 1000000 + 0.5) / 1000000 AS quality_score
       |  FROM c)""".stripMargin

  /** Earliest-completion funnel chain over an `e(user_id, ts,
    * event_type)` CTE — sequential mins s1/s2/s3 (view→click→purchase,
    * 1-day window anchored at stage 1, the recurrence Funnel.funnel
    * folds per user). Shared by fu1 and x8 so the two oracles cannot
    * drift. */
  private val FunnelStageCtes =
    """s1 AS (
      |  SELECT user_id, min(ts) AS s1_ts
      |  FROM e WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS s2_ts
      |  FROM e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click'
      |    AND e.ts > s1.s1_ts AND e.ts <= s1.s1_ts + 86400
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS s3_ts
      |  FROM e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND e.ts > s2.s2_ts AND e.ts <= s1.s1_ts + 86400
      |  GROUP BY e.user_id)""".stripMargin

  /** The E-S-clock resample chain over [[DsirWeightsSelect]] — ends in
    * `dsel` (doc_id, logratio, score); shared by ds2 and x6. */
  private lazy val DsirResampleCtes =
    s"""dw AS ($DsirWeightsSelect),
      |dsel AS (
      |  SELECT doc_id, logratio,
      |    -ln((  (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
      |         + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
      |         + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
      |         + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
      |         + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
      |         + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
      |         + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
      |         + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1)
      |         + 1) / 4294967296.0)
      |      / exp(logratio) AS score
      |  FROM (SELECT doc_id, logratio,
      |          md5(CAST(doc_id AS VARCHAR)) AS h FROM dw)
      |  WHERE exp(logratio) > 0)""".stripMargin

  /** word2phrase oracle chain (mirrors [[graft.operators.Phrases]]):
    * token relation, unigram counts, total, bigram counts, and the
    * scored pairs `psc`. */
  private def phraseCtes(delta: Double): String =
    s"""ptk AS MATERIALIZED (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |  FROM documents),
       |puni AS MATERIALIZED (SELECT unnest(t) AS tok FROM ptk),
       |puc AS (SELECT tok, count(*) AS c FROM puni GROUP BY 1),
       |ptot AS (SELECT count(*) AS n FROM puni),
       |pbg AS (
       |  SELECT p.t[u.i] AS w1, p.t[u.i + 1] AS w2,
       |    count(*) AS pair_count
       |  FROM ptk p, LATERAL unnest(range(1, len(p.t))) u(i)
       |  GROUP BY 1, 2),
       |psc AS MATERIALIZED (
       |  SELECT g.w1, g.w2, g.pair_count,
       |    round((g.pair_count - $delta) * ptot.n
       |      / (a.c::DOUBLE * b.c), 6) AS score
       |  FROM pbg g
       |  JOIN puc a ON a.tok = g.w1
       |  JOIN puc b ON b.tok = g.w2
       |  CROSS JOIN ptot)""".stripMargin

  /** The ds1 output select over [[dsirCtes]] (also the `dw` seed of the
    * ds2 resample chain). */
  private val DsirWeightsSelect =
    """SELECT d.doc_id, coalesce(sc.logratio, 0.0) AS logratio
      |FROM documents d
      |LEFT JOIN (SELECT ddc.doc_id, sum(ddc.cnt * dlam.lam) / 1e6
      |             AS logratio
      |           FROM ddc JOIN dlam USING (slot) GROUP BY 1) sc
      |  USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** The ev1-ev3 scored relation: the lr1 gate trained through
    * [[graft.operators.LogReg.fitTextFrozen]] and its holdout
    * (doc_id % 5 = 0) scored with the true label alongside —
    * (doc_id, score, y). One training per query keeps each oracle
    * self-contained, the repo-wide convention. */
  private def lr1Scored(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.LogReg
    val docs = table(s, dir, "documents")
    val labels = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    // dim 256 / η 1.0 / 8 rounds — a gate trained hard enough that
    // the eval metrics have something to measure (lr1's pinned
    // dim-16/4-round config barely separates at sf0.01: every holdout
    // score lands in ONE calibration bucket); lr1 itself stays at its
    // pinned config. The measured verdict is itself the point: the
    // hashed-unigram gate is WEAK on the synthetic corpus (AUC ≈
    // 0.56, recall-1 precision-0.42 at 0.5) — the eval layer exists
    // to expose exactly that before a gate ships
    val model = LogReg.fitTextFrozen(docs, "doc_id", "text", labels,
      dim = 256, eta = 1.0, rounds = 8)
    LogReg.scoreFrozen(model, docs.filter(col("doc_id") % 5 === 0), "text")
      .select(col("doc_id"), col("source"), col("score"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
  }

  /** The DuckDB mirror of [[lr1Scored]] as a CTE (requires
    * `tfidfCtes(dim)` + `lrOracleCtes(rounds, dim)` in scope): the
    * holdout scored under the trained lw`rounds` weights, labeled. */
  private def lrScoredCte(rounds: Int): String =
    s"""sc AS MATERIALIZED (
      |  SELECT d.doc_id, d.source,
      |    round(1 / (1 + exp(-(coalesce(mg.m6, 0) / 1e6 + bs.b))), 6)
      |      AS score,
      |    CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      |  FROM (SELECT doc_id, lang, source
      |        FROM documents WHERE doc_id % 5 = 0) d
      |  LEFT JOIN (SELECT wv.doc_id,
      |               sum(CAST(floor(wv.weight * w.w * 1e6 + 0.5)
      |                 AS BIGINT)) AS m6
      |             FROM wv JOIN lw$rounds w USING (slot) GROUP BY 1) mg
      |    USING (doc_id)
      |  CROSS JOIN (SELECT w AS b FROM lw$rounds WHERE slot = -1) bs)""".stripMargin

  /** Unrolled full-batch GD rounds in DuckDB (mirrors
    * [[graft.operators.LogReg.fit]] at η=0.5 over the lr1 split):
    * labels, train features `tf2`, zero weights `lw0` (slot −1 =
    * bias), then per round the rounded probabilities `lp_i`, gradients
    * `lg_i`, and rounded weight update `lw_i` — margin and gradient
    * contributions are floor(·1e6+0.5)-scaled BIGINTs before each sum,
    * mirroring LogReg's order-independent integer sums. MATERIALIZED
    * for the same exponential-inlining reason as the BPE chain. */
  private def lrOracleCtes(rounds: Int, dim: Int = 16,
      eta: Double = 0.5): String = {
    val seed =
      s"""lab AS MATERIALIZED (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents WHERE doc_id % 5 <> 0),
        |nl AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lab),
        |tf2 AS MATERIALIZED (
        |  SELECT wv.doc_id, wv.slot, wv.weight
        |  FROM wv JOIN lab USING (doc_id)),
        |lw0 AS MATERIALIZED (
        |  SELECT unnest(range(-1, $dim)) AS slot, 0.0 AS w)""".stripMargin
    val perRound = (1 to rounds).map { i =>
      s"""lp$i AS MATERIALIZED (
         |  SELECT l.doc_id, l.y,
         |    round(1 / (1 + exp(-(coalesce(mg.m6, 0) / 1e6 + bs.b))), 6)
         |      AS p
         |  FROM lab l
         |  LEFT JOIN (SELECT t.doc_id,
         |               sum(CAST(floor(t.weight * w.w * 1e6 + 0.5)
         |                 AS BIGINT)) AS m6
         |             FROM tf2 t JOIN lw${i - 1} w USING (slot)
         |             GROUP BY 1) mg USING (doc_id)
         |  CROSS JOIN (SELECT w AS b FROM lw${i - 1} WHERE slot = -1) bs),
         |lg$i AS MATERIALIZED (
         |  SELECT t.slot,
         |    round(sum(CAST(floor(t.weight * (p.p - p.y) * 1e6 + 0.5)
         |      AS BIGINT)) / 1e6 / nl.n, 6) AS g
         |  FROM tf2 t JOIN lp$i p USING (doc_id) CROSS JOIN nl
         |  GROUP BY t.slot, nl.n
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT),
         |    round(sum(CAST(floor((p - y) * 1e6 + 0.5) AS BIGINT))
         |      / 1e6 / nl.n, 6)
         |  FROM lp$i CROSS JOIN nl GROUP BY nl.n),
         |lw$i AS MATERIALIZED (
         |  SELECT w.slot, round(w.w - $eta * coalesce(g.g, 0), 6) AS w
         |  FROM lw${i - 1} w LEFT JOIN lg$i g USING (slot))""".stripMargin
    }
    (Seq(seed) ++ perRound).mkString(",\n")
  }

  /** Unrolled BPE merge rounds in DuckDB (mirrors
    * [[graft.operators.Bpe.trainMerges]] at `rounds` merges): word
    * freqs `w`, seed reprs `r0`, then per round the weighted adjacent-
    * pair counts `p_i`, the deterministic best pair `t_i`
    * (cnt DESC, l, r), and the boundary-safe literal replace `r_i`.
    * CTEs are MATERIALIZED — each round references the previous one
    * multiple times, and inlining would expand the chain exponentially. */
  private def bpeOracleCtes(rounds: Int,
      source: String = "documents"): String = {
    val seed =
      raw"""w AS MATERIALIZED (
        |  SELECT tok AS word, count(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM $source)
        |  GROUP BY 1),
        |r0 AS MATERIALIZED (
        |  SELECT word, freq,
        |    ' ' || array_to_string(string_split(word, ''), ' ') || ' '
        |      AS repr
        |  FROM w)""".stripMargin
    val perRound = (1 to rounds).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT t.l, t.r, sum(t.freq) AS cnt FROM (
         |    SELECT s.freq, s.toks[u.i] AS l, s.toks[u.i + 1] AS r
         |    FROM (SELECT freq, string_split(trim(repr), ' ') AS toks
         |          FROM r${i - 1}) s,
         |    LATERAL unnest(range(1, len(s.toks))) u(i)) t
         |  GROUP BY 1, 2),
         |t$i AS MATERIALIZED (
         |  SELECT l, r, l || r AS m, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, l, r) AS rn
         |  FROM p$i),
         |r$i AS MATERIALIZED (
         |  SELECT w.word, w.freq,
         |    CASE WHEN b.l IS NULL THEN w.repr
         |         ELSE replace(w.repr, ' ' || b.l || ' ' || b.r || ' ',
         |           ' ' || b.m || ' ') END AS repr
         |  FROM r${i - 1} w
         |  LEFT JOIN (SELECT l, r, m FROM t$i WHERE rn = 1) b ON TRUE)""".stripMargin
    }
    (Seq(seed) ++ perRound).mkString(",\n")
  }

  /** Unrolled unigram-LM EM rounds in DuckDB (mirrors
    * [[graft.operators.Unigram.train]]): word freqs `w`, substring seed
    * counts `sub`, the fixed alphabet `chars`, then per inventory
    * generation the pruned+smoothed piece table `v_i` and per EM round
    * the greedy best-piece-per-position table `cand_i` and the
    * left-to-right walk `walk_i` as a RECURSIVE CTE (one row per
    * consumed piece; the per-char density argmax is the integer
    * `logp * 12/len` cross-multiplication, ties to the longer piece —
    * the exact Spark-side rule). The final SELECT must open with
    * `WITH RECURSIVE`. `segRounds` > `rounds` adds one extra
    * cand/walk generation under the FINAL inventory for the
    * deployment-twin oracle. */
  private def unigramOracleCtes(rounds: Int, keepMulti: Int,
      walkFinal: Boolean = false): String = {
    val seed =
      raw"""w AS MATERIALIZED (
        |  SELECT tok AS word, count(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM documents)
        |  GROUP BY 1),
        |sub AS MATERIALIZED (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |    SELECT w.freq, substr(w.word, CAST(u.i AS INT), CAST(v.l AS INT)) AS piece
        |    FROM w,
        |    LATERAL unnest(range(1, len(w.word) + 1)) u(i),
        |    LATERAL unnest([1, 2, 3, 4]) v(l)
        |    WHERE u.i + v.l - 1 <= len(w.word))
        |  GROUP BY 1),
        |chars AS MATERIALIZED (SELECT piece FROM sub WHERE len(piece) = 1)""".stripMargin
    // inventory generation i from count source `src` (sub for i=0,
    // walk counts after): singles ∪ top-keepMulti multis, then the
    // Laplace-smoothed integer log-prob
    def inventory(i: Int, src: String): String =
      s"""v${i}keep AS MATERIALIZED (
         |  SELECT c.piece, coalesce(n.cnt, 0) AS cnt
         |  FROM chars c LEFT JOIN $src n USING (piece)
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
         |    FROM $src WHERE len(piece) >= 2) WHERE rn <= $keepMulti),
         |v$i AS MATERIALIZED (
         |  SELECT piece, CAST(len(piece) AS INT) AS l, CAST(cnt AS BIGINT) AS cnt,
         |    CAST(floor(ln((cnt + 1.0) / (t.total + t.nv)) * 1000000 + 0.5)
         |      AS BIGINT) AS logp
         |  FROM v${i}keep CROSS JOIN
         |    (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS nv
         |     FROM v${i}keep) t)""".stripMargin
    // greedy walk generation i under inventory v_{i-1}
    def walk(i: Int): String =
      s"""cand$i AS MATERIALIZED (
         |  SELECT word, pos, l FROM (
         |    SELECT s.word, s.pos, v.l,
         |      row_number() OVER (PARTITION BY s.word, s.pos
         |        ORDER BY v.logp * (CASE v.l WHEN 1 THEN 12 WHEN 2 THEN 6
         |          WHEN 3 THEN 4 ELSE 3 END) DESC, v.l DESC) AS rn
         |    FROM (SELECT w.word, CAST(u.i AS INT) AS pos
         |          FROM w, LATERAL unnest(range(1, len(w.word) + 1)) u(i)) s
         |    JOIN v${i - 1} v ON v.piece = substr(s.word, s.pos, v.l))
         |  WHERE rn = 1),
         |walk$i AS (
         |  SELECT word, freq, 1 AS pos, CAST(NULL AS VARCHAR) AS piece FROM w
         |  UNION ALL
         |  SELECT k.word, k.freq, k.pos + b.l,
         |    substr(k.word, k.pos, b.l)
         |  FROM walk$i k JOIN cand$i b ON b.word = k.word AND b.pos = k.pos
         |  WHERE k.pos <= len(k.word))""".stripMargin
    def counts(i: Int): String =
      s"""cnt$i AS MATERIALIZED (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM walk$i
         |  WHERE piece IS NOT NULL GROUP BY 1)""".stripMargin
    val perRound = (1 to rounds).flatMap(i =>
      Seq(walk(i), counts(i), inventory(i, s"cnt$i")))
    val finalWalk = if (walkFinal) Seq(walk(rounds + 1)) else Nil
    (Seq(seed, inventory(0, "sub")) ++ perRound ++ finalWalk)
      .mkString(",\n")
  }

  /** Naive-Bayes oracle chain shared by cl1/cl2/x5: train/test split,
    * top-V vocab, smoothed grid, and the per-(doc, class) scores
    * `gsc`. `scoreWhere` selects the scored set (cl1/cl2 hold out the
    * 1/5 split; x5's router scores everything). */
  private def nbOracleCtes(scoreWhere: String): String =
    raw"""tr AS (
        |  SELECT doc_id, lang AS label, text FROM documents
        |  WHERE doc_id % 5 <> 0),
        |te AS (SELECT doc_id, text FROM documents WHERE $scoreWhere),
        |tok AS (
        |  SELECT label, unnest(string_split_regex(lower(text), '\s+')) AS term
        |  FROM tr),
        |vocab AS (
        |  SELECT term FROM (SELECT term, count(*) AS c FROM tok GROUP BY 1)
        |  ORDER BY c DESC, term LIMIT 24),
        |counts AS (
        |  SELECT label, term, count(*) AS tc
        |  FROM tok JOIN vocab USING (term) GROUP BY 1, 2),
        |totals AS (SELECT label, sum(tc) AS tot FROM counts GROUP BY 1),
        |nd AS (SELECT count(*) AS nd FROM tr),
        |pri AS (
        |  SELECT label,
        |    CAST(floor(ln(count(*) / nd.nd) * 1000000 + 0.5) AS BIGINT)
        |      AS prior6
        |  FROM tr CROSS JOIN nd GROUP BY label, nd.nd),
        |vs AS (SELECT count(*) AS v FROM vocab),
        |grid AS (
        |  SELECT p.label, vc.term,
        |    CAST(floor(ln((coalesce(c.tc, 0) + 1.0)
        |      / (coalesce(t.tot, 0) + 1.0 * vs.v)) * 1000000 + 0.5)
        |      AS BIGINT) AS lik6,
        |    p.prior6
        |  FROM pri p
        |  LEFT JOIN totals t USING (label)
        |  CROSS JOIN vocab vc CROSS JOIN vs
        |  LEFT JOIN counts c ON c.label = p.label AND c.term = vc.term),
        |dtok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        |  FROM te),
        |hits AS (
        |  SELECT doc_id, label, sum(lik6) AS lik
        |  FROM dtok JOIN grid USING (term) GROUP BY 1, 2),
        |gsc AS (
        |  SELECT te.doc_id, p.label,
        |    (p.prior6 + coalesce(h.lik, 0)) / 1000000.0 AS score
        |  FROM te CROSS JOIN pri p
        |  LEFT JOIN hits h ON h.doc_id = te.doc_id AND h.label = p.label)""".stripMargin

  /** Corpus-side TF-IDF CTEs shared by v1 and r3: slot-hashed token
    * counts `tfv`, slot idf `idfv`, sparse weights `wv`. */
  private def tfidfCtes(dim: Int = 64): String =
    s"""vtk AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
       |  FROM documents),
       |vsl AS (SELECT doc_id, ${slotSql("term", dim)} AS slot FROM vtk),
       |tfv AS (SELECT doc_id, slot, count(*) AS tf FROM vsl GROUP BY 1, 2),
       |nv AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
       |idfv AS (
       |  SELECT slot, ln(1 + nv.n / count(DISTINCT doc_id)) AS idf
       |  FROM tfv CROSS JOIN nv GROUP BY slot, nv.n),
       |wv AS (
       |  SELECT doc_id, slot, round(tf * idf, 6) AS weight
       |  FROM tfv JOIN idfv USING (slot))""".stripMargin

  /** TF-IDF cosine top-k oracle chain ending in the ranked `rkv` CTE —
    * shared by r3 and (composed with [[Bm25Ctes]]) the r4 hybrid
    * fusion; the two chains' CTE names are disjoint. */
  private lazy val TfidfKnnCtes =
    s"""${tfidfCtes()},
      |cnv AS (SELECT doc_id, sqrt(sum(weight * weight)) AS cn
      |        FROM wv GROUP BY 1),
      |qv AS (
      |  SELECT doc_id AS query_id, trim(substr(text, 40, 60)) AS qtext
      |  FROM documents WHERE doc_id % 97 = 0),
      |qtk AS (
      |  SELECT query_id,
      |    unnest(string_split_regex(lower(qtext), '\\s+')) AS term
      |  FROM qv),
      |qsl AS (SELECT query_id, ${slotSql("term", 64)} AS slot FROM qtk),
      |qtf AS (SELECT query_id, slot, count(*) AS qtf
      |        FROM qsl GROUP BY 1, 2),
      |qw AS (
      |  SELECT query_id, slot, round(qtf * idf, 6) AS qw
      |  FROM qtf JOIN idfv USING (slot)),
      |qn AS (SELECT query_id, sqrt(sum(qw * qw)) AS qn FROM qw GROUP BY 1),
      |cwn AS (
      |  SELECT doc_id, slot, weight / cn AS nw
      |  FROM wv JOIN cnv USING (doc_id)),
      |qwn AS (
      |  SELECT query_id, slot, qw / qn AS qnw
      |  FROM qw JOIN qn USING (query_id)),
      |scv AS (
      |  SELECT query_id, doc_id, round(sum(nw * qnw), 6) AS cos
      |  FROM cwn JOIN qwn USING (slot) GROUP BY 1, 2),
      |rkv AS (
      |  SELECT query_id, doc_id, cos,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, doc_id) AS BIGINT) AS rk
      |  FROM scv)""".stripMargin

  private val SigCte =
    "sig AS (SELECT doc_id, " +
      (0 until 8).map(i =>
        s"min(substr(md5('${i / 4}_' || shingle), ${(i % 4) * 8 + 1}, 8)) AS h$i")
        .mkString(", ") +
      " FROM sh GROUP BY doc_id)"

  private val BandedPairsCte =
    "banded AS (" +
      (0 until 8).map(i => s"SELECT doc_id, $i AS band_idx, h$i AS band_val FROM sig")
        .mkString(" UNION ALL ") + "),\n" +
      """pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b USING (band_idx, band_val)
        |  WHERE a.doc_id < b.doc_id)""".stripMargin

  private def langScoreSql(lang: String): String = {
    val words = graft.operators.TextAnalysis.StopwordMarkers(lang)
    words.map(w => s"len(list_filter(toks, t -> t = '$w'))").mkString(" + ") +
      s" AS score_$lang"
  }

  /** The k6-shaped IVF probe oracle — full-corpus k=8/2-round training,
    * 2-cell probe, top-3. Shared verbatim by k6 (fresh build) and k11
    * (stale build → append → retrain → probe through the generation
    * pointer): the retrained index answering exactly this SQL is k11's
    * correctness contract. */
  private lazy val fullTrainIvfProbeOracle: String =
    s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
       |cells AS (SELECT vec_id, embedding, cell_id FROM a3 WHERE rn = 1),
       |qcells AS (
       |  SELECT vec_id, embedding, cell_id FROM a3
       |  WHERE rn <= 2 AND vec_id >= 5 AND vec_id < 10),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
       |  FROM qcells q JOIN cells c ON q.cell_id = c.cell_id AND q.vec_id != c.vec_id),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin


  /** The k8-shaped IVF-PQ probe oracle — full-corpus coarse training
    * (k=8, 2 rounds), PQ codebooks (m=4, ksub=8, 1 round), 2-cell
    * probe, ADC top-3. Shared verbatim by k8 (fresh build) and k13
    * (stale build → append → rebuild-from-source → probe through the
    * generation pointer): the rebuilt index answering exactly this SQL
    * is k13's correctness contract. */
  private lazy val fullTrainIvfPqProbeOracle: String =
    s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
      |$PqCtes,
      |ccell AS (SELECT vec_id, cell_id FROM a3 WHERE rn = 1),
      |qcell AS (
      |  SELECT vec_id, cell_id FROM a3
      |  WHERE rn <= 2 AND vec_id >= 5 AND vec_id < 10),
      |scored AS (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |    list_sum(list(list_inner_product(ps.sv, cb.cent) ORDER BY ps.sub)) AS score
      |  FROM qcell q
      |  JOIN ccell n ON n.cell_id = q.cell_id AND n.vec_id != q.vec_id
      |  JOIN psub ps ON ps.vec_id = q.vec_id
      |  JOIN ncodes nc ON nc.vec_id = n.vec_id AND nc.sub = ps.sub
      |  JOIN cb2 cb ON cb.sub = nc.sub AND cb.code = nc.code
      |  GROUP BY q.vec_id, n.vec_id),
      |fin AS (
      |  SELECT s.query_id, s.neighbor_id,
      |    round(s.score / (qn.qn * e.rnorm), 6) AS cos
      |  FROM scored s JOIN qn ON qn.vec_id = s.query_id
      |  JOIN enc e ON e.vec_id = s.neighbor_id),
      |r AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM fin)
      |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** The x2 DuckDB mirror, parameterized like [[x2Chain]]: kmeans CTEs
    * at (kSql, iters), SemDeDup pairs at 0.7 from the final assignment
    * a{iters+1}, prototype prune at 0.3, recursive-CTE components,
    * md5 split. x2 pins ("8", 2) — the d8 configuration; x2_sqrtn
    * passes [[sqrtNkSql]] (k≈√N derived from the SAME count the Spark
    * side derives it from, so a gate-dataset size change moves both
    * sides together) at iters = 1 — the d8b convention. */
  private def x2OracleSql(kSql: String, iters: Int): String =
    s"""WITH RECURSIVE ${kmeansOracleCtesExpr(kSql, iters)},
       |sel AS (SELECT vec_id, embedding, cell_id, ccos
       |        FROM a${iters + 1} WHERE rn = 1),
       |spairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM sel a JOIN sel b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
       |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.7),
       |dropids AS (SELECT DISTINCT id_b FROM spairs),
       |surv AS (
       |  SELECT s.vec_id, s.cell_id, s.ccos FROM sel s
       |  WHERE s.vec_id NOT IN (SELECT id_b FROM dropids)),
       |rk AS (
       |  SELECT vec_id, cell_id, ccos,
       |    row_number() OVER (PARTITION BY cell_id
       |      ORDER BY ccos DESC, vec_id) AS proto_rank,
       |    count(*) OVER (PARTITION BY cell_id) AS n_cell
       |  FROM surv),
       |keepids AS (SELECT vec_id FROM rk WHERE proto_rank > ceil(0.3 * n_cell)),
       |edges AS (
       |  SELECT id_a, id_b FROM spairs
       |  UNION ALL SELECT id_b, id_a FROM spairs),
       |reach(id, cluster) AS (
       |  SELECT DISTINCT id_a, id_a FROM edges
       |  UNION
       |  SELECT e.id_a, r.cluster FROM edges e JOIN reach r ON r.id = e.id_b),
       |comp AS (SELECT id, min(cluster) AS cluster FROM reach GROUP BY id),
       |assigned AS (
       |  SELECT k.vec_id, coalesce(c.cluster, k.vec_id) AS cluster
       |  FROM keepids k LEFT JOIN comp c ON c.id = k.vec_id)
       |SELECT vec_id, cluster,
       |  CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) IN ('c', 'd')
       |         THEN 'val'
       |       WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) IN ('e', 'f')
       |         THEN 'test'
       |       ELSE 'train' END AS split
       |FROM assigned ORDER BY vec_id""".stripMargin

  /** DuckDB CTE chain mirroring [[graft.operators.Clustering]]: seeds
    * c0 with the first `k` vectors, unrolls `iters` assign+update rounds
    * (a1/m1/c1 … ), and ends with the final assignment `a{iters+1}`
    * (vec_id, embedding, cell_id, ccos, rn) against c{iters}. Rounding
    * (ccos to 6, means to 6) matches the Spark side exactly so the
    * iteration trajectories stay bit-identical across engines.
    * `trainWhere` (a bare predicate over `e`, e.g. "e.vec_id < 250")
    * restricts the TRAINING rounds to a corpus subset; the final
    * assignment (which feeds both the probe ranking and the full-corpus
    * cell map) always runs unfiltered — the oracle shape of
    * train-on-old / assign-everything index appends (k10). */
  private def kmeansOracleCtes(k: Int, iters: Int,
      trainWhere: String = "", source: String = "embeddings"): String =
    kmeansOracleCtesExpr(k.toString, iters, trainWhere, source)

  /** The k≈√N seed-count expression for the sqrt-N oracles (d8b,
    * x2_sqrtn), the exact DuckDB mirror of the Spark side's
    * `math.max(1, math.sqrt(count).toInt)`: deriving the oracle's k
    * from the SAME runtime count the query derives it from means a
    * gate-dataset size change moves both sides together instead of
    * silently diverging behind a hard-pinned k (an oracle mismatch
    * there would masquerade as an engine bug). */
  private def sqrtNkSql(source: String = "embeddings"): String =
    s"(SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM $source)"

  private def kmeansOracleCtesExpr(kSql: String, iters: Int,
      trainWhere: String = "", source: String = "embeddings"): String = {
    def assign(i: Int): String = {
      val pred = if (trainWhere.nonEmpty && i <= iters)
        s"\n  WHERE $trainWhere" else ""
      s"""a$i AS (
         |  SELECT e.vec_id, e.embedding, c.cell_id,
         |    round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS ccos,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) DESC,
         |      c.cell_id ASC) AS rn
         |  FROM $source e CROSS JOIN c${i - 1} c$pred)""".stripMargin
    }
    val init =
      s"""c0 AS (
         |  SELECT vec_id AS cell_id,
         |    list_transform(embedding, v -> v::DOUBLE) AS centroid
         |  FROM $source WHERE vec_id < $kSql)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${assign(i)},
         |m$i AS (
         |  SELECT cell_id, pos, round(avg(v), 6) AS m
         |  FROM (SELECT a.cell_id, u.i AS pos, a.embedding[u.i + 1]::DOUBLE AS v
         |        FROM a$i a, LATERAL unnest(range(0, len(a.embedding))) u(i)
         |        WHERE a.rn = 1)
         |  GROUP BY cell_id, pos),
         |c$i AS (
         |  SELECT cell_id, list(m ORDER BY pos) AS centroid
         |  FROM m$i GROUP BY cell_id)""".stripMargin
    }
    (Seq(init) ++ rounds ++ Seq(assign(iters + 1))).mkString(",\n")
  }

  /** DuckDB CTE chain mirroring [[graft.operators.ProductQuantization]]
    * at (m=4, ksub=8, subDim=16, one Lloyd's round): subvector explode
    * (`psub`), seeded codebooks (`pc0`), rounded-L2 argmin (`pa1`),
    * mean update (`pm1`/`pc1`), final codes (`ncodes`), per-code
    * squared norms (`cb2`), reconstruction norms (`enc`), and query
    * norms over vec_id 5..10 (`qn`). Shared by k7 (flat ADC) and k8
    * (IVF-PQ — composes with [[kmeansOracleCtes]] for the coarse
    * probe). */
  /** Raw query/corpus subvectors (m=4, subDim=16) and query norms —
    * shared by every PQ-family oracle. */
  private val PsubCte: String =
    """psub AS (
      |  SELECT e.vec_id, u.s AS sub,
      |    list_transform(e.embedding[u.s * 16 + 1 : u.s * 16 + 16],
      |                   v -> v::DOUBLE) AS sv
      |  FROM embeddings e, LATERAL unnest(range(0, 4)) u(s))""".stripMargin

  private val QnCte: String =
    """qn AS (
      |  SELECT vec_id, sqrt(list_inner_product(
      |      list_transform(embedding, v -> v::DOUBLE),
      |      list_transform(embedding, v -> v::DOUBLE))) AS qn
      |  FROM embeddings WHERE vec_id >= 5 AND vec_id < 10)""".stripMargin

  private val PqCtes: String =
    s"""$PsubCte,
      |pc0 AS (
      |  SELECT sub, CAST(vec_id AS INT) AS code, sv AS cent
      |  FROM psub WHERE vec_id < 8),
      |pa1 AS (
      |  SELECT v.vec_id, v.sub, v.sv, c.code,
      |    row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
      |      round(list_inner_product(v.sv, v.sv)
      |        - 2 * list_inner_product(v.sv, c.cent)
      |        + list_inner_product(c.cent, c.cent), 6) ASC,
      |      c.code ASC) AS rn
      |  FROM psub v JOIN pc0 c ON v.sub = c.sub),
      |pm1 AS (
      |  SELECT sub, code, pos, round(avg(x), 6) AS mn
      |  FROM (SELECT a.sub, a.code, u.i AS pos, a.sv[u.i + 1] AS x
      |        FROM pa1 a, LATERAL unnest(range(0, len(a.sv))) u(i)
      |        WHERE a.rn = 1)
      |  GROUP BY sub, code, pos),
      |pc1 AS (
      |  SELECT sub, code, list(mn ORDER BY pos) AS cent
      |  FROM pm1 GROUP BY sub, code),
      |pa2 AS (
      |  SELECT v.vec_id, v.sub, c.code,
      |    row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
      |      round(list_inner_product(v.sv, v.sv)
      |        - 2 * list_inner_product(v.sv, c.cent)
      |        + list_inner_product(c.cent, c.cent), 6) ASC,
      |      c.code ASC) AS rn
      |  FROM psub v JOIN pc1 c ON v.sub = c.sub),
      |ncodes AS (SELECT vec_id, sub, code FROM pa2 WHERE rn = 1),
      |cb2 AS (SELECT sub, code, cent,
      |          list_inner_product(cent, cent) AS c2 FROM pc1),
      |enc AS (
      |  SELECT n.vec_id, sqrt(list_sum(list(cb.c2 ORDER BY n.sub))) AS rnorm
      |  FROM ncodes n JOIN cb2 cb USING (sub, code) GROUP BY n.vec_id),
      |$QnCte""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "s2_metric_autocreate" ->
      s"""WITH pts AS (
         |  SELECT 'ev.' || event_type || '.' || user_id || '.k' ||
         |           json_extract_string(props, '$$.k') AS name,
         |         CAST(floor(epoch(ts)) AS BIGINT) AS ts
         |  FROM events),
         |existing AS (SELECT DISTINCT name FROM pts WHERE ts < $T0 + 15 * 86400),
         |incoming AS (SELECT DISTINCT name FROM pts WHERE ts >= $T0 + 15 * 86400),
         |fresh AS (SELECT name FROM incoming WHERE name NOT IN (SELECT name FROM existing))
         |SELECT name,
         |  split_part(name, '.', 1) AS p0,
         |  split_part(name, '.', 2) AS p1,
         |  split_part(name, '.', 3) AS p2,
         |  split_part(name, '.', 4) AS p3,
         |  len(string_split(name, '.')) AS depth,
         |  split_part(name, '.', 1) || '.' || split_part(name, '.', 2) || '.' ||
         |    split_part(name, '.', 3) || '.' AS parent
         |FROM fresh ORDER BY name""".stripMargin,

    "e1_storage_read_path" ->
      s"""WITH $PointsCte,
         |names AS (
         |  SELECT DISTINCT name FROM points
         |  WHERE split_part(name, '.', 2) IN ('click', 'view')),
         |w AS (
         |  SELECT name, (ts // 3600) * 3600 AS ts, value FROM points
         |  WHERE ts >= $T0 AND ts < $T0 + 2 * 86400),
         |g AS (
         |  SELECT name, ts,
         |    round(CASE WHEN split_part(name, '.', 2) IN ('click', 'purchase')
         |          THEN sum(value) ELSE sum(value) / count(*) END, 4) AS value
         |  FROM w GROUP BY name, ts),
         |spine AS (SELECT unnest(range($T0, $T0 + 2 * 86400, 3600)) AS ts)
         |SELECT names.name AS name, spine.ts AS ts, g.value AS value
         |FROM names CROSS JOIN spine
         |LEFT JOIN g ON g.name = names.name AND g.ts = spine.ts
         |ORDER BY name, ts""".stripMargin,

    "e2_consolidated_read" ->
      s"""WITH $PointsCte,
         |names AS (SELECT DISTINCT name FROM points),
         |w AS (
         |  SELECT name, (ts // 3600) * 3600 AS h, value FROM points
         |  WHERE ts >= $T0 AND ts < $T0 + 4 * 86400),
         |hourly AS (
         |  SELECT name, h, sum(value) AS sv, count(*) AS c
         |  FROM w GROUP BY 1, 2),
         |twoh AS (
         |  SELECT name, (h // 7200) * 7200 AS ts, sum(sv) AS sv,
         |         sum(c) AS c, count(*) AS known
         |  FROM hourly GROUP BY 1, 2),
         |vals AS (
         |  SELECT name, ts,
         |    CASE WHEN known / 2.0 < 0.75 THEN 'NaN'::DOUBLE
         |         ELSE round(sv / c, 4) END AS value
         |  FROM twoh),
         |spine AS (SELECT unnest(range($T0, $T0 + 4 * 86400, 7200)) AS ts)
         |SELECT names.name AS name, spine.ts AS ts, vals.value AS value
         |FROM names CROSS JOIN spine
         |LEFT JOIN vals ON vals.name = names.name AND vals.ts = spine.ts
         |ORDER BY name, ts""".stripMargin,

    "e4_render_pipeline" ->
      s"""WITH $PointsCte,
         |names AS (SELECT DISTINCT name FROM points),
         |w AS (
         |  SELECT name, (ts // 3600) * 3600 AS ts, value FROM points
         |  WHERE ts >= $T0 AND ts < $T0 + 2 * 86400),
         |g AS (
         |  SELECT name, ts, round(sum(value) / count(*), 4) AS value
         |  FROM w GROUP BY 1, 2),
         |spine AS (SELECT unnest(range($T0, $T0 + 2 * 86400, 3600)) AS ts),
         |dense AS (
         |  SELECT n.name, s.ts, g.value
         |  FROM names n CROSS JOIN spine s
         |  LEFT JOIN g ON g.name = n.name AND g.ts = s.ts),
         |rate AS (
         |  SELECT name, ts,
         |    CASE WHEN value - lag(value) OVER pw >= 0
         |         THEN (value - lag(value) OVER pw) /
         |              (ts - lag(ts) OVER pw) END AS value
         |  FROM dense WINDOW pw AS (PARTITION BY name ORDER BY ts)),
         |summ AS (
         |  SELECT name, (ts // 7200) * 7200 AS ts, max(value) AS value
         |  FROM rate GROUP BY 1, 2),
         |top AS (
         |  SELECT name FROM (
         |    SELECT name, max(value) AS s FROM summ GROUP BY name)
         |  ORDER BY s DESC NULLS LAST, name ASC LIMIT 3)
         |SELECT split_part(summ.name, '.', 2) || '.' ||
         |       split_part(summ.name, '.', 3) AS name,
         |  summ.ts AS ts, round(summ.value * 1e6, 4) AS rate_u
         |FROM summ JOIN top ON top.name = summ.name
         |ORDER BY name, ts""".stripMargin,

    "e3_multi_retention_read" ->
      s"""WITH $PointsCte,
         |named AS (
         |  SELECT *, split_part(name, '.', 2) IN ('click', 'purchase') AS is_a
         |  FROM points),
         |names AS (SELECT DISTINCT name, is_a FROM named),
         |w AS (
         |  SELECT name, is_a,
         |         CASE WHEN is_a THEN (ts // 3600) * 3600
         |              ELSE (ts // 7200) * 7200 END AS ts,
         |         value
         |  FROM named WHERE ts >= $T0 AND ts < $T0 + 2 * 86400),
         |g AS (
         |  SELECT name, ts, round(sum(value) / count(*), 4) AS value
         |  FROM w GROUP BY 1, 2),
         |spine AS (
         |  SELECT n.name, s.ts
         |  FROM names n, LATERAL unnest(range($T0, $T0 + 2 * 86400,
         |    CASE WHEN n.is_a THEN 3600 ELSE 7200 END)) s(ts))
         |SELECT spine.name AS name, spine.ts AS ts, g.value AS value
         |FROM spine LEFT JOIN g ON g.name = spine.name AND g.ts = spine.ts
         |ORDER BY name, ts""".stripMargin,

    "m5_touch_sampling" ->
      s"""WITH $PointsCte
         |SELECT DISTINCT name FROM points
         |WHERE substr(md5(name), 1, 1) IN ('0', '1', '2')
         |ORDER BY name""".stripMargin,

    "m6_copy_subtree" ->
      s"""WITH $PointsCte
         |SELECT regexp_replace(name, '^ev\\.view\\.', 'copy.view.') AS new_name,
         |  count(*) AS cnt, round(sum(value), 4) AS sum_v
         |FROM points
         |WHERE regexp_matches(name, '${Glob.toRegex("ev.view.**")}')
         |GROUP BY 1 ORDER BY new_name""".stripMargin,

    "d1_dedup_exact" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_unique,
        |  count(*) - count(DISTINCT md5(text)) AS n_dupes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "d2_minhash_lsh" ->
      s"""WITH $ShinglesCte,
         |$SigCte,
         |$BandedPairsCte
         |SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b""".stripMargin,

    "d3_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(substr(text, 1, 4096)), '\s+')) AS tok
        |  FROM documents),
        |votes AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN substr(md5(tok), b, 1) IN
        |        ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
        |  FROM toks, LATERAL unnest(range(1, 17)) t(b)
        |  GROUP BY doc_id, b)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, 16 - b) AS BIGINT) ELSE 0 END) AS BIGINT) AS fingerprint
        |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // 31-bit twin of d12: vote per md5 nibble 1..31, weight 2^(31-b)
    "d12b_simhash_pairs_wide" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(substr(text, 1, 4096)), '\s+')) AS tok
        |  FROM documents),
        |votes AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN substr(md5(tok), b, 1) IN
        |        ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
        |  FROM toks, LATERAL unnest(range(1, 32)) t(b)
        |  GROUP BY doc_id, b),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, 31 - b) AS BIGINT)
        |             ELSE 0 END) AS BIGINT) AS fingerprint
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT)
        |    AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "d12_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(substr(text, 1, 4096)), '\s+')) AS tok
        |  FROM documents),
        |votes AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN substr(md5(tok), b, 1) IN
        |        ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
        |  FROM toks, LATERAL unnest(range(1, 17)) t(b)
        |  GROUP BY doc_id, b),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, 16 - b) AS BIGINT)
        |             ELSE 0 END) AS BIGINT) AS fingerprint
        |  FROM votes GROUP BY doc_id)
        |-- the oracle brute-forces ALL pairs: banding must find exactly
        |-- the hamming<=2 set (completeness is the property under test)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT)
        |    AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "d4_ngram_jaccard" ->
      s"""WITH $ShinglesCte,
         |$SigCte,
         |$BandedPairsCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS i
         |  FROM pairs p
         |  JOIN dsh a ON a.doc_id = p.id_a
         |  JOIN dsh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2)
         |SELECT p.id_a AS id_a, p.id_b AS id_b,
         |  round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) AS jaccard
         |FROM pairs p
         |LEFT JOIN inter i USING (id_a, id_b)
         |JOIN sizes sa ON sa.doc_id = p.id_a
         |JOIN sizes sb ON sb.doc_id = p.id_b
         |WHERE round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "d18_containment" ->
      s"""WITH $ShinglesCte,
         |$SigCte,
         |$BandedPairsCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS i
         |  FROM pairs p
         |  JOIN dsh a ON a.doc_id = p.id_a
         |  JOIN dsh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |cont AS (
         |  SELECT p.id_a AS id_a, p.id_b AS id_b,
         |    round(coalesce(i.i, 0) / sa.sz, 6) AS containment_a,
         |    round(coalesce(i.i, 0) / sb.sz, 6) AS containment_b,
         |    round(coalesce(i.i, 0)
         |      / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) AS jaccard
         |  FROM pairs p
         |  LEFT JOIN inter i USING (id_a, id_b)
         |  JOIN sizes sa ON sa.doc_id = p.id_a
         |  JOIN sizes sb ON sb.doc_id = p.id_b)
         |SELECT id_a, id_b, containment_a, containment_b, jaccard
         |FROM cont
         |WHERE containment_a >= 0.8 OR containment_b >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    "d6_dup_clusters" ->
      s"""WITH RECURSIVE $ShinglesCte,
         |$SigCte,
         |$BandedPairsCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS i
         |  FROM pairs p
         |  JOIN dsh a ON a.doc_id = p.id_a
         |  JOIN dsh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT p.id_a, p.id_b
         |  FROM pairs p
         |  LEFT JOIN inter i USING (id_a, id_b)
         |  JOIN sizes sa ON sa.doc_id = p.id_a
         |  JOIN sizes sb ON sb.doc_id = p.id_b
         |  WHERE round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) >= 0.5),
         |edges AS (
         |  SELECT id_a, id_b FROM dup
         |  UNION ALL SELECT id_b, id_a FROM dup),
         |reach(id, cluster) AS (
         |  SELECT DISTINCT id_a, id_a FROM edges
         |  UNION
         |  SELECT e.id_a, r.cluster FROM edges e JOIN reach r ON r.id = e.id_b)
         |SELECT id AS doc_id, min(cluster) AS cluster
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "d7_split_leakage_safe" ->
      s"""WITH RECURSIVE $ShinglesCte,
         |$SigCte,
         |$BandedPairsCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS i
         |  FROM pairs p
         |  JOIN dsh a ON a.doc_id = p.id_a
         |  JOIN dsh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT p.id_a, p.id_b
         |  FROM pairs p
         |  LEFT JOIN inter i USING (id_a, id_b)
         |  JOIN sizes sa ON sa.doc_id = p.id_a
         |  JOIN sizes sb ON sb.doc_id = p.id_b
         |  WHERE round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) >= 0.5),
         |edges AS (
         |  SELECT id_a, id_b FROM dup
         |  UNION ALL SELECT id_b, id_a FROM dup),
         |reach(id, cluster) AS (
         |  SELECT DISTINCT id_a, id_a FROM edges
         |  UNION
         |  SELECT e.id_a, r.cluster FROM edges e JOIN reach r ON r.id = e.id_b),
         |comp AS (SELECT id, min(cluster) AS cluster FROM reach GROUP BY id),
         |assigned AS (
         |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id, cluster,
         |  CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) IN ('c', 'd')
         |         THEN 'val'
         |       WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) IN ('e', 'f')
         |         THEN 'test'
         |       ELSE 'train' END AS split
         |FROM assigned ORDER BY doc_id""".stripMargin,

    "d5_embedding_dedup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        |FROM embeddings a
        |JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "k1_knn_brute" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
        |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 5),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "k4_knn_quantized" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      v -> CAST(round(v::DOUBLE * 127 / greatest(
        |        list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 1e-30))
        |        AS INT)) AS qvec
        |  FROM embeddings),
        |scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(a.qvec::DOUBLE[], b.qvec::DOUBLE[]), 6) AS cos
        |  FROM q a JOIN q b ON a.vec_id != b.vec_id
        |  WHERE a.vec_id < 5),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "k2_knn_lsh" -> {
      // query-side probe set: the exact bucket + each 1-bit flip
      val flips = (1 to 4).map { j =>
        s"""SELECT vec_id,
           |  substr(bucket, 1, ${j - 1}) ||
           |  (CASE WHEN substr(bucket, $j, 1) = '1' THEN '0' ELSE '1' END) ||
           |  substr(bucket, ${j + 1}) AS bucket
           |FROM buckets WHERE vec_id < 5""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH proj AS (
         |  SELECT e.vec_id, j,
         |    sum(e.embedding[i + 1]::DOUBLE *
         |      CASE WHEN substr(md5(j || '_' || i), 1, 1) IN
         |        ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END) AS s
         |  FROM embeddings e,
         |       LATERAL unnest(range(0, 4)) p(j),
         |       LATERAL unnest(range(0, len(e.embedding))) d(i)
         |  GROUP BY e.vec_id, j),
         |buckets AS (
         |  SELECT vec_id,
         |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
         |  FROM proj GROUP BY vec_id),
         |probes AS (
         |  SELECT vec_id, bucket FROM buckets WHERE vec_id < 5
         |  UNION ALL $flips),
         |cands AS (
         |  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM probes p
         |  JOIN buckets c ON c.bucket = p.bucket AND c.vec_id != p.vec_id),
         |scored AS (
         |  SELECT cands.query_id, cands.neighbor_id,
         |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
         |  FROM cands
         |  JOIN embeddings q ON q.vec_id = cands.query_id
         |  JOIN embeddings c ON c.vec_id = cands.neighbor_id),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin
    },

    "k3_knn_ivf" ->
      """WITH cents AS (
        |  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings
        |  WHERE vec_id < 5),
        |assigned AS (
        |  SELECT e.vec_id, e.embedding, c.cell_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 6) DESC,
        |      c.cell_id ASC) AS r
        |  FROM embeddings e CROSS JOIN cents c),
        |cells AS (SELECT vec_id, embedding, cell_id FROM assigned WHERE r = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
        |  FROM cells q JOIN cells c ON q.cell_id = c.cell_id AND q.vec_id != c.vec_id
        |  WHERE q.vec_id >= 5 AND q.vec_id < 10),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,

    "km1_kmeans" ->
      s"""WITH ${kmeansOracleCtes(k = 4, iters = 2)}
         |SELECT vec_id, cell_id, ccos AS cos FROM a3 WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,

    "d8_semdedup" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
         |sel AS (SELECT vec_id, embedding, cell_id FROM a3 WHERE rn = 1)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
         |FROM sel a JOIN sel b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "d8b_semdedup_sqrtn" ->
      s"""WITH ${kmeansOracleCtesExpr(sqrtNkSql(), iters = 1)},
         |sel AS (SELECT vec_id, embedding, cell_id FROM a2 WHERE rn = 1)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
         |FROM sel a JOIN sel b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "mm3_media_probe" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN CAST(n_chars % 1024 + 16 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN CAST(doc_id % 768 + 16 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(4 AS INTEGER)
        |       ELSE CAST(doc_id % 3 + 1 AS INTEGER) END AS channels,
        |  CASE WHEN doc_id % 2 = 1
        |       THEN CAST(doc_id % 8 * 1000 + 8000 AS INTEGER)
        |       END AS sample_rate,
        |  CASE WHEN doc_id % 2 = 1 THEN CAST(16 AS INTEGER) END AS bit_depth,
        |  CASE WHEN doc_id % 2 = 1
        |       THEN CAST(n_chars AS BIGINT) * 4 * 1000
        |            // ((doc_id % 8 * 1000 + 8000) * (doc_id % 3 + 1) * 2)
        |       END AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pr4_top_tokens" ->
      """WITH tok AS (
        |  SELECT lang,
        |    unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS cnt FROM tok
        |      WHERE token <> '' GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, token, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, token) AS BIGINT) AS rk
        |  FROM c)
        |SELECT lang, token, cnt, rk FROM r WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin,

    // the sketch runs in its exact regime on this corpus (capacity
    // 4096 >> per-partial distinct tokens), so the oracle is pr4's
    // exact top-k with the max_err = 0 certificate column
    "pr5_top_tokens_sketch" ->
      """WITH tok AS (
        |  SELECT lang,
        |    unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS cnt FROM tok
        |      WHERE token <> '' GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, token, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, token) AS BIGINT) AS rk
        |  FROM c)
        |SELECT lang, token, cnt, CAST(0 AS BIGINT) AS max_err, rk
        |FROM r WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin,

    "pr1_dataset_card" ->
      """WITH t AS (
        |  SELECT source, md5(text) AS fp,
        |    len(string_split_regex(text, '\s+')) AS tok,
        |    CAST(octet_length(text::BLOB) AS BIGINT) AS b
        |  FROM documents)
        |SELECT source,
        |  count(*) AS n_docs,
        |  count(DISTINCT fp) AS n_unique,
        |  CAST(sum(b) AS BIGINT) AS n_bytes,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  round(avg(tok), 4) AS avg_tokens,
        |  round(quantile_cont(tok, 0.5), 4) AS p50_tokens,
        |  round(quantile_cont(tok, 0.9), 4) AS p90_tokens,
        |  round(quantile_cont(tok, 0.99), 4) AS p99_tokens,
        |  round(1.0 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    // the lifecycle reduces to: one winner per content key (earliest
    // batch = doc_id % 3, then lowest doc_id — appendNovel's
    // batch-dedup + history anti-join), summed per source. The fold
    // and the masked stale increment must leave exactly these totals
    "pr6_curation_card_lifecycle" ->
      """WITH w AS (
        |  SELECT source, text,
        |    row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY doc_id % 3, doc_id) AS rn
        |  FROM documents)
        |SELECT source,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |    AS n_tokens,
        |  CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS n_bytes
        |FROM w WHERE rn = 1
        |GROUP BY source ORDER BY source""".stripMargin,

    "pr3_rollup_card" ->
      """WITH t AS (
        |  SELECT source, lang, md5(text) AS fp,
        |    len(string_split_regex(text, '\s+')) AS tok
        |  FROM documents)
        |SELECT source, lang,
        |  count(*) AS n_docs,
        |  count(DISTINCT fp) AS n_unique,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  round(avg(tok), 4) AS avg_tokens,
        |  round(quantile_cont(tok, 0.5), 4) AS p50_tokens,
        |  round(1.0 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE), 6)
        |    AS dup_ratio
        |FROM t GROUP BY ROLLUP (source, lang)
        |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin,

    "x8_user360" ->
      s"""WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         event_id, event_type
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id) > 1800
        |         THEN 1 ELSE 0 END AS st
        |  FROM e),
        |n AS (
        |  SELECT user_id,
        |    SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM s),
        |sess AS (
        |  SELECT user_id, count(DISTINCT session_seq) AS n_sessions,
        |         count(*) AS total_events
        |  FROM n GROUP BY user_id),
        |$FunnelStageCtes,
        |fdep AS (
        |  SELECT s1.user_id,
        |    1 + CASE WHEN s2.s2_ts IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN s3.s3_ts IS NOT NULL THEN 1 ELSE 0 END AS fd
        |  FROM s1
        |  LEFT JOIN s2 ON s1.user_id = s2.user_id
        |  LEFT JOIN s3 ON s1.user_id = s3.user_id),
        |co AS (
        |  SELECT user_id,
        |    CAST(floor(min(ts) / 604800) AS BIGINT) AS cohort_week,
        |    max(ts) AS last_seen_ts
        |  FROM e GROUP BY user_id)
        |SELECT sess.user_id, sess.n_sessions, sess.total_events,
        |  co.cohort_week, co.last_seen_ts,
        |  CAST(COALESCE(f.fd, 0) AS INT) AS funnel_depth
        |FROM sess
        |JOIN co ON sess.user_id = co.user_id
        |LEFT JOIN fdep f ON sess.user_id = f.user_id
        |ORDER BY sess.user_id""".stripMargin,

    "x9_seeded_curation" ->
      s"""WITH ${nbOracleCtes("doc_id % 3 <> 0")},
        |w AS (
        |  SELECT doc_id, source, text, doc_id % 3 AS b,
        |    row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY doc_id % 3, doc_id) AS rn
        |  FROM documents),
        |adm AS (SELECT * FROM w WHERE rn = 1),
        |npred AS (
        |  SELECT doc_id, label FROM (
        |    SELECT doc_id, label,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, label) AS prn
        |    FROM gsc) WHERE prn = 1),
        |strm AS (
        |  SELECT a.source, a.text, p.label
        |  FROM adm a JOIN npred p USING (doc_id) WHERE a.b <> 0),
        |seedc AS (
        |  SELECT source, count(*) AS n_seed
        |  FROM adm WHERE b = 0 GROUP BY 1),
        |sagg AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
        |      AS n_tokens,
        |    CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS n_bytes,
        |    count(*) AS n_stream,
        |    CAST(sum(CASE WHEN label = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_stream_en
        |  FROM strm GROUP BY source)
        |SELECT sa.source, sa.n_docs, sa.n_tokens, sa.n_bytes,
        |  sa.n_stream, CAST(coalesce(sc.n_seed, 0) AS BIGINT) AS n_seed,
        |  sa.n_stream_en
        |FROM sagg sa LEFT JOIN seedc sc USING (source)
        |ORDER BY sa.source""".stripMargin,

    "h14_promo_revenue" ->
      """WITH r AS (
        |  SELECT
        |    floor(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |      * 100 + 0.5) / 100 AS promo_revenue,
        |    floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |      / 100 AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-07-01')
        |SELECT promo_revenue, total_revenue,
        |  CAST(floor(promo_revenue * 1000000 / total_revenue) AS BIGINT)
        |    AS promo_ppm
        |FROM r""".stripMargin,

    "h18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 200)
        |SELECT c_name, o.o_orderkey,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate,
        |  o_totalprice, big.sum_qty
        |FROM orders o
        |JOIN big ON o.o_orderkey = big.o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    // per-part avg over integer quantities is exact in both engines
    // (integer sum < 2^53, one IEEE division); revenue sums integer cents
    "h17_small_qty_revenue" ->
      """WITH p AS (
        |  SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#23' AND p_size <= 15),
        |l AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN p ON l_partkey = p_partkey),
        |a AS (
        |  SELECT l_partkey, avg(l_quantity) AS aq FROM l GROUP BY 1)
        |SELECT floor(sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
        |    AS BIGINT)) / 7.0 + 0.5) / 100 AS avg_yearly
        |FROM l JOIN a ON l.l_partkey = a.l_partkey
        |WHERE l.l_quantity < 0.2 * a.aq""".stripMargin,

    "h21_waiting_suppliers" ->
      """WITH lo AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F')
        |SELECT s.s_name, count(*) AS numwait
        |FROM lo l1
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE n.n_name IN ('NATION_3', 'NATION_7')
        |  AND l1.late
        |  AND EXISTS (SELECT 1 FROM lo l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    "h13_order_count_distribution" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_orderpriority NOT LIKE '1-%'
        |  GROUP BY o_custkey),
        |co AS (
        |  SELECT c.c_custkey, COALESCE(p.n, 0) AS c_count
        |  FROM customer c LEFT JOIN per_cust p
        |    ON c.c_custkey = p.o_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "h16_part_supplier_variety" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, p_type, p_size FROM part
        |  WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
        |    AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)),
        |ok AS (
        |  SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
        |  FROM lineitem l JOIN p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size, count(*) AS supplier_cnt
        |FROM ok GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // the oracle keeps Q2's correlated min() subquery verbatim; the
    // Spark side decorrelates it to one window over the same relation
    "h2_min_cost_supplier" ->
      """WITH ps0 AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, supplycost
        |FROM part
        |JOIN ps0 ON p_partkey = ps0.l_partkey
        |JOIN eu ON ps0.l_suppkey = eu.s_suppkey
        |WHERE p_type = 'ECONOMY' AND p_size <= 10
        |  AND supplycost = (
        |    SELECT min(ps2.supplycost)
        |    FROM ps0 ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
        |    WHERE ps2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,

    "h20_part_promotion_suppliers" ->
      """WITH pp AS (
        |  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
        |q AS (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN pp ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 40)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_2', 'NATION_6', 'NATION_11')
        |  AND s_suppkey IN (SELECT l_suppkey FROM q)
        |ORDER BY s_name""".stripMargin,

    // cents·n > Σcents mirrors the Spark side's exact integer
    // above-average test — no float division on either engine
    "h22_sales_opportunity" ->
      """WITH sel AS (
        |  SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer
        |  WHERE right(c_name, 2)
        |    IN ('01', '12', '23', '34', '45', '56', '67')),
        |st AS (
        |  SELECT sum(cents) AS sc, count(*) AS n
        |  FROM sel WHERE c_acctbal > 0)
        |SELECT cntrycode, count(*) AS numcust,
        |  sum(cents) / 100.0 AS totacctbal
        |FROM sel, st
        |WHERE cents * n > sc
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,

    "h4_order_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "h6_forecast_revenue" ->
      """SELECT sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
        |    AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "h10_returned_items" ->
      """WITH per_cust AS (
        |  SELECT o_custkey,
        |    sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 100 + 0.5) AS BIGINT)) AS c
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-04-01'
        |    AND l_returnflag = 'R'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, n_name, c_acctbal,
        |  c / 100.0 AS revenue
        |FROM per_cust
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "h12_priority_shipping" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "h19_disjunctive_revenue" ->
      """SELECT sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |    * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "h7_volume_shipping" ->
      """WITH s AS (
        |  SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7')),
        |c AS (
        |  SELECT c_custkey, n_name AS cust_nation FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7'))
        |SELECT supp_nation, cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |    * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN s ON l_suppkey = s.s_suppkey
        |JOIN c ON o_custkey = c.c_custkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND supp_nation <> cust_nation
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "h8_market_share" ->
      """WITH mkt AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |s AS (
        |  SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey),
        |a AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(sum(CASE WHEN supp_nation = 'NATION_5'
        |      THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
        |        * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 100 + 0.5) AS BIGINT)) AS BIGINT) AS tc
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN s ON l_suppkey = s.s_suppkey
        |  WHERE p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |    AND o_custkey IN (SELECT c_custkey FROM mkt)
        |  GROUP BY 1)
        |SELECT o_year, (nc * 1000000) // tc AS share_ppm,
        |  nc / 100.0 AS nation_revenue, tc / 100.0 AS total_revenue
        |FROM a ORDER BY o_year""".stripMargin,

    "h9_product_profit" ->
      """WITH p AS (
        |  SELECT p_partkey, p_retailprice FROM part
        |  WHERE p_name LIKE '%bolt%'),
        |s AS (
        |  SELECT s_suppkey, n_name AS nation FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey)
        |SELECT nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 100 + 0.5) AS BIGINT)
        |    - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) / 100.0 AS sum_profit
        |FROM lineitem
        |JOIN p ON l_partkey = p.p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN s ON l_suppkey = s.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "h11_important_stock" ->
      """WITH s AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_5'),
        |pv AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS pv
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM s)
        |  GROUP BY 1),
        |g AS (SELECT CAST(sum(pv) AS BIGINT) AS gv FROM pv)
        |SELECT l_partkey, pv / 100.0 AS value
        |FROM pv CROSS JOIN g
        |WHERE pv * 10000 > gv
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "h15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rc
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1),
        |m AS (SELECT max(rc) AS mx FROM rev)
        |SELECT s_suppkey, s_name, rc / 100.0 AS total_revenue
        |FROM rev CROSS JOIN m
        |JOIN supplier ON rev.l_suppkey = s_suppkey
        |WHERE rc = mx
        |ORDER BY s_suppkey""".stripMargin,

    "er1_fuzzy_ed_join" ->
      """WITH nm AS (
        |  SELECT DISTINCT c_name AS name FROM customer
        |  WHERE c_name IS NOT NULL)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM nm a JOIN nm b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY name_a, name_b""".stripMargin,

    "er2_nearest_master" ->
      """WITH masters AS (
        |  SELECT DISTINCT c_name AS mname FROM customer
        |  WHERE c_acctbal >= 9000 AND c_name IS NOT NULL),
        |scored AS (
        |  SELECT c.c_custkey, m.mname,
        |    CAST(levenshtein(c.c_name, m.mname) AS BIGINT) AS d,
        |    row_number() OVER (PARTITION BY c.c_custkey
        |      ORDER BY levenshtein(c.c_name, m.mname), m.mname) AS rn
        |  FROM customer c JOIN masters m
        |    ON levenshtein(c.c_name, m.mname) <= 1)
        |SELECT c.c_custkey, c.c_name, s.mname AS master_name,
        |  s.d AS dist
        |FROM customer c
        |LEFT JOIN scored s ON s.c_custkey = c.c_custkey AND s.rn = 1
        |ORDER BY c.c_custkey""".stripMargin,

    "zo1_zorder_scan" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |    / 100 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 2999
        |  AND l_partkey BETWEEN 200 AND 599
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "cd1_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         event_id, event_type
        |  FROM events),
        |lww AS (
        |  SELECT user_id, ts, arg_max(event_type, event_id) AS event_type
        |  FROM e GROUP BY user_id, ts),
        |comp AS (
        |  SELECT user_id, ts, event_type FROM (
        |    SELECT user_id, ts, event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |    FROM lww)
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
        |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
        |    AS is_current
        |FROM comp
        |ORDER BY user_id, valid_from""".stripMargin,

    "cd2_pit_snapshot" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         event_id, event_type
        |  FROM events),
        |lww AS (
        |  SELECT user_id, ts, arg_max(event_type, event_id) AS event_type
        |  FROM e GROUP BY user_id, ts),
        |comp AS (
        |  SELECT user_id, ts, event_type FROM (
        |    SELECT user_id, ts, event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |    FROM lww)
        |  WHERE prev IS NULL OR prev <> event_type),
        |iv AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM comp)
        |SELECT user_id, event_type, valid_from
        |FROM iv
        |WHERE valid_from <= 1704844800
        |  AND (valid_to IS NULL OR valid_to > 1704844800)
        |ORDER BY user_id""".stripMargin,

    "cd3_snapshot_diff" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         event_id, event_type
        |  FROM events),
        |lww AS (
        |  SELECT user_id, ts, arg_max(event_type, event_id) AS event_type
        |  FROM e GROUP BY user_id, ts),
        |comp AS (
        |  SELECT user_id, ts, event_type FROM (
        |    SELECT user_id, ts, event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |    FROM lww)
        |  WHERE prev IS NULL OR prev <> event_type),
        |iv AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM comp),
        |s1 AS (
        |  SELECT user_id, event_type, true AS o_present FROM iv
        |  WHERE valid_from <= 1704844800
        |    AND (valid_to IS NULL OR valid_to > 1704844800)),
        |s2 AS (
        |  SELECT user_id, event_type, true AS n_present FROM iv
        |  WHERE valid_from <= 1706140800
        |    AND (valid_to IS NULL OR valid_to > 1706140800))
        |SELECT * FROM (
        |  SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
        |    CASE WHEN o_present IS NULL THEN 'insert'
        |         WHEN n_present IS NULL THEN 'delete'
        |         WHEN s1.event_type IS DISTINCT FROM s2.event_type
        |           THEN 'update' END AS op,
        |    s1.event_type AS old_event_type,
        |    s2.event_type AS new_event_type
        |  FROM s1 FULL OUTER JOIN s2
        |    ON s1.user_id IS NOT DISTINCT FROM s2.user_id)
        |WHERE op IS NOT NULL
        |ORDER BY user_id""".stripMargin,

    "dq1_expectations" ->
      """WITH t AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_nn,
        |    CAST(sum(CASE WHEN l_discount IS NOT NULL
        |             AND (l_discount < 0.0 OR l_discount > 0.1)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        |    CAST(sum(CASE WHEN l_quantity IS NOT NULL
        |             AND (l_quantity < 1.0 OR l_quantity > 25.0)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    CAST(sum(CASE WHEN l_returnflag IS NOT NULL
        |             AND l_returnflag NOT IN ('A','N','R')
        |        THEN 1 ELSE 0 END) AS BIGINT) AS v_rf,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_uq
        |  FROM lineitem),
        |fk AS (
        |  SELECT count(*) AS v
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
        |SELECT * FROM (
        |  SELECT 'not_null(l_orderkey)' AS rule, n AS checked,
        |    v_nn AS violations, v_nn = 0 AS pass FROM t
        |  UNION ALL SELECT 'in_range(l_discount,0.0,0.1)', n, v_disc,
        |    v_disc = 0 FROM t
        |  UNION ALL SELECT 'in_range(l_quantity,1.0,25.0)', n, v_qty,
        |    v_qty = 0 FROM t
        |  UNION ALL SELECT 'accepted_values(l_returnflag)', n, v_rf,
        |    v_rf = 0 FROM t
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', n, v_uq,
        |    v_uq = 0 FROM t
        |  UNION ALL SELECT 'foreign_key(l_orderkey)', n, fk.v,
        |    fk.v = 0 FROM t, fk)
        |ORDER BY rule""".stripMargin,

    "h1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |  floor(sum(l_extendedprice) * 100 + 0.5) / 100
        |    AS sum_base_price,
        |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |    / 100 AS sum_disc_price,
        |  floor(avg(l_quantity) * 100 + 0.5) / 100 AS avg_qty,
        |  floor(avg(l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "h3_shipping_priority" ->
      """SELECT l_orderkey,
        |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |    / 100 AS revenue,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate,
        |  o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "h5_local_supplier" ->
      """WITH nat AS (
        |  SELECT n_nationkey, n_name
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |SELECT nat.n_name,
        |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |    / 100 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nat ON s_nationkey = nat.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY nat.n_name ORDER BY nat.n_name""".stripMargin,

    "se5_rfm" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    1706745600 - max(CAST(floor(epoch(ts)) AS BIGINT))
        |      AS recency_s,
        |    count(*) AS frequency,
        |    floor(sum(value) * 10000 + 0.5) / 10000 AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |b AS (
        |  SELECT user_id, recency_s, frequency, monetary,
        |    CAST(ntile(4) OVER (ORDER BY recency_s, user_id) AS BIGINT)
        |      AS r_bucket,
        |    CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id)
        |      AS BIGINT) AS f_bucket,
        |    CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id)
        |      AS BIGINT) AS m_bucket
        |  FROM pu)
        |SELECT user_id, recency_s, frequency, monetary,
        |  r_bucket, f_bucket, m_bucket,
        |  CAST(r_bucket * 100 + f_bucket * 10 + m_bucket AS BIGINT)
        |    AS rfm_segment
        |FROM b ORDER BY user_id""".stripMargin,

    "se4_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         event_id, event_type
        |  FROM events),
        |p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_type
        |  FROM e),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n_trans
        |  FROM p WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |t AS (SELECT from_type, sum(n_trans) AS tt FROM c
        |      GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n_trans,
        |  CAST((c.n_trans * 1000000) // t.tt AS BIGINT) AS prob_ppm
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    // mirrors Spark's from_json(LongType) strictness: the json_type
    // guard keeps only numeric-integer JSON values, because DuckDB's
    // json_extract_string would also parse a QUOTED number ({"k":"12"}
    // → '12' → 12) where from_json(LongType) returns NULL; TRY_CAST
    // then nulls non-integral leftovers like from_json does
    "se3_props_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(CASE WHEN json_valid(props)
        |                   AND json_type(props, '$.k')
        |                     IN ('BIGINT', 'UBIGINT')
        |                  THEN json_extract_string(props, '$.k')
        |             END AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    // each event's 4 overlapping 1 h/15 min windows enumerated with a
    // lateral range — the same epoch-aligned starts Spark's window()
    // assigns map-side
    "se2_sliding_counts" ->
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, event_type,
        |         value
        |  FROM events),
        |w AS (
        |  SELECT ((ts // 900) - k) * 900 AS window_start, event_type,
        |         value
        |  FROM e, LATERAL unnest(range(0, 4)) u(k))
        |SELECT window_start, event_type, count(*) AS n_events,
        |  floor(sum(value) * 10000 + 0.5) / 10000 AS total_value
        |FROM w GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "k5_knn_ivf_trained" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
         |cells AS (SELECT vec_id, embedding, cell_id FROM a3 WHERE rn = 1),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
         |  FROM cells q JOIN cells c ON q.cell_id = c.cell_id AND q.vec_id != c.vec_id
         |  WHERE q.vec_id >= 5 AND q.vec_id < 10),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // train rounds see only vec_id < 250 (the build corpus); the final
    // assignment covers everything — appended vectors inherit the old
    // quantizer, exactly what appendToIvfIndex does
    "k10_ivf_append" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2, trainWhere = "e.vec_id < 250")},
         |cells AS (SELECT vec_id, embedding, cell_id FROM a3 WHERE rn = 1),
         |qcells AS (
         |  SELECT vec_id, embedding, cell_id FROM a3
         |  WHERE rn <= 2 AND vec_id >= 5 AND vec_id < 10),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
         |  FROM qcells q JOIN cells c ON q.cell_id = c.cell_id AND q.vec_id != c.vec_id),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "k6_knn_ivf_index" -> fullTrainIvfProbeOracle,

    // both ranking sides of the recall probe, mirrored: the IVF side at
    // nProbe=1 (rn <= 1 against the final c2 centroids — exactly what
    // ivfIndexKnn probes after buildIvfIndex k=8/iters=2) and the
    // brute-force side, then the per-query hit count as a left join
    "k12_recall_probe" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
         |cells AS (SELECT vec_id, embedding, cell_id FROM a3 WHERE rn = 1),
         |qcells AS (
         |  SELECT vec_id, embedding, cell_id FROM a3
         |  WHERE rn <= 1 AND vec_id >= 5 AND vec_id < 10),
         |iscored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
         |  FROM qcells q JOIN cells c ON q.cell_id = c.cell_id AND q.vec_id != c.vec_id),
         |ivf AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |    FROM iscored) WHERE rank <= 3),
         |bscored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id >= 5 AND q.vec_id < 10),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |    FROM bscored) WHERE rank <= 3)
         |SELECT e.query_id, count(*) AS n_want,
         |  count(i.neighbor_id) AS hits
         |FROM exact e LEFT JOIN ivf i
         |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    // the held-out twin of k12: the kmeans CTEs train + assign over
    // ONLY the indexed subset (vec_id < 450); the held-out queries get
    // their nearest-cell assignment against the FINAL centroids (c2)
    // in a separate ranking (they are not in a3), and both the IVF and
    // brute-force sides rank only indexed rows
    "k12b_recall_probe_heldout" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2,
             source = "(SELECT * FROM embeddings WHERE vec_id < 450)")},
         |cells AS (SELECT vec_id, embedding, cell_id FROM a3 WHERE rn = 1),
         |q AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id >= 450 AND vec_id < 455),
         |qprobe AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT q.vec_id, q.embedding, c.cell_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_cosine_similarity(q.embedding::DOUBLE[], c.centroid), 6) DESC,
         |        c.cell_id ASC) AS rn
         |    FROM q CROSS JOIN c2 c) WHERE rn <= 1),
         |iscored AS (
         |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(p.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
         |  FROM qprobe p JOIN cells c ON p.cell_id = c.cell_id AND p.vec_id != c.vec_id),
         |ivf AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |    FROM iscored) WHERE rank <= 3),
         |bscored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
         |  FROM q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE c.vec_id < 450),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |    FROM bscored) WHERE rank <= 3)
         |SELECT e.query_id, count(*) AS n_want,
         |  count(i.neighbor_id) AS hits
         |FROM exact e LEFT JOIN ivf i
         |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    // identical SQL to k6 BY DESIGN: the retrained index (stale build →
    // append → retrain at the k6 configuration → probe through the
    // swapped generation pointer) must answer exactly as a fresh k6
    // build over the full corpus — the lifecycle's correctness contract
    "k11_ivf_retrain" -> fullTrainIvfProbeOracle,

    // mirrors ProductQuantization: subvector explode, one L2 Lloyd's
    // round seeded with the first-8 ids (d² rounded to 6, ties to the
    // lowest code, means rounded to 6), ADC score = sum of per-subspace
    // partial dots in subspace order, cos = score / (||q||·recon_norm)
    "k7_knn_pq" ->
      s"""WITH $PqCtes,
        |scored AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    list_sum(list(list_inner_product(q.sv, cb.cent) ORDER BY q.sub)) AS score
        |  FROM psub q
        |  JOIN ncodes n ON q.sub = n.sub
        |  JOIN cb2 cb ON cb.sub = n.sub AND cb.code = n.code
        |  WHERE q.vec_id >= 5 AND q.vec_id < 10 AND n.vec_id != q.vec_id
        |  GROUP BY q.vec_id, n.vec_id),
        |fin AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(s.score / (qn.qn * e.rnorm), 6) AS cos
        |  FROM scored s JOIN qn ON qn.vec_id = s.query_id
        |  JOIN enc e ON e.vec_id = s.neighbor_id),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM fin)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // IVF-PQ: the kmeans CTEs give the coarse probe (queries rn<=2,
    // corpus rn=1 — exactly k6's shape), the PQ CTEs give codes and
    // reconstruction norms, and ADC scoring runs only on cell-matched
    // pairs
    "k8_knn_ivfpq" -> fullTrainIvfPqProbeOracle,

    // identical SQL to k8 BY DESIGN: the rebuilt index (stale build →
    // append → rebuild-from-source at the k8 configuration → probe
    // through the swapped generation pointer) must answer exactly as a
    // fresh k8 build over the full corpus — the PQ lifecycle's
    // correctness contract (the k11-vs-k6 pattern for code postings)
    "k13_ivfpq_rebuild" -> fullTrainIvfPqProbeOracle,

    // both sides of the PQ recall probe mirrored: the ADC side is k8's
    // scoring at nProbe=1 (qcell rn <= 1), the exact side is float
    // brute force, and the evidence is the per-query hit join — the
    // number a PQ deployment crons to catch coarse-miss AND
    // reconstruction drift together
    "k13b_ivfpq_recall" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
        |$PqCtes,
        |ccell AS (SELECT vec_id, cell_id FROM a3 WHERE rn = 1),
        |qcell AS (
        |  SELECT vec_id, cell_id FROM a3
        |  WHERE rn <= 1 AND vec_id >= 5 AND vec_id < 10),
        |scored AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    list_sum(list(list_inner_product(ps.sv, cb.cent) ORDER BY ps.sub)) AS score
        |  FROM qcell q
        |  JOIN ccell n ON n.cell_id = q.cell_id AND n.vec_id != q.vec_id
        |  JOIN psub ps ON ps.vec_id = q.vec_id
        |  JOIN ncodes nc ON nc.vec_id = n.vec_id AND nc.sub = ps.sub
        |  JOIN cb2 cb ON cb.sub = nc.sub AND cb.code = nc.code
        |  GROUP BY q.vec_id, n.vec_id),
        |fin AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(s.score / (qn.qn * e.rnorm), 6) AS cos
        |  FROM scored s JOIN qn ON qn.vec_id = s.query_id
        |  JOIN enc e ON e.vec_id = s.neighbor_id),
        |ivf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |    FROM fin) WHERE rank <= 3),
        |bscored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos
        |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id >= 5 AND q.vec_id < 10),
        |exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |    FROM bscored) WHERE rank <= 3)
        |SELECT e.query_id, count(*) AS n_want,
        |  count(i.neighbor_id) AS hits
        |FROM exact e LEFT JOIN ivf i
        |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
        |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    // residual IVF-PQ: kmeans CTEs give the coarse cells (c2 final
    // centroids, a3 assignments); residuals r = v − centroid(cell) are
    // subvector-exploded and run through the SAME seeded/rounded PQ
    // trajectory; reconstruction norms come from the (cell, sub, code)
    // combination table; scoring = query·centroid + residual ADC sum
    "k9_knn_ivfpq_residual" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
        |$PsubCte,
        |$QnCte,
        |ccell AS (SELECT vec_id, cell_id FROM a3 WHERE rn = 1),
        |qcell AS (
        |  SELECT vec_id, cell_id FROM a3
        |  WHERE rn <= 2 AND vec_id >= 5 AND vec_id < 10),
        |emb_d AS (
        |  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS e
        |  FROM embeddings),
        |rv AS (
        |  SELECT d.vec_id, cc.cell_id,
        |    list_transform(range(1, len(d.e) + 1),
        |                   i -> d.e[i] - c.centroid[i]) AS r
        |  FROM emb_d d JOIN ccell cc USING (vec_id)
        |  JOIN c2 c ON c.cell_id = cc.cell_id),
        |rsub AS (
        |  SELECT vec_id, u.s AS sub, r[u.s * 16 + 1 : u.s * 16 + 16] AS sv
        |  FROM rv, LATERAL unnest(range(0, 4)) u(s)),
        |rc0 AS (
        |  SELECT sub, CAST(vec_id AS INT) AS code, sv AS cent
        |  FROM rsub WHERE vec_id < 8),
        |ra1 AS (
        |  SELECT v.vec_id, v.sub, v.sv, c.code,
        |    row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
        |      round(list_inner_product(v.sv, v.sv)
        |        - 2 * list_inner_product(v.sv, c.cent)
        |        + list_inner_product(c.cent, c.cent), 6) ASC,
        |      c.code ASC) AS rn
        |  FROM rsub v JOIN rc0 c ON v.sub = c.sub),
        |rm1 AS (
        |  SELECT sub, code, pos, round(avg(x), 6) AS mn
        |  FROM (SELECT a.sub, a.code, u.i AS pos, a.sv[u.i + 1] AS x
        |        FROM ra1 a, LATERAL unnest(range(0, len(a.sv))) u(i)
        |        WHERE a.rn = 1)
        |  GROUP BY sub, code, pos),
        |rc1 AS (
        |  SELECT sub, code, list(mn ORDER BY pos) AS cent
        |  FROM rm1 GROUP BY sub, code),
        |ra2 AS (
        |  SELECT v.vec_id, v.sub, c.code,
        |    row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
        |      round(list_inner_product(v.sv, v.sv)
        |        - 2 * list_inner_product(v.sv, c.cent)
        |        + list_inner_product(c.cent, c.cent), 6) ASC,
        |      c.code ASC) AS rn
        |  FROM rsub v JOIN rc1 c ON v.sub = c.sub),
        |rcodes AS (SELECT vec_id, sub, code FROM ra2 WHERE rn = 1),
        |cslot AS (
        |  SELECT cc.cell_id, cb.sub, cb.code,
        |    list_inner_product(
        |      list_transform(range(1, 17),
        |                     i -> cc.centroid[cb.sub * 16 + i] + cb.cent[i]),
        |      list_transform(range(1, 17),
        |                     i -> cc.centroid[cb.sub * 16 + i] + cb.cent[i])
        |    ) AS rn2
        |  FROM c2 cc CROSS JOIN rc1 cb),
        |renc AS (
        |  SELECT rc.vec_id,
        |    sqrt(list_sum(list(cs.rn2 ORDER BY rc.sub))) AS rnorm
        |  FROM rcodes rc JOIN ccell cc ON cc.vec_id = rc.vec_id
        |  JOIN cslot cs ON cs.cell_id = cc.cell_id AND cs.sub = rc.sub
        |    AND cs.code = rc.code
        |  GROUP BY rc.vec_id),
        |qc AS (
        |  SELECT q.vec_id, q.cell_id,
        |    list_inner_product(d.e, c.centroid) AS qcdot
        |  FROM qcell q JOIN emb_d d ON d.vec_id = q.vec_id
        |  JOIN c2 c ON c.cell_id = q.cell_id),
        |scored AS (
        |  SELECT qc.vec_id AS query_id, n.vec_id AS neighbor_id, qc.qcdot,
        |    list_sum(list(list_inner_product(qs.sv, cb.cent) ORDER BY qs.sub)) AS radc
        |  FROM qc
        |  JOIN ccell n ON n.cell_id = qc.cell_id AND n.vec_id != qc.vec_id
        |  JOIN psub qs ON qs.vec_id = qc.vec_id
        |  JOIN rcodes nc ON nc.vec_id = n.vec_id AND nc.sub = qs.sub
        |  JOIN rc1 cb ON cb.sub = nc.sub AND cb.code = nc.code
        |  GROUP BY qc.vec_id, n.vec_id, qc.qcdot),
        |fin AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round((s.qcdot + s.radc) / (qn.qn * e.rnorm), 6) AS cos
        |  FROM scored s JOIN qn ON qn.vec_id = s.query_id
        |  JOIN renc e ON e.vec_id = s.neighbor_id),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM fin)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,

    "t1_langid" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
         |  FROM documents),
         |scores AS (
         |  SELECT doc_id, ${langScoreSql("en")}, ${langScoreSql("de")},
         |    ${langScoreSql("fr")}, ${langScoreSql("es")}
         |  FROM toks)
         |SELECT doc_id, score_en, score_de, score_fr, score_es,
         |  CASE WHEN score_en >= score_de AND score_en >= score_fr
         |         AND score_en >= score_es THEN 'en'
         |       WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
         |       WHEN score_fr >= score_es THEN 'fr'
         |       ELSE 'es' END AS pred_lang
         |FROM scores ORDER BY doc_id""".stripMargin,

    "t2_quality" ->
      s"""WITH $QualityCtes
         |SELECT doc_id, n_tokens, stopword_ratio, avg_word_len,
         |  quality_score
         |FROM qscore ORDER BY doc_id""".stripMargin,

    "cu1_curriculum_order" ->
      s"""WITH $QualityCtes,
         |cbk AS (
         |  SELECT doc_id, quality_score,
         |    CAST(ntile(3) OVER (ORDER BY quality_score DESC, doc_id)
         |      AS BIGINT) AS band
         |  FROM qscore),
         |cky AS (
         |  SELECT doc_id, quality_score, band,
         |    md5('ep0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         |  FROM cbk)
         |SELECT doc_id, quality_score, band,
         |  CAST(row_number() OVER (ORDER BY band, shuffle_key, doc_id)
         |    AS BIGINT) AS position
         |FROM cky ORDER BY doc_id""".stripMargin,

    "t3_tokens" ->
      """SELECT doc_id,
        |  len(string_split_regex(lower(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t4_fingerprint" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         string_split_regex(lower(substr(text, 1, 4096)), '\s+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, array_to_string(toks[i:i+3], ' ') AS shingle
        |  FROM base, LATERAL unnest(range(1, greatest(len(toks) - 3, 1) + 1)) t(i))
        |SELECT doc_id,
        |  min(substr(md5(shingle), 1, 16)) AS fp_min,
        |  max(substr(md5(shingle), 1, 16)) AS fp_max,
        |  count(*) AS n_grams
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t5_pii_redact" -> {
      val pats = graft.operators.TextAnalysis.PiiPatterns
      val counts = pats.map { case (kind, pat) =>
        s"len(regexp_extract_all(t, '$pat')) AS n_$kind"
      }.mkString(",\n    ")
      val redacted = pats.foldLeft("t") { case (c, (kind, pat)) =>
        s"regexp_replace($c, '$pat', '[${kind.toUpperCase}]', 'g')"
      }
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@' || source || '.com' ||
         |    ' ip 10.' || (doc_id % 256) || '.0.12' ||
         |    ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |    ' tel 800-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' alt bob@example.org' ELSE '' END AS t
         |  FROM documents),
         |red AS (
         |  SELECT doc_id,
         |    $counts,
         |    $redacted AS r
         |  FROM aug)
         |SELECT doc_id, n_email, n_ip, n_ssn, n_phone,
         |  substr(md5(r), 1, 16) AS red_hash
         |FROM red ORDER BY doc_id""".stripMargin
    },

    "t6_repetition" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         string_split_regex(lower(substr(text, 1, 4096)), '\s+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS shingle
        |  FROM base, LATERAL unnest(range(1, greatest(len(toks) - 1, 1) + 1)) t(i)),
        |per AS (SELECT doc_id, shingle, count(*) AS c FROM sh GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_grams,
        |  count(*) AS n_distinct,
        |  max(c) AS top_n,
        |  floor(max(c) / CAST(sum(c) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS top_ratio,
        |  floor((1.0 - count(*) / CAST(sum(c) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS dup_ratio
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t8_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    floor((list_sum(list_transform(toks, x -> len(x)))::DOUBLE
        |      / len(toks)) * 1000000 + 0.5) / 1000000 AS mean_word_len,
        |    floor((len(list_filter(toks, x -> contains(x, '#')
        |        OR contains(x, '...') OR contains(x, chr(8230))))::DOUBLE
        |      / len(toks)) * 1000000 + 0.5) / 1000000 AS symbol_ratio,
        |    floor((len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
        |      / len(toks)) * 1000000 + 0.5) / 1000000 AS alpha_ratio,
        |    CAST((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_stopwords
        |  FROM t)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
        |  n_stopwords,
        |  n_words >= 20 AND n_words <= 100000 AS rule_words,
        |  mean_word_len >= 3 AND mean_word_len <= 10 AS rule_mean_len,
        |  symbol_ratio <= 0.1 AS rule_symbols,
        |  alpha_ratio >= 0.8 AS rule_alpha,
        |  n_stopwords >= 2 AS rule_stopwords,
        |  (n_words >= 20 AND n_words <= 100000)
        |    AND (mean_word_len >= 3 AND mean_word_len <= 10)
        |    AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
        |    AND n_stopwords >= 2 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "d10_boilerplate" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(toks[i*5+1 : i*5+5], ' ') AS line
        |  FROM tk, LATERAL unnest(
        |    range(0, CAST(ceil(len(toks) / 5.0) AS INT))) t(i)),
        |cnt AS (SELECT line, count(*) AS n FROM lines GROUP BY line),
        |k AS (
        |  SELECT l.doc_id, l.pos, l.line, c.n > 2 AS boiler
        |  FROM lines l JOIN cnt c USING (line))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE boiler) AS BIGINT) AS n_boiler,
        |  coalesce(array_to_string(
        |    list(line ORDER BY pos) FILTER (WHERE NOT boiler), chr(10)), '')
        |    AS clean_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "p9_temperature_mixture" ->
      """WITH tot AS (
        |  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS t
        |  FROM documents GROUP BY source),
        |z AS (SELECT sum(pow(t, 0.5)) AS z FROM tot),
        |rates AS (
        |  SELECT source,
        |    least(1.0, CAST(20000 AS DOUBLE) * (pow(t, 0.5) / z.z) / t) AS kr
        |  FROM tot CROSS JOIN z),
        |r AS (
        |  SELECT d.doc_id, d.source, rates.kr,
        |    md5(CAST(d.doc_id AS VARCHAR)) AS dg
        |  FROM documents d JOIN rates USING (source))
        |SELECT doc_id, source,
        |  floor(kr * 1000000 + 0.5) / 1000000 AS keep_rate
        |FROM r
        |WHERE (  (strpos('0123456789abcdef', substr(dg, 1, 1)) - 1) * 4096
        |       + (strpos('0123456789abcdef', substr(dg, 2, 1)) - 1) * 256
        |       + (strpos('0123456789abcdef', substr(dg, 3, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substr(dg, 4, 1)) - 1)) / 65536.0
        |      < kr
        |ORDER BY doc_id""".stripMargin,

    "p5_mixture_sample" ->
      """WITH tot AS (
        |  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS t
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT d.doc_id, d.source,
        |    CASE d.source
        |      WHEN 'src0' THEN least(1.0, CAST(20000 AS DOUBLE) * 0.5
        |        / (SELECT t FROM tot WHERE source = 'src0'))
        |      WHEN 'src1' THEN least(1.0, CAST(20000 AS DOUBLE) * 0.3
        |        / (SELECT t FROM tot WHERE source = 'src1'))
        |      WHEN 'src2' THEN least(1.0, CAST(20000 AS DOUBLE) * 0.15
        |        / (SELECT t FROM tot WHERE source = 'src2'))
        |      WHEN 'src3' THEN least(1.0, CAST(20000 AS DOUBLE) * 0.05
        |        / (SELECT t FROM tot WHERE source = 'src3'))
        |      ELSE 0.0 END AS kr,
        |    md5(CAST(d.doc_id AS VARCHAR)) AS dg
        |  FROM documents d)
        |SELECT doc_id, source,
        |  floor(kr * 1000000 + 0.5) / 1000000 AS keep_rate
        |FROM r
        |WHERE (  (strpos('0123456789abcdef', substr(dg, 1, 1)) - 1) * 4096
        |       + (strpos('0123456789abcdef', substr(dg, 2, 1)) - 1) * 256
        |       + (strpos('0123456789abcdef', substr(dg, 3, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substr(dg, 4, 1)) - 1)) / 65536.0
        |      < kr
        |ORDER BY doc_id""".stripMargin,

    "p7_weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_chars,
        |    -ln((  (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
        |         + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
        |         + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
        |         + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
        |         + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
        |         + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
        |         + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
        |         + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1)
        |         + 1) / 4294967296.0)
        |      / (n_chars + 1.0) AS score
        |  FROM d)
        |SELECT doc_id, n_chars,
        |  floor(score * 1000000 + 0.5) / 1000000 AS sample_score
        |FROM (SELECT * FROM s ORDER BY score, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    "p8_weighted_stratum" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang, n_chars,
        |    -ln((  (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
        |         + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
        |         + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
        |         + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
        |         + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
        |         + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
        |         + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
        |         + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1)
        |         + 1) / 4294967296.0)
        |      / (n_chars + 1.0) AS score
        |  FROM d),
        |r AS (
        |  SELECT doc_id, lang, n_chars, score,
        |    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn
        |  FROM s)
        |SELECT doc_id, lang, n_chars,
        |  floor(score * 1000000 + 0.5) / 1000000 AS sample_score
        |FROM r WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,

    "se1_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         event_id, value
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id) > 1800
        |         THEN 1 ELSE 0 END AS st,
        |    event_id
        |  FROM e),
        |n AS (
        |  SELECT user_id, ts, value,
        |    SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM s)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
        |  max(ts) - min(ts) AS duration_s,
        |  floor(sum(value) * 10000 + 0.5) / 10000 AS total_value
        |FROM n GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    // earliest-completion funnel: sequential-min CTE chain — stage k's
    // min ts is constrained by stage k-1's and by the 1-day window
    // anchored at stage 1 (same recurrence Funnel.funnel folds per user)
    "fu1_funnel" ->
      s"""WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         event_type
        |  FROM events),
        |$FunnelStageCtes
        |SELECT s1.user_id, s1.s1_ts, s2.s2_ts, s3.s3_ts,
        |  CAST(1 + CASE WHEN s2.s2_ts IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN s3.s3_ts IS NOT NULL THEN 1 ELSE 0 END
        |    AS INT) AS funnel_depth
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,

    "co1_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, wk FROM e),
        |c AS (
        |  SELECT f.cohort_week, a.wk - f.cohort_week AS week_offset,
        |         count(*) AS n_users
        |  FROM a JOIN f ON a.user_id = f.user_id
        |  GROUP BY f.cohort_week, a.wk - f.cohort_week),
        |z AS (SELECT cohort_week, count(*) AS cohort_size FROM f
        |      GROUP BY cohort_week)
        |SELECT c.cohort_week, c.week_offset, c.n_users, z.cohort_size,
        |  CAST((c.n_users * 1000000) // z.cohort_size AS BIGINT)
        |    AS retention_ppm
        |FROM c JOIN z ON c.cohort_week = z.cohort_week
        |ORDER BY c.cohort_week, c.week_offset""".stripMargin,

    "pg1_pagerank" ->
      s"""WITH ${pagerankCtes(64, 5)}
        |SELECT node AS host_id, rank AS rank_scaled
        |FROM r5 ORDER BY node""".stripMargin,

    "pg7_components" ->
      s"""WITH RECURSIVE ${hostGraphCtes(64)},
        |ged AS (
        |  SELECT src AS id_a, dst AS id_b FROM pge
        |  UNION ALL SELECT dst AS id_a, src AS id_b FROM pge),
        |reach(id, cluster) AS (
        |  SELECT DISTINCT id_a, id_a FROM ged
        |  UNION
        |  SELECT e.id_a, r.cluster FROM ged e JOIN reach r ON r.id = e.id_b)
        |SELECT id AS host_id, min(cluster) AS cluster
        |FROM reach GROUP BY id ORDER BY host_id""".stripMargin,

    "pg6_hits" ->
      s"""WITH ${hostGraphCtes(64)},
        |h0 AS (SELECT node, CAST(${1000000L / 64} AS BIGINT) AS h
        |       FROM pgn),
        |${(1 to 3).map { i =>
          s"""ar$i AS (
            |  SELECT n.node, COALESCE(CAST(s.a AS BIGINT), 0) AS a
            |  FROM pgn n LEFT JOIN (
            |    SELECT e.dst AS node, SUM(h.h) AS a
            |    FROM pge e JOIN h${i - 1} h ON e.src = h.node
            |    GROUP BY e.dst) s ON n.node = s.node),
            |at$i AS (SELECT CAST(SUM(a) AS BIGINT) AS t FROM ar$i),
            |a$i AS (
            |  SELECT r.node, CAST(CASE WHEN x.t = 0 THEN 0
            |    ELSE (r.a * 1000000) // x.t END AS BIGINT) AS a
            |  FROM ar$i r CROSS JOIN at$i x),
            |hr$i AS (
            |  SELECT n.node, COALESCE(CAST(s.h AS BIGINT), 0) AS h
            |  FROM pgn n LEFT JOIN (
            |    SELECT e.src AS node, SUM(a.a) AS h
            |    FROM pge e JOIN a$i a ON e.dst = a.node
            |    GROUP BY e.src) s ON n.node = s.node),
            |ht$i AS (SELECT CAST(SUM(h) AS BIGINT) AS t FROM hr$i),
            |h$i AS (
            |  SELECT r.node, CAST(CASE WHEN x.t = 0 THEN 0
            |    ELSE (r.h * 1000000) // x.t END AS BIGINT) AS h
            |  FROM hr$i r CROSS JOIN ht$i x)""".stripMargin
        }.mkString(",\n")}
        |SELECT h3.node AS host_id, h3.h AS hub_scaled,
        |       a3.a AS auth_scaled
        |FROM h3 JOIN a3 ON h3.node = a3.node
        |ORDER BY host_id""".stripMargin,

    "pg5_personalized_ppr" ->
      s"""WITH ${hostGraphCtes(64)},
        |pgo AS (SELECT src, count(*) AS odeg FROM pge GROUP BY src),
        |q0 AS (SELECT node,
        |  CAST(CASE WHEN node = 0 THEN 1000000000 ELSE 0 END AS BIGINT)
        |    AS rank FROM pgn),
        |${(1 to 5).map { i =>
          s"""qg$i AS (
            |  SELECT COALESCE(SUM(rank), 0) AS dm
            |  FROM q${i - 1} r LEFT JOIN pgo o ON r.node = o.src
            |  WHERE o.src IS NULL),
            |qi$i AS (
            |  SELECT e.dst AS node, SUM(r.rank // o.odeg) AS inc
            |  FROM pge e
            |  JOIN q${i - 1} r ON e.src = r.node
            |  JOIN pgo o ON e.src = o.src
            |  GROUP BY e.dst),
            |q$i AS (
            |  SELECT n.node,
            |    CAST(CASE WHEN n.node = 0 THEN 150000000 ELSE 0 END
            |      + (85 * (COALESCE(i.inc, 0)
            |         + CASE WHEN n.node = 0 THEN d.dm ELSE 0 END)) // 100
            |      AS BIGINT) AS rank
            |  FROM pgn n
            |  LEFT JOIN qi$i i ON n.node = i.node
            |  CROSS JOIN qg$i d)""".stripMargin
        }.mkString(",\n")}
        |SELECT node AS host_id, rank AS rank_scaled
        |FROM q5 ORDER BY node""".stripMargin,

    "pg3_triangles" ->
      s"""WITH ${hostGraphCtes(64)},
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM pge),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e1.b = e2.a
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n3 AS (
        |  SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |SELECT node AS host_id, count(*) AS n_triangles
        |FROM n3 GROUP BY node ORDER BY node""".stripMargin,

    "pg4_bfs_hops" ->
      s"""WITH ${hostGraphCtes(64)},
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM pge),
        |adj AS (SELECT a AS u, b AS v FROM und
        |        UNION ALL SELECT b AS u, a AS v FROM und),
        |d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS hops),
        |${(1 to 4).map { i =>
          s"""d$i AS (
            |  SELECT node, min(hops) AS hops FROM (
            |    SELECT node, hops FROM d${i - 1}
            |    UNION ALL
            |    SELECT adj.v AS node, d${i - 1}.hops + 1 AS hops
            |    FROM adj JOIN d${i - 1} ON adj.u = d${i - 1}.node)
            |  GROUP BY node)""".stripMargin
        }.mkString(",\n")}
        |SELECT node AS host_id, hops FROM d4 ORDER BY node""".stripMargin,

    "pg2_centrality_gate" ->
      s"""WITH ${pagerankCtes(64, 5)},
        |dh AS (
        |  SELECT doc_id,
        |    ${digest8ModSql("'pgs:' || CAST(doc_id AS VARCHAR)", 64)}
        |      AS host_id
        |  FROM documents)
        |SELECT d.doc_id, d.host_id, r.rank AS rank_scaled,
        |  CAST(CASE WHEN r.rank > ${1000000000L / 64} THEN 1 ELSE 0 END
        |    AS INT) AS keep
        |FROM dh d JOIN r5 r ON d.host_id = r.node
        |ORDER BY d.doc_id""".stripMargin,

    // phrase occurrence = anchor (i - j) collecting votes from every
    // phrase offset j; the phrase string round-trips through the same
    // join-then-split as the Spark side so tokenization cannot drift
    "r5_phrase_query" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id AS query_id,
        |    string_split_regex(array_to_string(toks[11:13], ' '), '\s+')
        |      AS ph
        |  FROM tk WHERE doc_id % 89 = 0 AND len(toks) >= 13),
        |qt AS (
        |  SELECT query_id, CAST(j AS BIGINT) AS j,
        |         ph[CAST(j AS INT)] AS term
        |  FROM q, LATERAL unnest(range(1, len(ph) + 1)) u(j)),
        |ql AS (SELECT query_id, len(ph) AS m FROM q),
        |ps AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i,
        |         toks[CAST(i AS INT)] AS term
        |  FROM tk, LATERAL unnest(range(1, len(toks) + 1)) u(i)),
        |an AS (
        |  SELECT qt.query_id, p.doc_id, p.i - qt.j AS anchor,
        |         count(*) AS votes
        |  FROM ps p JOIN qt ON p.term = qt.term
        |  GROUP BY qt.query_id, p.doc_id, p.i - qt.j),
        |h AS (
        |  SELECT a.query_id, a.doc_id, count(*) AS n_hits,
        |         CAST(min(a.anchor) AS BIGINT) AS first_pos
        |  FROM an a JOIN ql ON a.query_id = ql.query_id
        |  WHERE a.votes = ql.m
        |  GROUP BY a.query_id, a.doc_id)
        |SELECT query_id, doc_id, n_hits, first_pos FROM h
        |ORDER BY query_id, doc_id""".stripMargin,

    // r6 = r5 through the positional index; identical query set, so
    // the oracle is r5's verbatim — the index path must reproduce
    // live phrase matching bit for bit
    "r6_phrase_index" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id AS query_id,
        |    string_split_regex(array_to_string(toks[11:13], ' '), '\s+')
        |      AS ph
        |  FROM tk WHERE doc_id % 89 = 0 AND len(toks) >= 13),
        |qt AS (
        |  SELECT query_id, CAST(j AS BIGINT) AS j,
        |         ph[CAST(j AS INT)] AS term
        |  FROM q, LATERAL unnest(range(1, len(ph) + 1)) u(j)),
        |ql AS (SELECT query_id, len(ph) AS m FROM q),
        |ps AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i,
        |         toks[CAST(i AS INT)] AS term
        |  FROM tk, LATERAL unnest(range(1, len(toks) + 1)) u(i)),
        |an AS (
        |  SELECT qt.query_id, p.doc_id, p.i - qt.j AS anchor,
        |         count(*) AS votes
        |  FROM ps p JOIN qt ON p.term = qt.term
        |  GROUP BY qt.query_id, p.doc_id, p.i - qt.j),
        |h AS (
        |  SELECT a.query_id, a.doc_id, count(*) AS n_hits,
        |         CAST(min(a.anchor) AS BIGINT) AS first_pos
        |  FROM an a JOIN ql ON a.query_id = ql.query_id
        |  WHERE a.votes = ql.m
        |  GROUP BY a.query_id, a.doc_id)
        |SELECT query_id, doc_id, n_hits, first_pos FROM h
        |ORDER BY query_id, doc_id""".stripMargin,

    "t9_c4_rules" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    range(0, CAST(ceil(len(toks) / 10.0) AS INT)), i ->
        |      array_to_string(toks[i*10+1 : i*10+10], ' ')
        |        || CASE WHEN i % 3 != 2 THEN '.' ELSE '' END),
        |    chr(10)) AS text
        |  FROM tk),
        |t AS (
        |  SELECT doc_id, text,
        |    list_transform(string_split(text, chr(10)), x -> trim(x)) AS ls
        |  FROM lined),
        |k AS (
        |  SELECT doc_id, text, ls,
        |    list_filter(ls, x -> regexp_matches(x, '[.!?"]$')
        |      AND len(string_split_regex(x, '\s+')) >= 5
        |      AND NOT contains(lower(x), 'javascript')) AS kept
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  array_to_string(kept, chr(10)) AS clean_text,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(text, '{') AS has_brace,
        |  len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(text, '{') AS keep
        |FROM k ORDER BY doc_id""".stripMargin,

    "p1_sequence_packing" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens,
        |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |packed AS (
        |  SELECT shard, rn, doc_id, n_tokens, n_tokens AS acc,
        |         CAST(0 AS BIGINT) AS pack_idx, CAST(1 AS BIGINT) AS pack_pos
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN d.n_tokens
        |         ELSE p.acc + d.n_tokens END,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN p.pack_idx + 1
        |         ELSE p.pack_idx END,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN CAST(1 AS BIGINT)
        |         ELSE p.pack_pos + 1 END
        |  FROM docs d JOIN packed p ON d.shard = p.shard AND d.rn = p.rn + 1)
        |SELECT doc_id, shard, pack_idx, pack_pos, n_tokens
        |FROM packed ORDER BY doc_id""".stripMargin,

    "p2_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 <
        |  CASE lang WHEN 'en' THEN 8 WHEN 'de' THEN 4 WHEN 'fr' THEN 12
        |       WHEN 'zh' THEN 2 ELSE 16 END
        |ORDER BY doc_id""".stripMargin,

    "g1_rate_functions" ->
      s"""WITH $SeriesCte
         |SELECT name, ts,
         |  round(value - lag(value) OVER w, 4) AS deriv,
         |  CASE WHEN value - lag(value) OVER w >= 0
         |       THEN round(value - lag(value) OVER w, 4) END AS nn_deriv,
         |  CASE WHEN value - lag(value) OVER w >= 0
         |       THEN round((value - lag(value) OVER w)
         |                  / (ts - lag(ts) OVER w) * 1e6, 4) END AS per_sec_u
         |FROM base WINDOW w AS (PARTITION BY name ORDER BY ts)
         |ORDER BY name, ts""".stripMargin,

    "g15_anomaly_flags" ->
      s"""WITH $SeriesCte,
         |st AS (
         |  SELECT name, avg(value) AS mu, stddev_pop(value) AS sd
         |  FROM base WHERE value IS NOT NULL GROUP BY name)
         |SELECT b.name, b.ts, b.value,
         |  round((b.value - st.mu) / st.sd, 4) AS z,
         |  CAST(CASE WHEN abs(round((b.value - st.mu) / st.sd, 4)) > 2.0
         |       THEN 1 ELSE 0 END AS INT) AS is_anomaly
         |FROM base b JOIN st ON b.name = st.name
         |WHERE b.value IS NOT NULL AND st.sd > 0
         |ORDER BY b.name, b.ts""".stripMargin,

    "g2_window_functions" ->
      s"""WITH $SeriesCte
         |SELECT name, ts,
         |  round(avg(value) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
         |        4) AS mavg,
         |  CASE WHEN value IS NOT NULL THEN
         |    round(sum(value) OVER
         |      (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         |  END AS integ,
         |  round(last_value(value IGNORE NULLS) OVER
         |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
         |FROM base WINDOW w AS (PARTITION BY name ORDER BY ts)
         |ORDER BY name, ts""".stripMargin,

    "g3_summarize_combine" ->
      s"""WITH $SeriesCte,
         |summ AS (
         |  SELECT name, (ts // 7200) * 7200 AS ts, sum(value) AS value
         |  FROM base WHERE name LIKE 'ev.click.%' GROUP BY 1, 2)
         |SELECT ts, round(sum(value), 4) AS sum_v,
         |  round(avg(value), 4) AS avg_v,
         |  count(value) AS n_series
         |FROM summ GROUP BY ts ORDER BY ts""".stripMargin,

    "g4_highest_series" ->
      s"""WITH $SeriesCte,
         |ranked AS (
         |  SELECT name FROM (
         |    SELECT name, max(value) AS m FROM base GROUP BY name)
         |  ORDER BY m DESC NULLS LAST, name ASC LIMIT 3)
         |SELECT split_part(b.name, '.', 2) || '.' || split_part(b.name, '.', 3)
         |    AS name,
         |  b.ts AS ts, round(b.value, 4) AS value
         |FROM base b JOIN ranked r ON b.name = r.name
         |ORDER BY name, ts""".stripMargin,

    "d9_duplicate_spans" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         string_split_regex(lower(substr(text, 1, 4096)), '\s+') AS toks
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         md5(array_to_string(toks[i:i+4], ' ')) AS gram
        |  FROM base, LATERAL unnest(range(1, greatest(len(toks) - 4, 1) + 1)) t(i)),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
        |marked AS (
        |  SELECT g.doc_id, g.pos FROM grams g
        |  JOIN dup USING (gram)),
        |brk AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 5
        |         THEN 1 ELSE 0 END AS b
        |  FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM brk)
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 5 AS BIGINT) AS span_end,
        |  count(*) AS n_windows
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // d9's chain + per-token positions; kept = tokens outside every span
    "d13_span_removal" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         string_split_regex(lower(substr(text, 1, 4096)), '\s+') AS toks
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         md5(array_to_string(toks[i:i+4], ' ')) AS gram
        |  FROM base, LATERAL unnest(range(1, greatest(len(toks) - 4, 1) + 1)) t(i)),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
        |marked AS (
        |  SELECT g.doc_id, g.pos FROM grams g
        |  JOIN dup USING (gram)),
        |brk AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 5
        |         THEN 1 ELSE 0 END AS b
        |  FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM brk),
        |spans AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + 5 AS e
        |  FROM isl GROUP BY doc_id, island),
        |ptoks AS (
        |  SELECT doc_id, u.i - 1 AS pos, toks[u.i] AS tok
        |  FROM base, LATERAL unnest(range(1, len(toks) + 1)) u(i)),
        |kept AS (
        |  SELECT p.doc_id, p.pos, p.tok FROM ptoks p
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = p.doc_id AND p.pos >= s.s AND p.pos < s.e))
        |SELECT b.doc_id,
        |  coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS clean_text,
        |  CAST(len(b.toks) - count(k.pos) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN kept k USING (doc_id)
        |GROUP BY b.doc_id, len(b.toks)
        |ORDER BY doc_id""".stripMargin,

    "d15_cross_corpus_dedup" ->
      s"""WITH $ShinglesCte,
         |$SigCte,
         |banded AS (${(0 until 8).map(i =>
              s"SELECT doc_id, $i AS band_idx, h$i AS band_val FROM sig")
              .mkString(" UNION ALL ")}),
         |nb AS (
         |  SELECT b.doc_id AS new_id, band_idx, band_val
         |  FROM banded b JOIN documents d USING (doc_id)
         |  WHERE d.source = 'src0'),
         |rb AS (
         |  SELECT b.doc_id AS ref_id, band_idx, band_val
         |  FROM banded b JOIN documents d USING (doc_id)
         |  WHERE d.source <> 'src0'),
         |cpairs AS (
         |  SELECT DISTINCT new_id, ref_id FROM nb JOIN rb
         |  USING (band_idx, band_val)),
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
         |inter AS (
         |  SELECT p.new_id, p.ref_id, count(*) AS i
         |  FROM cpairs p
         |  JOIN dsh a ON a.doc_id = p.new_id
         |  JOIN dsh b ON b.doc_id = p.ref_id AND b.shingle = a.shingle
         |  GROUP BY 1, 2)
         |SELECT p.new_id, p.ref_id,
         |  round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6)
         |    AS jaccard
         |FROM cpairs p
         |LEFT JOIN inter i USING (new_id, ref_id)
         |JOIN sizes sa ON sa.doc_id = p.new_id
         |JOIN sizes sb ON sb.doc_id = p.ref_id
         |WHERE round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6)
         |  >= 0.5
         |ORDER BY new_id, ref_id""".stripMargin,

    "d14_prototypes" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)},
         |sel AS (SELECT vec_id, cell_id, ccos FROM a3 WHERE rn = 1),
         |rk AS (
         |  SELECT vec_id, cell_id, ccos,
         |    CAST(row_number() OVER (PARTITION BY cell_id
         |      ORDER BY ccos DESC, vec_id) AS BIGINT) AS proto_rank,
         |    count(*) OVER (PARTITION BY cell_id) AS n_cell
         |  FROM sel)
         |SELECT vec_id, cell_id, ccos, proto_rank, n_cell,
         |  proto_rank > ceil(0.3 * n_cell) AS keep
         |FROM rk ORDER BY vec_id""".stripMargin,

    "r1_bm25_topk" -> Bm25OracleSql,

    "r2_bm25_index_topk" -> Bm25OracleSql,

    "d17_cluster_representatives" ->
      s"""WITH RECURSIVE $ShinglesCte,
         |$SigCte,
         |$BandedPairsCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS i
         |  FROM pairs p
         |  JOIN dsh a ON a.doc_id = p.id_a
         |  JOIN dsh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT p.id_a, p.id_b
         |  FROM pairs p
         |  LEFT JOIN inter i USING (id_a, id_b)
         |  JOIN sizes sa ON sa.doc_id = p.id_a
         |  JOIN sizes sb ON sb.doc_id = p.id_b
         |  WHERE round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) >= 0.5),
         |edges AS (
         |  SELECT id_a, id_b FROM dup
         |  UNION ALL SELECT id_b, id_a FROM dup),
         |reach(id, cluster) AS (
         |  SELECT DISTINCT id_a, id_a FROM edges
         |  UNION
         |  SELECT e.id_a, r.cluster FROM edges e JOIN reach r ON r.id = e.id_b),
         |comp AS (SELECT id, min(cluster) AS cluster FROM reach GROUP BY id),
         |qt AS (
         |  SELECT doc_id,
         |    string_split_regex(lower(text), '\\s+') AS toks,
         |    len(regexp_replace(text, '\\s+', '', 'g')) AS alpha_len
         |  FROM documents),
         |qc AS (
         |  SELECT doc_id, len(toks) AS n_tokens, alpha_len,
         |    ${graft.operators.TextAnalysis.StopwordMarkers.values.flatten.toSeq.distinct
              .map(w => s"len(list_filter(toks, x -> x = '$w'))").mkString(" + ")} AS stop_cnt
         |  FROM qt),
         |qs AS (
         |  SELECT doc_id,
         |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
         |      (1.0 - stop_cnt / CAST(n_tokens AS DOUBLE)) * 0.3 +
         |      least(alpha_len / CAST(n_tokens AS DOUBLE) / 8.0, 1.0) * 0.3)
         |      * 1000000 + 0.5) / 1000000 AS quality_score
         |  FROM qc),
         |scd AS (
         |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster,
         |    q.quality_score
         |  FROM documents d
         |  LEFT JOIN comp c ON c.id = d.doc_id
         |  JOIN qs q USING (doc_id)),
         |repd AS (
         |  SELECT cluster, doc_id AS rep_id FROM (
         |    SELECT cluster, doc_id,
         |      row_number() OVER (PARTITION BY cluster
         |        ORDER BY quality_score DESC, doc_id) AS rn
         |    FROM scd) WHERE rn = 1)
         |SELECT s.doc_id, s.cluster, s.quality_score, r.rep_id,
         |  s.doc_id = r.rep_id AS keep
         |FROM scd s JOIN repd r USING (cluster) ORDER BY s.doc_id""".stripMargin,

    "v1_tfidf_vectors" ->
      s"""WITH ${tfidfCtes()}
        |SELECT doc_id, CAST(slot AS BIGINT) AS slot, weight
        |FROM wv ORDER BY doc_id, slot""".stripMargin,

    "r3_tfidf_knn" ->
      s"""WITH $TfidfKnnCtes
        |SELECT query_id, doc_id, cos, rk FROM rkv
        |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,

    "r4_hybrid_rrf" ->
      s"""WITH $Bm25Ctes,
        |$TfidfKnnCtes,
        |lists AS (
        |  SELECT query_id, doc_id, rk FROM rk WHERE rk <= 10
        |  UNION ALL
        |  SELECT query_id, doc_id, rk FROM rkv WHERE rk <= 10),
        |fused AS (
        |  SELECT query_id, doc_id, sum(1000000000 // (60 + rk)) AS s
        |  FROM lists GROUP BY 1, 2),
        |rrf AS (
        |  SELECT query_id, doc_id, s / 1e9 AS rrf_score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY s DESC, doc_id) AS BIGINT) AS rk
        |  FROM fused)
        |SELECT query_id, doc_id, rrf_score, rk FROM rrf
        |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,

    "cl1_nb_classify" ->
      s"""WITH ${nbOracleCtes("doc_id % 5 = 0")},
        |best AS (
        |  SELECT doc_id, label, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, label) AS rn
        |  FROM gsc)
        |SELECT doc_id, label, score FROM best
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "cl2_nb_margin" ->
      s"""WITH ${nbOracleCtes("doc_id % 5 = 0")},
        |rkc AS (
        |  SELECT doc_id, label, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, label) AS rn
        |  FROM gsc)
        |SELECT doc_id,
        |  max(CASE WHEN rn = 1 THEN label END) AS top_label,
        |  max(CASE WHEN rn = 2 THEN label END) AS second_label,
        |  round(max(CASE WHEN rn = 1 THEN score END)
        |    - max(CASE WHEN rn = 2 THEN score END), 6) AS margin
        |FROM rkc WHERE rn <= 2
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,



    "x1_curation_pipeline" ->
      raw"""WITH RECURSIVE uk AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |      row_number() OVER (
        |        PARTITION BY lower(source || '.example.com') || '/d/'
        |          || CAST(doc_id % 200 AS VARCHAR)
        |        ORDER BY n_chars DESC, doc_id ASC) AS rn
        |    FROM documents)
        |  WHERE rn = 1),
        |gm AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM uk),
        |gq AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    floor((list_sum(list_transform(toks, x -> len(x)))::DOUBLE
        |      / len(toks)) * 1000000 + 0.5) / 1000000 AS mean_word_len,
        |    floor((len(list_filter(toks, x -> contains(x, '#')
        |        OR contains(x, '...') OR contains(x, chr(8230))))::DOUBLE
        |      / len(toks)) * 1000000 + 0.5) / 1000000 AS symbol_ratio,
        |    floor((len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
        |      / len(toks)) * 1000000 + 0.5) / 1000000 AS alpha_ratio
        |  FROM gm),
        |kept AS (
        |  SELECT uk.doc_id, uk.text FROM uk JOIN gq USING (doc_id)
        |  WHERE gq.n_words >= 20 AND gq.n_words <= 100000
        |    AND gq.mean_word_len >= 3 AND gq.mean_word_len <= 10
        |    AND gq.symbol_ratio <= 0.1 AND gq.alpha_ratio >= 0.8),
        |${ShinglesCte.replace("FROM documents", "FROM kept")},
        |$SigCte,
        |$BandedPairsCte,
        |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
        |inter AS (
        |  SELECT p.id_a, p.id_b, count(*) AS i
        |  FROM pairs p
        |  JOIN dsh a ON a.doc_id = p.id_a
        |  JOIN dsh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
        |  GROUP BY 1, 2),
        |dup AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |  LEFT JOIN inter i USING (id_a, id_b)
        |  JOIN sizes sa ON sa.doc_id = p.id_a
        |  JOIN sizes sb ON sb.doc_id = p.id_b
        |  WHERE round(coalesce(i.i, 0) / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) >= 0.8),
        |edges AS (
        |  SELECT id_a, id_b FROM dup
        |  UNION ALL SELECT id_b, id_a FROM dup),
        |reach(id, cluster) AS (
        |  SELECT DISTINCT id_a, id_a FROM edges
        |  UNION
        |  SELECT e.id_a, r.cluster FROM edges e JOIN reach r ON r.id = e.id_b),
        |comp AS (SELECT id, min(cluster) AS cluster FROM reach GROUP BY id),
        |assigned AS (
        |  SELECT k.doc_id, coalesce(c.cluster, k.doc_id) AS cluster
        |  FROM kept k LEFT JOIN comp c ON c.id = k.doc_id)
        |SELECT doc_id, cluster,
        |  CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) IN ('c', 'd')
        |         THEN 'val'
        |       WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) IN ('e', 'f')
        |         THEN 'test'
        |       ELSE 'train' END AS split
        |FROM assigned ORDER BY doc_id""".stripMargin,

    "x2_embedding_pipeline" -> x2OracleSql(kSql = "8", iters = 2),

    // same CTE chain at the k≈√N configuration, k derived inside the
    // oracle from the same embeddings count the Spark side uses (one
    // round — the d8b convention for plan-time-derived cell counts)
    "x2_sqrtn" -> x2OracleSql(kSql = sqrtNkSql(), iters = 1),

    "x5_pretrain_prep_pipeline" ->
      raw"""WITH RECURSIVE ${nbOracleCtes("TRUE")},
        |rkc AS (
        |  SELECT doc_id, label, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, label) AS rn
        |  FROM gsc),
        |mar AS (
        |  SELECT doc_id,
        |    round(max(CASE WHEN rn = 1 THEN score END)
        |      - max(CASE WHEN rn = 2 THEN score END), 6) AS margin
        |  FROM rkc WHERE rn <= 2 GROUP BY doc_id),
        |routed AS (
        |  SELECT d.doc_id, d.source, d.n_chars, d.text
        |  FROM documents d JOIN mar USING (doc_id) WHERE mar.margin > 0),
        |tot AS (
        |  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS t
        |  FROM routed GROUP BY source),
        |z AS (SELECT sum(pow(t, 0.5)) AS z FROM tot),
        |rates AS (
        |  SELECT source,
        |    least(1.0, CAST(500000 AS DOUBLE) * (pow(t, 0.5) / z.z) / t) AS kr
        |  FROM tot CROSS JOIN z),
        |mixed AS MATERIALIZED (
        |  SELECT doc_id, text FROM (
        |    SELECT d.doc_id, d.text, rates.kr,
        |      md5(CAST(d.doc_id AS VARCHAR)) AS dg
        |    FROM routed d JOIN rates USING (source))
        |  WHERE (  (strpos('0123456789abcdef', substr(dg, 1, 1)) - 1) * 4096
        |         + (strpos('0123456789abcdef', substr(dg, 2, 1)) - 1) * 256
        |         + (strpos('0123456789abcdef', substr(dg, 3, 1)) - 1) * 16
        |         + (strpos('0123456789abcdef', substr(dg, 4, 1)) - 1)) / 65536.0
        |        < kr),
        |t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM mixed),
        |sx AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(array_to_string(toks, '')) = 0 THEN 0
        |         ELSE len(toks) END AS n,
        |    unnest(range(0, greatest(len(toks), 1), 64)) AS tok_start
        |  FROM t),
        |ch AS (
        |  SELECT doc_id,
        |    CAST(tok_start // 64 AS BIGINT) AS chunk_idx,
        |    CAST(len(toks[tok_start + 1 : least(tok_start + 128, n)])
        |      AS BIGINT) AS n_tokens,
        |    md5(array_to_string(
        |      toks[tok_start + 1 : least(tok_start + 128, n)], ' '))
        |      AS chunk_hash
        |  FROM sx WHERE tok_start < n),
        |uq AS (
        |  SELECT doc_id, chunk_idx, n_tokens,
        |    row_number() OVER (PARTITION BY chunk_hash
        |      ORDER BY doc_id, chunk_idx) AS dup_rn
        |  FROM ch),
        |cid AS (
        |  SELECT doc_id * 1048576 + chunk_idx AS chunk_id, n_tokens
        |  FROM uq WHERE dup_rn = 1),
        |docs2 AS (
        |  SELECT chunk_id, chunk_id % 8 AS shard, n_tokens,
        |    row_number() OVER (PARTITION BY chunk_id % 8
        |      ORDER BY chunk_id) AS rn
        |  FROM cid),
        |packed AS (
        |  SELECT shard, rn, chunk_id, n_tokens, n_tokens AS acc,
        |         CAST(0 AS BIGINT) AS pack_idx, CAST(1 AS BIGINT) AS pack_pos
        |  FROM docs2 WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.chunk_id, d.n_tokens,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN d.n_tokens
        |         ELSE p.acc + d.n_tokens END,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN p.pack_idx + 1
        |         ELSE p.pack_idx END,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN CAST(1 AS BIGINT)
        |         ELSE p.pack_pos + 1 END
        |  FROM docs2 d JOIN packed p ON d.shard = p.shard AND d.rn = p.rn + 1),
        |${bpeOracleCtes(8, source = "mixed")},
        |nm AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_merges FROM (
        |    ${(1 to 8).map(i => s"SELECT 1 FROM t$i WHERE rn = 1")
                .mkString(" UNION ALL ")}))
        |SELECT chunk_id, shard, pack_idx, pack_pos, n_tokens, nm.n_merges
        |FROM packed CROSS JOIN nm ORDER BY chunk_id""".stripMargin,

    "x3_text_semantic_pipeline" ->
      s"""WITH ${tfidfCtes()},
        |dvg AS (
        |  SELECT d.doc_id, s.slot, coalesce(w.weight, 0.0) AS wgt
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS slot) s
        |  LEFT JOIN wv w ON w.doc_id = d.doc_id AND w.slot = s.slot),
        |temb AS (
        |  SELECT doc_id AS vec_id, list(wgt ORDER BY slot) AS embedding
        |  FROM dvg GROUP BY doc_id),
        |${kmeansOracleCtes(k = 8, iters = 3, source = "temb")},
        |sel3 AS (SELECT vec_id, cell_id, ccos FROM a4 WHERE rn = 1),
        |rk3 AS (
        |  SELECT vec_id, cell_id, ccos,
        |    CAST(row_number() OVER (PARTITION BY cell_id
        |      ORDER BY ccos DESC, vec_id) AS BIGINT) AS proto_rank,
        |    count(*) OVER (PARTITION BY cell_id) AS n_cell
        |  FROM sel3)
        |SELECT vec_id AS doc_id, cell_id, ccos, proto_rank, n_cell,
        |  proto_rank > ceil(0.3 * n_cell) AS keep
        |FROM rk3 ORDER BY doc_id""".stripMargin,

    "lr1_logreg_gate" ->
      s"""WITH ${tfidfCtes(16)},
        |${lrOracleCtes(4)}
        |SELECT d.doc_id,
        |  round(1 / (1 + exp(-(coalesce(mg.m6, 0) / 1e6 + bs.b))), 6)
        |    AS score,
        |  round(1 / (1 + exp(-(coalesce(mg.m6, 0) / 1e6 + bs.b))), 6)
        |    >= 0.5 AS predicted
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
        |LEFT JOIN (SELECT wv.doc_id,
        |             sum(CAST(floor(wv.weight * w.w * 1e6 + 0.5)
        |               AS BIGINT)) AS m6
        |           FROM wv JOIN lw4 w USING (slot) GROUP BY 1) mg
        |  USING (doc_id)
        |CROSS JOIN (SELECT w AS b FROM lw4 WHERE slot = -1) bs
        |ORDER BY d.doc_id""".stripMargin,

    "ev1_auc_roc" ->
      s"""WITH ${tfidfCtes(256)},
        |${lrOracleCtes(8, 256, eta = 1.0)},
        |${lrScoredCte(8)},
        |eg AS (SELECT score, count(*) AS n, sum(y) AS pos
        |       FROM sc GROUP BY score),
        |ec AS (SELECT n, pos,
        |         coalesce(sum(n) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS below
        |       FROM eg),
        |et AS (SELECT sum(pos * (below + (n + 1) / 2.0)) AS prs,
        |         sum(pos) AS p, sum(n - pos) AS nn
        |       FROM ec)
        |SELECT CASE WHEN p > 0 AND nn > 0
        |    THEN round((prs - p * (p + 1) / 2.0) / (p * nn), 6) END
        |    AS auc,
        |  CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
        |FROM et""".stripMargin,

    "ev2_calibration" ->
      s"""WITH ${tfidfCtes(256)},
        |${lrOracleCtes(8, 256, eta = 1.0)},
        |${lrScoredCte(8)}
        |SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(sum(CAST(floor(score * 1e6 + 0.5) AS BIGINT)) / 1e6
        |    / count(*), 6) AS mean_score,
        |  round(sum(y) / count(*), 6) AS pos_rate
        |FROM sc GROUP BY 1 ORDER BY bucket""".stripMargin,

    "ev3_confusion" ->
      s"""WITH ${tfidfCtes(256)},
        |${lrOracleCtes(8, 256, eta = 1.0)},
        |${lrScoredCte(8)},
        |ct AS (SELECT
        |    CAST(sum(CASE WHEN score >= 0.5 AND y = 1.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN score >= 0.5 AND y <> 1.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN score < 0.5 AND y <> 1.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN score < 0.5 AND y = 1.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM sc),
        |cf AS (SELECT tp, fp, tn, fn,
        |    CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 6) END
        |      AS "precision",
        |    CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 6) END
        |      AS recall
        |  FROM ct)
        |SELECT tp, fp, tn, fn, "precision", recall,
        |  CASE WHEN "precision" IS NOT NULL AND recall IS NOT NULL
        |      AND "precision" + recall > 0
        |    THEN round(2.0 * "precision" * recall /
        |      ("precision" + recall), 6) END AS f1,
        |  CASE WHEN tp + fp + tn + fn > 0
        |    THEN round((tp + tn) / (tp + fp + tn + fn), 6) END
        |    AS accuracy
        |FROM cf""".stripMargin,

    "ev5_auc_by_source" ->
      s"""WITH ${tfidfCtes(256)},
        |${lrOracleCtes(8, 256, eta = 1.0)},
        |${lrScoredCte(8)},
        |eg AS (SELECT source, score, count(*) AS n, sum(y) AS pos
        |       FROM sc GROUP BY 1, 2),
        |ec AS (SELECT source, n, pos,
        |         coalesce(sum(n) OVER (PARTITION BY source
        |           ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS below
        |       FROM eg),
        |et AS (SELECT source,
        |         sum(pos * (below + (n + 1) / 2.0)) AS prs,
        |         sum(pos) AS p, sum(n - pos) AS nn
        |       FROM ec GROUP BY 1)
        |SELECT source, CASE WHEN p > 0 AND nn > 0
        |    THEN round((prs - p * (p + 1) / 2.0) / (p * nn), 6) END
        |    AS auc,
        |  CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
        |FROM et ORDER BY source""".stripMargin,

    "ev4_pr_curve" ->
      s"""WITH ${tfidfCtes(256)},
        |${lrOracleCtes(8, 256, eta = 1.0)},
        |${lrScoredCte(8)},
        |pg AS (SELECT score AS threshold, count(*) AS n, sum(y) AS pos
        |       FROM sc GROUP BY 1),
        |pc AS (SELECT threshold,
        |    CAST(sum(pos) OVER (ORDER BY threshold DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS tp,
        |    CAST(sum(n - pos) OVER (ORDER BY threshold DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS fp,
        |    CAST(sum(pos) OVER ()
        |      - sum(pos) OVER (ORDER BY threshold DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS fn
        |  FROM pg),
        |pf AS (SELECT threshold, tp, fp, fn,
        |    CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 6) END
        |      AS "precision",
        |    CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 6) END
        |      AS recall
        |  FROM pc)
        |SELECT threshold, tp, fp, fn, "precision", recall,
        |  CASE WHEN "precision" IS NOT NULL AND recall IS NOT NULL
        |      AND "precision" + recall > 0
        |    THEN round(2.0 * "precision" * recall /
        |      ("precision" + recall), 6) END AS f1
        |FROM pf ORDER BY threshold DESC""".stripMargin,

    "ds1_dsir_weights" -> s"WITH ${dsirCtes(256)}\n$DsirWeightsSelect",

    "ds2_dsir_resample" ->
      s"""WITH ${dsirCtes(256)},
        |$DsirResampleCtes
        |SELECT doc_id, logratio,
        |  floor(score * 1000000 + 0.5) / 1000000 AS sample_score
        |FROM (SELECT * FROM dsel ORDER BY score, doc_id LIMIT 150)
        |ORDER BY doc_id""".stripMargin,

    "pr2_corpus_diff" ->
      """WITH bsnap AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, source, text FROM documents
        |  WHERE doc_id % 17 = 0),
        |ka AS (SELECT doc_id, source AS ga, md5(text) AS ha
        |       FROM documents),
        |kb AS (SELECT doc_id, source AS gb, md5(text) AS hb FROM bsnap),
        |j AS (
        |  SELECT coalesce(kb.gb, ka.ga) AS grp,
        |    CASE WHEN ka.ha IS NULL THEN 'added'
        |         WHEN kb.hb IS NULL THEN 'removed'
        |         WHEN ka.ha <> kb.hb THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM ka FULL OUTER JOIN kb USING (doc_id))
        |SELECT grp, status, count(*) AS n FROM j
        |GROUP BY 1, 2 ORDER BY grp, status""".stripMargin,

    "x4_chunk_dedup_pack" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |sx AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(array_to_string(toks, '')) = 0 THEN 0
        |         ELSE len(toks) END AS n,
        |    unnest(range(0, greatest(len(toks), 1), 64)) AS tok_start
        |  FROM t),
        |ch AS (
        |  SELECT doc_id,
        |    CAST(tok_start // 64 AS BIGINT) AS chunk_idx,
        |    CAST(len(toks[tok_start + 1 : least(tok_start + 128, n)])
        |      AS BIGINT) AS n_tokens,
        |    md5(array_to_string(
        |      toks[tok_start + 1 : least(tok_start + 128, n)], ' '))
        |      AS chunk_hash
        |  FROM sx WHERE tok_start < n),
        |uq AS (
        |  SELECT doc_id, chunk_idx, n_tokens,
        |    row_number() OVER (PARTITION BY chunk_hash
        |      ORDER BY doc_id, chunk_idx) AS dup_rn
        |  FROM ch),
        |cid AS (
        |  SELECT doc_id * 1048576 + chunk_idx AS chunk_id, n_tokens
        |  FROM uq WHERE dup_rn = 1),
        |docs2 AS (
        |  SELECT chunk_id, chunk_id % 8 AS shard, n_tokens,
        |    row_number() OVER (PARTITION BY chunk_id % 8
        |      ORDER BY chunk_id) AS rn
        |  FROM cid),
        |packed AS (
        |  SELECT shard, rn, chunk_id, n_tokens, n_tokens AS acc,
        |         CAST(0 AS BIGINT) AS pack_idx, CAST(1 AS BIGINT) AS pack_pos
        |  FROM docs2 WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.chunk_id, d.n_tokens,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN d.n_tokens
        |         ELSE p.acc + d.n_tokens END,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN p.pack_idx + 1
        |         ELSE p.pack_idx END,
        |    CASE WHEN p.acc + d.n_tokens > 256 THEN CAST(1 AS BIGINT)
        |         ELSE p.pack_pos + 1 END
        |  FROM docs2 d JOIN packed p ON d.shard = p.shard AND d.rn = p.rn + 1)
        |SELECT chunk_id, shard, pack_idx, pack_pos, n_tokens
        |FROM packed ORDER BY chunk_id""".stripMargin,

    "bp1_bpe_merges" ->
      s"""WITH ${bpeOracleCtes(8)}
        |${(1 to 8).map(i =>
          s"SELECT CAST($i AS BIGINT) AS round, l AS lhs, r AS rhs, " +
            s"m AS merged, CAST(cnt AS BIGINT) AS pair_count " +
            s"FROM t$i WHERE rn = 1")
          .mkString("\n UNION ALL ")}
        |ORDER BY round""".stripMargin,

    "bp2_bpe_segment" ->
      s"""WITH ${bpeOracleCtes(8)}
        |SELECT word, trim(repr) AS segmented FROM r8
        |ORDER BY word""".stripMargin,

    "bp3_unigram_train" ->
      s"""WITH RECURSIVE ${unigramOracleCtes(2, 256)}
        |SELECT piece, cnt AS piece_count, logp AS logp_scaled
        |FROM v2 ORDER BY piece_count DESC, piece""".stripMargin,

    "bp3b_unigram_segment" ->
      s"""WITH RECURSIVE ${unigramOracleCtes(2, 256, walkFinal = true)}
        |SELECT word, string_agg(piece, ' ' ORDER BY pos) AS segmented
        |FROM walk3 WHERE piece IS NOT NULL
        |GROUP BY word ORDER BY word""".stripMargin,

    "t7_unigram_logloss" ->
      """WITH ref AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents WHERE source <> 'src0'),
        |model AS (SELECT tok, count(*) AS c FROM ref GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM model),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents),
        |nll AS (
        |  SELECT t.doc_id,
        |    -ln(coalesce(m.c / (tot.total + 1), 1.0 / (tot.total + 1))) AS v
        |  FROM toks t CROSS JOIN tot LEFT JOIN model m ON m.tok = t.tok)
        |SELECT doc_id, count(*) AS n_tokens, round(avg(v), 4) AS avg_nll
        |FROM nll GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t11_bigram_logloss" ->
      s"""WITH $BigramNllCtes
        |SELECT doc_id, count(*) AS n_pairs, round(avg(v), 4) AS avg_nll
        |FROM nll GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Kneser-Ney: discounted seen-bigram term + escape-mass ×
    // continuation probability; expression shape mirrors the Spark
    // side operation-for-operation so IEEE evaluation agrees
    "t15_kneser_ney" ->
      """WITH kt AS (
        |  SELECT string_split_regex(lower(text), '\s+') AS t
        |  FROM documents WHERE source <> 'src0'),
        |kp AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM kt, LATERAL unnest(range(1, len(t))) u(i)),
        |kbi AS (SELECT w1, w2, count(*) AS cb FROM kp GROUP BY 1, 2),
        |kctx AS (
        |  SELECT w1, sum(cb) AS c1, count(*) AS n1f FROM kbi GROUP BY 1),
        |kcont AS (SELECT w2, count(*) AS n1b FROM kbi GROUP BY 1),
        |knt AS (SELECT count(*) AS nt FROM kbi),
        |kdp AS (
        |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
        |        FROM documents) d,
        |  LATERAL unnest(range(1, len(t))) u(i)),
        |knll AS (
        |  SELECT kdp.doc_id,
        |    -ln(CASE WHEN kctx.c1 IS NOT NULL
        |        THEN greatest(CAST(coalesce(kbi.cb, 0) AS DOUBLE) - 0.75,
        |               0.0) / kctx.c1
        |           + (0.75 * kctx.n1f / kctx.c1) *
        |             coalesce(kcont.n1b / CAST(knt.nt AS DOUBLE),
        |               1.0 / (knt.nt + 1))
        |        ELSE coalesce(kcont.n1b / CAST(knt.nt AS DOUBLE),
        |               1.0 / (knt.nt + 1)) END) AS v
        |  FROM kdp CROSS JOIN knt
        |  LEFT JOIN kbi ON kbi.w1 = kdp.w1 AND kbi.w2 = kdp.w2
        |  LEFT JOIN kctx ON kctx.w1 = kdp.w1
        |  LEFT JOIN kcont ON kcont.w2 = kdp.w2)
        |SELECT doc_id, count(*) AS n_pairs, round(avg(v), 4) AS avg_nll
        |FROM knll GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t13_perplexity_buckets" ->
      s"""WITH $BigramNllCtes,
        |docnll AS (
        |  SELECT doc_id, round(avg(v), 4) AS avg_nll
        |  FROM nll GROUP BY doc_id),
        |bk AS (
        |  SELECT doc_id, avg_nll,
        |    CAST(ntile(3) OVER (ORDER BY avg_nll, doc_id) AS BIGINT)
        |      AS bucket_id
        |  FROM docnll)
        |SELECT doc_id, avg_nll, bucket_id,
        |  CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM bk ORDER BY doc_id""".stripMargin,

    "x6_dsir_curriculum" ->
      s"""WITH ${dsirCtes(256)},
         |$DsirResampleCtes,
         |xsel AS (
         |  SELECT doc_id FROM dsel ORDER BY score, doc_id LIMIT 150),
         |$QualityCtes,
         |xbk AS (
         |  SELECT q.doc_id, q.quality_score,
         |    CAST(ntile(3) OVER (ORDER BY q.quality_score DESC, q.doc_id)
         |      AS BIGINT) AS band
         |  FROM qscore q JOIN xsel USING (doc_id)),
         |xky AS (
         |  SELECT doc_id, quality_score, band,
         |    md5('ep0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         |  FROM xbk)
         |SELECT doc_id, quality_score, band,
         |  CAST(row_number() OVER (ORDER BY band, shuffle_key, doc_id)
         |    AS BIGINT) AS position
         |FROM xky ORDER BY doc_id""".stripMargin,

    "ph1_phrase_mining" ->
      s"""WITH ${phraseCtes(3.0)}
        |SELECT w1, w2, pair_count, score FROM psc
        |WHERE pair_count >= 3 AND score > 1.0
        |ORDER BY w1, w2""".stripMargin,

    "ph2_phrase_merge" ->
      s"""WITH RECURSIVE ${phraseCtes(3.0)},
        |ptop AS (
        |  SELECT w1, w2, row_number() OVER
        |      (ORDER BY score DESC, w1, w2) AS pi
        |  FROM psc WHERE pair_count >= 3 AND score > 1.0
        |  QUALIFY pi <= 10),
        |prec AS (
        |  SELECT doc_id,
        |    ' ' || array_to_string(
        |      string_split_regex(lower(text), '\\s+'), ' ') || ' ' AS t,
        |    0 AS i
        |  FROM documents
        |  UNION ALL
        |  SELECT r.doc_id,
        |    replace(r.t, ' ' || p.w1 || ' ' || p.w2 || ' ',
        |      ' ' || p.w1 || '_' || p.w2 || ' '), r.i + 1
        |  FROM prec r JOIN ptop p ON p.pi = r.i + 1)
        |SELECT doc_id, trim(t) AS phrased FROM prec
        |WHERE i = (SELECT max(i) FROM prec)
        |ORDER BY doc_id""".stripMargin,

    "t14_ccnet_lang_buckets" ->
      s"""WITH $BigramNllCtes,
        |docnll AS (
        |  SELECT doc_id, round(avg(v), 4) AS avg_nll
        |  FROM nll GROUP BY doc_id),
        |bk AS (
        |  SELECT n.doc_id, d.lang, n.avg_nll,
        |    CAST(ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY n.avg_nll, n.doc_id) AS BIGINT) AS bucket_id
        |  FROM docnll n JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, avg_nll, bucket_id,
        |  CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM bk ORDER BY doc_id""".stripMargin,

    "t12_nfc_normalize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    substr(text, 1, 64) ||
        |      (CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769)
        |            ELSE ' caf' || chr(233) END) AS raw
        |  FROM documents)
        |SELECT doc_id, length(raw) AS len_raw,
        |  length(nfc_normalize(raw)) AS len_nfc,
        |  md5(nfc_normalize(raw)) AS h
        |FROM r ORDER BY doc_id""".stripMargin,

    "dc1_decontaminate" ->
      s"""WITH $ShinglesCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |esh AS (
         |  SELECT DISTINCT s.shingle
         |  FROM dsh s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source = 'src0'),
         |szs AS (SELECT doc_id, count(*) AS n_ngrams FROM dsh GROUP BY 1),
         |hits AS (
         |  SELECT s.doc_id, count(*) AS n_shared
         |  FROM dsh s JOIN esh e USING (shingle) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(z.n_ngrams AS BIGINT) AS n_ngrams,
         |  CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
         |  round(coalesce(h.n_shared, 0) / z.n_ngrams, 6) AS overlap
         |FROM documents d
         |JOIN szs z ON z.doc_id = d.doc_id
         |LEFT JOIN hits h ON h.doc_id = d.doc_id
         |WHERE d.source <> 'src0'
         |ORDER BY d.doc_id""".stripMargin,

    "dc2_decontaminate_joined" ->
      s"""WITH $ShinglesCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |esh AS (
         |  SELECT DISTINCT s.shingle
         |  FROM dsh s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source IN ('src0', 'src1')),
         |szs AS (SELECT doc_id, count(*) AS n_ngrams FROM dsh GROUP BY 1),
         |hits AS (
         |  SELECT s.doc_id, count(*) AS n_shared
         |  FROM dsh s JOIN esh e USING (shingle) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(z.n_ngrams AS BIGINT) AS n_ngrams,
         |  CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
         |  round(coalesce(h.n_shared, 0) / z.n_ngrams, 6) AS overlap
         |FROM documents d
         |JOIN szs z ON z.doc_id = d.doc_id
         |LEFT JOIN hits h ON h.doc_id = d.doc_id
         |WHERE d.source NOT IN ('src0', 'src1')
         |ORDER BY d.doc_id""".stripMargin,

    "dc3_decontaminate_bloom" ->
      s"""WITH $ShinglesCte,
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |esh AS (
         |  SELECT DISTINCT s.shingle
         |  FROM dsh s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source IN ('src0', 'src1')),
         |szs AS (SELECT doc_id, count(*) AS n_ngrams FROM dsh GROUP BY 1),
         |hits AS (
         |  SELECT s.doc_id, count(*) AS n_shared
         |  FROM dsh s JOIN esh e USING (shingle) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(z.n_ngrams AS BIGINT) AS n_ngrams,
         |  CAST(h.n_shared AS BIGINT) AS n_shared,
         |  round(h.n_shared / z.n_ngrams, 6) AS overlap
         |FROM documents d
         |JOIN szs z ON z.doc_id = d.doc_id
         |JOIN hits h ON h.doc_id = d.doc_id
         |WHERE d.source NOT IN ('src0', 'src1')
         |ORDER BY d.doc_id""".stripMargin,

    "p3_domain_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rk <= 10
        |ORDER BY doc_id""".stripMargin,

    "p4_shuffle_shard" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key,
        |  CAST((  (strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1) * 268435456
        |        + (strpos('0123456789abcdef', substr(shuffle_key, 2, 1)) - 1) * 16777216
        |        + (strpos('0123456789abcdef', substr(shuffle_key, 3, 1)) - 1) * 1048576
        |        + (strpos('0123456789abcdef', substr(shuffle_key, 4, 1)) - 1) * 65536
        |        + (strpos('0123456789abcdef', substr(shuffle_key, 5, 1)) - 1) * 4096
        |        + (strpos('0123456789abcdef', substr(shuffle_key, 6, 1)) - 1) * 256
        |        + (strpos('0123456789abcdef', substr(shuffle_key, 7, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(shuffle_key, 8, 1)) - 1)) % 8 AS INT)
        |    AS shard
        |FROM k ORDER BY doc_id""".stripMargin,

    "g5_group_by_node" ->
      s"""WITH $SeriesCte
         |SELECT split_part(name, '.', 2) AS name, ts,
         |  round(sum(value), 4) AS value
         |FROM base GROUP BY 1, 2 ORDER BY name, ts""".stripMargin,

    "g6_percent_pointwise" ->
      s"""WITH $SeriesCte,
         |kept AS (
         |  SELECT name FROM base GROUP BY name HAVING avg(value) >= 0.5),
         |b AS (SELECT base.* FROM base JOIN kept USING (name))
         |SELECT name, ts,
         |  CASE WHEN sum(value) OVER (PARTITION BY ts) <> 0
         |       THEN round(value / sum(value) OVER (PARTITION BY ts) * 100, 4)
         |  END AS pct,
         |  CASE WHEN value > 0 THEN round(log(value), 4) END AS log_v,
         |  CASE WHEN value IS NOT NULL
         |       THEN round(least(greatest(value, 0.0), 5.0), 4) END AS clamped
         |FROM b ORDER BY name, ts""".stripMargin,

    "g7_render_breadth" ->
      s"""WITH $SeriesCte,
         |excl AS (SELECT * FROM base WHERE NOT regexp_matches(name, '\\.0$$')),
         |keptn AS (
         |  SELECT name FROM excl GROUP BY name
         |  HAVING arg_max(value, ts) FILTER (WHERE value IS NOT NULL) >= 0.5),
         |k AS (SELECT excl.* FROM excl JOIN keptn USING (name)),
         |ord AS (
         |  SELECT name, CAST(row_number() OVER (
         |    ORDER BY m DESC NULLS LAST, name ASC) AS INT) AS series_order
         |  FROM (SELECT name, max(value) AS m FROM k GROUP BY name))
         |SELECT k.name, k.ts,
         |  round(median(k.value) OVER (
         |    PARTITION BY k.name ORDER BY k.ts
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 5) AS med4,
         |  round(stddev_pop(k.value) OVER (
         |    PARTITION BY k.name ORDER BY k.ts
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 5) AS sd4,
         |  CASE WHEN k.value IS NOT NULL THEN round(sum(k.value) OVER (
         |    PARTITION BY k.name, (k.ts // 21600) * 21600 ORDER BY k.ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) END AS integ,
         |  o.series_order
         |FROM k JOIN ord o ON o.name = k.name
         |ORDER BY k.name, k.ts""".stripMargin,

    "g8_grep_alias" ->
      s"""WITH $SeriesCte
         |SELECT 'fleet.click.sum' AS name, ts, round(sum(value), 4) AS value
         |FROM base WHERE regexp_matches(name, '^ev\\.click\\.')
         |GROUP BY ts ORDER BY ts""".stripMargin,

    "g9_render_breadth2" ->
      s"""WITH $SeriesCte,
         |f AS (SELECT name, ts, coalesce(value, 0) AS fv, value FROM base),
         |pct AS (
         |  SELECT name,
         |    list_sort(list(value) FILTER (WHERE value IS NOT NULL))[
         |      LEAST(GREATEST(CAST(ceil(0.75 * (count(value) + 1)) AS BIGINT),
         |        1), count(value))] AS p75
         |  FROM base GROUP BY name),
         |w AS (
         |  SELECT name, ts, fv,
         |    lag(fv) OVER (PARTITION BY name ORDER BY ts) AS prev,
         |    lag(fv, 2) OVER (PARTITION BY name ORDER BY ts) AS dlv
         |  FROM f),
         |hc AS (
         |  SELECT name, (ts // 21600) * 21600 AS hts,
         |         sum(value * 3600) AS hc6
         |  FROM base GROUP BY 1, 2)
         |SELECT w.name, w.ts, round(w.fv, 4) AS fv,
         |  CAST(CASE WHEN w.prev IS NOT NULL AND w.fv <> w.prev
         |       THEN 1.0 ELSE 0.0 END AS DOUBLE) AS chg,
         |  round(w.dlv, 4) AS dlv,
         |  round(p.p75, 4) AS p75,
         |  round(h.hc6, 4) AS hc6
         |FROM w JOIN pct p USING (name)
         |LEFT JOIN hc h ON h.name = w.name AND h.hts = (w.ts // 21600) * 21600
         |ORDER BY w.name, w.ts""".stripMargin,

    // EMA closed form: with r = 1−c, ema_k (1-based k, seed at k=6) =
    // r^(k−6)·seed + r^k·Σ_{j=7..k} x_j·r^(−j); the cumulative sum is one
    // window, the j≤6 prefix a per-name scalar. Numerically ~1e−12 of the
    // sequential loop — round(4) closes the gap.
    "g10_render_breadth3" ->
      s"""WITH $SeriesCte,
         |e AS (
         |  SELECT name, ts, coalesce(value, 0) AS x,
         |    CAST(row_number() OVER (PARTITION BY name ORDER BY ts) AS BIGINT) AS k
         |  FROM base),
         |sd AS (
         |  SELECT name, avg(x) FILTER (WHERE k <= 6) AS seed,
         |         sum(x * power(1 - 2.0/7, -k)) FILTER (WHERE k <= 6) AS s6
         |  FROM e GROUP BY name),
         |cum AS (
         |  SELECT name, ts, k,
         |    sum(x * power(1 - 2.0/7, -k)) OVER (
         |      PARTITION BY name ORDER BY k
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck
         |  FROM e),
         |ema AS (
         |  SELECT c.name, c.ts,
         |    CASE WHEN c.k >= 6 THEN power(1 - 2.0/7, c.k - 6) * s.seed
         |      + (2.0/7) * power(1 - 2.0/7, c.k) * (c.ck - s.s6) END AS ema6
         |  FROM cum c JOIN sd s USING (name)),
         |itp AS (
         |  SELECT name, ts, CASE WHEN value IS NOT NULL THEN value
         |    ELSE lastv + (nextv - lastv) * (ts - lastt) / (nextt - lastt)
         |    END AS itp
         |  FROM (
         |    SELECT name, ts, value,
         |      last_value(value IGNORE NULLS) OVER w1 AS lastv,
         |      last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS)
         |        OVER w1 AS lastt,
         |      first_value(value IGNORE NULLS) OVER w2 AS nextv,
         |      first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS)
         |        OVER w2 AS nextt
         |    FROM base
         |    WINDOW w1 AS (PARTITION BY name ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    w2 AS (PARTITION BY name ORDER BY ts
         |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))),
         |ss AS (
         |  SELECT name,
         |    (ts - ($T0 - 1800)) // 7200 * 7200 + ($T0 - 1800) AS bts,
         |    sum(value) AS ss2h
         |  FROM base GROUP BY 1, 2),
         |ws AS (
         |  SELECT split_part(name, '.', 1) || '.' || split_part(name, '.', 2)
         |    AS wname, ts, sum(value) AS wsum
         |  FROM base GROUP BY 1, 2)
         |SELECT b.name, b.ts,
         |  round(b.value * 60 / 3600, 4) AS sps,
         |  CAST(CASE WHEN b.value IS NOT NULL THEN 1.0 ELSE 0.0 END AS DOUBLE)
         |    AS nn,
         |  floor(i.itp * 10000 + 0.5) / 10000 AS itp,
         |  round(m.ema6, 4) AS ema6,
         |  round(s.ss2h, 4) AS ss2h,
         |  round(w.wsum, 4) AS wsum
         |FROM base b
         |JOIN itp i ON i.name = b.name AND i.ts = b.ts
         |JOIN ema m ON m.name = b.name AND m.ts = b.ts
         |LEFT JOIN ss s ON s.name = b.name
         |  AND s.bts = (b.ts - ($T0 - 1800)) // 7200 * 7200 + ($T0 - 1800)
         |LEFT JOIN ws w ON w.ts = b.ts
         |  AND w.wname = split_part(b.name, '.', 1) || '.' || split_part(b.name, '.', 2)
         |ORDER BY b.name, b.ts""".stripMargin,

    "g11_series_filters" ->
      s"""WITH $SeriesCte,
         |st AS (
         |  SELECT name, var_pop(value) AS vr, avg(value) AS av,
         |         count(value) AS cnt
         |  FROM base GROUP BY name),
         |rk AS (
         |  SELECT name, vr, av, cnt,
         |    row_number() OVER (ORDER BY vr DESC NULLS LAST, name) AS r
         |  FROM st),
         |b AS (
         |  SELECT
         |    list_sort(list(av))[LEAST(GREATEST(
         |      CAST(ceil(0.30 * (count(av) + 1)) AS BIGINT), 1), count(av))]
         |      AS lo,
         |    list_sort(list(av))[LEAST(GREATEST(
         |      CAST(ceil(0.70 * (count(av) + 1)) AS BIGINT), 1), count(av))]
         |      AS hi
         |  FROM st)
         |SELECT name, cnt,
         |  CAST(CASE WHEN r <= 7 THEN 1 ELSE 0 END AS INT) AS md7,
         |  CAST(CASE WHEN NOT (av > b.lo AND av < b.hi) THEN 1 ELSE 0 END AS INT)
         |    AS aop70
         |FROM rk CROSS JOIN b ORDER BY name""".stripMargin,

    "g12_weighted_combine" ->
      s"""WITH $SeriesCte,
         |ck AS (
         |  SELECT split_part(name, '.', 3) AS name, ts, value FROM base
         |  WHERE regexp_matches(name, '^ev\\.click\\.')),
         |vw AS (
         |  SELECT split_part(name, '.', 3) AS name, ts, value FROM base
         |  WHERE regexp_matches(name, '^ev\\.view\\.')),
         |wa AS (
         |  SELECT c.ts,
         |    CASE WHEN sum(v.value) <> 0
         |      THEN sum(c.value * v.value) / sum(v.value)
         |    END AS wa
         |  FROM ck c JOIN vw v ON v.name = c.name AND v.ts = c.ts
         |  GROUP BY 1),
         |mul AS (
         |  SELECT ts, CASE WHEN count(*) = count(value)
         |    THEN product(value) END AS mul
         |  FROM ck GROUP BY ts),
         |pos AS (
         |  SELECT ts, CASE WHEN count(value) > 0 THEN
         |    list_sort(list(value) FILTER (WHERE value IS NOT NULL))[
         |      LEAST(GREATEST(CAST(ceil(0.60 * (count(value) + 1)) AS BIGINT),
         |        1), count(value))] END AS pos
         |  FROM base GROUP BY ts)
         |SELECT w.ts, round(w.wa, 4) AS wa, round(m.mul, 6) AS mul,
         |  round(p.pos, 4) AS pos60
         |FROM wa w LEFT JOIN mul m USING (ts) LEFT JOIN pos p USING (ts)
         |ORDER BY w.ts""".stripMargin,

    "g13_render_breadth4" ->
      s"""WITH $SeriesCte,
         |stk AS (
         |  SELECT name, ts,
         |    CASE WHEN value IS NOT NULL THEN
         |      sum(value) OVER (PARTITION BY ts ORDER BY name
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    END AS stk
         |  FROM base),
         |mmx AS (
         |  SELECT name, ts, value,
         |    min(value) OVER (PARTITION BY name) AS mn,
         |    max(value) OVER (PARTITION BY name) AS mx
         |  FROM base),
         |mm AS (
         |  SELECT name, ts,
         |    CASE WHEN value IS NULL THEN NULL
         |      WHEN mx = mn THEN 0.0
         |      ELSE floor((value - mn) / (mx - mn) * 10000 + 0.5) / 10000
         |    END AS mm
         |  FROM mmx),
         |tot AS (SELECT ts, value AS t FROM base WHERE name = 'ev.click.0'),
         |ap AS (
         |  SELECT b.name, b.ts,
         |    CASE WHEN t.t IS NOT NULL AND t.t <> 0
         |      THEN floor(b.value / t.t * 100 * 10000 + 0.5) / 10000
         |    END AS ap
         |  FROM base b LEFT JOIN tot t ON t.ts = b.ts),
         |wr AS (
         |  SELECT split_part(name, '.', 1) || '.' || split_part(name, '.', 2)
         |    AS wname, ts, round(max(value) - min(value), 4) AS wrange
         |  FROM base GROUP BY 1, 2)
         |SELECT b.name, b.ts, round(s.stk, 4) AS stk, m.mm, a.ap, w.wrange
         |FROM base b
         |JOIN stk s ON s.name = b.name AND s.ts = b.ts
         |JOIN mm m ON m.name = b.name AND m.ts = b.ts
         |JOIN ap a ON a.name = b.name AND a.ts = b.ts
         |LEFT JOIN wr w ON w.ts = b.ts AND w.wname =
         |  split_part(b.name, '.', 1) || '.' || split_part(b.name, '.', 2)
         |ORDER BY b.name, b.ts""".stripMargin,

    "g14_render_breadth5" ->
      s"""WITH $SeriesCte,
         |mw AS (
         |  SELECT name, ts, round(sum(value) OVER (PARTITION BY name
         |    ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
         |    AS mw4
         |  FROM base),
         |bnd AS (
         |  SELECT ts,
         |    list_sort(list(value) FILTER (WHERE value IS NOT NULL))[
         |      LEAST(GREATEST(CAST(ceil(0.20 * (count(value) + 1)) AS BIGINT),
         |        1), count(value))] AS lo,
         |    list_sort(list(value) FILTER (WHERE value IS NOT NULL))[
         |      LEAST(GREATEST(CAST(ceil(0.80 * (count(value) + 1)) AS BIGINT),
         |        1), count(value))] AS hi
         |  FROM base GROUP BY ts),
         |rbn AS (
         |  SELECT DISTINCT b.name FROM base b JOIN bnd ON bnd.ts = b.ts
         |  WHERE b.value IS NOT NULL
         |    AND NOT (b.value > bnd.lo AND b.value < bnd.hi)),
         |ren AS (
         |  SELECT name FROM base GROUP BY name
         |  HAVING count(value) > 0 AND count(value) >= count(*) * 0.3),
         |rs AS (
         |  SELECT split_part(name,'.',1) || '.' || split_part(name,'.',3)
         |      AS key, ts,
         |    max(CASE WHEN split_part(name,'.',2) = 'click' THEN value END)
         |      AS a,
         |    max(CASE WHEN split_part(name,'.',2) = 'view' THEN value END)
         |      AS b
         |  FROM base WHERE split_part(name,'.',2) IN ('click','view')
         |  GROUP BY 1, 2),
         |rsv AS (
         |  SELECT key, ts, CASE WHEN b <> 0
         |    THEN floor(a / b * 10000 + 0.5) / 10000 END AS rsv
         |  FROM rs),
         |ckr AS (SELECT name, row_number() OVER (ORDER BY name) AS r
         |        FROM (SELECT DISTINCT name FROM base
         |              WHERE name LIKE 'ev.click.%')),
         |vwr AS (SELECT name, row_number() OVER (ORDER BY name) AS r
         |        FROM (SELECT DISTINCT name FROM base
         |              WHERE name LIKE 'ev.view.%')),
         |ds AS (
         |  SELECT ck.name AS name, a.ts,
         |    CASE WHEN a.value IS NOT NULL OR b.value IS NOT NULL
         |      THEN round(coalesce(a.value, 0) - coalesce(b.value, 0), 4)
         |    END AS dsv
         |  FROM base a JOIN ckr ck ON ck.name = a.name
         |  JOIN vwr vw ON vw.r = ck.r
         |  JOIN base b ON b.name = vw.name AND b.ts = a.ts),
         |xc AS (
         |  SELECT ts, CASE WHEN count(value) >=
         |      (SELECT count(DISTINCT name) FROM base
         |       WHERE name LIKE 'ev.click.%') * 0.2
         |    THEN round(sum(value), 4) END AS xcv
         |  FROM base WHERE name LIKE 'ev.click.%' GROUP BY ts)
         |SELECT b.name, b.ts, m.mw4,
         |  CAST(CASE WHEN rbn.name IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |    AS rb80,
         |  CAST(CASE WHEN ren.name IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |    AS re30,
         |  r.rsv, d.dsv, x.xcv
         |FROM base b
         |JOIN mw m ON m.name = b.name AND m.ts = b.ts
         |LEFT JOIN rbn ON rbn.name = b.name
         |LEFT JOIN ren ON ren.name = b.name
         |LEFT JOIN rsv r ON r.ts = b.ts AND r.key =
         |  split_part(b.name,'.',1) || '.' || split_part(b.name,'.',3)
         |LEFT JOIN ds d ON d.name = b.name AND d.ts = b.ts
         |LEFT JOIN xc x ON x.ts = b.ts
         |ORDER BY b.name, b.ts""".stripMargin,

    "d11_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
        |    || source || '.Example.COM'
        |    || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
        |    || (CASE WHEN doc_id % 11 = 0 THEN ''
        |        ELSE '/Docs/' || (doc_id % 40)
        |          || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) END)
        |    || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&b=2&a=1'
        |        ELSE '?a=1&b=2' END)
        |    || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |nf AS (SELECT doc_id, n_chars, split_part(url, '#', 1) AS nofrag
        |       FROM u),
        |c AS (
        |  -- strip the scheme only when '://' precedes the first '/'
        |  -- and '?' (scheme position), mirroring canonicalizeUrl
        |  SELECT doc_id, n_chars,
        |    lower(CASE WHEN strpos(nofrag, '://') > 0
        |      AND (strpos(nofrag, '/') = 0
        |           OR strpos(nofrag, '://') < strpos(nofrag, '/'))
        |      AND (strpos(nofrag, '?') = 0
        |           OR strpos(nofrag, '://') < strpos(nofrag, '?'))
        |      THEN substr(nofrag, strpos(nofrag, '://') + 3)
        |      ELSE nofrag END) AS restl,
        |    CASE WHEN strpos(nofrag, '://') > 0
        |      AND (strpos(nofrag, '/') = 0
        |           OR strpos(nofrag, '://') < strpos(nofrag, '/'))
        |      AND (strpos(nofrag, '?') = 0
        |           OR strpos(nofrag, '://') < strpos(nofrag, '?'))
        |      THEN substr(nofrag, strpos(nofrag, '://') + 3)
        |      ELSE nofrag END AS rest
        |  FROM nf),
        |p AS (
        |  -- the authority ends at the EARLIEST of '/' and '?'
        |  -- (authority-only URLs put the query right after the host),
        |  -- mirroring canonicalizeUrl
        |  SELECT doc_id, n_chars,
        |    regexp_replace(regexp_replace(
        |      CASE WHEN strpos(restl, '?') > 0
        |             AND (strpos(restl, '/') = 0
        |                  OR strpos(restl, '?') < strpos(restl, '/'))
        |        THEN substr(restl, 1, strpos(restl, '?') - 1)
        |      WHEN strpos(restl, '/') > 0
        |        THEN substr(restl, 1, strpos(restl, '/') - 1)
        |      ELSE restl END,
        |      '^(www\.)+', ''), ':(80|443)$', '') AS host,
        |    CASE WHEN strpos(rest, '?') > 0
        |           AND (strpos(rest, '/') = 0
        |                OR strpos(rest, '?') < strpos(rest, '/'))
        |      THEN substr(rest, strpos(rest, '?'))
        |    WHEN strpos(rest, '/') > 0 THEN substr(rest, strpos(rest, '/'))
        |    ELSE '' END AS pathq
        |  FROM c),
        |q AS (
        |  SELECT doc_id, n_chars, host,
        |    regexp_replace(split_part(pathq, '?', 1), '/$', '') AS path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(CASE WHEN strpos(pathq, '?') > 0
        |        THEN split_part(pathq, '?', 2) ELSE '' END, '&'),
        |      pp -> NOT regexp_matches(pp, '^(utm_[^=]*|fbclid|gclid|ref)=')
        |        AND pp <> '')), '&') AS sq
        |  FROM p),
        |k AS (
        |  SELECT doc_id,
        |    host || path ||
        |      (CASE WHEN length(sq) > 0 THEN '?' || sq ELSE '' END)
        |      AS canon_url,
        |    row_number() OVER (
        |      PARTITION BY host || path ||
        |        (CASE WHEN length(sq) > 0 THEN '?' || sq ELSE '' END)
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM q)
        |SELECT doc_id, canon_url,
        |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS kept
        |FROM k ORDER BY doc_id""".stripMargin,

    "p6_chunk_windows" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(array_to_string(toks, '')) = 0 THEN 0
        |         ELSE len(toks) END AS n,
        |    unnest(range(0, greatest(len(toks), 1), 64)) AS tok_start
        |  FROM t)
        |SELECT doc_id,
        |  CAST(tok_start // 64 AS BIGINT) AS chunk_idx,
        |  CAST(tok_start AS BIGINT) AS tok_start,
        |  CAST(len(toks[tok_start + 1 : least(tok_start + 128, n)]) AS BIGINT)
        |    AS n_tokens,
        |  md5(array_to_string(toks[tok_start + 1 : least(tok_start + 128, n)],
        |    ' ')) AS chunk_hash
        |FROM s WHERE tok_start < n
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // the "+ 0" turns a possible IEEE −0.0 (an exactly-zero −sum) into
    // +0.0 so the string compare can't diverge on the sign of zero
    "t10_entropy" ->
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 2048) AS t FROM documents),
        |ch AS (
        |  SELECT doc_id, substr(t, ci + 1, 1) AS c
        |  FROM d, LATERAL unnest(range(0, length(t))) u(ci)),
        |chh AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
        |che AS (
        |  SELECT doc_id, -sum((k / n) * log2(k / n)) AS h
        |  FROM (SELECT doc_id, k, sum(k) OVER (PARTITION BY doc_id) AS n
        |        FROM chh)
        |  GROUP BY doc_id),
        |tk AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(t, '\s+'), x -> x <> ''))
        |      AS w
        |  FROM d),
        |tkh AS (SELECT doc_id, w, count(*) AS k FROM tk GROUP BY 1, 2),
        |tke AS (
        |  SELECT doc_id, -sum((k / n) * log2(k / n)) AS h
        |  FROM (SELECT doc_id, k, sum(k) OVER (PARTITION BY doc_id) AS n
        |        FROM tkh)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, round(coalesce(c.h, 0) + 0, 4) AS char_h,
        |  round(coalesce(t2.h, 0) + 0, 4) AS token_h
        |FROM d LEFT JOIN che c USING (doc_id) LEFT JOIN tke t2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "mm2_frame_sample" ->
      """WITH media AS (
        |  SELECT doc_id, text,
        |         (octet_length(text::BLOB) + 255) // 256 AS n_frames
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, text, unnest(range(0, n_frames, 4)) AS frame_idx
        |  FROM media)
        |SELECT doc_id, frame_idx,
        |  CAST(ascii(substr(text, CAST(frame_idx * 256 + 1 AS INT), 1)) AS BIGINT)
        |    AS frame_tag
        |FROM frames ORDER BY doc_id, frame_idx""".stripMargin,

    "mm1_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  lower(substr(hex(text::BLOB), 1, 8)) AS magic,
        |  CAST(ascii(substr(text, 1, 1)) % 3 AS BIGINT) AS kind_tag,
        |  octet_length(text::BLOB) // 256 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

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

    "a5b_shard_writers" ->
      s"""WITH pts AS (
         |  SELECT 'ev.' || event_type || '.' || (user_id % 10) AS name,
         |         CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         |         value,
         |         (user_id % 2) * 16384 + (user_id % 50) AS shard
         |  FROM events),
         |unpacked AS (
         |  SELECT name, ts, value, shard // 16384 AS replica FROM pts),
         |g AS (
         |  SELECT name, (ts // 3600) * 3600 AS ts, replica,
         |         sum(value) AS sum_v, count(*) AS cnt
         |  FROM unpacked GROUP BY 1, 2, 3),
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
         |    CASE WHEN v0 IS NOT DISTINCT FROM v1 THEN 0.0
         |         WHEN v0 IS NULL OR v1 IS NULL THEN 1.0
         |         ELSE abs(v0 - v1) / (abs(v0) + abs(v1)) END AS gap
         |  FROM c0 FULL OUTER JOIN c1 ON c0.name = c1.name AND c0.ts = c1.ts),
         |per_name AS (SELECT name, avg(gap) AS g FROM j GROUP BY name),
         |ranked AS (
         |  SELECT g, row_number() OVER (ORDER BY g) AS rn,
         |         count(*) OVER () AS n
         |  FROM per_name)
         |SELECT
         |  round(max(CASE WHEN rn = CAST(floor(0.5 * n) AS BIGINT) + 1
         |            THEN g END), 6) AS p50,
         |  round(max(CASE WHEN rn = CAST(floor(0.75 * n) AS BIGINT) + 1
         |            THEN g END), 6) AS p75,
         |  round(max(CASE WHEN rn = CAST(floor(0.9 * n) AS BIGINT) + 1
         |            THEN g END), 6) AS p90,
         |  round(max(CASE WHEN rn = CAST(floor(0.99 * n) AS BIGINT) + 1
         |            THEN g END), 6) AS p99,
         |  round(max(CASE WHEN rn = CAST(floor(0.999 * n) AS BIGINT) + 1
         |            THEN g END), 6) AS p999,
         |  max(n) AS n
         |FROM ranked""".stripMargin,

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

    "f11_find_nodes" ->
      s"""WITH $PointsCte,
         |leaves AS (
         |  SELECT DISTINCT name, TRUE AS is_leaf FROM points
         |  WHERE regexp_matches(name, '${Glob.toRegex("ev.**")}')),
         |dirs AS (
         |  SELECT DISTINCT 'ev.' || event_type AS name, FALSE AS is_leaf
         |  FROM events)
         |SELECT name, is_leaf FROM leaves
         |UNION ALL SELECT name, is_leaf FROM dirs
         |ORDER BY name, is_leaf""".stripMargin,

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

    "m1_sharded_scan" ->
      s"""WITH $PointsCte,
         |names AS (SELECT DISTINCT name FROM points),
         |k AS (SELECT name, md5('map:' || name) AS d FROM names)
         |SELECT name,
         |  CAST((  (strpos('0123456789abcdef', substr(d, 1, 1)) - 1) * 268435456
         |        + (strpos('0123456789abcdef', substr(d, 2, 1)) - 1) * 16777216
         |        + (strpos('0123456789abcdef', substr(d, 3, 1)) - 1) * 1048576
         |        + (strpos('0123456789abcdef', substr(d, 4, 1)) - 1) * 65536
         |        + (strpos('0123456789abcdef', substr(d, 5, 1)) - 1) * 4096
         |        + (strpos('0123456789abcdef', substr(d, 6, 1)) - 1) * 256
         |        + (strpos('0123456789abcdef', substr(d, 7, 1)) - 1) * 16
         |        + (strpos('0123456789abcdef', substr(d, 8, 1)) - 1)) % 4 AS INT)
         |    AS shard
         |FROM k
         |WHERE (  (strpos('0123456789abcdef', substr(d, 1, 1)) - 1) * 268435456
         |       + (strpos('0123456789abcdef', substr(d, 2, 1)) - 1) * 16777216
         |       + (strpos('0123456789abcdef', substr(d, 3, 1)) - 1) * 1048576
         |       + (strpos('0123456789abcdef', substr(d, 4, 1)) - 1) * 65536
         |       + (strpos('0123456789abcdef', substr(d, 5, 1)) - 1) * 4096
         |       + (strpos('0123456789abcdef', substr(d, 6, 1)) - 1) * 256
         |       + (strpos('0123456789abcdef', substr(d, 7, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef', substr(d, 8, 1)) - 1)) % 4 = 0
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

    "aj1_asof_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         value, event_id
        |  FROM events),
        |p AS (SELECT user_id, ts, value, event_id FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value, event_id FROM ev WHERE event_type = 'click'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY value DESC, event_id DESC) = 1)
        |SELECT p.user_id, p.ts, p.value, p.event_id,
        |       c.ts AS click_ts, c.value AS click_value,
        |       c.event_id AS click_event_id,
        |       p.ts - c.ts AS gap_s
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "aj2_asof_next_purchase" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         value, event_id
        |  FROM events),
        |e AS (SELECT user_id, ts, value, event_id FROM ev WHERE event_type = 'error'),
        |p AS (SELECT user_id, ts, value, event_id FROM ev WHERE event_type = 'purchase'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY value DESC, event_id DESC) = 1)
        |SELECT e.user_id, e.ts, e.value, e.event_id,
        |       p.ts AS purchase_ts, p.value AS purchase_value,
        |       p.event_id AS purchase_event_id,
        |       p.ts - e.ts AS latency_s
        |FROM e ASOF JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
        |WHERE p.ts - e.ts <= 3600
        |ORDER BY e.event_id""".stripMargin,

    "aj3_asof_bucketed" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         value, event_id
        |  FROM events),
        |v AS (SELECT user_id, ts, value, event_id FROM ev WHERE event_type = 'view'),
        |s AS (SELECT user_id, ts, value, event_id FROM ev WHERE event_type = 'signup'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY value DESC, event_id DESC) = 1)
        |SELECT v.user_id, v.ts, v.value, v.event_id,
        |       s.ts AS signup_ts, s.value AS signup_value,
        |       s.event_id AS signup_event_id,
        |       v.ts - s.ts AS since_signup_s
        |FROM v ASOF LEFT JOIN s ON v.user_id = s.user_id AND v.ts >= s.ts
        |ORDER BY v.event_id""".stripMargin,

    "rj1_range_join_binned" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |         value, event_id
        |  FROM events),
        |c AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'click'),
        |v AS (SELECT user_id, ts, value, event_id FROM ev WHERE event_type = 'view')
        |SELECT c.user_id, c.event_id, c.ts AS lo, c.ts + 3600 AS hi,
        |       v.ts AS view_ts, v.value AS view_value,
        |       v.event_id AS view_event_id
        |FROM c JOIN v ON v.user_id = c.user_id
        |  AND v.ts >= c.ts AND v.ts < c.ts + 3600
        |ORDER BY c.event_id, v.event_id""".stripMargin,

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
