package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The DSv2 catalog source: same rows as the parquet source, glob
  * predicates visible as pushed filters in the scan, and row groups
  * genuinely skipped when their component stats exclude the predicate. */
class CatalogV2SourceSpec extends SparkSuite {
  import spark.implicits._

  private def writeCatalog(dir: String): Unit = {
    val names =
      (0 until 500).map(i => s"ev.click.h$i.latency") ++
      (0 until 500).map(i => s"sys.cpu.h$i.load") ++
      (0 until 500).map(i => s"zz.tail.h$i.usage")
    val cat = MetricCatalog.withDerivedColumns(names.toDF("name"))
      .withColumn("id", col("name"))
      .withColumn("aggregator", lit("average"))
      .withColumn("retention", lit("60*60s:24*3600s"))
      .withColumn("updated_on", lit(0L))
    // one FILE per p0 family → disjoint [min,max] name/p0 stats per file's
    // row group, so an equality on p0 can prove two of three files empty
    Seq("ev", "sys", "zz").foreach { fam =>
      cat.filter(col("p0") === fam).coalesce(1)
        .write.mode("append").parquet(dir)
    }
  }

  test("v2 scan returns the same rows as parquet, reports pushed filters, " +
      "and skips row groups whose stats exclude the glob") {
    val dir = java.nio.file.Files.createTempDirectory("catv2").toString
    writeCatalog(dir)

    val v2 = spark.read.format(GraftCatalogSource.ShortName).load(dir)
    val plain = spark.read.parquet(dir)

    // equality + depth predicates, exactly what GlobPredicates emits
    def query(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("p0") === "sys" && col("depth") === 4)
      .select("name", "p1", "depth")

    GraftCatalogSource.rowGroupsRead.set(0)
    GraftCatalogSource.rowGroupsTotal.set(0)
    val got = query(v2).collect().map(_.getString(0)).sorted
    val want = query(plain).collect().map(_.getString(0)).sorted
    assert(got.length === 500)
    assert(got.toSeq === want.toSeq)

    // pruning actually happened: only the sys file's group(s) were read
    val read = GraftCatalogSource.rowGroupsRead.get()
    val total = GraftCatalogSource.rowGroupsTotal.get()
    assert(total >= 3, s"expected >=3 row groups across files, saw $total")
    assert(read < total,
      s"expected stats pruning to skip groups: read $read of $total")

    // the scan advertises its pushed filters (plan-shape observability)
    val planned = query(v2).queryExecution.executedPlan.toString
    assert(planned.contains("GraftCatalogScan") || planned.contains("BatchScan"))
    val scanDesc = query(v2).queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }.mkString
    assert(scanDesc.contains("PushedFilters") && scanDesc.contains("p0"),
      s"scan description missing pushed filters: $scanDesc")
  }

  test("globMetrics over the v2 catalog stays correct (f5-style glob)") {
    val dir = java.nio.file.Files.createTempDirectory("catv2b").toString
    writeCatalog(dir)
    val v2 = spark.read.format(GraftCatalogSource.ShortName).load(dir)
    val plain = spark.read.parquet(dir)
    val gotV2 = MetricCatalog.globMetrics(v2, "ev.{click,view}.*.latency")
      .select("name").collect().map(_.getString(0)).sorted
    val gotPq = MetricCatalog.globMetrics(plain, "ev.{click,view}.*.latency")
      .select("name").collect().map(_.getString(0)).sorted
    assert(gotV2.length === 500 && gotV2.toSeq === gotPq.toSeq)
  }

  test("points store via v2: same rows as v1, bucket dirs pruned by range, " +
      "row groups pruned by metric_id dictionary") {
    import graft.model.Stage
    val dir = java.nio.file.Files.createTempDirectory("ptsv2").toString
    val stage = Stage(points = 24 * 60, precisionS = 60, stage0 = false)
    val span = PointsStore.bucketSpanS(60) // 120000 s per bucket
    // 40 metrics × 3 buckets; writeSalt=8 → several files per bucket, each
    // holding a hash-slice of the metrics (dictionary pruning bait)
    val pts = (0 until 40).flatMap { m =>
      (0 until 30).map(i => (s"metric-$m", i * 12000L, m + i * 0.5, 1L, 0))
    }.toDF("metric_id", "ts", "value", "count", "replica")
    // tiny fixture: AQE would coalesce the salted shuffle to one task and
    // one file per bucket — disable it so the salt actually fans files out
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try PointsStore.write(pts, dir, stage, writeSalt = 8)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    val start = span // second bucket only
    val end = 2 * span
    val ids = Seq("metric-7")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("metric_id"), col("ts"), col("value"),
        col("stage"), col("bucket").cast("long").as("bucket"))
      .collect().map(_.toSeq).sortBy(_.toString)

    spark.conf.set("spark.graft.points.v2", "true")
    GraftCatalogSource.rowGroupsRead.set(0)
    GraftCatalogSource.rowGroupsTotal.set(0)
    val gotV2 =
      try rows(PointsStore.read(spark, dir, stage, start, end, ids))
      finally spark.conf.set("spark.graft.points.v2", "false")
    val gotV1 = rows(PointsStore.read(spark, dir, stage, start, end, ids))
    assert(gotV2.nonEmpty && gotV2.toSeq === gotV1.toSeq)

    // partition pruning: only the in-range bucket's files were OPENED
    // (rowGroupsTotal counts groups of opened files; every file has >=1)
    val nFiles = GraftCatalogSource.listFiles(dir).size
    val total = GraftCatalogSource.rowGroupsTotal.get()
    assert(nFiles >= 6, s"expected salt fan-out beyond 3 bucket files, saw $nFiles")
    assert(total < nFiles,
      s"expected bucket pruning to skip files: opened-groups=$total files=$nFiles")
    // row-group pruning: of the opened files, only the hash slice holding
    // metric-7's dictionary entry was materialized
    val read = GraftCatalogSource.rowGroupsRead.get()
    assert(read < total,
      s"expected metric_id dictionary pruning: read $read of $total groups")
  }

  test("column pruning: a name-only projection requests only needed columns") {
    val dir = java.nio.file.Files.createTempDirectory("catv2c").toString
    writeCatalog(dir)
    val v2 = spark.read.format(GraftCatalogSource.ShortName).load(dir)
    val names = v2.select("name").limit(5).collect()
    assert(names.length === 5)
    val desc = v2.select("name").queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }.mkString
    assert(desc.contains("ReadSchema") && !desc.contains("retention"),
      s"expected pruned read schema without 'retention': $desc")
  }
}
