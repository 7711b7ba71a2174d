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
