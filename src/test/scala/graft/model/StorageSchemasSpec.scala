package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Carbon storage-schemas matching semantics (plugins/carbon.py:310-369). */
class StorageSchemasSpec extends AnyFunSuite {

  private val schemas = StorageSchemas(
    ("^carbon\\.", "60s:90d", "average"),
    ("\\.count$", "10s:6h,60s:30d", "sum"),
    ("^sys\\.", "1s:1d,60s:7d", "average"))

  test("whisper retention strings parse to stages") {
    val r = StorageSchemas.parseRetention("10s:6h,60s:30d")
    assert(r.stages(0) === Stage(2160, 10, stage0 = true))
    assert(r.stages(1) === Stage(43200, 60, stage0 = false))
    // native form still accepted
    assert(StorageSchemas.parseRetention("86400*1s:10080*60s") ===
      Retention.default)
  }

  test("first matching rule wins; search (not anchor) semantics") {
    assert(schemas.metadataFor("carbon.agents.x.cpu").retention.toString ===
      "129600*60s")
    val m = schemas.metadataFor("requests.api.count")
    assert(m.aggregator === Aggregator.Total)
    assert(m.retention.stages.map(_.precisionS) === List(10L, 60L))
    // ^carbon does not match mid-name; .count rule searched anywhere
    assert(schemas.metadataFor("app.carbon.thing") ===
      MetricMetadata()) // default
    assert(schemas.metadataFor("sys.cpu.0.load").retention.stages.head
      .precisionS === 1L)
  }

  test("metricFor builds a complete metric") {
    val m = schemas.metricFor("sys.cpu.0.load")
    assert(m.id === MetricName.metricId("sys.cpu.0.load"))
    assert(m.retention.toString === "86400*1s:10080*60s")
  }

  test("invalid whisper parts rejected") {
    assertThrows[IllegalArgumentException](
      StorageSchemas.parseRetention("banana"))
  }

  test("whisper historical form: unitless second field is a point count") {
    // whisper.parseRetentionDef: "60:1440" = 1440 points of 60 s
    val r = StorageSchemas.parseRetention("60:1440")
    assert(r.stages.head === Stage(1440, 60, stage0 = true))
  }

  test("storage-schemas.conf + storage-aggregation.conf parse and compose") {
    val schemasConf =
      """# carbon's own metrics
        |[carbon]
        |pattern = ^carbon\.
        |retentions = 60:90d
        |
        |; fine-grained sys metrics
        |[sys]
        |pattern = ^sys\.
        |retentions = 1s:1d,60s:7d
        |xFilesFactor = 0.2
        |
        |[default]
        |pattern = .*
        |retentions = 60s:1d,300s:30d
        |""".stripMargin
    val aggConf =
      """[min_rules]
        |pattern = \.min$
        |aggregationMethod = min
        |xFilesFactor = 0.1
        |
        |[count_rules]
        |pattern = \.count$
        |aggregationMethod = sum
        |""".stripMargin
    val ss = StorageSchemas.fromConf(schemasConf, aggConf)

    // schemas: first match wins, top to bottom
    val carbon = ss.metadataFor("carbon.agents.a.cpu")
    assert(carbon.retention.toString === "129600*60s")
    val sys = ss.metadataFor("sys.cpu.0.load")
    assert(sys.retention.stages.head.precisionS === 1L)
    assert(sys.carbonXFilesFactor === 0.2)
    val other = ss.metadataFor("app.requests.rate")
    assert(other.retention.stages.map(_.precisionS) === List(60L, 300L))

    // aggregation rules override aggregator/xff independently of schemas
    val m = ss.metadataFor("sys.queue.min")
    assert(m.aggregator === Aggregator.Minimum)
    assert(m.carbonXFilesFactor === 0.1)
    assert(m.retention.stages.head.precisionS === 1L) // retention from [sys]
    val c = ss.metadataFor("app.api.count")
    assert(c.aggregator === Aggregator.Total) // carbon name 'sum'
    assert(c.retention.stages.map(_.precisionS) === List(60L, 300L))

    // no agg rule match → schema rule's aggregator stands
    assert(ss.metadataFor("sys.cpu.0.load").aggregator === Aggregator.Average)
  }
}
