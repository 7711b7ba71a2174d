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
}
