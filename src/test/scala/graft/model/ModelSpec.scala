package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Golden-value ports of the reference's aggregator/stage/retention tests
  * (tests/test_accessor.py:30-178). */
class AggregatorSpec extends AnyFunSuite {
  private val NaN = Double.NaN

  // values newest→oldest in the reference (newest_first=True); we express
  // recency with descending order ids
  private def pts(values: Seq[Double], counts: Seq[Double]): Seq[(Double, Double, Long)] =
    values.zip(counts).zipWithIndex.map { case ((v, c), i) => (v, c, -i.toLong) }

  test("aggregate golden table (test_accessor.py:34-49)") {
    val values = Seq(NaN, 0.0, 1.0, NaN, 2.0, 3.0, NaN)
    val counts = Seq(0.0, 1.0, 1.0, 0.0, 2.0, 1.0, 0.0)
    val expected = Seq(
      Aggregator.Average -> 1.2,
      Aggregator.Last -> 0.0, // newest first
      Aggregator.Minimum -> 0.0,
      Aggregator.Maximum -> 3.0,
      Aggregator.Total -> 6.0)
    expected.foreach { case (agg, want) =>
      assert(agg.aggregate(pts(values, counts)) === want, agg.name)
    }
  }

  test("aggregate all-NaN → NaN (test_accessor.py:51-58)") {
    val ps = pts(Seq(NaN, NaN), Seq(0.0, 0.0))
    Aggregator.all.foreach { agg =>
      assert(agg.aggregate(ps).isNaN, agg.name)
    }
  }

  test("last with oldest-first ordering (test_accessor.py:60-64)") {
    // values [10, 20, NaN] oldest→newest: newest non-NaN is 20
    val ps = Seq((10.0, 1.0, 0L), (20.0, 1.0, 1L), (NaN, 1.0, 2L))
    assert(Aggregator.Last.aggregate(ps) === 20.0)
  }

  test("aggregate of no values → NaN (test_accessor.py:66-69)") {
    assert(Aggregator.Last.aggregate(Nil).isNaN)
  }

  test("merge golden table (test_accessor.py:71-84)") {
    val ps = Seq((10.0, 1.0, 0L), (20.0, 1.0, 1L))
    assert(Aggregator.Average.merge(ps) === ((30.0, 2.0)))
    assert(Aggregator.Last.merge(ps) === ((20.0, 2.0)))
    assert(Aggregator.Minimum.merge(ps) === ((10.0, 2.0)))
    assert(Aggregator.Maximum.merge(ps) === ((20.0, 2.0)))
    assert(Aggregator.Total.merge(ps) === ((30.0, 2.0)))
  }

  test("merge with NaNs skips value and count (test_accessor.py:86-89)") {
    assert(Aggregator.Average.merge(Seq((10.0, 1.0, 0L), (NaN, 1.0, 1L))) === ((10.0, 1.0)))
    assert(Aggregator.Average.merge(Seq((NaN, 1.0, 0L), (10.0, 1.0, 1L))) === ((10.0, 1.0)))
  }

  test("carbon names round-trip") {
    assert(Aggregator.fromName("average") === Aggregator.Average)
    assert(Aggregator.fromName("sum") === Aggregator.Total)
    assert(Aggregator.fromName("min") === Aggregator.Minimum)
  }
}

class RetentionSpec extends AnyFunSuite {

  test("stage string round-trip (test_accessor.py:101-123)") {
    val s1 = Stage(points = 24, precisionS = 3600, stage0 = false)
    assert(Stage.fromString("24*3600s") === s1)
    assert(Stage.fromString("24*3600s_0").stage0)
    assert(!Stage.fromString("24*3600s_aggr").stage0)
    assert(Stage.fromString("12*3600s") !== s1)
  }

  test("retention parse (test_accessor.py:128-138)") {
    val r = Retention.fromString("60*60s:24*3600s")
    assert(r.stages(0).points === 60 && r.stages(0).precisionS === 60)
    assert(r.stages(1).points === 24 && r.stages(1).precisionS === 3600)
    assert(r.stages(0).stage0 && !r.stages(1).stage0)
    assert(r.toString === "60*60s:24*3600s")
  }

  test("invalid retentions rejected (test_accessor.py:152-161)") {
    Seq("", "60*60s:1*1234s", "60*1s:15*2s").foreach { s =>
      assertThrows[IllegalArgumentException](Retention.fromString(s))
    }
  }

  test("align_time_window goldens (test_accessor.py:163-178)") {
    val r = Retention.fromString("60*60s:24*3600s")
    val stage0 = r.stages(0)
    val stage1 = r.stages(1)
    assert(r.alignTimeWindow(0, 0, 0) === ((0L, 0L, stage0)))
    assert(r.alignTimeWindow(60, 120, 1200) === ((60L, 120L, stage0)))
    assert(r.alignTimeWindow(61, 119, 1200) === ((60L, 120L, stage0)))
    assert(r.alignTimeWindow(59, 121, 1200) === ((0L, 180L, stage0)))
    assert(r.alignTimeWindow(59, 3601, 8000) === ((0L, 7200L, stage1)))
  }

  test("findStageForTs picks most precise covering stage (metric.py:593-604)") {
    val r = Retention.fromString("60*60s:24*3600s")
    assert(r.findStageForTs(tsS = 7000, nowS = 8000) === r.stages(0))
    assert(r.findStageForTs(tsS = 100, nowS = 8000) === r.stages(1))
  }
}

class MetricNameSpec extends AnyFunSuite {
  test("sanitize drops empty components (metric.py:181-194)") {
    assert(MetricName.sanitize("a..b.") === "a.b")
    assert(MetricName.sanitize(".x.y") === "x.y")
  }

  test("components / depth / parent / ancestors") {
    assert(MetricName.components("a.b.c").toSeq === Seq("a", "b", "c"))
    assert(MetricName.depth("a.b.c") === 3)
    assert(MetricName.parent("a.b.c") === "a.b.")
    assert(MetricName.parent("a") === "")
    assert(MetricName.ancestors("a.b.c") === Seq("a", "a.b"))
  }

  test("uuid5 matches RFC 4122 test vector") {
    // uuid.uuid5(uuid.NAMESPACE_DNS, "python.org") — stdlib-verifiable vector
    val dns = java.util.UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")
    assert(MetricName.uuid5(dns, "python.org").toString ===
      "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("metric ids are deterministic and distinct") {
    assert(MetricName.metricId("a.b") === MetricName.metricId("a.b"))
    assert(MetricName.metricId("a.b") !== MetricName.metricId("a.c"))
  }
}
