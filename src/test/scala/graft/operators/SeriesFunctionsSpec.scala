package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Golden tests for the graphite render-function layer, mirroring
  * graphite-web functions.py semantics (None propagation in pointwise
  * transforms, None-skipping in aggregates). */
class SeriesFunctionsSpec extends SparkSuite {
  import spark.implicits._

  /** a: 1, None, 4, 2   b: 10, 20, None, None  (step 60) */
  private def series: DataFrame = Seq(
    ("a", 0L, Some(1.0)), ("a", 60L, None), ("a", 120L, Some(4.0)),
    ("a", 180L, Some(2.0)),
    ("b", 0L, Some(10.0)), ("b", 60L, Some(20.0)), ("b", 120L, None),
    ("b", 180L, None))
    .toDF("name", "ts", "value")

  private def vals(df: DataFrame, name: String): Seq[Option[Double]] =
    df.filter(col("name") === name).orderBy("ts").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq

  test("derivative: first point and None gaps produce None") {
    val d = SeriesFunctions.derivative(series)
    assert(vals(d, "a") === Seq(None, None, None, Some(-2.0)))
    assert(vals(d, "b") === Seq(None, Some(10.0), None, None))
  }

  test("nonNegativeDerivative: counter resets become None") {
    val d = SeriesFunctions.nonNegativeDerivative(series)
    assert(vals(d, "a") === Seq(None, None, None, None)) // -2 suppressed
    assert(vals(d, "b") === Seq(None, Some(10.0), None, None))
  }

  test("perSecond divides by the actual time gap") {
    val d = SeriesFunctions.perSecond(series)
    assert(vals(d, "b")(1) === Some(10.0 / 60))
  }

  test("integral: running sum, None slots stay None but don't reset") {
    val d = SeriesFunctions.integral(series)
    assert(vals(d, "a") === Seq(Some(1.0), None, Some(5.0), Some(7.0)))
  }

  test("movingAverage skips None inside the trailing window") {
    val d = SeriesFunctions.movingAverage(series, points = 2)
    // a @120: window (None, 4) → 4; a @180: (4, 2) → 3
    assert(vals(d, "a") === Seq(Some(1.0), Some(1.0), Some(4.0), Some(3.0)))
    // b @120: (20, None) → 20; b @180: (None, None) → None
    assert(vals(d, "b") === Seq(Some(10.0), Some(15.0), Some(20.0), None))
  }

  test("keepLastValue forward-fills from the last non-None") {
    val d = SeriesFunctions.keepLastValue(series)
    assert(vals(d, "a") === Seq(Some(1.0), Some(1.0), Some(4.0), Some(2.0)))
    assert(vals(d, "b") === Seq(Some(10.0), Some(20.0), Some(20.0), Some(20.0)))
  }

  test("timeShift and scaleOffset are pure column arithmetic") {
    val d = SeriesFunctions.scaleOffset(
      SeriesFunctions.timeShift(series, 3600), factor = 2.0, add = 1.0)
    val row = d.filter(col("name") === "a" && col("ts") === 3600L).collect()(0)
    assert(row.getDouble(2) === 3.0)
  }

  test("summarize: window alignment and the 'last' summary function") {
    val s = SeriesFunctions.summarize(series, intervalS = 120, fn = "last")
    val got = s.filter(col("name") === "a").orderBy("ts").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // [0,120): points (1, None) → last non-None = 1; [120,240): (4,2) → 2
    assert(got === Seq((0L, 1.0), (120L, 2.0)))
    intercept[IllegalArgumentException] {
      SeriesFunctions.summarize(series, 120, "median")
    }
  }

  test("combineSeries: slots where every series is None stay None") {
    val c = SeriesFunctions.combineSeries(series, "sum", "total")
    val got = c.orderBy("ts").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === Seq((0L, Some(11.0)), (60L, Some(20.0)),
      (120L, Some(4.0)), (180L, Some(2.0))))
    assert(c.select("name").distinct().collect().map(_.getString(0)).toSeq
      === Seq("total"))
    // all-None slot: restrict to series b → ts 120/180 are None
    val onlyB = SeriesFunctions.combineSeries(
      series.filter(col("name") === "b"), "avg", "b_avg")
    val bVals = onlyB.orderBy("ts").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(bVals === Seq(Some(10.0), Some(20.0), None, None))
  }

  test("aliasByNode supports negative node indexes") {
    val d = SeriesFunctions.aliasByNode(
      Seq(("ev.click.3", 0L, 1.0)).toDF("name", "ts", "value"), Seq(1, -1))
    assert(d.select("name").collect()(0).getString(0) === "click.3")
  }

  test("groupByNode collapses series sharing a component, per slot") {
    val many = Seq(
      ("ev.click.1", 0L, Some(1.0)), ("ev.click.2", 0L, Some(2.0)),
      ("ev.view.1", 0L, Some(5.0)),
      ("ev.click.1", 60L, None), ("ev.click.2", 60L, None))
      .toDF("name", "ts", "value")
    val g = SeriesFunctions.groupByNode(many, node = 1, fn = "sum")
    val got = g.orderBy("name", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq(("click", 0L, Some(3.0)), ("click", 60L, None),
      ("view", 0L, Some(5.0))))
    intercept[IllegalArgumentException] {
      SeriesFunctions.groupByNode(many, 1, "median")
    }
  }

  test("asPercent: share of the slot total; zero/None totals yield None") {
    val many = Seq(
      ("a", 0L, Some(1.0)), ("b", 0L, Some(3.0)),
      ("a", 60L, Some(2.0)), ("b", 60L, Some(-2.0)), // total 0 → None
      ("a", 120L, None), ("b", 120L, None)) // all-None slot → None
      .toDF("name", "ts", "value")
    val p = SeriesFunctions.asPercent(many)
    assert(vals(p, "a") === Seq(Some(25.0), None, None))
    assert(vals(p, "b") === Seq(Some(75.0), None, None))
  }

  test("averageAbove/Below filter by the None-skipping series mean") {
    // a: mean (1+4+2)/3 = 7/3 ≈ 2.33; b: mean 15
    val above = SeriesFunctions.averageAbove(series, 10.0)
      .select("name").distinct().collect().map(_.getString(0)).toSeq
    assert(above === Seq("b"))
    val below = SeriesFunctions.averageAbove(series, 10.0, above = false)
      .select("name").distinct().collect().map(_.getString(0)).toSeq
    assert(below === Seq("a"))
  }

  test("absolute / logarithm / clamp pointwise semantics") {
    val one = Seq(("m", 0L, Some(-8.0)), ("m", 60L, Some(100.0)),
      ("m", 120L, None)).toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.absolute(one), "m")
      === Seq(Some(8.0), Some(100.0), None))
    // log10: None for ≤ 0, None propagates
    assert(vals(SeriesFunctions.logarithm(one), "m")
      === Seq(None, Some(2.0), None))
    assert(vals(SeriesFunctions.clamp(one, Some(0.0), Some(5.0)), "m")
      === Seq(Some(0.0), Some(5.0), None))
    assert(vals(SeriesFunctions.clamp(one, None, Some(5.0)), "m")
      === Seq(Some(-8.0), Some(5.0), None))
  }

  test("movingMedian: even windows average the two middle, None skipped") {
    val d = SeriesFunctions.movingMedian(series, 3)
    // a: [1]→1, [1,None]→1, [1,None,4]→2.5, [None,4,2]→3
    assert(vals(d, "a") === Seq(Some(1.0), Some(1.0), Some(2.5), Some(3.0)))
    // b: [10]→10, [10,20]→15, [10,20,None]→15, [20,None,None]→20
    assert(vals(d, "b") === Seq(Some(10.0), Some(15.0), Some(15.0), Some(20.0)))
  }

  test("stdev is the population deviation over present points") {
    val d = SeriesFunctions.stdev(series, 2)
    // b window [10,20]: mean 15, pop var 25 → sd 5
    assert(vals(d, "b")(1) === Some(5.0))
    // a window [1,None]: single present point → sd 0
    assert(vals(d, "a")(1) === Some(0.0))
  }

  test("moving min/max/sum share the trailing frame") {
    assert(vals(SeriesFunctions.movingMin(series, 2), "b")
      === Seq(Some(10.0), Some(10.0), Some(20.0), None))
    assert(vals(SeriesFunctions.movingMax(series, 2), "b")
      === Seq(Some(10.0), Some(20.0), Some(20.0), None))
    assert(vals(SeriesFunctions.movingSum(series, 2), "a")
      === Seq(Some(1.0), Some(1.0), Some(4.0), Some(6.0)))
  }

  test("exclude/grep filter series by unanchored regex") {
    assert(SeriesFunctions.exclude(series, "^a$")
      .select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("b"))
    assert(SeriesFunctions.grep(series, "a")
      .select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("currentAbove/Below use the last non-None value") {
    // a last = 2.0, b last = 20.0 (trailing Nones skipped)
    assert(SeriesFunctions.currentAbove(series, 10.0)
      .select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("b"))
    assert(SeriesFunctions.currentAbove(series, 10.0, above = false)
      .select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("integralByInterval resets the running sum at bucket boundaries") {
    val d = SeriesFunctions.integralByInterval(series, 120)
    // a buckets [0,120): 1, None → 1, _; [120,240): 4, 6
    assert(vals(d, "a") === Seq(Some(1.0), None, Some(4.0), Some(6.0)))
  }

  test("sortSeries materializes legend order as series_order") {
    val d = SeriesFunctions.sortSeries(series, by = "maxima")
    val order = d.select("name", "series_order").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(order === Map("b" -> 1, "a" -> 2)) // max 20 beats max 4
    val byName = SeriesFunctions.sortSeries(series, by = "name")
      .select("name", "series_order").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(byName === Map("a" -> 1, "b" -> 2))
  }

  test("pointwise extras: removeAbove/Below, offsetToZero, invert, sqrt") {
    assert(vals(SeriesFunctions.removeAboveValue(series, 3.0), "a")
      === Seq(Some(1.0), None, None, Some(2.0)))
    assert(vals(SeriesFunctions.removeBelowValue(series, 3.0), "a")
      === Seq(None, None, Some(4.0), None))
    assert(vals(SeriesFunctions.offsetToZero(series), "a")
      === Seq(Some(0.0), None, Some(3.0), Some(1.0)))
    val one = Seq(("m", 0L, Some(2.0)), ("m", 60L, Some(0.0)),
      ("m", 120L, Some(-4.0))).toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.invert(one), "m")
      === Seq(Some(0.5), None, Some(-0.25)))
    assert(vals(SeriesFunctions.squareRoot(one), "m")
      === Seq(Some(math.sqrt(2.0)), Some(0.0), None))
    assert(vals(SeriesFunctions.aliasSeries(one, "x"), "x").length === 3)
  }

  test("transformNull fills None; timeSlice masks outside the window") {
    assert(vals(SeriesFunctions.transformNull(series, -1.0), "a")
      === Seq(Some(1.0), Some(-1.0), Some(4.0), Some(2.0)))
    assert(vals(SeriesFunctions.timeSlice(series, 60L, 180L), "a")
      === Seq(None, None, Some(4.0), None))
  }

  test("nPercentile matches graphite's non-interpolating rank") {
    // a has values [1, 2, 4]: p50 → rank ceil(.5*4)=2 → 2.0;
    // p90 → rank ceil(.9*4)=4 clamped to 3 → 4.0
    assert(vals(SeriesFunctions.nPercentile(series, 50), "a")
      === Seq.fill(4)(Some(2.0)))
    assert(vals(SeriesFunctions.nPercentile(series, 90), "a")
      === Seq.fill(4)(Some(4.0)))
    assert(vals(SeriesFunctions.removeAbovePercentile(series, 50), "a")
      === Seq(Some(1.0), None, None, Some(2.0)))
    assert(vals(SeriesFunctions.removeBelowPercentile(series, 50), "a")
      === Seq(None, None, Some(4.0), Some(2.0)))
  }

  test("maximumAbove / minimumBelow filter by series extremes") {
    assert(SeriesFunctions.maximumAbove(series, 5.0)
      .select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("b"))
    assert(SeriesFunctions.minimumBelow(series, 5.0)
      .select("name").distinct().collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("divideSeries: slot-wise by the single divisor, 0/None → None") {
    val divisor = Seq(("d", 0L, Some(2.0)), ("d", 60L, Some(0.0)),
      ("d", 120L, None), ("d", 180L, Some(4.0))).toDF("name", "ts", "value")
    val out = SeriesFunctions.divideSeries(
      series.filter(col("name") === "a"), divisor)
    assert(vals(out, "divideSeries(a,d)")
      === Seq(Some(0.5), None, None, Some(0.5)))
    val twoSeries = series // a and b
    intercept[IllegalArgumentException] {
      SeriesFunctions.divideSeries(series, twoSeries)
    }
  }

  test("diffSeries: safeDiff — None counts 0 unless every input is None") {
    val out = SeriesFunctions.diffSeries(
      series.filter(col("name") === "a"),
      series.filter(col("name") === "b"), alias = "d")
    // a: 1,None,4,2  b: 10,20,None,None → 1-10, 0-20, 4-0, 2-0
    assert(vals(out, "d")
      === Seq(Some(-9.0), Some(-20.0), Some(4.0), Some(2.0)))
    val bothNone = SeriesFunctions.diffSeries(
      Seq(("x", 0L, None: Option[Double])).toDF("name", "ts", "value"),
      Seq(("y", 0L, None: Option[Double])).toDF("name", "ts", "value"))
    assert(vals(bothNone, "diffSeries") === Seq(None))
  }

  test("hitcount: value×step re-bucketed; step derived per series") {
    val out = SeriesFunctions.hitcount(series, 120L)
    // a: bucket0 = (1+0_None)·60 = 60; bucket120 = (4+2)·60 = 360
    val a = out.filter(col("name") === "a").orderBy("ts")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a === Seq((0L, 60.0), (120L, 360.0)))
  }

  test("changed flags value transitions, None-adjacent slots are 0") {
    assert(vals(SeriesFunctions.changed(series), "a")
      === Seq(Some(0.0), Some(0.0), Some(0.0), Some(1.0)))
    assert(vals(SeriesFunctions.changed(series), "b")
      === Seq(Some(0.0), Some(1.0), Some(0.0), Some(0.0)))
  }

  test("delay shifts values while keeping the axis") {
    assert(vals(SeriesFunctions.delay(series, 1), "a")
      === Seq(None, Some(1.0), None, Some(4.0)))
    assert(vals(SeriesFunctions.delay(series, -1), "a")
      === Seq(None, Some(4.0), Some(2.0), None))
  }

  test("linearRegression fits least squares per series") {
    val lin = Seq(("m", 0L, Some(1.0)), ("m", 60L, Some(3.0)),
      ("m", 120L, None), ("m", 180L, Some(7.0)))
      .toDF("name", "ts", "value")
    // points (0,1),(60,3),(180,7): exact line y = x/30 + 1
    val got = vals(SeriesFunctions.linearRegression(lin), "m")
    val want = Seq(1.0, 3.0, 5.0, 7.0)
    got.zip(want).foreach { case (g, w) =>
      assert(g.isDefined && math.abs(g.get - w) < 1e-9)
    }
  }

  test("combineSeries range and median") {
    assert(SeriesFunctions.combineSeries(series, "range", "r")
      .orderBy("ts").collect().map(r => r.getDouble(2)).toSeq
      === Seq(9.0, 0.0, 0.0, 0.0))
    assert(SeriesFunctions.combineSeries(series, "median", "m")
      .orderBy("ts").collect().map(r => r.getDouble(2)).toSeq
      === Seq(5.5, 20.0, 4.0, 2.0))
  }

  test("highest keeps the top-n series with name tie-break") {
    val many = Seq(
      ("m1", 0L, Some(5.0)), ("m2", 0L, Some(9.0)), ("m3", 0L, Some(9.0)),
      ("m4", 0L, None))
      .toDF("name", "ts", "value")
    val top2 = SeriesFunctions.highest(many, n = 2, by = "max")
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(top2 === Seq("m2", "m3")) // tie at 9.0 → both beat 5.0
    val top3 = SeriesFunctions.highest(many, n = 3, by = "max")
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(top3 === Seq("m1", "m2", "m3")) // all-None series ranks last
  }

  // ---- wave 4 ---------------------------------------------------------

  test("substr slices name components with Python slice semantics") {
    val d = Seq(("sys.cpu.host1.load", 0L, Some(1.0)))
      .toDF("name", "ts", "value")
    def nameOf(df: DataFrame): String = df.collect()(0).getString(0)
    assert(nameOf(SeriesFunctions.substrSeries(d, 1)) === "cpu.host1.load")
    assert(nameOf(SeriesFunctions.substrSeries(d, 1, 3)) === "cpu.host1")
    assert(nameOf(SeriesFunctions.substrSeries(d, -2)) === "host1.load")
    assert(nameOf(SeriesFunctions.substrSeries(d, 0, -1)) === "sys.cpu.host1")
    assert(nameOf(SeriesFunctions.substrSeries(d, 9)) === "") // past end
  }

  test("aliasSub rewrites names with backreferences") {
    val d = Seq(("sys.cpu.host1.load", 0L, Some(1.0)))
      .toDF("name", "ts", "value")
    val out = SeriesFunctions.aliasSub(d, """\.host(\d+)\.""", """.h\1.""")
      .collect()(0).getString(0)
    assert(out === "sys.cpu.h1.load")
  }

  test("roundFunction uses HALF_EVEN like Python 3") {
    val d = Seq(("a", 0L, Some(0.125)), ("a", 60L, Some(0.135)),
      ("a", 120L, None))
      .toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.roundFunction(d, 2), "a")
      === Seq(Some(0.12), Some(0.14), None)) // both midpoints go to even
  }

  test("sigmoid / logit / exp with domain guards") {
    val d = Seq(("a", 0L, Some(0.0)), ("a", 60L, Some(0.5)),
      ("a", 120L, Some(2.0)), ("a", 180L, None))
      .toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.sigmoid(d), "a")(0) === Some(0.5))
    val lg = vals(SeriesFunctions.logit(d), "a")
    assert(lg(1) === Some(0.0)) // logit(0.5) = 0
    assert(lg(0) === None && lg(2) === None && lg(3) === None)
    assert(vals(SeriesFunctions.expFunction(d), "a")(0) === Some(1.0))
  }

  test("aggregateLine flattens each series to its aggregate") {
    val d = SeriesFunctions.aggregateLine(series, "max")
    assert(vals(d, "a") === Seq.fill(4)(Some(4.0)))
    assert(vals(d, "b") === Seq.fill(4)(Some(20.0)))
    val lastLine = SeriesFunctions.aggregateLine(series, "last")
    assert(vals(lastLine, "b") === Seq.fill(4)(Some(20.0))) // last non-None
  }

  test("multiplySeries: None in any factor nulls the slot") {
    val m = SeriesFunctions.multiplySeries(series, "mul")
    val by = m.orderBy("ts").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(by === Seq(Some(10.0), None, None, None))
    assert(m.select("name").distinct().collect()(0).getString(0) === "mul")
  }

  test("timeStack overlays shifted labeled copies") {
    val one = Seq(("a", 120L, Some(1.0))).toDF("name", "ts", "value")
    val st = SeriesFunctions.timeStack(one, shiftS = 60, start = 0, end = 2)
      .orderBy("ts").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(st === Seq(("a", 120L), ("timeShift(a,-60)", 180L),
      ("timeShift(a,-120)", 240L)))
  }

  test("fallbackSeries returns the fallback only when empty") {
    val empty = series.filter(col("name") === "zzz")
    val fb = SeriesFunctions.fallbackSeries(empty, series)
    assert(fb.count() === 8)
    val keep = SeriesFunctions.fallbackSeries(series, empty)
    assert(keep.count() === 8)
  }

  test("exponentialMovingAverage matches the hand recurrence") {
    // points=2 → c = 2/3; seed = avg(first 2) at slot 2
    val d = Seq(("a", 0L, Some(3.0)), ("a", 60L, Some(9.0)),
      ("a", 120L, Some(6.0)), ("a", 180L, None), ("a", 240L, Some(12.0)))
      .toDF("name", "ts", "value")
    val e = vals(SeriesFunctions.exponentialMovingAverage(d, 2), "a")
    val c = 2.0 / 3
    val seed = 6.0 // avg(3, 9)
    val e3 = c * 6.0 + (1 - c) * seed
    assert(e(0) === None)
    assert(e(1) === Some(seed))
    assert(e(2) === Some(e3))
    assert(e(3) === None) // None slot emits None, state unchanged
    assert(e(4) === Some(c * 12.0 + (1 - c) * e3))
  }

  test("interpolate fills interior gaps linearly, leaves edges None") {
    val d = Seq[(String, Long, Option[Double])](
      ("a", 0L, None), ("a", 60L, Some(2.0)), ("a", 120L, None),
      ("a", 180L, None), ("a", 240L, Some(8.0)), ("a", 300L, None))
      .toDF("name", "ts", "value")
    val out = vals(SeriesFunctions.interpolate(d), "a")
    assert(out === Seq(None, Some(2.0), Some(4.0), Some(6.0), Some(8.0), None))
  }

  test("mostDeviant keeps the highest-variance series") {
    val many = Seq(
      ("flat", 0L, Some(5.0)), ("flat", 60L, Some(5.0)),
      ("wild", 0L, Some(0.0)), ("wild", 60L, Some(100.0)),
      ("mild", 0L, Some(4.0)), ("mild", 60L, Some(6.0)))
      .toDF("name", "ts", "value")
    val kept = SeriesFunctions.mostDeviant(many, 1)
      .select("name").distinct().collect().map(_.getString(0)).toSeq
    assert(kept === Seq("wild"))
  }

  test("lowest mirrors highest with nulls ranking last") {
    val many = Seq(
      ("m1", 0L, Some(5.0)), ("m2", 0L, Some(9.0)), ("m3", 0L, Some(2.0)),
      ("m4", 0L, None))
      .toDF("name", "ts", "value")
    val bottom2 = SeriesFunctions.lowest(many, 2, "max")
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(bottom2 === Seq("m1", "m3")) // the all-None series never wins
  }

  test("groupByNodes groups on several components at once") {
    val many = Seq(
      ("dc1.web.h1.load", 0L, Some(1.0)), ("dc1.web.h2.load", 0L, Some(2.0)),
      ("dc2.web.h1.load", 0L, Some(4.0)), ("dc1.db.h1.load", 0L, Some(8.0)))
      .toDF("name", "ts", "value")
    val out = SeriesFunctions.groupByNodes(many, "sum", Seq(0, 1))
      .orderBy("name").collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(out === Seq(("dc1.db", 8.0), ("dc1.web", 3.0), ("dc2.web", 4.0)))
  }

  test("unique collapses duplicate (name, ts) rows; limit keeps first n names") {
    val dup = Seq(
      ("a", 0L, Some(1.0)), ("a", 0L, None), ("b", 0L, Some(2.0)),
      ("c", 0L, Some(3.0)))
      .toDF("name", "ts", "value")
    val uniq = SeriesFunctions.uniqueSeries(dup)
    assert(uniq.count() === 3)
    assert(vals(uniq, "a") === Seq(Some(1.0))) // non-null wins the dup
    val lim = SeriesFunctions.limitSeries(dup, 2)
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(lim === Seq("a", "b"))
  }

  test("consolidateBy re-buckets each series to the point budget") {
    // 8 slots at step 60 → budget 3 → factor 3 → buckets of 3 slots
    val d = (0 until 8).map(i => ("a", i * 60L, Some(i.toDouble)))
      .toDF("name", "ts", "value")
    val out = SeriesFunctions.consolidateBy(d, "max", 3)
      .orderBy("ts").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(out === Seq((0L, 2.0), (180L, 5.0), (360L, 7.0)))
    // already inside the budget → unchanged slots
    val same = SeriesFunctions.consolidateBy(d, "max", 10)
      .orderBy("ts").collect().map(_.getLong(1)).toSeq
    assert(same === (0 until 8).map(_ * 60L))
    // single-point series has no derivable step → passes through
    val one = Seq(("b", 120L, Some(9.0))).toDF("name", "ts", "value")
    assert(SeriesFunctions.consolidateBy(one, "avg", 5)
      .collect()(0).getLong(1) === 120L)
  }

  test("weightedAverage collapses all pairs into one weighted series") {
    val v = Seq(("cpu.a.load", 0L, Some(10.0)), ("cpu.b.load", 0L, Some(20.0)))
      .toDF("name", "ts", "value")
    val w = Seq(("cpu.a.weight", 0L, Some(1.0)), ("cpu.b.weight", 0L, Some(3.0)))
      .toDF("name", "ts", "value")
    // graphite semantics: (10·1 + 20·3) / (1 + 3) = 17.5, ONE series
    val out = SeriesFunctions.weightedAverage(v, w, Seq(1))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(out === Seq(("weightedAverage", 17.5)))
    // nodes=Seq(2) → keys "load" vs "weight" never match → no rows
    assert(SeriesFunctions.weightedAverage(v, w, Seq(2)).count() === 0)
    // a None value drops its product but its weight still counts
    val v2 = Seq(("cpu.a.load", 0L, Some(10.0)),
      ("cpu.b.load", 0L, Option.empty[Double])).toDF("name", "ts", "value")
    val out2 = SeriesFunctions.weightedAverage(v2, w, Seq(1))
      .collect().map(_.getDouble(2)).toSeq
    assert(out2 === Seq(10.0 / 4.0 * 1.0)) // 10·1 / (1+3)
  }

  test("perSecond maxValue recovers the rate across a counter wrap") {
    val wrap = Seq(("c", 0L, Some(250.0)), ("c", 60L, Some(5.0)))
      .toDF("name", "ts", "value")
    // without the cap a negative delta is a reset → None
    assert(vals(SeriesFunctions.perSecond(wrap), "c") === Seq(None, None))
    // with maxValue=255: (255 − 250 + 5 + 1) / 60
    assert(vals(SeriesFunctions.perSecond(wrap, Some(255.0)), "c")
      === Seq(None, Some(11.0 / 60)))
    // graphite checks only the CURRENT sample against the cap: with a
    // misconfigured cap below the previous sample, the wrap formula
    // still applies (100 − 250 + 5 + 1 = −144) — parity keeps the quirk
    assert(vals(SeriesFunctions.perSecond(wrap, Some(100.0)), "c")
      === Seq(None, Some(-144.0 / 60)))
  }

  test("asPercentOf divides by the explicit total series per slot") {
    val total = Seq(("t", 0L, Some(20.0)), ("t", 60L, Some(0.0)),
      ("t", 120L, Some(8.0))).toDF("name", "ts", "value")
    val out = SeriesFunctions.asPercentOf(series, total)
    assert(vals(out, "a") === Seq(Some(5.0), None, Some(50.0), None))
    // zero total at 60 → None even though b has a value there
    assert(vals(out, "b") === Seq(Some(50.0), None, None, None))
  }

  test("stacked accumulates across series in name order per slot") {
    val st = SeriesFunctions.stacked(series)
    assert(vals(st, "a") === Seq(Some(1.0), None, Some(4.0), Some(2.0)))
    // b stacks ON a where a has a value; None contributes nothing
    assert(vals(st, "b") === Seq(Some(11.0), Some(20.0), None, None))
  }

  test("areaBetween validates the two-series arity") {
    SeriesFunctions.areaBetween(series) // 2 series: passes through
    intercept[IllegalArgumentException] {
      SeriesFunctions.areaBetween(series.filter(col("name") === "a"))
    }
  }

  test("cactiStyle appends Current/Max/Min to the legend name") {
    val names = SeriesFunctions.cactiStyle(series)
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(names === Seq(
      "a Current:2.00 Max:4.00 Min:1.00",
      "b Current:20.00 Max:20.00 Min:10.00"))
    // an all-None series formats as nan
    val empty = Seq(("e", 0L, Option.empty[Double])).toDF("name", "ts", "value")
    assert(SeriesFunctions.cactiStyle(empty).collect()(0).getString(0)
      === "e Current:nan Max:nan Min:nan")
  }

  test("minMax normalizes each series onto [0,1]; flat series to 0") {
    val mm = SeriesFunctions.minMax(series)
    assert(vals(mm, "a") === Seq(Some(0.0), None, Some(1.0), Some(1.0 / 3)))
    val flat = Seq(("f", 0L, Some(5.0)), ("f", 60L, Some(5.0)))
      .toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.minMax(flat), "f") === Seq(Some(0.0), Some(0.0)))
  }

  test("timeFunction emits the timestamp as value on the step grid") {
    val tf = SeriesFunctions.timeFunction(spark, "x", 100L, 300L, 60L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._2)
    assert(tf === Seq(("x", 100L, 100.0), ("x", 160L, 160.0),
      ("x", 220L, 220.0), ("x", 280L, 280.0)))
    assert(SeriesFunctions.timeFunction(spark, "x", 100L, 100L).count() === 0)
  }

  test("keepLastValue(limit) fills only gaps up to the limit") {
    val gappy = Seq(("g", 0L, Some(1.0)), ("g", 60L, None),
      ("g", 120L, None), ("g", 180L, None), ("g", 240L, Some(5.0)),
      ("g", 300L, None)).toDF("name", "ts", "value")
    // limit 2: the WHOLE 3-slot gap stays open (graphite fills a run
    // only when 0 < consecutiveNones <= limit); the 1-slot tail fills
    assert(vals(SeriesFunctions.keepLastValueLimited(gappy, 2), "g")
      === Seq(Some(1.0), None, None, None, Some(5.0), Some(5.0)))
    assert(vals(SeriesFunctions.keepLastValueLimited(gappy, 3), "g")
      === Seq(Some(1.0), Some(1.0), Some(1.0), Some(1.0), Some(5.0), Some(5.0)))
  }

  test("nonNegativeDerivative maxValue recovers counter wraps") {
    val wrap = Seq(("c", 0L, Some(250.0)), ("c", 60L, Some(5.0)))
      .toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.nonNegativeDerivative(wrap), "c")
      === Seq(None, None))
    assert(vals(SeriesFunctions.nonNegativeDerivative(wrap, Some(255.0)), "c")
      === Seq(None, Some(11.0)))
    // a CURRENT sample beyond the cap is a bogus reading even on a
    // positive delta (graphite's _nonNegativeDelta rejects val > max)
    val over = Seq(("c", 0L, Some(250.0)), ("c", 60L, Some(260.0)),
      ("c", 120L, Some(261.0))).toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.nonNegativeDerivative(over, Some(255.0)), "c")
      === Seq(None, None, None))
    // ...but a bogus PREVIOUS sample still feeds the wrap formula
    // (255 − 260 + 250 + 1 = 246), exactly like functions.py
    val prevOver = Seq(("c", 0L, Some(260.0)), ("c", 60L, Some(250.0)))
      .toDF("name", "ts", "value")
    assert(vals(SeriesFunctions.nonNegativeDerivative(prevOver, Some(255.0)), "c")
      === Seq(None, Some(246.0)))
  }

  test("filterSeries keeps series whose statistic satisfies the op") {
    def names(fn: String, op: String, n: Double): Seq[String] =
      SeriesFunctions.filterSeries(series, fn, op, n)
        .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(names("max", "gt", 5.0) === Seq("b"))   // max a=4, b=20
    assert(names("max", "le", 5.0) === Seq("a"))
    assert(names("last", "eq", 2.0) === Seq("a"))  // last non-null a=2, b=20
    assert(names("average", "lt", 3.0) === Seq("a"))
    intercept[IllegalArgumentException](
      SeriesFunctions.filterSeries(series, "nope", "gt", 0))
    intercept[IllegalArgumentException](
      SeriesFunctions.filterSeries(series, "max", "nope", 0))
  }

  test("legendValue appends the requested stats to the name") {
    val out = SeriesFunctions.legendValue(series, Seq("last", "max"))
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(out === Seq(
      "a (last: 2.00) (max: 4.00)", "b (last: 20.00) (max: 20.00)"))
  }

  test("synthetic sources: sinFunction, randomWalk, verticalLine") {
    val sf = SeriesFunctions.sinFunction(spark, "s", 2.0, 0L, 120L, 60L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(sf(0L) === 0.0)
    assert(math.abs(sf(60L) - 2.0 * math.sin(60.0)) < 1e-12)
    // the walk is deterministic and cumulative
    val w1 = SeriesFunctions.randomWalk(spark, "w", 0L, 300L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    val w2 = SeriesFunctions.randomWalk(spark, "w", 0L, 300L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(w1 === w2)
    assert(w1.map(_._2).forall(v => !v.isNaN))
    val vl = SeriesFunctions.verticalLine(spark, 120L, "deploy").collect()
    assert(vl.length === 1 && vl(0).getString(0) === "deploy"
      && vl(0).getLong(1) === 120L)
  }

  test("aggregateWithWildcards speaks the extended fn set") {
    val v = Seq(("app.h1.hits", 0L, Some(3.0)), ("app.h2.hits", 0L, Some(5.0)))
      .toDF("name", "ts", "value")
    def one(fn: String): Double =
      SeriesFunctions.seriesWithWildcards(v, fn, Seq(1))
        .collect()(0).getDouble(2)
    assert(one("count") === 2.0)
    assert(one("median") === 4.0)
    assert(one("range") === 2.0)
    assert(one("total") === 8.0)
    assert(one("average") === 4.0)
    assert(one("multiply") === 15.0)
  }

  test("movingWindow dispatches on the function name") {
    val med = SeriesFunctions.movingWindow(series, 2, "median")
    val sum = SeriesFunctions.movingWindow(series, 2, "sum")
    // a @180: window (4, 2) → median 3, sum 6
    assert(vals(med, "a")(3) === Some(3.0))
    assert(vals(sum, "a")(3) === Some(6.0))
    intercept[IllegalArgumentException] {
      SeriesFunctions.movingWindow(series, 2, "nope")
    }
  }

  test("combineSeries stddev/last/diff follow the safe* rules") {
    // stddev: population over present values per slot
    val sd = SeriesFunctions.combineSeries(series, "stddev", "sd")
      .orderBy("ts").collect()
    assert(sd(0).getDouble(2) === 4.5) // {1,10}: pop stddev = 4.5
    assert(sd(3).getDouble(2) === 0.0) // only a=2 present
    // last: the LAST series in name order with a present value
    val lst = SeriesFunctions.combineSeries(series, "last", "l")
      .orderBy("ts").collect()
    assert(lst(0).getDouble(2) === 10.0) // b present → b wins
    assert(lst(3).getDouble(2) === 2.0)  // b None → falls back to a
    // diff: first present minus the rest (None skipped)
    val d = SeriesFunctions.combineSeries(series, "diff", "d")
      .orderBy("ts").collect()
    assert(d(0).getDouble(2) === -9.0)  // 1 - 10
    assert(d(1).getDouble(2) === 20.0)  // a None → first present is b
    assert(d(3).getDouble(2) === 2.0)   // only a
  }

  test("combineSeriesXff nulls slots below the series-presence factor") {
    val x = SeriesFunctions.combineSeriesXff(series, "sum", "s", 1.0)
      .orderBy("ts").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    // both series present only at ts=0
    assert(x === Seq(Some(11.0), None, None, None))
    val half = SeriesFunctions.combineSeriesXff(series, "sum", "s", 0.5)
      .orderBy("ts").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(half === Seq(Some(11.0), Some(20.0), Some(4.0), Some(2.0)))
  }

  test("removeEmptySeries drops all-None and below-xff series") {
    val withEmpty = series.union(
      Seq(("c", 0L, None: Option[Double]), ("c", 60L, None))
        .toDF("name", "ts", "value"))
    val kept = SeriesFunctions.removeEmptySeries(withEmpty)
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(kept === Seq("a", "b"))
    // b has 2/4 present → dropped at xff 0.75, kept at 0.5
    val strict = SeriesFunctions.removeEmptySeries(withEmpty, 0.75)
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(strict === Seq("a"))
  }

  test("removeBetweenPercentile keeps series escaping the per-slot band") {
    // three series: mid hugs the middle; lo/hi sit on the band edges
    // (rank percentiles over 3 values pick the extremes, and edge
    // values are NOT strictly inside the band → lo and hi survive)
    val v = Seq(
      ("lo", 0L, 1.0), ("lo", 60L, 1.0),
      ("mid", 0L, 5.0), ("mid", 60L, 5.0),
      ("hi", 0L, 9.0), ("hi", 60L, 9.0)).toDF("name", "ts", "value")
    val kept = SeriesFunctions.removeBetweenPercentile(v, 90)
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(kept === Seq("hi", "lo"))
    // n<50 flips to 100−n: same band, same survivors
    val flipped = SeriesFunctions.removeBetweenPercentile(v, 10)
      .select("name").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(flipped === kept)
  }

  test("powSeries folds x^y in name order and poisons on None") {
    val p = SeriesFunctions.powSeriesList(series, "p").orderBy("ts").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    // ts0: 1^10 = 1; every other slot has a None factor → None
    assert(p === Seq(Some(1.0), None, None, None))
  }

  test("reduceSeries derives one series per key from matcher components") {
    val v = Seq(
      ("app.h1.ok", 0L, Some(3.0)), ("app.h1.total", 0L, Some(6.0)),
      ("app.h2.ok", 0L, Some(1.0)), ("app.h2.total", 0L, Some(4.0)),
      ("app.h2.junk", 0L, Some(99.0))).toDF("name", "ts", "value")
    val pct = SeriesFunctions.reduceSeries(v, "asPercent", 2,
      Seq("ok", "total")).orderBy("name").collect()
    assert(pct.map(_.getString(0)).toSeq === Seq("app.h1", "app.h2"))
    assert(pct(0).getDouble(2) === 50.0)
    assert(pct(1).getDouble(2) === 25.0)
    val div = SeriesFunctions.reduceSeries(v, "divideSeries", 2,
      Seq("ok", "total")).orderBy("name").collect()
    assert(div(0).getDouble(2) === 0.5)
    val diff = SeriesFunctions.reduceSeries(v, "diffSeries", 2,
      Seq("total", "ok")).orderBy("name").collect()
    assert(diff(0).getDouble(2) === 3.0)
    intercept[IllegalArgumentException] {
      SeriesFunctions.reduceSeries(v, "asPercent", 2, Seq("ok"))
    }
  }

  test("toLowerCase/toUpperCase transform names, points untouched") {
    val v = Seq(("App.Host", 0L, Some(1.0))).toDF("name", "ts", "value")
    assert(SeriesFunctions.toLowerCaseSeries(v).collect()(0).getString(0)
      === "app.host")
    assert(SeriesFunctions.toUpperCaseSeries(v).collect()(0).getString(0)
      === "APP.HOST")
    assert(SeriesFunctions.toUpperCaseSeries(v).collect()(0).getDouble(2)
      === 1.0)
  }

  test("pieValue reduces each series to one slice, skipping Nones") {
    val p = SeriesFunctions.pieValue(series, "average").orderBy("name")
      .collect()
    // a: (1+4+2)/3 over non-null slots; b: (10+20)/2
    assert(p.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(p(0).getDouble(1) === 7.0 / 3)
    assert(p(1).getDouble(1) === 15.0)
    val mx = SeriesFunctions.pieValue(series, "maximum").orderBy("name")
      .collect()
    assert(mx.map(_.getDouble(1)).toSeq === Seq(4.0, 20.0))
    val mn = SeriesFunctions.pieValue(series, "minimum").orderBy("name")
      .collect()
    assert(mn.map(_.getDouble(1)).toSeq === Seq(1.0, 10.0))
    intercept[IllegalArgumentException] {
      SeriesFunctions.pieValue(series, "median")
    }
  }

  test("pairwiseSeriesLists pairs by sorted-name rank") {
    val a = Seq(("x.1", 0L, Some(4.0)), ("x.1", 60L, None),
      ("x.2", 0L, Some(6.0))).toDF("name", "ts", "value")
    val b = Seq(("y.1", 0L, Some(2.0)), ("y.1", 60L, Some(5.0)),
      ("y.2", 0L, Some(3.0))).toDF("name", "ts", "value")
    val div = SeriesFunctions.pairwiseSeriesLists(a, b, "divide")
      .orderBy("name", "ts").collect()
    assert(div.map(_.getString(0)).distinct.toSeq === Seq(
      "divideSeries(x.1,y.1)", "divideSeries(x.2,y.2)"))
    assert(div(0).getDouble(2) === 2.0)  // 4/2
    assert(div(1).isNullAt(2))           // None numerator
    val sum = SeriesFunctions.pairwiseSeriesLists(a, b, "sum")
      .orderBy("name", "ts").collect()
    assert(sum(1).getDouble(2) === 5.0)  // None + 5 → 5 (safe sum)
    // length mismatch raises like graphite
    intercept[IllegalArgumentException] {
      SeriesFunctions.pairwiseSeriesLists(a,
        b.filter(col("name") === "y.1"), "sum")
    }
  }

  test("display-sized window guard fails loudly on corpus-scale input") {
    val big = spark.range(SeriesFunctions.MaxRankedSeries + 1)
      .select(concat(lit("m."), col("id")).as("name"),
        lit(0L).as("ts"), lit(1.0).as("value"))
    val eSort = intercept[IllegalArgumentException] {
      SeriesFunctions.sortSeries(big, by = "maxima")
    }
    assert(eSort.getMessage.contains("display-sized bound"))
    val ePair = intercept[IllegalArgumentException] {
      SeriesFunctions.pairwiseSeriesLists(big, big, "sum")
    }
    assert(ePair.getMessage.contains("display-sized bound"))
    // the bound is headroom, not a ceiling on real legends: a normal
    // display-sized call still works
    assert(SeriesFunctions.sortSeries(series, by = "total")
      .select("series_order").distinct().count() === 2)
  }
}
