package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hand-computed goldens for the functions.py holtWintersAnalysis
  * recurrence (alpha 0.1, beta 0.0035, gamma 0.1), including the None
  * semantics: a gap stores 0 in the seasonal/deviation lists, the slot
  * after a gap has a None prediction, and deviation falls back to
  * |actual - 0| there. */
class HoltWintersSpec extends SparkSuite {
  import spark.implicits._

  // step 60 s, season 120 s → season_length 2
  private def series = Seq(
    ("m", 0L, Some(10.0)), ("m", 60L, Some(12.0)),
    ("m", 120L, None: Option[Double]), ("m", 180L, Some(14.0)))
    .toDF("name", "ts", "value")

  private def byTs(df: org.apache.spark.sql.DataFrame, colName: String)
      : Seq[Option[Double]] =
    df.orderBy("ts").collect().map { r =>
      val i = r.fieldIndex(colName)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }.toSeq

  test("analysis matches the hand-rolled recurrence, gaps included") {
    val out = HoltWinters.analysis(series, stepS = 60, seasonS = 120)
    // i=0 seeds prediction = actual; i=1 uses next_pred = 10;
    // i=2 (gap) carries the pending next_pred 10.2007; i=3 is None
    // because the gap nulled next_pred
    val preds = byTs(out, "prediction")
    assert(preds(0) === Some(10.0))
    assert(preds(1) === Some(10.0))
    assert(preds(2).isDefined && math.abs(preds(2).get - 10.2007) < 1e-9)
    assert(preds(3) === None)
    val devs = byTs(out, "deviation")
    assert(devs(0) === Some(0.0))
    assert(devs(1).isDefined && math.abs(devs(1).get - 0.2) < 1e-12)
    assert(devs(2) === Some(0.0))
    // i=3: gamma·|14 − 0| + (1−gamma)·deviations[1] = 1.4 + 0.18
    assert(devs(3).isDefined && math.abs(devs(3).get - 1.58) < 1e-12)
  }

  test("forecast trims bootstrap rows; bands and aberration line up") {
    val fc = HoltWinters.forecast(series, stepS = 60, emitFromS = 120L)
    assert(fc.count() === 2) // ts 120 and 180 only
    val bands = HoltWinters.confidenceBands(series, stepS = 60)
      .orderBy("ts").collect()
    // band at i=1: prediction 10 ± 3·0.2
    assert(math.abs(bands(1).getDouble(2) - 10.6) < 1e-12)
    assert(math.abs(bands(1).getDouble(3) - 9.4) < 1e-12)
    val ab = byTs(HoltWinters.aberration(series, stepS = 60), "value")
    // i=1: actual 12 > upper 10.6 → 1.4 outside; gap and post-gap → 0
    assert(math.abs(ab(1).get - 1.4) < 1e-12)
    assert(ab(0) === Some(0.0) && ab(2) === Some(0.0) && ab(3) === Some(0.0))
  }

  test("a clean daily season converges: forecast tracks the pattern") {
    // 30 "days" of a 4-slot daily pattern (seasonS = 4·3600, step 3600)
    // — alpha/gamma 0.1 adapt slowly; graphite itself warms the model
    // with 7 days of history before the render window
    val pattern = Seq(1.0, 5.0, 9.0, 5.0)
    val rows = for (d <- 0 until 30; s <- 0 until 4)
      yield ("m", (d * 4 + s) * 3600L, Some(pattern(s)))
    val df = rows.toDF("name", "ts", "value")
    val out = HoltWinters.analysis(df, stepS = 3600, seasonS = 4 * 3600)
      .orderBy("ts").collect()
    // by the 30th day every one-step forecast lands within 0.35 of the
    // pattern (simulated: worst slot ≈ 0.32) and the summed error over
    // the last day is ~18× smaller than over the second day
    (116 until 120).foreach { i =>
      val actual = pattern(i % 4)
      val pred = out(i).getDouble(3)
      assert(math.abs(pred - actual) < 0.35,
        s"slot $i: pred $pred vs actual $actual")
    }
    val errEarly = (4 until 8).map(i =>
      math.abs(out(i).getDouble(3) - pattern(i % 4))).sum
    val errLate = (116 until 120).map(i =>
      math.abs(out(i).getDouble(3) - pattern(i % 4))).sum
    assert(errLate < errEarly / 10, s"early $errEarly late $errLate")
  }
}
