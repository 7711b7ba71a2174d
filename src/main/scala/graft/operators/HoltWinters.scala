package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Graphite's Holt-Winters family — `holtWintersForecast`,
  * `holtWintersConfidenceBands`, `holtWintersAberration` — triple
  * exponential smoothing with additive seasonality, the render API's
  * alerting workhorse (graphite-web functions.py holtWintersAnalysis;
  * the reference delegates these to graphite-web like the rest of the
  * render surface, plugins/graphite.py:142-225).
  *
  * Graphite's constants: alpha = gamma = 0.1, beta = 0.0035, season =
  * one day of slots. The recurrence is inherently sequential per series
  * (each step's intercept/slope/seasonal feed the next, with a
  * season-length ring of seasonal terms), so this is one of the few
  * operators where a typed per-group scan is the right Spark shape:
  * `groupByKey(name).flatMapGroups` — ONE shuffle on name, then a
  * linear pass over each series' render-sized points. Nothing here is
  * ever corpus-sized: the state per series is the seasonal ring
  * (one day of slots) and the emitted rows.
  *
  * Missing slots (graphite's None) follow functions.py: the state
  * carries over unchanged, the prediction for a None slot is made from
  * the previous state, and deviations decay toward the last value.
  *
  * Like graphite — which silently fetches 7 days of history before the
  * requested window to warm the model — callers should feed
  * `bootstrapS` seconds of leading data; rows before `emitFromS` are
  * consumed for warm-up but not emitted. */
object HoltWinters {

  val Alpha = 0.1
  val Beta = 0.0035
  val Gamma = 0.1

  final case class HwPoint(name: String, ts: Long, value: Option[Double],
    prediction: Option[Double], deviation: Option[Double])

  /** Per-series Holt-Winters analysis: emits (name, ts, value,
    * prediction, deviation) for every input slot with ts >= emitFromS.
    * `stepS` is the slot width; the season is `seasonS / stepS` slots
    * (default one day). */
  def analysis(df: DataFrame, stepS: Long, emitFromS: Long = Long.MinValue,
      seasonS: Long = 86400L): DataFrame = {
    require(stepS > 0 && seasonS >= stepS)
    val seasonLength = math.max((seasonS / stepS).toInt, 1)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col("name"), col("ts").cast("long"),
      col("value").cast("double"))
      .as[(String, Long, Option[Double])]
    rows.groupByKey(_._1)
      .flatMapGroups { (name, it) =>
        val pts = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        analyzeSeries(name, pts, seasonLength)
          .filter(_.ts >= emitFromS)
      }(Encoders.product[HwPoint])
      .toDF()
  }

  /** The functions.py holtWintersAnalysis loop for one series, mirrored
    * statement for statement: per-index lists (a None slot appends 0 to
    * the seasonal/deviation lists, so the NEXT season reads 0 there),
    * prediction[i] is the `next_pred` computed at the previous non-None
    * step (None right after a gap), the first point seeds prediction =
    * actual, and the seasonal used for next_pred is the one at
    * (i+1) − season. */
  private def analyzeSeries(name: String, pts: Array[(Long, Option[Double])],
      seasonLength: Int): Iterator[HwPoint] = {
    val n = pts.length
    val intercepts = new Array[java.lang.Double](n)
    val slopes = new Array[Double](n)
    val seasonals = new Array[Double](n)
    val predictions = new Array[java.lang.Double](n)
    val deviations = new Array[java.lang.Double](n)
    def lastSeasonal(i: Int): Double =
      if (i - seasonLength >= 0) seasonals(i - seasonLength) else 0.0
    def lastDeviation(i: Int): Double = {
      val j = i - seasonLength
      if (j >= 0 && deviations(j) != null) deviations(j) else 0.0
    }
    var nextPred: java.lang.Double = null
    var i = 0
    while (i < n) {
      pts(i)._2 match {
        case None =>
          // missing input values break all the math; do the best we can
          intercepts(i) = null
          slopes(i) = 0.0
          seasonals(i) = 0.0
          predictions(i) = nextPred
          deviations(i) = 0.0
          nextPred = null
        case Some(actual) =>
          var lastIntercept = 0.0
          var lastSlope = 0.0
          var prediction: java.lang.Double = null
          if (i == 0) {
            lastIntercept = actual
            lastSlope = 0.0
            prediction = actual // seed the first prediction as the actual
          } else {
            lastIntercept =
              if (intercepts(i - 1) != null) intercepts(i - 1) else actual
            lastSlope = slopes(i - 1)
            prediction = nextPred // None right after a gap
          }
          val lastSeason = lastSeasonal(i)
          val nextLastSeason = lastSeasonal(i + 1)
          val lastSeasonDev = lastDeviation(i)
          val intercept = Alpha * (actual - lastSeason) +
            (1 - Alpha) * (lastIntercept + lastSlope)
          val slope = Beta * (intercept - lastIntercept) +
            (1 - Beta) * lastSlope
          val seasonal = Gamma * (actual - intercept) +
            (1 - Gamma) * lastSeason
          nextPred = intercept + slope + nextLastSeason
          val predForDev: Double = if (prediction != null) prediction else 0.0
          val deviation = Gamma * math.abs(actual - predForDev) +
            (1 - Gamma) * lastSeasonDev
          intercepts(i) = intercept
          slopes(i) = slope
          seasonals(i) = seasonal
          predictions(i) = prediction
          deviations(i) = deviation
      }
      i += 1
    }
    (0 until n).iterator.map { j =>
      HwPoint(name, pts(j)._1, pts(j)._2,
        Option(predictions(j)).map(_.doubleValue),
        Option(deviations(j)).map(_.doubleValue))
    }
  }

  /** `holtWintersForecast`: the prediction series. */
  def forecast(df: DataFrame, stepS: Long,
      emitFromS: Long = Long.MinValue): DataFrame =
    analysis(df, stepS, emitFromS)
      .select(col("name"), col("ts"), col("prediction").as("value"))

  /** `holtWintersConfidenceBands`: prediction ± delta·deviation
    * (graphite's default delta = 3). Emits both bands as columns. */
  def confidenceBands(df: DataFrame, stepS: Long, delta: Double = 3.0,
      emitFromS: Long = Long.MinValue): DataFrame =
    analysis(df, stepS, emitFromS).select(
      col("name"), col("ts"),
      (col("prediction") + lit(delta) * col("deviation")).as("upper"),
      (col("prediction") - lit(delta) * col("deviation")).as("lower"))

  /** `holtWintersAberration`: how far each actual value strays OUTSIDE
    * the confidence band (0 inside; signed distance outside). */
  def aberration(df: DataFrame, stepS: Long, delta: Double = 3.0,
      emitFromS: Long = Long.MinValue): DataFrame =
    analysis(df, stepS, emitFromS).select(
      col("name"), col("ts"),
      when(col("value").isNull || col("prediction").isNull, lit(0.0))
        .when(col("value") >
            col("prediction") + lit(delta) * col("deviation"),
          col("value") - (col("prediction") + lit(delta) * col("deviation")))
        .when(col("value") <
            col("prediction") - lit(delta) * col("deviation"),
          col("value") - (col("prediction") - lit(delta) * col("deviation")))
        .otherwise(lit(0.0)).as("value"))
}
