package graft.operators

import graft.SparkSuite

/** Randomized parity checks for the sequential-rule series functions —
  * the window implementations are compared against direct
  * transcriptions of graphite's per-series loops (functions.py), over
  * one batched DataFrame of many short random series (one Spark job
  * per property, not one per case).
  *
  * These exist because the window forms are easy to get subtly wrong
  * in exactly the ways a hand-picked fixture misses: the round-5
  * review caught keepLastValue(limit) filling the first `limit` slots
  * of arbitrarily long gaps, a divergence no existing test tripped. */
class SeriesWindowPropertySpec extends SparkSuite {
  import spark.implicits._

  /** graphite keepLastValue (functions.py): fill a None run only when
    * 0 < consecutiveNones <= limit, from the value just before the run;
    * trailing runs follow the same rule. A leading run has no fill
    * source and stays None (we deliberately do NOT mirror Python's
    * accidental series[-1] wrap-around). */
  private def refKeepLast(vs: Vector[Option[Double]],
      limit: Int): Vector[Option[Double]] = {
    val out = vs.toArray
    var run = 0
    for (i <- vs.indices) {
      if (vs(i).isEmpty) run += 1
      else {
        if (run > 0 && run <= limit && i - run - 1 >= 0)
          for (j <- i - run until i) out(j) = out(i - run - 1)
        run = 0
      }
    }
    if (run > 0 && run <= limit && vs.length - run - 1 >= 0)
      for (j <- vs.length - run until vs.length)
        out(j) = out(vs.length - run - 1)
    out.toVector
  }

  /** graphite _nonNegativeDelta, transcribed from functions.py: a
    * CURRENT sample above the cap is bogus (None); None without a
    * previous sample; a negative delta is a wrap worth
    * max − prev + val + 1 when the cap is known (even off a bogus
    * previous sample — graphite does not re-check prev), a reset (None)
    * otherwise. */
  private def refNnd(vs: Vector[Option[Double]],
      maxValue: Option[Double]): Vector[Option[Double]] =
    vs.zipWithIndex.map { case (v, i) =>
      val prev = if (i == 0) None else vs(i - 1)
      (v, prev) match {
        case (Some(x), _) if maxValue.exists(x > _) => None
        case (Some(x), Some(p)) => maxValue match {
          case Some(m) if x < p => Some(m - p + x + 1)
          case None if x < p => None
          case _ => Some(x - p)
        }
        case _ => None
      }
    }

  private def randomCases(seed: Long): Seq[(String, Vector[Option[Double]])] = {
    val rnd = new scala.util.Random(seed)
    (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(20)
      val vs = Vector.fill(len)(
        if (rnd.nextInt(3) == 0) None
        else Some(rnd.nextInt(40).toDouble))
      (f"s$i%04d", vs)
    }
  }

  private def collectByKey(df: org.apache.spark.sql.DataFrame)
      : Map[(String, Long), Option[Double]] =
    df.collect().map(r => ((r.getString(0), r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  private def toDf(cases: Seq[(String, Vector[Option[Double]])]) =
    cases.flatMap { case (n, vs) =>
      vs.zipWithIndex.map { case (v, j) => (n, j.toLong * 60, v) }
    }.toDF("name", "ts", "value")

  test("keepLastValueLimited matches graphite's loop on random series") {
    for (limit <- Seq(1, 3)) {
      val cases = randomCases(seed = 42 + limit)
      val got = collectByKey(SeriesFunctions.keepLastValueLimited(
        toDf(cases), limit))
      for ((n, vs) <- cases; (e, j) <- refKeepLast(vs, limit).zipWithIndex)
        assert(got((n, j * 60L)) === e,
          s"$n limit=$limit slot $j of $vs")
    }
  }

  test("nonNegativeDerivative matches _nonNegativeDelta on random series") {
    for (cap <- Seq(None, Some(30.0))) {
      val cases = randomCases(seed = 7)
      val got = collectByKey(SeriesFunctions.nonNegativeDerivative(
        toDf(cases), cap))
      for ((n, vs) <- cases; (e, j) <- refNnd(vs, cap).zipWithIndex)
        assert(got((n, j * 60L)) === e, s"$n cap=$cap slot $j of $vs")
    }
  }
}
