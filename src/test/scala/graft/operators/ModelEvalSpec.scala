package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Classifier evaluation (ModelEval): rank-statistic AUC vs a direct
  * reference (ties included), calibration bucketing, confusion rates,
  * degenerate inputs, partition invariance. */
class ModelEvalSpec extends SparkSuite {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Direct Mann-Whitney AUC with average ranks for ties. */
  private def refAuc(rows: Seq[(Double, Double)]): Option[Double] = {
    val p = rows.count(_._2 == 1.0)
    val n = rows.size - p
    if (p == 0 || n == 0) return None
    val byScore = rows.sortBy(_._1)
    // average rank per row: ranks are 1-based over the sorted order,
    // tie blocks share the mean of their positions
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < byScore.size) {
      var j = i
      while (j < byScore.size && byScore(j)._1 == byScore(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of positions i+1..j
      ranks(byScore(i)._1) = avg
      i = j
    }
    val posRankSum = rows.filter(_._2 == 1.0).map(r => ranks(r._1)).sum
    Some(r6((posRankSum - p.toDouble * (p + 1) / 2.0) / (p.toDouble * n)))
  }

  test("aucRoc matches the direct rank reference on 20 random " +
      "problems with heavy ties, under any partitioning") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      // few distinct scores → many ties (the average-rank edge)
      val rows = (0 until (20 + rnd.nextInt(60))).map { _ =>
        (r6(rnd.nextInt(8) / 7.0 + rnd.nextInt(3) * 0.000001),
          if (rnd.nextBoolean()) 1.0 else 0.0)
      }
      val want = refAuc(rows)
      for (parts <- Seq(1, 7)) {
        val got = ModelEval.aucRoc(
            rows.toDF("score", "y").repartition(parts), "score", "y")
          .collect().head
        assert((if (got.isNullAt(0)) None else Some(got.getDouble(0)))
          === want, s"trial $trial parts $parts")
        assert(got.getLong(1) === rows.count(_._2 == 1.0).toLong)
        assert(got.getLong(2) === rows.count(_._2 == 0.0).toLong)
      }
    }
  }

  test("aucRoc: perfect ranking gives 1, inverted gives 0, " +
      "single-class gives NULL") {
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
      .toDF("score", "y")
    assert(ModelEval.aucRoc(perfect, "score", "y")
      .collect().head.getDouble(0) === 1.0)
    val inverted = Seq((0.9, 0.0), (0.8, 0.0), (0.2, 1.0), (0.1, 1.0))
      .toDF("score", "y")
    assert(ModelEval.aucRoc(inverted, "score", "y")
      .collect().head.getDouble(0) === 0.0)
    val oneClass = Seq((0.9, 1.0), (0.1, 1.0)).toDF("score", "y")
    assert(ModelEval.aucRoc(oneClass, "score", "y")
      .collect().head.isNullAt(0))
  }

  test("aucRocBy: per-group AUC equals per-group aucRoc; single-class " +
      "groups NULL; partitioned window (no single-partition warning " +
      "path)") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- Seq("a", "b", "c"); _ <- 0 until 30
    } yield (g, r6(rnd.nextInt(10) / 9.0), if (rnd.nextBoolean()) 1.0 else 0.0)
    val oneClass = Seq(("d", 0.5, 1.0), ("d", 0.6, 1.0))
    val df = (rows ++ oneClass).toDF("src", "score", "y")
    val got = ModelEval.aucRocBy(df, "score", "y", "src")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for (g <- Seq("a", "b", "c")) {
      val solo = ModelEval.aucRoc(df.filter(col("src") === g),
        "score", "y").collect().head.getDouble(0)
      assert(got(g) === Some(solo), s"group $g")
    }
    assert(got("d") === None)
  }

  test("calibrationBuckets: equal-width buckets, 1.0 folds into the " +
      "last, exact means and rates") {
    val rows = Seq(
      (0.05, 0.0), (0.099999, 0.0),        // bucket 0 ([0, 0.1))
      (0.55, 1.0), (0.57, 0.0),            // bucket 5
      (1.0, 1.0))                          // bucket 9 (folded)
      .toDF("score", "y")
    val got = ModelEval.calibrationBuckets(rows, "score", "y", 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got === Array(
      (0L, 2L, r6((0.05 + 0.099999) / 2), 0.0),
      (5L, 2L, r6((0.55 + 0.57) / 2), 0.5),
      (9L, 1L, 1.0, 1.0)))
  }

  test("operatingPoints: one confusion row per distinct score, " +
      "cumulative counts exact, ties collapse into one threshold") {
    val rows = Seq(
      (0.9, 1.0), (0.9, 0.0),   // tie block at 0.9
      (0.6, 1.0),
      (0.2, 0.0), (0.2, 1.0), (0.2, 0.0)) // tie block at 0.2
      .toDF("score", "y")
    val got = ModelEval.operatingPoints(rows, "score", "y")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // threshold 0.9: predicts the 0.9 block → tp 1 fp 1 fn 2
    // threshold 0.6: + the 0.6 row → tp 2 fp 1 fn 1
    // threshold 0.2: everything → tp 3 fp 3 fn 0
    assert(got === Array(
      (0.9, 1L, 1L, 2L, 0.5, r6(1.0 / 3)),
      (0.6, 2L, 1L, 1L, r6(2.0 / 3), r6(2.0 / 3)),
      (0.2, 3L, 3L, 0L, 0.5, 1.0)))
    // every row's cells agree with confusionAt at that threshold
    for ((t, tp, fp, fn, _, _) <- got) {
      val c = ModelEval.confusionAt(rows, "score", "y", t)
        .collect().head
      assert((c.getLong(0), c.getLong(1), c.getLong(3)) ===
        ((tp, fp, fn)), s"threshold $t")
    }
  }

  test("confusionAt: cells and derived rates, NULL rates where the " +
      "denominator is zero, zero row on empty input") {
    val rows = Seq(
      (0.9, 1.0), (0.8, 1.0), (0.7, 0.0),  // predicted positive
      (0.3, 1.0), (0.2, 0.0), (0.1, 0.0))  // predicted negative
      .toDF("score", "y")
    val r = ModelEval.confusionAt(rows, "score", "y", 0.5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 1L)))
    assert(r.getDouble(4) === r6(2.0 / 3))  // precision
    assert(r.getDouble(5) === r6(2.0 / 3))  // recall
    assert(r.getDouble(6) === r6(2.0 / 3))  // f1 (p == r)
    assert(r.getDouble(7) === r6(4.0 / 6))  // accuracy
    // all-negative labels at a threshold nothing passes: tp-empty
    // rates are NULL, not a thrown ANSI division
    val neg = Seq((0.1, 0.0), (0.2, 0.0)).toDF("score", "y")
    val rn = ModelEval.confusionAt(neg, "score", "y", 0.5).collect().head
    assert(rn.getLong(2) === 2L && rn.isNullAt(4) && rn.isNullAt(5) &&
      rn.isNullAt(6))
    assert(rn.getDouble(7) === 1.0) // accuracy: all correct rejections
    // empty slice: zero counts, every rate NULL
    val re = ModelEval.confusionAt(
      rows.filter(lit(false)), "score", "y", 0.5).collect().head
    assert((re.getLong(0), re.getLong(1), re.getLong(2), re.getLong(3))
      === ((0L, 0L, 0L, 0L)))
    assert(re.isNullAt(4) && re.isNullAt(5) && re.isNullAt(6) &&
      re.isNullAt(7))
  }
}
