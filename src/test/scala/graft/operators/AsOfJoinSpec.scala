package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** As-of / range join semantics pinned against driver-side brute force
  * on seeded random data, plus the plan properties that make them
  * scale: the as-of plan contains ZERO join nodes (it is a window over
  * a tagged union) and the binned range join is a pure equi-join —
  * never a cartesian or broadcast-nested-loop. */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  // (key, ts, value, id) — seeded, with deliberate cross-side ts
  // collisions (ts drawn from a small range) to exercise tie rules
  private val rnd = new scala.util.Random(42)
  private val leftRows = Seq.tabulate(300) { i =>
    (rnd.nextInt(5), rnd.nextInt(500).toLong, rnd.nextInt(1000) / 10.0, i.toLong)
  }
  private val rightRows = Seq.tabulate(250) { i =>
    (rnd.nextInt(5), rnd.nextInt(500).toLong, rnd.nextInt(1000) / 10.0, (1000 + i).toLong)
  }

  private def leftDf: DataFrame =
    leftRows.toDF("k", "ts", "value", "id")
  private def rightDf: DataFrame =
    rightRows.toDF("k", "ts", "rv", "rid")

  /** Right side after the operator's deterministic (k, ts) dedup:
    * lexicographically greatest (rv, rid). */
  private val rightDedup: Map[(Int, Long), (Double, Long)] =
    rightRows.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(r => (r._3, r._4)).max }

  private def bruteBackward(tol: Option[Long]): Map[Long, Option[(Long, Double, Long)]] =
    leftRows.map { case (k, ts, _, id) =>
      id -> rightDedup.keysIterator
        .filter { case (rk, rts) =>
          rk == k && rts <= ts && tol.forall(t => rts >= ts - t) }
        .reduceOption((a, b) => if (a._2 >= b._2) a else b)
        .map { rk => val (rv, rid) = rightDedup(rk); (rk._2, rv, rid) }
    }.toMap

  private def bruteForward(tol: Option[Long]): Map[Long, Option[(Long, Double, Long)]] =
    leftRows.map { case (k, ts, _, id) =>
      id -> rightDedup.keysIterator
        .filter { case (rk, rts) =>
          rk == k && rts >= ts && tol.forall(t => rts <= ts + t) }
        .reduceOption((a, b) => if (a._2 <= b._2) a else b)
        .map { rk => val (rv, rid) = rightDedup(rk); (rk._2, rv, rid) }
    }.toMap

  private def collectAsof(df: DataFrame): Map[Long, Option[(Long, Double, Long)]] =
    df.collect().map { r =>
      r.getAs[Long]("id") -> (if (r.isNullAt(r.fieldIndex("m_ts"))) None
      else Some((r.getAs[Long]("m_ts"), r.getAs[Double]("m_rv"),
        r.getAs[Long]("m_rid"))))
    }.toMap

  test("backward as-of matches brute force (left join, no tolerance)") {
    val got = collectAsof(AsOfJoin.asofBackward(
      leftDf, rightDf, Seq("k"), "ts", "ts", rightPrefix = "m_"))
    assert(got === bruteBackward(None))
  }

  test("backward as-of with tolerance voids stale matches") {
    val got = collectAsof(AsOfJoin.asofBackward(
      leftDf, rightDf, Seq("k"), "ts", "ts", rightPrefix = "m_",
      toleranceS = Some(20L)))
    assert(got === bruteBackward(Some(20L)))
    assert(got.values.exists(_.isEmpty), "tolerance should void something")
  }

  test("forward as-of matches brute force, inner drops unmatched") {
    val expected = bruteForward(Some(15L)).collect { case (id, Some(m)) => id -> Some(m) }.toMap
    val got = collectAsof(AsOfJoin.asofForward(
      leftDf, rightDf, Seq("k"), "ts", "ts", rightPrefix = "m_",
      toleranceS = Some(15L), inner = true))
    assert(got === expected)
    assert(got.size < leftRows.size)
  }

  test("bucketed backward == plain backward across bucket spans") {
    val plain = collectAsof(AsOfJoin.asofBackward(
      leftDf, rightDf, Seq("k"), "ts", "ts", rightPrefix = "m_"))
    for (span <- Seq(7L, 97L, 10000L)) {
      val bucketed = collectAsof(AsOfJoin.asofBackwardBucketed(
        leftDf, rightDf, Seq("k"), "ts", "ts", bucketSpanS = span,
        rightPrefix = "m_"))
      assert(bucketed === plain, s"span=$span")
    }
  }

  test("equal-ts rows on both sides: backward matches, forward matches") {
    val l = Seq((1, 10L, 0.0, 1L)).toDF("k", "ts", "value", "id")
    val r = Seq((1, 10L, 5.0, 2L)).toDF("k", "ts", "rv", "rid")
    val b = collectAsof(AsOfJoin.asofBackward(l, r, Seq("k"), "ts", "ts", "m_"))
    val f = collectAsof(AsOfJoin.asofForward(l, r, Seq("k"), "ts", "ts", "m_"))
    assert(b(1L) === Some((10L, 5.0, 2L)))
    assert(f(1L) === Some((10L, 5.0, 2L)))
  }

  test("as-of plan has zero join nodes (union + window, one key shuffle)") {
    // plan STRING so the check sees through AQE's leaf wrapper
    val plan = AsOfJoin.asofBackward(
      leftDf, rightDf, Seq("k"), "ts", "ts", "m_")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  // ---- range join -----------------------------------------------------

  private def intervalsDf: DataFrame = leftRows.map { case (k, ts, v, id) =>
    (k, ts, ts + 40L, v, id) }.toDF("k", "lo", "hi", "value", "id")

  private def bruteRange: Set[(Long, Long)] =
    (for {
      (k, ts, _, id) <- leftRows
      (rk, rts, _, rid) <- rightRows
      if rk == k && rts >= ts && rts < ts + 40L
    } yield (id, rid)).toSet

  test("binned range join == brute inequality join, across bin spans") {
    for (span <- Seq(13L, 40L, 512L)) {
      val got = AsOfJoin.rangeJoinBinned(
        intervalsDf, "lo", "hi", rightDf, "ts", Seq("k"), binSpanS = span)
        .select("id", "pt_rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at span=$span")
      assert(got.toSet === bruteRange, s"span=$span")
    }
  }

  test("degenerate intervals (hi <= lo) match nothing") {
    val ivals = Seq((1, 10L, 10L, 1L), (1, 20L, 5L, 2L)).toDF("k", "lo", "hi", "id")
    val got = AsOfJoin.rangeJoinBinned(ivals, "lo", "hi",
      rightDf, "ts", Seq("k"), binSpanS = 50L)
    assert(got.count() === 0L)
  }

  test("range join plan is an equi-join — no cartesian / nested loop") {
    val plan = AsOfJoin.rangeJoinBinned(
      intervalsDf, "lo", "hi", rightDf, "ts", Seq("k"), binSpanS = 40L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("null timestamps never match: null-ts right rows are ignored, " +
      "null-ts left rows come back unmatched in BOTH directions") {
    val l = Seq[(Int, Option[Long], Double, Long)](
      (1, Some(5L), 0.0, 1L), (1, None, 0.0, 2L))
      .toDF("k", "ts", "value", "id")
    val r = Seq[(Int, Option[Long], Double, Long)]((1, None, 9.9, 100L))
      .toDF("k", "ts", "rv", "rid")
    for (dir <- Seq("backward", "forward")) {
      val got = (if (dir == "backward")
        AsOfJoin.asofBackward(l, r, Seq("k"), "ts", "ts", "m_")
      else AsOfJoin.asofForward(l, r, Seq("k"), "ts", "ts", "m_"))
        .select("id", "m_rid").collect()
        .map(row => row.getAs[Long]("id") ->
          row.isNullAt(row.fieldIndex("m_rid"))).toMap
      assert(got === Map(1L -> true, 2L -> true), s"direction=$dir")
    }
    // and a null-ts LEFT row stays unmatched even when real right rows
    // exist that a nulls-first sort would otherwise hand it
    val got2 = AsOfJoin.asofForward(l, rightDf.filter(col("k") === 1),
      Seq("k"), "ts", "ts", "m_", inner = true)
      .select("id").as[Long].collect().toSet
    assert(!got2.contains(2L))
  }

  test("rangeJoinBinned rejects fractional-typed bounds") {
    val dIvals = Seq((1, 9.5, 10.5, 1L)).toDF("k", "lo", "hi", "id")
    val err = intercept[IllegalArgumentException] {
      AsOfJoin.rangeJoinBinned(dIvals, "lo", "hi", rightDf, "ts",
        Seq("k"), binSpanS = 10L)
    }
    assert(err.getMessage.contains("integer-typed"))
  }

  test("rangeJoinBinned rejects reserved __ columns instead of " +
      "silently clobbering them") {
    val ivals = intervalsDf.withColumn("__bin", lit(1))
    assertThrows[IllegalArgumentException] {
      AsOfJoin.rangeJoinBinned(ivals, "lo", "hi", rightDf, "ts",
        Seq("k"), binSpanS = 40L)
    }
  }
}
