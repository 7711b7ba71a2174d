package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** In-engine logistic regression: direct-loop parity on random
  * problems, separable-fixture learning, and prediction contracts. */
class LogRegSpec extends SparkSuite {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Plain-Scala full-batch GD with the operator's exact rounding. */
  private def reference(feats: Seq[(Long, Long, Double)],
      labels: Map[Long, Double], dim: Int, eta: Double,
      rounds: Int): Map[Long, Double] = {
    val train = feats.filter(f => labels.contains(f._1))
    var w = ((-1L until dim.toLong).map(_ -> 0.0)).toMap
    val n = labels.size.toDouble
    for (_ <- 1 to rounds) {
      val p = labels.map { case (id, y) =>
        val m = train.filter(_._1 == id)
          .map { case (_, s, x) => x * w(s) }.sum
        id -> (r6(1.0 / (1.0 + math.exp(-(m + w(-1L))))), y)
      }
      val grads = train.groupBy(_._2).map { case (s, rows) =>
        s -> r6(rows.map { case (id, _, x) => x * (p(id)._1 - p(id)._2) }
          .sum / n)
      }
      val bg = r6(p.values.map { case (pp, y) => pp - y }.sum / n)
      w = w.map { case (s, ws) =>
        val g = if (s == -1L) bg else grads.getOrElse(s, 0.0)
        s -> r6(ws - eta * g)
      }
    }
    w
  }

  test("fit matches the direct GD loop on 10 random problems") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 10) {
      val dim = 2 + rnd.nextInt(6)
      val nDocs = 5 + rnd.nextInt(20)
      val feats = for {
        id <- 0L until nDocs.toLong
        s <- 0L until dim.toLong if rnd.nextBoolean()
      } yield (id, s, r6(rnd.nextDouble() * 3))
      val labels = (0L until nDocs.toLong)
        .map(id => id -> (if (rnd.nextBoolean()) 1.0 else 0.0)).toMap
      val rounds = 1 + rnd.nextInt(4)
      val got = LogReg.fit(
          feats.toDF("doc_id", "slot", "weight"),
          labels.toSeq.toDF("doc_id", "y"),
          dim, eta = 0.5, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = reference(feats, labels, dim, 0.5, rounds)
      assert(got === want, s"trial $trial dim=$dim rounds=$rounds")
    }
  }

  test("learns a separable problem and scores held-out docs correctly") {
    // feature 0 fires iff positive class
    val feats = (0L until 40L).flatMap { id =>
      val pos = id % 2 == 0
      Seq((id, if (pos) 0L else 1L, 1.0))
    }
    val labels = (0L until 30L).map(id => (id, if (id % 2 == 0) 1.0 else 0.0))
    val w = LogReg.fit(feats.toDF("doc_id", "slot", "weight"),
      labels.toDF("doc_id", "y"), dim = 2, eta = 1.0, rounds = 20)
    val holdout = (30L until 40L).map(Tuple1(_)).toDF("doc_id")
    val pred = LogReg.predict(feats.toDF("doc_id", "slot", "weight"),
        holdout, "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    for (id <- 30L until 40L)
      assert(pred(id) === (id % 2 == 0), s"doc $id")
  }

  test("docs with no active features get the bias-only score") {
    val feats = Seq((1L, 0L, 2.0)).toDF("doc_id", "slot", "weight")
    val labels = Seq((1L, 1.0)).toDF("doc_id", "y")
    val w = LogReg.fit(feats, labels, dim = 1, eta = 0.5, rounds = 2)
    val bias = w.filter(col("slot") === -1).collect().head.getDouble(1)
    val out = LogReg.predict(feats, Seq(Tuple1(9L)).toDF("doc_id"),
      "doc_id", w).collect().head
    assert(out.getDouble(1) === r6(1.0 / (1.0 + math.exp(-bias))))
  }
}
