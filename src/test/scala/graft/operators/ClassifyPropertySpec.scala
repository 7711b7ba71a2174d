package graft.operators

import graft.SparkSuite

/** Naive Bayes parity against a direct Scala transcription of the
  * multinomial-NB math on randomized corpora (the RetrievalPropertySpec
  * pattern): same top-V vocab selection, same Laplace smoothing, same
  * integer-scaled log sums, same (score desc, label asc) argmax. */
class ClassifyPropertySpec extends SparkSuite {
  import spark.implicits._

  private def ln6(x: Double): Long =
    math.floor(math.log(x) * 1e6 + 0.5).toLong

  private def reference(train: Seq[(String, String)],
      test: Seq[(Long, String)], vocabSize: Int,
      alpha: Double): Map[Long, (String, Double)] = {
    def tok(s: String): Seq[String] = s.toLowerCase.split("\\s+").toSeq
    val pairs = train.flatMap { case (l, t) => tok(t).map(l -> _) }
    val vocab = pairs.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(vocabSize).map(_._1).toSet
    val counts = pairs.filter(p => vocab(p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totals = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val classes = train.map(_._1).distinct.sorted
    val nd = train.size
    val prior = classes.map(c =>
      c -> ln6(train.count(_._1 == c).toDouble / nd)).toMap
    val v = vocab.size
    def lik(c: String, t: String): Long =
      ln6((counts.getOrElse((c, t), 0L) + alpha) /
        (totals.getOrElse(c, 0L) + alpha * v))
    test.map { case (id, text) =>
      val hits = tok(text).filter(vocab)
      val scored = classes.map { c =>
        c -> (prior(c) + hits.map(t => lik(c, t)).sum) / 1e6
      }
      val best = scored.minBy { case (c, s) => (-s, c) }
      id -> best
    }.toMap
  }

  test("nbFit/nbPredict match the direct math on 30 random corpora") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 30) {
      val vocabPool = (0 until (5 + rnd.nextInt(15))).map(i => s"w$i")
      val classes = (0 until (2 + rnd.nextInt(3))).map(i => s"c$i")
      val train = (0 until (4 + rnd.nextInt(30))).map { _ =>
        (classes(rnd.nextInt(classes.size)),
          Seq.fill(1 + rnd.nextInt(10))(
            vocabPool(rnd.nextInt(vocabPool.size))).mkString(" "))
      }
      val test_ = (0L until (1 + rnd.nextInt(10)).toLong).map { id =>
        // mix of in-vocab and guaranteed-OOV tokens
        id -> (Seq.fill(rnd.nextInt(8))(
          vocabPool(rnd.nextInt(vocabPool.size))) :+ s"oov$id").mkString(" ")
      }
      val vCap = 1 + rnd.nextInt(vocabPool.size + 3)
      val model = Classify.nbFit(train.toDF("label", "text"),
        "label", "text", vocabSize = vCap, alpha = 1.0)
      val got = Classify.nbPredict(model, test_.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r =>
          r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      val want = reference(train, test_, vCap, alpha = 1.0)
      assert(got === want, s"trial $trial classes=${classes.size} v=$vCap")
    }
  }
}
