package graft.operators

import graft.SparkSuite

/** Hashed-TF-IDF parity against a direct Scala transcription — local
  * MessageDigest md5 for the slot hash, plain loops for tf/df/idf —
  * on randomized corpora and dims (incl. dim=1 full collision). */
class VectorizePropertySpec extends SparkSuite {
  import spark.implicits._

  private def slot(term: String, dim: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    val v = (0 until 4).map { i =>
      "0123456789abcdef".indexOf(hex(i)).toLong << (4 * (3 - i))
    }.sum
    v % dim
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def reference(docs: Seq[(Long, String)],
      dim: Int): Set[(Long, Long, Double)] = {
    def tok(s: String): Seq[String] = s.toLowerCase.split("\\s+").toSeq
    val tf = docs.flatMap { case (id, t) =>
      tok(t).map(w => (id, slot(w, dim)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = docs.size
    val df = tf.keys.toSeq.map(_._2).groupBy(identity).view
      .mapValues(_.size).toMap
    tf.map { case ((id, s), c) =>
      (id, s, round6(c * math.log(1.0 + n.toDouble / df(s))))
    }.toSet
  }

  test("tfidfSparse matches the direct formula on 25 random corpora") {
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 25) {
      val vocab = (0 until (3 + rnd.nextInt(25))).map(i => s"tok${i}x")
      val docs = (0L until (2 + rnd.nextInt(25)).toLong).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(15))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val dim = Seq(1, 2, 7, 64, 4096)(rnd.nextInt(5))
      val got = Vectorize.tfidfSparse(docs.toDF("doc_id", "text"),
          "doc_id", "text", dim)
        .as[(Long, Long, Double)].collect().toSet
      val want = reference(docs, dim)
      assert(got === want, s"trial $trial dim=$dim docs=${docs.size}")
    }
  }
}
