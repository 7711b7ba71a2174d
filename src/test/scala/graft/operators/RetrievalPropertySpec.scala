package graft.operators

import graft.SparkSuite

/** BM25 parity against a direct Scala transcription of the Okapi
  * formula on randomized corpora — the SeriesWindowPropertySpec
  * pattern: the plan-shaped implementation must agree with the
  * obviously-correct loop, scores and ranks alike. */
class RetrievalPropertySpec extends SparkSuite {
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  /** Plain-Scala BM25 over tokenized docs: top-k (doc, score4) per
    * query, ranked by (score desc, doc asc). */
  private def reference(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Double, Int)] = {
    def tok(s: String): Seq[String] = s.toLowerCase.split("\\s+").toSeq
    val toks = docs.map { case (id, t) => id -> tok(t) }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def round(v: Double, p: Int): BigDecimal =
      BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP)
    queries.flatMap { case (qid, qt) =>
      val terms = tok(qt).distinct
      val df = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
      val scored = toks.keys.toSeq.flatMap { did =>
        val dl = toks(did).size
        val ts = terms.flatMap { t =>
          val tf = toks(did).count(_ == t)
          if (tf == 0 || df(t) == 0) None
          else {
            val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
            Some(round(idf * tf * (k1 + 1) /
              (tf + k1 * (1 - b + b * dl / avgdl)), 6))
          }
        }
        if (ts.isEmpty) None
        else Some(did -> round(ts.sum.toDouble, 4).toDouble)
      }
      scored.sortBy { case (did, s) => (-s, did) }.take(k).zipWithIndex
        .map { case ((did, s), i) => (qid, did, s, i + 1) }
    }.toSet
  }

  test("bm25TopK matches the direct formula on 30 random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val vocab = (0 until (5 + rnd.nextInt(20))).map(i => s"w$i")
      val docs = (0L until (3 + rnd.nextInt(30)).toLong).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(12))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val queries = (100L until (101 + rnd.nextInt(3)).toLong).map { qid =>
        qid -> Seq.fill(1 + rnd.nextInt(4))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val k = 1 + rnd.nextInt(6)
      val got = Retrieval.bm25TopK(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          queries.toDF("query_id", "qtext"), "query_id", "qtext", k)
        .as[(Long, Long, Double, Int)].collect().toSet
      val want = reference(docs, queries, k)
      assert(got === want, s"trial $trial docs=${docs.size} k=$k")
    }
  }
}
