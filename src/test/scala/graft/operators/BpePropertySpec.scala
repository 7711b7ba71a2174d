package graft.operators

import graft.SparkSuite

/** BPE parity against a direct Scala loop on randomized corpora: same
  * word-frequency counting, same pair weighting, same (count desc, l,
  * r) argmax, and the SAME boundary-safe literal-replace semantics
  * (java.lang.String.replace — the non-overlapping left-to-right
  * contract Spark's StringReplace and DuckDB's replace() implement).
  * Small alphabets force repeated-symbol runs and back-to-back merge
  * occurrences, the edge class where the variant semantics live. */
class BpePropertySpec extends SparkSuite {
  import spark.implicits._

  /** (merges, final padded reprs) by the obviously-correct loop. */
  private def reference(words: Map[String, Long],
      rounds: Int): (Seq[(Long, String, String, String, Long)],
        Map[String, String]) = {
    var reprs = words.map { case (w, f) =>
      w -> (" " + w.toCharArray.mkString(" ") + " ", f)
    }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (repr, f)) <- reprs) {
        val syms = repr.trim.split(" ")
        for (i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), cnt) = counts.toSeq
          .minBy { case ((l, rr), c) => (-c, l, rr) }
        merges += ((r.toLong, l, rr, l + rr, cnt))
        reprs = reprs.map { case (w, (repr, f)) =>
          w -> (repr.replace(s" $l $rr ", s" ${l + rr} "), f)
        }
        r += 1
      }
    }
    (merges.toSeq, reprs.map { case (w, (repr, _)) => w -> repr })
  }

  test("trainMerges matches the direct loop on 20 random corpora " +
      "(small alphabets: runs + adjacent occurrences)") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 20) {
      val alphabet = "ab" + ("cdef".take(rnd.nextInt(4)))
      val words = (0 until (3 + rnd.nextInt(12))).map { _ =>
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val freqs = Bpe.wordFreqs(docs, "text")
      val rounds = 1 + rnd.nextInt(6)
      val (gotM, gotR) = Bpe.trainMerges(freqs, rounds)
      val wantFreqs = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val (wantM, wantR) = reference(wantFreqs, rounds)
      val gm = gotM.orderBy("round").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4))).toSeq
      assert(gm === wantM, s"trial $trial words=$words rounds=$rounds")
      val gr = gotR.collect().map(r =>
        r.getString(0) -> r.getString(2)).toMap
      assert(gr === wantR, s"trial $trial reprs")
      // the deployed segmenter reproduces training's final reprs
      val seg = Bpe.segment(freqs.select("word"), "word",
          gm.map(m => (m._2, m._3)))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(seg === wantR.map { case (w, r) => w -> r.trim })
    }
  }
}
