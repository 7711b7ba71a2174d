package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training: seed inventory, greedy-by-density
  * segmentation, EM count/prune rounds, and the frozen-deploy face. */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private def freqs(ws: (String, Long)*) = ws.toSeq.toDF("word", "freq")

  test("segmentation covers every word exactly (pieces rebuild the word)") {
    val words = freqs(("abcde", 3L), ("aa", 2L), ("zzz", 1L), ("x", 1L))
    val vocab = Unigram.train(words, rounds = 2, keepMulti = 4)
    val seg = Unigram.segment(words, "word", vocab)
      .select(col("word"), regexp_replace(col("segmented"), " ", "").as("glued"))
      .collect()
    assert(seg.nonEmpty)
    seg.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("greedy walk takes the densest matching piece, ties to the longer") {
    // hand inventory: logp chosen so 'ab' (per-char -1e6) beats 'a'+'b'
    // (per-char -3e6 each) but 'cd' (-8e6 per char) loses to singles
    val vocab = Seq(
      ("a", 1, -3000000L), ("b", 1, -3000000L), ("c", 1, -3000000L),
      ("d", 1, -3000000L), ("ab", 2, -2000000L), ("cd", 2, -16000000L)
    ).toDF("piece", "l", "logp")
    val seg = Unigram.segment(Seq("abcd").toDF("w"), "w", vocab)
      .collect().head.getString(1)
    assert(seg == "ab c d")
  }

  test("train keeps all single chars plus at most keepMulti multis") {
    val words = freqs(("banana", 5L), ("bandana", 3L), ("ana", 2L))
    val vocab = Unigram.train(words, rounds = 2, keepMulti = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val singles = vocab.filter(_._2 == 1).map(_._1).toSet
    assert(singles == Set("a", "b", "d", "n")) // the corpus alphabet
    assert(vocab.count(_._2 >= 2) <= 2)
    // multis consumed by the final E-step carry positive counts
    assert(vocab.filter(_._2 >= 2).forall(_._3 >= 0))
  }

  test("logp is the integer-scaled Laplace form over the kept inventory") {
    val words = freqs(("ab", 1L))
    // seed inventory: a(1), b(1), ab(1); round counts from greedy walks
    val vocab = Unigram.train(words, rounds = 1, keepMulti = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // after the E-step the whole word segments as the densest cover;
    // verify the M-step logp against the closed form for each row
    val total = vocab.values.map(_._1).sum
    val nv = vocab.size
    vocab.foreach { case (_, (c, lp)) =>
      val want = math.floor(
        math.log((c + 1.0) / (total + nv)) * 1e6 + 0.5).toLong
      assert(lp == want)
    }
  }

  test("training is deterministic under repartitioning") {
    val words = freqs(("banana", 5L), ("bandana", 3L), ("ana", 2L),
      ("nab", 1L), ("band", 4L))
    def run(parts: Int) =
      Unigram.train(words.repartition(parts), rounds = 2, keepMulti = 3)
        .orderBy("piece")
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(run(1) == run(7))
  }

  test("empty and single-char words are handled; empty words drop") {
    val words = freqs(("", 9L), ("q", 2L))
    val vocab = Unigram.train(words, rounds = 1, keepMulti = 2)
      .collect().map(_.getString(0)).toSet
    assert(vocab == Set("q"))
    val seg = Unigram.segment(words, "word", vocab.toSeq.toDF("piece")
        .withColumn("l", lit(1)).withColumn("logp", lit(-1000000L)))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(seg.toSeq == Seq(("q", "q")))
  }

  test("deploy-time out-of-alphabet chars segment as single raw chars") {
    // inventory trained on 'ab' only; 'xaby' carries unseen x/y — the
    // walk must stay total and emit them as their own pieces
    val vocab = Seq(("a", 1, -2000000L), ("b", 1, -2000000L),
      ("ab", 2, -1000000L)).toDF("piece", "l", "logp")
    val seg = Unigram.segment(Seq("xaby", "zz").toDF("w"), "w", vocab)
      .orderBy("word")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(seg == Seq(("xaby", "x ab y"), ("zz", "z z")))
  }

  test("EM re-estimation moves probability to consumed pieces") {
    // seed counts give 'an'/'na'/'ana'... many overlapping multis; after
    // an E-step only CONSUMED pieces keep counts, so the round-2
    // inventory's multi set is a subset of the greedy-used pieces
    val words = freqs(("banana", 5L), ("bandana", 3L))
    val v1 = Unigram.train(words, rounds = 2, keepMulti = 16)
    val multisKept = v1.filter(length(col("piece")) >= 2)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    // every kept multi with cnt>0 must actually appear in the final
    // segmentation of the corpus
    val segPieces = Unigram.segment(words, "word", v1)
      .select(explode(split(col("segmented"), " ")).as("p"))
      .collect().map(_.getString(0)).toSet
    multisKept.filter(_._2 > 0).foreach { case (p, _) =>
      assert(segPieces.contains(p), s"kept multi $p not used")
    }
  }
}
