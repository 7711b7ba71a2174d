package graft.operators

import graft.SparkSuite

/** BPE training: hand-computed merge sequences on the classic
  * low/lower/newest/widest fixture, frequency weighting, tie-breaks,
  * the deployed-segmenter face, and the documented same-symbol-run
  * variant semantics. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  // low×5 lower×2 newest×6 widest×3 — the Sennrich walk-through shape
  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("merge sequence matches the hand computation, ties break on " +
      "(count desc, lhs, rhs)") {
    val words = Bpe.wordFreqs(corpus, "text")
    val (merges, _) = Bpe.trainMerges(words, rounds = 3)
    val got = merges.orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // round 1: (e,s)=9 ties (s,t)=9 → lhs asc picks (e,s)
    // round 2: (es,t)=9
    // round 3: (l,o)=7 ties (o,w)=7 → (l,o)
    assert(got === Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L)))
  }

  test("segment applies the frozen merges exactly like training did") {
    val words = Bpe.wordFreqs(corpus, "text")
    val (merges, finalReprs) = Bpe.trainMerges(words, rounds = 3)
    val ms = merges.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Bpe.segment(words.select("word"), "word", ms)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val trained = finalReprs.collect()
      .map(r => r.getString(0) -> r.getString(2).trim).toMap
    assert(seg === trained)
    assert(seg("newest") === "n e w est")
    // an UNSEEN word segments with the same merges
    val unseen = Bpe.segment(Seq("lowest").toDF("word"), "word", ms)
      .collect().head.getString(1)
    assert(unseen === "lo w est")
  }

  test("pair counts are weighted by word frequency, not word count") {
    // 'ab'×10 vs 'cd'×1: (a,b) must win though both appear in one word
    val docs = Seq((1L, (Seq.fill(10)("ab") :+ "cd").mkString(" ")))
      .toDF("doc_id", "text")
    val (merges, _) = Bpe.trainMerges(Bpe.wordFreqs(docs, "text"), 1)
    val m = merges.collect().head
    assert((m.getString(1), m.getString(2), m.getLong(4)) === (("a", "b", 10L)))
  }

  test("same-symbol runs: the boundary-sharing replace merges " +
      "non-adjacently (documented variant)") {
    // "aaaa" after merging (a,a): the space-delimited replace cannot
    // match back-to-back occurrences (they share the boundary space),
    // so one round yields [aa, a, a] — deterministic and identical in
    // every engine, unlike canonical BPE's [aa, aa]
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (merges, reprs) = Bpe.trainMerges(Bpe.wordFreqs(docs, "text"), 1)
    assert(merges.collect().head.getString(3) === "aa")
    assert(reprs.collect().head.getString(2).trim === "aa a a")
  }

  test("training stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val (merges, reprs) = Bpe.trainMerges(Bpe.wordFreqs(docs, "text"),
      rounds = 10)
    // (a,b) merges round 1; after that every word is one symbol
    assert(merges.count() === 1L)
    assert(reprs.collect().map(_.getString(2).trim).toSet === Set("ab"))
  }
}
