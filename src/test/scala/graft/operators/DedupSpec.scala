package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** LSH banding guard rails: the degenerate-bucket cap
  * (Dedup.lshCandidatePairs maxBucketSize) and its no-op behavior on
  * healthy buckets. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def docs(n: Int) = {
    // 2 genuine near-dup docs + n copies of the SAME degenerate text
    // (e.g. empty/boilerplate) that all collide into one band bucket
    val near = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"))
    val degenerate = (10L until (10L + n)).map(i => (i, "boilerplate text"))
    (near ++ degenerate).toDF("doc_id", "text")
  }

  test("degenerate band buckets are capped before the self-join") {
    val d = docs(20)
    val sh = Dedup.shingles(d, "doc_id", "text", n = 3)
    val sig = Dedup.minhashSignature(sh, "doc_id", numHashes = 8)

    val uncapped = Dedup.lshCandidatePairs(sig, "doc_id",
      numHashes = 8, bands = 8, maxBucketSize = 0)
    // 20 identical docs → C(20,2) = 190 pairs, plus the near-dup pair
    assert(uncapped.count() >= 190)

    val capped = Dedup.lshCandidatePairs(sig, "doc_id",
      numHashes = 8, bands = 8, maxBucketSize = 10)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 20-doc bucket is dropped; the small near-dup bucket survives
    assert(cappedPairs.contains((1L, 2L)))
    assert(!cappedPairs.exists { case (a, b) => a >= 10L && b >= 10L })
  }

  test("jaccard pruneToPairDocs (scale knob) returns identical results") {
    val d = docs(8)
    val sh = Dedup.shingles(d, "doc_id", "text", n = 3)
    val sig = Dedup.minhashSignature(sh, "doc_id", numHashes = 8)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8, bands = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = rows(Dedup.jaccard(pairs, sh, "doc_id"))
    val pruned = rows(Dedup.jaccardOpt(pairs, sh, "doc_id",
      cacheDistinct = false, pruneToPairDocs = true))
    assert(plain.nonEmpty && pruned === plain)
  }

  test("connected components: chains merge, separate clusters stay apart") {
    // component {1,2,3,4} as a chain (worst-case diameter) + pair {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
    // reversed edge direction converges to the same labels
    val rev = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("id_a", "id_b")
    val got2 = Dedup.connectedComponents(rev)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("connected components: long chains converge via pointer jumping") {
    // a 41-node chain has diameter 40; one-hop propagation alone needs
    // 40 rounds, pointer jumping covers 2^i hops after i rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(chain, maxIter = 10)
    assert(got.count() === 41)
    assert(got.filter(col("cluster") =!= 0L).isEmpty)
  }

  test("connected components: non-convergence throws, never splits clusters") {
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("oversized-bucket report matches what a cap would drop") {
    val d = docs(20)
    val sh = Dedup.shingles(d, "doc_id", "text", n = 3)
    val sig = Dedup.minhashSignature(sh, "doc_id", numHashes = 8)
    val over = Dedup.lshOversizedBuckets(sig, "doc_id",
      numHashes = 8, bands = 8, maxBucketSize = 10).collect()
    // the 20-doc degenerate text collides in every one of the 8 bands
    assert(over.length === 8)
    assert(over.forall(_.getLong(2) === 20L))
  }

  test("leakage-safe split: dup-cluster members always share a split") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val split = Dedup.leakageSafeSplit(docs, "doc_id",
      Dedup.connectedComponents(pairs))
    assert(split.count() === 40)
    // every cluster maps to exactly one split value
    val perCluster = split.groupBy("cluster")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(perCluster === 0)
    // all three splits appear over 40 singleton-ish clusters
    val splits = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.contains("train"))
    assert(splits.size >= 2)
  }

  test("cap larger than every bucket changes nothing") {
    val d = docs(5)
    val sh = Dedup.shingles(d, "doc_id", "text", n = 3)
    val sig = Dedup.minhashSignature(sh, "doc_id", numHashes = 8)
    val a = Dedup.lshCandidatePairs(sig, "doc_id", 8, 8, maxBucketSize = 0)
      .orderBy("id_a", "id_b").collect().toSeq
    val b = Dedup.lshCandidatePairs(sig, "doc_id", 8, 8, maxBucketSize = 1000)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(a === b)
  }

  test("duplicateSpans merges overlapping duplicated windows into maximal spans") {
    // docs 1 and 2 share the 7-token passage "one two three four five six
    // seven" (3 overlapping 5-grams → ONE span of 7 tokens); their tails
    // differ. doc 3 is unrelated.
    val d = Seq(
      (1L, "one two three four five six seven alpha beta gamma delta eps"),
      (2L, "zz one two three four five six seven yy xx ww vv uu"),
      (3L, "totally different words that appear nowhere else at all here"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq === Seq(
      (1L, 0L, 7L, 3L), // tokens [0,7) = the shared passage, 3 windows
      (2L, 1L, 8L, 3L))) // same passage shifted by the leading "zz"
  }

  test("duplicateSpans: within-doc repetition counts as duplication") {
    val d = Seq(
      (1L, "a b c d e x y z w v a b c d e"), // 5-gram "a b c d e" twice
      (2L, "nothing shared with any other document text"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSet === Set((1L, 0L, 5L), (1L, 10L, 15L)))
  }

  test("duplicateSpans: disjoint spans in one doc stay separate") {
    val d = Seq(
      (1L, "p q r s t MID1 MID2 MID3 u v w x y"),
      (2L, "p q r s t OTHER words here u v w x y"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "doc_id", "text", k = 5)
      .filter($"doc_id" === 1L).orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(spans === Seq((0L, 5L), (8L, 13L)))
  }

  test("removeDuplicateSpans cuts exactly the duplicated passages") {
    val d = Seq(
      (1L, "one two three four five six seven alpha beta gamma delta eps"),
      (2L, "zz one two three four five six seven yy xx ww vv uu"),
      (3L, "totally different words that appear nowhere else at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "alpha beta gamma delta eps", 7L),
      (2L, "zz yy xx ww vv uu", 7L),
      (3L, "totally different words that appear nowhere else at all here", 0L)))
  }

  test("removeDuplicateSpans: fully-duplicated doc empties, dup counts " +
      "spans not docs") {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "", 6L), (2L, "", 6L)))
  }

  test("dropBoilerplateLines: corpus-frequent lines removed in order, " +
      "short lines immune") {
    val banner = "accept all cookies to continue reading"
    val docs = Seq(
      (1L, s"$banner\nunique first body line here\nok\nanother unique line one"),
      (2L, s"$banner\nsecond doc unique content line"),
      (3L, s"unique third doc line of text\n$banner"),
      (4L, s"ok\nfourth doc says something unique"))
      .toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(docs, "doc_id", "text",
      maxOccurrences = 2, minChars = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // banner appears 3× > 2 → boilerplate; "ok" appears 2× but is under
    // minChars so it is NEVER counted, stays verbatim
    assert(out(1L) === ((4L, 1L,
      "unique first body line here\nok\nanother unique line one")))
    assert(out(2L) === ((2L, 1L, "second doc unique content line")))
    assert(out(3L) === ((2L, 1L, "unique third doc line of text")))
    assert(out(4L) === ((2L, 0L, "ok\nfourth doc says something unique")))
  }

  test("crossCorpusNearDups finds batch-vs-reference dups, never " +
      "intra-corpus pairs") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val batch = Seq(
      (1L, text),                               // dup of ref 10
      (2L, text + " slightly changed tail"),    // near-dup of ref 10
      (3L, "completely different content with no overlap whatsoever at all"),
      (4L, text))                               // intra-batch dup of 1 — NOT a result
      .toDF("doc_id", "text")
    val ref = Seq(
      (10L, text),
      (11L, text),                              // intra-ref dup of 10 — NOT a result
      (12L, "unrelated reference material entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.crossCorpusNearDups(batch, ref, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    val pairs = got.map(t => (t._1, t._2)).toSet
    // exact dups score 1.0 against BOTH identical reference docs
    assert(pairs.contains((1L, 10L)) && pairs.contains((1L, 11L)))
    assert(pairs.contains((4L, 10L)) && pairs.contains((4L, 11L)))
    assert(got.filter(t => t._1 == 1L).forall(_._3 == 1.0))
    // the unrelated docs pair with nothing
    assert(!pairs.exists(_._1 == 3L))
    assert(!pairs.exists(_._2 == 12L))
    // never (batch, batch) or (ref, ref): every new_id from the batch,
    // every ref_id from the reference
    assert(pairs.forall { case (a, b) => a <= 4L && b >= 10L })
  }

  test("crossCorpusNearDups: overlapping id spaces stay distinguishable") {
    val batch = Seq((1L, "shared duplicated text body here")).toDF("doc_id", "text")
    val ref = Seq((1L, "shared duplicated text body here")).toDF("doc_id", "text")
    val got = Dedup.crossCorpusNearDups(batch, ref, "doc_id", "text",
        threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1L, 1.0)))
  }

  test("clusterRepresentatives keeps the best-scored member per cluster; " +
      "singletons keep themselves") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    // clusters: {1,2,3} and {4}; 5 is unclustered (singleton)
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("id", "cluster")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.5), (5L, 0.1))
      .toDF("doc_id", "score")
    val out = Dedup.clusterRepresentatives(corpus, "doc_id", scores,
        "score", comps)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(3), r.getBoolean(4))))
      .toMap
    // tie at 0.9 between 2 and 3 → smaller id (2) represents
    assert(out(1L) == ((1L, 2L, false)))
    assert(out(2L) == ((1L, 2L, true)))
    assert(out(3L) == ((1L, 2L, false)))
    assert(out(4L) == ((4L, 4L, true)))  // one-member cluster
    assert(out(5L) == ((5L, 5L, true)))  // unclustered singleton
  }

  test("clusterRepresentatives: docs missing from scores stay in the " +
      "output and rank last") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
    val scores = Seq((2L, 0.1)).toDF("doc_id", "score") // 1 and 3 unscored
    val out = Dedup.clusterRepresentatives(corpus, "doc_id", scores,
        "score", comps)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getBoolean(4), r.isNullAt(2))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // total decision
    assert(out(2L) == ((2L, true, false))) // scored member wins cluster 1
    assert(out(1L) == ((2L, false, true))) // unscored, null score, kept out
    assert(out(3L) == ((3L, true, true)))  // unscored singleton represents
  }
}
