package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Okapi BM25 top-k retrieval (Retrieval.bm25TopK). */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian")
  ).toDF("doc_id", "text")

  private def queries(qs: (Long, String)*) =
    qs.toDF("query_id", "qtext")

  test("scores match the hand-applied BM25 formula and rank accordingly") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries(10L -> "apple cherry"), "query_id", "qtext", k = 10)
      .select("doc_id", "score", "rk")
      .as[(Long, Double, Int)].collect().sortBy(_._3)

    // N=3, avgdl=3; df(apple)=1, df(cherry)=2 (durian/banana unqueried)
    def idf(df: Long): Double = math.log(1 + (3 - df + 0.5) / (df + 0.5))
    def term(idfV: Double, tf: Long, dl: Long): Double =
      idfV * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
    val expected = Seq(
      1L -> term(idf(1), 2, 3),             // apple twice in doc 1
      3L -> term(idf(2), 3, 4),             // cherry thrice in doc 3
      2L -> term(idf(2), 1, 2))             // cherry once in doc 2
    assert(got.map(_._1).toSeq === expected.map(_._1))
    got.zip(expected).foreach { case ((_, s, _), (_, e)) =>
      assert(math.abs(s - e) < 1e-3, s"score $s vs expected $e")
    }
    assert(got.map(_._3).toSeq === Seq(1, 2, 3))
  }

  test("hybridRrfTopK is row-identical to rrfFuse(bm25TopK, tfidfKnn)") {
    // richer corpus: repeated terms, shared vocabulary, an unmatched doc
    val corpus = Seq(
      (1L, "apple banana apple kiwi"),
      (2L, "banana cherry banana"),
      (3L, "cherry cherry cherry durian"),
      (4L, "kiwi durian apple"),
      (5L, "unrelated filler words only")
    ).toDF("doc_id", "text")
    val qs = queries(10L -> "apple cherry", 11L -> "banana kiwi")
    val lex = Retrieval.bm25TopK(corpus, "doc_id", "text",
      qs, "query_id", "qtext", k = 3)
    val vec = Vectorize.tfidfKnn(corpus, "doc_id", "text",
      qs, "query_id", "qtext", dim = 16, k = 3)
    val twoPass = Retrieval.rrfFuse(Seq(lex, vec), k = 3)
      .orderBy("query_id", "rk")
      .collect().toSeq
    val onePass = Retrieval.hybridRrfTopK(corpus, "doc_id", "text",
        qs, "query_id", "qtext", dim = 16, k = 3)
      .orderBy("query_id", "rk")
      .collect().toSeq
    assert(onePass === twoPass)
  }

  test("duplicate doc ids fail loudly with the id-contract rail on") {
    val dup = Seq((1L, "apple"), (1L, "banana"), (2L, "cherry"))
      .toDF("doc_id", "text")
    spark.conf.set(IdContract.Key, "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Retrieval.bm25TopK(dup, "doc_id", "text",
          queries(1L -> "apple"), "query_id", "qtext", k = 3).collect()
      }
      assert(e.getMessage.contains("duplicate doc_id"))
      val e2 = intercept[IllegalArgumentException] {
        Vectorize.tfidfKnn(dup, "doc_id", "text",
          queries(1L -> "apple"), "query_id", "qtext", dim = 8, k = 3)
          .collect()
      }
      assert(e2.getMessage.contains("duplicate doc_id"))
      val e3 = intercept[IllegalArgumentException] {
        Dsir.importanceWeights(dup, "doc_id", "text", dup.limit(1),
          dim = 8).collect()
      }
      assert(e3.getMessage.contains("duplicate doc_id"))
    } finally spark.conf.unset(IdContract.Key)
    // rail off (the default): the kernel path runs per-row, by contract
    assert(Retrieval.bm25TopK(dup, "doc_id", "text",
      queries(1L -> "apple"), "query_id", "qtext", k = 3)
      .collect().nonEmpty)
  }

  test("a unique term retrieves its own document at rank 1") {
    val corpus = (0L until 20L).map(i =>
      (i, s"common filler words uniq$i here")).toDF("doc_id", "text")
    val qs = queries(100L -> "uniq7", 101L -> "uniq13")
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
        qs, "query_id", "qtext", k = 3)
      .filter(col("rk") === 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(top === Map(100L -> 7L, 101L -> 13L))
  }

  test("identical documents tie on score and break by doc_id") {
    val corpus = Seq(
      (5L, "zebra yak"), (2L, "zebra yak"), (9L, "aardvark")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries(1L -> "zebra"), "query_id", "qtext", k = 10)
      .select("doc_id", "score", "rk").as[(Long, Double, Int)]
      .collect().sortBy(_._3)
    assert(got.length === 2)
    assert(got(0)._1 === 2L && got(1)._1 === 5L)
    assert(got(0)._2 === got(1)._2)
  }

  test("query term frequency is ignored (terms dedup per query)") {
    val q1 = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries(1L -> "cherry"), "query_id", "qtext", k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val q2 = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries(1L -> "cherry cherry cherry"), "query_id", "qtext", k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(q1 === q2)
  }

  test("k caps each query independently") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries(1L -> "cherry banana", 2L -> "apple"),
        "query_id", "qtext", k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(2L) === 1L)
  }

  test("invalid k is rejected") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text",
        queries(1L -> "x"), "query_id", "qtext", k = 0)
    }
  }

  test("persisted index reproduces live scoring exactly") {
    val corpus = (0L until 100L).map(i =>
      (i, s"tok${i % 13} tok${i % 7} shared words tok${i % 31}"))
      .toDF("doc_id", "text")
    val qs = queries(1L -> "tok3 shared", 2L -> "tok11 tok5", 3L -> "absent")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.buildTextIndex(corpus, "doc_id", "text", dir, nBuckets = 16)
    val live = Retrieval.bm25TopK(corpus, "doc_id", "text",
        qs, "query_id", "qtext", k = 7)
      .select("query_id", "doc_id", "score", "rk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val idx = Retrieval.bm25IndexTopK(qs, "query_id", "qtext", dir, k = 7)
      .select("query_id", "doc_id", "score", "rk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(idx === live)
    assert(live.nonEmpty)
  }

  test("append: build(A)+append(B) probes bit-identically to build(A∪B)") {
    val corpus = (0L until 80L).map(i =>
      (i, s"tok${i % 11} tok${i % 5} filler body tok${i % 23}"))
      .toDF("doc_id", "text")
    val (a, bPart) = (corpus.filter($"doc_id" < 50), corpus.filter($"doc_id" >= 50))
    val qs = queries(1L -> "tok3 filler", 2L -> "tok7")
    val full = java.nio.file.Files.createTempDirectory("bm25full").toString
    val inc = java.nio.file.Files.createTempDirectory("bm25inc").toString
    Retrieval.buildTextIndex(corpus, "doc_id", "text", full, nBuckets = 16)
    Retrieval.buildTextIndex(a, "doc_id", "text", inc, nBuckets = 16)
    Retrieval.appendToTextIndex(bPart, "doc_id", "text", inc)
    def probe(dir: String) =
      Retrieval.bm25IndexTopK(qs, "query_id", "qtext", dir, k = 9)
        .select("query_id", "doc_id", "score", "rk")
        .as[(Long, Long, Double, Int)].collect().toSet
    val (pf, pi) = (probe(full), probe(inc))
    assert(pf === pi)
    assert(pf.nonEmpty)
    // appended docs are retrievable
    assert(pf.exists(_._2 >= 50L))
    // the stats file keeps the BUILD's totals (never rewritten); the
    // appended docs' share rides the crash-atomic marker partition and
    // the probe folds the two — so visible N is the full 80
    val stats = spark.read.parquet(s"$inc/stats").head()
    assert(stats.getLong(stats.fieldIndex("__n")) === 50L)
    val m = spark.read.parquet(s"$inc/postings")
      .filter($"term_bucket" === Retrieval.MarkerBucket)
      .agg(sum("__tf")).head()
    assert(m.getLong(0) === 30L)
  }

  test("probing the index reads only the query terms' bucket partitions") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case r: ReusedExchangeExec => allScans(r.child)
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }
      here ++ p.children.flatMap(allScans)
    }
    def postingsFiles(df: DataFrame): Long = {
      df.collect()
      allScans(df.queryExecution.executedPlan)
        .filter(_.metadata.get("Location").exists(_.contains("postings")))
        .map(_.metrics("numFiles").value).sum
    }
    val corpus = (0L until 200L).map(i =>
      (i, s"alpha$i beta${i % 5} gamma")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25prune").toString
    Retrieval.buildTextIndex(corpus, "doc_id", "text", dir, nBuckets = 32)
    val all = {
      val d = spark.read.parquet(s"$dir/postings")
      d.collect()
      allScans(d.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    val probed = postingsFiles(Retrieval.bm25IndexTopK(
      queries(1L -> "alpha17"), "query_id", "qtext", dir, k = 3))
    assert(probed > 0, "no postings scan in the probe plan")
    assert(probed < all, s"expected bucket pruning: $probed !< $all")
  }

  test("rrfFuse matches the hand-computed fixed-point RRF score") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val b = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rk")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rk").as[(Long, Long, Double, Long)].collect().toSeq
    def f(rks: Long*): Double =
      rks.map(r => 1000000000L / (60L + r)).sum / 1e9
    // doc 11: ranks 2 and 1 — tops both single-list leaders
    assert(got.map(_._2) === Seq(11L, 10L, 13L, 12L))
    assert(got.map(_._3) === Seq(f(2, 1), f(1), f(2), f(3)))
    assert(got.map(_._4) === Seq(1L, 2L, 3L, 4L))
  }

  test("rrfFuse ties break by doc_id and k caps per query") {
    val a = Seq((1L, 5L, 1L), (1L, 6L, 1L), (2L, 7L, 1L), (2L, 8L, 2L))
      .toDF("query_id", "doc_id", "rk")
    val got = Retrieval.rrfFuse(Seq(a), k = 1)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2)) === Set((1L, 5L), (2L, 7L)))
  }

  test("phraseSearch: order-sensitive, counts overlaps, 0-based pos") {
    val docs = Seq(
      (1L, "new york is in new york state"),
      (2L, "york new has the words reversed"),
      (3L, "a new day in york"),
      (4L, "x new york new york new york y")).toDF("doc_id", "text")
    val qs = Seq((100L, "new york")).toDF("query_id", "qtext")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
        qs, "query_id", "qtext")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 2 (reversed) and doc 3 (non-adjacent) must NOT match
    assert(got === Seq(
      (100L, 1L, 2L, 0L),   // "new york ... new york", first at pos 0
      (100L, 4L, 3L, 1L)))  // three occurrences starting at pos 1
  }

  test("phraseSearch: repeated-term phrases count overlapping starts") {
    val docs = Seq((1L, "go go go stop")).toDF("doc_id", "text")
    val qs = Seq((7L, "go go")).toDF("query_id", "qtext")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
        qs, "query_id", "qtext")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 1L, 2L, 0L)))
  }

  test("phraseIndexSearch reproduces phraseSearch bit for bit") {
    val corpus = Seq(
      (1L, "new york is in new york state"),
      (2L, "york new has the words reversed"),
      (3L, "a new day in york"),
      (4L, "x new york new york new york y"),
      (5L, "go go go stop"),
      (6L, "unrelated filler text entirely")).toDF("doc_id", "text")
    val qs = Seq((100L, "new york"), (101L, "go go"), (102L, "absent phrase"))
      .toDF("query_id", "qtext")
    val dir = java.nio.file.Files.createTempDirectory("phraseidx").toString
    Retrieval.buildPhraseIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    val live = Retrieval.phraseSearch(corpus, "doc_id", "text",
        qs, "query_id", "qtext")
      .orderBy("query_id", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val indexed = Retrieval.phraseIndexSearch(qs, "query_id", "qtext", dir)
      .orderBy("query_id", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(indexed === live)
    assert(live.nonEmpty)

    // the probe reads ONLY the phrase terms' term-bucket partitions
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case r: ReusedExchangeExec => allScans(r.child)
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }
      here ++ p.children.flatMap(allScans)
    }
    val full = spark.read.parquet(s"$dir/postings")
    full.collect()
    val all = allScans(full.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    val probe = Retrieval.phraseIndexSearch(
      Seq((100L, "new york")).toDF("query_id", "qtext"), "query_id",
      "qtext", dir)
    probe.collect()
    val probed = allScans(probe.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
      .map(_.metrics("numFiles").value).sum
    assert(probed > 0, "no postings scan found in the probe plan")
    assert(probed < all, s"expected partition pruning: $probed !< $all")
  }
}
