package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Dataset-card corpus profiling: exact mode invariants and the
  * HyperLogLog sketch mode staying within its error bound. */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = {
    // source A: 100 docs, 80 unique (20 exact dups); source B: 50 unique
    val a = (0 until 100).map(i =>
      ("A", s"alpha document number ${i % 80} with some shared words"))
    val b = (0 until 50).map(i =>
      ("B", s"beta text $i of deliberately differing length ${"pad " * (i % 7)}"))
    (a ++ b).toDF("source", "text")
  }

  test("exact card: counts, dup ratio, quantile ordering") {
    val card = Profile.datasetCard(corpus, "source", "text", exact = true)
      .orderBy("source").collect()
    val byName = card.map(r => r.getString(0) -> r).toMap
    val a = byName("A")
    assert(a.getLong(a.fieldIndex("n_docs")) === 100L)
    assert(a.getLong(a.fieldIndex("n_unique")) === 80L)
    assert(a.getDouble(a.fieldIndex("dup_ratio")) === 0.2)
    val b = byName("B")
    assert(b.getLong(b.fieldIndex("n_docs")) === 50L)
    assert(b.getLong(b.fieldIndex("n_unique")) === 50L)
    assert(b.getDouble(b.fieldIndex("dup_ratio")) === 0.0)
    // quantiles are monotone and bounded by the token sums
    for (r <- card) {
      val (p50, p90, p99) = (r.getDouble(r.fieldIndex("p50_tokens")),
        r.getDouble(r.fieldIndex("p90_tokens")),
        r.getDouble(r.fieldIndex("p99_tokens")))
      assert(p50 <= p90 && p90 <= p99)
      assert(r.getDouble(r.fieldIndex("avg_tokens")) > 0)
    }
  }

  test("sketch mode stays within the configured relative error") {
    val exact = Profile.datasetCard(corpus, "source", "text", exact = true)
      .select("source", "n_unique").as[(String, Long)].collect().toMap
    val approx = Profile.datasetCard(corpus, "source", "text",
      exact = false, rsd = 0.05)
      .select("source", "n_unique").as[(String, Long)].collect().toMap
    for ((src, ex) <- exact) {
      val ap = approx(src)
      // HLL++ at rsd=0.05: allow 4 sigma
      assert(math.abs(ap - ex) <= math.max(2, (ex * 0.2).toLong),
        s"$src: approx $ap vs exact $ex")
    }
  }

  test("sketch-mode percentiles track the exact face within one " +
      "inter-element gap; shared columns are identical") {
    val exact = Profile.datasetCard(corpus, "source", "text", exact = true)
      .orderBy("source").collect()
    val approx = Profile.datasetCard(corpus, "source", "text",
      exact = false).orderBy("source").collect()
    for ((e, a) <- exact.zip(approx)) {
      // everything but the sketched stats is the same single pass
      for (c <- Seq("n_docs", "n_bytes", "n_tokens"))
        assert(e.getLong(e.fieldIndex(c)) === a.getLong(a.fieldIndex(c)),
          s"$c drifted between modes")
      assert(e.getDouble(e.fieldIndex("avg_tokens")) ===
        a.getDouble(a.fieldIndex("avg_tokens")))
      // the sketch returns an observed element; the exact percentile
      // interpolates — token counts here are dense (integers a few
      // apart), so agreement within the local gap means within 2
      for (c <- Seq("p50_tokens", "p90_tokens", "p99_tokens")) {
        val (ev, av) = (e.getDouble(e.fieldIndex(c)),
          a.getDouble(a.fieldIndex(c)))
        assert(math.abs(ev - av) <= 2.0, s"$c: sketch $av vs exact $ev")
      }
    }
  }

  test("topTokens: per-group heavy hitters with deterministic ties") {
    val docs = Seq(
      ("en", "the cat and the dog and the cat"),
      ("en", "the bird"),
      ("de", "der der die das das")
    ).toDF("lang", "text")
    val got = Profile.topTokens(docs, "lang", "text", k = 2)
      .orderBy("lang", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // en: the=4, and=2, cat=2, bird=1, dog=1 → (the,4),(and,2) [and<cat]
    // de: der=2, das=2, die=1 → ties at 2 break token-asc: das, der
    assert(got.toSeq === Seq(
      ("de", "das", 2L, 1L), ("de", "der", 2L, 2L),
      ("en", "the", 4L, 1L), ("en", "and", 2L, 2L)))
    intercept[IllegalArgumentException] {
      Profile.topTokens(docs, "lang", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Profile.topTokens(docs, "lang", "text", k = 2, nSalts = 0)
    }
  }

  test("topTokens: salted two-stage is exact — identical result at any " +
      "salt count (tokens never straddle cells)") {
    // zipf-ish vocabulary big enough that salt cells hold distinct slices
    val docs = (0 until 120).flatMap { i =>
      Seq(("en", s"w${i % 37} w${i % 11} w${i % 5} common filler"),
        ("de", s"v${i % 23} v${i % 7} gemein"))
    }.toDF("lang", "text")
    val ref = Profile.topTokens(docs, "lang", "text", k = 7, nSalts = 1)
      .orderBy("lang", "rk").collect().toSeq
    for (s <- Seq(2, 7, 64, 1024)) {
      val got = Profile.topTokens(docs, "lang", "text", k = 7, nSalts = s)
        .orderBy("lang", "rk").collect().toSeq
      assert(got === ref, s"nSalts=$s drifted from unsalted result")
    }
  }

  test("topTokens drops the empty split-artifact token from " +
      "leading/trailing whitespace") {
    val docs = Seq(("en", "  a a b  "), ("en", " a ")).toDF("lang", "text")
    val got = Profile.topTokens(docs, "lang", "text", k = 5)
      .orderBy("rk").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 3L), ("b", 1L)))
  }

  test("corpusDiff classifies added/removed/changed/unchanged per group, " +
      "changed docs counted under the NEW snapshot's group") {
    val a = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "beta"),
      (3L, "s2", "gamma"), (4L, "s2", "delta")
    ).toDF("doc_id", "source", "text")
    val b = Seq(
      (1L, "s1", "alpha"),          // unchanged
      (2L, "s2", "beta EDITED"),    // changed AND re-sliced → counts in s2
      (4L, "s2", "delta"),          // unchanged  (3 removed)
      (9L, "s1", "new doc")         // added
    ).toDF("doc_id", "source", "text")
    val got = Profile.corpusDiff(a, b, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("s1", "unchanged") -> 1L, ("s1", "added") -> 1L,
      ("s2", "changed") -> 1L, ("s2", "unchanged") -> 1L,
      ("s2", "removed") -> 1L))
  }

  test("datasetCardRollup: every ROLLUP level from one pass, subtotals " +
      "as NULLs, counts consistent across levels") {
    val docs = Seq(
      (1L, "web", "en", "a b"), (2L, "web", "en", "a b"),
      (3L, "web", "de", "c"), (4L, "book", "en", "d e f")
    ).toDF("doc_id", "source", "lang", "text")
    val got = Profile.datasetCardRollup(docs, Seq("source", "lang"), "text")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))
        -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // levels: 2 sources × langs (3 cells) + 2 source subtotals + 1 total
    assert(got.size === 6)
    assert(got((Some("web"), Some("en"))) === ((2L, 1L, 4L)))
    assert(got((Some("web"), None)) === ((3L, 2L, 5L)))
    assert(got((None, None)) === ((4L, 3L, 8L)))
  }
}
