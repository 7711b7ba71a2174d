package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Golden tests for URL canonicalization/dedup and token-window
  * chunking. */
class UrlsAndChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(Urls.canonicalizeUrl(col("url"))).collect()(0).getString(0)

  test("canonicalizeUrl applies every normalization rule") {
    // scheme case + www + default port + trailing slash + fragment
    assert(canon("HTTPS://WWW.Ex.COM:443/A/b/#frag") === "ex.com/A/b")
    assert(canon("http://ex.com:80/A/b") === "ex.com/A/b")
    // scheme variants collapse
    assert(canon("https://ex.com/x") === canon("http://ex.com/x"))
    // tracking params dropped, survivors sorted
    assert(canon("http://ex.com/p?utm_source=f&b=2&a=1&gclid=9")
      === "ex.com/p?a=1&b=2")
    assert(canon("http://ex.com/p?b=2&a=1")
      === canon("http://ex.com/p?a=1&b=2"))
    // all-tracking query disappears entirely
    assert(canon("http://ex.com/p?utm_campaign=x") === "ex.com/p")
    // path case preserved (RFC 3986: only scheme+host case-insensitive)
    assert(canon("http://EX.com/CaseSensitive") === "ex.com/CaseSensitive")
    // non-default port kept
    assert(canon("http://ex.com:8080/p") === "ex.com:8080/p")
    // bare host
    assert(canon("http://ex.com") === "ex.com")
    // an embedded URL in the query must NOT hijack the host split
    assert(canon("http://a.com/login?next=https://b.com/home")
      === "a.com/login?next=https://b.com/home")
    // ... and the canonical (schemeless) form must be a FIXED POINT —
    // the embedded '://' is not in scheme position, so no re-split
    assert(canon("a.com/login?next=https://b.com/home")
      === "a.com/login?next=https://b.com/home")
    assert(canon("a.com/p?u=https://b.com/x") === "a.com/p?u=https://b.com/x")
    // authority-only URL with a query and NO path: the host must end at
    // the '?', so tracking params die, survivors sort, default port and
    // www strip — and it collapses onto its '/'-path twin
    assert(canon("http://Ex.COM?utm_x=1&b=2&a=1") === "ex.com?a=1&b=2")
    assert(canon("HTTPS://WWW.ex.com:443?b=2&a=1") === "ex.com?a=1&b=2")
    assert(canon("http://ex.com/?b=2&a=1") === "ex.com?a=1&b=2")
    assert(canon("http://ex.com?utm_only=1") === "ex.com")
    // idempotence for the schemeless authority-only form too
    assert(canon("ex.com?a=1&b=2") === "ex.com?a=1&b=2")
  }

  test("dedupByUrl keeps the longest doc per canonical URL") {
    val docs = Seq(
      (1L, "http://a.com/x", 100L),
      (2L, "HTTPS://WWW.A.com/x/", 300L), // same canonical, longer → kept
      (3L, "http://a.com/x?utm_source=f", 300L), // tie on 300 → id 2 wins
      (4L, "http://b.com/y", 50L))
      .toDF("doc_id", "url", "n_chars")
    val out = Urls.dedupByUrl(docs)
      .select("doc_id", "kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out === Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1)))
    val canonOf = Urls.dedupByUrl(docs).filter(col("doc_id") <= 3)
      .select("canon_url").distinct().collect()
    assert(canonOf.length === 1) // all three collapse onto a.com/x
  }

  test("chunkWindows: strided overlapping windows, short tail kept") {
    val docs = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.chunkWindows(docs, "doc_id", "text",
        window = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // starts 0,3,6,9: windows [t1..t4] [t4..t7] [t7..t10] [t10]
    assert(out === Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    val hashes = Packing.chunkWindows(docs, "doc_id", "text", 4, 3)
      .select("chunk_hash").collect().map(_.getString(0)).toSeq
    assert(hashes.distinct.length === 4)
  }

  test("chunkWindows: doc shorter than one window is one chunk") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Packing.chunkWindows(docs, "doc_id", "text", 128, 64).collect()
    assert(out.length === 1)
    assert(out(0).getLong(3) === 3L)
  }

  test("chunkWindows: empty/whitespace docs emit zero chunks") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real text here"))
      .toDF("doc_id", "text")
    val out = Packing.chunkWindows(docs, "doc_id", "text", 128, 64)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out === Seq(3L)) // no phantom md5('') chunk for 1 and 2
  }

  test("property: canonicalizeUrl is idempotent and variant-invariant") {
    // cross product of URL shape variants — every combination must
    // collapse onto one canonical form, and re-canonicalizing the
    // canonical form must be a fixed point
    val variants = for {
      scheme <- Seq("http://", "HTTPS://", "https://WWW.")
      host <- Seq("Ex.COM", "ex.com:443", "www.ex.com:80")
      path <- Seq("/A/b", "/A/b/")
      q <- Seq("", "?b=2&a=1", "?a=1&utm_x=9&b=2", "?utm_only=1")
      frag <- Seq("", "#sec")
    } yield scheme + host + path + q + frag
    val df = variants.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val once = df.select(col("id"), Urls.canonicalizeUrl(col("url")).as("c1"))
    val twice = once.select(col("id"),
      col("c1"), Urls.canonicalizeUrl(col("c1")).as("c2"))
    assert(twice.filter(col("c1") =!= col("c2")).count() === 0,
      "canonicalization must be idempotent")
    // the staged (projected-intermediate) form must agree with the
    // single-Column form on every variant
    val staged = Urls.withCanonicalUrl(df, "url", "cs")
    assert(staged.join(once, "id")
      .filter(col("cs") =!= col("c1")).count() === 0,
      "withCanonicalUrl must equal canonicalizeUrl")
    // variants differ only in tracked noise + query presence → exactly
    // two canonical forms per path shape: with and without ?a=1&b=2
    val canon = once.select("c1").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(canon === Seq("ex.com/A/b", "ex.com/A/b?a=1&b=2"))
  }

  test("property: chunk starts step by stride and cover every token") {
    val docs = (1L to 50L).map(i =>
      (i, (0 until (i * 7 % 301).toInt.max(1)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val window = 32; val stride = 16
    val chunks = Packing.chunkWindows(docs, "doc_id", "text", window, stride)
    val byDoc = chunks.groupBy("doc_id").agg(
      min("tok_start").as("lo"),
      max(col("tok_start") + col("n_tokens")).as("covered"),
      count(lit(1)).as("n_chunks"),
      max("tok_start").as("last_start"))
    val toks = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
    val joined = byDoc.join(toks, "doc_id")
    // first chunk starts at 0; the last chunk reaches the final token;
    // starts are on the stride grid so nothing is skipped
    assert(joined.filter(col("lo") =!= 0).count() === 0)
    assert(joined.filter(col("covered") =!= col("n")).count() === 0)
    assert(joined.filter(col("last_start") % stride =!= 0).count() === 0)
    assert(joined.filter(
      col("n_chunks") =!= (greatest(col("n") - 1, lit(0L)) / stride + 1)
        .cast("long")).count() === 0)
  }
}
