package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** [[WsSplit]] vs Spark's `split(text, "\\s+")` (limit −1): the token
  * ARRAYS must be identical element-for-element — the kernel replaces
  * the regex split in the corpus-wide tokenization convention, so any
  * divergence (leading/trailing empties, non-ASCII whitespace, token
  * count) would silently change every text query. */
class WsSplitSpec extends SparkSuite {
  import spark.implicits._

  private def assertParity(strings: Seq[String]): Unit = {
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val mismatch = df.select(col("id"), col("s"),
        split(col("s"), "\\s+").as("expected"),
        WsSplit.ws_split(col("s")).as("got"))
      .filter(not(col("expected") <=> col("got")))
    val bad = mismatch.collect()
    assert(bad.isEmpty, s"ws_split diverged from split: ${bad.mkString("; ")}")
  }

  test("edge shapes: empties, runs, leading/trailing, all six ws chars") {
    assertParity(Seq(
      "", " ", "  ", "a", "a b", "a  b", " a", "a ", " a ", "  a  b  ",
      "\t", "\n", "", "\f", "\r", "\t\n\f\r ",
      "a\tb\ncd\fe\rfg", "word", "two words",
      "trailing space ", " leading space",
      "\ta\t", "a\r\nb", "mixed \t\n run\r\n end\t"))
  }

  test("non-ASCII: multi-byte chars never split, NBSP is not whitespace") {
    assertParity(Seq(
      "h\u00e9llo w\u00f6rld",
      "h\u00a0i", // NBSP must NOT split (Java \\s is ASCII-only)
      "\u00a0", "a\u00a0b c",
      "\u65e5\u672c\u8a9e \u30c6\u30b9\u30c8",
      "\u65e5\u672c\u8a9e\t\u30c6\u30b9\u30c8",
      "emoji \ud83d\ude00 split",
      "\u03a3\u03af\u03c3\u03c5\u03c6\u03bf\u03c2 \u03a3\u038a\u03a3\u03a5\u03a6\u039f\u03a3",
      "\u0130stanbul \u0131i",
      "combining a\u0301 mark",
      "x\u2028y line separator", // Unicode ws, NOT Java \\s
      "x\u1680y ogham space", // Unicode ws, NOT Java \\s
      "ascii \u00ff \u00fe mixed\u00ad"))
  }

  test("property: random strings over a whitespace-heavy alphabet") {
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "ab \t\n\f\rcd\u00e9\u65e5\u00a0 "
    val strings = (0 until 500).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertParity(strings)
  }

  test("null propagates") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b")))
      .toDF("id", "s")
    val got = df.select(col("id"), WsSplit.ws_split(col("s")).as("t"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).getSeq[String](1) === Seq("a", "b"))
  }

  test("composes under lower(): tokenization convention parity") {
    val df = Seq("The Quick\tBROWN  Fox ", " MiXeD Σ CASE\n")
      .toDF("s")
    val mismatch = df.select(
        split(lower(col("s")), "\\s+").as("expected"),
        WsSplit.ws_split(lower(col("s"))).as("got"))
      .filter(not(col("expected") <=> col("got")))
    assert(mismatch.count() === 0)
  }
}
