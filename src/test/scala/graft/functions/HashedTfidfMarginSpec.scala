package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Direct Expression-level pins for [[HashedTfidfMargin]] — the frozen
  * logreg scoring kernel behind LogReg.scoreFrozen (LogRegSpec pins the
  * end-to-end predict() parity; these pin the kernel itself): the slot
  * hash against the column-side termSlot contract, the exact
  * round-then-scale arithmetic against a plain-Scala fold, NaN-idf
  * (no-corpus-df) slots contributing nothing, and the null/empty edges
  * on both the codegen and interpreted routes. */
class HashedTfidfMarginSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 8

  /** The kernel's documented slot contract, computed independently:
    * first two md5 bytes big-endian mod dim. */
  private def slotRef(token: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % dim
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Plain-Scala margin fold with the operator's exact arithmetic:
    * per active slot, floor(round(tf·idf, 6)·w·1e6 + 0.5) summed. */
  private def marginRef(toks: Seq[String], idf: Array[Double],
      w: Array[Double]): Long =
    toks.groupBy(slotRef).collect {
      case (s, ts) if !idf(s).isNaN =>
        math.floor(r6(ts.size * idf(s)) * w(s) * 1e6 + 0.5).toLong
    }.sum

  private def marginOf(toks: Seq[String], idf: Array[Double],
      w: Array[Double]): Long =
    Seq(Tuple1(toks)).toDF("t")
      .select(HashedTfidfMargin.hashed_tfidf_margin(col("t"), idf, w))
      .head().getLong(0)

  test("slot hash matches Vectorize.termSlot column-side") {
    val toks = Seq("the", "cat", "sat", "é", "中文", "", "aardvark")
    val colSide = toks.map(Tuple1(_)).toDF("term")
      .select(graft.operators.Vectorize.termSlot(col("term"), dim))
      .collect().map(_.getLong(0).toInt).toSeq
    assert(colSide === toks.map(slotRef))
  }

  test("margin matches the exact round-then-scale fold on random docs") {
    val rnd = new scala.util.Random(7)
    val idf = Array.tabulate(dim)(s =>
      if (s == 3) Double.NaN else r6(rnd.nextDouble() * 4))
    val w = Array.tabulate(dim)(_ => r6(rnd.nextDouble() * 2 - 1))
    val vocab = Vector("a", "b", "cat", "dog", "é", "xyzzy", "qq", "中")
    for (trial <- 0 until 20) {
      val toks = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      assert(marginOf(toks, idf, w) === marginRef(toks, idf, w),
        s"trial $trial: $toks")
    }
  }

  test("NaN idf slots (no corpus df) contribute nothing") {
    // every slot's idf is NaN -> margin must be 0 whatever the tokens
    val idf = Array.fill(dim)(Double.NaN)
    val w = Array.fill(dim)(5.0)
    assert(marginOf(Seq("a", "b", "c", "a"), idf, w) === 0L)
  }

  test("empty array is 0, null elements skipped, null ARRAY is null") {
    val idf = Array.fill(dim)(1.0)
    val w = Array.fill(dim)(1.0)
    assert(marginOf(Seq.empty, idf, w) === 0L)
    val withNullElem = Seq(Tuple1(Seq(Some("a"), None, Some("a"))))
      .toDF("t")
      .select(HashedTfidfMargin.hashed_tfidf_margin(col("t"), idf, w))
      .head()
    assert(withNullElem.getLong(0) ===
      marginRef(Seq("a", "a"), idf, w))
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .select(HashedTfidfMargin.hashed_tfidf_margin(col("t"), idf, w))
      .head()
    assert(nullArr.isNullAt(0))
  }

  test("histogram survives docs with many distinct slots (every slot " +
      "active, duplicates pooled before rounding)") {
    val rnd = new scala.util.Random(13)
    val idf = Array.tabulate(dim)(s => r6(0.5 + s * 0.25))
    val w = Array.tabulate(dim)(s => r6(1.0 - s * 0.2))
    // enough distinct tokens that all dim slots fire, plus duplicates:
    // pooling-then-rounding differs from per-token rounding, so a
    // per-token kernel would fail this pin
    val toks = (0 until 64).map(i => s"tok$i") ++
      Seq.fill(40)(s"tok${rnd.nextInt(8)}")
    assert(toks.map(slotRef).distinct.size === dim)
    assert(marginOf(toks, idf, w) === marginRef(toks, idf, w))
  }

  test("interpreted nullSafeEval path matches codegen on every edge") {
    val idf = Array(1.5, Double.NaN, 0.7, 2.0, 1.0, 0.1, 3.0, 0.9)
    val w = Array(0.5, 1.0, -0.3, 0.0, 2.0, -1.0, 0.25, 1.1)
    val cases = Seq(Seq("a", "b", "a", "é"), Seq("中文"), Seq.empty[String])
    val codegen = cases.map(marginOf(_, idf, w))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(cases.map(marginOf(_, idf, w)) === codegen)
      val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
        .select(HashedTfidfMargin.hashed_tfidf_margin(col("t"), idf, w))
        .head()
      assert(nullArr.isNullAt(0))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("rejects non-string-array input and mismatched model vectors") {
    val idf = Array.fill(dim)(1.0)
    val w = Array.fill(dim)(1.0)
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1, 2))).toDF("t")
        .select(HashedTfidfMargin.hashed_tfidf_margin(col("t"), idf, w))
        .head()
    }
    assert(e.getMessage.contains("array<string>") ||
      e.getMessage.contains("hashed_tfidf_margin"))
    intercept[IllegalArgumentException] {
      HashedTfidfMargin.hashed_tfidf_margin(col("t"), idf, Array(1.0))
    }
  }
}
