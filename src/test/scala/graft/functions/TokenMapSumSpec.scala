package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Direct Expression-level pins for [[TokenMapSum]] — the frozen-model
  * scoring kernel behind Classify.nbScoreFrozen. The streaming path
  * only ever exercises the codegen'd route; these pin the interpreted
  * `nullSafeEval` twin and every null/duplicate/OOV edge against the
  * join-path semantics the scaladoc promises. */
class TokenMapSumSpec extends SparkSuite {
  import spark.implicits._

  // precomposed e-acute + CJK keys: the probe must compare UTF8 bytes
  private val eAcute = "é"
  private val cjk = "中文"
  private val w = Map("a" -> 3L, "b" -> -5L, eAcute -> 7L, cjk -> 11L)

  private def sumOf(toks: Seq[String], weights: Map[String, Long] = w): Long =
    Seq(Tuple1(toks)).toDF("t")
      .select(TokenMapSum.token_map_sum(col("t"), weights))
      .head().getLong(0)

  test("hits sum, OOV adds 0, duplicates count k times") {
    assert(sumOf(Seq("a", "b")) === -2L)
    assert(sumOf(Seq("a", "zz", "xx")) === 3L)
    assert(sumOf(Seq("a", "a", "a", "b")) === 4L)
    assert(sumOf(Seq.empty) === 0L)
  }

  test("non-ASCII tokens probe by UTF8String equality") {
    assert(sumOf(Seq(eAcute, cjk, "e")) === 18L)
    // a visually-identical but different codepoint sequence is a miss:
    // e + combining acute (NFD) != the precomposed key — the kernel
    // compares bytes, not canonical equivalence
    assert(sumOf(Seq("e\u0301")) === 0L)
  }

  test("null elements add nothing; a null ARRAY is null; empty table") {
    val withNullElem = Seq(Tuple1(Seq(Some("a"), None, Some("b"))))
      .toDF("t")
      .select(TokenMapSum.token_map_sum(col("t"), w)).head()
    assert(!withNullElem.isNullAt(0) && withNullElem.getLong(0) === -2L)
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .select(TokenMapSum.token_map_sum(col("t"), w)).head()
    assert(nullArr.isNullAt(0))
    assert(sumOf(Seq("a", "b"), Map.empty) === 0L)
  }

  test("interpreted nullSafeEval path matches codegen on every edge") {
    val cases = Seq(
      Seq("a", "b", "a"), Seq("zz"), Seq(eAcute, cjk), Seq.empty[String])
    val codegen = cases.map(sumOf(_))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(cases.map(sumOf(_)) === codegen)
      // null-array + null-element edges through the interpreted route
      val r = Seq(
          Tuple1(Seq[Option[String]](Some("a"), None)),
          Tuple1(null.asInstanceOf[Seq[Option[String]]]))
        .toDF("t")
        .select(TokenMapSum.token_map_sum(col("t"), w)).collect()
      assert(r(0).getLong(0) === 3L && r(1).isNullAt(0))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("rejects non-string-array input at analysis time") {
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1, 2))).toDF("t")
        .select(TokenMapSum.token_map_sum(col("t"), w)).head()
    }
    assert(e.getMessage.contains("array<string>") ||
      e.getMessage.contains("token_map_sum"))
  }
}
