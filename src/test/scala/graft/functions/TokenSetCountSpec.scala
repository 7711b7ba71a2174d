package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Direct Expression-level pins for [[TokenSetCount]] — the one-pass
  * stopword/marker counter behind the quality gate and language-ID
  * features. Pins the exact-parity contract against the HOF form it
  * replaced and the interpreted `nullSafeEval` twin the hot path never
  * runs. */
class TokenSetCountSpec extends SparkSuite {
  import spark.implicits._

  private val words = Seq("the", "a", "und", "été")

  private def countOf(toks: Seq[String]): Int =
    Seq(Tuple1(toks)).toDF("t")
      .select(TokenSetCount.token_set_count(col("t"), words))
      .head().getInt(0)

  /** The HOF form the kernel replaced: Σ_w size(filter(toks, _ === w)). */
  private def hofCount(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    words.map(w => size(filter(c, t => t === w)))
      .reduce(_ + _)

  test("membership hits count, duplicates count k times, OOV adds 0") {
    assert(countOf(Seq("the", "cat", "a")) === 2)
    assert(countOf(Seq("the", "the", "the")) === 3)
    assert(countOf(Seq("cat", "dog")) === 0)
    assert(countOf(Seq.empty) === 0)
    assert(countOf(Seq("été", "ete")) === 1)
  }

  test("exact parity with the HOF sum on generated token arrays") {
    val pool = Vector("the", "a", "und", "cat", "dog", "été", "x")
    val rows = (0 until 40).map { i =>
      Tuple1(Seq.tabulate(i % 11)(j => pool((i * 7 + j * 3) % pool.size)))
    }
    val mismatches = rows.toDF("t")
      .select(TokenSetCount.token_set_count(col("t"), words).as("native"),
        hofCount(col("t")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(mismatches.count() === 0)
  }

  test("null elements match nothing (HOF parity); null ARRAY is null") {
    // HOF: t === w on a null element is null → filter drops it
    val df = Seq(Tuple1(Seq(Some("the"), None, Some("a")))).toDF("t")
    val r = df.select(TokenSetCount.token_set_count(col("t"), words).as("n"),
      hofCount(col("t")).as("h")).head()
    assert(r.getInt(0) === 2 && r.getInt(0) === r.getInt(1))
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .select(TokenSetCount.token_set_count(col("t"), words)).head()
    assert(nullArr.isNullAt(0))
  }

  test("interpreted nullSafeEval path matches codegen") {
    val cases = Seq(Seq("the", "the", "a"), Seq("cat"),
      Seq("été"), Seq.empty[String])
    val codegen = cases.map(countOf)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(cases.map(countOf) === codegen)
      val r = Seq(
          Tuple1(Seq[Option[String]](Some("the"), None)),
          Tuple1(null.asInstanceOf[Seq[Option[String]]]))
        .toDF("t")
        .select(TokenSetCount.token_set_count(col("t"), words)).collect()
      assert(r(0).getInt(0) === 1 && r(1).isNullAt(0))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("constructor refuses empty and duplicate word lists; analysis " +
      "refuses non-string arrays") {
    intercept[IllegalArgumentException] {
      TokenSetCount.token_set_count(col("t"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TokenSetCount.token_set_count(col("t"), Seq("a", "a"))
    }
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1, 2))).toDF("t")
        .select(TokenSetCount.token_set_count(col("t"), words)).head()
    }
    assert(e.getMessage.contains("array<string>") ||
      e.getMessage.contains("token_set_count"))
  }
}
