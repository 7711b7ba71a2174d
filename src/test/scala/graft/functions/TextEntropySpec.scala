package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Golden tests for the one-pass Shannon-entropy expression. */
class TextEntropySpec extends SparkSuite {
  import spark.implicits._

  private def charH(s: String): Double =
    Seq(s).toDF("t").select(TextEntropy.char_entropy(col("t")))
      .collect()(0).getDouble(0)

  private def tokenH(s: String): Double =
    Seq(s).toDF("t").select(TextEntropy.token_entropy(col("t")))
      .collect()(0).getDouble(0)

  test("char entropy on exact power-of-two distributions") {
    assert(charH("aaaa") === 0.0)
    assert(charH("abab") === 1.0)
    assert(charH("abcd") === 2.0)
    // 2 of one, 1+1 → 1.5 bits
    assert(charH("aabc") === 1.5)
    assert(charH("") === 0.0)
  }

  test("token entropy splits on whitespace, skips empty tokens") {
    assert(tokenH("a a b b") === 1.0)
    assert(tokenH("x x x") === 0.0)
    assert(tokenH("  a   b  ") === 1.0) // leading/multi spaces no-op
  }

  test("null propagates; SQL surface registered") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(TextEntropy.char_entropy(col("t"))).collect()(0)
    assert(r.isNullAt(0))
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_char_entropy('abcd'), graft_token_entropy('a b a b')")
      .collect()(0)
    assert(viaSql.getDouble(0) === 2.0)
    assert(viaSql.getDouble(1) === 1.0)
  }

  test("entropy stays inside whole-stage codegen") {
    val df = spark.range(100).select(
      concat(lit("tok"), col("id") % 7, lit(" filler words here")).as("t"))
    val p = df.select(TextEntropy.char_entropy(col("t")).as("h"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"not codegen'd:\n$p")
    assert(p.contains("graft_char_entropy"), s"expression missing:\n$p")
  }
}
