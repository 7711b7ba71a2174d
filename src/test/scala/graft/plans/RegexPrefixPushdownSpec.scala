package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.glob.Glob

class RegexPrefixLogicSpec extends AnyFunSuite {
  import RegexPrefixPushdown.literalPrefix

  test("literal prefixes extracted from glob-compiled regexes") {
    assert(literalPrefix(Glob.toRegex("sys.cpu.*")) === Some("sys.cpu."))
    assert(literalPrefix(Glob.toRegex("sys.cpu.0.load")) === Some("sys.cpu.0.load"))
    assert(literalPrefix(Glob.toRegex("*.load")) === Some(""))
    assert(literalPrefix(Glob.toRegex("a.{b,c}")) === Some("a."))
    assert(literalPrefix(Glob.toRegex("a.b?")) === Some("a.b"))
    assert(literalPrefix("unanchored") === None)
    // quantifier drops the previous char: ^ab*c → prefix "a"
    assert(literalPrefix("^ab*c$") === Some("a"))
    assert(literalPrefix("^a\\dx$") === Some("a"))
  }

  test("top-level alternation yields no prefix (^ab|cd ≡ (^ab)|(cd))") {
    assert(literalPrefix("^ab|cd") === None)
    assert(literalPrefix("^ab|cd$") === None)
    // escaped pipe is a literal, not an alternation
    assert(literalPrefix("^a\\|b$") === Some("a|b"))
    // pipe inside a character class is a literal
    assert(literalPrefix("^x[|]y$") === Some("x"))
    // pipe inside parens stays branch-local; the prefix before '(' holds
    assert(literalPrefix("^a\\.(b|c)$") === Some("a."))
    assert(literalPrefix(Glob.toRegex("a.{b,c}")) === Some("a."))
    // bare comma outside braces compiles to a top-level '|' (Glob.scala:64)
    assert(literalPrefix(Glob.toRegex("sys.a,other.b")) === None)
  }
}

class RegexPrefixPushdownSpec extends SparkSuite {
  import spark.implicits._

  test("rlike glob filter gains a pushable StartsWith") {
    val dir = java.nio.file.Files.createTempDirectory("rpp").toString
    (0 until 200).map(i => s"sys.cpu.$i.load").toDF("name")
      .write.mode("overwrite").parquet(dir)

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RegexPrefixPushdown
    try {
      val q = spark.read.parquet(dir)
        .filter(col("name").rlike(Glob.toRegex("sys.cpu.1?.load")))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("StringStartsWith(name,sys.cpu.1"), plan.take(2000))
      // results unchanged: 1?.load matches 10..19
      assert(q.count() === 10)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RegexPrefixPushdown)
    }
  }

  test("rule is idempotent (safe under fixed-point batches)") {
    val df = Seq("a.b", "a.c").toDF("name")
      .filter(col("name").rlike(Glob.toRegex("a.*")))
    val once = RegexPrefixPushdown(df.queryExecution.analyzed)
    val twice = RegexPrefixPushdown(once)
    assert(once fastEquals twice)
  }
}
