package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** NFC normalization expression: composed/decomposed convergence.
  * Unicode appears ONLY as \u escapes here — literal chars risk being
  * silently normalized by editors, merging the two test cases. */
class NfcNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val Decomposed = "cafe\u0301"
  private val Composed = "caf\u00e9"

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(NfcNormalize.nfc(col("t")))
      .collect()(0).getString(0)

  test("decomposed sequences compose; already-NFC passes through") {
    assert(Decomposed.length === 5 && Composed.length === 4)
    assert(nfc(Decomposed) === Composed)
    assert(nfc(Composed) === Composed)
    assert(nfc("plain ascii") === "plain ascii")
    // dedup convergence: the two visible-identical forms hash together
    val hashes = Seq(Decomposed, Composed).toDF("t")
      .select(md5(NfcNormalize.nfc(col("t")))).distinct().count()
    assert(hashes === 1)
  }

  test("null propagates; SQL surface registered") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(NfcNormalize.nfc(col("t"))).collect()(0)
    assert(r.isNullAt(0))
    GraftFunctions.register(spark)
    // Spark's chr() is ASCII-mod-256, so the combining char goes into
    // the SQL text directly (via the Scala escape)
    assert(spark.sql(s"SELECT graft_nfc('$Decomposed')")
      .collect()(0).getString(0) === Composed)
  }
}
