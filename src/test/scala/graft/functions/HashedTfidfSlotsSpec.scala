package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Direct Expression-level pins for [[HashedTfidfSlots]] — the staging
  * kernel of LogReg.fitText (LogRegSpec pins the end-to-end training
  * trajectory; these pin the kernel against the relational
  * featurization it replaces). */
class HashedTfidfSlotsSpec extends SparkSuite {
  import spark.implicits._

  private def slotsOf(toks: Seq[String], idf: Array[Double])
      : Seq[(Long, Double)] =
    Seq(Tuple1(toks)).toDF("t")
      .select(HashedTfidfSlots.hashed_tfidf_slots(col("t"), idf))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))

  test("entries == the relational explode→pool→round path, ascending") {
    val dim = 16
    val idf = Array.tabulate(dim)(s => 0.1 + s * 0.31)
    val toks = Seq("the", "cat", "sat", "the", "on", "the", "mat", "é")
    // relational reference: slot each token column-side, pool tf,
    // weight = round(tf·idf, 6)
    val ref = toks.map(Tuple1(_)).toDF("term")
      .select(graft.operators.Vectorize.termSlot(col("term"), dim)
        .as("slot"))
      .groupBy("slot").agg(count(lit(1)).as("tf"))
      .collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getLong(1) * idf(r.getLong(0).toInt))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(_._1).toSeq
    assert(slotsOf(toks, idf) === ref)
  }

  test("NaN-idf slots (no corpus df) are omitted — the inner-join drop") {
    val idf = Array(1.0, Double.NaN, 2.0, Double.NaN)
    val toks = (0 until 40).map(i => s"w$i") // covers all 4 slots w.h.p.
    val got = slotsOf(toks, idf)
    assert(got.forall(e => e._1 == 0L || e._1 == 2L), got.toString)
    assert(got.map(_._1) === got.map(_._1).sorted)
  }

  test("empty array → empty; null elements skipped; null ARRAY → null") {
    val idf = Array.fill(8)(1.0)
    assert(slotsOf(Seq.empty, idf) === Seq.empty)
    val withNull = Seq(Tuple1(Seq(Some("a"), None, Some("a")))).toDF("t")
      .select(HashedTfidfSlots.hashed_tfidf_slots(col("t"), idf))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(withNull === slotsOf(Seq("a", "a"), idf))
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .select(HashedTfidfSlots.hashed_tfidf_slots(col("t"), idf))
      .head()
    assert(nullArr.isNullAt(0))
  }

  test("interpreted nullSafeEval matches codegen") {
    val idf = Array.tabulate(8)(s => 0.2 + s * 0.7)
    val cases = Seq(Seq("a", "b", "a"), Seq("中文", "é"), Seq.empty[String])
    val codegen = cases.map(slotsOf(_, idf))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(cases.map(slotsOf(_, idf)) === codegen)
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
