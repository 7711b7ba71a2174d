package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Native ADC scoring: slot arithmetic, the HOF-parity fold order, and
  * the null contract for malformed code/table pairs. */
class AdcScoreSpec extends SparkSuite {
  import spark.implicits._

  test("score = sum of table[sub*stride + code] in subspace order") {
    // stride 3, m 2: table slots [s0c0, s0c1, s0c2, s1c0, s1c1, s1c2]
    val df = Seq((Seq(1, 2), Seq(10.0, 11.0, 12.0, 20.0, 21.0, 22.0)))
      .toDF("codes", "table")
    val got = df.select(AdcScore.adc_score(col("codes"), col("table"), 3)
      .as("s")).head().getDouble(0)
    assert(got === 11.0 + 22.0)
    // parity with the interpreted HOF form it replaced
    val hof = df.select(aggregate(
      transform(col("codes"), (c, i) => element_at(col("table"), i * 3 + c + 1)),
      lit(0.0), (a, x) => a + x).as("s")).head().getDouble(0)
    assert(got === hof)
  }

  test("null on out-of-range slot, null slot, or null code") {
    val out = Seq((Seq(0, 5), Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("codes", "table")
      .select(AdcScore.adc_score(col("codes"), col("table"), 2).as("s"))
    assert(out.head().isNullAt(0))
    // codes (1, 0) hit raw slots 1 and 2 — slot 1 is the null
    val nullSlot = Seq((Seq(1, 0), Seq[java.lang.Double](1.0, null, 3.0, 4.0)))
      .toDF("codes", "table")
      .select(AdcScore.adc_score(col("codes"), col("table"), 2).as("s"))
    assert(nullSlot.head().isNullAt(0))
  }

  test("code >= stride is null, never a neighboring subspace's slot") {
    // stride 2, codes (3, 0): the raw slot 1+3 = 4 is sub1's c1 slot —
    // still inside the table, so without the explicit code-range check
    // this would silently score the WRONG subspace (7.0) instead of null
    val df = Seq((Seq(3, 0), Seq(1.0, 2.0, 3.0, 4.0))).toDF("codes", "table")
    val viaCodegen = df
      .select(AdcScore.adc_score(col("codes"), col("table"), 2).as("s"))
    assert(viaCodegen.head().isNullAt(0))
    // interpreted path (nullSafeEval → score) must agree
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val got = AdcScore.score(
      new GenericArrayData(Array(3, 0)),
      new GenericArrayData(Array(2.0, 1.0, 2.0, 3.0, 4.0)))
    assert(got === null)
  }

  test("native == interpreted HOF fold on 200 random code/table pairs") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(200) { i =>
      val m = 1 + rnd.nextInt(6)
      val stride = 1 + rnd.nextInt(8)
      val codes = Seq.fill(m)(rnd.nextInt(stride))
      val table = Seq.fill(m * stride)(rnd.nextGaussian())
      (i, stride, codes, table)
    }
    for ((_, stride, _, _) <- rows.groupBy(_._2).map(_._2.head).toSeq) {
      val grp = rows.filter(_._2 == stride).map(r => (r._1, r._3, r._4))
      val df = grp.toDF("i", "codes", "table")
      val native = df
        .select(col("i"), AdcScore.adc_score(col("codes"), col("table"), stride).as("s"))
        .as[(Int, Double)].collect().toMap
      val hof = df.select(col("i"), aggregate(
        transform(col("codes"), (c, j) => element_at(col("table"), j * stride + c + 1)),
        lit(0.0), (a, x) => a + x).as("s")).as[(Int, Double)].collect().toMap
      assert(native === hof, s"stride=$stride")
    }
  }

  test("SQL-registered form matches the column API inside codegen") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(0, 1), Seq(1.5, 2.5, 3.5, 4.5))).toDF("codes", "table")
    df.createOrReplaceTempView("adc_in")
    val viaSql = spark.sql(
      """SELECT graft_adc_score(codes,
        |  concat(array(CAST(2 AS DOUBLE)), table)) AS s
        |FROM adc_in""".stripMargin).head().getDouble(0)
    val viaCol = df.select(AdcScore.adc_score(col("codes"), col("table"), 2)
      .as("s")).head().getDouble(0)
    assert(viaSql === viaCol && viaCol === 1.5 + 4.5)
  }
}
