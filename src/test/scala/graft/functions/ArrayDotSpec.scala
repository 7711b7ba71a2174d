package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Native array_dot vs the HOF reference form: bit-identical results on
  * every edge the HOF can produce. */
class ArrayDotSpec extends SparkSuite {
  import spark.implicits._

  private def hofDot = (x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column) =>
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("matches the HOF fold bit-for-bit on float arrays") {
    val df = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(j => (math.sin(i * 17 + j) * 3).toFloat),
        Array.tabulate(16)(j => (math.cos(i * 31 + j) * 2).toFloat))
    }.toDF("id", "a", "b")
    val got = df.select(
      ArrayDot.array_dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(got.count() === 0)
  }

  test("int arrays and mixed float/double match the HOF") {
    val df = Seq((Array(1, -2, 3), Array(4, 5, -6))).toDF("a", "b")
    val r = df.select(ArrayDot.array_dot(col("a"), col("b")).as("n"),
      hofDot(col("a"), col("b")).as("h")).head()
    assert(r.getDouble(0) === r.getDouble(1))
    val mixed = Seq((Array(0.5f, 2f), Array(1.5, -0.25))).toDF("a", "b")
    val m = mixed.select(ArrayDot.array_dot(col("a"), col("b")).as("n"),
      hofDot(col("a"), col("b")).as("h")).head()
    assert(m.getDouble(0) === m.getDouble(1))
  }

  test("edge cases: empty → 0.0, unequal/null-element/null array → null") {
    val empty = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    assert(empty.select(ArrayDot.array_dot(col("a"), col("b")))
      .head().getDouble(0) === 0.0)

    val unequal = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(unequal.select(ArrayDot.array_dot(col("a"), col("b")))
      .head().isNullAt(0))

    val nullElem = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))))
      .toDF("a", "b")
    assert(nullElem.select(ArrayDot.array_dot(col("a"), col("b")))
      .head().isNullAt(0))

    val nullArr = Seq((null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("a", "b")
    assert(nullArr.select(ArrayDot.array_dot(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("interpreted eval path agrees with codegen") {
    // force the interpreted path by evaluating via an RDD-free local
    // relation with codegen disabled
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)))
        .toDF("a", "b")
      val v = df.select(ArrayDot.array_dot(col("a"), col("b")))
        .head().getDouble(0)
      assert(v === (1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
