package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BucketIndexSpec extends SparkSuite {
  import spark.implicits._

  test("bucket == count of cuts strictly below v (seeded sweep, incl. dups)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(40)
      // duplicate-heavy cut lists: small value domain
      val cuts = Array.fill(n)((rnd.nextInt(20) - 10).toDouble).sorted
      val v = (rnd.nextInt(24) - 12).toDouble / (1 + rnd.nextInt(2))
      assert(BucketIndex.bucket(cuts, v) === cuts.count(_ < v),
        s"cuts=${cuts.mkString(",")} v=$v")
    }
  }

  test("empty cuts -> 0; NaN -> top bucket (Spark ordering); " +
      "boundaries are exclusive") {
    assert(BucketIndex.bucket(Array.empty[Double], 5.0) === 0)
    assert(BucketIndex.bucket(Array(1.0, 2.0), Double.NaN) === 2)
    // v equal to a cut is NOT above it
    assert(BucketIndex.bucket(Array(1.0, 2.0, 2.0, 3.0), 2.0) === 1)
    assert(BucketIndex.bucket(Array(1.0, 2.0, 2.0, 3.0), 2.5) === 3)
  }

  test("column form matches the fold semantics on a DataFrame, nulls -> 0") {
    val cuts = Seq(10.0, 20.0, 20.0, 30.0)
    val df = Seq(Some(5.0), Some(10.0), Some(15.0), Some(25.0), Some(35.0),
      None, Some(Double.NaN)).toDF("v")
    val got = df.select(
        BucketIndex.bucket_index(col("v").cast("double"), cuts).as("b"))
      .as[Int].collect().toSeq
    // NaN: Spark's ordering (greater than everything) -> top bucket
    val expected = Seq(0, 0, 1, 3, 4, 0, 4)
    assert(got === expected)
    // the fold (when-chain) reference, for the same inputs
    val fold = df.select(cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("v") > c, 1).otherwise(0) }.as("b"))
      .as[Int].collect().toSeq
    assert(fold === expected)
  }
}
