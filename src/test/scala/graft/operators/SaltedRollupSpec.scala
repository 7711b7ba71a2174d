package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The salted two-phase rollup must be result-identical to the direct
  * rollup for every aggregator (partial merge is associative), including
  * NaN handling. */
class SaltedRollupSpec extends SparkSuite {
  import spark.implicits._

  private def mkPoints(agg: String) = {
    // one "hot" metric with many points per step + a normal one, NaNs mixed
    val rows =
      (0 until 2000).map(i => ("hot", (i % 120).toLong, i.toDouble)) ++
        Seq(("hot", 5L, Double.NaN), ("cold", 10L, 7.0), ("cold", 70L, 9.0))
    rows.toDF("metric_id", "ts", "value")
      .withColumn("aggregator", lit(agg))
  }

  for (agg <- Seq("average", "total", "minimum", "maximum", "last")) {
    test(s"salted == direct for $agg") {
      val pts = mkPoints(agg)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("metric_id"), col("ts"),
          round(col("value"), 6).as("v"), col("count"))
          .as[(String, Long, Double, Double)].collect()
          .map(t => if (t._3.isNaN) (t._1, t._2, Double.MaxValue, t._4) else t)
          .sortBy(r => (r._1, r._2)).toSeq
      val direct = canon(Downsample.rollupStage(pts, 60))
      val salted = canon(Downsample.rollupStageSalted(pts, 60, saltBuckets = 7))
      assert(salted === direct)
    }
  }
}
