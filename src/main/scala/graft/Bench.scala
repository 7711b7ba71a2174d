package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Headline set = the operators that dominate the reference's runtime
  * envelope (BASELINE.md): downsampling, read-time grouping, glob find,
  * plus the heaviest pipeline operators (minhash LSH, brute knn).
  */
object Bench {
  private val Headline = Seq(
    "a1_aggregators", "a3_downsample", "a3_downsample_2stage",
    "a5_pointgrouper", "a7_dense_spine", "a11_clusters_diff",
    "f5_glob_predicates", "j1_points_metadata",
    "d2_minhash_lsh", "d3_simhash", "d4_ngram_jaccard",
    "k1_knn_brute", "t2_quality", "w2_topk_per_group")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    // one warm-up pass over a tiny query to absorb JVM/codegen startup
    queries("f10_result_cap")(spark, sfDir).count()
    val results = Headline.filter(queries.contains).map { name =>
      val t0 = System.nanoTime()
      val n = try queries(name)(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L
      }
      name -> ((System.nanoTime() - t0) / 1e9, n)
    }
    val qs = results.map { case (k, (sec, _)) => s""""$k":$sec""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
