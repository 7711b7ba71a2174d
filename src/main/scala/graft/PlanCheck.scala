package graft
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("=== entry rows: " + SparkEntry.entry(spark).count())
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("s5_point_fetch", "f5_glob_predicates", "j1_points_metadata", "a3_downsample")) {
      println(s"=== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
