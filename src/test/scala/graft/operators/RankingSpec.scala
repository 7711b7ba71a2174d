package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSuite

/** Exact global row_number / ntile from a range shuffle (Ranking). */
class RankingSpec extends SparkSuite {
  import spark.implicits._

  // deterministic pseudo-random rows with duplicate sort values, shuffled
  // across partitions
  private def rows(n: Int) = (0 until n)
    .map(i => ((i * 7919) % 97, i.toLong))
    .toDF("v", "id")
    .repartition(5, col("id"))

  test("global row_number equals the single-window rank, any size") {
    for (n <- Seq(0, 1, 4, 1000)) {
      val df = rows(n)
      val got = Ranking.withGlobalRowNumber(df, "rn",
          col("v").asc, col("id").asc)
        .select("v", "id", "rn").as[(Int, Long, Long)]
        .collect().sortBy(_._3)
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(col("v").asc, col("id").asc)))
        .select("v", "id", "rn").as[(Int, Long, Int)]
        .collect().sortBy(_._3)
      assert(got.map(t => (t._1, t._2, t._3)).toSeq ===
        want.map(t => (t._1, t._2, t._3.toLong)).toSeq, s"n=$n")
    }
  }

  test("descending sort keys rank correctly") {
    val got = Ranking.withGlobalRowNumber(rows(50), "rn",
        col("v").desc, col("id").desc)
      .select("v", "id", "rn").as[(Int, Long, Long)].collect()
    val sorted = got.sortBy(t => (-t._1, -t._2))
    assert(sorted.map(_._3).toSeq === (1L to 50L).toSeq)
  }

  test("global ntile matches SQL NTILE semantics, any size and n") {
    for (n <- Seq(1, 9, 10, 11, 100); buckets <- Seq(1, 3, 4)) {
      val df = rows(n)
      val got = Ranking.withGlobalNtile(df, buckets, "b",
          col("v").asc, col("id").asc)
        .select("id", "b").as[(Long, Long)].collect().toMap
      val want = df.withColumn("b",
          ntile(buckets).over(Window.orderBy(col("v").asc, col("id").asc)))
        .select("id", "b").as[(Long, Int)].collect().toMap
        .map { case (k, v) => k -> v.toLong }
      assert(got === want, s"n=$n buckets=$buckets")
    }
  }

  test("the rank pass range-partitions instead of single-partition sorting") {
    val plan = Ranking.withGlobalRowNumber(rows(1000), "rn",
        col("v").asc, col("id").asc)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"), plan.take(2000))
  }

  // grouped rows: 3 uneven groups with duplicate sort values
  private def grouped(n: Int) = (0 until n)
    .map(i => (s"g${i % 10 min 2}", (i * 7919) % 97, i.toLong))
    .toDF("g", "v", "id")
    .repartition(5, col("id"))

  test("grouped row_number equals the partitioned-window rank") {
    for (n <- Seq(0, 1, 7, 500)) {
      val df = grouped(n)
      val got = Ranking.withGroupedRowNumber(df, "rn", Seq("g"),
          col("v").asc, col("id").asc)
        .select("g", "id", "rn").as[(String, Long, Long)]
        .collect().toSet
      val want = df.withColumn("rn",
          row_number().over(Window.partitionBy("g")
            .orderBy(col("v").asc, col("id").asc)))
        .select("g", "id", "rn").as[(String, Long, Int)]
        .collect().map(t => (t._1, t._2, t._3.toLong)).toSet
      assert(got === want, s"n=$n")
    }
  }

  test("grouped ntile matches SQL NTILE over each group") {
    for (n <- Seq(1, 11, 300); buckets <- Seq(1, 3, 4)) {
      val df = grouped(n)
      val got = Ranking.withGroupedNtile(df, buckets, "b", Seq("g"),
          col("v").asc, col("id").asc)
        .select("id", "b").as[(Long, Long)].collect().toMap
      val want = df.withColumn("b",
          ntile(buckets).over(Window.partitionBy("g")
            .orderBy(col("v").asc, col("id").asc)))
        .select("id", "b").as[(Long, Int)].collect().toMap
        .map { case (k, v) => k -> v.toLong }
      assert(got === want, s"n=$n buckets=$buckets")
    }
  }

  test("a null group key is a group like any other (no dropped rows)") {
    val df = Seq((Some("g0"), 1L), (None, 2L), (None, 3L), (Some("g0"), 4L))
      .toDF("g", "id")
    val got = Ranking.withGroupedRowNumber(df, "rn", Seq("g"), col("id").asc)
    assert(got.count() === 4)
    assert(got.filter(col("g").isNull).orderBy("id")
      .select("rn").as[Long].collect().toSeq === Seq(1L, 2L))
    val nt = Ranking.withGroupedNtile(df, 2, "b", Seq("g"), col("id").asc)
    assert(nt.count() === 4)
    assert(nt.filter(col("g").isNull).orderBy("id")
      .select("b").as[Long].collect().toSeq === Seq(1L, 2L))
  }

  test("grouped rank range-partitions on (group, sort), no per-group funnel") {
    val plan = Ranking.withGroupedRowNumber(grouped(1000), "rn", Seq("g"),
        col("v").asc, col("id").asc)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"), plan.take(2000))
  }

  test("guards: empty sort keys, reserved columns, bucket count") {
    intercept[IllegalArgumentException] {
      Ranking.withGlobalRowNumber(rows(3), "rn")
    }
    intercept[IllegalArgumentException] {
      Ranking.withGlobalRowNumber(
        rows(3).withColumnRenamed("v", "__v"), "rn", col("id"))
    }
    intercept[IllegalArgumentException] {
      Ranking.withGlobalNtile(rows(3), 0, "b", col("id"))
    }
  }
}
