package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact global ranking without the single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY funnels the
  * whole relation through one task — the classic scale-killer Spark warns
  * about. But a global rank is just a global sort plus bookkeeping, and
  * Spark's sort is distributed: range-partition on the sort key, rank
  * locally within each range partition, then add the (metadata-scale)
  * cumulative row counts of the partitions before it. Wall-clock is one
  * range shuffle — identical to `ORDER BY` — at any corpus size.
  *
  * Determinism contract: `sortCols` must be a TOTAL order (include a
  * unique id as the last key). Rows that compare equal on the sort key
  * could land on either side of a range boundary, so with a non-total key
  * tie order would depend on partitioning.
  */
object Ranking {

  /** Adds exact global `row_number()` (1-based, named `rnCol`) ordered by
    * `sortCols`. */
  def withGlobalRowNumber(df: DataFrame, rnCol: String,
      sortCols: Column*): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must not be empty")
    require(!df.columns.exists(_.startsWith("__")),
      "input must not carry __-prefixed columns")
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*)))
    // per-range-partition row counts: #shuffle-partitions rows, metadata
    // scale; the cumulative window over them is trivially single-partition
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum("__cnt").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }

  /** Adds exact PER-GROUP `row_number()` (1-based, named `rnCol`)
    * ordered by `sortCols` inside each combination of `groupCols` —
    * without `row_number() OVER (PARTITION BY group)`'s
    * one-task-per-group funnel. A plain partitioned window is fine when
    * every group fits a task; this form survives the CCNet case — a
    * handful of language groups, each a large fraction of the corpus —
    * by range-partitioning on (group, sort) so a big group SPANS
    * partitions, ranking locally, and adding per-(partition, group)
    * cumulative offsets (metadata scale: #partitions × #groups rows).
    * Same determinism contract as [[withGlobalRowNumber]]: groupCols ++
    * sortCols must totally order rows within a group. */
  def withGroupedRowNumber(df: DataFrame, rnCol: String,
      groupCols: Seq[String], sortCols: Column*): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    require(sortCols.nonEmpty, "sortCols must not be empty")
    require(!df.columns.exists(_.startsWith("__")),
      "input must not carry __-prefixed columns")
    val gc = groupCols.map(col)
    val ranged = df.repartitionByRange(gc ++ sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid") +: gc: _*)
        .orderBy(sortCols: _*)))
    // offsets keyed null-safely (a null group key is a group like any
    // other; a plain equi-join would silently drop its rows)
    val offsets = ranged.groupBy(col("__pid") +: gc: _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum("__cnt").over(Window.partitionBy(gc: _*).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+ col("__off"): _*)
    val cond = (local("__pid") === offsets("__opid")) +:
      groupCols.map(c => local(c) <=> offsets(s"__og_$c"))
    local.join(broadcast(offsets), cond.reduce(_ && _))
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop(("__pid" +: "__lrn" +: "__off" +: "__opid" +:
        groupCols.map(c => s"__og_$c")): _*)
  }

  /** Adds exact PER-GROUP `ntile(n)` (named `bucketCol`, values 1..n)
    * ordered by `sortCols` inside each `groupCols` combination — the
    * CCNet head/middle/tail shape: per-language perplexity thirds
    * where single languages are corpus-sized. SQL ntile semantics per
    * group (first rem buckets hold base+1 rows). The input is
    * materialized once (`localCheckpoint`) because the rank pass and
    * the per-group totals both consume it. */
  def withGroupedNtile(df: DataFrame, n: Int, bucketCol: String,
      groupCols: Seq[String], sortCols: Column*): DataFrame = {
    require(n > 0, s"ntile buckets must be positive, got $n")
    val base = df.localCheckpoint(true)
    // per-group totals: #groups rows, metadata scale, broadcast back
    // (keyed null-safely, like the offsets join — a null group key is a
    // group like any other)
    val totals = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__total"))
      .select(groupCols.map(c => col(c).as(s"__tg_$c")) :+
        col("__total"): _*)
    val ranked = withGroupedRowNumber(base, "__rn", groupCols, sortCols: _*)
    ranked
      .join(broadcast(totals),
        groupCols.map(c => ranked(c) <=> totals(s"__tg_$c")).reduce(_ && _))
      .drop(groupCols.map(c => s"__tg_$c"): _*)
      .withColumn("__base", expr(s"__total div $n"))
      .withColumn("__rem", col("__total") % n)
      .withColumn("__cut", col("__rem") * (col("__base") + 1))
      .withColumn(bucketCol,
        when(col("__rn") <= col("__cut"),
          expr("(__rn - 1) div (__base + 1)") + 1)
        .otherwise(col("__rem") +
          expr("(__rn - __cut - 1) div greatest(__base, 1)") + 1))
      .drop("__rn", "__total", "__base", "__rem", "__cut")
  }

  /** Adds exact global `ntile(n)` (named `bucketCol`, values 1..n) ordered
    * by `sortCols` — SQL semantics: with base = total div n and
    * rem = total mod n, the first `rem` buckets hold base+1 rows and the
    * rest hold base. The input is materialized once (`localCheckpoint`)
    * because both the rank pass and the one-row total consume it. */
  def withGlobalNtile(df: DataFrame, n: Int, bucketCol: String,
      sortCols: Column*): DataFrame = {
    require(n > 0, s"ntile buckets must be positive, got $n")
    val base = df.localCheckpoint(true)
    val total = base.agg(count(lit(1)).as("__total"))
    withGlobalRowNumber(base, "__rn", sortCols: _*)
      .crossJoin(broadcast(total))
      .withColumn("__base", expr(s"__total div $n"))
      .withColumn("__rem", col("__total") % n)
      // rows 1..cut sit in the rem larger buckets of base+1 rows each
      .withColumn("__cut", col("__rem") * (col("__base") + 1))
      .withColumn(bucketCol,
        when(col("__rn") <= col("__cut"),
          expr("(__rn - 1) div (__base + 1)") + 1)
        .otherwise(col("__rem") +
          expr("(__rn - __cut - 1) div greatest(__base, 1)") + 1))
      .drop("__rn", "__total", "__base", "__rem", "__cut")
  }
}
