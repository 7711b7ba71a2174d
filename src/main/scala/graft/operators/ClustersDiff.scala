package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-cluster comparison — the `bg-clusters-diff` tool
  * (cli/clusters_diff.py): fetch the same queries from two clusters,
  * pair the results full-outer, measure per-target relative-gap
  * dissymmetries, and report them as percentiles, alongside timing
  * percentiles of the per-query fetch durations.
  *
  * The reference's percentile convention (cli/clusters_diff.py:513-529)
  * is deliberately interpolation-free: for percentile i over n sorted
  * measures it reports `sorted[int(i/100 * n)]` — reproduced bit-for-bit
  * here so a migrating user sees identical report numbers. Percentile
  * levels are 50/75/90/99/99.9 (clusters_diff.py:524).
  *
  * Scale shape: the dissymmetry relation has one row per (target, slot)
  * and collapses to one row per target before ranking; the ranking is a
  * single-partition window over TARGET-COUNT rows (the reference sorts
  * the same list in driver memory — clusters_diff.py:522). Nothing here
  * is points-sized past the first aggregation.
  */
object ClustersDiff {

  val Levels: Seq[Double] = Seq(50, 75, 90, 99, 99.9)

  private def colName(level: Double): String =
    "p" + (if (level == level.floor) level.toInt.toString
           else level.toString.replace(".", ""))

  /** Reference-formula percentiles of `valueCol` over the whole frame →
    * one row with p50/p75/p90/p99/p999 + n. A row_number ranking over
    * the (already aggregated, target-count-sized) input, then one
    * conditional aggregate per level — no collect, no interpolation. */
  def referencePctls(df: DataFrame, valueCol: Column,
      roundTo: Int = 6): DataFrame = {
    val ranked = df
      .select(valueCol.as("__m"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__m"))))
      .withColumn("__n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val picks = Levels.map { lvl =>
      // rank = int(lvl/100 * n), 0-based → row_number rank+1, 1-based
      round(max(when(
        col("__rn") === (floor(lit(lvl / 100.0) * col("__n")) + 1).cast("int"),
        col("__m"))), roundTo).as(colName(lvl))
    }
    ranked.agg(picks.head, picks.tail :+ max(col("__n")).as("n"): _*)
  }

  /** Per-target relative-gap dissymmetry between two clusters' fetches
    * of the same targets — _measure_relative_gap exactly
    * (cli/clusters_diff.py:156-163): equal values (INCLUDING a slot
    * that is None/absent on both sides) gap 0.0; a slot present on one
    * side only gap 1.0; otherwise |a−b| / (|a|+|b|). Full-outer pair on
    * (name, ts), then the per-target mean. */
  def dissymmetries(clusterA: DataFrame, clusterB: DataFrame): DataFrame = {
    val a = clusterA.select(col("name"), col("ts"), col("value").as("__va"))
    val b = clusterB.select(col("name"), col("ts"), col("value").as("__vb"))
    a.join(b, Seq("name", "ts"), "full_outer")
      .withColumn("__gap",
        when(col("__va") <=> col("__vb"), lit(0.0))
          .when(col("__va").isNull || col("__vb").isNull, lit(1.0))
          .otherwise(abs(col("__va") - col("__vb")) /
            (abs(col("__va")) + abs(col("__vb")))))
      .groupBy("name")
      .agg(avg("__gap").as("dissymmetry"))
  }

  /** The full report: dissymmetry percentiles over all targets. */
  def diffReport(clusterA: DataFrame, clusterB: DataFrame): DataFrame =
    referencePctls(dissymmetries(clusterA, clusterB), col("dissymmetry"))

  /** Timing percentiles over per-query fetch durations — the reference's
    * HostResult.compute_timing_pctls (clusters_diff.py:125-127), same
    * interpolation-free formula, computed driver-side because the inputs
    * ARE driver-side wall-clock measurements (one per query, never
    * data-sized). Returns (level → seconds) in level order. */
  def timingPctls(timesS: Seq[Double]): Seq[(Double, Double)] = {
    require(timesS.nonEmpty, "timingPctls: no measurements")
    val sorted = timesS.sorted
    Levels.map { lvl =>
      val rank = math.min((lvl / 100.0 * sorted.length).toInt, sorted.length - 1)
      lvl -> sorted(rank)
    }
  }
}
