package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine evaluation of the corpus-gating classifiers
  * ([[Classify]], [[LogReg]]) — the measurement half a deployed gate
  * needs next to its training half: threshold-free ranking quality
  * (AUC-ROC), probability calibration (reliability buckets), and the
  * threshold confusion matrix with its derived rates. Everything is
  * deterministic CROSS-ENGINE, the repo-wide oracle contract:
  *
  *  - AUC-ROC is the Mann-Whitney rank statistic computed from the
  *    per-distinct-score histogram with AVERAGE ranks for ties. Every
  *    per-score term `pos · (below + (n+1)/2)` is an exact multiple
  *    of 0.5 in IEEE double (counts times half-integers), so the sum
  *    is EXACT in any addition order — no integer scaling needed, the
  *    same order-independence [[Classify]]/[[LogReg]] buy with scaled
  *    longs.
  *  - Calibration means are integer-scaled before summing
  *    (floor(score·1e6 + 0.5) longs), the [[LogReg]] idiom, so bucket
  *    means replay bit-identically under any partitioning.
  *  - Confusion cells are counts; the derived rates are single IEEE
  *    divisions of exact integers.
  *
  * Scale shape: one aggregation per metric. [[aucRoc]]'s cumulative
  * pass runs over the DISTINCT-SCORE relation, not the corpus — for
  * the round-6-sigmoid scorers the score domain is ≤ 10⁶ + 1 values
  * by construction, so the single-partition window is bounded
  * metadata, not data (for unbounded score domains the same bound is
  * whatever the caller's score rounding admits). */
object ModelEval {

  private def round6(c: Column): Column = round(c, 6)

  /** The [[Classify]]/[[LogReg]] row-level idiom: a double scaled to
    * an exact 6-decimal long so sums are order-free. */
  private def scaled6(c: Column): Column =
    floor(c * 1000000.0 + lit(0.5)).cast("long")

  /** AUC-ROC over `(scoreCol, labelCol)` rows (labels 0.0/1.0):
    * the probability a random positive outranks a random negative,
    * ties at half credit — Mann-Whitney with average ranks,
    * AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N). Returns ONE row
    * (auc, n_pos, n_neg); a single-class input yields NULL auc (the
    * statistic is undefined, and ANSI division would throw).
    *
    * Plan: groupBy(score) → distinct-score histogram (n, pos),
    * cumulative `below` via one ordered window over that histogram,
    * one final aggregation. The corpus is touched once. */
  def aucRoc(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame =
    aucAgg(scored, scoreCol, labelCol, Nil)

  /** [[aucRoc]] per group — gate quality sliced by a corpus dimension
    * (source, shard, time slice): one row (byCol, auc, n_pos, n_neg)
    * per group, ordered by group, NULL auc for single-class groups.
    * The cumulative window partitions by the group, so nothing runs
    * single-partition — the fully-distributed face of the statistic. */
  def aucRocBy(scored: DataFrame, scoreCol: String, labelCol: String,
      byCol: String): DataFrame =
    aucAgg(scored, scoreCol, labelCol, Seq(byCol)).orderBy(byCol)

  private def aucAgg(scored: DataFrame, scoreCol: String,
      labelCol: String, byCols: Seq[String]): DataFrame = {
    val g = scored
      .groupBy((byCols.map(col) :+ col(scoreCol).as("__s")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(labelCol)).as("__pos"))
    // ordered cumulative over the distinct-score relation (bounded by
    // the score domain — see object scaladoc; per-group when grouped,
    // where the window is partitioned and fully distributed);
    // rowsBetween(-1) makes `below` strictly-preceding counts, the
    // tie block excluded
    val below = Window.partitionBy(byCols.map(col): _*).orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("__below",
      coalesce(sum("__n").over(below), lit(0L)))
    // each term: positives in the tie block × the block's average
    // rank — an exact multiple of 0.5, so the sum is order-free
    val agg = (if (byCols.isEmpty) cum.groupBy()
      else cum.groupBy(byCols.map(col): _*))
      .agg(
        sum(col("__pos") * (col("__below") + (col("__n") + 1) / 2.0))
          .as("__prs"),
        sum("__pos").as("__p"),
        sum(col("__n") - col("__pos")).as("__nn"))
    agg.select((byCols.map(col) ++ Seq(
      when(col("__p") > 0 && col("__nn") > 0,
        round6((col("__prs") - col("__p") * (col("__p") + 1) / 2.0) /
          (col("__p") * col("__nn"))))
        .as("auc"),
      col("__p").cast("long").as("n_pos"),
      col("__nn").cast("long").as("n_neg"))): _*)
  }

  /** Reliability diagram input: scores in [0, 1] into `buckets`
    * equal-width buckets (score 1.0 folds into the last), per bucket
    * the count, the 6-decimal mean score (integer-scaled sum — exact
    * under any partitioning) and the observed positive rate. A
    * calibrated scorer has pos_rate ≈ mean_score per bucket. Returns
    * (bucket, n, mean_score, pos_rate) ordered by bucket; empty
    * buckets are absent (their diagram point is undefined). */
  def calibrationBuckets(scored: DataFrame, scoreCol: String,
      labelCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    scored
      .groupBy(least(floor(col(scoreCol) * buckets), lit(buckets - 1))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round6(sum(scaled6(col(scoreCol))) / 1000000.0 / count(lit(1)))
          .as("mean_score"),
        round6(sum(col(labelCol)) / count(lit(1))).as("pos_rate"))
      .orderBy("bucket")
  }

  /** The full operating curve: one row per DISTINCT score, treating
    * that score as the decision threshold (predict positive iff
    * score ≥ threshold) — the table a deployment sweeps to pick its
    * gate threshold, and the PR curve's exact points. Cumulative
    * tp/fp come from one descending pass over the distinct-score
    * histogram (exact integers; precision/recall/f1 are single IEEE
    * divisions of exact counts, round6, NULL-guarded like
    * [[confusionAt]]). Returns (threshold, tp, fp, fn, precision,
    * recall, f1) ordered by threshold DESCENDING — the sweep from
    * strictest gate to laxest. Same distinct-score window bound as
    * [[aucRoc]]. */
  def operatingPoints(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = scored.groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("__n"), sum(col(labelCol)).as("__pos"))
    val desc6 = Window.orderBy(col("threshold").desc)
    val cum = desc6.rowsBetween(Window.unboundedPreceding, 0)
    val all = desc6.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val prec = when(col("tp") + col("fp") > 0,
      round6(col("tp") / (col("tp") + col("fp"))))
    val rec = when(col("tp") + col("fn") > 0,
      round6(col("tp") / (col("tp") + col("fn"))))
    g.select(col("threshold"),
        sum(col("__pos")).over(cum).cast("long").as("tp"),
        sum(col("__n") - col("__pos")).over(cum).cast("long").as("fp"),
        (sum(col("__pos")).over(all) - sum(col("__pos")).over(cum))
          .cast("long").as("fn"))
      .withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
            col("precision") + col("recall") > 0,
          round6(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")))))
      .orderBy(col("threshold").desc)
  }

  /** Confusion matrix at `threshold` (predicted positive iff
    * score ≥ threshold) with the derived rates: ONE row
    * (tp, fp, tn, fn, precision, recall, f1, accuracy), rates NULL
    * where their denominator is zero (no thrown ANSI division on a
    * degenerate slice). One aggregation pass. */
  def confusionAt(scored: DataFrame, scoreCol: String,
      labelCol: String, threshold: Double): DataFrame = {
    val pred = col(scoreCol) >= threshold
    val pos = col(labelCol) === 1.0
    // coalesce: an EMPTY slice aggregates sums to NULL — report zero
    // counts (and NULL rates) instead of an all-NULL row
    val cells = scored.agg(
      coalesce(sum(when(pred && pos, 1L).otherwise(0L)), lit(0L)).as("tp"),
      coalesce(sum(when(pred && !pos, 1L).otherwise(0L)), lit(0L)).as("fp"),
      coalesce(sum(when(!pred && !pos, 1L).otherwise(0L)), lit(0L)).as("tn"),
      coalesce(sum(when(!pred && pos, 1L).otherwise(0L)), lit(0L)).as("fn"))
    val prec = when(col("tp") + col("fp") > 0,
      round6(col("tp") / (col("tp") + col("fp"))))
    val rec = when(col("tp") + col("fn") > 0,
      round6(col("tp") / (col("tp") + col("fn"))))
    cells
      .withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
            col("precision") + col("recall") > 0,
          round6(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")))))
      .withColumn("accuracy",
        when(col("tp") + col("fp") + col("tn") + col("fn") > 0,
          round6((col("tp") + col("tn")) /
            (col("tp") + col("fp") + col("tn") + col("fn")))))
  }
}
