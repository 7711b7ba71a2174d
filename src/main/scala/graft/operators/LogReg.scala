package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Logistic regression trained in-engine by full-batch gradient
  * descent — the third trainable model family next to k-means
  * (Clustering) and Naive Bayes (Classify), and the learned upgrade
  * path for corpus-gating classifiers: hashed TF-IDF features
  * ([[Vectorize.tfidfSparse]]) in, a (slot, weight) model out.
  *
  * The GD shape is exactly [[Clustering.kmeansFit]]'s: the model is
  * planning metadata (dim+1 doubles, broadcast each round), each round
  * is two aggregations over the training rows — per-doc margins (sparse
  * dot via a slot join), then per-slot gradients — and the updated
  * weights are ROUNDED to 6 decimals per round so training trajectories
  * are deterministic in practice across engines (the kmeans
  * centroid-rounding rule; per-doc probabilities are rounded before the
  * gradient sums for the same reason). "In practice" because the float
  * sums feeding each rounding are order-dependent at the last ulp: a
  * difference landing exactly on a rounding half-boundary could still
  * flip a weight — truly order-independent training would need the
  * cl1/ds1 integer-scaled-contribution idiom end to end.
  * Full-batch, not SGD: deterministic by construction and
  * one scan per round; at 100 TB the gradient is a partial-aggregated
  * sum per slot — the shuffle carries dim+1 rows.
  *
  * The bias term is slot −1 (implicit feature x = 1). Labels are
  * 0.0/1.0 doubles. Features for train and test must come from ONE
  * [[Vectorize.tfidfSparse]] pass over the full corpus so idf is
  * consistent across the split.
  */
object LogReg {

  private def round6(c: Column): Column = round(c, 6)

  /** One GD round's probability per labeled doc, given broadcast
    * weights: p = round6(sigmoid(margin + bias)). Docs with no active
    * slot get margin 0 (dim is small, so this is rare by construction,
    * but the left join keeps the contract total). */
  private def probs(labels: DataFrame, feats: DataFrame,
      wDf: DataFrame, bias: Double): DataFrame = {
    val margins = feats.join(broadcast(wDf), Seq("slot"))
      .groupBy("doc_id")
      .agg(sum(col("weight") * col("w")).as("__m"))
    labels.join(margins, Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        round6(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__m"), lit(0.0)) + bias)))).as("p"))
  }

  /** Fit by `rounds` full-batch GD steps at learning rate `eta`.
    * `features` = (doc_id, slot, weight) sparse rows (any docs beyond
    * the labeled set are ignored via the inner join); `labels` =
    * (doc_id, y ∈ {0.0, 1.0}). Returns (slot, w) with slot −1 = bias. */
  def fit(features: DataFrame, labels: DataFrame, dim: Int,
      eta: Double, rounds: Int): DataFrame = {
    require(dim > 0 && rounds > 0 && eta > 0)
    val spark = features.sparkSession
    import spark.implicits._
    // train rows materialized once — every round reads them twice
    val feats = features.join(labels.select("doc_id"), "doc_id")
      .localCheckpoint(true)
    val n = labels.count().toDouble
    var w: Seq[(Long, Double)] =
      (-1L until dim.toLong).map(_ -> 0.0)
    for (_ <- 1 to rounds) {
      val bias = w.head._2
      val wDf = w.tail.toDF("slot", "w")
      val p = probs(labels, feats, wDf, bias).localCheckpoint(true)
      // gradients rounded to 6 decimals BEFORE the update: the sums'
      // addition order differs across engines/partitionings, and an
      // unrounded last-ulp difference can land the weight update on a
      // rounding half-boundary (the same reason p is rounded above)
      val slotGrads = feats.join(p, Seq("doc_id"))
        .groupBy("slot")
        .agg(round6(sum(col("weight") * (col("p") - col("y"))) / n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val biasGrad = p.agg(round6(sum(col("p") - col("y")) / n).as("g"))
        .head().getDouble(0)
      w = w.map { case (s, ws) =>
        val g = if (s == -1L) biasGrad else slotGrads.getOrElse(s, 0.0)
        s -> BigDecimal(ws - eta * g)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w.toDF("slot", "w")
  }

  /** Score docs with a fitted model: (doc_id, score, predicted) with
    * score = round6(sigmoid(w·x + bias)), predicted = score ≥ 0.5. */
  def predict(features: DataFrame, docs: DataFrame, idCol: String,
      weights: DataFrame): DataFrame = {
    val spark = features.sparkSession
    val wRows = weights.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bias = wRows(-1L)
    import spark.implicits._
    val wDf = wRows.toSeq.filter(_._1 >= 0).toDF("slot", "w")
    val ids = docs.select(col(idCol).as("doc_id"))
    val margins = features.join(ids, "doc_id")
      .join(broadcast(wDf), Seq("slot"))
      .groupBy("doc_id")
      .agg(sum(col("weight") * col("w")).as("__m"))
    ids.join(margins, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round6(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__m"), lit(0.0)) + bias)))).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }
}
