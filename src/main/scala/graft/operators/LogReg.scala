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
  * dot via a slot join), then per-slot gradients — and every sum in the
  * trajectory is ORDER-INDEPENDENT by construction: each per-row
  * contribution (margin term `weight·w`, gradient term `weight·(p−y)`)
  * is scaled to an exact 6-decimal LONG at the row level (the
  * [[Classify]]/[[Dsir]] integer-scaled-contribution idiom) and summed
  * in integer space, so the training trajectory is bit-identical under
  * any partitioning or addition order; the updated weights are then
  * rounded to 6 decimals per round so the broadcast model stays a
  * clean 6-decimal grid. Full-batch, not SGD: deterministic and
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

  /** A per-row double contribution scaled to an exact 6-decimal long —
    * sums of these are bit-identical in any addition order (the
    * cl1/ds1 idiom; the double product itself is one IEEE multiply, so
    * it is the same value on every executor and engine). */
  private def scaled6(c: Column): Column =
    floor(c * 1000000.0 + lit(0.5)).cast("long")

  /** One GD round's probability per labeled doc, given broadcast
    * weights: p = round6(sigmoid(margin + bias)) with the margin summed
    * as 6-decimal-scaled longs. Docs with no active slot get margin 0
    * (dim is small, so this is rare by construction, but the left join
    * keeps the contract total). */
  private def probs(labels: DataFrame, feats: DataFrame,
      wDf: DataFrame, bias: Double): DataFrame = {
    val margins = feats.join(broadcast(wDf), Seq("slot"))
      .groupBy("doc_id")
      .agg(sum(scaled6(col("weight") * col("w"))).as("__m6"))
    labels.join(margins, Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        round6(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__m6"), lit(0L)) / 1000000.0 + bias))))
          .as("p"))
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
      // gradient contributions scaled to exact 6-decimal longs BEFORE
      // the sum: integer sums are bit-identical in any addition order,
      // so the rounded gradient (and hence the whole trajectory) cannot
      // flip on a rounding half-boundary under repartitioning
      val slotGrads = feats.join(p, Seq("doc_id"))
        .groupBy("slot")
        .agg(round6(sum(scaled6(col("weight") * (col("p") - col("y"))))
          / 1000000.0 / n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val biasGrad = p.agg(round6(sum(scaled6(col("p") - col("y")))
          / 1000000.0 / n).as("g"))
        .head().getDouble(0)
      w = w.map { case (s, ws) =>
        val g = if (s == -1L) biasGrad else slotGrads.getOrElse(s, 0.0)
        s -> BigDecimal(ws - eta * g)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w.toDF("slot", "w")
  }

  /** TEXT-NATIVE training — [[fit]] specialized to hashed-TF-IDF
    * features straight from a text column, with the join-shaped inner
    * loop replaced by kernels (the [[scoreFrozen]] treatment applied
    * to TRAINING): the per-doc (slot, weight) entries are staged ONCE
    * by [[graft.functions.HashedTfidfSlots]] (a projection — no
    * explode, no corpus shuffle, no idf join), each round's margins
    * come from [[graft.functions.HashedTfidfMargin]] over the staged
    * tokens (a projection — the old path joined the feature relation
    * against the weights and shuffled per-doc sums), and the gradient
    * is ONE partial-aggregated groupBy(slot) whose output is dim rows
    * (the old path also joined the doc-scale probability relation back
    * into the feature relation first). Per round: two projections +
    * one dim-bounded shuffle + two metadata collects — no join
    * anywhere.
    *
    * Bit-identical to `fit(Vectorize.tfidfSparse(docs…), labels…)` —
    * LogRegSpec pins the whole trained trajectory — because every
    * margin/gradient contribution is the same integer-scaled long the
    * relational path summed, and integer sums are order-free. The
    * stage is labels LEFT-joined to the corpus (the relational path's
    * restriction join ran the other way but [[probs]] left-joined
    * from labels too): a label whose doc_id has no corpus row, like a
    * labeled doc with empty/null text, gets margin 0, still counts
    * toward `n` and the bias gradient, and contributes to no slot —
    * exactly [[fit]]'s behavior. Unlabeled docs never enter the
    * stage. Where [[fit]]'s join arithmetic and the per-row stage
    * GENUINELY diverge — a doc_id duplicated in the corpus
    * ([[Vectorize.tfidfSparse]] merges tf across the copies; a
    * per-row stage would weight each copy separately) or in the
    * labels (the restriction join would double the margin rows) —
    * this refuses with a caller-facing error instead of training a
    * silently different trajectory; both checks are label-scale
    * aggregations. */
  def fitText(docs: DataFrame, idCol: String, textCol: String,
      labels: DataFrame, dim: Int, eta: Double, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fitTextImpl(docs, idCol, textCol, labels, dim, eta, rounds)._1
      .toDF("slot", "w")
  }

  /** [[fitText]] straight to the deployment artifact: the corpus idf
    * computed for the training stage is REUSED as the frozen model's
    * idf half instead of re-derived — a fitText → [[freeze]] pipeline
    * otherwise pays the full [[Vectorize.tfidfSparseWithIdf]] corpus
    * pass twice (once inside training, once to rebuild the idf table
    * training already had). Same weights, same idf values, one corpus
    * scan; score with [[scoreFrozen]]. */
  def fitTextFrozen(docs: DataFrame, idCol: String, textCol: String,
      labels: DataFrame, dim: Int, eta: Double,
      rounds: Int): FrozenLrModel = {
    val (w, idf) = fitTextImpl(docs, idCol, textCol, labels, dim, eta,
      rounds)
    FrozenLrModel(w.head._2, idf, w.tail.map(_._2).toArray)
  }

  private def fitTextImpl(docs: DataFrame, idCol: String,
      textCol: String, labels: DataFrame, dim: Int, eta: Double,
      rounds: Int): (Seq[(Long, Double)], Array[Double]) = {
    require(dim > 0 && rounds > 0 && eta > 0)
    import graft.functions.HashedTfidfMargin.hashed_tfidf_margin
    import graft.functions.HashedTfidfSlots.hashed_tfidf_slots
    val (_, idfDf) = Vectorize.tfidfSparseWithIdf(docs, idCol, textCol, dim)
    // dim-row metadata-scale collect (the freeze contract)
    val idfRows = idfDf.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = Array.tabulate(dim)(s =>
      idfRows.getOrElse(s.toLong, Double.NaN))
    // the two shapes where per-row staging and fit's join arithmetic
    // genuinely diverge — refuse loudly, and BEFORE the stage is built
    // so a refused call fails at label scale instead of after a full
    // corpus-join materialization. ONE aggregation pass over the
    // labels subtree yields n and the duplicate check (labels may be
    // corpus-derived, so each extra action on it re-scans the corpus).
    // Duplicates are judged among NON-null doc_ids (count(col) skips
    // nulls, count_distinct ignores them): a null-id label is not a
    // duplicate — it rides the left join's no-match arm to the same
    // bias-only contribution fit gives it.
    val cnt = labels.agg(count(lit(1)).as("n"),
      count(col("doc_id")).as("nn"),
      count_distinct(col("doc_id")).as("nd")).head()
    val nL = cnt.getLong(0)
    require(cnt.getLong(2) == cnt.getLong(1),
      "fitText: duplicate doc_id in labels — the staged trajectory " +
        "would diverge from fit's restriction-join arithmetic; " +
        "dedupe the labels (or train via fit over tfidfSparse)")
    // the stage: one row per LABEL — y, tokens (margins re-read
    // them each round against the moving weights), and the staged
    // (slot, weight) entries (fixed across rounds; the gradient
    // explodes them). Materialized once, read 2×rounds times. LEFT
    // join so a label without a corpus row stays (null tokens → null
    // slots/margin → the bias-only fallback, fit's exact semantics).
    val stage = labels
      .select(col("doc_id").as("__lid"), col("y").as("__y"))
      .join(docs.select(col(idCol).as("__did"), col(textCol).as("__txt")),
        col("__lid") === col("__did"), "left")
      .select(col("__y").as("y"),
        TextAnalysis.tokens(col("__txt")).as("__toks"))
      .withColumn("__slots", hashed_tfidf_slots(col("__toks"), idf))
      .localCheckpoint(true)
    require(stage.count() == nL,
      "fitText: a labeled doc_id matches multiple corpus rows — " +
        "tfidfSparse merges duplicate ids, a per-row stage cannot; " +
        "dedupe the corpus ids (or train via fit over tfidfSparse)")
    val n = nL.toDouble
    var w: Seq[(Long, Double)] =
      (-1L until dim.toLong).map(_ -> 0.0)
    for (_ <- 1 to rounds) {
      val bias = w.head._2
      val wArr = Array.tabulate(dim)(s => w(s + 1)._2)
      val scored = stage.withColumn("p",
        round6(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(hashed_tfidf_margin(col("__toks"), idf, wArr),
            lit(0L)) / 1000000.0 + bias)))))
        .localCheckpoint(true)
      val slotGrads = scored
        .select(col("p"), col("y"), explode(col("__slots")).as("__e"))
        .groupBy(col("__e.slot").as("slot"))
        .agg(round6(sum(scaled6(col("__e.weight") * (col("p") - col("y"))))
          / 1000000.0 / n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val biasGrad = scored.agg(round6(sum(scaled6(col("p") - col("y")))
          / 1000000.0 / n).as("g"))
        .head().getDouble(0)
      w = w.map { case (s, ws) =>
        val g = if (s == -1L) biasGrad else slotGrads.getOrElse(s, 0.0)
        s -> BigDecimal(ws - eta * g)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      scored.unpersist(false)
    }
    stage.unpersist(false)
    (w, idf)
  }

  /** A fitted model collected to the driver — bias + per-slot weight
    * and corpus idf as plain arrays (dim+1 doubles twice: the broadcast
    * model that was already planning metadata, frozen once per
    * deployment instead of re-joined per batch). `idf` is NaN for slots
    * with no corpus df — [[scoreFrozen]] skips them, the inner-join
    * semantics of [[Vectorize.tfidfSparse]]'s weighting. */
  final case class FrozenLrModel(bias: Double, idf: Array[Double],
      w: Array[Double]) {
    require(idf.length == w.length && w.nonEmpty,
      s"frozen logreg model has idf/w length ${idf.length}/${w.length}")
    def dim: Int = w.length
  }

  /** Collect a fitted model ([[fit]]'s (slot, w) with slot −1 = bias)
    * and its corpus idf table ([[Vectorize.tfidfSparseWithIdf]]'s
    * second half) into a [[FrozenLrModel]] — two dim-row metadata-scale
    * collects, the [[Classify.nbFreeze]] contract. Freeze ONCE per
    * stream/deployment and score every batch with [[scoreFrozen]]. */
  def freeze(weights: DataFrame, idf: DataFrame): FrozenLrModel = {
    val wRows = weights.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    require(wRows.contains(-1L), "weights have no bias row (slot -1)")
    val dim = wRows.keys.max.toInt + 1
    require(dim > 0 && (-1L until dim.toLong).forall(wRows.contains),
      s"weights must cover every slot -1..${dim - 1}: ${wRows.keys}")
    val idfRows = idf.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    require(idfRows.keys.forall(s => s >= 0 && s < dim),
      s"idf slot outside [0, $dim): ${idfRows.keys.filterNot(s =>
        s >= 0 && s < dim)}")
    FrozenLrModel(wRows(-1L),
      Array.tabulate(dim)(s => idfRows.getOrElse(s.toLong, Double.NaN)),
      Array.tabulate(dim)(s => wRows(s.toLong)))
  }

  /** Score documents with a frozen model as ONE stateless projection —
    * no explode, no feature pass, no model join, no per-doc groupBy:
    * per doc, [[graft.functions.HashedTfidfMargin]] computes the
    * integer-scaled TF-IDF dot product straight from the token array
    * (the md5 slot hashing the join path did per exploded token, minus
    * the explode/shuffle/join around it), and the score/predicted
    * columns are the same sigmoid fold [[predict]] applies. Bit-equal
    * to `predict(tfidfSparse(corpus…), docs, …)` when the frozen idf
    * came from that corpus pass (LogRegSpec pins it): the margin is an
    * integer sum of identical per-slot contributions. Docs with null
    * `textCol` score on the bias alone ([[predict]]'s left-join
    * fallback). Returns every input column plus `score` and
    * `predicted` — the [[Classify.nbScoreFrozen]] contract; this is
    * the streaming-routing shape, each micro-batch pays one extra map
    * pass and nothing else. */
  def scoreFrozen(model: FrozenLrModel, docs: DataFrame,
      textCol: String): DataFrame = {
    require(!docs.columns.contains("predicted") &&
      !docs.columns.contains("score"),
      "scoreFrozen: input already has predicted/score columns")
    import graft.functions.HashedTfidfMargin.hashed_tfidf_margin
    docs.withColumn("score",
        round6(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(hashed_tfidf_margin(
              TextAnalysis.tokens(col(textCol)), model.idf, model.w),
            lit(0L)) / 1000000.0 + model.bias)))))
      .withColumn("predicted", col("score") >= 0.5)
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
      .agg(sum(scaled6(col("weight") * col("w"))).as("__m6"))
    ids.join(margins, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round6(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__m6"), lit(0L)) / 1000000.0 + bias))))
          .as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }
}
