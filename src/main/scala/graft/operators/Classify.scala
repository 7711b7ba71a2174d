package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Trained text classifier — multinomial Naive Bayes with Laplace
  * smoothing, the in-engine analog of the fastText-style quality/domain
  * classifiers that gate modern pretraining corpora (CCNet's LM filter,
  * DCLM's fastText quality model, LLaMA's Wikipedia-reference
  * classifier): train on a labeled subset, score the whole corpus, route
  * documents by predicted label.
  *
  * Naive Bayes is the classifier whose TRAINING is an aggregation — one
  * groupBy pass over the training tokens yields the entire model — which
  * makes it the distributed-scan-native choice: no gradient iterations,
  * no parameter server, and the fitted model is a (vocab × classes) grid
  * small enough to BROADCAST, so scoring is a map-side join over the
  * corpus (the same broadcast-model shape the IVF probe and BM25 query
  * set use).
  *
  * Model (α = Laplace smoothing, V = vocab size):
  *  - vocab      = top-V training terms by (count DESC, term ASC) —
  *    deterministic, and the cap is what keeps the model broadcastable
  *    when the raw vocabulary is web-scale
  *  - prior(c)   = ln(docs_c / docs_total)
  *  - lik(t, c)  = ln((count(t, c) + α) / (tokens_c + α·V)) for EVERY
  *    (vocab term, class) pair — the complete smoothed grid, so unseen
  *    (t, c) combinations score α-mass, not −∞
  *  - score(d,c) = prior(c) + Σ_{t ∈ d ∩ vocab} lik(t, c); out-of-vocab
  *    tokens are dropped (the standard multinomial-NB convention)
  *
  * Determinism contract (cross-engine, DuckDB-oracle-able): every ln()
  * is scaled to a 6-decimal LONG (floor(v·1e6 + 0.5)) at model-build
  * time, and document scores are summed in integer space — bit-exact in
  * any engine regardless of addition order — then divided back to a
  * double only for display. Prediction ties break (score DESC, label
  * ASC). Docs with zero in-vocab tokens are scored on priors alone.
  */
object Classify {

  private def toks(c: Column): Column = TextAnalysis.tokens(c)

  /** ln(x) as a 6-decimal-scaled long — exact integer the moment it is
    * computed, so downstream sums are order-independent. */
  private def lnScaled(x: Column): Column =
    floor(log(x) * 1000000.0 + 0.5).cast("long")

  /** Fit the model: returns the complete (label, term, lik6, prior6)
    * grid — V·C rows, broadcast-sized by construction. `lik6`/`prior6`
    * are the 6-decimal-scaled-long log-likelihood / log-prior. */
  def nbFit(train: DataFrame, labelCol: String, textCol: String,
      vocabSize: Int, alpha: Double = 1.0): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val tok = train.select(col(labelCol).as("label"),
        explode(toks(col(textCol))).as("term"))
      .localCheckpoint(true) // token-scale of the TRAIN SUBSET; feeds
                             // vocab, class counts, and term counts
    // top-V terms by (global count DESC, term ASC) — a V-row relation
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select("term")
    // per-(class, vocab-term) counts; in-vocab only
    val counts = tok.join(broadcast(vocab), Seq("term"))
      .groupBy("label", "term").agg(count(lit(1)).as("__tc"))
    // per-class in-vocab token totals, derived FROM counts (no 2nd pass)
    val totals = counts.groupBy("label").agg(sum("__tc").as("__tot"))
    // priors over training docs
    val nDocs = train.select(count(lit(1)).as("__nd"))
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("__dc"))
      .crossJoin(broadcast(nDocs))
      .select(col("label"),
        lnScaled(col("__dc").cast("double") / col("__nd")).as("prior6"))
    // V (actual vocab size — min(vocabSize, distinct terms)) for the
    // smoothing denominator, as a one-row broadcast
    val vSize = vocab.agg(count(lit(1)).as("__v"))
    // complete grid: every class × every vocab term, zero-filled (a
    // class with zero in-vocab tokens still gets its smoothed grid)
    priors.join(totals, Seq("label"), "left")
      .withColumn("__tot", coalesce(col("__tot"), lit(0L)))
      .crossJoin(broadcast(vocab))
      .join(counts, Seq("label", "term"), "left")
      .crossJoin(broadcast(vSize))
      .select(col("label"), col("term"),
        lnScaled((coalesce(col("__tc"), lit(0L)) + alpha) /
          (col("__tot") + lit(alpha) * col("__v"))).as("lik6"),
        col("prior6"))
      // the fitted model is V·C rows by construction; materialize it so
      // nbPredict's two consumers (scoring join + priors) don't re-run
      // the vocab TakeOrdered and counts/totals aggregations per use
      .localCheckpoint(true)
  }

  /** Every (doc, class) score with its per-doc rank — the join-shaped
    * scoring path (explode → broadcast join → groupBy → window), kept
    * as the EQUIVALENCE ORACLE for the frozen projections
    * ([[nbPredict]]/[[nbMargin]] now ride [[nbScoreFrozen]]'s
    * kernel shape; ClassifySpec pins the two paths row-identical —
    * the assignCellsJoin pattern). Rank 1 = argmax, rule
    * (score desc, label asc). */
  private[operators] def scoredRanked(model: DataFrame, test: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val docTok = test.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("term"))
    // in-vocab token hits × classes: C rows per hit, summed per (doc, c)
    val hitSums = docTok.join(broadcast(model), Seq("term"))
      .groupBy("doc_id", "label").agg(sum(col("lik6")).as("__lik"))
    // every doc scores every class — docs with no vocab hits fall back
    // to priors alone (left join from the doc × class grid)
    val priors = model.select("label", "prior6").distinct()
    val grid = test.select(col(idCol).as("doc_id")).crossJoin(broadcast(priors))
    val scored = grid.join(hitSums, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        ((col("prior6") + coalesce(col("__lik"), lit(0L))) / 1000000.0)
          .as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
  }

  /** Score `test` against a fitted model and keep the arg-max class per
    * doc: (doc_id, label, score) with score = (prior6 + Σ lik6) / 1e6.
    *
    * Rides the FROZEN projection ([[nbFreeze]] — one metadata-scale
    * collect of the V·C grid — then [[nbScoreFrozen]]'s native token
    * pass): no explode, no corpus-side shuffle, no window; one map
    * pass over `test`. Row-identical to the old join-shaped path
    * ([[scoredRanked]] rn=1 — ClassifySpec pins it; the integer score
    * sums are order-independent and every s6 fits a double exactly,
    * so integer and descaled-double ranking agree). Assumes unique ids
    * per test row (the corpus contract); an EMPTY model now refuses
    * loudly at freeze instead of returning an empty result. */
  def nbPredict(model: DataFrame, test: DataFrame, idCol: String,
      textCol: String): DataFrame =
    nbScoreFrozen(nbFreeze(model), test.select(col(idCol), col(textCol)),
        textCol)
      .select(col(idCol).as("doc_id"), col("predicted").as("label"),
        col("score"))

  /** A fitted NB model collected to the driver — the broadcast-sized
    * V·C grid as plain maps, frozen once per deployment instead of
    * re-planned per micro-batch. `labels` sorted ascending (the tie
    * order). */
  final case class FrozenNbModel(labels: Seq[String],
      prior6: Map[String, Long], lik6: Map[String, Map[String, Long]]) {
    require(labels.nonEmpty, "frozen NB model has no classes")
  }

  /** Collect a fitted model ([[nbFit]]'s V·C grid — broadcast-sized by
    * construction, so this is a metadata-scale collect, same class as
    * the IVF centroid reads) into a [[FrozenNbModel]]. Freeze ONCE per
    * stream/deployment and score every batch with [[nbScoreFrozen]]. */
  def nbFreeze(model: DataFrame): FrozenNbModel = {
    val rows = model.select("label", "term", "lik6", "prior6").collect()
    require(rows.nonEmpty, "cannot freeze an empty NB model")
    val labels = rows.map(_.getString(0)).distinct.sorted.toSeq
    val prior6 = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    val lik6 = rows.groupBy(_.getString(0)).map { case (l, rs) =>
      l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap
    }
    FrozenNbModel(labels, prior6, lik6)
  }

  /** Score + route with a frozen model as PURE COLUMN EXPRESSIONS — no
    * explode, no join, no shuffle, no window: per class, the
    * integer-scaled score is one native token pass
    * ([[graft.functions.TokenMapSum]], the weight table riding as a
    * codegen reference object), and the argmax folds over the C score
    * columns with the same (score DESC, label ASC) tie rule
    * [[nbPredict]] ranks by. Returns every input column plus
    * `predicted` and `score` — bit-identical to joining
    * [[nbPredict]]'s output back on the id (ClassifySpec pins the
    * equivalence), because the integer score sums are
    * order-independent by construction.
    *
    * This is the streaming-routing shape: the join path re-planned and
    * re-shuffled the model against every micro-batch; this one adds a
    * stateless projection to whatever plan the batch already runs, so
    * a trigger pays exactly one extra map pass. Docs with a null
    * `textCol` (no token rows in the join path) score on priors alone,
    * same fallback. */
  /** Shared frozen-scoring scaffold: every input column plus the
    * `__toks` scratch and one integer-scaled `__s6_<label>` score per
    * class (one native token pass each — [[graft.functions.TokenMapSum]]).
    * Callers fold their own argmax/margin expressions over the score
    * columns and drop the scratch. */
  private def frozenS6(model: FrozenNbModel, docs: DataFrame,
      textCol: String, face: String): DataFrame = {
    import graft.functions.TokenMapSum.token_map_sum
    // the scratch columns are dropped on the way out — refuse inputs
    // that would collide with (and silently lose) them
    val scratch = "__toks" +: model.labels.map(l => s"__s6_$l")
    require(!docs.columns.exists(scratch.contains),
      s"$face: input carries reserved scratch column(s) " +
        s"${docs.columns.filter(scratch.contains).mkString(", ")}")
    val toksOnce = docs.withColumn("__toks", toks(col(textCol)))
    model.labels.foldLeft(toksOnce) { (d, l) =>
      d.withColumn(s"__s6_$l", lit(model.prior6(l)) +
        coalesce(token_map_sum(col("__toks"), model.lik6(l)), lit(0L)))
    }
  }

  private def s6(l: String) = col(s"__s6_$l")

  /** The label-ascending score array + the [[graft.functions.Top2Scores]]
    * pick: top/second under (score DESC, label ASC) — label-ascending
    * array order makes the kernel's smallest-index tie rule exactly the
    * window rule. One linear kernel pass; the old nested CaseWhen
    * argmax folds cost SECONDS of driver codegen per planning pass at
    * C≈8 (Catalyst re-stringifies every enclosing block per nesting
    * level in reduceCodeSize). */
  private def top2Col(labels: Seq[String]): Column =
    graft.functions.Top2Scores.top2_scores(array(labels.map(s6): _*))

  private def labelAt(labels: Seq[String], idx: Column): Column =
    element_at(array(labels.map(lit): _*), idx + 1)

  def nbScoreFrozen(model: FrozenNbModel, docs: DataFrame,
      textCol: String): DataFrame = {
    require(!docs.columns.contains("predicted") &&
      !docs.columns.contains("score"),
      "nbScoreFrozen: input already has predicted/score columns")
    val withScores = frozenS6(model, docs, textCol, "nbScoreFrozen")
    withScores
      .withColumn("__t2", top2Col(model.labels))
      .withColumn("predicted", labelAt(model.labels, col("__t2.top_idx")))
      .withColumn("score", col("__t2.top") / 1000000.0)
      .drop("__toks" +: "__t2" +: model.labels.map(l => s"__s6_$l"): _*)
  }

  /** Classification margin — top-1 minus top-2 score per doc, the
    * standard uncertainty-sampling signal (docs a labeling pass should
    * look at first, or a router should treat as ambiguous). Returns
    * (doc_id, top_label, second_label, margin); integer-scaled scores
    * make the subtraction exact. Requires a model with ≥ 2 classes.
    *
    * Rides the frozen projection like [[nbPredict]] — the top-2 pick
    * folds over the C per-class score columns (second = the argmax
    * with the predicted label masked out, same tie rule), one map pass
    * over `test`, no shuffle; row-identical to the old window-ranked
    * path (ClassifySpec pins it; margin subtracts the same two
    * descaled doubles the window path subtracted). */
  def nbMargin(model: DataFrame, test: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val fm = nbFreeze(model)
    require(fm.labels.size >= 2,
      s"nbMargin needs a model with >= 2 classes, got ${fm.labels.size}")
    val withScores = frozenS6(fm,
      test.select(col(idCol), col(textCol)), textCol, "nbMargin")
    // top-2 in one kernel pass; margin subtracts the same two descaled
    // doubles the window path subtracted (each s6 fits a double
    // exactly, so descale-then-subtract matches bit for bit)
    withScores
      .withColumn("__t2", top2Col(fm.labels))
      .select(col(idCol).as("doc_id"),
        labelAt(fm.labels, col("__t2.top_idx")).as("top_label"),
        labelAt(fm.labels, col("__t2.second_idx")).as("second_label"),
        round(col("__t2.top") / 1000000.0 -
          col("__t2.second") / 1000000.0, 6).as("margin"))
  }
}
