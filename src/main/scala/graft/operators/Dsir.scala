package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus (the "make CommonCrawl look
  * like Wikipedia" selector). Beyond-reference scope (SURVEY.md §7.4) —
  * a first-class training-data-pipeline operator.
  *
  * Method, exactly as the paper frames it:
  *  1. Features are hashed n-grams: every unigram and adjacent bigram of
  *     the lowercased whitespace tokenization, hashed into `dim` buckets.
  *     The hash is the repo's cross-engine md5-nibble contract
  *     ([[Sampling.digestInt]] — 4 nibbles mod dim, same as
  *     [[Vectorize.termSlot]]), so a DuckDB oracle reproduces every
  *     bucket exactly. Collisions are part of the method (feature
  *     hashing), not a defect.
  *  2. Fit two bag-of-hashed-n-grams models — target and raw — with
  *     add-one smoothing over the FULL bucket space:
  *     `p[b] = (c[b] + 1) / (T + dim)`.
  *  3. Per-bucket log-likelihood ratio `λ[b] = ln p_t[b] − ln p_r[b]`,
  *     integer-scaled to `floor(λ·10⁶ + 0.5)` (the cl1/Classify idiom:
  *     summing scaled longs is exact in any addition order, so the
  *     per-doc score cannot drift across engines or partitionings).
  *  4. Per-doc importance `log w(x) = Σ_b count_x[b] · λ[b]` (reported
  *     as `logratio`, descaled to 6 decimals).
  *  5. Resampling: k docs without replacement with probability ∝
  *     `exp(logratio)` — [[Sampling.weightedSample]]'s content-addressed
  *     Efraimidis-Spirakis clock, so the draw is deterministic and
  *     reproducible across engines, reruns, and resharding.
  *
  * Scale shape (the 100 TB contract):
  *  - The raw corpus is scanned ONCE: per-doc bucket counts are
  *    materialized (`localCheckpoint` — bounded by docs × dim, metadata
  *    scale next to the corpus) and BOTH consumers (the raw distribution
  *    aggregate and the scoring join) read that relation; the d8 lesson.
  *  - Both distributions and λ are dim-row tables — broadcast joins,
  *    never a corpus-side shuffle. The per-doc score is one partial-agg'd
  *    groupBy(doc). Selection is a TakeOrdered top-k, never a full sort.
  *  - The target corpus is typically display-to-small (a curated set);
  *    its scan feeds one dim-row aggregate.
  */
object Dsir {

  /** Per-doc hashed feature counts (__id, slot, cnt) — docs × dim
    * bounded. Features are every unigram AND adjacent bigram
    * (`w1 ‖ ' ' ‖ w2` — space-joined, disjoint from any unigram token:
    * tokens cannot contain whitespace by construction of the split),
    * hashed into [0, dim) by the md5-nibble contract. The histogram
    * runs INSIDE each doc's row ([[graft.functions.NgramSlotTf]] —
    * parity with the old explode → termSlot → groupBy(__id, slot)
    * path pinned in SlotTfSpec), so the corpus-scale exchange and the
    * token-level hash aggregate are gone; rows are identical. */
  private def docCounts(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    IdContract.check(df, idCol, "Dsir.docCounts")
    df.select(col(idCol).as("__id"),
        explode(graft.functions.NgramSlotTf.ngram_slot_tf(
          TextAnalysis.tokens(col(textCol)), dim)).as("__e"))
      .select(col("__id"), col("__e.slot").as("slot"),
        col("__e.cnt").as("cnt"))
  }

  /** Smoothed log-probability per bucket over the FULL [0, dim) space:
    * (slot, logp) with `logp = ln((c + 1) / (T + dim))`, c = 0 for
    * buckets the corpus never hits. `counts` = (slot, c) aggregate. */
  private def smoothedLogProb(spark: org.apache.spark.sql.SparkSession,
      counts: DataFrame, dim: Int): DataFrame = {
    val total = counts.agg(coalesce(sum("c"), lit(0L)).as("__t"))
    spark.range(dim).select(col("id").as("slot"))
      .join(counts, Seq("slot"), "left")
      .crossJoin(broadcast(total))
      .select(col("slot"),
        log((coalesce(col("c"), lit(0L)) + 1.0) / (col("__t") + dim))
          .as("logp"))
  }

  private def slotTotals(perDoc: DataFrame): DataFrame =
    perDoc.groupBy("slot").agg(sum("cnt").as("c"))

  /** The integer-scaled λ table (slot, lam) — λ·10⁶ as LONG, dense over
    * [0, dim). Exposed for inspection/spec use. */
  def logRatioTable(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, dim: Int): DataFrame =
    lambdaOf(smoothedLogProb(raw.sparkSession,
        slotTotals(docCounts(raw, idCol, textCol, dim)), dim),
      smoothedLogProb(raw.sparkSession,
        slotTotals(docCounts(target, idCol, textCol, dim)), dim))

  private def lambdaOf(rawLp: DataFrame, targetLp: DataFrame): DataFrame =
    targetLp.withColumnRenamed("logp", "__lt")
      .join(rawLp.withColumnRenamed("logp", "__lr"), Seq("slot"))
      .select(col("slot"),
        floor((col("__lt") - col("__lr")) * 1000000L + 0.5)
          .cast("long").as("lam"))

  /** Per-doc DSIR importance: (idCol, logratio) over every raw doc —
    * `logratio = Σ count·λ` descaled to 6 decimals (exact: the sum runs
    * over scaled longs). Docs with no tokens score 0. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, dim: Int): DataFrame = {
    require(dim > 0 && dim <= 65536, s"dim must be in [1, 65536], got $dim")
    // ONE raw-corpus scan: the per-doc counts feed BOTH the raw
    // distribution and the scoring join
    val rawCounts = docCounts(raw, idCol, textCol, dim).localCheckpoint(true)
    val rawLp = smoothedLogProb(raw.sparkSession, slotTotals(rawCounts), dim)
    val tgtLp = smoothedLogProb(raw.sparkSession,
      slotTotals(docCounts(target, idCol, textCol, dim)), dim)
    val lam = lambdaOf(rawLp, tgtLp)
    raw.select(col(idCol))
      .join(rawCounts.join(broadcast(lam), Seq("slot"))
          .groupBy("__id")
          .agg((sum(col("cnt") * col("lam")) / 1e6).as("logratio"))
          .withColumnRenamed("__id", idCol),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("logratio"), lit(0.0)).as("logratio"))
  }

  /** DSIR selection: `k` raw docs without replacement, probability ∝
    * `exp(logratio)` — importance resampling toward the target
    * distribution. Returns (idCol, logratio, sample_score); the score is
    * the Efraimidis-Spirakis clock (smallest-k wins), content-addressed
    * so the draw nests and replays (see [[Sampling.weightedSample]]). */
  def resample(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, dim: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val weights = importanceWeights(raw, idCol, textCol, target, dim)
    Sampling.weightedSample(weights, col(idCol), exp(col("logratio")), k)
  }
}
