package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation
  * (beyond-reference scope, SURVEY.md §7.4): content-addressed Bernoulli
  * sampling and per-stratum rate control (language/domain mixing).
  *
  * All sampling is hash-thresholded on md5 of a key column — reproducible
  * in any engine with md5, shuffle-free (a pure filter that pushes down),
  * and stable under reruns/resharding, unlike rand()-based sampling.
  * Rates are expressed in sixteenths of the keyspace (the first hex char
  * of the digest), the same content-addressed bucketing the touch/read_on
  * sampler uses (drivers/cassandra.py:303,1921-1935 samples reads the
  * same way, non-deterministically).
  */
object Sampling {

  /** 0-based position of md5(key)'s first hex char — a uniform bucket in
    * [0, 16). (locate/strpos exists in every target engine; conv() does
    * not, hence no base-16 parse here.) */
  private def hexBucket(keyCol: Column): Column =
    digestBucket(md5(keyCol.cast("string")))

  /** Same nibble-bucket over an already-computed hex digest column. */
  private def digestBucket(digest: Column): Column =
    call_function("locate",
      substring(digest, 1, 1),
      lit("0123456789abcdef")) - 1

  /** Keep a deterministic `sixteenths`/16 fraction of rows, addressed by
    * `keyCol` content. */
  def hashSample(df: DataFrame, keyCol: Column, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16, "rate is in sixteenths")
    df.filter(hexBucket(keyCol) < sixteenths)
  }

  /** Stratified sampling / domain mixing: an independent keep-rate per
    * stratum (language, source domain, quality band, …), in sixteenths.
    * Strata absent from `rates` keep `defaultSixteenths`. One pass, no
    * shuffle — the per-stratum rate is a CASE over the stratum column and
    * the hash filter prunes at the scan. */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
      rates: Map[String, Int], defaultSixteenths: Int = 16): DataFrame = {
    require((rates.values ++ Seq(defaultSixteenths)).forall(r => r >= 0 && r <= 16),
      "rates are in sixteenths")
    val rate = rates.toSeq.sortBy(_._1).foldRight(
      lit(defaultSixteenths): Column) { case ((stratum, r), rest) =>
      when(strataCol === stratum, lit(r)).otherwise(rest)
    }
    df.filter(hexBucket(keyCol) < rate)
  }

  /** Per-stratum cap (RefinedWeb-style per-domain limits): keep at most
    * `cap` rows per stratum, chosen content-addressed — rank rows inside
    * each stratum by md5(key) (ties broken by the key itself) and keep
    * the first `cap`. The selection is a property of the data, not of
    * partitioning or arrival order, so reruns and backfills keep the
    * SAME documents.
    *
    * Scale shape: one hash-partition shuffle on the stratum column plus
    * a per-partition sort (standard window). Domain skew makes single
    * domains hot, but the sort key is only (16-byte digest, key) — a
    * giant domain is a sort of its ids, not its payloads; project ids
    * first and semi-join payloads back if rows are wide (that is what
    * [[capPerStratumIds]] is for). */
  def capPerStratum(df: DataFrame, keyCol: Column, strataCol: Column,
      cap: Int): DataFrame = {
    require(cap > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5(keyCol.cast("string")), keyCol)
    // pick a rank column name the input provably doesn't use, so a
    // caller whose frame already has __rk is never clobbered/misranked
    val rk = Iterator.iterate("__rk")(_ + "_")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= cap)
      .drop(rk)
  }

  /** The kept-key set of [[capPerStratum]] computed over (stratum, key)
    * alone — shuffle the 2-column projection, then left-semi join the
    * wide payload back (broadcast when the cap × strata product is
    * small). The 100 TB form when document payloads are large. */
  def capPerStratumIds(df: DataFrame, keyCol: Column, strataCol: Column,
      cap: Int): DataFrame =
    capPerStratum(df.select(strataCol, keyCol), keyCol, strataCol, cap)

  /** The first `nibbles` hex chars of a digest parsed as an integer —
    * a uniform value in [0, 16^nibbles), built from locate/substr only
    * so the same expression runs on any md5-capable engine. */
  private[operators] def digestInt(digest: Column, nibbles: Int): Column =
    (1 to nibbles).map { i =>
      (call_function("locate", substring(digest, i, 1),
        lit("0123456789abcdef")) - 1) *
        lit(1L << (4 * (nibbles - i)))
    }.reduce(_ + _)

  /** Mixture planning: given target per-stratum token fractions
    * (Pile/DoReMi-style domain weights) and a total token budget, derive
    * each stratum's keep-rate min(1, budget·frac / stratumTokens) and
    * apply it content-addressed. Strata absent from `targetFractions`
    * get rate 0 — the mixture DEFINES the output corpus.
    *
    * The per-stratum totals are a stratum-count aggregate collected for
    * planning (like k-means centroids: metadata-sized, never row data);
    * the applied filter is a pure map pass with the rate inlined as a
    * CASE over the stratum column, so it prunes at the scan like
    * [[stratifiedSample]]. Rates are continuous in [0,1] — keyed on 4
    * digest nibbles (1/65536 granularity), not sixteenths. Emits
    * `keep_rate` alongside the surviving rows. */
  def mixtureSample(df: DataFrame, keyCol: Column, strataCol: Column,
      tokenCol: Column, targetFractions: Map[String, Double],
      tokenBudget: Long): DataFrame = {
    require(targetFractions.values.forall(f => f >= 0 && f <= 1),
      "fractions are in [0, 1]")
    require(tokenBudget > 0)
    val totals = stratumTotals(df, strataCol, tokenCol)
    applyRates(df, keyCol, strataCol, totals, targetFractions, tokenBudget)
  }

  /** UniMax-style temperature sampling (Chung et al. 2023; the
    * multilingual-mixing default): target fractions are DERIVED from
    * the corpus itself, frac_s ∝ tokens_s^(1/T), normalized. T = 1 is
    * natural (proportional) sampling; T → ∞ is uniform across strata —
    * in between, low-resource strata are up-weighted without hand-tuned
    * fractions. Planning and application are [[mixtureSample]]'s: one
    * stratum-totals aggregate (metadata-sized), the keep filter a pure
    * content-addressed map pass that prunes at the scan. */
  def temperatureMixture(df: DataFrame, keyCol: Column, strataCol: Column,
      tokenCol: Column, temperature: Double,
      tokenBudget: Long): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    require(tokenBudget > 0)
    val totals = stratumTotals(df, strataCol, tokenCol)
    // sorted for a deterministic z-sum order (float addition)
    val powed = totals.toSeq.sortBy(_._1).map { case (s, t) =>
      s -> math.pow(math.max(t, 1L).toDouble, 1.0 / temperature)
    }
    val z = powed.map(_._2).sum
    val fractions = powed.map { case (s, p) => s -> p / z }.toMap
    applyRates(df, keyCol, strataCol, totals, fractions, tokenBudget)
  }

  private def stratumTotals(df: DataFrame, strataCol: Column,
      tokenCol: Column): Map[String, Long] =
    df.groupBy(strataCol.as("__s"))
      .agg(sum(tokenCol).as("__tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def applyRates(df: DataFrame, keyCol: Column, strataCol: Column,
      totals: Map[String, Long], fractions: Map[String, Double],
      tokenBudget: Long): DataFrame = {
    val rate: Column = fractions.foldLeft(lit(0.0)) {
      case (acc, (s, f)) =>
        val tokens = math.max(totals.getOrElse(s, 0L), 1L)
        when(strataCol === s,
          lit(math.min(1.0, tokenBudget * f / tokens))).otherwise(acc)
    }
    val u = digestInt(md5(keyCol.cast("string")), 4).cast("double") / 65536.0
    df.withColumn("keep_rate", rate)
      .filter(u < col("keep_rate"))
  }

  /** Deterministic corpus shuffle + sharding for training dataloaders:
    * `shuffle_key` = md5(seed ‖ key) gives a reproducible global order
    * (ORDER BY shuffle_key = one range shuffle, no global window);
    * `shard` = the first 8 hex nibbles of the key parsed as a 32-bit
    * int, mod nShards — content-addressed like [[hashSample]], and
    * balanced for ANY shard count (the mod bias is nShards/2^32,
    * immeasurable for any sane dataloader fleet; a single-nibble bucket
    * would skew ~12% whenever nShards doesn't divide 16). */
  def shuffleShard(df: DataFrame, keyCol: Column, seed: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 65536, "nShards is in [1, 65536]")
    val key = md5(concat(lit(seed), lit(":"), keyCol.cast("string")))
    df.withColumn("shuffle_key", key)
      .withColumn("shard",
        pmod(digestInt(col("shuffle_key"), 8), lit(nShards)).cast("int"))
  }

  /** Curriculum training order: band the corpus into `bands` quality
    * tiers (band 1 = best `scoreCol`), shuffle deterministically WITHIN
    * each band (md5(seed‖key) — content-addressed, so the order
    * replays across engines and reruns), and emit the global training
    * `position` (1-based). The standard curriculum-learning emission
    * order: clean/easy data first, each tier internally shuffled so
    * no within-tier ordering bias leaks into training.
    *
    * Scale shape: both the banding and the global position come from
    * [[Ranking]]'s range-shuffle rank — two range shuffles total,
    * never a single-partition window. Adds `band`, `shuffle_key`,
    * `position`. */
  def curriculumOrder(df: DataFrame, keyCol: Column, scoreCol: Column,
      bands: Int, seed: String): DataFrame = {
    require(bands >= 1, s"bands must be positive, got $bands")
    require(!Seq("band", "shuffle_key", "position").exists(df.columns.contains),
      "input already has a band/shuffle_key/position column")
    val banded = Ranking.withGlobalNtile(df, bands, "band",
      scoreCol.desc, keyCol.asc)
    val keyed = banded.withColumn("shuffle_key",
      md5(concat(lit(seed), lit(":"), keyCol.cast("string"))))
    Ranking.withGlobalRowNumber(keyed, "position",
      col("band").asc, col("shuffle_key").asc, keyCol.asc)
  }

  /** Exponential-clock score for weighted sampling without replacement
    * (Efraimidis & Spirakis 2006, the `-ln(u)/w` equivalent of ranking
    * by `u^(1/w)`): `u` is drawn content-addressed from 8 md5 nibbles
    * of the key (`(digest+1)/2^32` ∈ (0,1], never 0), so the sample is
    * reproducible across reruns, resharding, and engines. Keeping the
    * k SMALLEST scores samples k rows with probability proportional to
    * weight. Weights must be positive. */
  private def aesScore(keyCol: Column, weightCol: Column): Column = {
    val u = (digestInt(md5(keyCol.cast("string")), 8) + 1)
      .cast("double") / 4294967296.0
    -log(u) / weightCol
  }

  /** Global weighted sample of `k` rows without replacement,
    * probability ∝ `weightCol` (token-budget mixing, importance
    * sampling). One pass + a top-k (per-partition heads merged by a
    * TakeOrderedAndProject — never a full sort). Emits the score as
    * `sample_score` (ordering is key-tiebroken, so the selection is
    * deterministic). Samples NEST: the top-k' of a k-sample (k' < k)
    * is exactly the k'-sample — shrinking a budget only drops rows. */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
      k: Int): DataFrame = {
    require(k >= 1)
    require(!df.columns.contains("sample_score"),
      "input already has a sample_score column")
    // rows with null/zero/negative weight are out of the draw (a null
    // score would sort nulls-first and hijack top-k slots)
    df.filter(weightCol > 0)
      .withColumn("sample_score", aesScore(keyCol, weightCol))
      .orderBy(col("sample_score").asc, keyCol.asc)
      .limit(k)
  }

  /** Per-stratum weighted sample: `k` rows per stratum, probability ∝
    * weight inside each stratum (balanced domain mixing when strata
    * are sources/languages). One ranking window per stratum — a single
    * shuffle on the stratum key. */
  def weightedSamplePerStratum(df: DataFrame, keyCol: Column,
      strataCol: Column, weightCol: Column, k: Int): DataFrame = {
    require(k >= 1)
    require(!df.columns.contains("sample_score") &&
      !df.columns.contains("__rn"),
      "input already has a sample_score/__rn column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(col("sample_score").asc, keyCol.asc)
    df.filter(weightCol > 0)
      .withColumn("sample_score", aesScore(keyCol, weightCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
