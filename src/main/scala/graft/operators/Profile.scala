package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling — the "dataset card" statistics a training-data
  * pipeline publishes per slice (source, language, license, …): volume,
  * exact-duplicate rate, token-length distribution.
  *
  * One partial-aggregating grouped pass over the corpus; every statistic
  * is mergeable map-side, so the shuffle carries one small row per group
  * regardless of corpus size.
  *
  * `exact = false` swaps BOTH unbounded-memory statistics for sketches:
  * the distinct-document count becomes HyperLogLog++
  * (`approx_count_distinct`, ±`rsd` relative error) and the token
  * percentiles become a mergeable Greenwald-Khanna quantile summary
  * (`percentile_approx`, rank error ≤ n/`percentileAccuracy`, exact
  * below it) — at 100 TB sketches are the only viable forms (bounded
  * memory, one pass, partials merge across executors), and they are
  * the same sketches the streaming card
  * ([[graft.streaming.DocumentStream.startStatsJob]]) maintains, so
  * batch and streaming cards stay comparable. Exact mode is for
  * small-slice audits and cross-engine verification, where a
  * count(DISTINCT) and a full-sort percentile are affordable. The
  * sketch percentile returns an observed element where the exact one
  * interpolates — agreement within one inter-element gap at matched
  * rank (pinned in ProfileSpec).
  */
object Profile {

  // card definition shared by the flat and rollup faces — a change to
  // the fingerprint, token regex, percentile rounding, or dup_ratio
  // formula must hit both, or the two cards drift on the same slice
  private def cardFingerprint(textCol: String): Column = md5(col(textCol))
  private def cardTokens(textCol: String): Column =
    size(split(col(textCol), "\\s+")).cast("long")
  private def tokenPercentile(q: Double, name: String): Column =
    round(percentile(col("__tok"), lit(q)), 4).as(name)
  private def tokenPercentileSketch(q: Double, name: String,
      accuracy: Int): Column =
    percentile_approx(col("__tok"), lit(q), lit(accuracy))
      .cast("double").as(name)
  private def withDupRatio(card: DataFrame): DataFrame =
    card.withColumn("dup_ratio",
      round(lit(1.0) - col("n_unique") / col("n_docs").cast("double"), 6))

  /** Per-group dataset card over `textCol`, grouped by `groupCol`:
    * n_docs, n_unique (by md5 of text), dup_ratio, n_bytes, n_tokens,
    * avg_tokens, p50/p90/p99_tokens. */
  def datasetCard(docs: DataFrame, groupCol: String, textCol: String,
      exact: Boolean = true, rsd: Double = 0.05,
      percentileAccuracy: Int = 10000): DataFrame = {
    require(percentileAccuracy > 0,
      s"percentileAccuracy must be positive, got $percentileAccuracy")
    val distinctCnt =
      if (exact) count_distinct(col("__fp"))
      else approx_count_distinct(col("__fp"), rsd)
    def pct(q: Double, name: String): Column =
      if (exact) tokenPercentile(q, name)
      else tokenPercentileSketch(q, name, percentileAccuracy)
    val card = docs
      .select(col(groupCol), cardFingerprint(textCol).as("__fp"),
        cardTokens(textCol).as("__tok"),
        octet_length(col(textCol)).cast("long").as("__bytes"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        distinctCnt.as("n_unique"),
        sum(col("__bytes")).as("n_bytes"),
        sum(col("__tok")).as("n_tokens"),
        round(avg(col("__tok")), 4).as("avg_tokens"),
        pct(0.5, "p50_tokens"),
        pct(0.9, "p90_tokens"),
        pct(0.99, "p99_tokens"))
    withDupRatio(card)
  }

  /** Per-group top-k token heavy hitters — the "what dominates this
    * slice" card statistic (top tokens per language, top domains per
    * source). ONE partial-aggregated shuffle on (group, token): the
    * corpus never moves, only distinct (group, token) partial counts.
    *
    * The top-k over each group's vocabulary is a SALTED TWO-STAGE rank,
    * never a per-group window: vocabulary is not display-sized (Heaps'
    * law — a web-scale slice holds 10⁸⁺ distinct tokens), so ranking it
    * in one window partition per group is the funnel
    * [[Ranking.withGroupedNtile]] exists to avoid. Instead each token
    * hashes to exactly ONE of `nSalts` salt cells, stage 1 ranks within
    * (group, salt) — parallelism = groups × salts, each cell holding
    * ~vocab/nSalts rows — and stage 2 ranks the ≤ k·nSalts survivors
    * per group, a display-sized relation. The result is EXACT: any
    * token outside its cell's local top-k has ≥ k same-group tokens
    * ranked above it, so it cannot be in the group's global top-k.
    *
    * Ties break (count DESC, token ASC) in both stages so the cut is
    * deterministic and oracle-able. Tokenization is the corpus
    * convention ([[TextAnalysis.tokens]]: whitespace split of the
    * lowercased text), minus the empty token that leading/trailing
    * whitespace admits — '' is a split artifact, never a card
    * statistic. Returns (groupCol, token, cnt, rk), rk 1..k. */
  def topTokens(docs: DataFrame, groupCol: String, textCol: String,
      k: Int, nSalts: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val counts = docs
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__salt"))
      .orderBy(col("cnt").desc, col("token").asc)
    val survivors = counts
      .withColumn("__salt", pmod(xxhash64(col("token")), lit(nSalts)))
      .withColumn("__lrk", row_number().over(wLocal))
      .filter(col("__lrk") <= k)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(col("cnt").desc, col("token").asc)
    survivors.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("token"), col("cnt"), col("rk"))
  }

  /** Sketch path for [[topTokens]] — the form the card takes when even
    * the distinct (group, token) relation is too big to shuffle:
    * [[graft.functions.FrequentItemsSketch]] (Misra-Gries) aggregates
    * heavy hitters with HARD bounded state, so the corpus scan emits
    * one ≤ `capacity`-counter summary per (partition, group) partial,
    * the shuffle carries summaries (not vocabulary), and the merge is
    * one bounded fold per group. Where the exact path's cost grows with
    * vocabulary (Heaps' law), this one's is `groups × capacity` —
    * corpus-size-independent.
    *
    * EXACT — and bit-equal to [[topTokens]] — whenever no partial ever
    * overflows `capacity` (every emitted `max_err` is 0, the
    * certificate the caller can check); otherwise `cnt` is a lower
    * bound with error ≤ `max_err` ≤ N/(capacity+1), and any token whose
    * true share exceeds 1/(capacity+1) of the group is guaranteed
    * present (the Misra-Gries contract, property-tested in
    * FrequentItemsSpec). Ties and ranking mirror [[topTokens]]
    * (cnt DESC, token ASC). Returns (groupCol, token, cnt, max_err,
    * rk), rk 1..k. */
  def topTokensSketch(docs: DataFrame, groupCol: String, textCol: String,
      k: Int, capacity: Int = 4096): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k <= capacity, s"k=$k exceeds sketch capacity=$capacity")
    import graft.functions.FrequentItemsSketch.frequent_items
    val summaries = docs
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(groupCol))
      .agg(frequent_items(col("token"), capacity).as("__fi"))
    // the summary is already (est DESC, item ASC)-sorted, so the top-k
    // cut is a slice; posexplode supplies the rank
    summaries
      .select(col(groupCol),
        posexplode(slice(col("__fi"), 1, k)).as(Seq("__i", "__e")))
      .select(col(groupCol), col("__e.item").as("token"),
        col("__e.est").as("cnt"), col("__e.max_err").as("max_err"),
        (col("__i") + 1).cast("long").as("rk"))
  }

  /** Corpus version diff — what changed between two snapshots of a
    * dataset (crawl N vs crawl N+1, pre- vs post-curation): per group,
    * how many docs were added, removed, changed (same id, different
    * content hash), or unchanged. The dataset-versioning twin of the
    * metrics side's `ClustersDiff`.
    *
    * One full-outer join on the id — both sides reduced to (id, group,
    * md5) BEFORE the join, so the shuffle carries 16-byte digests, not
    * text — then one group-count aggregation. Group comes from whichever
    * side has the row (b wins for changed docs: the NEW snapshot's slice
    * assignment describes where the doc lives now). */
  def corpusDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, groupCol: String): DataFrame = {
    def keyed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as("__id"), col(groupCol).as(s"__g_$side"),
        md5(col(textCol)).as(s"__h_$side"))
    val joined = keyed(a, "a").join(keyed(b, "b"), Seq("__id"), "full_outer")
    val status = when(col("__h_a").isNull, "added")
      .when(col("__h_b").isNull, "removed")
      .when(col("__h_a") =!= col("__h_b"), "changed")
      .otherwise("unchanged")
    joined
      .select(coalesce(col("__g_b"), col("__g_a")).as("grp"),
        status.as("status"))
      .groupBy("grp", "status").agg(count(lit(1)).as("n"))
  }

  /** Multi-granularity dataset card: the [[datasetCard]] stats at every
    * ROLLUP level of `groupCols` (e.g. (source, lang) → per
    * source×lang, per source, grand total) in ONE pass — Spark's
    * `rollup` computes all levels from the same partial aggregates, so
    * a hierarchy of cards costs one shuffle, not one scan per level.
    * Subtotal rows carry NULL in the rolled-up columns (ANSI ROLLUP
    * semantics, same as the DuckDB oracle). */
  def datasetCardRollup(docs: DataFrame, groupCols: Seq[String],
      textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "rollup needs at least one group column")
    val card = docs
      .select(groupCols.map(col) :+ cardFingerprint(textCol).as("__fp") :+
        cardTokens(textCol).as("__tok"): _*)
      .rollup(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("__fp")).as("n_unique"),
        sum(col("__tok")).as("n_tokens"),
        round(avg(col("__tok")), 4).as("avg_tokens"),
        tokenPercentile(0.5, "p50_tokens"))
    withDupRatio(card)
  }
}
