package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hashed TF-IDF document vectors — text → fixed-dim vector entirely
  * in-engine, no external embedder.
  *
  * This closes the loop between the text operators and the vector ladder:
  * `documents.text` becomes an `Array[Double]` column that feeds the same
  * k-means / ANN / SemDeDup / prototype-pruning machinery the
  * `embeddings` table does. Feature hashing (Weinberger et al. 2009, the
  * `HashingTF` idea) instead of a vocabulary: `slot(term) = md5-prefix
  * mod dim`, so the feature space is FIXED at `dim` and no vocab is ever
  * collected, broadcast, or synchronized — the property that matters at
  * 100 TB, where a vocabulary is unbounded but a hash is free. The hash
  * is the repo's cross-engine md5-nibble idiom (Sampling.digestInt), so
  * a DuckDB oracle reproduces every slot exactly.
  *
  * Definitions are at SLOT granularity (true feature hashing — colliding
  * terms pool their counts BEFORE weighting):
  *  - `tf(d, s)`  = token occurrences of doc `d` hashing to slot `s`
  *  - `df(s)`     = number of docs with `tf(d, s) > 0`
  *  - `idf(s)`    = ln(1 + N / df(s))          (N = corpus doc count)
  *  - `w(d, s)`   = round(tf · idf, 6)         (round-before-use rule)
  *
  * Scale shape:
  *  - ONE corpus scan, NO corpus exchange: the per-doc slot histogram
  *    is computed inside each doc's row ([[graft.functions.SlotTf]]) and
  *    exploded already-final. The tf relation is bounded by docs × dim
  *    (NOT token count) and is localCheckpoint'ed because two consumers
  *    read it (df and the weight join — the d8 lesson); at 100 TB that
  *    is metadata scale relative to the corpus (docs × dim × 16 B).
  *  - df/idf is a dim-row aggregate, broadcast into the weight join.
  *  - [[tfidfKnn]] is the vector twin of BM25 ([[Retrieval.bm25TopK]]):
  *    query vectors broadcast, the corpus side never shuffled at corpus
  *    size (the dot-product join carries only rows whose slot is active
  *    in some query), ranking windowed BY QUERY.
  */
object Vectorize {

  /** `slot(term)` — first 4 md5 hex nibbles parsed base-16 (the ONE
    * cross-engine hash contract, Sampling.digestInt), mod `dim`.
    * Uniform in [0, dim). */
  def termSlot(term: Column, dim: Int): Column =
    pmod(Sampling.digestInt(md5(term), 4), lit(dim.toLong))

  private def toks(c: Column): Column = TextAnalysis.tokens(c)

  /** Conf key for the corpus-stat staging level: `auto` (default),
    * `memory` (eager localCheckpoint, fastest) or `disk` (eager
    * DISK_ONLY persist). The tf/weight relations are docs × dim-bounded,
    * but on a SINGLE node 100× the bench corpus walks past the executor
    * heap and localCheckpoint blocks start spilling mid-query (r4's
    * documented 24 GiB memory floor, docs/SCALE.md); `disk` trades a
    * slower warm path (measured ~4× at memory-resident sizes) for a
    * flat memory profile (measured 100× exponent 0.85 vs memory's
    * 1.14). `auto` picks per query from the corpus size estimate —
    * see [[resolveStatsMode]]. */
  val StatsStorageKey = "spark.graft.tfidf.statsStorage"

  /** Conf key for auto mode's crossover: corpus plan-stats bytes above
    * which `auto` resolves to `disk`. Default: this JVM's max heap /
    * 1024 — calibrated to the measured single-node crossover (the 10×
    * sf0.1 corpus, ~6 MB parquet against a 24 GiB heap, is memory-safe
    * and 4× faster in memory mode; the 100× corpus, ~60 MB parquet,
    * spills memory-mode localCheckpoints and disk mode wins the
    * exponent, soak_out_r10.json). The per-JVM-heap framing is a
    * SINGLE-NODE heuristic: on a multi-executor cluster the stat
    * relations shard, so either raise this key to (executors × heap) /
    * 1024 or pin `memory` explicitly. */
  val AutoDiskBytesKey = "spark.graft.tfidf.autoDiskBytes"

  /** Resolve [[StatsStorageKey]] for a corpus: explicit `memory`/`disk`
    * pass through; `auto` (the default) compares the corpus relation's
    * optimizer size estimate against [[AutoDiskBytesKey]]. An UNKNOWN
    * estimate (a checkpointed/derived corpus reports the
    * `defaultSizeInBytes` sentinel, not a size) resolves to `memory` —
    * the cluster-correct default — rather than letting the sentinel
    * silently force every derived input onto the disk path. */
  private[graft] def resolveStatsMode(docs: DataFrame): String =
    docs.sparkSession.conf.getOption(StatsStorageKey).getOrElse("auto") match {
      case "auto" =>
        val threshold = docs.sparkSession.conf.getOption(AutoDiskBytesKey)
          .map(_.toLong).getOrElse(Runtime.getRuntime.maxMemory / 1024)
        val est = docs.queryExecution.optimizedPlan.stats.sizeInBytes
        val unknown = est >=
          BigInt(docs.sparkSession.sessionState.conf.defaultSizeInBytes)
        if (!unknown && est > BigInt(threshold)) "disk" else "memory"
      case m => m
    }

  /** Materialize a corpus-stat relation eagerly under the RESOLVED
    * storage mode: both modes cut lineage re-execution for the multiple
    * consumers; `disk` keeps the blocks off-heap entirely. The mode is
    * resolved ONCE per query from the corpus relation (not per stat
    * relation) so one query never mixes modes. Package-visible so the
    * hybrid composition ([[Retrieval.hybridRrfTopK]]) can stage its
    * shared corpus pass under the same policy. */
  private[operators] def materializeStats(df: DataFrame, mode: String): DataFrame =
    mode match {
      case "disk" =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        p.count() // eager, like localCheckpoint(true)
        p
      case _ => df.localCheckpoint(true)
    }

  /** The shared corpus pass: slot tf counts (docs × dim-bounded,
    * checkpointed — df AND the weight join read it) and the dim-row idf
    * table. Every public face composes from this one pair.
    *
    * The per-doc slot histogram runs INSIDE each doc's row
    * ([[graft.functions.SlotTf]] — same md5-nibble slot hash as
    * [[termSlot]], parity in SlotTfSpec), so the old explode →
    * groupBy(doc, slot) corpus-scale exchange is gone; and because the
    * tf relation is one row per DISTINCT (doc, slot) by construction,
    * df is a plain `count`, not a `countDistinct` (one less aggregate
    * expansion). Rows are identical to the relational path. */
  private def tfAndIdf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): (DataFrame, DataFrame) = {
    require(dim > 0 && dim <= 65536, s"dim must be in [1, 65536], got $dim")
    IdContract.check(docs, idCol, "Vectorize.tfAndIdf")
    val tf = materializeStats(
      docs.select(col(idCol).as("doc_id"),
          explode(graft.functions.SlotTf.slot_tf(toks(col(textCol)), dim))
            .as("__e"))
        .select(col("doc_id"), col("__e.slot").as("slot"),
          col("__e.cnt").as("__tf")),
      resolveStatsMode(docs))
    val n = docs.select(countDistinct(col(idCol)).as("__n"))
    (tf, idfOf(tf, n))
  }

  /** The dim-row idf table from a (doc_id, slot, __tf) relation and the
    * one-row corpus doc count — the tail of [[tfAndIdf]], shared with
    * the hybrid composition's base-derived tf. `tf` must be one row per
    * DISTINCT (doc, slot) (the SlotTf kernel contract), so df is a
    * plain count. */
  private[operators] def idfOf(tf: DataFrame, n: DataFrame): DataFrame =
    tf.groupBy("slot")
      .agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(n))
      .select(col("slot"), log(lit(1.0) + col("__n") / col("__df"))
        .as("__idf"))

  private def weighted(tf: DataFrame, idf: DataFrame): DataFrame =
    tf.join(broadcast(idf), Seq("slot"))
      .select(col("doc_id"), col("slot"),
        round(col("__tf") * col("__idf"), 6).as("weight"))

  /** Sparse TF-IDF: (doc_id, slot, weight) for slots with tf > 0.
    * The canonical output — the oracle compares this shape, and the
    * dense face explodes from it. `dim` ≤ 65536 (4 md5 nibbles). */
  def tfidfSparse(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    val (tf, idf) = tfAndIdf(docs, idCol, textCol, dim)
    weighted(tf, idf)
  }

  /** [[tfidfSparse]] plus the corpus idf table it was weighted with:
    * (sparse (doc_id, slot, weight), (slot, idf)) from ONE corpus pass.
    * The idf side is what a frozen deployment needs to featurize NEW
    * documents consistently with the training corpus
    * ([[LogReg.freeze]]); it is dim-row metadata by construction. */
  def tfidfSparseWithIdf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): (DataFrame, DataFrame) = {
    val (tf, idf) = tfAndIdf(docs, idCol, textCol, dim)
    (weighted(tf, idf), idf.select(col("slot"), col("__idf").as("idf")))
  }

  /** Dense TF-IDF vectors: (doc_id, vec Array[Double] of length `dim`) —
    * the column shape the k-means / ANN / SemDeDup ladder consumes in
    * place of `embeddings.embedding`. */
  def tfidfVectors(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    tfidfSparse(docs, idCol, textCol, dim)
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("weight"))))
        .as("__m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          s => coalesce(element_at(col("__m"), s), lit(0.0))).as("vec"))

  /** Top-`k` corpus docs per query by TF-IDF cosine — the VECTOR twin of
    * [[Retrieval.bm25TopK]] (same probe-query contract, same ranking
    * rule), running on nothing but the corpus text.
    *
    * Query vectors use the CORPUS idf (the standard IR convention);
    * query slots with no corpus df are dropped — they cannot contribute
    * to any dot product, and dropping them from the query norm keeps the
    * norm computable from corpus statistics alone. Ranking considers
    * docs sharing ≥1 active slot with the query (cosine 0 docs can never
    * reach a positive-cosine top-k). Ties: (cos DESC, doc_id ASC), the
    * repo-wide rounded-before-ranked rule.
    *
    * Scale shape: both sides are L2-NORMALIZED BEFORE the slot join, so
    * the pair-scale relation (every query × every doc sharing a slot —
    * the brute-force face's inherent cost) is touched exactly once, by
    * the dot aggregation whose output IS the cosine; the norm joins run
    * on the corpus-token and query-token relations instead (at 10×/sf0.1
    * this halved the query: the norms-after-dots plan joined and
    * re-joined a 23.8M-pair relation). The top-k is the salted
    * two-stage rank (the pr4 idiom) — a query matching the whole corpus
    * ranks in `SaltCells` parallel cells, never one partition. For
    * corpus-scale k-NN without the all-pairs dot, use the ANN ladder
    * (Similarity/ProductQuantization).
    *
    * Returns (query_id, doc_id, cos, rk), rk 1..k. */
  def tfidfKnn(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // ONE corpus pass shared with the sparse face: tf is checkpointed
    // inside tfAndIdf, idf is the dim-row table — no second df
    // aggregation for the query side
    val (tf, idf) = tfAndIdf(docs, idCol, textCol, dim)
    tfidfKnnScore(tf, idf, queries, queryIdCol, queryTextCol, dim, k,
      resolveStatsMode(docs))
  }

  /** The scoring tail of [[tfidfKnn]] over a precomputed corpus tf
    * relation ((doc_id, slot, __tf), one row per distinct (doc, slot))
    * and its idf table — package-visible so the hybrid composition
    * ([[Retrieval.hybridRrfTopK]]) can feed both retrieval faces from
    * one shared corpus pass. Identical plan from `cs` down. */
  private[operators] def tfidfKnnScore(tf: DataFrame, idf: DataFrame,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      dim: Int, k: Int, statsMode: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // corpus sparse weights materialized once: norms AND the dot join
    val cs = materializeStats(weighted(tf, idf), statsMode)
    val cn = cs.groupBy("doc_id")
      .agg(sqrt(sum(col("weight") * col("weight"))).as("__cn"))
    // normalized corpus side: one co-keyed corpus-token × doc-count
    // join, BEFORE any query fan-out
    val cnw = cs.join(cn, Seq("doc_id"))
      .select(col("doc_id"), col("slot"),
        (col("weight") / col("__cn")).as("__nw"))
    // query tf over the same slot hash, weighted by the CORPUS idf
    val qs = queries
      .select(col(queryIdCol).as("query_id"),
        explode(toks(col(queryTextCol))).as("__term"))
      .select(col("query_id"), termSlot(col("__term"), dim).as("slot"))
      .groupBy("query_id", "slot").agg(count(lit(1)).as("__qtf"))
      .join(idf, Seq("slot"))
      .select(col("query_id"), col("slot"),
        round(col("__qtf") * col("__idf"), 6).as("__qw"))
      .localCheckpoint(true) // display-sized; feeds qnorm AND the dot join
    val qn = qs.groupBy("query_id")
      .agg(sqrt(sum(col("__qw") * col("__qw"))).as("__qn"))
    val qnw = qs.join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("slot"),
        (col("__qw") / col("__qn")).as("__qnw"))
    // normalized dot IS the cosine — the pair-scale relation exists
    // only inside this one partial-aggregated shuffle
    val scored = cnw.join(broadcast(qnw), Seq("slot"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("__nw") * col("__qnw")), 6).as("cos"))
    val wLocal = Window
      .partitionBy(col("query_id"), col("__salt"))
      .orderBy(col("cos").desc, col("doc_id").asc)
    val survivors = scored
      .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(SaltCells)))
      .withColumn("__lrk", row_number().over(wLocal))
      .filter(col("__lrk") <= k)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("doc_id").asc)
    survivors.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "cos", "rk")
  }

  /** Salt-cell count for the two-stage per-query rank: a doc lands in
    * exactly one cell, so the stage-1 cut is exact (anything outside a
    * cell's top-k has ≥ k same-query docs above it). */
  private val SaltCells = 32
}
