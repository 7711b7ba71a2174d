package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Okapi BM25 top-k retrieval over the document corpus.
  *
  * The training-data-pipeline use case is query-based curation: score every
  * corpus document against a set of probe queries (eval-set titles, topic
  * seeds, contamination probes) and keep/drop/inspect the top hits. Two
  * faces share one scoring plan:
  *  - [[bm25TopK]] scores straight off the corpus (scan-time "index");
  *  - [[buildTextIndex]]/[[bm25IndexTopK]] persist the inverted index —
  *    term-bucket-partitioned postings — and probe it reading only the
  *    query terms' partitions (the IVF-index pattern applied to text).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - The query set is display-sized and is BROADCAST as
  *    (query_id, term) pairs filtering the corpus map-side. The corpus
  *    is scanned exactly ONCE per face (stats aside): per-doc tf is
  *    counted INSIDE each doc's row ([[graft.functions.TokenTf]] — no
  *    explode → groupBy exchange), document frequency is derived from
  *    the materialized hits, not a second corpus pass, and every
  *    LIVE-path shuffle (df counting, per-query score sum) carries
  *    only rows whose term matched a query term. The index BUILD pays
  *    one postings-sized exchange to cluster by term_bucket before its
  *    partitioned write (one writer/file per bucket).
  *  - Corpus statistics (N, avgdl) are a one-row aggregate cross-joined
  *    in, the same scalar-broadcast pattern the downsampler uses; the
  *    persisted index stores them at build time.
  *  - Ranking is a window partitioned BY QUERY — parallelism = |queries|,
  *    each partition holding only that query's candidate docs.
  *
  * Scoring is standard Okapi BM25 with the Lucene-style `+1` inside the
  * idf log (keeps idf positive for terms in more than half the corpus):
  * `idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`, and per-term
  * `idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`. Query terms are
  * deduplicated (query term frequency is ignored, the common engine
  * default). Tokenization is the corpus-wide convention: whitespace split
  * of the lowercased text (TextAnalysis.tokens).
  *
  * Determinism contract: per-term scores round to 6 decimals, the summed
  * score to 4, and the rank orders by (score DESC, doc_id ASC) — the same
  * rounded-before-ranked rule every cosine ranking in this repo uses. The
  * index path reproduces the live path bit-for-bit (df, N, avgdl are the
  * same integers/doubles; RetrievalSpec pins equality).
  */
object Retrieval {

  /** Reserved postings partition holding one MARKER row per document
    * appended after the build (batch [[appendToTextIndex]] or the
    * streaming face [[graft.streaming.TextIndexStream]]): (doc_id,
    * __dl, __term = null, __tf = 1, __seq) under `term_bucket = -1`.
    * Markers make an append CRASH-ATOMIC — they land in the SAME
    * write job as the batch's postings, so either both committed or
    * neither — and double as the replay-presence state (one partition
    * directory, doc_id column only) and the appended half of the
    * corpus stats (probe-time N/avgdl = stats file + marker
    * aggregate: Σ__tf docs, Σ__dl tokens). [[compactTextIndex]] FOLDS
    * markers below the replay horizon into one fold row (doc_id null,
    * __tf = Σdocs, __dl = Σdl), so the marker aggregate a query pays
    * for stays one-micro-batch-sized however many docs were ever
    * appended. Probes never read the partition's postings side: query
    * buckets are pmod-nonnegative. */
  val MarkerBucket: Long = -1L

  /** `__seq` sentinel for rows that can never be replayed by the
    * streaming engine — built postings, batch-append markers, and fold
    * rows. Markers carrying it are always foldable at compaction;
    * stream markers carry their micro-batch id (≥ 0) instead, and only
    * the NEWEST stream batch (the one Structured Streaming can re-run
    * after a crash) survives a fold. */
  val FoldableSeq: Long = -1L

  private def toks(c: Column): Column = TextAnalysis.tokens(c)

  /** (doc_id, __dl, __term, __tf) — one row per DISTINCT corpus
    * (doc, term), with the term's in-doc occurrence count. The per-doc
    * tf aggregate runs INSIDE the row ([[graft.functions.TokenTf]] —
    * all of a doc's tokens arrive in its one text cell), so the old
    * explode → groupBy(doc, __dl, __term) corpus-scale exchange and its
    * token-level hash-aggregate disappear from every consumer (live
    * hits, index build, append); the relational rows are identical. */
  private def docTermTf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    IdContract.check(docs, idCol, "Retrieval.docTermTf")
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).as("__dl"),
        explode(graft.functions.TokenTf.token_tf(col("__t"))).as("__e"))
      .select(col("doc_id"), col("__dl"),
        col("__e.term").as("__term"), col("__e.tf").as("__tf"))
  }

  /** (query_id, __term) with terms deduped per query — broadcast side. */
  private def queryTerms(queries: DataFrame, queryIdCol: String,
      queryTextCol: String): DataFrame =
    queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(toks(col(queryTextCol)))).as("__term"))

  /** Shared scoring tail: `hits` = (query_id, doc_id, __dl, __term, __tf)
    * restricted to query terms, `stats` = one row (__n, __avgdl).
    *
    * TWO consumers read `hits`: the document-frequency count and the
    * scoring join — df comes from the hits themselves
    * (`countDistinct(doc_id)` per term — every doc containing a query
    * term is present regardless of which query matched), never from a
    * second corpus pass. The live path materializes hits once
    * (`localCheckpoint` — hits-sized, never corpus-sized) so the corpus
    * scan feeding them runs ONCE (the d8 lesson); the index path skips
    * the checkpoint — its input is the already-pruned postings scan,
    * cheap to read twice and better left visible to partition pruning
    * and plan inspection. */
  private def scoreRank(hitsRaw: DataFrame, stats: DataFrame, k: Int,
      k1: Double, b: Double, materializeHits: Boolean): DataFrame = {
    val hits = if (materializeHits) hitsRaw.localCheckpoint(true) else hitsRaw
    val dfreq = hits.groupBy("__term")
      .agg(countDistinct(col("doc_id")).as("__df"))
    // avgdl rides the idf rows: one broadcast feeds the scoring join
    // instead of two (the idf table is per-term metadata either way)
    val idf = dfreq.crossJoin(broadcast(stats))
      .select(col("__term"),
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
          .as("__idf"),
        col("__avgdl"))
    val termScores = hits
      .join(broadcast(idf), Seq("__term"))
      .select(col("query_id"), col("doc_id"),
        // grouping mirrors the oracle's `1 - b + b*dl/avgdl` bit-exactly:
        // IEEE * and + commute, so (dl*b)/avgdl + (1-b) == (b*dl)/avgdl
        // evaluated left-to-right
        round(col("__idf") * col("__tf") * (k1 + 1.0) /
          (col("__tf") +
            (col("__dl") * b / col("__avgdl") + (1.0 - b)) * k1),
          6).as("__ts"))
    val scored = termScores.groupBy("query_id", "doc_id")
      .agg(round(sum("__ts"), 4).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "score", "rk")
  }

  /** BM25 top-`k` docs per query, scored straight off the corpus.
    * `queries` must be display-sized (broadcast). Returns
    * (query_id, doc_id, score, rk) with rk 1..k. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val stats = docs.select(size(toks(col(textCol))).as("__dl"))
      .agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))
    // candidate postings: per-doc (term, tf) rows ⋈ broadcast query
    // terms — the only corpus-wide pass, map-only (tf was counted
    // inside each doc's row; (query, term) pairs are distinct, so the
    // join output is already one row per (query, doc, term))
    val hits = docTermTf(docs, idCol, textCol)
      .join(broadcast(queryTerms(queries, queryIdCol, queryTextCol)),
        Seq("__term"))
      .select(col("query_id"), col("doc_id"), col("__dl"), col("__term"),
        col("__tf"))
    scoreRank(hits, stats, k, k1, b, materializeHits = true)
  }

  /** Hybrid retrieval — [[rrfFuse]] of the BM25 ([[bm25TopK]]) and
    * TF-IDF-cosine ([[Vectorize.tfidfKnn]]) top-`k` lists — from ONE
    * corpus scan. Composing the two public faces pays the corpus
    * tokenize pass twice (each face scans and tokenizes `docs`
    * itself); here the per-doc term histogram ([[graft.functions
    * .TokenTf]]), slot histogram ([[graft.functions.SlotTf]]) and
    * document length are computed side by side in the SAME row and the
    * shared base is materialized once (under [[Vectorize]]'s
    * statsStorage policy) — every corpus statistic both faces need
    * (N, avgdl, df, idf, tf) derives from it without touching `docs`
    * again. Row-identical to the two-pass composition
    * (RetrievalSpec pins it): both faces run their unchanged scoring
    * tails ([[scoreRank]], [[Vectorize.tfidfKnnScore]]) on relationally
    * identical inputs. Returns (query_id, doc_id, rrf_score, rk). */
  def hybridRrfTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      dim: Int, k: Int, k1: Double = 1.2, b: Double = 0.75,
      c: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    IdContract.check(docs, idCol, "Retrieval.hybridRrfTopK")
    val base = Vectorize.materializeStats(
      docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__t"))
        .select(col("doc_id"), size(col("__t")).as("__dl"),
          graft.functions.TokenTf.token_tf(col("__t")).as("__terms"),
          graft.functions.SlotTf.slot_tf(col("__t"), dim).as("__slots")),
      Vectorize.resolveStatsMode(docs))
    // lexical face: stats + hits off the base — no materializeHits
    // (the base is already materialized; the two scoreRank consumers
    // re-run only the map-side explode + broadcast join)
    val stats = base.agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))
    val hits = base
      .select(col("doc_id"), col("__dl"), explode(col("__terms")).as("__e"))
      .select(col("doc_id"), col("__dl"), col("__e.term").as("__term"),
        col("__e.tf").as("__tf"))
      .join(broadcast(queryTerms(queries, queryIdCol, queryTextCol)),
        Seq("__term"))
      .select(col("query_id"), col("doc_id"), col("__dl"), col("__term"),
        col("__tf"))
    val lex = scoreRank(hits, stats, k, k1, b, materializeHits = false)
    // vector face: tf + idf off the same base rows
    val tf = base.select(col("doc_id"), explode(col("__slots")).as("__e"))
      .select(col("doc_id"), col("__e.slot").as("slot"),
        col("__e.cnt").as("__tf"))
    val n = base.agg(countDistinct(col("doc_id")).as("__n"))
    val vec = Vectorize.tfidfKnnScore(tf, Vectorize.idfOf(tf, n), queries,
      queryIdCol, queryTextCol, dim, k, Vectorize.resolveStatsMode(docs))
    rrfFuse(Seq(lex, vec), k, c)
  }

  /** Persist the inverted index for [[bm25IndexTopK]]: postings
    * (term, doc_id, tf, dl, seq) partitioned by `term_bucket` =
    * pmod(xxhash64(term), nBuckets) — a probe's partition filter reads
    * only its query terms' buckets — plus the one-row corpus stats.
    * Document frequency is NOT stored: a posting row is one (doc, term)
    * pair, so df is a count over the (already pruned) probe scan. Stats
    * are kept as EXACT integer totals (doc count, token count); avgdl
    * is derived at probe time and stays bit-identical to the live
    * path's mean. The stats file is written ONCE here — every append
    * (batch or streaming) contributes through [[MarkerBucket]] marker
    * rows instead, so there is exactly one append protocol and no
    * non-atomic stats rewrite anywhere. */
  def buildTextIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    docTermTf(docs, idCol, textCol)
      .select(col("doc_id"), col("__dl").cast("long").as("__dl"),
        col("__term"), col("__tf"), lit(FoldableSeq).as("__seq"),
        pmod(xxhash64(col("__term")), lit(nBuckets)).as("term_bucket"))
      // cluster by the partition column before the write: the tf
      // relation arrives with the SCAN's partitioning (docTermTf no
      // longer shuffles), so without this one exchange the write would
      // fan every input task across every bucket directory (the old
      // groupBy's layout: tasks × buckets files) — or, for a small
      // corpus, run single-task. One writer per bucket: ~1 file per
      // bucket, probes read exactly one file per probed bucket.
      .repartition(col("term_bucket"))
      .write.mode("overwrite")
      .partitionBy("term_bucket")
      .parquet(s"$dir/postings")
    statsOf(docs, idCol, textCol)
      .withColumn("__nbuckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** APPEND a document batch to a [[buildTextIndex]] index — the text
    * twin of the IVF index's FAISS-add() face (Similarity
    * .appendToIvfIndex): the batch's postings land as new files inside
    * the existing term-bucket partitions (existing postings are never
    * rewritten; probes union whatever files a bucket holds) together
    * with one [[MarkerBucket]] marker row per doc in the SAME write
    * job, so the append is crash-atomic and a probe after
    * build(A)+append(B) is bit-identical to build(A∪B) — the marker
    * aggregate supplies B's share of N/avgdl; the stats file is never
    * rewritten. Appending the same doc twice duplicates its postings
    * (and its stats contribution), exactly like FAISS add(); the
    * streaming face ([[graft.streaming.TextIndexStream]]) adds the
    * replay anti-join on top of this same protocol. */
  def appendToTextIndex(newDocs: DataFrame, idCol: String,
      textCol: String, dir: String): Unit = {
    val nBuckets = newDocs.sparkSession.read.parquet(s"$dir/stats")
      .select("__nbuckets").head().getInt(0)
    appendDocsWithMarkers(newDocs, idCol, textCol, dir, nBuckets,
      FoldableSeq)
  }

  /** Append `docs`' postings PLUS one [[MarkerBucket]] marker row per
    * doc in a SINGLE write job — the one append protocol both faces
    * share: Spark's commit protocol publishes the job's files across
    * all partitions together, so a doc's postings and its marker (the
    * replay-presence record and the stats contribution) can never be
    * separated by a crash. The stats FILE is not touched;
    * [[bm25IndexTopK]] folds the marker aggregate in at probe time.
    * `seq` stamps every row: the streaming face passes its micro-batch
    * id (markers of the newest batch must survive [[compactTextIndex]]
    * for replay's anti-join), batch callers pass [[FoldableSeq]]. */
  private[graft] def appendDocsWithMarkers(docs: DataFrame,
      idCol: String, textCol: String, dir: String, nBuckets: Int,
      seq: Long): Unit = {
    val postings = docTermTf(docs, idCol, textCol)
      .select(col("doc_id"), col("__dl").cast("long").as("__dl"),
        col("__term"), col("__tf"), lit(seq).as("__seq"),
        pmod(xxhash64(col("__term")), lit(nBuckets)).as("term_bucket"))
    val markers = docs.select(col(idCol).as("doc_id"),
      size(toks(col(textCol))).cast("long").as("__dl"),
      lit(null).cast("string").as("__term"),
      lit(1L).as("__tf"),
      lit(seq).as("__seq"),
      lit(MarkerBucket).as("term_bucket"))
    graft.sources.Compaction.guardedAppend(docs.sparkSession, dir) {
      // one writer per touched bucket (same rationale as the build's
      // pre-write exchange): an append drops one file per bucket
      // instead of one per (input task × bucket)
      postings.unionByName(markers)
        .repartition(col("term_bucket"))
        .write.mode("append")
        .partitionBy("term_bucket")
        .parquet(s"$dir/postings")
    }
  }

  /** Compact a text index's term-bucket partitions in place: appends
    * drop one file per batch into every touched bucket (and the marker
    * partition), and probe cost grows with file count, not row count.
    * Buckets are rewritten `bucketsPerSlice` at a time under dynamic
    * partition overwrite (set per-write, never on the session) —
    * untouched buckets keep their files, and a probe sees each bucket
    * either pre- or post-compaction (same rows). The
    * [[Similarity.compactIvfIndex]] pattern. The marker partition is
    * additionally FOLDED: markers below the replay horizon collapse
    * into one fold row (see [[foldMarkers]]), bounding every future
    * probe's marker aggregate.
    *
    * GUARDED against a live append ([[graft.sources.Compaction]]'s
    * two-flag protocol): each slice is read then overwritten, so a
    * batch committed between the two would be silently dropped (and a
    * doc's postings and marker span multiple slices) — a concurrent
    * append or compaction now fails fast with
    * [[graft.sources.ConcurrentCompactionException]] instead. Stop or
    * drain the [[graft.streaming.TextIndexStream]] job before
    * compacting; the streaming checkpoint makes the stopped stream
    * resume exactly where it left off. */
  def compactTextIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, bucketsPerSlice: Int = 16): Unit =
      graft.sources.Compaction.guardedCompaction(spark, dir) {
    foldMarkers(spark, dir)
    // postings listed ONCE (after the fold's rewrite); each slice's
    // overwrite replaces only its own bucket dirs, which no later
    // slice reads
    val base = spark.read.parquet(s"$dir/postings")
    val buckets = base
      .filter(col("term_bucket") =!= MarkerBucket)
      .select("term_bucket").distinct().collect()
      .map(_.get(0)).sortBy(_.toString).toSeq
    graft.sources.Compaction.rewriteSlices(buckets, bucketsPerSlice) {
      slice => base.filter(col("term_bucket").isin(slice: _*))
    } { (staged, slice) =>
      staged.repartition(slice.length, col("term_bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket")
        .parquet(s"$dir/postings")
    }
  }

  /** Fold the marker partition down to the replay horizon. Only the
    * NEWEST stream batch can ever be replayed (Structured Streaming
    * re-runs at most the last micro-batch whose checkpoint commit is
    * missing), so its markers are kept verbatim for the replay
    * anti-join; every other marker — older stream batches, batch-append
    * markers, fold rows from earlier compactions — collapses into ONE
    * fold row (doc_id null, __tf = Σdocs, __dl = Σdl, __seq =
    * [[FoldableSeq]]). The integer totals a probe aggregates are
    * identical before and after, but the rows it reads drop from
    * docs-ever-appended to one-micro-batch + 1. The rewrite is a
    * single dynamic-overwrite job of the one marker partition —
    * crash-atomic, a probe sees it either pre- or post-fold. */
  private def foldMarkers(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val markers = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket") === MarkerBucket)
      .localCheckpoint(true)
    if (markers.isEmpty) return
    val maxSeq = markers.agg(max("__seq")).head().getLong(0)
    val horizon =
      if (maxSeq == FoldableSeq) markers.limit(0)
      else markers.filter(col("__seq") === maxSeq)
    val foldable =
      if (maxSeq == FoldableSeq) markers
      else markers.filter(col("__seq") =!= maxSeq)
    if (foldable.isEmpty) return
    // already at the fixed point (one fold row, nothing newer): skip
    // the no-op rewrite job a back-to-back compaction would otherwise
    // re-run every time
    if (maxSeq == FoldableSeq && markers.limit(2).count() == 1) return
    val foldRow = foldable
      .agg(sum("__tf").as("__tf"), sum("__dl").as("__dl"))
      .select(
        lit(null).cast(markers.schema("doc_id").dataType).as("doc_id"),
        col("__dl"), lit(null).cast("string").as("__term"), col("__tf"),
        lit(FoldableSeq).as("__seq"),
        lit(MarkerBucket).cast(markers.schema("term_bucket").dataType)
          .as("term_bucket"))
    horizon.unionByName(foldRow)
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("term_bucket")
      .parquet(s"$dir/postings")
  }

  /** Maintenance report for a [[buildTextIndex]]/[[buildPhraseIndex]]
    * index: one row per postings partition — the term buckets, plus the
    * [[MarkerBucket]] row once appends have landed — with posting-row
    * and file counts. Files creeping up per bucket (streaming appends'
    * one-file-per-batch floor) is the [[compactTextIndex]] trigger,
    * exactly as [[Similarity.indexStats]] triggers the IVF compaction.
    * Metadata-scale: one count per bucket, file names from the scan's
    * `_metadata` column — postings are never deserialized beyond the
    * partition column. `term_bucket` is cast long so the report's shape
    * is independent of partition-column inference. */
  def textIndexStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(s"$dir/postings")
      .groupBy(col("term_bucket").cast("long").as("term_bucket"))
      .agg(count(lit(1)).as("postings"),
        countDistinct(col("_metadata.file_path")).as("files"))
      .orderBy("term_bucket")

  private def statsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(size(toks(col(textCol))).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"), sum("__dl").as("__sumdl"))

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    * search combiner: given N per-query rankings (each with columns
    * `query_id, doc_id, rk`, e.g. BM25 and vector top-k), score every
    * (query, doc) by `Σ_lists 1/(c + rk)` and re-rank. Rank-based, so
    * incomparable score scales (BM25 vs cosine) fuse without
    * normalization — which is why RRF is the default in every hybrid
    * search engine.
    *
    * Per-list contributions are computed in FIXED POINT — `10⁹ div
    * (c + rk)` summed as longs — so the fused score is exact in any
    * addition order across engines (the cl1/ds1 integer-scale idiom);
    * `rrf_score` is the descaled sum. Ties: (score DESC, doc_id ASC),
    * the repo ranking rule.
    *
    * Scale shape: inputs are already top-k-per-query relations
    * (|queries| × k rows — hits-sized, never corpus-sized); one union,
    * one grouped sum, one per-query ranking window. Returns
    * (query_id, doc_id, rrf_score, rk), rk 1..k. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    require(c >= 0, s"rrf constant must be non-negative, got $c")
    val lists = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rk")))
      .reduce(_.unionByName(_))
    val fused = lists
      .select(col("query_id"), col("doc_id"),
        expr(s"1000000000 div (${c.toLong} + rk)").as("__c"))
      .groupBy("query_id", "doc_id")
      .agg(sum("__c").as("__s"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__s").desc, col("doc_id").asc)
    fused.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("doc_id"),
        (col("__s") / 1e9).as("rrf_score"), col("rk"))
  }

  /** BM25 top-`k` against a [[buildTextIndex]] index. The query term
    * list (display-sized) is collected once to drive BOTH the partition
    * filter (bucket pruning) and the row filter (`term IN ...`, pushed to
    * the parquet scan) — the ivfIndexKnn pattern. Scores are identical
    * to [[bm25TopK]] on the same corpus. */
  def bm25IndexTopK(queries: DataFrame, queryIdCol: String,
      queryTextCol: String, indexDir: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = queries.sparkSession
    // materialized: feeds the driver-side term list AND the broadcast
    // join side (the d8 lesson — don't recompute the explode twice)
    val qterms = queryTerms(queries, queryIdCol, queryTextCol)
      .localCheckpoint(true)
    val terms = qterms.select("__term").distinct()
      .collect().map(_.getString(0)).toSeq
    val statsRaw = spark.read.parquet(s"$indexDir/stats")
    // corpus totals = stats file (the build) PLUS the appended docs'
    // marker rows (each marker carries __tf = its doc count — 1 for a
    // live marker, Σfolded for a fold row — so compaction never changes
    // the totals); a marker-less index prunes the [[MarkerBucket]]
    // partition to zero files, so the aggregate is free and yields
    // (0, 0). avgdl from the exact summed totals: sum/count is the same
    // division the live path's avg() performs, so the two faces cannot
    // drift
    val markerAgg = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term_bucket") === MarkerBucket)
      .agg(coalesce(sum(col("__tf")), lit(0L)).as("__mn"),
        coalesce(sum(col("__dl")), lit(0L)).as("__msum"))
    val stats = statsRaw.crossJoin(markerAgg)
      .select((col("__n") + col("__mn")).as("__n"),
        ((col("__sumdl") + col("__msum")).cast("double") /
          (col("__n") + col("__mn"))).as("__avgdl"))
    val nBuckets = statsRaw.select("__nbuckets").head().getInt(0)
    // bucket ids via the engine's own hash — evaluated in a plan, not
    // reimplemented driver-side, so build and probe can never drift
    val buckets = qterms.select(
        pmod(xxhash64(col("__term")), lit(nBuckets)).as("__b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val hits = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("__term").isin(terms: _*))
      .join(broadcast(qterms), Seq("__term"))
      .select("query_id", "doc_id", "__dl", "__term", "__tf")
    scoreRank(hits, stats, k, k1, b, materializeHits = false)
  }

  /** Positional phrase search — exact consecutive-token match, the
    * retrieval primitive BM25's bag-of-words scoring cannot express
    * ("new york" must not match "york ... new").
    *
    * The anchor trick keeps it join-shaped instead of sequential: a
    * phrase occurrence starting at token position `p` has its `j`-th
    * phrase term at position `p + j`, so every (posting, phrase-term)
    * match contributes a vote for anchor `pos - j`, and an anchor with
    * votes from ALL phrase offsets is a complete occurrence. One
    * broadcast join (corpus postings ⋈ query terms — only postings
    * whose term appears in some phrase survive, hits-sized like BM25),
    * one shuffle on (query, doc, anchor), one display-sized rollup.
    * Within an anchor group each phrase offset can vote at most once
    * (the position is determined by anchor + offset), so plain counts
    * need no distinct.
    *
    * Returns (query_id, doc_id, n_hits, first_pos) for docs containing
    * the full phrase at least once; `first_pos` is the 0-based token
    * position of the earliest occurrence. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String,
      queryTextCol: String): DataFrame = {
    val qtoks = queries.select(col(queryIdCol).as("query_id"),
      toks(col(queryTextCol)).as("__ph"))
    val qterms = qtoks.select(col("query_id"),
      posexplode(col("__ph")).as(Seq("__qpos", "__term")))
    val qlen = qtoks.select(col("query_id"),
      size(col("__ph")).as("__m"))
    val postings = docs
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__t"))
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("__pos", "__term")))
    val votes = postings.join(broadcast(qterms), Seq("__term"))
      .select(col("query_id"), col("doc_id"),
        (col("__pos") - col("__qpos")).cast("long").as("__anchor"))
    val anchors = votes.groupBy("query_id", "doc_id", "__anchor")
      .agg(count(lit(1)).as("__votes"))
    anchors.join(broadcast(qlen), Seq("query_id"))
      .filter(col("__votes") === col("__m"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"), min(col("__anchor")).as("first_pos"))
  }

  /** Persist a POSITIONAL index for [[phraseIndexSearch]]: one row per
    * (doc, term) carrying the term's sorted in-doc position list,
    * partitioned by `term_bucket` = pmod(xxhash64(term), nBuckets) —
    * the [[buildTextIndex]] layout with positions where the BM25 index
    * has tf. Positions are what phrase matching needs and bag-of-words
    * scoring discards; storing them per (doc, term) keeps the index
    * row count equal to the BM25 index's (the position arrays add
    * ~one long per corpus token, spread across the buckets). The
    * stats artifact records nBuckets so probes bucket with the
    * build's convention. */
  def buildPhraseIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(toks(col(textCol))).as(Seq("__pos", "__term")))
      .groupBy("doc_id", "__term")
      .agg(sort_array(collect_list(col("__pos"))).as("__positions"))
      .select(col("doc_id"), col("__term"), col("__positions"),
        pmod(xxhash64(col("__term")), lit(nBuckets)).as("term_bucket"))
      .write.mode("overwrite")
      .partitionBy("term_bucket")
      .parquet(s"$dir/postings")
    Seq(nBuckets).toDF("__nbuckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** [[phraseSearch]] against a [[buildPhraseIndex]] index — identical
    * results (pinned in RetrievalSpec), but the corpus never re-scans:
    * the query phrases' term list (display-sized) is collected once to
    * drive the partition filter (bucket pruning) and the pushed
    * `term IN ...` row filter, so the probe reads only the phrase
    * terms' posting rows — hits-sized, like [[bm25IndexTopK]]. The
    * anchor trick then runs unchanged on the exploded position lists:
    * a (posting, phrase-offset) match votes for anchor `pos − offset`,
    * and an anchor with votes from all phrase offsets is a complete
    * occurrence. */
  def phraseIndexSearch(queries: DataFrame, queryIdCol: String,
      queryTextCol: String, indexDir: String): DataFrame = {
    val spark = queries.sparkSession
    val qtoks = queries.select(col(queryIdCol).as("query_id"),
      toks(col(queryTextCol)).as("__ph"))
      // feeds the driver-side term list AND the broadcast join side
      .localCheckpoint(true)
    val qterms = qtoks.select(col("query_id"),
      posexplode(col("__ph")).as(Seq("__qpos", "__term")))
    val qlen = qtoks.select(col("query_id"),
      size(col("__ph")).as("__m"))
    val terms = qterms.select("__term").distinct()
      .collect().map(_.getString(0)).toSeq
    val nBuckets = spark.read.parquet(s"$indexDir/stats")
      .select("__nbuckets").head().getInt(0)
    // bucket ids via the engine's own hash — evaluated in a plan, not
    // reimplemented driver-side, so build and probe can never drift
    val buckets = qterms.select(
        pmod(xxhash64(col("__term")), lit(nBuckets)).as("__b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val votes = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("__term").isin(terms: _*))
      .join(broadcast(qterms), Seq("__term"))
      .select(col("query_id"), col("doc_id"), col("__qpos"),
        explode(col("__positions")).as("__pos"))
      .select(col("query_id"), col("doc_id"),
        (col("__pos") - col("__qpos")).cast("long").as("__anchor"))
    val anchors = votes.groupBy("query_id", "doc_id", "__anchor")
      .agg(count(lit(1)).as("__votes"))
    anchors.join(broadcast(qlen), Seq("query_id"))
      .filter(col("__votes") === col("__m"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"), min(col("__anchor")).as("first_pos"))
  }
}
