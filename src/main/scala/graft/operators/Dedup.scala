package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document deduplication operators for large-scale training-data pipelines
  * (beyond-reference scope, SURVEY.md §7.4): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Hashing is built on md5 hex-string prefixes so that signatures are
  * engine-portable (identical in any engine with md5) and need no UDFs —
  * every step is codegen'd built-ins. Each stage is a groupBy/join on
  * bounded keys, so the shuffles scale linearly with corpus size; LSH
  * banding turns the quadratic all-pairs problem into per-bucket joins.
  */
object Dedup {

  /** Lowercased word shingles of size n as one row per (id, shingle).
    * Truncates to `maxChars` so signature cost is bounded per document.
    * Explode + codegen'd slice/concat — measurably faster than building
    * the shingle list with (interpreted) array higher-order functions. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      maxChars: Int = 4096): DataFrame = {
    val tokens = split(lower(substring(col(textCol), 1, maxChars)), "\\s+")
    df.select(col(idCol), tokens.as("toks"))
      .select(col(idCol),
        explode(sequence(lit(1), greatest(size(col("toks")) - (n - 1), lit(1))))
          .as("i"), col("toks"))
      .select(col(idCol),
        concat_ws(" ", slice(col("toks"), col("i"), lit(n))).as("shingle"))
  }

  /** Exact dedup groups: md5 of full text; keep the lowest id per group
    * (hash-groupBy — one shuffle on the 128-bit key). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k hash functions carved as 8-hex-char slices out
    * of ⌈k/4⌉ md5 digests (md5(seed||shingle)), min per doc — the classic
    * permutation-min estimate of Jaccard similarity. Slicing digests
    * instead of hashing once per function cuts the dominant md5 cost 4×
    * at corpus scale. Emits idCol plus h0..h{k-1}. */
  def minhashSignature(sh: DataFrame, idCol: String, numHashes: Int = 8): DataFrame = {
    val withDigests = (0 until (numHashes + 3) / 4).foldLeft(sh) { (d, s) =>
      d.withColumn(s"__d$s", md5(concat_ws("_", lit(s), col("shingle"))))
    }
    val hashes = (0 until numHashes).map { i =>
      min(substring(col(s"__d${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"h$i")
    }
    withDigests.groupBy(col(idCol)).agg(hashes.head, hashes.tail: _*)
  }
  // NOTE: a per-row variant via array higher-order functions (transform +
  // array_min, no explode) benchmarked 5x SLOWER here: HOF lambdas are
  // interpreted (no whole-stage codegen) and re-evaluate the tokenizer
  // per element. The explode + partial-aggregating groupBy IS the fast
  // composable path; minhashSignatureFromText below beats both with a
  // native expression when the caller doesn't otherwise need the
  // exploded shingle rows.

  /** MinHash signatures straight from the text column via the native
    * one-pass [[graft.functions.MinHashSig]] expression — same h0..h{k-1}
    * values as shingles→[[minhashSignature]] (parity proven in
    * `MinHashSigSpec`) with NO shingle explode and NO shuffle: the
    * signature of a 100 TB corpus becomes map-only work. Prefer this
    * whenever the shingle rows aren't separately needed (LSH banding
    * only needs the signatures; Jaccard verification still explodes). */
  def minhashSignatureFromText(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, n: Int = 3, maxChars: Int = 4096): DataFrame = {
    val sig = graft.functions.MinHashSig.minhash_sig(
      lower(substring(col(textCol), 1, maxChars)), numHashes, n)
    df.select(col(idCol), sig.as("__sig"))
      .select(col(idCol) +:
        (0 until numHashes).map(i =>
          element_at(col("__sig"), i + 1).as(s"h$i")): _*)
  }

  /** LSH banding: group `numHashes` minhashes into `bands` concatenated
    * band values; docs sharing any band value become candidate pairs
    * (a < b). The per-band groupBy join bounds the blowup to true
    * near-duplicate buckets.
    *
    * `maxBucketSize` is the degenerate-bucket guard: a band value shared
    * by m docs yields m² join rows, and one pathological value (empty
    * docs, boilerplate) can go quadratic on the whole corpus. Buckets
    * larger than the cap are dropped BEFORE the self-join (count per
    * (band_idx, band_val) + semi-join) — at 100 TB such buckets are
    * near-certain exact-dup clusters better handled by exact dedup, so
    * skipping them loses no useful candidates. The guard is OFF by
    * default (0): dropping buckets is recall-affecting, so scale-sensitive
    * callers opt in explicitly and can audit what a cap would exclude via
    * [[lshOversizedBuckets]] with the same arguments. */
  def lshCandidatePairs(signatures: DataFrame, idCol: String,
      numHashes: Int = 8, bands: Int = 4,
      maxBucketSize: Int = 0): DataFrame = {
    // the banded relation feeds up to three plan branches (bucket-size
    // count, join left, join right); without an exchange boundary each
    // branch would recompute the signature scan from the source — at
    // corpus scale that is 3 full hashing passes instead of 1. The
    // explicit repartition on the band key materializes banding ONCE
    // (ReusedExchange on every consumer) and is exactly the partitioning
    // the self-join and the bucket count need anyway, so it adds no
    // extra shuffle — it just moves the one shuffle ahead of the fan-out.
    val banded = bandedRows(signatures, idCol, numHashes, bands)
      .repartition(col("band_idx"), col("band_val"))
    val capped =
      if (maxBucketSize <= 0) banded
      else {
        val ok = banded.groupBy("band_idx", "band_val")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBucketSize)
          .select("band_idx", "band_val")
        banded.join(ok, Seq("band_idx", "band_val"), "left_semi")
      }
    val left = capped.select(col("band_idx"), col("band_val"), col(idCol).as("id_a"))
    val right = capped.select(col("band_idx"), col("band_val"), col(idCol).as("id_b"))
    left.join(right, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Cross-corpus near-duplicates: MinHash-LSH candidates BETWEEN an
    * incoming batch and a reference corpus, exact-Jaccard-verified — the
    * batch twin of streaming/DocumentStream.startHistoryDedupJob
    * (dedup today's shard against the durable corpus). Unlike
    * [[lshCandidatePairs]] the reference corpus never self-joins: band
    * rows of the (huge) reference side survive only where they collide
    * with a NEW band value, so candidate and verify volume scale with
    * the batch, not the corpus. The two id spaces stay separate columns
    * (`new_id`, `ref_id`) and may overlap.
    * Returns (new_id, ref_id, jaccard) with jaccard >= threshold. */
  def crossCorpusNearDups(newDocs: DataFrame, refDocs: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 8, bands: Int = 8,
      n: Int = 3, threshold: Double = 0.5,
      maxChars: Int = 4096): DataFrame = {
    def banded(docs: DataFrame, as: String) = bandedRows(
      minhashSignatureFromText(docs, idCol, textCol, numHashes, n, maxChars),
      idCol, numHashes, bands)
      .select(col("band_idx"), col("band_val"), col(idCol).as(as))
    // materialized: the candidate list feeds the reference-side semi
    // filter AND the verify joins (the d8 lesson); it is batch-scaled
    val cand = banded(newDocs, "new_id")
      .join(banded(refDocs, "ref_id"), Seq("band_idx", "band_val"))
      .select("new_id", "ref_id").distinct()
      .localCheckpoint(true)
    def sets(docs: DataFrame, id: String, s: String) = docs.select(
      col(idCol).as(id),
      graft.functions.ShingleSet.shingle_set(
        lower(substring(col(textCol), 1, maxChars)), n).as(s))
    // shingle sets are the expensive per-doc step — restrict the
    // reference side to candidate docs BEFORE computing them (semi-join
    // on id, then project), so verify cost scales with the batch even
    // though the reference corpus is the big side
    val refCand = refDocs.join(
      cand.select(col("ref_id").as(idCol)).distinct(),
      Seq(idCol), "left_semi")
    val inter = graft.functions.SortedIntersectCount
      .sorted_intersect_count(col("__sa"), col("__sb"))
    cand
      .join(sets(newDocs, "new_id", "__sa"), Seq("new_id"))
      .join(sets(refCand, "ref_id", "__sb"), Seq("ref_id"))
      .withColumn("__i", inter)
      .withColumn("jaccard", round(col("__i") /
        (size(col("__sa")) + size(col("__sb")) - col("__i")), 6))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "ref_id", "jaccard")
  }

  private def bandedRows(signatures: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band_idx"), concat(hs: _*).as("band_val")).as(s"b$b")
    }
    signatures
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_val"))
  }

  /** The LSH buckets a `maxBucketSize` cap would drop, with their sizes —
    * the observability companion to [[lshCandidatePairs]]: run it with the
    * same (numHashes, bands) to quantify how many documents a cap excludes
    * before enabling it. Returns (band_idx, band_val, n_docs). */
  def lshOversizedBuckets(signatures: DataFrame, idCol: String,
      numHashes: Int = 8, bands: Int = 4,
      maxBucketSize: Int = 5000): DataFrame =
    bandedRows(signatures, idCol, numHashes, bands)
      .groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucketSize)

  /** SimHash fingerprints via the native one-pass
    * [[graft.functions.SimHashSig]] expression — same fingerprints as
    * [[simhash]] (parity in `SimHashSigSpec`) with no exploded
    * (token × bits) rows and no shuffle: map-only at any corpus size. */
  def simhashNative(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxChars: Int = 4096): DataFrame =
    df.select(col(idCol),
      graft.functions.SimHashSig.simhash_sig(
        lower(substring(col(textCol), 1, maxChars)), bits).as("fingerprint"))

  /** SimHash fingerprint over `bits` bits (≤ 31): per token, bit b is the
    * high bit of the b-th md5 nibble; the fingerprint bit is the sign of
    * the per-bit vote sum. One explode × bits, two groupBys — kept as
    * the composable reference form; [[simhashNative]] is the fast path. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxChars: Int = 4096): DataFrame = {
    val tokens = split(lower(substring(col(textCol), 1, maxChars)), "\\s+")
    val toks = df.select(col(idCol), explode(tokens).as("tok"))
    val votes = toks
      .select(col(idCol), col("tok"),
        explode(sequence(lit(1), lit(bits))).as("b"))
      .withColumn("vote",
        when(substring(md5(col("tok")), col("b"), lit(1))
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
      .groupBy(col(idCol), col("b"))
      .agg(sum("vote").as("s"))
    votes.groupBy(col(idCol))
      .agg(sum(when(col("s") > 0,
        pow(lit(2), lit(bits) - col("b")).cast("long")).otherwise(0L))
        .as("fingerprint"))
  }

  /** SimHash near-duplicate pairs: block banding + exact hamming
    * verification (Manku et al., WWW '07 §3 — two fingerprints within
    * hamming distance k must agree EXACTLY on at least one of k+1 bit
    * blocks, by pigeonhole), so a per-block bucket join finds EVERY
    * such pair without an all-pairs scan — the same blocked shape as
    * [[lshCandidatePairs]], exact and complete by construction.
    * Verification is one popcount of the XOR per candidate. Input is
    * [[simhashNative]]'s (id, fingerprint); output (id_a, id_b,
    * hamming ≤ k).
    *
    * Scale note: block selectivity is 2^(bits/(k+1)) buckets per
    * block — at corpus scale use the widest fingerprint available
    * (31 bits under this nibble-vote construction; the paper's 64-bit
    * fingerprints make the same shape web-scale). */
  def simhashNearDupPairs(fingerprints: DataFrame, idCol: String,
      bits: Int = 16, k: Int = 2): DataFrame = {
    require(k >= 0 && k < bits && bits <= 31,
      s"simhashNearDupPairs: need 0 <= k < bits <= 31, got k=$k bits=$bits")
    val blocks = k + 1
    val widths = (0 until blocks).map(b =>
      bits / blocks + (if (b < bits % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val fp = col("fingerprint").cast("long")
    val blockVals = (0 until blocks).map(b =>
      shiftright(fp, offsets(b)).bitwiseAND(lit((1L << widths(b)) - 1)))
    // materialize the COMPACT (id, fingerprint) rows before aliasing
    // as both join sides: the upstream fingerprint computation is a
    // full text pass per document and exchange reuse only *sometimes*
    // dedups the two copies (the semanticDupPairs lesson,
    // Clustering.scala:92-99). The explode itself stays lazy — a
    // checkpoint of the banded N×(k+1) rows measured SLOWER than
    // recomputing the cheap explode from the checkpointed base.
    val compact = fingerprints.select(col(idCol), col("fingerprint"))
      .localCheckpoint(true)
    // banding on the block key (see lshCandidatePairs for why the
    // explicit repartition precedes the self-join fan-out); the
    // fingerprint rides along so verification needs no extra join
    val banded = compact
      .select(col(idCol), col("fingerprint"),
        posexplode(array(blockVals: _*)).as(Seq("block_idx", "block_val")))
      .repartition(col("block_idx"), col("block_val"))
    val left = banded.select(col("block_idx"), col("block_val"),
      col(idCol).as("id_a"), col("fingerprint").as("__fa"))
    val right = banded.select(col("block_idx"), col("block_val"),
      col(idCol).as("id_b"), col("fingerprint").as("__fb"))
    left.join(right, Seq("block_idx", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__fa").bitwiseXOR(col("__fb"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= k)
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs (|A∩B| / |A∪B| over distinct
    * shingles) — the verification stage after LSH blocking. `pairs` has
    * columns id_a, id_b. */
  def jaccard(pairs: DataFrame, sh: DataFrame, idCol: String): DataFrame =
    jaccardOpt(pairs, sh, idCol, cacheDistinct = false)

  /** Broder CONTAINMENT scoring for candidate pairs — the asymmetric
    * twin of [[jaccardFromText]]: `containment_a = |A∩B| / |A|` (how
    * much of A lives inside B) and the mirror `containment_b`. The
    * measure that catches doc-in-doc duplication (a quote-heavy page
    * containing a whole article, a boilerplate-wrapped copy) which
    * symmetric Jaccard under-scores when the two docs differ in size.
    * Same plan shape as jaccard: per-doc sorted shingle SETS map-side
    * (ShingleSet), pairs joined to both sides, one native sorted-merge
    * intersect per pair — the exploded (doc, shingle) relation never
    * exists. Emits jaccard alongside, from the same intersect. */
  def containmentFromText(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, maxChars: Int = 4096): DataFrame = {
    val sets = docs.select(col(idCol),
      graft.functions.ShingleSet.shingle_set(
        lower(substring(col(textCol), 1, maxChars)), n).as("__ss"))
    val inter = graft.functions.SortedIntersectCount
      .sorted_intersect_count(col("__sa"), col("__sb"))
    pairs
      .join(sets.select(col(idCol).as("id_a"), col("__ss").as("__sa")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("__ss").as("__sb")), Seq("id_b"))
      .withColumn("__i", inter)
      .select(col("id_a"), col("id_b"),
        round(col("__i") / size(col("__sa")), 6).as("containment_a"),
        round(col("__i") / size(col("__sb")), 6).as("containment_b"),
        round(col("__i") /
          (size(col("__sa")) + size(col("__sb")) - col("__i")), 6).as("jaccard"))
  }

  /** Jaccard verification straight from the text column: each document's
    * distinct shingle SET is built in one native pass
    * ([[graft.functions.ShingleSet]], sorted array, map-only — the
    * exploded (doc, shingle) relation never exists), pairs join the
    * one-row-per-doc set table twice, and |A∩B| is a single sorted-merge
    * ([[graft.functions.SortedIntersectCount]]) per pair. Same jaccard
    * values as [[jaccard]] over [[shingles]] (parity in
    * `ShingleSetSpec`); the plan drops the explode, the distinct
    * shuffle, the per-doc size aggregation, and the exploded
    * intersection groupBy. */
  def jaccardFromText(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, maxChars: Int = 4096): DataFrame = {
    val sets = docs.select(col(idCol),
      graft.functions.ShingleSet.shingle_set(
        lower(substring(col(textCol), 1, maxChars)), n).as("__ss"))
    val inter = graft.functions.SortedIntersectCount
      .sorted_intersect_count(col("__sa"), col("__sb"))
    pairs
      .join(sets.select(col(idCol).as("id_a"), col("__ss").as("__sa")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("__ss").as("__sb")), Seq("id_b"))
      .withColumn("__i", inter)
      .select(col("id_a"), col("id_b"),
        round(col("__i") /
          (size(col("__sa")) + size(col("__sb")) - col("__i")), 6).as("jaccard"))
  }

  /** The distinct shingle set feeds THREE branches of this plan (sizes,
    * join side A, join side B). No cache by default: the branches share an
    * identical shuffle subtree, so Spark's ReusedExchange computes it once
    * — measured at sf0.1, every explicit cache() variant (raw shingles,
    * signatures, distinct set) was neutral-to-2× SLOWER than exchange
    * reuse because materialization breaks whole-stage codegen pipelines.
    * The knob remains for memory-pressure situations where a
    * persist(DISK_ONLY) beats recomputation. */
  def jaccardOpt(pairs: DataFrame, sh: DataFrame, idCol: String,
      cacheDistinct: Boolean, pruneToPairDocs: Boolean = false): DataFrame = {
    // pruneToPairDocs: verification only ever needs shingles of documents
    // that appear in a candidate pair, so the corpus-sized shingle
    // relation CAN be semi-joined down first — the right call at corpus
    // scale where LSH survivors are a sliver of the data. It is OFF by
    // default because it costs one extra full-shingle shuffle and an
    // eager materialization of the pair relation; measured at sf0.1
    // (dup-heavy synthetic corpus where most docs ARE in a pair) it runs
    // ~20% slower than plain exchange reuse. Flip it when
    // |pair docs| ≪ |corpus|.
    val p = if (pruneToPairDocs) pairs.localCheckpoint(true) else pairs
    val base =
      if (pruneToPairDocs) {
        val pairDocs = p.select(col("id_a").as(idCol))
          .union(p.select(col("id_b").as(idCol)))
          .distinct()
        sh.join(pairDocs, Seq(idCol), "left_semi")
      } else sh
    val d0 = base.distinct()
    val distinctSh = if (cacheDistinct) d0.cache() else d0
    val sizes = distinctSh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val shA = distinctSh.select(col(idCol).as("id_a"), col("shingle"))
    val shB = distinctSh.select(col(idCol).as("id_b"), col("shingle"))
    val inter = p.join(shA, Seq("id_a")).join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    p
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("i"))
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("i") / (col("sz_a") + col("sz_b") - col("i")), 6).as("jaccard"))
  }

  /** Duplicate-cluster resolution: connected components over verified
    * duplicate pairs (id_a, id_b) by iterative min-label propagation —
    * the standard "keep one document per duplicate cluster" step after
    * LSH + verification. Each iteration is one join + one partial
    * aggregation; labels converge in O(cluster diameter) rounds (near-dup
    * clusters are shallow — a handful of rounds in practice).
    * `localCheckpoint` truncates the growing lineage each round so plans
    * stay flat at scale. Each round combines one hop of neighbor-min
    * propagation with one pointer-jumping step (cluster := min(cluster,
    * cluster-of-cluster)), so labels cover 2^i hops after i rounds —
    * a chain of length L converges in O(log L) rounds, not O(L).
    *
    * Throws IllegalStateException if labels are still moving after
    * `maxIter` rounds: silently returning unconverged labels would split
    * clusters and break leakageSafeSplit's no-leakage guarantee.
    * Returns (id, cluster) where cluster = the smallest member id of the
    * component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialized ONCE: every round's propagation join (and the label
    // seed) reads edges — without this each of the O(log L) rounds
    // re-executes the caller's whole pair-producing plan (minhash → LSH
    // → jaccard in the d6/d17 chains), twice per round via the union.
    // Edge lists are candidate-pair-sized, far below corpus scale.
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .localCheckpoint(true)
    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("id_b"), col("cluster").as("nc")), Seq("id_b"))
        .groupBy(col("id_a").as("id")).agg(min("nc").as("nc"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("__old"),
          least(col("cluster"), coalesce(col("nc"), col("cluster"))).as("cluster"))
      // pointer jumping: follow the label one more level (labels are
      // always node ids, so the self-join below always finds a row).
      // The round's change flag rides INSIDE the checkpointed rows, so
      // the convergence probe below scans the (already materialized)
      // blocks instead of re-joining this round's labels against the
      // previous round's.
      val updated = propagated
        .join(propagated.select(col("id").as("cluster"),
          col("cluster").as("cc")), Seq("cluster"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("cc"), col("cluster"))).as("cluster"),
          (least(col("cluster"), coalesce(col("cc"), col("cluster")))
            =!= col("__old")).as("__changed"))
        .localCheckpoint(true)
      converged = updated.filter(col("__changed")).isEmpty
      labels = updated.select("id", "cluster")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter rounds; " +
          "a duplicate chain is deeper than 2^maxIter hops or the input " +
          "is pathological — raise maxIter rather than consuming split clusters")
    labels
  }

  /** Leakage-safe dataset splitting: assign train/val/test by a
    * content-addressed hash of the DUPLICATE CLUSTER, not the document —
    * near-duplicates always land in the same split, so a test document
    * can never have a paraphrase of itself in train (the classic dedup
    * leakage failure). Docs outside any dup cluster form singleton
    * clusters of themselves. Hex-bucketed md5 keeps the assignment
    * deterministic and engine-portable: first hex char 0-b → train
    * (12/16), c-d → val (2/16), e-f → test (2/16). */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      components: DataFrame): DataFrame = {
    val withCluster = docs.select(col(idCol))
      .join(components.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
    val h = substring(md5(col("cluster").cast("string")), 1, 1)
    withCluster.withColumn("split",
      when(h.isin("c", "d"), "val")
        .when(h.isin("e", "f"), "test")
        .otherwise("train"))
  }

  /** Quality-aware cluster collapse: pick each duplicate cluster's
    * REPRESENTATIVE by a score (quality, length, recency) instead of
    * keeping an arbitrary member — what production curation actually
    * does (RefinedWeb keeps the best copy of a near-dup group, not the
    * lowest-id one). Docs outside any cluster are their own singleton
    * representative, so the output is a total keep/drop decision over
    * the corpus.
    *
    * `scores` = (idCol, scoreCol); `components` = connectedComponents
    * output (id, cluster). Representative = max score, ties to the
    * smaller id; docs MISSING from `scores` stay in the output (the
    * decision is total) with a null score that ranks LAST — an unscored
    * doc can only represent a cluster nobody in it was scored. Scale
    * shape: one left join to attach clusters (docs ⋈ cluster labels,
    * both id-keyed), then ONE window partitioned by cluster
    * (parallelism = #clusters, each partition one duplicate group):
    * `first(id)` over a running frame in (score desc, id) order IS the
    * representative for every member, so there is no rank-1 filter and
    * no join-back — the scores scan and the cluster join each run
    * exactly once, and nothing is ever corpus × corpus.
    *
    * Returns (idCol, cluster, scoreCol, rep_id, keep). */
  def clusterRepresentatives(docs: DataFrame, idCol: String,
      scores: DataFrame, scoreCol: String,
      components: DataFrame): DataFrame = {
    val withCluster = docs.select(col(idCol))
      .join(components.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .join(scores.select(col(idCol), col(scoreCol)), Seq(idCol), "left")
    // running frame: row n sees rows 1..n, so first(id) = the top-ranked
    // member (max score, ties to smaller id) on EVERY row of the cluster
    val w = Window.partitionBy("cluster")
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withCluster
      .withColumn("rep_id", first(col(idCol)).over(w))
      .select(col(idCol), col("cluster"), col(scoreCol), col("rep_id"),
        (col(idCol) === col("rep_id")).as("keep"))
  }

  /** Duplicate-passage detection (substring-level dedup): find the token
    * spans of each document that also occur elsewhere in the corpus —
    * the Spark analog of suffix-array substring dedup ("Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2021),
    * approximated at k-gram granularity: a span is duplicated iff every
    * k-token window inside it occurs more than once in the corpus.
    *
    * Plan shape (all linear in corpus token count):
    *  1. positioned k-grams: one row per (doc, pos), md5-keyed so the
    *     shuffle carries 16-byte digests, not text;
    *  2. k-grams seen >1 time anywhere in the corpus (one groupBy —
    *     within-doc repeats count, as in the suffix-array formulation);
    *  3. semi-join marks duplicated positions;
    *  4. gaps-and-islands window per doc merges overlapping windows
    *     ([p, p+k) and [q, q+k) merge when q ≤ p+k) into maximal spans.
    * The per-doc window sort is bounded by document length, never corpus
    * size. Returns (doc_id, span_start, span_end, n_windows) with
    * token-index spans [span_start, span_end). */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, maxChars: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(lower(substring(col(textCol), 1, maxChars)), "\\s+")
    // one row per k-gram START (docs shorter than k contribute their
    // whole text as one window, mirroring shingles()' max(n-k+1, 1))
    val grams = df
      .select(col(idCol), toks.as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0),
          greatest(size(col("toks")) - k, lit(0)))).as("pos"))
      .select(col(idCol), col("pos"),
        md5(concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(k))))
          .as("gram"))
    val dupGrams = grams.groupBy("gram")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select("gram")
    val dupPos = grams.join(dupGrams, Seq("gram"), "left_semi")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = dupPos
      .withColumn("__new",
        when(col("pos") > lag(col("pos"), 1).over(w) + k, 1)
          .when(lag(col("pos"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col(idCol), col("__island"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__island")
  }

  /** REMOVE the corpus-duplicated passages [[duplicateSpans]] finds —
    * the second half of exact-substring dedup ("Deduplicating Training
    * Data Makes Language Models Better", Lee et al. 2021: repeated
    * 50-token substrings are cut from the training set). Every doc is
    * rewritten on the SAME normalized token stream the spans index
    * (lowered, maxChars-truncated, whitespace-split), keeping tokens
    * outside every span; this is the aggressive variant — a span whose
    * windows all recur elsewhere is dropped from every copy (the
    * passage is boilerplate/contamination, not content). Returns
    * (idCol, clean_text, n_removed).
    *
    * Plan shape: [[duplicateSpans]]' linear chain, plus one per-doc
    * span aggregation and a broadcast-shaped left join back to the
    * corpus; the rewrite itself is a map-only filter-with-index over
    * the token array (spans per doc are few, so the per-token exists()
    * scan is constant-bounded). */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, maxChars: Int = 4096): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, k, maxChars)
      .groupBy(col(idCol))
      .agg(collect_list(
        struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = split(lower(substring(col(textCol), 1, maxChars)), "\\s+")
    val noSpans = array().cast(
      "array<struct<span_start:bigint,span_end:bigint>>")
    val kept = filter(col("__toks"), (t, i) =>
      !exists(col("__spans"), s =>
        i >= s.getField("span_start") && i < s.getField("span_end")))
    docs.select(col(idCol), toks.as("__toks"))
      .join(spans, Seq(idCol), "left")
      .withColumn("__spans", coalesce(col("__spans"), noSpans))
      .withColumn("__kept", kept)
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed"))
  }

  /** Corpus-level boilerplate removal (CCNet/RefinedWeb-style): drop
    * every line whose total occurrence count across the corpus exceeds
    * `maxOccurrences` — navigation chrome, cookie banners, repeated
    * footers. Lines shorter than `minChars` never count as boilerplate
    * (too little signal; kept verbatim).
    *
    * Scale shape: one shuffle at line-HASH cardinality with map-side
    * partials for the counts; the `> maxOccurrences` survivors are a
    * tiny relation (distinct boilerplate strings, not occurrences), so
    * AQE broadcasts the mark join; the rebuild groupBy shuffles on
    * doc id with per-doc sorts bounded by document length. Nothing is
    * ever corpus-quadratic.
    *
    * Returns (idCol, n_lines, n_boiler, clean_text) — the cleaned text
    * re-joins surviving lines in order, since boilerplate removal
    * REWRITES pages rather than dropping them. */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Int = 2, minChars: Int = 10): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .toDF(idCol, "pos", "line")
      .withColumn("__h", md5(col("line")))
    val boiler = lines
      .filter(length(col("line")) >= minChars)
      .groupBy("__h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxOccurrences)
      .select(col("__h"), lit(true).as("__boiler"))
    val marked = lines.join(boiler, Seq("__h"), "left")
      .withColumn("__boiler", coalesce(col("__boiler"), lit(false)))
    marked.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_lines"),
      count(when(col("__boiler"), 1)).as("n_boiler"),
      array_join(transform(
        array_sort(collect_list(when(!col("__boiler"),
          struct(col("pos"), col("line"))))),
        s => s.getField("line")), "\n").as("clean_text"))
  }

  /** Embedding near-dup: cosine similarity over pairs blocked by a
    * `blockCol` (label, LSH bucket, …); quadratic only within blocks.
    * Norms are factored out per vector before the self-join so each
    * within-block pair pays one interpreted array pass, not three
    * (bit-identical per [[Similarity.l2norm]]). */
  def cosinePairs(embeddings: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val withNorm = embeddings.select(col(blockCol), col(idCol), col(vecCol),
      Similarity.l2norm(col(vecCol)).as("__n"))
    val a = withNorm.select(col(blockCol), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"), col("__n").as("na"))
    val b = withNorm.select(col(blockCol), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"), col("__n").as("nb"))
    a.join(b, Seq(blockCol)).filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        Similarity.dot(col("vec_a"), col("vec_b")) / (col("na") * col("nb")))
      .filter(round(col("cos"), 4) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
