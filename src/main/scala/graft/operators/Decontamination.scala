package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64, Literal => CatLit}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

import graft.functions.{ShingleSet, SortedIntersectCount}

/** Benchmark decontamination for training corpora (beyond-reference
  * scope, SURVEY.md §7.4): flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard guard against
  * test-set leakage into training data (GPT-3 appendix C style: drop a
  * training document when any 13-gram collides with an eval document;
  * the n is a parameter here — the synthetic docs are short, so tests
  * and oracles exercise n=3 while the mechanism is n-agnostic).
  *
  * Scale shape — two paths behind the same column contract
  * (`id, n_ngrams, n_shared, overlap`):
  *
  *  - **Array path** ([[evalNgramSet]] + [[contamination]]) for a small
  *    eval vocabulary: the whole vocabulary is collapsed to ONE row (a
  *    sorted distinct array) and broadcast; each corpus document then
  *    computes its overlap in a single native merge pass
  *    ([[graft.functions.ShingleSet]] →
  *    [[graft.functions.SortedIntersectCount]]) with NO shuffle of
  *    corpus rows and no exploded (doc, ngram) relation. Bounded by the
  *    single-row array limit — fine up to roughly a million n-grams.
  *  - **Join path** ([[evalNgramTable]] + [[contaminationJoined]]) for
  *    eval vocabularies past that bound (GPT-3-style 13-grams over a
  *    full eval suite → tens of millions of strings): the vocabulary is
  *    an ordinary multi-row table, the corpus side explodes its per-doc
  *    shingle set, and a semi-join + per-doc count computes the overlap.
  *    AQE broadcasts the vocabulary while it fits and falls back to a
  *    shuffle join keyed on the n-gram beyond that — no single-row or
  *    driver-side limit anywhere.
  *
  * Documents with no extractable n-grams (null or too-short text) are
  * excluded from both reports — same contract as the eval side, which
  * cannot match on them either.
  */
object Decontamination {

  /** The distinct n-gram vocabulary of the eval set as ONE row holding a
    * sorted array — the broadcast side of [[contamination]]. Sorted under
    * the same UTF8String binary order [[ShingleSet]] emits, so the
    * per-doc intersect stays a single merge pass. */
  def evalNgramSet(evalDocs: DataFrame, textCol: String, n: Int = 3,
      maxChars: Int = 4096): DataFrame =
    evalDocs
      .select(ShingleSet.shingle_set(
        lower(substring(coalesce(col(textCol), lit("")), 1, maxChars)), n)
        .as("__ss"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__ss")))))
        .as("eval_ngrams"))

  /** The distinct n-gram vocabulary of the eval set as a NORMAL
    * multi-row table (`eval_ngram` string column) — the join side of
    * [[contaminationJoined]], for eval suites whose vocabulary exceeds
    * what one array row / one broadcast value can hold. */
  def evalNgramTable(evalDocs: DataFrame, textCol: String, n: Int = 3,
      maxChars: Int = 4096): DataFrame =
    evalDocs
      .select(explode(ShingleSet.shingle_set(
        lower(substring(coalesce(col(textCol), lit("")), 1, maxChars)), n))
        .as("eval_ngram"))
      .distinct()

  /** Corpus side shared by both paths: per-doc distinct shingle set,
    * restricted to documents that HAVE shingles (null text and texts
    * shorter than n words produce none and are dropped — they cannot be
    * contaminated). */
  private def docShingles(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, maxChars: Int): DataFrame =
    corpus
      .select(col(idCol), ShingleSet.shingle_set(
        lower(substring(coalesce(col(textCol), lit("")), 1, maxChars)), n)
        .as("__ss"))
      .filter(size(col("__ss")) > 0)

  /** Per-document contamination report: distinct n-gram count, how many
    * of them appear in the eval vocabulary, and the overlap ratio.
    * `evalSet` is the one-row frame from [[evalNgramSet]]; it is
    * broadcast so the cross join is a map-side 1-row nested loop, never
    * a shuffle. Filter `n_shared > 0` (any-collision, the GPT-3 rule) or
    * on `overlap` for a softer threshold. */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, n: Int = 3, maxChars: Int = 4096): DataFrame =
    docShingles(corpus, idCol, textCol, n, maxChars)
      .crossJoin(broadcast(evalSet))
      .select(
        col(idCol),
        size(col("__ss")).cast("long").as("n_ngrams"),
        SortedIntersectCount.sorted_intersect_count(
          col("__ss"), col("eval_ngrams")).as("n_shared"))
      .withColumn("overlap",
        round(col("n_shared") / col("n_ngrams"), 6))

  /** [[contamination]] for eval vocabularies too large for one array
    * row: same output columns, computed by exploding the per-doc shingle
    * set and semi-joining the multi-row vocabulary from
    * [[evalNgramTable]]. One explode (map-side), one join on the n-gram
    * (broadcast while the vocabulary fits, AQE shuffle join beyond), one
    * per-doc count shuffle — nothing is corpus- or vocabulary-sized on
    * the driver. */
  def contaminationJoined(corpus: DataFrame, idCol: String, textCol: String,
      evalTable: DataFrame, n: Int = 3, maxChars: Int = 4096): DataFrame = {
    // ONE corpus pass: carry the per-doc n-gram count through the
    // explode (a long per row, free next to the n-gram itself), LEFT
    // join the vocabulary, and count hits in the same per-doc
    // aggregation — a second shingle scan + join-back for zero-hit
    // docs would double the dominant cost at corpus scale
    val marked = evalTable.select(col("eval_ngram"), lit(1L).as("__hit"))
    docShingles(corpus, idCol, textCol, n, maxChars)
      .select(col(idCol), size(col("__ss")).cast("long").as("n_ngrams"),
        explode(col("__ss")).as("eval_ngram"))
      .join(marked, Seq("eval_ngram"), "left")
      .groupBy(col(idCol))
      .agg(first(col("n_ngrams")).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_shared"))
      .withColumn("overlap",
        round(col("n_shared") / col("n_ngrams"), 6))
  }

  /** Serialized Bloom filter over the eval n-gram vocabulary, built with
    * Spark's native distributed [[BloomFilterAggregate]] (map-side
    * partial sketches OR-merged, one binary row back to the driver — the
    * same machinery Spark's runtime row-level join filters use, so the
    * build never funnels vocabulary rows anywhere). Sized like
    * `BloomFilter.optimalNumOfBits`: at the 1%-fpp default this is
    * ~1.2 bytes per expected item, i.e. ~12 MB for a 10M-n-gram eval
    * suite — broadcast-literal scale, not corpus scale. */
  def evalNgramBloom(evalTable: DataFrame, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1): $fpp")
    // BloomFilter.optimalNumOfBits(n, p) = -n ln p / (ln 2)^2
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(col("eval_ngram")))),
      CatLit(expectedItems), CatLit(numBits)).toAggregateExpression()
    evalTable.agg(GraftColumnBridge.column(agg).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(c))` as a codegen'd Column — the
    * probe side of the sketch [[evalNgramBloom]] builds (same XxHash64
    * keying on both sides). The bloom bytes ride the plan as a foldable
    * literal, exactly how Spark's own injected runtime filters ship
    * their sketch to the probe side. */
  private def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      CatLit(bloom), new XxHash64(Seq(GraftColumnBridge.expression(c)))))

  /** Contamination report of the CONTAMINATED documents only
    * (`n_shared >= minShared`), computed with a Bloom prefilter — the
    * 100 TB-corpus shape of [[contaminationJoined]]. That path shuffles
    * every exploded corpus n-gram through the vocabulary join once the
    * eval side outgrows a broadcast; here the bloom probe (a codegen'd
    * literal lookup) kills definite non-matches MAP-SIDE, so only the
    * tiny bloom-positive fraction (true hits + ~fpp of the rest) ever
    * reaches the exact-verify semi-join and the per-doc count shuffle.
    * The verify join makes the output EXACT — bloom false positives are
    * filtered there, so `fpp` trades shuffle volume, never correctness.
    * Zero-hit documents are absent by contract (that is what pays for
    * the single corpus scan: their `n_ngrams` never needs a join-back);
    * [[decontaminateBloom]] anti-joins the flagged ids, where only
    * contaminated docs are needed anyway. */
  def contaminationBloom(corpus: DataFrame, idCol: String, textCol: String,
      evalTable: DataFrame, n: Int = 3, minShared: Long = 1,
      maxChars: Int = 4096, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    // the vocabulary feeds TWO consumers — the bloom-build aggregate
    // (its own job) and the exact-verify semi-join — so materialize it
    // once (the semanticDupPairs lesson: aliasing one uncached plan
    // into two jobs re-runs the upstream shingle pass per consumer)
    val vocab = evalTable.select(col("eval_ngram")).localCheckpoint(true)
    val bloom = evalNgramBloom(vocab, expectedItems, fpp)
    docShingles(corpus, idCol, textCol, n, maxChars)
      .select(col(idCol), size(col("__ss")).cast("long").as("n_ngrams"),
        explode(col("__ss")).as("eval_ngram"))
      .filter(mightContain(bloom, col("eval_ngram")))
      .join(vocab, Seq("eval_ngram"), "left_semi")
      .groupBy(col(idCol))
      .agg(first(col("n_ngrams")).as("n_ngrams"),
        count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumn("overlap",
        round(col("n_shared") / col("n_ngrams"), 6))
  }

  /** [[decontaminate]] at joined-vocabulary scale: drop every document
    * the bloom-prefiltered exact verify flags. Same output as running
    * [[contaminationJoined]] + filter + anti-join, with map-side bloom
    * pruning instead of a full corpus-n-gram shuffle. */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
      evalTable: DataFrame, n: Int = 3, minShared: Long = 1,
      maxChars: Int = 4096, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val flagged = contaminationBloom(corpus, idCol, textCol, evalTable,
      n, minShared, maxChars, expectedItems, fpp).select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** The decontaminated corpus: drop every document sharing at least
    * `minShared` n-grams with the eval set. Same map-only scan shape as
    * [[contamination]]; the filter pushes into the scan projection. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, n: Int = 3, minShared: Long = 1,
      maxChars: Int = 4096): DataFrame = {
    val flagged = contamination(corpus, idCol, textCol, evalSet, n, maxChars)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
