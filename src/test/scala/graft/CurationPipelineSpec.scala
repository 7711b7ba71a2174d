package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Dedup, Packing, Profile, Sampling, TextAnalysis}

/** End-to-end training-data curation on the driver-provided documents
  * (sf0.001): profile → dedup (exact + MinHash/LSH + Jaccard) → duplicate
  * clusters → leakage-safe split → quality gate → stratified mix →
  * sequence packing. Asserts the CROSS-STAGE invariants a pipeline owner
  * relies on, not per-operator outputs (those have their own specs and
  * oracles). */
class CurationPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("documents curated end-to-end with no leakage and intact budgets") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nDocs = docs.count()

    // 1. profile: per-source volumes must add up to the corpus
    val card = Profile.datasetCard(docs, "source", "text", exact = true)
    assert(card.agg(sum("n_docs")).head().getLong(0) === nDocs)

    // 2. near-dup pairs: native signatures → LSH candidates → Jaccard
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 3)
    val sig = Dedup.minhashSignatureFromText(docs, "doc_id", "text",
      numHashes = 8, n = 3)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8,
      bands = 8, maxBucketSize = 5000)
    val dup = Dedup.jaccard(pairs, sh, "doc_id")
      .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
    val nDupPairs = dup.count()
    assert(nDupPairs > 0, "testdata is built with known near-dups")

    // 3. clusters + split: every doc assigned exactly one split, and NO
    // verified duplicate pair may straddle two splits (the guarantee)
    val split = Dedup.leakageSafeSplit(docs, "doc_id",
      Dedup.connectedComponents(dup))
    assert(split.count() === nDocs)
    val straddling = dup
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddling.count() === 0, "duplicate pair straddles splits")

    // 4. quality gate + token counts on the train split only
    val train = docs.join(split.filter(col("split") === "train")
      .select("doc_id"), "doc_id")
    val gated = TextAnalysis.qualityScore(train, "text")
      .filter(col("quality_score") >= 0.2)
    val withTokens = TextAnalysis.tokenCounts(gated, "text")
    assert(withTokens.count() > 0)

    // 5. stratified mix: a 4/16 rate on the dominant source strictly
    // shrinks the corpus, deterministically (same filter twice → same)
    val topSource = withTokens.groupBy("source").count()
      .orderBy(desc("count"), asc("source")).head().getString(0)
    val mixed = Sampling.stratifiedSample(withTokens, col("doc_id"),
      col("source"), rates = Map(topSource -> 4), defaultSixteenths = 16)
    val mixedAgain = Sampling.stratifiedSample(withTokens, col("doc_id"),
      col("source"), rates = Map(topSource -> 4), defaultSixteenths = 16)
    assert(mixed.count() === mixedAgain.count())
    assert(mixed.count() < withTokens.count())

    // 6. packing: every pack respects the budget unless it holds exactly
    // one over-long document
    val packed = Packing.packGreedy(mixed, "doc_id", "ws_tokens",
      capacity = 512, numShards = 8)
    val perPack = packed.groupBy("shard", "pack_idx")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
    val overBudget = perPack.filter(col("tok") > 512 && col("n") > 1)
    assert(overBudget.count() === 0, "multi-doc pack exceeds capacity")
    assert(packed.count() === mixed.count(), "packing dropped documents")

    // 7. embedding side: SemDeDup over trained cells yields plausible
    // pairs feeding the same cluster machinery
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Clustering.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 1)
    val semPairs = Clustering.semanticDupPairs(emb, "vec_id", "embedding",
      cents, threshold = 0.5)
    assert(semPairs.filter(col("id_a") >= col("id_b")).count() === 0)
  }
}
