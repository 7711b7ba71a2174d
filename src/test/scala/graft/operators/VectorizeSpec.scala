package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hashed TF-IDF vectorizer: slot hashing, weighting math, dense/sparse
  * parity, and the kNN face's ranking contract. */
class VectorizeSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date")
  ).toDF("doc_id", "text")

  test("sparse weights match hand-computed tf·idf at slot granularity") {
    // dim large enough that these 4 terms don't collide (verified below)
    val sparse = Vectorize.tfidfSparse(docs, "doc_id", "text", dim = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val slots = sparse.map(_._2).distinct
    assert(slots.length == 4, "fixture terms must not collide")
    // df: apple 2, banana 2, cherry 2, date 1; N = 3
    // doc 1: apple tf=2 → 2·ln(1+3/2); banana tf=1 → ln(2.5)
    val w = math.log(2.5)
    val byDoc = sparse.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(byDoc(1L) == Seq(
      BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(2 * w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // doc 3: date df=1 → ln(1+3) = ln 4; cherry tf=2
    val w4 = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDoc(3L).contains(w4))
  }

  test("dense vectors explode back to exactly the sparse rows") {
    val dim = 64
    val sparse = Vectorize.tfidfSparse(docs, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dense = Vectorize.tfidfVectors(docs, "doc_id", "text", dim)
    val rows = dense.collect()
    assert(rows.forall(_.getSeq[Double](1).length == dim))
    val exploded = dense
      .select(col("doc_id"), posexplode(col("vec")).as(Seq("slot", "weight")))
      .filter(col("weight") =!= 0.0)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
      .toSet
    assert(exploded == sparse)
  }

  test("colliding terms pool their counts before weighting") {
    // dim=1: every term hashes to slot 0 → one weight per doc,
    // tf = doc length, df = N → idf = ln(2)
    val sparse = Vectorize.tfidfSparse(docs, "doc_id", "text", dim = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sparse(1L) == r6(3 * math.log(2)))
    assert(sparse(2L) == r6(2 * math.log(2)))
    assert(sparse(3L) == r6(4 * math.log(2)))
  }

  test("tfidfKnn ranks the identical doc first with cosine 1") {
    val queries = Seq((1L, "apple banana apple")).toDF("query_id", "qtext")
    val out = Vectorize.tfidfKnn(docs, "doc_id", "text",
        queries, "query_id", "qtext", dim = 4096, k = 3)
      .orderBy("rk").collect()
    assert(out.head.getLong(1) == 1L) // doc 1 is the query text
    assert(out.head.getDouble(2) == 1.0)
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    // cosines non-increasing in rank
    val cs = out.map(_.getDouble(2)).toSeq
    assert(cs == cs.sorted.reverse)
  }

  test("query slots absent from the corpus are dropped") {
    val queries = Seq((9L, "zzz_unseen apple")).toDF("query_id", "qtext")
    val out = Vectorize.tfidfKnn(docs, "doc_id", "text",
        queries, "query_id", "qtext", dim = 4096, k = 3)
      .collect()
    // apple appears in docs 1 and 3 → exactly those are candidates, and
    // since the unseen term is dropped from the query norm the top hit's
    // cosine equals apple's share of each doc's norm (positive, < 1)
    assert(out.map(_.getLong(1)).toSet == Set(1L, 3L))
    assert(out.forall(r => r.getDouble(2) > 0 && r.getDouble(2) < 1))
  }

  test("all three stats-storage modes produce bit-identical tfidfKnn") {
    // the single-node memory knob (spark.graft.tfidf.statsStorage)
    // changes only WHERE the corpus-stat relations stage, never a value
    val queries = Seq((10L, "apple cherry")).toDF("query_id", "qtext")
    def run(): Seq[(Long, Long, Double, Long)] =
      Vectorize.tfidfKnn(docs, "doc_id", "text",
          queries, "query_id", "qtext", dim = 64, k = 3)
        .orderBy("query_id", "rk")
        .as[(Long, Long, Double, Long)].collect().toSeq
    val auto = run() // default (unset) = auto
    try {
      for (mode <- Seq("memory", "disk", "auto")) {
        spark.conf.set(Vectorize.StatsStorageKey, mode)
        assert(run() === auto, s"mode $mode diverged")
      }
      // auto forced across its threshold still matches bit-for-bit
      spark.conf.set(Vectorize.StatsStorageKey, "auto")
      spark.conf.set(Vectorize.AutoDiskBytesKey, "1")
      assert(run() === auto, "auto-as-disk diverged")
    } finally {
      spark.conf.unset(Vectorize.StatsStorageKey)
      spark.conf.unset(Vectorize.AutoDiskBytesKey)
    }
  }

  test("auto stats storage resolves from corpus size vs the threshold") {
    try {
      // a 3-row corpus is far under any real heap-derived default —
      // parquet-backed or checkpointed alike (a checkpointed relation
      // reports its real materialized size on Spark 4)
      assert(Vectorize.resolveStatsMode(docs) == "memory")
      assert(Vectorize.resolveStatsMode(docs.localCheckpoint(true))
        == "memory")
      // an UNKNOWN estimate (defaultSizeInBytes sentinel) must resolve
      // memory, never let the sentinel force the disk path
      val noStats = spark.sessionState.conf.defaultSizeInBytes
      assert(BigInt(noStats) >
        docs.queryExecution.optimizedPlan.stats.sizeInBytes)
      // force the crossover: 1-byte threshold → every KNOWN size is "big"
      spark.conf.set(Vectorize.AutoDiskBytesKey, "1")
      assert(Vectorize.resolveStatsMode(docs) == "disk")
      // explicit modes bypass the estimate entirely
      spark.conf.set(Vectorize.StatsStorageKey, "memory")
      assert(Vectorize.resolveStatsMode(docs) == "memory")
      spark.conf.set(Vectorize.StatsStorageKey, "disk")
      spark.conf.unset(Vectorize.AutoDiskBytesKey)
      assert(Vectorize.resolveStatsMode(docs) == "disk")
    } finally {
      spark.conf.unset(Vectorize.StatsStorageKey)
      spark.conf.unset(Vectorize.AutoDiskBytesKey)
    }
  }

  test("termSlot stays in [0, dim) and is stable") {
    val terms = Seq("a", "b", "longer_term", "ünïcode").toDF("t")
    val slots = terms.select(Vectorize.termSlot(col("t"), 7).as("s"))
      .collect().map(_.getLong(0))
    assert(slots.forall(s => s >= 0 && s < 7))
    val again = terms.select(Vectorize.termSlot(col("t"), 7).as("s"))
      .collect().map(_.getLong(0))
    assert(slots.toSeq == again.toSeq)
  }
}
