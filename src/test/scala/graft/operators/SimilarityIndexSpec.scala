package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Persisted IVF index: exactness at full probe, parity with the
  * in-memory trained path at nProbe=1, and the partition pruning that
  * makes the probe scan nProbe/k of the corpus on disk. */
class SimilarityIndexSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vecs = Seq.tabulate(40) { i =>
    (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
  }
  private def corpus: DataFrame = vecs.toDF("id", "vec")
  private def queries: DataFrame = corpus.filter(col("id") < 5)

  private def buildIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.buildIvfIndex(corpus, "id", "vec", dir, k = 4, iters = 2)
    dir
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("query_id", "rank", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("full probe (nProbe >= trained k) is EXACTLY brute force") {
    val dir = buildIndex()
    val idx = rows(Similarity.ivfIndexKnn(queries, dir, "id", "vec",
      k = 5, nProbe = 10))
    val brute = rows(Similarity.bruteForceKnn(queries, corpus, "id", "vec",
      k = 5))
    assert(idx === brute)
  }

  test("nProbe=1 matches ivfKnnTrained on the same persisted centroids") {
    val dir = buildIndex()
    val cents = spark.read.parquet(s"$dir/centroids")
    val idx = rows(Similarity.ivfIndexKnn(queries, dir, "id", "vec",
      k = 3, nProbe = 1))
    val mem = rows(Similarity.ivfKnnTrained(queries, corpus, "id", "vec",
      k = 3, centroids = cents))
    assert(idx === mem)
  }

  test("append without retrain == one index encoded with the same quantizer") {
    // build on the first half, append the second half: the probe must
    // equal an index whose postings are ALL vectors assigned against the
    // half-trained centroids (the FAISS add() contract — quantizer
    // frozen, postings grow)
    val half1 = corpus.filter(col("id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("ivfapp").toString
    Similarity.buildIvfIndex(half1, "id", "vec", dir, k = 4, iters = 2)
    Similarity.appendToIvfIndex(corpus.filter(col("id") >= 20), "id", "vec", dir)
    val cents = spark.read.parquet(s"$dir/centroids")
    val appended = rows(Similarity.ivfIndexKnn(queries, dir, "id", "vec",
      k = 3, nProbe = 4))
    // reference: the in-memory trained path over the FULL corpus with the
    // SAME half-trained centroids, full probe == exact within-all-cells
    val mem = rows(Similarity.ivfKnnTrained(queries, corpus, "id", "vec",
      k = 3, centroids = cents))
    // ivfKnnTrained probes 1 cell; compare at nProbe=1 instead
    val appended1 = rows(Similarity.ivfIndexKnn(queries, dir, "id", "vec",
      k = 3, nProbe = 1))
    assert(appended1 === mem)
    // and the appended index at full probe is exactly brute force
    val brute = rows(Similarity.bruteForceKnn(queries, corpus, "id", "vec", k = 3))
    assert(appended === brute)
  }

  test("appended postings land INSIDE the existing cell partitions") {
    val half1 = corpus.filter(col("id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("ivfapp2").toString
    Similarity.buildIvfIndex(half1, "id", "vec", dir, k = 4, iters = 2)
    val cellsBefore = spark.read.parquet(s"$dir/postings")
      .select("cell_id").distinct().as[Int].collect().toSet
    Similarity.appendToIvfIndex(corpus.filter(col("id") >= 20), "id", "vec", dir)
    val after = spark.read.parquet(s"$dir/postings")
    assert(after.count() === 40)
    // the quantizer is frozen, so appended vectors can only land in
    // trained cells — the partition layout stays the trained cell set
    val cellsAfter = after.select("cell_id").distinct().as[Int].collect().toSet
    assert(cellsAfter.subsetOf(cellsBefore))
  }

  test("append rejects vectors of the wrong dimension loudly") {
    val dir = buildIndex()
    val wrong = Seq((100L, Array.fill(5)(0.5f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(wrong, "id", "vec", dir)
    }
    assert(e.getMessage.contains("dim"))
    // empty append is a no-op, not an error
    Similarity.appendToIvfIndex(
      Seq.empty[(Long, Array[Float])].toDF("id", "vec"), "id", "vec", dir)
    assert(spark.read.parquet(s"$dir/postings").count() === 40)
  }

  test("probing reads ONLY the probed cells' partitions from disk") {
    val dir = buildIndex()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // AQE hides materialized stages behind QueryStageExec leaves —
    // descend through them to reach every file scan
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case r: ReusedExchangeExec => allScans(r.child)
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }
      here ++ p.children.flatMap(allScans)
    }
    def filesRead(df: DataFrame): Long = {
      df.collect()
      allScans(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    val all = filesRead(spark.read.parquet(s"$dir/postings"))
    val one = Similarity.ivfIndexKnn(queries.filter(col("id") === 0L),
      dir, "id", "vec", k = 3, nProbe = 1)
    // count only scans rooted in the postings dir (the centroid read
    // and query side never touch it)
    one.collect()
    val postingsFiles = allScans(one.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
      .map(_.metrics("numFiles").value).sum
    assert(postingsFiles > 0, "no postings scan found in the plan")
    assert(postingsFiles < all,
      s"expected partition pruning: $postingsFiles !< $all")
  }
}
