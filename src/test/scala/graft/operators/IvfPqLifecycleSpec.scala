package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** IVF-PQ retrain lifecycle (the k13 contract): rebuild-from-source
  * with the same atomic generation swap float indexes get, PQ-aware
  * auto-maintenance that returns decisions instead of throwing, and
  * the source-based recall probe. */
class IvfPqLifecycleSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val vecs = Seq.tabulate(40) { i =>
    (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
  }
  private def corpus: DataFrame = vecs.toDF("id", "vec")
  private def queries: DataFrame = corpus.filter(col("id") < 5)

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("query_id", "rank", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("rebuild from source answers EXACTLY as a fresh build " +
      "(plain and residual; explicit and live-derived m/ksub)") {
    for (byResidual <- Seq(false, true)) {
      // stale build on the first half, append the rest (k10's shape),
      // then rebuild from the full source at the fresh configuration
      val dir = java.nio.file.Files.createTempDirectory("pqrb").toString
      ProductQuantization.buildIvfPqIndex(corpus.filter(col("id") < 20),
        "id", "vec", dir, kCells = 2, coarseIters = 1, m = 2, ksub = 4,
        pqIters = 1, byResidual = byResidual)
      ProductQuantization.appendToIvfPqIndex(
        corpus.filter(col("id") >= 20), "id", "vec", dir)
      // m/ksub/byResidual derived from the LIVE index (m=2, ksub=4)
      ProductQuantization.rebuildIvfPqIndex(corpus, "id", "vec", dir,
        kCells = 4, coarseIters = 2, pqIters = 1)
      val fresh = java.nio.file.Files.createTempDirectory("pqfb").toString
      ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", fresh,
        kCells = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 1,
        byResidual = byResidual)
      for (nProbe <- Seq(1, 2, 10)) {
        val rb = rows(ProductQuantization.ivfPqKnn(queries, dir,
          "id", "vec", k = 3, nProbe = nProbe))
        val fb = rows(ProductQuantization.ivfPqKnn(queries, fresh,
          "id", "vec", k = 3, nProbe = nProbe))
        assert(rb === fb,
          s"rebuild != fresh build at nProbe=$nProbe byResidual=$byResidual")
      }
    }
  }

  test("rebuild swaps the generation: manifest + four _g1 relations, " +
      "fixed paths gone; appends land in the live generation; " +
      "a second rebuild sweeps g1") {
    val dir = java.nio.file.Files.createTempDirectory("pqgen").toString
    ProductQuantization.buildIvfPqIndex(corpus.filter(col("id") < 20),
      "id", "vec", dir, kCells = 4, coarseIters = 2, m = 2, ksub = 4,
      pqIters = 1)
    ProductQuantization.rebuildIvfPqIndex(
      corpus.filter(col("id") < 20), "id", "vec", dir,
      kCells = 4, coarseIters = 2, pqIters = 1)
    val f = new java.io.File(dir)
    val names = f.listFiles().map(_.getName).toSet
    assert(names.contains("MANIFEST"))
    assert(Seq("centroids_g1", "codebooks_g1", "postings_g1", "meta_g1")
      .forall(names.contains), s"missing g1 relations in $names")
    assert(!names.exists(Similarity.IndexRelations.contains),
      s"fixed paths must be swept: $names")
    // append resolves through the pointer: postings land in _g1 and
    // are probe-visible
    ProductQuantization.appendToIvfPqIndex(
      corpus.filter(col("id") >= 20), "id", "vec", dir)
    assert(spark.read.parquet(s"$dir/postings_g1").count() === 40)
    assert(rows(ProductQuantization.ivfPqKnn(queries, dir, "id", "vec",
      k = 3, nProbe = 2)).nonEmpty)
    // second rebuild bumps to g2 and sweeps every g1 relation
    ProductQuantization.rebuildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 2, pqIters = 1)
    val names2 = f.listFiles().map(_.getName).toSet
    assert(names2.contains("postings_g2") && !names2.exists(_.endsWith("_g1")))
    assert(spark.read.parquet(s"$dir/postings_g2").count() === 40)
    // rebuild refuses a float index with the way out
    val fdir = java.nio.file.Files.createTempDirectory("pqnotpq").toString
    Similarity.buildIvfIndex(corpus, "id", "vec", fdir, k = 4, iters = 1)
    val e = intercept[IllegalArgumentException] {
      ProductQuantization.rebuildIvfPqIndex(corpus, "id", "vec", fdir,
        kCells = 4, coarseIters = 1)
    }
    assert(e.getMessage.contains("retrainIvfIndex"))
  }

  test("rebuild holds the compactor flag: concurrent appends fail fast") {
    val dir = java.nio.file.Files.createTempDirectory("pqrace").toString
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 1, m = 2, ksub = 4, pqIters = 1)
    graft.sources.Compaction.guardedAppend(spark, dir) {
      intercept[graft.sources.ConcurrentCompactionException] {
        ProductQuantization.rebuildIvfPqIndex(corpus, "id", "vec", dir,
          kCells = 4, coarseIters = 1)
      }
    }
    ProductQuantization.rebuildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 1)
  }

  /** 2-D angular clusters; ids 0..3 seed one centroid per cluster. */
  private def clustered(ids: Range, cluster: Int => Int): DataFrame = {
    val base = Array(0.0, math.Pi / 2, math.Pi, 3 * math.Pi / 2)
    ids.map { i =>
      val a = base(cluster(i)) + 0.02 * ((i % 7) - 3)
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "vec")
  }

  test("maintainIvfIndex on a PQ index NEVER throws: refused-pq " +
      "without a source, retrain (rebuild) with one") {
    val dir = java.nio.file.Files.createTempDirectory("pqmaint").toString
    val balanced = clustered(0 until 20, _ % 4)
    ProductQuantization.buildIvfPqIndex(balanced, "id", "vec", dir,
      kCells = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 1)
    // healthy PQ index: plain noop, no source needed
    val healthy = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 2.0, maxFiles = 64)
    assert(healthy.action === "noop" && healthy.cells === 4)
    // recall floor requested without the source vectors: a typed
    // refusal BEFORE any probe work, not an exception
    val noProbe = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 2.0, maxFiles = 64, minRecall = 0.9)
    assert(noProbe.action === "refused-pq" && noProbe.recall.isNaN)
    // drift: appended pile pushes skew over the threshold — without a
    // source the retrain is refused (typed), index untouched
    val pile = clustered(100 until 160, _ => 0)
    ProductQuantization.appendToIvfPqIndex(pile, "id", "vec", dir)
    val refused = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 2.0, maxFiles = 64)
    assert(refused.action === "refused-pq")
    assert(refused.postingSkew > 2.0)
    assert(spark.read.parquet(s"$dir/postings").count() === 80,
      "a refusal must not touch the index")
    // with the source relation the same signals dispatch the rebuild:
    // fresh generation, postings conserved
    val source = balanced.union(pile)
    val acted = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 2.0, maxFiles = 64,
      rebuildFrom = Some((source, "id", "vec")))
    assert(acted.action === "retrain")
    assert(spark.read.parquet(s"$dir/postings_g1").count() === 80)
    // and the rebuilt index still reports + no-ops cleanly
    val after = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 100.0, maxFiles = 64)
    assert(after.action === "noop")
    // file creep on a PQ index is compactable without any source
    ProductQuantization.appendToIvfPqIndex(clustered(200 until 220, _ % 4),
      "id", "vec", dir)
    ProductQuantization.appendToIvfPqIndex(clustered(300 until 320, _ % 4),
      "id", "vec", dir)
    val creep = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 100.0, maxFiles = 2)
    assert(creep.action === "compact")
    assert(spark.read.parquet(s"$dir/postings_g1").count() === 120)
  }

  test("the configured (m, ksub) budget is persisted in meta and a " +
      "rebuild defaults from it — dropped codes cannot ratchet the " +
      "budget down across rebuilds") {
    // ids 2 and 3 share one vector: pqTrain seeds codes 0..3 from ids
    // 0..3, cent 3 == cent 2 exactly, every row ties to the LOWER code,
    // so the TOP code (3) loses all members and drops — the shape where
    // inferring ksub from surviving codebook rows under-reads 4 as 3
    val dup = vecs.take(40).map { case (i, v) =>
      if (i == 3L) (i, vecs(2)._2) else (i, v)
    }.toDF("id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("pqbudget").toString
    ProductQuantization.buildIvfPqIndex(dup, "id", "vec", dir,
      kCells = 2, coarseIters = 1, m = 2, ksub = 4, pqIters = 1)
    val meta0 = spark.read.parquet(s"$dir/meta").head()
    assert(meta0.getAs[Int]("m") === 2 && meta0.getAs[Int]("ksub") === 4)
    // the drop actually happened: the surviving codebook under-reads
    val maxCode = spark.read.parquet(s"$dir/codebooks")
      .agg(max("code")).head().getInt(0)
    assert(maxCode < 3, s"expected code 3 dropped, max code $maxCode")
    // rebuild with DEFAULT budget: trains at the configured 4, not the
    // inferred 3 — bit-equal to a fresh ksub=4 build over the source
    ProductQuantization.rebuildIvfPqIndex(dup, "id", "vec", dir,
      kCells = 2, coarseIters = 1, pqIters = 1)
    val meta1 = spark.read.parquet(s"$dir/meta_g1").head()
    assert(meta1.getAs[Int]("m") === 2 && meta1.getAs[Int]("ksub") === 4,
      "rebuild must persist the configured budget, not the survivor count")
    val fresh = java.nio.file.Files.createTempDirectory("pqbudgetf").toString
    ProductQuantization.buildIvfPqIndex(dup, "id", "vec", fresh,
      kCells = 2, coarseIters = 1, m = 2, ksub = 4, pqIters = 1)
    val q = dup.filter(col("id") < 5)
    assert(rows(ProductQuantization.ivfPqKnn(q, dir, "id", "vec", 3, 2)) ===
      rows(ProductQuantization.ivfPqKnn(q, fresh, "id", "vec", 3, 2)))
    // second rebuild: still 4 — no downward ratchet across the chain
    ProductQuantization.rebuildIvfPqIndex(dup, "id", "vec", dir,
      kCells = 2, coarseIters = 1, pqIters = 1)
    val meta2 = spark.read.parquet(s"$dir/meta_g2").head()
    assert(meta2.getAs[Int]("m") === 2 && meta2.getAs[Int]("ksub") === 4)
  }

  test("a refused recall floor does not block PQ compaction: file " +
      "creep still dispatches compact (recall NaN), and the refusal " +
      "resurfaces once the creep is handled") {
    val dir = java.nio.file.Files.createTempDirectory("pqrefcomp").toString
    val balanced = clustered(0 until 20, _ % 4)
    ProductQuantization.buildIvfPqIndex(balanced, "id", "vec", dir,
      kCells = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 1)
    ProductQuantization.appendToIvfPqIndex(clustered(200 until 220, _ % 4),
      "id", "vec", dir)
    ProductQuantization.appendToIvfPqIndex(clustered(300 until 320, _ % 4),
      "id", "vec", dir)
    // recall floor + no source + files over threshold: compaction is
    // PQ-legal and must run — the NaN recall marks the unmeasured probe
    val m = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 100.0, maxFiles = 2, minRecall = 0.9)
    assert(m.action === "compact" && m.recall.isNaN)
    assert(spark.read.parquet(s"$dir/postings").count() === 60)
    // creep handled; the refusal is typed again instead of a noop
    val after = Similarity.maintainIvfIndex(spark, dir,
      maxSkew = 100.0, maxFiles = 2, minRecall = 0.9)
    assert(after.action === "refused-pq" && after.recall.isNaN)
  }

  test("PQ recall probe: 1.0 on the exactness degenerate at full " +
      "probe, deterministic, and measured through maintain's floor") {
    val dir = java.nio.file.Files.createTempDirectory("pqrec").toString
    // identity codebook (ksub >= N, 0 rounds) + full probe = exact
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 2, m = 2, ksub = 40, pqIters = 0)
    assert(ProductQuantization.recallProbe(spark, dir, corpus,
      "id", "vec", k = 3, nProbe = 10) === 1.0)
    // a real code budget at single probe: deterministic, in (0, 1]
    val lossy = java.nio.file.Files.createTempDirectory("pqrec2").toString
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", lossy,
      kCells = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 1)
    val r1 = ProductQuantization.recallProbe(spark, lossy, corpus,
      "id", "vec", k = 3, nProbe = 1)
    val r2 = ProductQuantization.recallProbe(spark, lossy, corpus,
      "id", "vec", k = 3, nProbe = 1)
    assert(r1 === r2)
    assert(r1 > 0.0 && r1 <= 1.0, s"single-probe PQ recall $r1")
    // maintain measures the same number through the source relation
    val m = Similarity.maintainIvfIndex(spark, lossy, maxSkew = 100.0,
      maxFiles = 100, minRecall = 0.0, probeNProbe = 1,
      rebuildFrom = Some((corpus, "id", "vec")))
    assert(m.action === "noop" && m.recall === r1)
    // and a floor above it dispatches the rebuild instead of throwing
    if (r1 < 1.0) {
      val m2 = Similarity.maintainIvfIndex(spark, lossy, maxSkew = 100.0,
        maxFiles = 100, minRecall = 1.0, probeNProbe = 1,
        rebuildFrom = Some((corpus, "id", "vec")))
      assert(m2.action === "retrain" && m2.recall === r1)
      assert(spark.read.parquet(s"$lossy/postings_g1").count() === 40)
    }
  }

  test("a crashed rebuild swap's leaked generation is reported and " +
      "swept — all four PQ relations") {
    val dir = java.nio.file.Files.createTempDirectory("pqorph").toString
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 1, m = 2, ksub = 4, pqIters = 1)
    ProductQuantization.rebuildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 1) // gen 1 live
    // simulate a second rebuild crashing between swap and sweep
    for (n <- Similarity.IndexRelations)
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(dir, s"${n}_g1"), new java.io.File(dir, s"${n}_g2"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "MANIFEST"), true)
    try out.write("2".getBytes("UTF-8")) finally out.close()
    assert(Similarity.orphanGenerations(spark, dir) === Seq(1))
    val swept = Similarity.sweepOrphanGenerations(spark, dir)
    assert(swept.map(_.split('/').last).toSet ===
      Set("centroids_g1", "codebooks_g1", "postings_g1", "meta_g1"))
    assert(Similarity.orphanGenerations(spark, dir) === Seq.empty)
    // live generation untouched and probe-green
    assert(rows(ProductQuantization.ivfPqKnn(queries, dir, "id", "vec",
      k = 3, nProbe = 10)).nonEmpty)
  }
}
