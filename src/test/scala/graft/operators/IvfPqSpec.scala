package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** IVF-PQ: the persisted inverted file with PQ codes as postings.
  * Pins the compression contract (no float vectors on disk), the
  * exactness degenerate (identity codebook + full probe ≡ brute
  * force), and the partition pruning the probe exists for. */
class IvfPqSpec extends SparkSuite {
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

  test("postings are pure codes: no float vector column on disk") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 1, m = 2, ksub = 4, pqIters = 1)
    val postings = spark.read.parquet(s"$dir/postings")
    assert(postings.columns.sorted.toSeq ===
      Seq("cell_id", "codes", "neighbor_id", "recon_norm"))
    assert(postings.count() === 40)
  }

  test("append without retrain == index encoded with the frozen " +
      "quantizer and codebooks (plain and residual)") {
    for (byResidual <- Seq(false, true)) {
      val half1 = corpus.filter(col("id") < 20)
      // reference: one build whose TRAINING corpus is half1 but whose
      // postings cover everything — constructed by building on half1
      // and appending the rest, vs building on half1 and appending
      // nothing then appending in two smaller batches (split
      // invariance pins that append order/batching can't matter)
      val dirA = java.nio.file.Files.createTempDirectory("ivfpqapp").toString
      ProductQuantization.buildIvfPqIndex(half1, "id", "vec", dirA,
        kCells = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 1,
        byResidual = byResidual)
      ProductQuantization.appendToIvfPqIndex(
        corpus.filter(col("id") >= 20), "id", "vec", dirA)
      val dirB = java.nio.file.Files.createTempDirectory("ivfpqapp").toString
      ProductQuantization.buildIvfPqIndex(half1, "id", "vec", dirB,
        kCells = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 1,
        byResidual = byResidual)
      ProductQuantization.appendToIvfPqIndex(
        corpus.filter(col("id") >= 20 && col("id") < 30), "id", "vec", dirB)
      ProductQuantization.appendToIvfPqIndex(
        corpus.filter(col("id") >= 30), "id", "vec", dirB)
      val a = rows(ProductQuantization.ivfPqKnn(queries, dirA, "id", "vec",
        k = 3, nProbe = 2))
      val b = rows(ProductQuantization.ivfPqKnn(queries, dirB, "id", "vec",
        k = 3, nProbe = 2))
      assert(a === b, s"byResidual=$byResidual")
      // postings cover the full corpus, still no float vectors on disk
      val postings = spark.read.parquet(s"$dirA/postings")
      assert(postings.count() === 40, s"byResidual=$byResidual")
      assert(postings.columns.sorted.toSeq ===
        Seq("cell_id", "codes", "neighbor_id", "recon_norm"),
        s"byResidual=$byResidual")
      // deterministic encode: appended ids encode exactly as a direct
      // full re-encode under the same frozen quantizer would — check a
      // build-on-half1 posting row is bit-identical across A and B
      val pa = spark.read.parquet(s"$dirA/postings")
        .filter(col("neighbor_id") >= 20)
        .select("neighbor_id", "codes", "recon_norm", "cell_id")
        .as[(Long, Seq[Int], Double, Int)].collect().sortBy(_._1).toSeq
      val pb = spark.read.parquet(s"$dirB/postings")
        .filter(col("neighbor_id") >= 20)
        .select("neighbor_id", "codes", "recon_norm", "cell_id")
        .as[(Long, Seq[Int], Double, Int)].collect().sortBy(_._1).toSeq
      assert(pa === pb, s"byResidual=$byResidual")
    }
  }

  test("identity codebook + full probe degrades to exact brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    // ksub >= N with 0 PQ rounds: the codebook IS the corpus
    // subvectors, reconstruction is exact; probing every trained cell
    // removes the coarse filter
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 2, m = 2, ksub = 40, pqIters = 0)
    val idx = rows(ProductQuantization.ivfPqKnn(queries, dir, "id", "vec",
      k = 5, nProbe = 10))
    val brute = rows(Similarity.bruteForceKnn(queries, corpus, "id", "vec",
      k = 5))
    assert(idx.map(r => (r._1, r._2, r._3)) ===
      brute.map(r => (r._1, r._2, r._3)))
    idx.zip(brute).foreach { case (a, b) =>
      // subspace fold vs single-pass dot: same math, different FP
      // association — equal after round-6 except knife edges
      assert(math.abs(a._4 - b._4) <= 2e-6, s"${a._1}#${a._2}: ${a._4} vs ${b._4}")
    }
  }

  test("trained IVF-PQ shortlist contains the exact neighbors " +
      "(clustered fixture)") {
    val cdim = 16
    val crnd = new scala.util.Random(42)
    val centers = Array.fill(8)(Array.fill(cdim)(crnd.nextGaussian()))
    val emb = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.05 * crnd.nextGaussian()).toFloat).toSeq)
    }.toDF("id", "vec").cache()
    val qs = emb.filter(col("id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    ProductQuantization.buildIvfPqIndex(emb, "id", "vec", dir,
      kCells = 8, coarseIters = 2, m = 4, ksub = 16, pqIters = 2)
    def topk(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topk(Similarity.bruteForceKnn(qs, emb, "id", "vec", 3))
    val short = topk(ProductQuantization.ivfPqKnn(qs, dir, "id", "vec",
      k = 40, nProbe = 2))
    val recall = exact.map { case (q, want) =>
      short.get(q).map(_.intersect(want).size / 3.0).getOrElse(0.0)
    }.sum / exact.size
    info(f"IVF-PQ shortlist-40 recall@3 (nProbe=2): $recall%.2f")
    assert(recall >= 0.9)
  }

  test("residual mode: identity residual codebook + full probe is still " +
      "exact brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqr").toString
    // rc = residual exactly → recon = centroid + (v − centroid) = v
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 2, m = 2, ksub = 40, pqIters = 0,
      byResidual = true)
    val idx = rows(ProductQuantization.ivfPqKnn(queries, dir, "id", "vec",
      k = 5, nProbe = 10))
    val brute = rows(Similarity.bruteForceKnn(queries, corpus, "id", "vec",
      k = 5))
    assert(idx.map(r => (r._1, r._2, r._3)) ===
      brute.map(r => (r._1, r._2, r._3)))
    idx.zip(brute).foreach { case (a, b) =>
      assert(math.abs(a._4 - b._4) <= 2e-6, s"${a._1}#${a._2}: ${a._4} vs ${b._4}")
    }
  }

  test("residual encoding reconstructs tighter than non-residual at the " +
      "same code budget") {
    val cdim = 16
    val crnd = new scala.util.Random(5)
    val centers = Array.fill(6)(Array.fill(cdim)(crnd.nextGaussian() * 3))
    val emb = (0 until 300).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(x => (x + 0.4 * crnd.nextGaussian()).toFloat).toSeq)
    }.toDF("id", "vec").cache()
    def meanCosErr(byResidual: Boolean): Double = {
      val dir = java.nio.file.Files.createTempDirectory("ivfpqcmp").toString
      ProductQuantization.buildIvfPqIndex(emb, "id", "vec", dir,
        kCells = 6, coarseIters = 2, m = 2, ksub = 4, pqIters = 2,
        byResidual = byResidual)
      val qs = emb.filter(col("id") < 20)
      // approximate-vs-exact cosine gap over the exact top-3 pairs:
      // the tighter the reconstruction, the smaller the gap
      val exact = Similarity.bruteForceKnn(qs, emb, "id", "vec", 3)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("ecos"))
      val approx = ProductQuantization.ivfPqKnn(qs, dir, "id", "vec",
        k = 299, nProbe = 6)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("acos"))
      exact.join(approx, Seq("query_id", "neighbor_id"))
        .select(avg(abs(col("ecos") - col("acos")))).head().getDouble(0)
    }
    val errPlain = meanCosErr(byResidual = false)
    val errResid = meanCosErr(byResidual = true)
    info(f"mean |cos gap| on exact top-3: plain=$errPlain%.4f residual=$errResid%.4f")
    assert(errResid < errPlain,
      s"residual encoding should reconstruct tighter: $errResid !< $errPlain")
  }

  test("probing reads ONLY the probed cells' postings partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    ProductQuantization.buildIvfPqIndex(corpus, "id", "vec", dir,
      kCells = 4, coarseIters = 2, m = 2, ksub = 8, pqIters = 1)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
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
    val all = {
      val df = spark.read.parquet(s"$dir/postings")
      df.collect()
      allScans(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    val one = ProductQuantization.ivfPqKnn(queries.filter(col("id") === 0L),
      dir, "id", "vec", k = 3, nProbe = 1)
    one.collect()
    val postingsFiles = allScans(one.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
      .map(_.metrics("numFiles").value).sum
    assert(postingsFiles > 0, "no postings scan found in the plan")
    assert(postingsFiles < all,
      s"expected partition pruning: $postingsFiles !< $all")
  }
}
