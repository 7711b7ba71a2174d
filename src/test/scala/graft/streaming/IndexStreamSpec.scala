package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Similarity

/** Streaming IVF index maintenance: batches append into the persisted
  * inverted file against the frozen quantizer; replays are idempotent
  * because the durable index is the state. */
class IndexStreamSpec extends SparkSuite {
  import spark.implicits._
  import IndexStreamSpec.Emb

  private val rnd = new scala.util.Random(13)
  private def v(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
  private val base = Seq.tabulate(20)(i => Emb(i.toLong, v()))
  private val late = Seq.tabulate(10)(i => Emb(20L + i, v()))

  test("streamed batches extend the probe result; replay appends nothing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    Similarity.buildIvfIndex(base.toDF("vec_id", "vec"), "vec_id", "vec",
      dir, k = 4, iters = 2)

    val input = MemoryStream[Emb]
    val q = IndexStream.startIvfAppendJob(
      input.toDF().select(col("vec_id"), col("vec")), "vec_id", "vec",
      dir, java.nio.file.Files.createTempDirectory("ivfstream_ckpt").toString)
    try {
      input.addData(late.take(5): _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/postings").count() === 25)
      input.addData(late.drop(5): _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/postings").count() === 30)
    } finally q.stop()

    // the index after streaming == one batch append of the same rows
    // (order/batching invariance): probe both at full coverage
    val dir2 = java.nio.file.Files.createTempDirectory("ivfstream2").toString
    Similarity.buildIvfIndex(base.toDF("vec_id", "vec"), "vec_id", "vec",
      dir2, k = 4, iters = 2)
    Similarity.appendToIvfIndex(late.toDF("vec_id", "vec"), "vec_id", "vec", dir2)
    val queries = base.take(3).toDF("vec_id", "vec")
    def probe(d: String) =
      Similarity.ivfIndexKnn(queries, d, "vec_id", "vec", k = 4, nProbe = 2)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(probe(dir) === probe(dir2))

    // crash replay: the same batch applied twice (append committed,
    // checkpoint lost) — the replay anti-joins the postings already in
    // its target cells and appends nothing
    val replay = Seq(Emb(99L, v())).toDF("vec_id", "vec")
    IndexStream.appendNovelVectors(replay, "vec_id", "vec", dir)
    IndexStream.appendNovelVectors(replay, "vec_id", "vec", dir)
    val copies = spark.read.parquet(s"$dir/postings")
      .filter(col("neighbor_id") === 99L).count()
    assert(copies === 1L)

    // empty batch: no-op, no crash
    IndexStream.appendNovelVectors(
      Seq.empty[Emb].toDF("vec_id", "vec"), "vec_id", "vec", dir)
    assert(spark.read.parquet(s"$dir/postings").count() === 31)

    // within-batch duplicate id: one posting, picked deterministically
    IndexStream.appendNovelVectors(
      Seq(Emb(200L, v()), Emb(200L, v())).toDF("vec_id", "vec"),
      "vec_id", "vec", dir)
    assert(spark.read.parquet(s"$dir/postings")
      .filter(col("neighbor_id") === 200L).count() === 1L)
  }

  test("a retrain between micro-batches is picked up with no restart") {
    // the generation-pointer claim: retrainIvfIndex swaps MANIFEST
    // between two micro-batches of a RUNNING append job, and the next
    // batch resolves the new generation — no job restart, nothing lost
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfstream_rt").toString
    Similarity.buildIvfIndex(base.toDF("vec_id", "vec"), "vec_id", "vec",
      dir, k = 2, iters = 1) // deliberately stale quantizer
    val input = MemoryStream[Emb]
    val q = IndexStream.startIvfAppendJob(
      input.toDF().select(col("vec_id"), col("vec")), "vec_id", "vec",
      dir, java.nio.file.Files.createTempDirectory("ivfstream_rtc").toString)
    try {
      input.addData(late.take(5): _*)
      q.processAllAvailable() // batch 1 → gen-0 fixed paths
      Similarity.retrainIvfIndex(spark, dir, k = 4, iters = 2)
      val (_, posts) = Similarity.livePaths(spark, dir)
      assert(posts.endsWith("postings_g1"))
      input.addData(late.drop(5): _*)
      q.processAllAvailable() // batch 2 → resolves g1 through the pointer
      assert(spark.read.parquet(posts).count() === 30)
      // and a replay of batch-2 rows against the NEW generation still
      // appends nothing (ids survived the retrain)
      IndexStream.appendNovelVectors(late.drop(5).toDF("vec_id", "vec"),
        "vec_id", "vec", dir)
      assert(spark.read.parquet(posts).count() === 30)
    } finally q.stop()
    // probe equals a fresh full-corpus build at the retrain config with
    // the last batch appended (the k11 contract, through the stream)
    val dir2 = java.nio.file.Files.createTempDirectory("ivfstream_rt2").toString
    Similarity.buildIvfIndex((base ++ late.take(5)).toDF("vec_id", "vec"),
      "vec_id", "vec", dir2, k = 4, iters = 2)
    Similarity.appendToIvfIndex(late.drop(5).toDF("vec_id", "vec"),
      "vec_id", "vec", dir2)
    val queries = base.take(3).toDF("vec_id", "vec")
    def probe(d: String) =
      Similarity.ivfIndexKnn(queries, d, "vec_id", "vec", k = 4, nProbe = 10)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(probe(dir) === probe(dir2))
  }

  test("the replay anti-join scans only the batch's target cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivfprune").toString
    Similarity.buildIvfIndex(base.toDF("vec_id", "vec"), "vec_id", "vec",
      dir, k = 4, iters = 2)
    val allCells = spark.read.parquet(s"$dir/postings")
      .select("cell_id").distinct().count()
    // a single new vector targets ONE cell; the anti-join's postings
    // read must prune to that cell's partition, not scan the index
    val one = Seq(Emb(500L, v())).toDF("vec_id", "vec")
    val cents = spark.read.parquet(s"$dir/centroids")
    val assigned = graft.operators.Clustering.assignCells(
      one.select(col("vec_id").as("__id"), col("vec").as("__v")),
      "__id", "__v", cents)
    val cell = assigned.select("cell_id").head().getLong(0)
    val pruned = spark.read.parquet(s"$dir/postings")
      .filter(col("cell_id") === cell)
      .select("neighbor_id")
    import org.apache.spark.sql.execution.FileSourceScanExec
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(allCells > 1)
    assert(scan.metrics("numFiles").value <
      spark.read.parquet(s"$dir/postings").inputFiles.length,
      "cell filter must prune partition directories")
  }

  test("compaction collapses append-accumulated small files; probe unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    Similarity.buildIvfIndex(base.toDF("vec_id", "vec"), "vec_id", "vec",
      dir, k = 4, iters = 2)
    // 5 single-row appends: each drops another file into its cell dir
    late.take(5).foreach { e =>
      Similarity.appendToIvfIndex(Seq(e).toDF("vec_id", "vec"),
        "vec_id", "vec", dir)
    }
    val queries = base.take(3).toDF("vec_id", "vec")
    def probe() =
      Similarity.ivfIndexKnn(queries, dir, "vec_id", "vec", k = 4, nProbe = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val before = probe()
    val filesBefore = spark.read.parquet(s"$dir/postings").inputFiles.length
    Similarity.compactIvfIndex(spark, dir, cellsPerSlice = 2)
    val filesAfter = spark.read.parquet(s"$dir/postings").inputFiles.length
    assert(filesAfter < filesBefore,
      s"expected fewer files after compaction: $filesAfter !< $filesBefore")
    assert(spark.read.parquet(s"$dir/postings").count() === 25)
    assert(probe() === before)
  }

  test("an IVF-PQ index is auto-detected: batches append PQ codes") {
    import graft.operators.ProductQuantization
    val dir = java.nio.file.Files.createTempDirectory("ivfpqstream").toString
    ProductQuantization.buildIvfPqIndex(base.toDF("vec_id", "vec"),
      "vec_id", "vec", dir, kCells = 4, coarseIters = 2, m = 2, ksub = 4,
      pqIters = 1, byResidual = true)
    val batch = late.take(5).toDF("vec_id", "vec")
    IndexStream.appendNovelVectors(batch, "vec_id", "vec", dir)
    // replay: second application appends nothing
    IndexStream.appendNovelVectors(batch, "vec_id", "vec", dir)
    val postings = spark.read.parquet(s"$dir/postings")
    assert(postings.count() === 25)
    // appended rows are CODES (the PQ schema), not float vectors
    assert(postings.columns.sorted.toSeq ===
      Seq("cell_id", "codes", "neighbor_id", "recon_norm"))
  }
}

object IndexStreamSpec {
  case class Emb(vec_id: Long, vec: Array[Float])
}
