package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.Retrieval

/** Streaming text-index maintenance: batches append postings + marker
  * rows in one atomic job against the persisted inverted index; replays
  * are idempotent because the marker partition is the presence state,
  * and probes fold the markers into the corpus stats so streamed and
  * rebuilt indexes answer bit-for-bit identically. */
class TextIndexStreamSpec extends SparkSuite {
  import spark.implicits._
  import TextIndexStreamSpec.Doc

  private val base = Seq(
    Doc(1L, "spark shuffles data between stages"),
    Doc(2L, "parquet stores columns not rows"),
    Doc(3L, "bm25 ranks documents by term rarity"),
    Doc(4L, "the quick brown fox jumps over the lazy dog"),
    Doc(5L, "streaming appends keep the index current"))
  private val late = Seq(
    Doc(6L, "inverted index postings live in term buckets"),
    Doc(7L, "spark broadcast joins avoid the shuffle"),
    Doc(8L, "rarity beats frequency in idf weighting"),
    Doc(9L, "crash replays must append nothing twice"))
  private val queries = Seq(
    (101L, "spark shuffle"), (102L, "term rarity index"),
    (103L, "the lazy dog")).toDF("query_id", "query_text")

  private def probe(dir: String): Seq[(Long, Long, Double, Int)] =
    Retrieval.bm25IndexTopK(queries, "query_id", "query_text", dir, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .sortBy(r => (r._1, r._4)).toSeq

  test("streamed batches extend the index; probe == build(A∪B) bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("txtstream").toString
    Retrieval.buildTextIndex(base.toDF("doc_id", "text"), "doc_id", "text",
      dir, nBuckets = 8)

    val input = MemoryStream[Doc]
    val q = TextIndexStream.startTextAppendJob(
      input.toDF().select(col("doc_id"), col("text")), "doc_id", "text",
      dir, java.nio.file.Files.createTempDirectory("txtstream_ckpt").toString)
    try {
      input.addData(late.take(2): _*)
      q.processAllAvailable()
      input.addData(late.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    // one marker per streamed doc, none for built docs
    val markers = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket") === Retrieval.MarkerBucket)
    assert(markers.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(6L, 7L, 8L, 9L))

    // bit-for-bit: the streamed index answers exactly like a one-shot
    // build over the union (stats fold the markers in, so N/avgdl and
    // every idf agree), and like the live scan-time path
    val dirAll = java.nio.file.Files.createTempDirectory("txtall").toString
    Retrieval.buildTextIndex((base ++ late).toDF("doc_id", "text"),
      "doc_id", "text", dirAll, nBuckets = 8)
    assert(probe(dir) === probe(dirAll))
    val live = Retrieval.bm25TopK((base ++ late).toDF("doc_id", "text"),
        "doc_id", "text", queries, "query_id", "query_text", k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    assert(probe(dir) === live)
  }

  test("crash replay appends nothing; empty and duplicate batches behave") {
    val dir = java.nio.file.Files.createTempDirectory("txtreplay").toString
    Retrieval.buildTextIndex(base.toDF("doc_id", "text"), "doc_id", "text",
      dir, nBuckets = 8)
    val batch = late.take(2).toDF("doc_id", "text")

    // the same batch applied twice (append committed, checkpoint lost —
    // the replay re-runs under the SAME batch id): the replay
    // anti-joins the marker partition and appends nothing — postings,
    // markers, AND the probe answer are all unchanged
    TextIndexStream.appendNovelDocs(batch, "doc_id", "text", dir, 0L)
    val afterFirst = spark.read.parquet(s"$dir/postings").count()
    val probeFirst = probe(dir)
    TextIndexStream.appendNovelDocs(batch, "doc_id", "text", dir, 0L)
    assert(spark.read.parquet(s"$dir/postings").count() === afterFirst)
    assert(probe(dir) === probeFirst)

    // empty batch: no-op, no crash
    TextIndexStream.appendNovelDocs(
      Seq.empty[Doc].toDF("doc_id", "text"), "doc_id", "text", dir, 1L)
    assert(spark.read.parquet(s"$dir/postings").count() === afterFirst)

    // within-batch duplicate id: ONE marker, one set of postings,
    // picked deterministically (smallest text)
    TextIndexStream.appendNovelDocs(
      Seq(Doc(50L, "zz duplicated doc"), Doc(50L, "aa duplicated doc"))
        .toDF("doc_id", "text"), "doc_id", "text", dir, 2L)
    val fifty = spark.read.parquet(s"$dir/postings")
      .filter(col("doc_id") === 50L)
    assert(fifty.filter(col("term_bucket") === Retrieval.MarkerBucket)
      .count() === 1L)
    assert(fifty.filter(col("__term") === "aa").count() === 1L)
    assert(fifty.filter(col("__term") === "zz").count() === 0L)
  }

  test("the replay anti-join reads only the marker partition") {
    val dir = java.nio.file.Files.createTempDirectory("txtprune").toString
    Retrieval.buildTextIndex(base.toDF("doc_id", "text"), "doc_id", "text",
      dir, nBuckets = 8)
    TextIndexStream.appendNovelDocs(late.take(2).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0L)
    val pruned = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket") === Retrieval.MarkerBucket)
      .select("doc_id")
    pruned.collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value <
      spark.read.parquet(s"$dir/postings").inputFiles.length,
      "marker filter must prune the term-bucket directories")
    // scan.schema keeps the term_bucket PARTITION column (read from
    // directory names, not file bytes); no data column beyond doc_id
    // may survive pruning
    assert(scan.schema.fieldNames.toSet.subsetOf(
      Set("doc_id", "term_bucket")),
      s"presence check read extra columns: ${scan.schema.fieldNames.toSeq}")
  }

  test("batching invariance: any random split of the appended docs " +
      "probes identically to the one-shot build") {
    val want = {
      val d = java.nio.file.Files.createTempDirectory("txtprop0").toString
      Retrieval.buildTextIndex((base ++ late).toDF("doc_id", "text"),
        "doc_id", "text", d, nBuckets = 8)
      probe(d)
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"txtprop$trial")
        .toString
      Retrieval.buildTextIndex(base.toDF("doc_id", "text"),
        "doc_id", "text", dir, nBuckets = 8)
      // partition the late docs into 1..4 random batches, shuffled
      val shuffled = rnd.shuffle(late)
      val cuts = rnd.nextInt(4) + 1
      shuffled.grouped(math.max(1, shuffled.size / cuts)).zipWithIndex
        .foreach { case (b, i) =>
          TextIndexStream.appendNovelDocs(b.toDF("doc_id", "text"),
            "doc_id", "text", dir, i.toLong)
        }
      assert(probe(dir) === want, s"trial $trial (cuts=$cuts) diverged")
    }
  }

  test("compaction collapses append-accumulated files and folds markers " +
      "to the replay horizon; probe bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("txtcompact").toString
    Retrieval.buildTextIndex(base.toDF("doc_id", "text"), "doc_id", "text",
      dir, nBuckets = 8)
    // one append per doc: each drops another file into every touched
    // bucket and the marker partition
    late.zipWithIndex.foreach { case (d, i) =>
      TextIndexStream.appendNovelDocs(Seq(d).toDF("doc_id", "text"),
        "doc_id", "text", dir, i.toLong)
    }
    val before = probe(dir)
    def postings() = spark.read.parquet(s"$dir/postings")
    val buckets = postings().filter(col("term_bucket") =!=
      Retrieval.MarkerBucket)
    val bucketRowsBefore = buckets.count()
    val filesBefore = postings().inputFiles.length
    Retrieval.compactTextIndex(spark, dir, bucketsPerSlice = 4)
    val filesAfter = postings().inputFiles.length
    assert(filesAfter < filesBefore,
      s"expected fewer files after compaction: $filesAfter !< $filesBefore")
    // postings side untouched row-wise; markers folded down to the
    // newest batch (1 doc) + one fold row carrying the other 3 docs
    assert(postings().filter(col("term_bucket") =!= Retrieval.MarkerBucket)
      .count() === bucketRowsBefore)
    val markers = postings()
      .filter(col("term_bucket") === Retrieval.MarkerBucket).collect()
    assert(markers.length === 2,
      s"expected horizon + fold row: ${markers.mkString(", ")}")
    val fold = markers.find(_.isNullAt(0)).get
    assert(fold.getLong(fold.fieldIndex("__tf")) === late.size - 1L)
    val horizonRow = markers.find(!_.isNullAt(0)).get
    assert(horizonRow.getLong(0) === late.last.doc_id)
    // the fold moved integer totals, not values: probe is bit-identical
    assert(probe(dir) === before)
    // replay of the NEWEST batch (the only one the engine can re-run)
    // still appends nothing after compaction
    val rowsAfter = postings().count()
    TextIndexStream.appendNovelDocs(
      Seq(late.last).toDF("doc_id", "text"), "doc_id", "text", dir,
      (late.size - 1).toLong)
    assert(postings().count() === rowsAfter)
  }

  test("repeated compaction keeps the marker partition bounded: older " +
      "fold rows re-fold into one; batch-append markers always fold") {
    val dir = java.nio.file.Files.createTempDirectory("txtfold").toString
    Retrieval.buildTextIndex(base.toDF("doc_id", "text"), "doc_id", "text",
      dir, nBuckets = 8)
    // pure batch appends (no replay possible): first compaction folds
    // EVERY marker into the single fold row
    late.grouped(2).foreach { b =>
      Retrieval.appendToTextIndex(b.toDF("doc_id", "text"),
        "doc_id", "text", dir)
    }
    val wantProbe = probe(dir)
    Retrieval.compactTextIndex(spark, dir, bucketsPerSlice = 4)
    def markers() = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket") === Retrieval.MarkerBucket)
    val afterFirst = markers().collect()
    assert(afterFirst.length === 1 && afterFirst.head.isNullAt(0))
    assert(afterFirst.head.getLong(afterFirst.head.fieldIndex("__tf"))
      === late.size.toLong)
    assert(probe(dir) === wantProbe)
    // stream two more batches, compact again: the prior fold row and
    // the older batch fold together, the newest batch survives
    TextIndexStream.appendNovelDocs(
      Seq(Doc(20L, "fresh streamed doc twenty")).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0L)
    TextIndexStream.appendNovelDocs(
      Seq(Doc(21L, "fresher streamed doc twenty one")).toDF("doc_id", "text"),
      "doc_id", "text", dir, 1L)
    val wantProbe2 = probe(dir)
    Retrieval.compactTextIndex(spark, dir, bucketsPerSlice = 4)
    val afterSecond = markers().collect()
    assert(afterSecond.length === 2)
    assert(afterSecond.count(_.isNullAt(0)) === 1)
    val fold2 = afterSecond.find(_.isNullAt(0)).get
    assert(fold2.getLong(fold2.fieldIndex("__tf")) === late.size + 1L)
    assert(afterSecond.find(!_.isNullAt(0)).get.getLong(0) === 21L)
    assert(probe(dir) === wantProbe2)
  }

  test("batch append is the same marker protocol: build(A)+append(B) " +
      "probes bit-identically to build(A∪B), stats file untouched") {
    val inc = java.nio.file.Files.createTempDirectory("txtbatch").toString
    Retrieval.buildTextIndex(base.toDF("doc_id", "text"), "doc_id", "text",
      inc, nBuckets = 8)
    val statsBefore = java.nio.file.Files.list(
      java.nio.file.Paths.get(inc, "stats")).count()
    Retrieval.appendToTextIndex(late.toDF("doc_id", "text"),
      "doc_id", "text", inc)
    // stats artifact byte-untouched (file count unchanged — no rewrite
    // job ran); the appended docs' share rides the marker partition
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(inc, "stats")).count() === statsBefore)
    val m = spark.read.parquet(s"$inc/postings")
      .filter(col("term_bucket") === Retrieval.MarkerBucket)
      .agg(sum("__tf"), sum("__dl")).head()
    assert(m.getLong(0) === late.size.toLong)
    val full = java.nio.file.Files.createTempDirectory("txtbatchfull").toString
    Retrieval.buildTextIndex((base ++ late).toDF("doc_id", "text"),
      "doc_id", "text", full, nBuckets = 8)
    assert(probe(inc) === probe(full))
  }
}

object TextIndexStreamSpec {
  case class Doc(doc_id: Long, text: String)
}
