package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

// top-level (not nested in the suite): an inner case class captures the
// suite instance as `$outer`, which defeats Janino and drops the encoder
// to interpreted mode, spamming codegen-fallback warnings in the test log
final case class StreamedDoc(doc_id: Long, text: String, event_ts: Long)

final case class CuratedDoc(doc_id: Long, text: String, source: String)

/** Streaming document curation: watermark-bounded exact dedup and the
  * stateless quality/PII gate. */
class DocumentStreamSpec extends SparkSuite {
  import spark.implicits._

  private type Doc = StreamedDoc
  private def Doc(id: Long, text: String, ts: Long) = StreamedDoc(id, text, ts)

  test("dedupExact drops in-horizon duplicates, re-admits after horizon") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val deduped = DocumentStream.dedupExact(
      input.toDF().withColumn("event_time", col("event_ts").cast("timestamp")),
      "text", "event_time", watermark = "100 seconds")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        Doc(1L, "the same document", 10L),
        Doc(2L, "the same document", 20L), // dup within one batch
        Doc(3L, "a different document", 30L))
      q.processAllAvailable()
      input.addData(Doc(4L, "the same document", 60L)) // dup across batches
      q.processAllAvailable()
      // advance the watermark far past 10+100 s, then re-post: state for
      // the hash has been evicted, so the re-post is admitted as new
      input.addData(Doc(5L, "unrelated advancing time", 1000L))
      q.processAllAvailable()
      input.addData(Doc(6L, "the same document", 1010L))
      q.processAllAvailable()

      val ids = spark.table("dedup_out").select("doc_id")
        .as[Long].collect().toSet
      assert(ids.contains(1L) && ids.contains(3L) && ids.contains(5L))
      assert(!ids.contains(2L) && !ids.contains(4L))
      assert(ids.contains(6L)) // re-admitted after horizon
    } finally q.stop()
  }

  test("qualityGate drops low-quality docs and redacts PII, statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val gated = DocumentStream.qualityGate(input.toDF(), "text",
      minQuality = 0.3)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      input.addData(
        Doc(1L, "reach me at bob@example.com for the full dataset " +
          "description covering methodology and several caveats", 1L),
        Doc(2L, "a a a a a a a a", 2L)) // degenerate → low quality
      q.processAllAvailable()
      val rows = spark.table("gate_out")
        .select("doc_id", "redacted").as[(Long, String)].collect().toMap
      assert(rows.contains(1L))
      assert(rows(1L).contains("[EMAIL]") && !rows(1L).contains("bob@"))
    } finally q.stop()
  }

  test("curation job is replay-idempotent via batch_seq stamping") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("cur_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur_ckpt").toString
    val input = MemoryStream[Doc]
    val q = DocumentStream.startCurationJob(
      input.toDF().withColumn("event_time", col("event_ts").cast("timestamp")),
      "text", "event_time", out, ckpt, minQuality = 0.0,
      watermark = "100 seconds")
    try {
      input.addData(
        Doc(1L, "first curated document with enough words to pass", 10L),
        Doc(2L, "first curated document with enough words to pass", 20L))
      q.processAllAvailable()
      val stored = spark.read.parquet(out)
      assert(stored.columns.contains("batch_seq"))
      assert(stored.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    } finally q.stop()
  }

  test("history dedup drops duplicates across batches, restarts, and " +
      "crash replays — the store is the state") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("hist_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hist_ckpt").toString
    def storedIds: Set[Long] = spark.read.parquet(store)
      .select("doc_id").as[Long].collect().toSet

    val input = MemoryStream[Doc]
    val q = DocumentStream.startHistoryDedupJob(input.toDF(), "text",
      "doc_id", store, ckpt)
    try {
      // an EMPTY batch first: leaves no schema behind and must not make
      // the next batch think history exists
      DocumentStream.appendNovel(
        Seq.empty[Doc].toDF(), "text", "doc_id", store, 0L)
      input.addData(
        Doc(2L, "alpha document", 10L),
        Doc(1L, "alpha document", 20L), // within-batch dup: lowest id wins
        Doc(3L, "beta document", 30L))
      q.processAllAvailable()
      assert(storedIds === Set(1L, 3L))
      input.addData(Doc(4L, "alpha document", 500L)) // dup vs history
      input.addData(Doc(5L, "gamma document", 510L))
      q.processAllAvailable()
      assert(storedIds === Set(1L, 3L, 5L))
    } finally q.stop()

    // restart from the same checkpoint + store: history survives the
    // stream's lifetime — a duplicate from BEFORE the restart is dropped
    // with no watermark horizon in play
    val input2 = MemoryStream[Doc]
    val q2 = DocumentStream.startHistoryDedupJob(input2.toDF(), "text",
      "doc_id", store, java.nio.file.Files.createTempDirectory("hist_ckpt2")
        .toString)
    try {
      input2.addData(Doc(6L, "beta document", 1000L),
        Doc(7L, "delta document", 1010L))
      q2.processAllAvailable()
      assert(storedIds === Set(1L, 3L, 5L, 7L))
    } finally q2.stop()

    // crash replay: the same batch applied twice (append committed,
    // checkpoint lost) — the replay anti-joins its own output and
    // appends nothing
    val replay = Seq(Doc(8L, "epsilon document", 2000L)).toDF()
    DocumentStream.appendNovel(replay, "text", "doc_id", store, 99L)
    DocumentStream.appendNovel(replay, "text", "doc_id", store, 99L)
    assert(storedIds === Set(1L, 3L, 5L, 7L, 8L))
    assert(spark.read.parquet(store).filter(col("doc_id") === 8L).count() === 1L)

    // the store is prefix-partitioned for the pruned anti-join
    assert(new java.io.File(store).listFiles()
      .exists(f => f.getName.startsWith("kp=")))
  }

  test("curation pipeline micro-batch: gate → route → history-dedup → " +
      "card increment, replay-idempotent end to end") {
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    implicit val sqlCtx = spark.sqlContext
    // frozen router model, trained offline on disjoint vocabularies
    val train = Seq(
      ("en", "the quick brown fox jumps over the lazy dog here"),
      ("en", "another plain english sentence with common words here"),
      ("fr", "le renard brun rapide saute par dessus le chien"),
      ("fr", "une autre phrase simple avec des mots courants"))
      .toDF("lang", "text")
    val model = graft.operators.Classify.nbFit(train, "lang", "text",
      vocabSize = 16)
    val store = java.nio.file.Files.createTempDirectory("cur_store").toString
    val card = java.nio.file.Files.createTempDirectory("cur_card").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur_ckpt").toString
    def stored = spark.read.parquet(store)

    val input = MemoryStream[CuratedDoc]
    val q = DocumentStream.startCurationPipelineJob(input.toDF(), "text",
      "doc_id", "source", model, store, card, ckpt)
    try {
      input.addData(
        CuratedDoc(2L, "the quick brown fox jumps over the dog today", "web"),
        CuratedDoc(1L, "the quick brown fox jumps over the dog today", "web"),
        CuratedDoc(3L, "le renard brun rapide saute sur le chien", "books"))
      q.processAllAvailable()
      // within-batch dup resolved to the lowest id; routing labels ride
      val r1 = stored.select("doc_id", "predicted")
        .as[(Long, String)].collect().toMap
      assert(r1.keySet === Set(1L, 3L))
      assert(r1(1L) === "en" && r1(3L) === "fr")
      input.addData(
        CuratedDoc(4L, "the quick brown fox jumps over the dog today", "web"),
        CuratedDoc(5L, "an entirely fresh english document arrives now", "web"))
      q.processAllAvailable()
      // dup-vs-history dropped; the card sums per-batch increments of
      // what actually ENTERED the corpus
      assert(stored.select("doc_id").as[Long].collect().toSet ===
        Set(1L, 3L, 5L))
      val totals = DocumentStream.curationCard(spark, card, "source")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(totals("web")._1 === 2L && totals("books")._1 === 1L)
      assert(totals("web")._2 > 0L && totals("web")._3 > 0L)
    } finally q.stop()

    // crash replay: the same micro-batch applied twice (store + card
    // committed, checkpoint lost) — the store anti-joins its own output
    // and the card increment for that batch_seq is rewritten, not
    // double-counted
    val replay = Seq(
      CuratedDoc(8L, "a brand new english document for the replay", "web"))
      .toDF()
    DocumentStream.curationBatch(replay, 99L, "text", "doc_id", "source",
      model, 0.0, store, card)
    val once = DocumentStream.curationCard(spark, card, "source")
      .as[(String, Long, Long, Long)].collect().toSet
    DocumentStream.curationBatch(replay, 99L, "text", "doc_id", "source",
      model, 0.0, store, card)
    assert(stored.filter(col("doc_id") === 8L).count() === 1L)
    val twice = DocumentStream.curationCard(spark, card, "source")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(twice === once, "replayed batch must not double-count the card")
    // increments are batch_seq-partitioned (per-batch dynamic overwrite)
    assert(new java.io.File(card).listFiles()
      .exists(_.getName.startsWith("batch_seq=")))

    // ---- rebuildCard: compaction + repair of the increment log ----
    // simulate the documented at-least-once window: one increment lost
    // (store committed, card increment didn't) → the card undercounts
    val lost = new java.io.File(card).listFiles()
      .filter(_.getName.matches("batch_seq=99")).head
    org.apache.commons.io.FileUtils.deleteDirectory(lost)
    val under = DocumentStream.curationCard(spark, card, "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(under("web") === 2L, "doc 8's increment was dropped")
    // rebuild folds everything into one summary FROM THE STORE — the
    // totals match the store exactly, healing the lost increment
    val dropped = DocumentStream.rebuildCard(spark, store, card,
      "text", "source")
    assert(dropped.nonEmpty)
    val healed = DocumentStream.curationCard(spark, card, "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(healed("web") === 3L && healed("books") === 1L)
    val dirs = new java.io.File(card).listFiles()
      .map(_.getName).filter(_.startsWith("batch_seq=")).toSet
    assert(dirs === Set("batch_seq=-1"), s"increments not folded: $dirs")
    // a crash between summary write and directory drop leaves masked
    // increments behind: plant a stale one at a folded batch_seq — the
    // watermark ignores it, so the totals don't double-count
    DocumentStream.curationBatch(
      Seq(CuratedDoc(9L, "one more english document after the fold", "web"))
        .toDF(), 120L, "text", "doc_id", "source", model, 0.0, store, card)
    val stale = new java.io.File(card, "batch_seq=50")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(card, "batch_seq=120"), stale)
    val masked = DocumentStream.curationCard(spark, card, "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(masked("web") === 4L,
      "stale folded increment must be masked by folded_thru")
    // and the next rebuild cleans the stale directory too
    DocumentStream.rebuildCard(spark, store, card, "text", "source")
    assert(!stale.exists())
    assert(DocumentStream.curationCard(spark, card, "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap.apply("web") === 4L)
  }

  test("compactStore vs a live batch: the two-flag protocol fails one " +
      "side fast instead of silently dropping the append") {
    val store = java.nio.file.Files.createTempDirectory("cmp_store").toString
    val batch = Seq((1L, "a compaction race fixture document", "web"))
      .toDF("doc_id", "text", "source")
    DocumentStream.appendNovel(batch, "text", "doc_id", store, 0L)
    // an in-flight append blocks the compactor
    graft.sources.Compaction.guardedAppend(spark, store) {
      intercept[graft.sources.ConcurrentCompactionException] {
        DocumentStream.compactStore(spark, store)
      }
    }
    // an in-flight compaction blocks the batch's store append
    graft.sources.Compaction.guardedCompaction(spark, store) {
      intercept[graft.sources.ConcurrentCompactionException] {
        DocumentStream.appendNovel(
          Seq((2L, "another fixture document", "web"))
            .toDF("doc_id", "text", "source"), "text", "doc_id", store, 1L)
      }
    }
    // both sides idle: the compaction folds and the history holds
    DocumentStream.compactStore(spark, store)
    assert(spark.read.parquet(store).count() === 1L)
    DocumentStream.appendNovel(batch, "text", "doc_id", store, 2L)
    assert(spark.read.parquet(store).count() === 1L,
      "replayed duplicate must still anti-join against compacted history")
  }

  test("compactStore on a store whose prefixes are ALL digits keeps " +
      "the prefix names and the dedup (the partition-retyping trap)") {
    // craft texts whose md5 starts with a DIGIT so every kp= directory
    // is all-digits — the exact store shape where partition-type
    // inference types kp as INT (r12's appendNovel bug): an inferring
    // compactor would rewrite kp=7 dirs and corrupt width detection
    val md = java.security.MessageDigest.getInstance("MD5")
    def digitLed(n: Int): Seq[String] =
      Iterator.from(0).map(i => s"all digit prefix fixture number $i")
        .filter { t =>
          ((md.digest(t.getBytes("UTF-8"))(0) >> 4) & 0xf) < 10
        }.take(n).toSeq
    val texts = digitLed(12)
    val store = java.nio.file.Files.createTempDirectory("digit_store").toString
    def batch(ts: Seq[String], off: Int) = ts.zipWithIndex
      .map { case (t, i) => ((off + i).toLong, t, "web") }
      .toDF("doc_id", "text", "source")
    DocumentStream.appendNovel(batch(texts.take(6), 0), "text", "doc_id",
      store, 0L)
    DocumentStream.appendNovel(batch(texts.drop(6), 6), "text", "doc_id",
      store, 1L)
    def kpDirs() = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("kp=")).toSet
    val before = kpDirs()
    assert(before.nonEmpty &&
      before.forall(_.stripPrefix("kp=").forall(_.isDigit)),
      s"fixture must produce all-digit prefixes: $before")
    val rows = spark.read.parquet(store).count()
    DocumentStream.compactStore(spark, store)
    assert(kpDirs() === before,
      s"compaction retyped prefixes: $before -> ${kpDirs()}")
    assert(spark.read.parquet(store).count() === rows)
    // the compacted history still dedups a full replay
    DocumentStream.appendNovel(batch(texts, 100), "text", "doc_id",
      store, 2L)
    assert(spark.read.parquet(store).count() === rows)
  }

  test("rebuildCard before any committed batch is a no-op, not a crash") {
    // the rebuild cron firing before the stream's first non-empty
    // batch sees either no store dir at all or an empty first batch's
    // _SUCCESS with no data files — both fold nothing
    val base = java.nio.file.Files.createTempDirectory("cur_empty").toString
    val card = java.nio.file.Files.createTempDirectory("cur_ecard").toString
    assert(DocumentStream.rebuildCard(spark, s"$base/never_written", card,
      "text", "source") === Seq.empty)
    val store = s"$base/store"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(store, "_SUCCESS"), "")
    assert(DocumentStream.rebuildCard(spark, store, card,
      "text", "source") === Seq.empty)
    // no phantom summary either
    val made = Option(new java.io.File(card).listFiles()).getOrElse(Array())
    assert(!made.exists(_.getName.startsWith("batch_seq=")))
  }

  test("streaming dataset card: per-group totals update across batches, " +
      "latest snapshot wins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = java.nio.file.Files.createTempDirectory("card_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("card_ckpt").toString
    val withGroup = input.toDF()
      .withColumn("source", concat(lit("s"), col("doc_id") % 2))
    val q = DocumentStream.startStatsJob(withGroup, "source", "text",
      out, ckpt)
    try {
      input.addData(Doc(0L, "two tokens", 1L), Doc(1L, "three token text", 2L))
      q.processAllAvailable()
      val first = spark.read.parquet(out)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(first === Map("s0" -> 1L, "s1" -> 1L))
      input.addData(Doc(2L, "more text here now", 3L))
      q.processAllAvailable()
      val second = spark.read.parquet(out)
        .collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // s0 accumulated across batches: 2 docs, 2+4 tokens
      assert(second("s0") === ((2L, 6L)))
      assert(second("s1") === ((1L, 3L)))
      // sketch percentiles ride the same card: element-valued, within
      // s0's observed token counts {2, 4}, with the tail at the max
      val pcts = spark.read.parquet(out)
        .filter(col("source") === "s0")
        .select("p50_tokens", "p90_tokens", "p99_tokens").head()
      assert(Set(2.0, 4.0).contains(pcts.getDouble(0)))
      assert(pcts.getDouble(1) === 4.0)
      assert(pcts.getDouble(2) === 4.0)
    } finally q.stop()
  }

  test("card percentile sketch: batch-merged stream == one-shot sketch, " +
      "exact face within one element gap, rank error bounded") {
    implicit val sqlCtx = spark.sqlContext
    // 500 docs, token counts cycling 1..97 — dense enough that the
    // exact interpolated percentile sits within 1 of an observed element
    val tokenCounts = (0 until 500).map(i => i % 97 + 1)
    val docs = tokenCounts.zipWithIndex.map { case (n, i) =>
      Doc(i.toLong, Seq.fill(n)("tok").mkString(" ") + s" ", i.toLong)
    }
    // trailing space: TextAnalysis.tokens must still count n tokens
    val input = MemoryStream[Doc]
    val out = java.nio.file.Files.createTempDirectory("sketch_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sketch_ckpt").toString
    val q = DocumentStream.startStatsJob(
      input.toDF().withColumn("grp", lit("all")), "grp", "text", out, ckpt)
    try {
      // three micro-batches: the sketch must MERGE across triggers
      docs.grouped(200).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      val card = spark.read.parquet(out)
        .select("n_docs", "p50_tokens", "p90_tokens", "p99_tokens").head()
      assert(card.getLong(0) === 500L)
      val static = docs.toDF()
        .select(size(split(col("text"), "\\s+")).cast("long").as("__tok"))
      // merged-across-batches == the same sketch built in one shot (the
      // mergeability claim, pinned as equality)
      val oneShot = static.agg(
        percentile_approx(col("__tok"), lit(0.5), lit(10000)).cast("double"),
        percentile_approx(col("__tok"), lit(0.9), lit(10000)).cast("double"),
        percentile_approx(col("__tok"), lit(0.99), lit(10000)).cast("double"))
        .head()
      assert(card.getDouble(1) === oneShot.getDouble(0))
      assert(card.getDouble(2) === oneShot.getDouble(1))
      assert(card.getDouble(3) === oneShot.getDouble(2))
      // vs the batch face's exact interpolated percentile: the sketch
      // returns an observed element, so the faces agree within one
      // inter-element gap (= 1 here)
      val exact = static.agg(
        percentile(col("__tok"), lit(0.5)),
        percentile(col("__tok"), lit(0.9)),
        percentile(col("__tok"), lit(0.99))).head()
      for (i <- 0 until 3)
        assert(math.abs(card.getDouble(i + 1) - exact.getDouble(i)) <= 1.0,
          s"percentile $i drifted: ${card.getDouble(i + 1)} vs ${exact.getDouble(i)}")
    } finally q.stop()

    // rank-error bound at a deliberately coarse accuracy: n/accuracy =
    // 500/50 = 10 ranks of slack, and the answer must respect it
    val input2 = MemoryStream[Doc]
    val out2 = java.nio.file.Files.createTempDirectory("sketch_out2").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("sketch_ckpt2").toString
    val q2 = DocumentStream.startStatsJob(
      input2.toDF().withColumn("grp", lit("all")), "grp", "text", out2,
      ckpt2, sketchAccuracy = 50)
    try {
      docs.grouped(200).foreach { b =>
        input2.addData(b: _*); q2.processAllAvailable()
      }
      val sorted = tokenCounts.sorted
      val p90 = spark.read.parquet(out2).select("p90_tokens")
        .head().getDouble(0)
      val lo = sorted.indexWhere(_ == p90.toInt)
      val hi = sorted.lastIndexWhere(_ == p90.toInt)
      val target = 0.9 * sorted.size
      val slack = sorted.size / 50 + 1
      assert(lo <= target + slack && hi >= target - slack,
        s"p90=$p90 occupies ranks [$lo,$hi], target $target ± $slack")
    } finally q2.stop()
  }

  test("classifier routing rejects streams that already carry its " +
      "output columns") {
    implicit val sqlCtx = spark.sqlContext
    val model = graft.operators.Classify.nbFit(
      Seq(("a", "x"), ("b", "y")).toDF("label", "text"),
      "label", "text", vocabSize = 10)
    val input = MemoryStream[Doc]
    val clashing = input.toDF().withColumn("score", lit(0.5))
    val e = intercept[IllegalArgumentException] {
      DocumentStream.startClassifierRoutingJob(clashing, "doc_id", "text",
        model,
        java.nio.file.Files.createTempDirectory("clash_out").toString,
        java.nio.file.Files.createTempDirectory("clash_ckpt").toString)
    }
    assert(e.getMessage.contains("score"))
  }

  test("classifier routing: frozen model scores every batch, output " +
      "partitioned by predicted label") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      ("spam", "buy pills now"), ("spam", "buy now buy"),
      ("ham", "meeting notes today"), ("ham", "notes for the meeting")
    ).toDF("label", "text")
    val model = graft.operators.Classify.nbFit(train, "label", "text",
      vocabSize = 100)
    val input = MemoryStream[Doc]
    val out = java.nio.file.Files.createTempDirectory("route_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("route_ckpt").toString
    val q = DocumentStream.startClassifierRoutingJob(input.toDF(),
      "doc_id", "text", model, out, ckpt)
    try {
      input.addData(Doc(1L, "buy pills", 10L), Doc(2L, "meeting notes", 20L))
      q.processAllAvailable()
      input.addData(Doc(3L, "buy buy now", 30L)) // model reused, batch 2
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "predicted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "spam", 2L -> "ham", 3L -> "spam"))
    // label directories exist → downstream per-label reads prune
    val dirs = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(dirs.contains("predicted=spam") && dirs.contains("predicted=ham"))
    // original columns survive alongside predicted/score/batch_seq
    val cols = spark.read.parquet(out).columns.toSet
    assert(Set("doc_id", "text", "event_ts", "predicted", "score",
      "batch_seq").subsetOf(cols))
  }

  test("logreg routing: model frozen once, batches score through the " +
      "native margin kernel, output partitioned by predicted") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{LogReg, Vectorize}
    // train the learned gate offline on a separable corpus
    val train = Seq(
      (0L, "buy cheap pills now", 1.0), (1L, "meeting notes today", 0.0),
      (2L, "cheap offer now buy", 1.0), (3L, "board meeting agenda", 0.0),
      (4L, "pills offer now", 1.0), (5L, "agenda notes review", 0.0)
    ).toDF("doc_id", "text", "y")
    val (feats0, idf) =
      Vectorize.tfidfSparseWithIdf(train, "doc_id", "text", dim = 64)
    val feats = feats0.localCheckpoint(true)
    val w = LogReg.fit(feats, train.select("doc_id", "y"),
      dim = 64, eta = 1.0, rounds = 10)
    val input = MemoryStream[Doc]
    val out = java.nio.file.Files.createTempDirectory("lr_route_out")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("lr_route_ckpt")
      .toString
    val q = DocumentStream.startLrRoutingJob(input.toDF(), "doc_id",
      "text", w, idf, out, ckpt)
    try {
      input.addData(Doc(10L, "buy pills now", 1L),
        Doc(11L, "notes for the meeting", 2L))
      q.processAllAvailable()
      input.addData(Doc(12L, "cheap pills offer", 3L)) // frozen reuse
      q.processAllAvailable()
    } finally q.stop()
    // the partition column is an EXPLICIT string label at the write
    // (the NB router's shape), so the store schema equals the batch
    // schema — no boolean-turned-string read-back surprise
    val stored = spark.read.parquet(out)
    assert(stored.schema("predicted").dataType ===
      org.apache.spark.sql.types.StringType)
    val got = stored.select("doc_id", "predicted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(10L -> "true", 11L -> "false", 12L -> "true"))
    // streamed scores == the batch frozen scorer == the join path
    val batchDocs = Seq((10L, "buy pills now"),
      (11L, "notes for the meeting"), (12L, "cheap pills offer"))
      .toDF("doc_id", "text")
    val viaBatch = LogReg.scoreFrozen(LogReg.freeze(w, idf),
        batchDocs, "text")
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val streamed = spark.read.parquet(out).select("doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === viaBatch)
    val dirs = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(dirs.contains("predicted=true") &&
      dirs.contains("predicted=false"))
    // reserved-column guard, same contract as the NB routing job —
    // driven through the frozen-model overload (the fitTextFrozen →
    // route path; the (weights, idf) face delegates to it)
    val clashing = input.toDF().withColumn("score", lit(0.5))
    val e = intercept[IllegalArgumentException] {
      DocumentStream.startLrRoutingJob(clashing, "doc_id", "text",
        LogReg.freeze(w, idf),
        java.nio.file.Files.createTempDirectory("lr_clash_o").toString,
        java.nio.file.Files.createTempDirectory("lr_clash_c").toString)
    }
    assert(e.getMessage.contains("score"))
  }

  test("top-tokens card: summaries merge across batches == one-shot " +
      "batch sketch, max_err certifies exactness") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamedDoc]
    val out = java.nio.file.Files.createTempDirectory("tt_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tt_ckpt").toString
    val withLang = input.toDF()
      .withColumn("lang", concat(lit("l"), col("doc_id") % 2))
    val q = DocumentStream.startTopTokensJob(withLang, "lang", "text",
      out, ckpt, k = 3, capacity = 64)
    val batch1 = Seq(Doc(0L, "the cat sat on the mat", 1L),
      Doc(1L, "le chat le chien le", 2L))
    val batch2 = Seq(Doc(2L, "the dog sat", 3L),
      Doc(3L, "chat chien  ", 4L))
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .orderBy("lang", "rk")
        .as[(String, String, Long, Long, Long)].collect().toSeq
      // the streamed card equals the one-shot batch sketch over the
      // union — the state IS the merged summary
      val oneShot = graft.operators.Profile.topTokensSketch(
          (batch1 ++ batch2).toDF()
            .withColumn("lang", concat(lit("l"), col("doc_id") % 2)),
          "lang", "text", k = 3, capacity = 64)
        .orderBy("lang", "rk")
        .as[(String, String, Long, Long, Long)].collect().toSeq
      assert(streamed === oneShot)
      assert(streamed.nonEmpty)
      assert(streamed.forall(_._4 == 0L), "exact regime certifies max_err 0")
      // 'the' counted across both batches for l0: 2 (batch1) + 1 (batch2)
      assert(streamed.find(r => r._1 == "l0" && r._2 == "the")
        .map(_._3) === Some(3L))
    } finally q.stop()
  }
}
