package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Retention
import graft.operators.{Layout, Retrieval, Similarity}
import graft.streaming.ScdStream

/** The repo-wide compaction guard: ONE two-flag mechanism
  * ([[Compaction]]), and a concurrent-case proof per compactable
  * store — an append during compaction (or a compaction during an
  * append) throws [[ConcurrentCompactionException]] instead of
  * silently losing the batch to a slice's read-then-overwrite. */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  // ---- the mechanism ---------------------------------------------------

  test("append during compaction throws; markers clean up after") {
    val dir = tmp("guard")
    Compaction.guardedCompaction(spark, dir) {
      val e = intercept[ConcurrentCompactionException] {
        Compaction.guardedAppend(spark, dir) { fail("write must not run") }
      }
      assert(e.getMessage.contains("_COMPACTING"))
    }
    // both flags released: the next append and compaction run clean
    assert(Compaction.guardedAppend(spark, dir) { 42 } === 42)
    assert(Compaction.guardedCompaction(spark, dir) { 43 } === 43)
    assert(new java.io.File(dir).listFiles().forall(f =>
      !f.getName.startsWith("_COMPACTING") &&
        !f.getName.startsWith("_APPENDING")))
  }

  test("compaction during an in-flight append throws") {
    val dir = tmp("guard2")
    Compaction.guardedAppend(spark, dir) {
      val e = intercept[ConcurrentCompactionException] {
        Compaction.guardedCompaction(spark, dir) { fail("must not run") }
      }
      assert(e.getMessage.contains("append in flight"))
    }
    // the refused compaction released its own flag on the way out
    assert(Compaction.guardedCompaction(spark, dir) { 1 } === 1)
  }

  test("two compactions of one dir exclude each other") {
    val dir = tmp("guard3")
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        Compaction.guardedCompaction(spark, dir) { fail("must not run") }
      }
    }
  }

  test("compactor arbiter is atomic on local disks: exactly one winner " +
      "under simultaneous attempts (O_EXCL, not check-then-create)") {
    val dir = tmp("guard_race")
    val n = 8
    val attempted = new java.util.concurrent.CountDownLatch(n)
    val start = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val refusals = new java.util.concurrent.atomic.AtomicInteger
    // every thread races the SAME marker create; the winner holds the
    // guard until all n have attempted, so no loser can sneak a
    // second sequential win — with a check-then-create arbiter this
    // setup could admit two winners
    val threads = (1 to n).map { _ =>
      new Thread(() => {
        start.await()
        try Compaction.guardedCompaction(spark, dir) {
          attempted.countDown()
          attempted.await(20, java.util.concurrent.TimeUnit.SECONDS)
          wins.incrementAndGet()
          ()
        }
        catch {
          case _: ConcurrentCompactionException =>
            attempted.countDown()
            refusals.incrementAndGet()
            ()
        }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(30000))
    assert(wins.get === 1)
    assert(refusals.get === n - 1)
    // the winner dropped the marker on exit — the dir is clean
    assert(Compaction.inspectMarkers(spark, dir).isEmpty)
  }

  test("crashed holder's stale marker fails loudly; clearMarkers recovers") {
    val dir = tmp("guard4")
    // a crashed appender: marker left behind, no process holds it
    java.nio.file.Files.createFile(java.nio.file.Paths.get(dir,
      Compaction.AppendingPrefix + "deadbeef"))
    intercept[ConcurrentCompactionException] {
      Compaction.guardedCompaction(spark, dir) { fail("must not run") }
    }
    // stale _APPENDING blocks compaction only, never other appends
    assert(Compaction.guardedAppend(spark, dir) { 7 } === 7)
    val cleared = Compaction.clearMarkers(spark, dir)
    assert(cleared.size === 1)
    assert(Compaction.guardedCompaction(spark, dir) { 8 } === 8)
  }

  test("markers carry provenance and inspectMarkers reports it") {
    val dir = tmp("guard5")
    val self = ProcessHandle.current().pid()
    // a LIVE compaction's marker reports this process
    Compaction.guardedCompaction(spark, dir) {
      val ms = Compaction.inspectMarkers(spark, dir)
      assert(ms.size === 1)
      assert(ms.head.kind === Compaction.CompactingMarker)
      assert(ms.head.pid === self)
      assert(ms.head.startedMs > 0)
      assert(ms.head.host.nonEmpty && ms.head.host != "unknown")
    }
    Compaction.guardedAppend(spark, dir) {
      val ms = Compaction.inspectMarkers(spark, dir)
      assert(ms.size === 1)
      assert(ms.head.kind === "_APPENDING")
      assert(ms.head.pid === self)
    }
    assert(Compaction.inspectMarkers(spark, dir).isEmpty)
    // a legacy/empty marker (crashed writer, pre-provenance file)
    // reports unknown provenance rather than failing the inspection
    java.nio.file.Files.createFile(java.nio.file.Paths.get(dir,
      Compaction.AppendingPrefix + "legacy"))
    val stale = Compaction.inspectMarkers(spark, dir)
    assert(stale.size === 1)
    assert(stale.head.host === "unknown" && stale.head.pid === -1L)
    // inspection is read-only; clearMarkers still does the removal
    assert(Compaction.clearMarkers(spark, dir).size === 1)
    assert(Compaction.inspectMarkers(spark, dir).isEmpty)
  }

  test("guardedMutation resolves the active session's Hadoop conf") {
    // the session conf carries deployment overrides (spark.hadoop.*,
    // object-store credentials); a guard resolving a bare default conf
    // could land its marker on a DIFFERENT filesystem than the
    // compactor's and silently void the exclusion (ADVICE r10)
    spark.sparkContext.hadoopConfiguration.set("graft.test.probe", "42")
    try {
      assert(SparkSession.getActiveSession.nonEmpty)
      assert(Compaction.resolvedConf(null).get("graft.test.probe") === "42")
      // an explicit conf wins over the session's
      val mine = new org.apache.hadoop.conf.Configuration()
      mine.set("graft.test.probe", "7")
      assert(Compaction.resolvedConf(mine).get("graft.test.probe") === "7")
    } finally
      spark.sparkContext.hadoopConfiguration.unset("graft.test.probe")
    // and the guard built on it still excludes: mutation vs compaction
    val dir = tmp("guard6")
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        Compaction.guardedMutation(dir) { fail("must not run") }
      }
    }
    assert(Compaction.guardedMutation(dir) { 9 } === 9)
  }

  // ---- one concurrent-case proof per compactable store ------------------

  private def docs = Seq(
    (1L, "alpha beta gamma"), (2L, "beta gamma delta"),
    (3L, "gamma delta epsilon")).toDF("doc_id", "text")

  test("text index: append during compaction fails fast") {
    val dir = tmp("ti_guard")
    Retrieval.buildTextIndex(docs, "doc_id", "text", dir)
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        Retrieval.appendToTextIndex(
          Seq((4L, "delta epsilon zeta")).toDF("doc_id", "text"),
          "doc_id", "text", dir)
      }
    }
    // and the real compactor holds the same guard: a stale appender
    // marker refuses compactTextIndex until cleared
    java.nio.file.Files.createFile(java.nio.file.Paths.get(dir,
      Compaction.AppendingPrefix + "crashed"))
    intercept[ConcurrentCompactionException] {
      Retrieval.compactTextIndex(spark, dir)
    }
    Compaction.clearMarkers(spark, dir)
    Retrieval.compactTextIndex(spark, dir) // recovers
  }

  private def vecs(ids: Long*) = ids.map(i =>
    (i, Array(i.toFloat, (i % 3).toFloat))).toDF("vec_id", "embedding")

  test("IVF index: append during compaction fails fast") {
    val dir = tmp("ivf_guard")
    Similarity.buildIvfIndex(vecs(1L, 2L, 3L, 4L), "vec_id", "embedding",
      dir, k = 2, iters = 1)
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        Similarity.appendToIvfIndex(vecs(5L), "vec_id", "embedding", dir)
      }
    }
    Similarity.compactIvfIndex(spark, dir) // guard released → runs clean
  }

  test("IVF-PQ index: append and rebuild hold the guard too") {
    import graft.operators.ProductQuantization
    val dir = tmp("ivfpq_guard")
    val c = (0 until 16).map(i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + 3 * d) % 11).toFloat - 5)))
      .toDF("vec_id", "embedding")
    def build(): Unit = ProductQuantization.buildIvfPqIndex(c, "vec_id",
      "embedding", dir, kCells = 2, coarseIters = 1, m = 2, ksub = 4,
      pqIters = 1)
    build()
    // append refuses while a compaction/rebuild holds the flag — the
    // PQ twin of the float index's silent-drop race
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        ProductQuantization.appendToIvfPqIndex(
          c.filter(col("vec_id") < 2), "vec_id", "embedding", dir)
      }
    }
    // and a rebuild refuses over an in-flight append
    Compaction.guardedAppend(spark, dir) {
      intercept[ConcurrentCompactionException] { build() }
    }
    // both released: the append runs clean
    ProductQuantization.appendToIvfPqIndex(
      c.filter(col("vec_id") < 2), "vec_id", "embedding", dir)
  }

  test("points store: write during compaction fails fast") {
    val dir = tmp("pts_guard")
    val stage = Retention.fromString("60*60s:24*3600s").stage0
    val pts = Seq(("m1", 60L, 1.0, 1.0, 0))
      .toDF("metric_id", "ts", "value", "count", "replica")
    PointsStore.write(pts, dir, stage, writeSalt = 1)
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        PointsStore.write(pts, dir, stage, writeSalt = 1)
      }
    }
    PointsStore.compactStageSlices(spark, dir, stage)
    assert(PointsStore.read(spark, dir, stage, 0L, 3600L).count() === 1)
  }

  test("z-order layout: append during compaction fails fast") {
    val dir = tmp("zo_guard")
    val df = (1 to 40).map(i => (i.toLong, (i * 7 % 40).toLong))
      .toDF("a", "b")
    Layout.zorderWrite(df, Seq("a", "b"), dir, nFiles = 2, bits = 2)
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        Layout.zorderAppend(df, dir)
      }
    }
    Layout.zorderAppend(df, dir) // guard released
    Layout.compactLayout(spark, dir)
    assert(spark.read.parquet(dir).count() === 80)
  }

  test("points store: TTL expiry during compaction fails fast") {
    val dir = tmp("ttl_guard")
    val stage = Retention.fromString("60*60s:24*3600s").stage0
    val pts = Seq(("m1", 60L, 1.0, 1.0, 0))
      .toDF("metric_id", "ts", "value", "count", "replica")
    PointsStore.write(pts, dir, stage, writeSalt = 1)
    // unguarded, a TTL sweep landing between a compaction slice's stage
    // and its overwrite would have its deleted buckets resurrected by
    // the rewrite — the guard makes the race loud instead
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        PointsStore.dropExpiredBuckets(dir, nowS = 1000000000L)
      }
    }
    // guard released → the sweep runs; everything is long expired
    assert(PointsStore.dropExpiredBuckets(dir, 1000000000L).nonEmpty)
    // a missing store stays a no-op (and must not create the directory)
    val ghost = s"$dir/never_written"
    assert(PointsStore.dropExpiredBuckets(ghost, 1000000000L).isEmpty)
    assert(!new java.io.File(ghost).exists())
  }

  test("SCD changelog: append during compactLog fails fast") {
    val dir = tmp("scd_guard")
    val log = Seq((1L, 10L, 1L, "a", 0), (1L, 20L, 2L, "b", 0))
      .toDF("k", "ts", "seq", "attr", "__kb")
    ScdStream.appendLog(log, dir)
    Compaction.guardedCompaction(spark, dir) {
      intercept[ConcurrentCompactionException] {
        ScdStream.appendLog(log, dir)
      }
    }
    ScdStream.appendLog(log, dir) // replay lands once the guard releases
    ScdStream.compactLog(spark, dir)
    // the duplicated append folds back to the distinct rows
    assert(spark.read.parquet(dir).count() === 2)
  }
}
