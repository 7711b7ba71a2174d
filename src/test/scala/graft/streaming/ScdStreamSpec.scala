package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Scd

final case class Change(key: String, ts: Long, seq: Long, attr: String)

class ScdStreamSpec extends SparkSuite {
  import spark.implicits._

  private val NB = 4

  private def scdContent(dir: String) =
    spark.read.parquet(dir)
      .select("key", "attr", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  private def parquetFiles(dir: String): Map[String, Long] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap

  test("streamed SCD2 == one-shot batch; only touched buckets rewrite; " +
      "replayed appends are absorbed; compactLog dedupes the raw log") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val logDir = Files.createTempDirectory("scd_log").toString
    val scdDir = Files.createTempDirectory("scd_tbl").toString
    val ckpt = Files.createTempDirectory("scd_ckpt").toString
    val q = ScdStream.startScd2Job(input.toDF(), "key", "ts", "seq",
      Seq("attr"), logDir, scdDir, ckpt, nBuckets = NB)
    val b1 = Seq(Change("u1", 10, 1, "a"), Change("u1", 20, 2, "b"),
      Change("u2", 15, 3, "x"), Change("u3", 5, 4, "z"),
      Change("u4", 8, 5, "m"))
    // batch 2 touches ONLY u1
    val b2 = Seq(Change("u1", 30, 6, "c"), Change("u1", 40, 7, "c"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val afterB1 = parquetFiles(scdDir)
      input.addData(b2: _*); q.processAllAvailable()

      // equivalence with the one-shot batch build
      val expected = Scd.scd2((b1 ++ b2).toDF(), Seq("key"), "ts", "seq",
          Seq("attr"))
        .select("key", "attr", "valid_from", "valid_to", "is_current")
        .as[(String, String, Long, Option[Long], Boolean)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
      assert(scdContent(scdDir) === expected)

      // bucket-bounded rewrite: u1's bucket changed, every file in a
      // bucket batch 2 did not touch is byte-for-byte the batch-1 file
      val u1b = Seq("u1").toDF("key")
        .select(pmod(xxhash64(col("key")), lit(NB)).cast("int"))
        .as[Int].head()
      val untouchedBefore = afterB1.filter(!_._1.contains(s"__kb=$u1b"))
      assert(untouchedBefore.nonEmpty, "test needs an untouched bucket")
      val now = parquetFiles(scdDir)
      untouchedBefore.foreach { case (f, t) =>
        assert(now.get(f) === Some(t), s"untouched bucket rewritten: $f")
      }
      assert(afterB1.keys.filter(_.contains(s"__kb=$u1b"))
        .exists(f => !now.contains(f) || now(f) != afterB1(f)),
        "touched bucket was not rewritten")

      // crash-replay: re-append batch 2's raw rows (what a replayed
      // foreachBatch does), rebuild the touched bucket — intervals
      // identical, because scd2's LWW absorbs exact duplicates
      val logN = spark.read.parquet(logDir).count()
      b2.toDF()
        .withColumn("__kb", pmod(xxhash64(col("key")), lit(NB)).cast("int"))
        .withColumn("batch_seq", lit(1L))
        .write.partitionBy("__kb").mode("append").parquet(logDir)
      ScdStream.rebuildBuckets(spark, logDir, scdDir, Seq(u1b),
        "key", "ts", "seq", Seq("attr"), NB)
      assert(scdContent(scdDir) === expected)

      // compactLog drops the replay duplicates, content invariant
      ScdStream.compactLog(spark, logDir)
      assert(spark.read.parquet(logDir).count() === logN)
      assert(spark.read.parquet(logDir).dropDuplicates().count() === logN)
      ScdStream.rebuildBuckets(spark, logDir, scdDir, Seq(u1b),
        "key", "ts", "seq", Seq("attr"), NB)
      assert(scdContent(scdDir) === expected)
    } finally q.stop()
  }
}
