package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.cli.Bgutil
import graft.model.{Aggregator, MetricMetadata, Retention}

/** The carbon plaintext daemon over a REAL TCP socket: lines sent to
  * the listener land in the spool as atomically-renamed batches, the
  * streaming ingest job downsample/auto-creates from them, and bgutil
  * reads the result — the full :2003 lifecycle. */
class CarbonListenerSpec extends SparkSuite {

  private def send(port: Int, lines: Seq[String]): Unit = {
    val sock = new java.net.Socket("localhost", port)
    try {
      val out = sock.getOutputStream
      out.write((lines.mkString("\n") + "\n").getBytes(UTF_8))
      out.flush()
    } finally sock.close()
  }

  test("socket → spool → streaming ingest → bgutil read") {
    val dbDir = java.nio.file.Files.createTempDirectory("carbon_sock").toString
    val ckpt = java.nio.file.Files.createTempDirectory("carbon_ckpt").toString
    val db = Bgutil.Db(spark, dbDir)
    Bgutil.syncdb(db)

    val spool = s"$dbDir/carbon_spool"
    val listener = new CarbonListener.Listener(0, spool).start()
    try {
      send(listener.localPort, Seq(
        "sys.cpu.0.load 1.0 60",
        "sys.cpu.0.load 3.0 120",
        "garbage that is not a point",
        "sys.cpu.1.load 5.0 60"))
      // a second connection exercises a second spool batch
      send(listener.localPort, Seq("sys.cpu.1.load 7.0 120"))

      // the flush happens on disconnect; wait for both batch files
      val dir = new java.io.File(spool)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (dir.listFiles((_, n) => n.startsWith("batch-")).length < 2 &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(dir.listFiles((_, n) => n.startsWith("batch-")).length === 2,
        "spool batches not flushed")
      assert(dir.listFiles((_, n) => n.endsWith(".tmp")).isEmpty)

      val meta = MetricMetadata(Aggregator.Average,
        Retention.fromString("60*60s:24*3600s"))
      val q = CarbonListener.ingestFromSpool(spark, spool, db.pointsPath,
          ckpt, _ => meta, autoCreate = Some(db.catalogStore))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      assert(Bgutil.list(db, "sys.cpu.*.load").collect()
        .map(_.getString(0)).toSeq
        === Seq("sys.cpu.0.load", "sys.cpu.1.load"))
      val series = Bgutil.read(db, "sys.cpu.*.load", 60L, 180L)
        .filter(col("value").isNotNull)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(series === Set(
        ("sys.cpu.0.load", 60L, 1.0), ("sys.cpu.0.load", 120L, 3.0),
        ("sys.cpu.1.load", 60L, 5.0), ("sys.cpu.1.load", 120L, 7.0)))
    } finally listener.stop()
  }
}
