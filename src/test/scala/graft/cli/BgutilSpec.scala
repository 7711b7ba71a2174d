package graft.cli

import graft.SparkSuite
import graft.cli.Bgutil.Db

/** End-to-end CLI flow: syncdb → write → list/read/du/stats →
  * copy/delete/clean (cli/commands.py:38-54 surface). */
class BgutilSpec extends SparkSuite {

  test("write → list → read → maintenance round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("bgutil").toString
    val db = Db(spark, dir)
    Bgutil.syncdb(db)

    // write three points for two metrics (retention 60*60s:24*3600s)
    Bgutil.write(db, "sys.cpu.0.load", 120L, 1.0, "60*60s:24*3600s", "average")
    Bgutil.write(db, "sys.cpu.0.load", 180L, 3.0, "60*60s:24*3600s", "average")
    Bgutil.write(db, "sys.mem.0.used", 120L, 7.0, "60*60s:24*3600s", "total")

    assert(Bgutil.list(db, "sys.*.0.*").collect().map(_.getString(0)).toSeq ===
      Seq("sys.cpu.0.load", "sys.mem.0.used"))

    val series = Bgutil.read(db, "sys.cpu.*.load", 120L, 240L)
      .orderBy("ts").collect()
    assert(series.length === 2)
    assert(series.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((120L, 1.0), (180L, 3.0)))

    assert(Bgutil.du(db).count() === 2)
    val st = Bgutil.stats(db).collect().map(r =>
      (r.getString(0), r.getLong(1))).toMap
    assert(st("sys") === 2)

    assert(Bgutil.repair(db).count() === 0)

    Bgutil.copy(db, "sys.cpu.0.load", "copy.")
    assert(Bgutil.repair(db).count() === 1) // copied ids have no catalog row

    Bgutil.delete(db, "sys.mem.**")
    assert(Bgutil.list(db, "sys.**").collect().map(_.getString(0)).toSeq ===
      Seq("sys.cpu.0.load"))

    // clean with a tight max age drops everything older
    Bgutil.clean(db, nowS = 10000L, maxAgeS = 100L)
    assert(db.catalog.count() === 0)
  }
}
