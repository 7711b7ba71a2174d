package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** ClustersDiff must reproduce the reference's gap and percentile
  * conventions bit-for-bit (cli/clusters_diff.py:156-163, 513-529). */
class ClustersDiffSpec extends SparkSuite {
  import spark.implicits._

  test("relative gap: equal→0, both-absent→0, one-side→1, else |a−b|/(|a|+|b|)") {
    val a = Seq(("m", 0L, Some(2.0)), ("m", 60L, Some(6.0)),
      ("m", 120L, None: Option[Double]), ("m", 180L, Some(1.0)))
      .toDF("name", "ts", "value")
    val b = Seq(("m", 0L, Some(2.0)), ("m", 60L, Some(2.0)),
      ("m", 120L, None: Option[Double]), ("m", 240L, Some(5.0)))
      .toDF("name", "ts", "value")
    // slots: 0 equal→0; 60 → |6−2|/(6+2)=0.5; 120 both-null→0;
    // 180 one-side→1; 240 one-side→1  ⇒ mean = 2.5/5 = 0.5
    val d = ClustersDiff.dissymmetries(a, b).collect()
    assert(d.length === 1)
    assert(d.head.getDouble(1) === 0.5)
  }

  test("diff plan reuses the persisted fetch: one store scan per host") {
    import graft.cli.Bgutil
    import graft.cli.Bgutil.Db
    def mkDb(v: Double): Db = {
      val db = Db(spark,
        java.nio.file.Files.createTempDirectory("cdiff").toString)
      Bgutil.syncdb(db)
      Bgutil.write(db, "sys.cpu.load", 120L, v, "60*60s:24*3600s", "average")
      db
    }
    val (dbA, dbB) = (mkDb(1.0), mkDb(3.0))
    // exactly what clustersDiff's timedFetch does: persist + count so
    // the timing measurement IS the one store read
    val a = Bgutil.read(dbA, "sys.*.load", 120L, 240L).persist()
    val b = Bgutil.read(dbB, "sys.*.load", 120L, 240L).persist()
    try {
      a.count(); b.count()
      val diff = ClustersDiff.dissymmetries(a, b)
      // the dissymmetry plan must run from the cached fetches — EVERY
      // leaf is the in-memory relation, no second scan of either store
      // (plan-node check, not string: the cached relation's printout
      // embeds its original scan, which never re-executes)
      val leaves = diff.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]),
        s"non-cached leaf in:\n${diff.queryExecution.optimizedPlan}")
      assert(diff.collect().length === 1)
    } finally { a.unpersist(); b.unpersist() }
  }

  test("reference percentiles: sorted[int(i/100·n)], no interpolation") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.toDF("v")
    val row = ClustersDiff.referencePctls(df, col("v")).collect().head
    // rank int(i/100·100) is 0-based: p50→idx 50→51.0, p75→76, p90→91,
    // p99→idx 99→100.0, p99.9→idx 99→100.0
    assert(row.getAs[Double]("p50") === 51.0)
    assert(row.getAs[Double]("p75") === 76.0)
    assert(row.getAs[Double]("p90") === 91.0)
    assert(row.getAs[Double]("p99") === 100.0)
    assert(row.getAs[Double]("p999") === 100.0)
    assert(row.getAs[Long]("n") === 100L)

    // same formula driver-side for the timing report
    val t = ClustersDiff.timingPctls(vals)
    assert(t.toMap === Map(50.0 -> 51.0, 75.0 -> 76.0, 90.0 -> 91.0,
      99.0 -> 100.0, 99.9 -> 100.0))
  }
}
