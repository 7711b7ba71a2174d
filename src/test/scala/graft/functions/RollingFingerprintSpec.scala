package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class RollingFingerprintSpec extends SparkSuite {
  import spark.implicits._

  private def naive(s: String, w: Int): Long = {
    val b = s.getBytes("UTF-8")
    val win = math.min(w, b.length)
    if (b.length == 0) 0L
    else b.sliding(win).map(_.foldLeft(0L)((h, x) => h * 1000003L + (x & 0xff))).min
  }

  test("matches a naive per-window recomputation") {
    val samples = Seq("hello world, rolling hashes", "a", "", "ababababab",
      "the quick brown fox jumps over the lazy dog")
    samples.filter(_.nonEmpty).foreach { s =>
      assert(RollingFingerprint.minRollingHash(s.getBytes("UTF-8"), 8) ===
        naive(s, 8), s)
    }
  }

  test("as a column over a DataFrame, inside codegen") {
    val df = spark.range(50)
      .select(concat(lit("document body number "), col("id"),
        lit(" with some shared tail text")).as("text"))
      .select(col("text"),
        RollingFingerprint.graft_fingerprint(col("text"), 8).as("fp"))
    val rows = df.collect()
    assert(rows.length === 50)
    // deterministic: recompute equals
    rows.foreach { r =>
      assert(r.getLong(1) === naive(r.getString(0), 8))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(1500))
  }

  test("identical documents share a fingerprint; disjoint content differs") {
    val a = RollingFingerprint.minRollingHash("same same text body".getBytes, 6)
    val b = RollingFingerprint.minRollingHash("same same text body".getBytes, 6)
    val c = RollingFingerprint.minRollingHash("entirely other words".getBytes, 6)
    assert(a === b)
    assert(a !== c)
    // tail-only edits may keep the fingerprint (the min window can sit in
    // the shared prefix) — that locality is the point of winnowing-style
    // fingerprints, so no assertion on near-identical texts
  }
}
