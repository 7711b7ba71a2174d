package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSuite {
  import spark.implicits._

  // (key, ts, seq, attr) — includes same-(key,ts) LWW collisions,
  // no-op updates to compress, a null attribute, a single-row key
  private val changelog = Seq(
    ("u1", 10L, 1L, "a"), ("u1", 10L, 2L, "b"), // LWW: seq 2 wins -> b
    ("u1", 20L, 3L, "b"),                       // no-op, compressed
    ("u1", 30L, 4L, "c"),
    ("u1", 40L, 5L, null.asInstanceOf[String]), // null attr is a change
    ("u1", 50L, 6L, null.asInstanceOf[String]), // null == null: no-op
    ("u1", 60L, 7L, "c"),
    ("u2", 15L, 8L, "x"),
    ("u3", 5L, 9L, "z"), ("u3", 25L, 10L, "y")
  ).toDF("k", "ts", "seq", "attr")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Scd.scd2(df, Seq("k"), "ts", "seq", Seq("attr"))
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .as[(String, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("scd2: LWW, no-op compression, null attrs, interval chain") {
    assert(run(changelog) === Seq(
      ("u1", Some("b"), 10L, Some(30L), false),
      ("u1", Some("c"), 30L, Some(40L), false),
      ("u1", None, 40L, Some(60L), false),
      ("u1", Some("c"), 60L, None, true),
      ("u2", Some("x"), 15L, None, true),
      ("u3", Some("z"), 5L, Some(25L), false),
      ("u3", Some("y"), 25L, None, true)))
  }

  test("scd2 is partition-count invariant and intervals tile per key") {
    assert(run(changelog.repartition(1)) === run(changelog.repartition(8)))
    val rows = run(changelog)
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val sorted = ivs.sortBy(_._3)
      // exactly one current interval per key, and it is the last
      assert(sorted.count(_._5) === 1, k)
      assert(sorted.last._5, k)
      // valid_to chains to the next valid_from: no gaps, no overlaps
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 === Some(b._3), k)
        case _ =>
      }
      assert(sorted.last._4.isEmpty, k)
    }
  }

  test("scd2 windows are key-partitioned and the LWW agg has a partial") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = Scd.scd2(changelog, Seq("k"), "ts", "seq", Seq("attr"))
      .queryExecution.executedPlan
    val p = plan.toString
    assert(p.contains("partial_max"), s"LWW has no map-side partial:\n$p")
    def windows(pl: SparkPlan): Seq[WindowExec] = pl match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val ws = windows(plan)
    assert(ws.size === 2, s"lag+lead should be two window nodes:\n$p")
    // never an unpartitioned (single-funnel) window
    assert(ws.forall(_.partitionSpec.nonEmpty), s"unpartitioned window:\n$p")
    // exactly two exchanges: the (key, ts) LWW exchange carrying
    // map-side-combined rows, and the key exchange BOTH windows share
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 2, s"expected the two bounded exchanges:\n$p")
  }

  test("snapshotDiff: insert/delete/update ops, null-safe attr compare, " +
      "unchanged dropped, shared-lineage sides") {
    val oldS = Seq(("k1", Some("a")), ("k2", Some("b")), ("k3", None),
      ("k4", Some("d")), ("k5", None)).toDF("k", "attr")
    val newS = Seq(("k1", Some("a")), // unchanged -> dropped
      ("k2", Some("B")),              // update
      ("k3", Some("c")),              // null -> value: update
      ("k5", None),                   // null -> null: unchanged
      ("k6", Some("f"))               // insert
    ).toDF("k", "attr")                // k4 deleted
    val got = Scd.snapshotDiff(oldS, newS, Seq("k"), Seq("attr"))
      .select("k", "op", "old_attr", "new_attr")
      .as[(String, String, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("k2", "update", Some("b"), Some("B")),
      ("k3", "update", None, Some("c")),
      ("k4", "delete", Some("d"), None),
      ("k6", "insert", None, Some("f"))))

    // two snapshots OF THE SAME FRAME (the cd3 shape): ambiguous
    // column resolution must not silently join a side to itself
    val base = Seq(("k1", 1L, "a"), ("k1", 2L, "b"), ("k2", 1L, "x"))
      .toDF("k", "v", "attr")
    val d = Scd.snapshotDiff(
      base.filter(col("v") === 1L).select("k", "attr"),
      base.filter(col("v") === 2L).select("k", "attr"),
      Seq("k"), Seq("attr"))
      .select("k", "op").as[(String, String)].collect().sortBy(_._1).toSeq
    assert(d === Seq(("k1", "update"), ("k2", "delete")))
  }

  test("snapshotAt returns each live key's state at the instant") {
    val scd = Scd.scd2(changelog, Seq("k"), "ts", "seq", Seq("attr"))
    val got = Scd.snapshotAt(scd, lit(35L))
      .select("k", "attr").as[(String, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(("u1", Some("c")), ("u2", Some("x")),
      ("u3", Some("y"))))
    // before a key exists, it is absent
    val early = Scd.snapshotAt(scd, lit(7L))
      .select("k").as[String].collect().toSeq
    assert(early === Seq("u3"))
  }
}
