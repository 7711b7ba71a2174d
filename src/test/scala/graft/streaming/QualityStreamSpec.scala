package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Quality._

final case class Rec(id: Long, grp: String, v: Option[Double])

class QualityStreamSpec extends SparkSuite {
  import spark.implicits._

  test("routes clean rows to out, violators to quarantine with rule " +
      "names; per-batch verdicts stamped batch_seq") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Rec]
    val out = java.nio.file.Files.createTempDirectory("dq_out").toString
    val quar = java.nio.file.Files.createTempDirectory("dq_quar").toString
    val verd = java.nio.file.Files.createTempDirectory("dq_verd").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dq_ckpt").toString
    val rules = Seq(
      NotNull("v"),
      InRange("v", 0.0, 10.0),
      AcceptedValues("grp", Seq("a", "b")),
      Unique(Seq("id")))
    val q = QualityStream.startValidationJob(input.toDF(), rules,
      out, quar, verd, ckpt)
    try {
      input.addData(Rec(1, "a", Some(5.0)), Rec(2, "b", Some(50.0)),
        Rec(3, "zz", None))
      q.processAllAvailable()
      input.addData(Rec(4, "a", Some(1.0)), Rec(4, "a", Some(2.0)))
      q.processAllAvailable()

      val clean = spark.read.parquet(out)
        .select("id", "batch_seq").as[(Long, Long)].collect().sortBy(_._1)
      assert(clean.toSeq === Seq((1L, 0L), (4L, 1L), (4L, 1L)))

      val bad = spark.read.parquet(quar)
        .select(col("id"), array_sort(col("violations")).as("v"))
        .as[(Long, Seq[String])].collect().sortBy(_._1)
      assert(bad.toSeq === Seq(
        (2L, Seq("in_range(v,0.0,10.0)")),
        // null v violates NotNull but NOT the range rule; bad group too
        (3L, Seq("accepted_values(grp)", "not_null(v)"))))

      // verdicts: one row per rule per batch; batch 2's duplicate id
      // trips Unique at the relation level even though both rows route
      // clean (uniqueness is not a row property)
      val v = spark.read.parquet(verd)
        .select("batch_seq", "rule", "checked", "violations", "pass")
        .as[(Long, String, Long, Long, Boolean)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      assert(v.size === 8)
      assert(v.filter(_._1 == 0L).map(x => (x._2, x._4, x._5)) === Seq(
        ("accepted_values(grp)", 1L, false),
        ("in_range(v,0.0,10.0)", 1L, false),
        ("not_null(v)", 1L, false),
        ("unique(id)", 0L, true)))
      assert(v.filter(_._1 == 1L).map(x => (x._2, x._4, x._5)) === Seq(
        ("accepted_values(grp)", 0L, true),
        ("in_range(v,0.0,10.0)", 0L, true),
        ("not_null(v)", 0L, true),
        ("unique(id)", 1L, false)))
    } finally q.stop()
  }
}
