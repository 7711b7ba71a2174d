package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.EntityResolution

final case class DirtyRec(rec_id: Long, key: String)

class EntityResolutionStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streamed nearest-master matches the batch operator per batch; " +
      "unmatched keys survive with null master") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DirtyRec]
    val out = java.nio.file.Files.createTempDirectory("er_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("er_ckpt").toString
    val masters = Seq("alpha", "bravo", "charlie").toDF("mname")
    val q = EntityResolutionStream.startNearestMasterJob(
      input.toDF(), "key", masters, "mname", out, ckpt, k = 1)
    val b1 = Seq(DirtyRec(1L, "alpha"), DirtyRec(2L, "alphaa"),
      DirtyRec(3L, "zulu"))
    val b2 = Seq(DirtyRec(4L, "bravq"), DirtyRec(5L, "charli"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("rec_id", "key", "master_name", "dist", "batch_seq")
        .as[(Long, String, Option[String], Option[Long], Long)]
        .collect().sortBy(_._1)
      val expected = EntityResolution.nearestMaster(
          (b1 ++ b2).toDF(), "key", masters, "mname", k = 1)
        .select("rec_id", "key", "master_name", "dist")
        .as[(Long, String, Option[String], Option[Long])]
        .collect().sortBy(_._1)
      assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq === expected.toSeq)
      // exact hit, fuzzy hit, and a miss all present
      assert(got.find(_._1 == 1L).get._3 === Some("alpha"))
      assert(got.find(_._1 == 1L).get._4 === Some(0L))
      assert(got.find(_._1 == 2L).get._3 === Some("alpha"))
      assert(got.find(_._1 == 2L).get._4 === Some(1L))
      assert(got.find(_._1 == 3L).get._3 === None)
      // batches stamped for the replay LWW contract
      assert(got.filter(_._1 <= 3L).forall(_._5 == 0L))
      assert(got.filter(_._1 >= 4L).forall(_._5 == 1L))
    } finally q.stop()
  }
}
