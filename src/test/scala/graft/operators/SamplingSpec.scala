package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Content-addressed sampling invariants: caps, determinism under
  * re-partitioning, and shuffle/shard stability. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def docs: DataFrame =
    (0L until 200L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")

  test("capPerStratum keeps at most cap rows per stratum") {
    val kept = Sampling.capPerStratum(docs, col("doc_id"), col("source"), 7)
    val sizes = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 7L))
    assert(kept.count() === 28)
  }

  test("capPerStratum under-cap strata keep every row") {
    val small = docs.filter(col("doc_id") < 10)
    val kept = Sampling.capPerStratum(small, col("doc_id"), col("source"), 7)
    assert(kept.count() === 10)
  }

  test("capPerStratum selection is a property of the data, not partitioning") {
    def ids(df: DataFrame): Set[Long] =
      Sampling.capPerStratum(df, col("doc_id"), col("source"), 5)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(docs.repartition(13)) === ids(docs.repartition(1)))
  }

  test("capPerStratumIds equals capPerStratum's key set") {
    val a = Sampling.capPerStratum(docs, col("doc_id"), col("source"), 5)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.capPerStratumIds(docs, col("doc_id"), col("source"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("shuffleShard: shards in range, deterministic, seed-sensitive") {
    val s1 = Sampling.shuffleShard(docs, col("doc_id"), "epoch0", 8)
    val shards = s1.select("shard").distinct().as[Int].collect().toSet
    assert(shards.subsetOf((0 until 8).toSet))
    assert(shards.size > 1) // 200 keys spread over >1 shard

    val k1 = s1.select("doc_id", "shuffle_key").as[(Long, String)].collect().toMap
    val k2 = Sampling.shuffleShard(docs.repartition(17), col("doc_id"), "epoch0", 8)
      .select("doc_id", "shuffle_key").as[(Long, String)].collect().toMap
    assert(k1 === k2)

    val other = Sampling.shuffleShard(docs, col("doc_id"), "epoch1", 8)
      .select("doc_id", "shuffle_key").as[(Long, String)].collect().toMap
    assert(k1 !== other) // different seed, different order
  }

  test("shuffleShard order is a global sort on shuffle_key (range shuffle)") {
    val plan = Sampling.shuffleShard(docs, col("doc_id"), "epoch0", 8)
      .orderBy("shuffle_key")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
