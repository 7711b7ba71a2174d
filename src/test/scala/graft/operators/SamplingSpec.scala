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

  test("shuffleShard is balanced for shard counts that don't divide 16") {
    val many = (0L until 3000L).map(i => (i, "x")).toDF("doc_id", "source")
    for (nShards <- Seq(3, 7, 20)) {
      val counts = Sampling.shuffleShard(many, col("doc_id"), "bal", nShards)
        .groupBy("shard").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(counts.keySet === (0 until nShards).toSet)
      val expect = 3000.0 / nShards
      // 8 digest nibbles mod nShards: deviation is binomial noise
      // (tolerate 4σ per shard), not the ~12% STRUCTURAL skew a
      // single-nibble bucket had whenever nShards didn't divide 16
      val sigma = math.sqrt(3000.0 * (1.0 / nShards) * (1 - 1.0 / nShards))
      counts.values.foreach { c =>
        assert(math.abs(c - expect) < 4 * sigma,
          s"nShards=$nShards counts=$counts")
      }
    }
  }

  test("shuffleShard order is a global sort on shuffle_key (range shuffle)") {
    val plan = Sampling.shuffleShard(docs, col("doc_id"), "epoch0", 8)
      .orderBy("shuffle_key")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("mixtureSample: rates follow budget·frac/tokens, capped at 1, " +
      "absent strata dropped") {
    val withTok = docs.withColumn("n_tok", lit(10L)) // 50 docs/src → 500 tok
    val out = Sampling.mixtureSample(withTok, col("doc_id"), col("source"),
      col("n_tok"),
      Map("src0" -> 0.8, "src1" -> 0.2), tokenBudget = 1000L)
    val rates = out.select("source", "keep_rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // src0: 1000·0.8/500 = 1.6 → capped 1; src1: 200/500 = 0.4
    assert(rates("src0") === 1.0)
    assert(math.abs(rates("src1") - 0.4) < 1e-12)
    assert(!rates.contains("src2") && !rates.contains("src3"))
    // capped stratum keeps every row; sampled stratum keeps a plausible
    // binomial share of its 50
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === 50L)
    assert(bySrc("src1") > 5L && bySrc("src1") < 40L)
    // deterministic under re-partitioning
    val again = Sampling.mixtureSample(withTok.repartition(7),
      col("doc_id"), col("source"), col("n_tok"),
      Map("src0" -> 0.8, "src1" -> 0.2), tokenBudget = 1000L)
    assert(again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperatureMixture: T=1 is natural sampling (≡ mixtureSample " +
      "with proportional fractions); higher T up-weights small strata") {
    // skewed strata: src0 has 4× the tokens of src1
    val withTok = docs.filter(col("source").isin("src0", "src1"))
      .withColumn("n_tok",
        when(col("source") === "src0", lit(40L)).otherwise(lit(10L)))
    val t1 = Sampling.temperatureMixture(withTok, col("doc_id"),
      col("source"), col("n_tok"), temperature = 1.0, tokenBudget = 500L)
    val natural = Sampling.mixtureSample(withTok, col("doc_id"),
      col("source"), col("n_tok"),
      Map("src0" -> 0.8, "src1" -> 0.2), tokenBudget = 500L)
    // 2000 vs 500 tokens → natural fractions 0.8 / 0.2 exactly
    assert(t1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      natural.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val r1 = t1.select("source", "keep_rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // T=1: both rates = budget·(tok_s/Σ)/tok_s = 500/2500 = 0.2
    assert(math.abs(r1("src0") - 0.2) < 1e-12)
    assert(math.abs(r1("src1") - 0.2) < 1e-12)
    // higher temperature shifts keep-rate mass toward the small stratum
    val r4 = Sampling.temperatureMixture(withTok, col("doc_id"),
        col("source"), col("n_tok"), temperature = 4.0, tokenBudget = 500L)
      .select("source", "keep_rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r4("src1") > r1("src1") && r4("src0") < r1("src0"))
    assert(r4("src1") > r4("src0"))
  }

  private def weighted: DataFrame =
    (0L until 300L).map(i => (i, (i % 7) + 1.0)).toDF("doc_id", "w")

  test("weightedSample: exactly k rows, deterministic under partitioning") {
    def ids(df: DataFrame): Seq[Long] =
      Sampling.weightedSample(df, col("doc_id"), col("w"), 40)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val a = ids(weighted)
    assert(a.size === 40 && a.distinct.size === 40)
    assert(a === ids(weighted.repartition(13)))
  }

  test("weightedSample: k' ⊂ k (nested samples — the Efraimidis-Spirakis " +
      "top-k property: shrinking the budget only drops rows)") {
    def ids(k: Int): Set[Long] =
      Sampling.weightedSample(weighted, col("doc_id"), col("w"), k)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(10).subsetOf(ids(40)))
    assert(ids(40).subsetOf(ids(120)))
  }

  test("weightedSample: an overwhelming weight is always selected") {
    val spiked = weighted.withColumn("w",
      when(col("doc_id") === 123L, lit(1e12)).otherwise(col("w")))
    val got = Sampling.weightedSample(spiked, col("doc_id"), col("w"), 1)
      .select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(123L))
  }

  test("weightedSample: selection frequency tracks weight (w=7 strata " +
      "beat w=1 strata in expectation)") {
    val kept = Sampling.weightedSample(weighted, col("doc_id"), col("w"), 100)
      .withColumn("w7", (col("doc_id") % 7 === 6).cast("int"))
    val heavy = kept.filter(col("w7") === 1).count()
    val light = kept.filter(col("doc_id") % 7 === 0).count()
    // ~43 of each weight class exist; P(keep) ratio ≈ 7:1 — demand a
    // loose but directional gap, stable because the draw is
    // content-addressed (no flake)
    assert(heavy > light + 5, s"heavy=$heavy light=$light")
  }

  test("weightedSamplePerStratum: k per stratum, deterministic, " +
      "consistent with the global sampler's scoring") {
    val strat = weighted.withColumn("src", concat(lit("s"), col("doc_id") % 3))
    val kept = Sampling.weightedSamplePerStratum(strat, col("doc_id"),
      col("src"), col("w"), 15)
    val sizes = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ === 15L) && sizes.size === 3)
    val again = Sampling.weightedSamplePerStratum(strat.repartition(11),
      col("doc_id"), col("src"), col("w"), 15)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === kept.select("doc_id").as[Long].collect().sorted.toSeq)
    // one stratum alone === global sample restricted to that stratum
    val only = strat.filter(col("src") === "s0")
    val global = Sampling.weightedSample(only, col("doc_id"), col("w"), 15)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept.filter(col("src") === "s0")
      .select("doc_id").as[Long].collect().sorted.toSeq === global)
  }

  test("weightedSample: null/zero/negative weights are out of the draw " +
      "(a null score would sort nulls-first and hijack top-k slots)") {
    val mixed = Seq[(Long, Option[Double])](
      (1L, Some(1.0)), (2L, None), (3L, Some(0.0)), (4L, Some(-2.0)),
      (5L, Some(1.0)), (6L, Some(1.0))).toDF("doc_id", "w")
    val got = Sampling.weightedSample(mixed, col("doc_id"), col("w"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 5L, 6L))
  }

  test("curriculumOrder: band 1 holds the best scores, positions are a " +
      "permutation, band blocks are contiguous in position") {
    val df = (0L until 90L).map(i => (i, (i % 9).toDouble))
      .toDF("doc_id", "score").repartition(7)
    val got = Sampling.curriculumOrder(df, col("doc_id"), col("score"),
        bands = 3, seed = "s")
      .select("doc_id", "score", "band", "position")
      .as[(Long, Double, Long, Long)].collect()
    assert(got.map(_._4).sorted.toSeq === (1L to 90L).toSeq)
    val byBand = got.groupBy(_._3)
    // 3 equal bands of 30; every band-1 score >= every band-2 score, etc.
    assert(byBand.mapValues(_.length).toMap === Map(1L -> 30, 2L -> 30, 3L -> 30))
    assert(byBand(1L).map(_._2).min >= byBand(2L).map(_._2).max)
    assert(byBand(2L).map(_._2).min >= byBand(3L).map(_._2).max)
    // positions of band k occupy exactly ((k-1)*30, k*30]
    for (k <- 1L to 3L)
      assert(byBand(k).map(_._4).sorted.toSeq ===
        ((k - 1) * 30 + 1 to k * 30).toSeq)
  }

  test("curriculumOrder is partitioning-invariant and seed-sensitive") {
    val df = (0L until 50L).map(i => (i, (i % 5).toDouble))
      .toDF("doc_id", "score")
    def pos(d: org.apache.spark.sql.DataFrame, seed: String) =
      Sampling.curriculumOrder(d, col("doc_id"), col("score"), 2, seed)
        .select("doc_id", "position").as[(Long, Long)].collect().toMap
    assert(pos(df.repartition(11), "a") === pos(df.coalesce(1), "a"))
    assert(pos(df, "a") !== pos(df, "b"))
  }

  test("weightedSample/weightedSamplePerStratum/Sessionize reject " +
      "inputs carrying their output/helper column names") {
    assertThrows[IllegalArgumentException] {
      Sampling.weightedSample(weighted.withColumn("sample_score", lit(1.0)),
        col("doc_id"), col("w"), 5)
    }
    assertThrows[IllegalArgumentException] {
      Sampling.weightedSamplePerStratum(
        weighted.withColumn("__rn", lit(1)),
        col("doc_id"), col("w"), col("w"), 5)
    }
    assertThrows[IllegalArgumentException] {
      Sessionize.byGap(weighted.withColumn("session_seq", lit(1L))
        .withColumnRenamed("doc_id", "ts"), Seq("w"), "ts", 10L)
    }
  }
}
