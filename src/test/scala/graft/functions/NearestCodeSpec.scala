package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.ProductQuantization

/** Equivalence + edge pins for [[NearestCode]] through the kernel-backed
  * PQ `assignCodes`: the retained join path (`assignCodesJoin`) is the
  * oracle, because every PQ consumer (pqTrain, pqEncode, the residual
  * encoders, k7-k13b) has a DuckDB oracle hash reproducing the JOIN
  * path's arithmetic. The public faces exercised are [[ProductQuantization
  * .pqTrain]] (assignCodes every round) and [[ProductQuantization
  * .pqEncode]] (assignCodes + the collect_list fold). */
class NearestCodeSpec extends SparkSuite {
  import spark.implicits._

  /** Random corpus of dim-8 double vectors. */
  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("id", "v")
  }

  test("pqTrain + pqEncode through the kernel == the join path, " +
      "round for round") {
    val docs = corpus(40, 3)
    for ((m, ksub, iters) <- Seq((2, 4, 2), (4, 8, 1), (8, 3, 3))) {
      val cb = ProductQuantization.pqTrain(docs, "id", "v", m, ksub, iters)
        .localCheckpoint(true)
      // the trained codebook itself came through kernel assignCodes
      // every round; now pin one encode against the join path ON THE
      // SAME codebook
      val viaKernel = ProductQuantization.pqEncode(docs, "id", "v", cb)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val joined = ProductQuantization.assignCodesJoin(
          docsToSv(docs, m), "id", cb)
        .join(broadcast(cb.select(col("sub"), col("code"),
          graft.operators.Similarity.dot(col("cent"), col("cent"))
            .as("__c2"))), Seq("sub", "code"))
        .groupBy(col("id"))
        .agg(array_sort(collect_list(
          struct(col("sub"), col("code"), col("__c2")))).as("__sc"))
        .select(col("id"),
          transform(col("__sc"), x => x.getField("code")).as("codes"),
          sqrt(aggregate(col("__sc"), lit(0.0),
            (a, x) => a + x.getField("__c2"))).as("recon_norm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(viaKernel === joined, s"m=$m ksub=$ksub iters=$iters")
    }
  }

  /** The subvector explode pqEncode/pqTrain share, reproduced for the
    * join-path comparison (private in the operator). */
  private def docsToSv(docs: org.apache.spark.sql.DataFrame, m: Int) = {
    val dim = docs.select(size(col("v"))).head().getInt(0)
    val subDim = dim / m
    val subs = (0 until m).map { s =>
      struct(lit(s).as("sub"),
        slice(transform(col("v"), x => x.cast("double")),
          s * subDim + 1, subDim).as("sv"))
    }
    docs.select(col("id"), explode(array(subs: _*)).as("__e"))
      .select(col("id"), col("__e.sub").as("sub"), col("__e.sv").as("sv"))
  }

  test("duplicate codebook entries tie to the lowest code; dropped " +
      "codes keep slot arithmetic (gaps in the code sequence)") {
    // sub 0 has codes 1 and 5 IDENTICAL (tie -> 1) plus a gap at 0;
    // sub 1 has one code only
    val cb = Seq(
      (0, 1, Seq(1.0, 0.0)), (0, 5, Seq(1.0, 0.0)), (0, 7, Seq(0.0, 1.0)),
      (1, 2, Seq(0.5, 0.5))).toDF("sub", "code", "cent")
    val docs = Seq((0L, Seq(0.9, 0.1, 0.3, 0.3)),
      (1L, Seq(0.0, 2.0, -1.0, 4.0))).toDF("id", "v")
    val got = ProductQuantization.pqEncode(docs, "id", "v", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(0L) === Seq(1, 2)) // tie between 1 and 5 -> 1
    assert(got(1L) === Seq(7, 2))
    val viaJoin = ProductQuantization.assignCodesJoin(
        docsToSv(docs, 2), "id", cb)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(3)))
      .toMap
    assert(viaJoin === Map((0L, 0) -> 1, (0L, 1) -> 2,
      (1L, 0) -> 7, (1L, 1) -> 2))
  }

  test("interpreted nullSafeEval matches codegen through pqEncode") {
    val docs = corpus(12, 9)
    val cb = ProductQuantization.pqTrain(docs, "id", "v", 2, 4, 1)
      .localCheckpoint(true)
    val codegen = ProductQuantization.pqEncode(docs, "id", "v", cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      .toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = ProductQuantization.pqEncode(docs, "id", "v", cb)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
        .toSeq
      assert(interp === codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("the encode plan is free of the ksub-wide join and the per-" +
      "(id, sub) shuffle") {
    val docs = corpus(20, 5)
    val cb = ProductQuantization.pqTrain(docs, "id", "v", 2, 4, 1)
      .localCheckpoint(true)
    val plan = ProductQuantization.pqEncode(docs, "id", "v", cb)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
    assert(plan.contains("graft_nearest_code"), plan)
    // exactly ONE exchange survives: the per-id collect_list fold
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      plan)
  }
}
