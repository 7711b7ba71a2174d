package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.Clustering

/** Equivalence + edge pins for [[NearestCentroid]] and the kernel-backed
  * [[Clustering.assignCells]]: the retained join path
  * ([[Clustering.assignCellsJoin]]) is the oracle — every random and
  * adversarial fixture must match it bit-for-bit, because every
  * consumer of assignCells (kmeans, IVF, SemDeDup, prototypes) has a
  * DuckDB oracle hash that reproduces the JOIN path's arithmetic. */
class NearestCentroidSpec extends SparkSuite {
  import spark.implicits._

  private def cents(cs: (Long, Seq[Double])*) =
    cs.toDF("cell_id", "centroid")

  private def compare(df: org.apache.spark.sql.DataFrame,
      centroids: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val k = Clustering.assignCells(df, "id", "v", centroids)
      .collect().map(r => (r.getLong(0), r.get(2), r.get(3))).sortBy(_._1)
    val j = Clustering.assignCellsJoin(df, "id", "v", centroids)
      .collect().map(r => (r.getLong(0), r.get(2), r.get(3))).sortBy(_._1)
    assert(k.toSeq === j.toSeq, tag)
  }

  test("kernel assignment == join path on random double vectors") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val dim = 3 + rnd.nextInt(5)
      val k = 2 + rnd.nextInt(6)
      val cs = cents((0L until k.toLong).map(c =>
        c -> Seq.fill(dim)(rnd.nextDouble() * 2 - 1)): _*)
      val docs = (0L until 40L).map(i =>
        (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("id", "v")
      compare(docs, cs, s"trial $trial dim=$dim k=$k")
    }
  }

  test("kernel assignment == join path on FLOAT vectors (the " +
      "embeddings column shape: float elements, double centroids)") {
    val rnd = new scala.util.Random(7)
    val cs = cents(
      1L -> Seq(0.31, -0.8, 0.11, 0.52),
      4L -> Seq(-0.2, 0.9, 0.33, -0.41),
      9L -> Seq(0.05, 0.05, -0.99, 0.6))
    val docs = (0L until 30L).map(i =>
      (i, Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("id", "v")
    compare(docs, cs, "float vectors")
  }

  test("ties and duplicate centroids resolve to the lowest cell_id") {
    // centroids 3 and 7 are identical: every vector's cosine ties
    val cs = cents(7L -> Seq(1.0, 0.0), 3L -> Seq(1.0, 0.0))
    val docs = Seq((0L, Seq(0.5, 0.5)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(-1.0, 0.2))).toDF("id", "v")
    compare(docs, cs, "duplicate centroids")
    val got = Clustering.assignCells(docs, "id", "v", cs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.toSet === Set(3L))
  }

  test("zero-norm vectors (all-NaN cosines) and zero-norm centroids " +
      "match the join path's IEEE NaN/Inf ordering") {
    // under the Spark-4 ANSI default the JOIN path THROWS
    // DIVIDE_BY_ZERO on a zero norm — the kernel's documented,
    // deliberate divergence is to keep IEEE semantics (NaN/Inf cosine,
    // NaN ranks largest) so one all-zeros embedding cannot kill a
    // corpus-scale job; the IEEE numbers themselves are pinned against
    // the join path with ANSI off
    val cs = cents(2L -> Seq(1.0, 0.0), 5L -> Seq(0.0, 0.0)) // cn=0
    val docs = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(0.3, 0.4)),
      (2L, Seq(-1.0, 0.0))).toDF("id", "v")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try compare(docs, cs, "zero norms")
    finally spark.conf.unset("spark.sql.ansi.enabled")
    // and under the ANSI default the kernel still answers (no throw)
    val got = Clustering.assignCells(docs, "id", "v", cs)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got(1L) === 2L)
  }

  test("null vector, null element, and length-mismatch rows match the " +
      "join path (lowest cell, null ccos)") {
    val cs = cents(4L -> Seq(1.0, 0.0), 6L -> Seq(0.0, 1.0))
    val docs = Seq(
      (0L, Some(Seq(Some(1.0), Some(0.2)))),
      (1L, None), // null vector
      (2L, Some(Seq(Some(0.5), None))), // null element
      (3L, Some(Seq(Some(1.0), Some(0.0), Some(0.0)))) // wrong length
    ).toDF("id", "v")
    compare(docs, cs, "null edges")
    val got = Clustering.assignCells(docs, "id", "v", cs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.isNullAt(3)))
      .sortBy(_._1)
    assert(got(1) === ((1L, 4L, true)))
    assert(got(2) === ((2L, 4L, true)))
    assert(got(3) === ((3L, 4L, true)))
  }

  test("empty centroids emit zero rows, the join-path schema") {
    val cs = cents().filter(lit(false))
    val docs = Seq((0L, Seq(1.0, 0.0))).toDF("id", "v")
    val out = Clustering.assignCells(docs, "id", "v", cs)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("id", "v", "cell_id", "ccos"))
  }

  test("cell_id dataType follows the centroid relation (int ids stay " +
      "int)") {
    val cs = Seq((1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)))
      .toDF("cell_id", "centroid")
    val docs = Seq((0L, Seq(0.9, 0.1))).toDF("id", "v")
    val out = Clustering.assignCells(docs, "id", "v", cs)
    assert(out.schema("cell_id").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(out.head().getInt(2) === 1)
  }

  test("the column-side contracts the kernel mirrors: round(NaN, 6) " +
      "passes through; non-ANSI divide by zero is NULL") {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val r = spark.range(1).select(
        round(lit(Double.NaN), 6), round(lit(1.0) / lit(0.0), 6)).head()
      assert(r.getDouble(0).isNaN)
      assert(r.isNullAt(1))
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("interpreted nullSafeEval matches codegen") {
    val cs = cents(0L -> Seq(0.3, 0.7), 1L -> Seq(-0.6, 0.2))
    val docs = (0L until 10L).map(i =>
      (i, Seq(math.sin(i.toDouble), math.cos(i.toDouble))))
      .toDF("id", "v")
    val codegen = Clustering.assignCells(docs, "id", "v", cs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = Clustering.assignCells(docs, "id", "v", cs)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
      assert(interp === codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("assignCells physical plan is join-free and shuffle-free") {
    val cs = cents(0L -> Seq(0.3, 0.7), 1L -> Seq(-0.6, 0.2))
    val docs = spark.range(100)
      .select(col("id"), array(rand(1), rand(2)).as("v"))
    val plan = Clustering.assignCells(docs, "id", "v", cs)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("graft_nearest_centroid"), plan)
  }
}
