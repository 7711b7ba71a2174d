package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Product quantization: the exactness degenerate (codebook = corpus
  * subvectors → ADC ≡ brute force), the compression contract (codes are
  * m small ints), and recall on the clustered geometry PQ exists for. */
class PqSpec extends SparkSuite {

  private def fixture(n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
  }

  test("degenerate PQ (ksub >= N, iters=0) reproduces brute-force top-k") {
    val emb = fixture(12, 8)
    val cb = ProductQuantization.pqTrain(emb, "vec_id", "embedding",
      m = 2, ksub = 12, iters = 0)
    val enc = ProductQuantization.pqEncode(emb, "vec_id", "embedding", cb)
    // with the identity codebook every vector encodes to its own id in
    // every subspace and reconstruction is exact
    val codes = enc.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.forall { case (id, cs) =>
      cs.length == 2 && cs.forall(_ == id.toInt) })
    val adc = ProductQuantization.pqKnn(emb, enc, cb, "vec_id", "embedding",
      k = 3).collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val brute = Similarity.bruteForceKnn(emb, emb, "vec_id", "embedding",
      k = 3).collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(adc.keySet == brute.keySet)
    brute.foreach { case (key, (nb, cos)) =>
      val (anb, acos) = adc(key)
      assert(anb == nb, s"$key: adc neighbor $anb != brute $nb")
      // subspace fold vs single-pass dot: same math, different FP
      // association — equal after both sides' round-6 except knife edges
      assert(math.abs(acos - cos) <= 2e-6, s"$key: $acos vs $cos")
    }
  }

  test("trained PQ compresses to m codes and keeps useful recall on " +
      "clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 16
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    val emb = (0 until 600).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val queries = emb.filter(col("vec_id") < 20)

    val cb = ProductQuantization.pqTrain(emb, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 2)
    val enc = ProductQuantization.pqEncode(emb, "vec_id", "embedding", cb)
    // compression contract: m ints per vector, codes within stride
    val shape = enc.select(size(col("codes")).as("m"),
      array_max(col("codes")).as("mx"), array_min(col("codes")).as("mn"))
      .agg(min("m"), max("m"), max("mx"), min("mn")).head()
    assert(shape.getInt(0) == 4 && shape.getInt(1) == 4)
    assert(shape.getInt(2) < 16 && shape.getInt(3) >= 0)

    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topk(Similarity.bruteForceKnn(queries, emb, "vec_id",
      "embedding", 3))
    // PQ collapses within-cluster distances by design (cluster mates can
    // share all m codes → identical ADC score), so it is graded the way
    // production uses it: as a SHORTLIST generator whose candidates are
    // re-ranked exactly. The shortlist must contain the true top-3, and
    // the very top of the ADC ranking must stay in the query's cluster.
    val shortlist = topk(ProductQuantization.pqKnn(queries, enc, cb,
      "vec_id", "embedding", 50))
    val candRecall = exact.map { case (q, want) =>
      shortlist.get(q).map(_.intersect(want).size / 3.0).getOrElse(0.0)
    }.sum / exact.size
    val adc3 = topk(ProductQuantization.pqKnn(queries, enc, cb,
      "vec_id", "embedding", 3))
    val purity = adc3.map { case (q, ns) =>
      ns.count(n => n % 16 == q % 16) / 3.0
    }.sum / adc3.size
    info(f"PQ shortlist-50 recall@3: $candRecall%.2f, top-3 cluster purity: $purity%.2f")
    assert(candRecall >= 0.9)
    assert(purity >= 0.9)
  }

  test("pqTrain validates dimensions and arguments") {
    val emb = fixture(10, 8)
    intercept[IllegalArgumentException] {
      ProductQuantization.pqTrain(emb, "vec_id", "embedding",
        m = 3, ksub = 4, iters = 1)
    }
    intercept[IllegalArgumentException] {
      ProductQuantization.pqTrain(emb, "vec_id", "embedding",
        m = 2, ksub = 0, iters = 1)
    }
  }
}
