package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Approximate-ANN sanity: the LSH and IVF paths must return genuinely
  * similar neighbors (non-trivial recall vs the exact top-k) while
  * scanning only a fraction of the corpus — the trade they exist for. */
class AnnRecallSpec extends SparkSuite {

  private def recallAt3(approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, want) =>
      approx.get(q).map(got => got.intersect(want).size / 3.0).getOrElse(0.0)
    }
    per.sum / per.size
  }

  test("lsh and ivf recall vs exact top-3 (sf0.001 embeddings)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

    val exact = topk(Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id"))
    val lsh = topk(Similarity.lshKnn(queries, emb, "vec_id", "embedding", 3, planes = 4)
      .select("query_id", "rank", "neighbor_id"))
    val ivf = topk(Similarity.ivfKnn(queries, emb, "vec_id", "embedding", 3, nCells = 8)
      .select("query_id", "rank", "neighbor_id"))

    val rLsh = recallAt3(lsh, exact)
    val rIvf = recallAt3(ivf, exact)
    info(f"recall@3: lsh=$rLsh%.2f ivf=$rIvf%.2f")
    // single-probe approximations on random-ish vectors: expect imperfect
    // but clearly better-than-chance recall (chance ≈ 3/500)
    assert(rLsh > 0.05 && rLsh <= 1.0)
    assert(rIvf > 0.05 && rIvf <= 1.0)

    // trained quantizer (k-means cells) vs the first-k heuristic at the
    // same cell count — the trained cells must be competitive
    val cents = Clustering.kmeansFit(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val ivfT = topk(Similarity.ivfKnnTrained(queries, emb, "vec_id",
      "embedding", 3, cents).select("query_id", "rank", "neighbor_id"))
    val rIvfT = recallAt3(ivfT, exact)
    info(f"recall@3: ivf-trained=$rIvfT%.2f (heuristic ivf=$rIvf%.2f)")
    assert(rIvfT > 0.05 && rIvfT <= 1.0)

    // int8 quantization must be ranking-preserving to near-identity
    val quant = topk(Similarity.bruteForceKnnQuantized(queries, emb,
      "vec_id", "embedding", 3).select("query_id", "rank", "neighbor_id"))
    val rQuant = recallAt3(quant, exact)
    info(f"recall@3: int8-quantized=$rQuant%.2f")
    assert(rQuant >= 0.9)
  }

  test("clustered vectors: multi-probe multi-table LSH reaches recall ≥ 0.9 " +
      "scanning < 10% of the corpus") {
    import spark.implicits._
    // deterministic clustered fixture: 24 well-separated centers in R^16,
    // 1000 points = center + small noise — the geometry ANN indexes are
    // FOR (real embedding corpora cluster; the near-uniform sf0.001
    // fixture is the adversarial case and is covered above)
    val rnd = new scala.util.Random(42)
    val dim = 16
    val centers = Array.fill(24)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 1000).map { i =>
      val c = centers(i % 24)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding").cache()
    val queries = emb.filter(col("vec_id") < 20)
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topk(Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id"))
    val planes = 8
    val tables = 2
    val probes = planes + 1 // multi-probe: exact bucket + Hamming-1 ring
    val frac = tables * probes.toDouble / (1 << planes)
    val got = topk(Similarity.lshKnn(queries, emb, "vec_id", "embedding", 3,
      planes = planes, multiProbe = true, tables = tables)
      .select("query_id", "rank", "neighbor_id"))
    val r = recallAt3(got, exact)
    info(f"clustered recall@3=$r%.2f scan≈${frac * 100}%.1f%% of corpus")
    assert(frac < 0.10, f"scan fraction $frac%.3f not under 10%%")
    assert(r >= 0.9, f"clustered recall $r%.2f below 0.9")
  }

  // Measured here (deterministic fixture): recall@3 at nProbe=1 decays
  // to ~0.67 after the drifted append and recovers to 1.00 after
  // retrainIvfIndex — the recall evidence behind the retrain verb. Note
  // the posting skew stays ~1.06 in THIS geometry: skew is the trigger
  // for pile-type drift (mass collecting in few cells — the
  // maintainIvfIndex spec's fixture); boundary-straddle drift decays
  // recall while leaving cells balanced, which is why docs/SCALE.md
  // also recommends periodic retrains or a recall probe, not skew alone.
  test("drift decays recall@3 at fixed nProbe; retrain recovers it " +
      "(the recall evidence behind the retrain verb)") {
    import spark.implicits._
    // 8 base clusters the index is trained on, and 8 DRIFTED
    // MICRO-clusters (5 members each) centered on the midpoints between
    // adjacent base centers — the worst case for a frozen quantizer:
    // every drifted cluster straddles a stale Voronoi boundary, so its
    // few members split across two cells, and for a drifted query whose
    // exact top-3 IS its micro-cluster, a single probe finds only its
    // own side. Ids 0..7 are base seeds and 8..15 drifted seeds, so the
    // retrain's first-k seeding covers all 16 true clusters.
    val rnd = new scala.util.Random(11)
    val dim = 16
    val b = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val m = Array.tabulate(8)(j =>
      Array.tabulate(dim)(d => (b(j)(d) + b((j + 1) % 8)(d)) / 2))
    def isDrifted(i: Int): Boolean = (i >= 8 && i < 16) || i >= 488
    val pts = (0 until 520).map { i =>
      val c =
        if (i < 8) b(i)
        else if (i < 16) m(i - 8)
        else if (i < 488) b(i % 8)
        else m(i % 8)
      (i.toLong, c.map(x => (x + 0.1 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val all = pts.toDF("vec_id", "embedding").cache()
    val driftedIds = pts.map(_._1).filter(i => isDrifted(i.toInt)).toSet
    val base = all.filter(!col("vec_id").isin(driftedIds.toSeq: _*))
    val drifted = all.filter(col("vec_id").isin(driftedIds.toSeq: _*))
    val queries = drifted // all 40 drifted points query their siblings
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topk(Similarity.bruteForceKnn(queries, all, "vec_id",
      "embedding", 3).select("query_id", "rank", "neighbor_id"))

    val dir = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    Similarity.buildIvfIndex(base, "vec_id", "embedding", dir,
      k = 8, iters = 3)
    Similarity.appendToIvfIndex(drifted, "vec_id", "embedding", dir)
    val skewRow = Similarity.indexStats(spark, dir)
      .agg(max(col("postings")) / avg(col("postings"))).head().getDouble(0)
    val before = recallAt3(topk(Similarity.ivfIndexKnn(queries, dir,
      "vec_id", "embedding", k = 3, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")), exact)

    // retrain at a cell count matching the CURRENT corpus (16 true
    // clusters) — maintainIvfIndex's grow-retrainK path
    Similarity.retrainIvfIndex(spark, dir, k = 16, iters = 3)
    val after = recallAt3(topk(Similarity.ivfIndexKnn(queries, dir,
      "vec_id", "embedding", k = 3, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")), exact)

    info(f"drift recall@3 at nProbe=1: before retrain=$before%.2f, " +
      f"after retrain=$after%.2f (post-drift posting skew=$skewRow%.2f)")
    assert(before < 0.8,
      f"drift did not decay recall (before=$before%.2f) — fixture broken")
    assert(after >= 0.85, f"retrain did not recover recall: $after%.2f")
    assert(after - before >= 0.15,
      f"no measurable recovery: $before%.2f -> $after%.2f")
  }

  // Measured here (deterministic fixture): ADC recall@3 at nProbe=1
  // decays to 0.46 after the drifted append and recovers to 0.79
  // after rebuildIvfPqIndex(k=16) — below the float test's 1.00
  // recovery because PQ recall folds the code-reconstruction error on
  // top of the coarse probe, the calibrate-floors-to-a-measured-
  // baseline rule docs/SCALE.md states.
  test("PQ drift decays ADC recall@3 at fixed nProbe; " +
      "rebuildIvfPqIndex from source recovers it (the k13 verb's " +
      "recall evidence)") {
    import spark.implicits._
    // the float drift fixture verbatim (boundary-straddle
    // micro-clusters), but the index is IVF-PQ in residual mode: the
    // decay under drift must come from the frozen COARSE quantizer
    // (same mechanism as the float test), with the PQ code loss riding
    // on top — which is why the recovery bound is looser than the
    // float test's (recall folds both loss sources; docs/SCALE.md's
    // calibrate-floors-to-a-measured-baseline rule)
    val rnd = new scala.util.Random(11)
    val dim = 16
    val b = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val m = Array.tabulate(8)(j =>
      Array.tabulate(dim)(d => (b(j)(d) + b((j + 1) % 8)(d)) / 2))
    def isDrifted(i: Int): Boolean = (i >= 8 && i < 16) || i >= 488
    val pts = (0 until 520).map { i =>
      val c =
        if (i < 8) b(i)
        else if (i < 16) m(i - 8)
        else if (i < 488) b(i % 8)
        else m(i % 8)
      (i.toLong, c.map(x => (x + 0.1 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val all = pts.toDF("vec_id", "embedding").cache()
    val driftedIds = pts.map(_._1).filter(i => isDrifted(i.toInt)).toSet
    val base = all.filter(!col("vec_id").isin(driftedIds.toSeq: _*))
    val drifted = all.filter(col("vec_id").isin(driftedIds.toSeq: _*))
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topk(Similarity.bruteForceKnn(drifted, all, "vec_id",
      "embedding", 3).select("query_id", "rank", "neighbor_id"))

    val dir = java.nio.file.Files.createTempDirectory("pqdrift").toString
    ProductQuantization.buildIvfPqIndex(base, "vec_id", "embedding",
      dir, kCells = 8, coarseIters = 3, m = 4, ksub = 16, pqIters = 2,
      byResidual = true)
    ProductQuantization.appendToIvfPqIndex(drifted, "vec_id",
      "embedding", dir)
    val before = recallAt3(topk(ProductQuantization.ivfPqKnn(drifted,
      dir, "vec_id", "embedding", k = 3, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")), exact)
    // the cron'd evidence number agrees with the hand fold: the PQ
    // recall probe against the source on the SAME drifted queries
    val probed = Similarity.meanRecall(
      ProductQuantization.recallProbeRows(spark, dir, all, drifted,
        "vec_id", "embedding", k = 3, nProbe = 1))
    assert(math.abs(probed - before) < 1e-9,
      f"probe $probed%.4f != hand fold $before%.4f")

    // rebuild FROM SOURCE at a cell count matching the current corpus
    // (16 true clusters) — maintainIvfIndex's grow-retrainK path for PQ
    ProductQuantization.rebuildIvfPqIndex(all, "vec_id", "embedding",
      dir, kCells = 16, coarseIters = 3)
    val after = recallAt3(topk(ProductQuantization.ivfPqKnn(drifted,
      dir, "vec_id", "embedding", k = 3, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")), exact)
    info(f"PQ drift recall@3 at nProbe=1: before rebuild=$before%.2f, " +
      f"after rebuild=$after%.2f")
    assert(before < 0.8,
      f"drift did not decay PQ recall (before=$before%.2f) — fixture broken")
    assert(after - before >= 0.15,
      f"no measurable recovery: $before%.2f -> $after%.2f")
  }

  test("multi-probe recall/cost curve; best config reaches recall ≥ 0.5") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .cache()
    val queries = emb.filter(col("vec_id") < 20)
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topk(Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id"))

    // expected scan fraction per query ≈ tables·probes / 2^planes — the
    // cost axis of the curve (probes = planes+1 when multi-probing)
    val configs = Seq(
      (4, false, 1), (4, true, 1), (8, true, 1),
      (6, true, 2), (6, true, 3), (5, true, 3))
    val curve = configs.map { case (planes, mp, tables) =>
      val got = topk(Similarity.lshKnn(queries, emb, "vec_id", "embedding", 3,
        planes = planes, multiProbe = mp, tables = tables)
        .select("query_id", "rank", "neighbor_id"))
      val r = recallAt3(got, exact)
      val probes = if (mp) planes + 1 else 1
      val frac = math.min(1.0, tables * probes.toDouble / (1 << planes))
      info(f"planes=$planes multiProbe=$mp tables=$tables " +
        f"recall@3=$r%.2f scan≈${frac * 100}%.1f%% of corpus")
      (planes, mp, tables, r, frac)
    }
    // at least one config must be genuinely useful: recall ≥ 0.5 while
    // scanning well under half the corpus
    assert(curve.exists { case (_, _, _, r, frac) => r >= 0.5 && frac < 0.5 },
      curve.map { case (p, mp, t, r, f) =>
        f"(planes=$p mp=$mp tables=$t r=$r%.2f scan=$f%.2f)" }.mkString(", "))
  }
}
