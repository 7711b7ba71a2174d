package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-space clustering for training-data curation
  * (beyond-reference scope, SURVEY.md §7.4): a deterministic Lloyd's
  * k-means over array columns, the trained coarse quantizer for IVF-style
  * ANN, and SemDeDup-style semantic deduplication (Abbas et al. 2023:
  * cluster, then drop near-identical pairs WITHIN each cluster — the
  * cluster structure bounds the pairwise comparison to cell-sized blocks).
  *
  * Everything is declarative DataFrame ops — no UDFs, no MLlib
  * dependency, and the only collect is the k-row centroid freeze (the
  * broadcast-model class of metadata-scale reads):
  *  - assignment: ONE stateless projection per vector against the
  *    frozen k×dim matrix ([[graft.functions.NearestCentroid]] — no
  *    crossJoin row blow-up, no per-id shuffle),
  *  - centroid update: posexplode to (cell, dim) rows → one partial-
  *    aggregated groupBy of k·d cells → re-assembled array.
  * Per iteration that is one corpus projection and one shuffle whose
  * output is k·d rows — at 100 TB the corpus is scanned `iters` times
  * but never reshuffled by itself.
  *
  * Determinism: init = the first k vectors by id, cosine rounded to 6
  * before the argmax, ties to the lowest cell, centroid means rounded to
  * 6 — identical results in any engine, rerun, or partitioning.
  */
object Clustering {

  /** Default candidate-pair budget for [[semanticDupPairs]] — 2·10⁹
    * pairwise cosines is hours of cluster work; a plan estimated past
    * it is almost always a fixed-k cell layout that should have been
    * trained at k ≈ √N, and the refusal says exactly that. */
  val DefaultMaxCandidatePairs: Long = 2_000_000_000L

  /** Nearest-centroid assignment by cosine: returns (idCol, vecCol,
    * cell_id, ccos). `centroids` must be (cell_id, centroid) and small
    * enough to broadcast (k centroids — always, by construction), with
    * UNIQUE cell_ids (validated here with a caller-facing error; the
    * pre-kernel join path silently let whichever duplicate won the
    * max_by).
    *
    * EAGER: the centroid relation is collect()ed at CALL time to
    * freeze the k×dim kernel matrix — the k-row metadata-scale read
    * the broadcast already implied, but paid when the plan is BUILT,
    * not when it first executes. Callers composing an assignment plan
    * before the centroids are computable must defer this call until
    * they are.
    *
    * Executes as ONE stateless projection: the centroid matrix is
    * frozen driver-side (k rows — the same metadata-scale collect the
    * broadcast already implied) and every vector scores against it in
    * a single native pass ([[graft.functions.NearestCentroid]]). The
    * previous shape — crossJoin(broadcast) × k then a per-id max_by
    * aggregation — materialized k rows PER VECTOR and paid a corpus
    * shuffle on every call; this one pays neither, which compounds
    * across every caller (each k-means round, every IVF build/append/
    * probe assignment, SemDeDup, prototype pruning, the per-trigger
    * streaming index append). Bit-identical to the join path
    * ([[assignCellsJoin]], kept for the equivalence spec): same
    * ascending-index double folds, same round-6, same
    * (ccos DESC, cell_id ASC) tie rule, same null/NaN edges. */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cellType = centroids.schema("cell_id").dataType
    val rows = centroids.select(col("cell_id").cast("long"),
      col("centroid")).collect()
    // empty centroids: the join path emitted zero rows (the crossJoin
    // had nothing to pair) — reproduce that, schema included
    if (rows.isEmpty)
      return df.filter(lit(false)).select(col(idCol), col(vecCol),
        lit(null).cast(cellType).as("cell_id"),
        lit(null).cast("double").as("ccos"))
    val sorted = rows.map { r =>
      r.getLong(0) -> r.getSeq[Any](1)
        .map(_.asInstanceOf[Number].doubleValue()).toArray
    }.sortBy(_._1)
    // validate BEFORE the kernel sees the matrix: its strictly-ascending
    // require would otherwise surface as an opaque kernel-layout error
    val dups = sorted.map(_._1)
      .groupBy(identity).collect { case (id, g) if g.length > 1 => id }
    require(dups.isEmpty,
      s"assignCells: duplicate cell_id in centroids: " +
        s"${dups.toSeq.sorted.mkString(", ")} — centroid relations " +
        "must carry one row per cell")
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim),
      s"assignCells: centroids disagree on dimension " +
        s"(${sorted.map(_._2.length).distinct.mkString(",")})")
    val ids = sorted.map(_._1)
    val flat = new Array[Double](ids.length * dim)
    sorted.zipWithIndex.foreach { case ((_, c), i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    // self-norms at freeze time, the exact sqrt(array_dot(c, c)) fold
    val cns = sorted.map { case (_, c) =>
      var s = 0.0; var j = 0
      while (j < dim) { s += c(j) * c(j); j += 1 }
      math.sqrt(s)
    }
    import graft.functions.NearestCentroid.nearest_centroid
    df.select(col(idCol), col(vecCol),
        nearest_centroid(col(vecCol), ids, flat, cns).as("__nc"))
      // a NULL vector is the one case the kernel can't carry through
      // the struct: the join path kept the row with a null-poisoned
      // ccos on the lowest cell — coalesce reproduces it
      .select(col(idCol), col(vecCol),
        coalesce(col("__nc.cell_id"), lit(ids.head)).cast(cellType)
          .as("cell_id"),
        col("__nc.ccos").as("ccos"))
  }

  /** The pre-kernel join-shaped assignment — retained ONLY as the
    * equivalence oracle for [[assignCells]] (NearestCentroidSpec pins
    * the two bit-equal on every edge); no production path calls it. */
  private[graft] def assignCellsJoin(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame): DataFrame =
    df.select(col(idCol), col(vecCol),
        Similarity.l2norm(col(vecCol)).as("__vn"))
      .crossJoin(broadcast(centroids
        .withColumn("__cn", Similarity.l2norm(col("centroid")))))
      .withColumn("ccos",
        round(Similarity.dot(col(vecCol), col("centroid")) /
          (col("__vn") * col("__cn")), 6))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col(vecCol).as("v"), col("cell_id"), col("ccos")),
        struct(col("ccos"), -col("cell_id"))).as("__w"))
      .select(col(idCol), col("__w.v").as(vecCol),
        col("__w.cell_id").as("cell_id"), col("__w.ccos").as("ccos"))

  /** Lloyd's k-means: `iters` rounds of assign + element-wise-mean
    * update, seeded with the first `k` vectors by id. Returns
    * (cell_id, centroid). A cell that loses every member simply drops
    * out (k shrinks) — the deterministic analog of the usual
    * reseed-empty-cell heuristic, and what a grouped mean naturally
    * yields in any engine. */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0)
    var cents = corpus.filter(col(idCol) < k)
      .select(col(idCol).as("cell_id"),
        transform(col(vecCol), v => v.cast("double")).as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assignCells(corpus, idCol, vecCol, cents)
      val means = assigned
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cell_id", "pos")
        .agg(avg(col("v").cast("double")).as("m"))
      cents = means.groupBy("cell_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell_id"),
          transform(col("pm"), x => round(x.getField("m"), 6)).as("centroid"))
        // k rows — materialize so each round's broadcast plan stays flat
        .localCheckpoint(true)
    }
    cents
  }

  /** SemDeDup: semantic near-duplicate pairs = cosine ≥ `threshold`
    * WITHIN a k-means cell. The trained cells play the role D5's label
    * blocks played — pairwise cost is Σ cell² instead of corpus², and
    * unlike labels the blocks come from the data itself. Returns
    * (id_a, id_b, cos) with id_a < id_b; feed to
    * [[Dedup.connectedComponents]] / [[Dedup.leakageSafeSplit]] like any
    * other duplicate-pair source.
    *
    * SCALE RAIL: the candidate-pair count is Σ |cell|·(|cell|−1)/2 —
    * with a cell count k FIXED while the corpus grows, cells grow as
    * N/k and the stage is an N²/k regime (measured exponent 1.27 on
    * the 100× soak; docs/SCALE.md). At the recommended k ≈ √N (Abbas
    * et al. 2023 — [[kmeansFit]] with a derived k, the d8b/x2_sqrtn
    * operating point) the estimate stays ≈ N^1.5 and the rail never
    * fires. Before building the self-join this operator therefore
    * counts cell sizes (one aggregation over the already-materialized
    * assignment, k rows out) and REFUSES when the estimate exceeds
    * `maxCandidatePairs` (default [[DefaultMaxCandidatePairs]]), with
    * the per-cell evidence and the derived-k fix in the message.
    * Passing `maxCandidatePairs = Long.MaxValue` is the EXPLICIT
    * escape hatch for deliberately running a fixed-k plan at a scale
    * the default would refuse (the soak's x2 leg does, to keep the
    * quadratic regime measurable). */
  def semanticDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxCandidatePairs: Long = DefaultMaxCandidatePairs): DataFrame = {
    // norms once per vector BEFORE the within-cell self-join: each of the
    // Σ cell² candidate pairs then costs one interpreted array pass.
    // Materialize the assignment (N rows) before aliasing it as both join
    // sides — without this, Catalyst sees two copies of the corpus×k
    // crossJoin+argmax plan and only exchange reuse *sometimes* dedups
    // them; when it doesn't, the assignment runs twice (a full extra
    // corpus×k pass at scale). Same technique kmeansFit uses per round.
    val cells = assignCells(corpus, idCol, vecCol, centroids)
      .withColumn("__n", Similarity.l2norm(col(vecCol)))
      .localCheckpoint(true)
    // the rail: k-row cell-size histogram off the materialized
    // assignment, refusal BEFORE any pairwise work is planned
    if (maxCandidatePairs < Long.MaxValue) {
      val sizes = cells.groupBy("cell_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      // BigInt: c·(c−1)/2 overflows Long past c ≈ 4.3e9 — exactly the
      // corpus scale this rail exists for, and a wrapped-negative
      // estimate would silently PASS the check
      val est = sizes.map { case (_, c) => BigInt(c) * (c - 1) / 2 }.sum
      if (est > BigInt(maxCandidatePairs)) {
        val n = sizes.map(_._2).sum
        val (bigCell, bigSize) = sizes.maxBy(_._2)
        val sqrtN = math.max(1, math.sqrt(n.toDouble).round)
        // release the materialized assignment deterministically — a
        // caller iterating against repeated refusals (notebook loop)
        // must not accumulate N-row checkpoint blocks until GC
        cells.unpersist(false)
        throw new IllegalArgumentException(
          s"semanticDupPairs: estimated candidate pairs $est " +
            s"(Σ |cell|·(|cell|−1)/2 over ${sizes.length} cells; " +
            s"largest cell $bigCell has $bigSize of $n vectors) " +
            s"exceeds maxCandidatePairs=$maxCandidatePairs — the " +
            s"fixed-k quadratic regime. Train centroids with " +
            s"k ≈ √N (here ≥ $sqrtN; kmeansFit with a derived k, " +
            s"the d8b operating point) to keep the estimate near " +
            s"N^1.5, or pass maxCandidatePairs = Long.MaxValue to " +
            s"run this fixed-k plan anyway.")
      }
    }
    val a = cells.select(col("cell_id"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("__n").as("na"))
    val b = cells.select(col("cell_id"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("__n").as("nb"))
    a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** SSL-prototype pruning (Sorscher et al. 2022, "Beyond neural scaling
    * laws"): rank every example by how PROTOTYPICAL it is — cosine to its
    * k-means centroid — and drop the `pruneFrac` most prototypical per
    * cell, keeping the hard examples that move a model trained on
    * abundant data. The inverse keep-the-easy policy for scarce data is
    * the caller filtering on `proto_rank` instead of `keep`.
    *
    * Scale shape: one corpus×k broadcast assignment (shared with d8) and
    * ONE window partitioned by cell — parallelism = k, each partition a
    * cell's members, the same blocking that bounds SemDeDup. Returns
    * (id, cell_id, ccos, proto_rank, n_cell, keep) where proto_rank 1 is
    * the most prototypical (highest ccos, id-tiebroken) and
    * keep = proto_rank > ceil(pruneFrac · n_cell). */
  def prototypesPrune(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, pruneFrac: Double): DataFrame = {
    require(pruneFrac >= 0.0 && pruneFrac <= 1.0,
      s"pruneFrac must be in [0,1], got $pruneFrac")
    val byCell = Window.partitionBy("cell_id")
    assignCells(corpus, idCol, vecCol, centroids)
      .withColumn("proto_rank", row_number().over(
        byCell.orderBy(col("ccos").desc, col(idCol).asc)))
      .withColumn("n_cell", count(lit(1)).over(byCell))
      .withColumn("keep",
        col("proto_rank") > ceil(lit(pruneFrac) * col("n_cell")))
      .select(col(idCol), col("cell_id"), col("ccos"),
        col("proto_rank"), col("n_cell"), col("keep"))
  }
}
