package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for file-level skipping at 100 TB
  * (beyond-reference scope): Z-order clustering of a table on several
  * columns so that parquet min/max footer stats prune files for
  * predicates on ANY of the clustered columns, not just the leading
  * sort key. A linear sort on column A gives perfect pruning on A and
  * ZERO pruning on B; the Z-curve interleaves quantile-bucket bits of
  * all clustered columns so each file covers a small hyper-rectangle —
  * every dimension prunes to roughly the (1/nFiles)^(1/dims) fraction.
  *
  * Scale shape: bucketization uses ONE mergeable `percentile_approx`
  * aggregate over the input (partial-agg, tiny result collected as
  * driver-side planning metadata — the repo's planning-collect idiom),
  * NOT a global rank, so there is no row_number pass; the bucket
  * mapping is a native codegen'd O(log n) binary search
  * ([[graft.functions.BucketIndex]]) with constant generated-code size
  * at any `bits`, and the interleave is codegen'd shifts; the only
  * full shuffle is the
  * `repartitionByRange` on the z-value that any clustering write must
  * pay, and it is range-based so output files are even-sized
  * regardless of value skew (ties on popular z-cells split across
  * files rather than funneling one).
  *
  * The layout directory is PARTITIONED by `__zp`, the top
  * [[Layout.PrefixBits]] bits of the z-value. Readers see it as one
  * extra int column; its job is to bound maintenance: compaction
  * stages and rewrites ONE z-prefix slice at a time (dynamic partition
  * overwrite), so at no point does the whole table sit in checkpoint
  * blocks — the same bounded-slice idiom as
  * `PointsStore.compactStageSlices`. A crash mid-compaction loses at
  * most the slice being rewritten, not the table.
  *
  * Lifecycle (the same build/append/compact triple as the IVF and text
  * indexes): [[zorderWrite]] persists its quantile cuts as a hidden
  * `_zmeta` table inside the layout directory (underscore-prefixed, so
  * partition discovery and plain reads never see it); [[zorderAppend]]
  * bucketizes new batches with the SAVED cuts — z-values stay
  * comparable across writes and no re-scan of the existing data ever
  * happens — and lands them as additional well-clustered files;
  * [[compactLayout]] folds an append-heavy directory back to ~`nFiles`
  * files slice by slice, again under the saved cuts, so compaction is
  * a rewrite of the data without a re-planning pass. Compaction must
  * not run concurrently with appends (the repo-wide compaction
  * contract).
  */
object Layout {

  /** z-prefix partition width: 2^4 = 16 maintenance slices. Derived
    * (not persisted): `__zp` values are only read back as "the set of
    * slices that exist", so layouts written under a different constant
    * remain valid — slices are just sized differently. */
  private val PrefixBits = 4

  /** Quantile-bucket index 0..2^bits-1 of `v` against sorted cut
    * points: the count of cuts strictly below `v`, as one native
    * codegen'd O(log n) binary search ([[graft.functions.BucketIndex]]
    * — a HOF filter here is CodegenFallback, an interpreted boxing
    * lambda per cut per row, and a when-ladder grows 2^bits deep).
    * Nulls land in bucket 0; NaN follows Spark's double ordering
    * (greater than every number) and lands in the TOP bucket — pinned
    * in BucketIndexSpec. */
  private def bucketize(v: Column, cuts: Seq[Double]): Column =
    graft.functions.BucketIndex.bucket_index(v, cuts)

  /** Bit-interleave the bucket indices round-robin (most-significant
    * bit of every column first) into one long z-value. */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + (n - 1 - j))
    terms.foldLeft(lit(0L))(_ + _)
  }

  /** Total z-value width; bounded at validation so shifts never reach
    * 64 (Java masks long-shift distances to 6 bits — an overflow would
    * silently wrap positions and corrupt every z-value). */
  private def zbitsOf(nCols: Int, bits: Int): Int = nCols * bits

  private def validate(cols: Seq[String], bits: Int): Unit = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits <= 15, s"bits must be 1..15, got $bits")
    require(zbitsOf(cols.size, bits) <= 63,
      s"bits*columns must fit a long: ${cols.size} cols x $bits bits = " +
        s"${zbitsOf(cols.size, bits)} > 63")
  }

  /** One `percentile_approx` pass over (a sample of) `df`: the
    * 2^bits-quantile cut points per column (driver-side planning
    * metadata). Sketch accuracy scales with the bucket count so cuts
    * are never coarser than the grid they define. `sampleFraction < 1`
    * sketches a Bernoulli sample — the same estimate-boundaries-from-
    * a-sample design every range partitioner uses, and the right call
    * at scale: bucket boundaries need rough balance, not exactness,
    * and cut error only skews file SIZES, never correctness (the
    * z-value is still a total function of the row). */
  private def computeCuts(df: DataFrame, cols: Seq[String],
      bits: Int, sampleFraction: Double): Seq[(String, Seq[Double])] = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb)
    val accuracy = math.max(10000, nb * 4)
    val src =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed = 42L)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), typedlit(probs), lit(accuracy))
        .as(s"__cuts_$c"))
    val row = src.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      c -> Option(row.getAs[scala.collection.Seq[Double]](s"__cuts_$c"))
        .map(_.toSeq).getOrElse(Seq.empty[Double])
    }
  }

  private def zFromCuts(cuts: Seq[(String, Seq[Double])], bits: Int): Column =
    interleave(
      cuts.map { case (c, cs) => bucketize(col(c).cast("double"), cs) },
      bits)

  private def metaPath(outDir: String): String = s"$outDir/_zmeta"

  private def writeMeta(spark: SparkSession, outDir: String,
      cuts: Seq[(String, Seq[Double])], bits: Int, nFiles: Int): Unit = {
    import spark.implicits._
    cuts.zipWithIndex
      .map { case ((c, cs), i) => (i, c, cs, bits, nFiles) }
      .toDF("idx", "col", "cuts", "bits", "n_files")
      .coalesce(1)
      .write.mode("overwrite").parquet(metaPath(outDir))
  }

  private[operators] def readMeta(spark: SparkSession,
      outDir: String): (Seq[(String, Seq[Double])], Int, Int) = {
    val rows = spark.read.parquet(metaPath(outDir))
      .orderBy("idx")
      .select("col", "cuts", "bits", "n_files")
      .collect()
    require(rows.nonEmpty, s"no z-order metadata under $outDir")
    val cuts = rows.toSeq.map(r => (r.getString(0),
      r.getAs[scala.collection.Seq[Double]](1).toSeq))
    (cuts, rows.head.getInt(2), rows.head.getInt(3))
  }

  /** Cluster `df` by z-value into ~`nFiles` files under the `__zp`
    * partition scheme. Each range task holds a contiguous z-interval
    * and writes one file per z-prefix it overlaps, so the file count
    * is nFiles plus at most one straddle per slice boundary. */
  private def writeClustered(df: DataFrame, cuts: Seq[(String, Seq[Double])],
      bits: Int, outDir: String, nFiles: Int, mode: String,
      dynamicOverwrite: Boolean = false): Unit = {
    val zbits = zbitsOf(cuts.size, bits)
    val pb = math.min(PrefixBits, zbits)
    val w = df.withColumn("__z", zFromCuts(cuts, bits))
      .withColumn("__zp", shiftright(col("__z"), zbits - pb).cast("int"))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.partitionBy("__zp").mode(mode)
    (if (dynamicOverwrite) w.option("partitionOverwriteMode", "dynamic")
     else w).parquet(outDir)
  }

  /** The z-value column for `df` over numeric `cols`: each column is
    * bucketized by its own approximate 2^bits-quantile cuts (computed
    * in one aggregate pass over `df` — an eager action at call time),
    * then bit-interleaved. Exposed for tests; [[zorderWrite]] is the
    * user-facing entry. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    validate(cols, bits)
    zFromCuts(computeCuts(df, cols, bits, 1.0), bits)
  }

  /** Write `df` to `outDir` as ~`nFiles` parquet files Z-ordered on
    * `cols`, persisting the quantile cuts to `_zmeta` so later
    * [[zorderAppend]]/[[compactLayout]] calls cluster against the same
    * grid. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
      nFiles: Int, bits: Int = 6, cutsSampleFraction: Double = 1.0): Unit = {
    validate(cols, bits)
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    require(cutsSampleFraction > 0.0 && cutsSampleFraction <= 1.0,
      s"cutsSampleFraction must be in (0, 1], got $cutsSampleFraction")
    val cuts = computeCuts(df, cols, bits, cutsSampleFraction)
    writeClustered(df, cuts, bits, outDir, nFiles, "overwrite")
    writeMeta(df.sparkSession, outDir, cuts, bits, nFiles)
  }

  /** Append a batch to an existing z-ordered directory: the batch is
    * bucketized with the SAVED cuts (no re-scan of existing data, and
    * z-values stay comparable across writes) and lands as ~`nFiles`
    * additional clustered files (default: the build's file count
    * scaled down to the batch — at least 1). Readers prune each file
    * independently, so append-created small files cost file-count, not
    * pruning quality; [[compactLayout]] folds them back. */
  def zorderAppend(df: DataFrame, outDir: String, nFiles: Int = 0): Unit = {
    val (cuts, bits, built) = readMeta(df.sparkSession, outDir)
    val n = if (nFiles >= 1) nFiles else math.max(1, built / 8)
    graft.sources.Compaction.guardedAppend(df.sparkSession, outDir) {
      writeClustered(df, cuts, bits, outDir, n, "append")
    }
  }

  /** Rewrite an append-fragmented layout back to ~`nFiles` files (at
    * least one per occupied z-prefix slice; the build's count when
    * omitted) under the saved cuts — ONE `__zp` slice at a time, so
    * the staged set is a slice, never the table, and a crash loses at
    * most the slice being swapped (dynamic partition overwrite).
    * Guarded by [[graft.sources.Compaction]]'s two-flag protocol: a
    * concurrent [[zorderAppend]] fails fast
    * ([[graft.sources.ConcurrentCompactionException]]) instead of
    * being silently dropped by a slice's read-then-overwrite. */
  def compactLayout(spark: SparkSession, outDir: String,
      nFiles: Int = 0): Unit =
      graft.sources.Compaction.guardedCompaction(spark, outDir) {
    val (cuts, bits, built) = readMeta(spark, outDir)
    val n = if (nFiles >= 1) nFiles else built
    // table listed ONCE, INSIDE the guard (the rewriteSlices ordering
    // contract); each slice's overwrite replaces only its own __zp
    // dir, which no later slice reads. A concurrent zorderAppend fails
    // fast instead of being silently dropped.
    val base = spark.read.parquet(outDir)
    // occupied slices: ≤ 2^PrefixBits rows of planning metadata
    val slices = base
      .select("__zp").distinct().collect().map(_.getInt(0)).sorted.toSeq
    val perSlice = math.max(1, n / math.max(1, slices.length))
    graft.sources.Compaction.rewriteSlices(slices, 1) {
      slice => base.filter(col("__zp") === slice.head).drop("__zp")
    } { (staged, _) =>
      writeClustered(staged, cuts, bits, outDir, perSlice, "overwrite",
        dynamicOverwrite = true)
    }
    writeMeta(spark, outDir, cuts, bits, n)
  }
}
