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
  * mapping and bit interleave are codegen'd comparisons/shifts; the
  * only full shuffle is the `repartitionByRange` on the z-value that
  * any clustering write must pay, and it is range-based so output
  * files are even-sized regardless of value skew (ties on popular
  * z-cells split across files rather than funneling one).
  *
  * Lifecycle (the same build/append/compact triple as the IVF and text
  * indexes): [[zorderWrite]] persists its quantile cuts as a hidden
  * `_zmeta` table inside the layout directory (underscore-prefixed, so
  * plain `spark.read.parquet(dir)` never sees it); [[zorderAppend]]
  * bucketizes new batches with the SAVED cuts — z-values stay
  * comparable across writes and no re-scan of the existing data ever
  * happens — and lands them as additional well-clustered files;
  * [[compactLayout]] folds an append-heavy directory back to `nFiles`
  * files, again under the saved cuts, so compaction is a rewrite of
  * the data without a re-planning pass.
  */
object Layout {

  /** Quantile-bucket index 0..2^bits-1 of `v` against sorted cut
    * points (a fold of codegen'd comparisons; nulls land in bucket 0). */
  private def bucketize(v: Column, cuts: Seq[Double]): Column =
    cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(v > c, 1).otherwise(0)
    }

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

  /** One `percentile_approx` pass over `df`: the 2^bits-quantile cut
    * points per column (driver-side planning metadata). */
  private def computeCuts(df: DataFrame, cols: Seq[String],
      bits: Int): Seq[(String, Seq[Double])] = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), typedlit(probs), lit(10000))
        .as(s"__cuts_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
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

  private def writeClustered(df: DataFrame, z: Column, outDir: String,
      nFiles: Int, mode: String): Unit =
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(outDir)

  /** The z-value column for `df` over numeric `cols`: each column is
    * bucketized by its own approximate 2^bits-quantile cuts (computed
    * in one aggregate pass over `df` — an eager action at call time),
    * then bit-interleaved. Exposed for tests; [[zorderWrite]] is the
    * user-facing entry. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits <= 15, s"bits must be 1..15, got $bits")
    zFromCuts(computeCuts(df, cols, bits), bits)
  }

  /** Write `df` to `outDir` as `nFiles` parquet files Z-ordered on
    * `cols`, persisting the quantile cuts to `_zmeta` so later
    * [[zorderAppend]]/[[compactLayout]] calls cluster against the same
    * grid. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
      nFiles: Int, bits: Int = 6): Unit = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits <= 15, s"bits must be 1..15, got $bits")
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    val cuts = computeCuts(df, cols, bits)
    writeClustered(df, zFromCuts(cuts, bits), outDir, nFiles, "overwrite")
    writeMeta(df.sparkSession, outDir, cuts, bits, nFiles)
  }

  /** Append a batch to an existing z-ordered directory: the batch is
    * bucketized with the SAVED cuts (no re-scan of existing data, and
    * z-values stay comparable across writes) and lands as `nFiles`
    * additional clustered files (default: the build's file count
    * scaled down to the batch — at least 1). Readers prune each file
    * independently, so append-created small files cost file-count, not
    * pruning quality; [[compactLayout]] folds them back. */
  def zorderAppend(df: DataFrame, outDir: String, nFiles: Int = 0): Unit = {
    val (cuts, bits, built) = readMeta(df.sparkSession, outDir)
    val n = if (nFiles >= 1) nFiles else math.max(1, built / 8)
    writeClustered(df, zFromCuts(cuts, bits), outDir, n, "append")
  }

  /** Rewrite an append-fragmented layout back to `nFiles` files (the
    * build's count when omitted) under the saved cuts. The data is
    * materialized before the in-place overwrite (the repo's compaction
    * idiom); `_zmeta` is rewritten after the data — a crash between
    * the two loses only the metadata, which [[zorderWrite]] can
    * restore, and the scaladoc'd contract is that compaction does not
    * run concurrently with appends. */
  def compactLayout(spark: SparkSession, outDir: String,
      nFiles: Int = 0): Unit = {
    val (cuts, bits, built) = readMeta(spark, outDir)
    val n = if (nFiles >= 1) nFiles else built
    val data = spark.read.parquet(outDir).localCheckpoint(true)
    writeClustered(data, zFromCuts(cuts, bits), outDir, n, "overwrite")
    writeMeta(spark, outDir, cuts, bits, n)
  }
}
