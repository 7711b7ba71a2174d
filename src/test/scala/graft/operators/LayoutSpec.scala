package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  // 64x64 uniform grid, shuffled so the input has no helpful order
  private lazy val grid: DataFrame = spark.range(4096)
    .select((col("id") % 64).as("a"), (col("id") / 64).as("b"),
      col("id").as("payload"))
    .orderBy(md5(col("id").cast("string")))
    .localCheckpoint(true)

  /** Files whose [min,max] footer-equivalent range intersects [lo,hi]
    * on `c` — the set a parquet reader must scan for that predicate. */
  private def filesTouched(dir: String, c: String, lo: Long, hi: Long): (Long, Long) = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .localCheckpoint(true)
    val total = stats.count()
    val touched = stats.filter(col("mn") <= hi && col("mx") >= lo).count()
    (touched, total)
  }

  test("z-order prunes on BOTH dimensions; linear sort only on the first") {
    val zdir = java.nio.file.Files.createTempDirectory("zo").toString
    Layout.zorderWrite(grid, Seq("a", "b"), zdir, nFiles = 16, bits = 6)
    val ldir = java.nio.file.Files.createTempDirectory("lin").toString
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(ldir)

    // rows survive the layout byte-for-byte
    val back = spark.read.parquet(zdir)
    assert(back.count() === 4096)
    assert(back.agg(sum("payload")).as[Long].head() ===
      grid.agg(sum("payload")).as[Long].head())

    // 1/8th-of-domain range predicate on each dimension
    val (za, zn) = filesTouched(zdir, "a", 0, 7)
    val (zb, _) = filesTouched(zdir, "b", 0, 7)
    assert(zn >= 8, s"expected >=8 z files, got $zn")
    assert(za <= zn / 2, s"z-order a-pruning: touched $za of $zn")
    assert(zb <= zn / 2, s"z-order b-pruning: touched $zb of $zn")

    val (la, ln) = filesTouched(ldir, "a", 0, 7)
    val (lb, _) = filesTouched(ldir, "b", 0, 7)
    assert(la <= ln / 4, s"linear a-pruning: touched $la of $ln")
    // the linear layout cannot prune the second dimension at all
    assert(lb === ln, s"linear b-pruning should touch all: $lb of $ln")
  }

  test("zo1's two-dimensional aggregate is layout-independent") {
    val zdir = java.nio.file.Files.createTempDirectory("zo2").toString
    Layout.zorderWrite(grid, Seq("a", "b"), zdir, nFiles = 8, bits = 5)
    def agg(df: DataFrame) = df
      .filter(col("a").between(10, 20) && col("b").between(30, 50))
      .agg(count(lit(1)), sum("payload")).as[(Long, Long)].head()
    assert(agg(spark.read.parquet(zdir)) === agg(grid))
  }

  test("append clusters with the SAVED cuts; compact folds files back; " +
      "content and pruning invariant throughout") {
    val dir = java.nio.file.Files.createTempDirectory("zoapp").toString
    val half1 = grid.filter(col("payload") % 2 === 0)
    val half2 = grid.filter(col("payload") % 2 === 1)
    Layout.zorderWrite(half1, Seq("a", "b"), dir, nFiles = 8, bits = 6)
    Layout.zorderAppend(half2, dir, nFiles = 4)
    assert(spark.read.parquet(dir).count() === 4096)
    // under the __zp partition scheme each range task writes one file
    // per z-prefix slice it overlaps: >= the 12 requested (8 build +
    // 4 append), bounded by requested + slice straddles
    val (aT, aN) = filesTouched(dir, "a", 0, 7)
    assert(aN >= 12 && aN <= 12 + 2 * 16,
      s"8 build + 4 append tasks across 16 slices, got $aN files")
    assert(aT < aN, s"a-pruning lost after append: $aT of $aN")
    val (bT, _) = filesTouched(dir, "b", 0, 7)
    assert(bT < aN, s"b-pruning lost after append: $bT of $aN")

    Layout.compactLayout(spark, dir, nFiles = 8)
    val (cA, cN) = filesTouched(dir, "a", 0, 7)
    val (cB, _) = filesTouched(dir, "b", 0, 7)
    // compaction rewrites per occupied z-prefix slice (16 here, all
    // occupied under uniform data), at least one file each; slices are
    // BIT-ALIGNED, so the touched set is deterministic: a in [0,7]
    // fixes a5=a4=0, leaving 4 of the 16 (a5,b5,a4,b4) slices
    assert(cN === 16, s"one file per occupied slice expected, got $cN")
    assert(cA <= cN / 2 && cB <= cN / 2,
      s"compacted pruning: a=$cA b=$cB of $cN")
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096)
    assert(back.agg(sum("payload")).as[Long].head() ===
      grid.agg(sum("payload")).as[Long].head())

    // _zmeta survives compaction: further appends still cluster
    Layout.zorderAppend(grid.limit(10), dir, nFiles = 1)
    assert(spark.read.parquet(dir).count() === 4106)
  }

  test("zvalue handles constant and null-bearing columns") {
    val df = spark.range(100)
      .select(lit(5L).as("a"),
        when(col("id") % 10 === 0, null).otherwise(col("id")).as("b"))
    val z = df.withColumn("z", Layout.zvalue(df, Seq("a", "b"), 4))
    // all rows get a defined z-value; constant column contributes one bucket
    assert(z.filter(col("z").isNull).count() === 0)
    assert(z.select(countDistinct("z")).as[Long].head() >= 2)
  }
}
