package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Scd

/** Streaming SCD2 maintenance: a CDC/changelog stream keeps a
  * dimension's interval table current.
  *
  * Two artifacts, both partitioned by a key-hash bucket `__kb`:
  *  - `logDir` — the RAW changelog, append-only. Raw is retained
  *    because SCD2 compression is lossy (a no-op update that was
  *    dropped can become load-bearing once a late row lands between
  *    it and its predecessor), so correct incremental maintenance
  *    rebuilds from raw history, never from the compressed table.
  *  - `scdDir` — the interval table, rebuilt per micro-batch for ONLY
  *    the buckets the batch touches (dynamic partition overwrite).
  *
  * Scale shape: the per-batch rebuild reads `logDir` partition-pruned
  * to the touched buckets — cost proportional to the touched keys'
  * history share, not the dimension. Touched-bucket discovery is a
  * `distinct` over the batch's bucket column (≤ nBuckets rows of
  * planning metadata). Crash replay is harmless by construction: a
  * replayed append lands byte-identical (key, ts, seq) rows, and
  * [[Scd.scd2]]'s last-write-wins `max(struct(seq, attrs))` absorbs
  * exact duplicates — the rebuilt intervals are identical, and the
  * duplicate log rows are storage-only until [[compactLog]] drops
  * them (the repo-wide append/compact contract; compaction must not
  * run concurrently with the stream). */
object ScdStream {

  private def bucketed(df: DataFrame, keyCol: String, nBuckets: Int): DataFrame =
    df.withColumn("__kb", pmod(xxhash64(col(keyCol)), lit(nBuckets)).cast("int"))

  /** Append one micro-batch's raw rows to the changelog, under the
    * appender side of the repo-wide compaction guard — a batch that
    * would land mid-[[compactLog]] (and be silently dropped by a
    * slice's read-then-overwrite) fails fast instead, and Structured
    * Streaming replays it after the compaction releases. */
  private[graft] def appendLog(b: DataFrame, logDir: String): Unit =
    graft.sources.Compaction.guardedAppend(b.sparkSession, logDir) {
      b.write.partitionBy("__kb").mode("append").parquet(logDir)
    }

  /** Rebuild the SCD2 partitions for `touched` buckets from the raw
    * log (partition-pruned read, dynamic partition overwrite).
    * Exposed for the spec's replay-idempotency drive. */
  private[streaming] def rebuildBuckets(spark: SparkSession, logDir: String,
      scdDir: String, touched: Seq[Int], keyCol: String, tsCol: String,
      seqCol: String, attrCols: Seq[String], nBuckets: Int): Unit = {
    if (touched.isEmpty) return
    val hist = spark.read.parquet(logDir)
      .filter(col("__kb").isin(touched.map(Integer.valueOf): _*))
    bucketed(
        Scd.scd2(hist, Seq(keyCol), tsCol, seqCol, attrCols),
        keyCol, nBuckets)
      .write.partitionBy("__kb")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(scdDir)
  }

  /** Start the maintenance job: each micro-batch appends its raw rows
    * to `logDir` (stamped `batch_seq`) and rebuilds the touched
    * `scdDir` buckets. Readers of `scdDir` see the usual SCD2 columns
    * plus the `__kb` partition column. */
  def startScd2Job(changelog: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, attrCols: Seq[String], logDir: String, scdDir: String,
      checkpointDir: String, nBuckets: Int = 64): StreamingQuery = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = bucketed(batch, keyCol, nBuckets)
          .withColumn("batch_seq", lit(batchId))
          .localCheckpoint(true) // batch-sized; two writes below
        try {
          appendLog(b, logDir)
          val touched = b.select("__kb").distinct()
            .collect().map(_.getInt(0)).toSeq // planning metadata
          rebuildBuckets(spark, logDir, scdDir, touched,
            keyCol, tsCol, seqCol, attrCols, nBuckets)
        } finally {
          // a long-running stream must not pin every batch's blocks
          b.unpersist()
        }
        ()
      }
      .start()
  }

  /** Drop replay-duplicated raw rows bucket by bucket (bounded
    * staging, dynamic overwrite). Content-level: two log rows are
    * duplicates iff every column matches — exactly what a replayed
    * append produces (same batch_seq included). Guarded
    * ([[graft.sources.Compaction]]): a live stream's append fails
    * fast instead of being silently dropped by a bucket's
    * read-then-overwrite. */
  def compactLog(spark: SparkSession, logDir: String): Unit =
      graft.sources.Compaction.guardedCompaction(spark, logDir) {
    // log listed ONCE, INSIDE the guard (the rewriteSlices ordering
    // contract); each bucket's overwrite replaces only its own __kb
    // dir, which no later bucket reads
    val base = spark.read.parquet(logDir)
    val buckets = base
      .select("__kb").distinct().collect().map(_.getInt(0)).sorted.toSeq
    graft.sources.Compaction.rewriteSlices(buckets, 1) {
      slice => base.filter(col("__kb") === slice.head).dropDuplicates()
    } { (staged, _) =>
      staged.write.partitionBy("__kb")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(logDir)
    }
  }
}
