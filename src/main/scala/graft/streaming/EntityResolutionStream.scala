package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{EntityResolution, MasterVariants}

/** Streaming face of [[graft.operators.EntityResolution]]: dirty
  * records arrive continuously (CRM feeds, order streams) and must be
  * matched against a FROZEN master registry before they land — the
  * lookup-against-master-data shape of entity resolution, expressed
  * per micro-batch.
  *
  * Scale shape: the registry's deletion-variant table is computed
  * ONCE at job start and written to DURABLE storage under the
  * checkpoint dir (vocabulary-scale — never the row count — so the
  * per-batch read is cheap and usually broadcastable; Catalyst/AQE
  * picks the join strategy per batch against the actual batch size).
  * Durable, not localCheckpoint: a job-lifetime checkpointed RDD dies
  * with any executor that held its blocks (lineage is truncated), and
  * a streaming job runs for weeks. Each micro-batch pays only its OWN
  * variant expansion plus the variant equi-join and the
  * partial-aggregatable argmin — no state store at all, because the
  * registry is static and record batches are independent: crash
  * replays re-match a batch identically (the matching is
  * deterministic) and resolve by `batch_seq` last-write-wins on read,
  * the repo's standard replay contract. */
object EntityResolutionStream {

  /** Match each streamed record's `keyCol` to its nearest master key
    * within Levenshtein distance `k` (null when none) and append the
    * matched batch to `outDir`, stamped with `batch_seq` = batchId. */
  def startNearestMasterJob(records: DataFrame, keyCol: String,
      masters: DataFrame, masterCol: String, outDir: String,
      checkpointDir: String, k: Int = 1): StreamingQuery = {
    // frozen registry: expanded once, persisted durably (restart
    // recomputes it — the registry is frozen, so the rewrite is
    // idempotent), then read back so every micro-batch's lineage roots
    // in storage rather than in some executor's block manager
    val spark = records.sparkSession
    val mvPath = s"$checkpointDir/master_variants"
    EntityResolution.masterVariants(masters, masterCol, k).df
      .write.mode("overwrite").parquet(mvPath)
    val masterVars = MasterVariants(spark.read.parquet(mvPath), k)
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        EntityResolution
          .nearestMasterAgainstVariants(batch, keyCol, masterVars)
          .withColumn("batch_seq", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
  }
}
