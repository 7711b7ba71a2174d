package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EntityResolution

/** Streaming face of [[graft.operators.EntityResolution]]: dirty
  * records arrive continuously (CRM feeds, order streams) and must be
  * matched against a FROZEN master registry before they land — the
  * lookup-against-master-data shape of entity resolution, expressed
  * per micro-batch.
  *
  * Scale shape: the registry's deletion-variant table is computed and
  * materialized ONCE at job start (vocabulary-scale — never the row
  * count — so it is usually broadcastable; Catalyst/AQE picks the join
  * strategy per batch against the actual batch size). Each micro-batch
  * pays only its OWN variant expansion plus the variant equi-join and
  * the partial-aggregatable argmin — no state store at all, because
  * the registry is static and record batches are independent: crash
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
    // frozen registry: expanded once, reused by every micro-batch
    val masterVars = EntityResolution
      .masterVariants(masters, masterCol, k)
      .localCheckpoint(true)
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        EntityResolution
          .nearestMasterAgainstVariants(batch, keyCol, masterVars, k)
          .withColumn("batch_seq", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
  }
}
