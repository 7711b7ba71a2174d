package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Clustering, Similarity}

/** Streaming ANN index maintenance: keep a persisted
  * [[graft.operators.Similarity.buildIvfIndex]] (or
  * [[graft.operators.ProductQuantization.buildIvfPqIndex]] — detected
  * by its codebooks artifact) inverted file current as embedding
  * batches stream in — the online half of the train-once / probe-many
  * contract (FAISS add() on a schedule).
  *
  * Each micro-batch is assigned against the FROZEN persisted
  * centroids and appended into the existing cell partitions via
  * [[Similarity.appendToIvfIndex]]. Like
  * [[DocumentStream.startHistoryDedupJob]], the durable index IS the
  * state: the streaming engine holds none, and crash replays are
  * idempotent BY CONSTRUCTION — a replayed id is anti-joined against
  * the postings already in its (deterministically assigned) target
  * cell, so the second application appends nothing. The anti-join
  * reads only the batch's affected cell partitions, and only their id
  * column (partition pruning + column pruning — micro-batch-scale
  * work regardless of index size). */
object IndexStream {

  /** Append the batch's NOVEL vectors (ids not already in their target
    * cells) to the index. Batch-callable for replay tests; the
    * streaming face is [[startIvfAppendJob]]. */
  private[streaming] def appendNovelVectors(batch: DataFrame,
      idCol: String, vecCol: String, indexDir: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // resolve through the generation pointer (a retrained float index
    // lives at manifest-named paths; PQ indexes never have one and
    // resolve to the fixed paths). Ids survive a retrain, so an
    // interleaved retrain cannot break the anti-join's idempotency.
    val (centPath, postPath) = Similarity.livePaths(spark, indexDir)
    val cents = spark.read.parquet(centPath)
    // within-batch duplicate ids would append two postings for one id
    // (double-occupying probe ranks); keep one deterministically —
    // smallest vector by element-wise array ordering, the
    // DocumentStream within-batch min_by pattern
    val uniq = batch
      .groupBy(col(idCol).as("__id"))
      .agg(min(struct(col(vecCol))).as("__w"))
      .select(col("__id"), col(s"__w.$vecCol").as("__v"))
    // assignment is deterministic, so a replayed id lands in the same
    // cell — scanning the assigned cells' postings finds every copy a
    // previous (possibly half-committed) application wrote
    val assigned = Clustering.assignCells(uniq, "__id", "__v", cents)
      .localCheckpoint(true) // feeds the cell list AND the anti-join
    val cells = assigned.select("cell_id").distinct().collect()
      .map(_.get(0)).toSeq
    val existing = spark.read.parquet(postPath)
      .filter(col("cell_id").isin(cells: _*))
      .select(col("neighbor_id").as("__id"))
    val novel = assigned.join(existing, Seq("__id"), "left_anti")
      .select(col("__id").as(idCol), col("__v").as(vecCol))
    if (!novel.isEmpty) {
      // both index layouts share the postings schema this job relies on
      // (neighbor_id + cell_id partitions); dispatch on the one artifact
      // that distinguishes them
      if (isPq(spark, indexDir))
        graft.operators.ProductQuantization.appendToIvfPqIndex(
          novel, idCol, vecCol, indexDir)
      else Similarity.appendToIvfIndex(novel, idCol, vecCol, indexDir)
    }
  }

  /** An IVF-PQ index carries `dir/codebooks`; a float IVF index does
    * not. */
  private def isPq(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/codebooks")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Start the maintenance job: every micro-batch of (idCol, vecCol)
    * rows is appended to the index at `indexDir`, exactly once per id
    * even across crash replays. The quantizer stays frozen between
    * maintenance windows — when the embedding distribution drifts, run
    * [[Similarity.retrainIvfIndex]] against the SAME dir (it excludes
    * in-flight appends via the compaction guard and swaps the
    * generation pointer); this job picks up the new generation on its
    * next batch with no restart. */
  def startIvfAppendJob(embeddings: DataFrame, idCol: String,
      vecCol: String, indexDir: String,
      checkpointDir: String): StreamingQuery =
    embeddings.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendNovelVectors(batch, idCol, vecCol, indexDir)
      }
      .start()
}
