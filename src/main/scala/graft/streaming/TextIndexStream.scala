package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Retrieval

/** Streaming text-index maintenance: keep a persisted
  * [[graft.operators.Retrieval.buildTextIndex]] inverted index current
  * as document batches stream in — the text twin of [[IndexStream]]'s
  * IVF maintenance job, closing the index family's last batch-only
  * asymmetry (reference analog: the metadata/carbon ingest loop that
  * keeps the SASI/Lucene name index current, plugins/carbon.py).
  *
  * Like [[IndexStream]] and [[DocumentStream.startHistoryDedupJob]],
  * the durable index IS the state — the streaming engine holds none —
  * but the text index improves on the IVF path's idempotency story:
  * each micro-batch lands as ONE write job carrying both the batch's
  * postings (term-bucket partitions) and one
  * [[Retrieval.MarkerBucket]] marker row per doc. Spark's commit
  * protocol publishes a job's files across all partitions together, so
  * a doc's postings and its presence record can never be separated by
  * a crash, and replays are idempotent BY CONSTRUCTION: a replayed
  * doc_id anti-joins against the marker partition — one directory,
  * doc_id column only, micro-batch-scale work regardless of index
  * size — and appends nothing the second time. The stats file is never
  * touched; [[Retrieval.bm25IndexTopK]] folds the marker aggregate
  * into N/avgdl at probe time, so a probe after build(A) + streamed(B)
  * is bit-identical to build(A∪B).
  *
  * Appends accumulate one file per touched bucket per batch; run
  * [[Retrieval.compactTextIndex]] on a schedule — WITH THIS JOB
  * STOPPED OR DRAINED (compaction reads then rewrites slices; a batch
  * committed in between would be lost) — to fold them. Markers carry
  * the micro-batch id as `__seq`: compaction keeps only the newest
  * batch's markers (the one batch Structured Streaming can replay)
  * and folds the rest into a single stats row, so the marker
  * partition — and with it the probe-time stats aggregate and this
  * job's anti-join — stays micro-batch-sized forever. The doc-id
  * dedup this anti-join gives is therefore scoped: crash replays are
  * always caught; a doc RE-SUBMITTED in a later batch is caught until
  * a compaction folds its marker (full-history content dedup is
  * [[DocumentStream.startHistoryDedupJob]]'s contract, upstream). */
object TextIndexStream {

  /** Append the batch's NOVEL docs (ids without a marker row) to the
    * index, stamping `batchSeq` on every row. Batch-callable for
    * replay tests; the streaming face is [[startTextAppendJob]]. */
  private[streaming] def appendNovelDocs(batch: DataFrame, idCol: String,
      textCol: String, indexDir: String, batchSeq: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val nBuckets = spark.read.parquet(s"$indexDir/stats")
      .select("__nbuckets").head().getInt(0)
    // within-batch duplicate ids would double a doc's postings and its
    // stats contribution; keep one deterministically — smallest text —
    // the IndexStream/DocumentStream within-batch min_by pattern
    val uniq = batch
      .groupBy(col(idCol).as("doc_id"))
      .agg(min(struct(col(textCol))).as("__w"))
      .select(col("doc_id"), col(s"__w.$textCol").as("__text"))
    // presence = the marker partition: partition-pruned to one
    // directory, column-pruned to doc_id — batch-scale anti-join work
    // no matter how large the index has grown
    val applied = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term_bucket") === Retrieval.MarkerBucket)
      .select("doc_id")
    val novel = uniq.join(applied, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // feeds the emptiness probe AND the write
    if (!novel.isEmpty)
      Retrieval.appendDocsWithMarkers(novel, "doc_id", "__text",
        indexDir, nBuckets, batchSeq)
  }

  /** Start the maintenance job: every micro-batch of (idCol, textCol)
    * rows is appended to the index at `indexDir`, exactly once per doc
    * id even across crash replays (re-submissions in later batches are
    * additionally deduped back to the last compaction's fold horizon —
    * see the object doc). Tokenization and bucketing follow the
    * index's build-time convention (nBuckets is read from its stats
    * artifact), so streamed and built postings are indistinguishable
    * to a probe. */
  def startTextAppendJob(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendNovelDocs(batch, idCol, textCol, indexDir, batchId)
      }
      .start()
}
