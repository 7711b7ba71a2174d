package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines (beyond-reference scope,
  * SURVEY.md §7.4): assign documents to fixed-token-budget packs (context
  * windows) so batch assembly wastes minimal padding.
  *
  * The packing is GREEDY-BY-ID within hash shards: documents are sharded
  * by `id % numShards`, ordered by id inside each shard, and appended to
  * the current pack until the next document would overflow `capacity`
  * (an over-long document occupies a pack alone). Deterministic —
  * identical output in any engine, rerun, or partitioning — unlike
  * first-fit-decreasing, whose quality is marginally better but whose
  * output depends on global sort order of equal-length docs.
  *
  * Scale shape: packing is inherently sequential, so the sequential unit
  * is the SHARD, not the corpus. Each shard packs independently inside
  * one `flatMapGroups` call (one shuffle on the shard key); pick
  * `numShards` so a shard's (id, n_tokens) pairs fit an executor — at
  * 100 TB that's simply more shards, the per-shard state is 16 bytes/doc.
  */
object Packing {

  /** Pack documents into `capacity`-token bins. `docs` needs a numeric id
    * column and a token-count column. Emits one row per document:
    * (idCol, shard, pack_idx, pack_pos, n_tokens) — pack_idx is the bin
    * ordinal within the shard, pack_pos the 1-based slot inside the bin. */
  def packGreedy(docs: DataFrame, idCol: String, tokensCol: String,
      capacity: Long, numShards: Int = 64): DataFrame = {
    require(capacity > 0 && numShards > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(tokensCol).cast("long"),
        pmod(col(idCol).cast("long"), lit(numShards.toLong)))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, rows) =>
        val sorted = rows.toArray.sortBy(_._1)
        var acc = 0L
        var pack = 0L
        var pos = 0L
        sorted.iterator.map { case (id, n, _) =>
          if (acc > 0 && acc + n > capacity) { pack += 1; acc = 0L; pos = 0L }
          acc += n
          pos += 1
          (id, shard, pack, pos, n)
        }
      }
      .toDF(idCol, "shard", "pack_idx", "pack_pos", "n_tokens")
  }

  /** Padding-waste summary per shard: packs, docs, token utilisation of
    * the `capacity` budget (the number a pipeline owner actually watches). */
  def packingStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy("shard")
      .agg(
        (max("pack_idx") + 1).as("n_packs"),
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens"),
        round(sum("n_tokens") / ((max("pack_idx") + 1) * capacity.toDouble), 6)
          .as("utilisation"))

  /** Fixed-token-window chunking with stride — split each document's
    * whitespace tokens into `window`-token chunks whose starts step by
    * `stride` (stride < window = overlapping context windows, the usual
    * pretraining shape). Emits one row per chunk: (idCol, chunk_idx,
    * tok_start, n_tokens, chunk_hash) with chunk_hash an md5 over the
    * space-rejoined tokens (chunk-level exact dedup key).
    *
    * Pure generator expressions (split + sequence + explode + slice) —
    * map-only, no shuffle, codegen'd; at 100 TB the explode widens rows
    * by ~len/stride but never materializes cross-document state. */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0)
    val toks = split(trim(col(textCol)), "\\s+")
    // split(trim('')) is [''] (size 1), not [] — count an empty or
    // whitespace-only doc as ZERO tokens or every such doc emits a
    // phantom 1-token chunk sharing md5(''), a giant bogus duplicate
    // class in chunk-level dedup
    val n = when(length(trim(col(textCol))) === 0, lit(0))
      .otherwise(size(toks))
    docs
      .select(col(idCol), toks.as("__toks"), n.as("__n"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)),
          lit(stride))).as("tok_start"))
      .filter(col("tok_start") < col("__n")) // drops the n=0 degenerate
      .select(
        col(idCol),
        (col("tok_start") / stride).cast("long").as("chunk_idx"),
        col("tok_start").cast("long").as("tok_start"),
        size(slice(col("__toks"), col("tok_start") + 1, lit(window)))
          .cast("long").as("n_tokens"),
        md5(array_join(slice(col("__toks"), col("tok_start") + 1,
          lit(window)), " ")).as("chunk_hash"))
  }
}
