package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Quality
import graft.operators.Quality.{AcceptedValues, InRange, NotNull, Rule}

/** Streaming face of the [[graft.operators.Quality]] gate — the
  * validate-before-ingest step of a continuously-fed corpus.
  *
  * Per micro-batch:
  *  - ROW rules (not-null / range / accepted-values) route each
  *    record: clean rows land in `outDir`, violating rows in
  *    `quarantineDir` with a `violations` array naming every rule the
  *    row broke (the triage column a data steward works from).
  *  - The relation-level verdict — ALL rules, including uniqueness
  *    within the batch and FK rules — is appended to `verdictsDir`,
  *    one row per rule per batch, stamped `batch_seq`.
  *
  * Scale shape: routing is a codegen'd array-of-whens per row (no
  * shuffle at all); the verdict pass is [[Quality.validate]]'s single
  * aggregate over the (checkpointed-once) batch. Crash replays re-emit
  * identical rows with the same `batch_seq`; readers resolve by the
  * repo's batch_seq last-write-wins contract. Uniqueness here is
  * per-batch by design — cross-batch key uniqueness is a stateful
  * question answered by [[DocumentStream.startHistoryDedupJob]]'s
  * pattern, not a row filter. */
object QualityStream {

  /** Rules usable for per-row routing (single-row predicates). */
  private def isRowRule(r: Rule): Boolean = r match {
    case _: NotNull | _: InRange | _: AcceptedValues => true
    case _ => false
  }

  def startValidationJob(records: DataFrame, rules: Seq[Rule],
      outDir: String, quarantineDir: String, verdictsDir: String,
      checkpointDir: String): StreamingQuery = {
    require(rules.nonEmpty, "validation needs at least one rule")
    val rowRules = rules.filter(isRowRule)
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint(true) // read 3x below
        try {
          val flagged = b.withColumn("violations",
            array_compact(array(rowRules.map(r =>
              when(Quality.rowViolated(r), lit(r.name))): _*)))
          flagged.filter(size(col("violations")) === 0)
            .drop("violations")
            .withColumn("batch_seq", lit(batchId))
            .write.mode("append").parquet(outDir)
          flagged.filter(size(col("violations")) > 0)
            .withColumn("batch_seq", lit(batchId))
            .write.mode("append").parquet(quarantineDir)
          Quality.validate(b, rules)
            .withColumn("batch_seq", lit(batchId))
            .write.mode("append").parquet(verdictsDir)
        } finally b.unpersist()
        ()
      }
      .start()
  }
}
