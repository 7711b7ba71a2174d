package graft.streaming

import graft.model._

/** Incremental per-metric downsampling state: a ring buffer of stage0 slots
  * plus one running (timestamp, value, count) per coarser stage.
  *
  * Reference: biggraphite/drivers/_downsampling.py:85-349 (MetricAggregates)
  * and :29-83 (Downsampler). Semantics preserved:
  *   - stage0 last-write-wins per step while inside the `capacity`-slot ring
  *     buffer; points older than the buffer are silently dropped from rollups
  *   - advancing the buffer *expires* the overwritten slots; expired points
  *     are committed into each coarser stage's running aggregate
  *   - non-expired (still-buffered) points are merged into emitted coarse
  *     aggregates WITHOUT committing them (they are re-emitted on change)
  *   - emitted rows are (timestamp, value, count, stage); persisting every
  *     emission with last-write-wins per (stage, ts) reproduces the store
  */
final class MetricAggregates(metadata: MetricMetadata, capacity: Int = 20) {
  private val retention = metadata.retention
  private val stage0 = retention.stage0
  private val nStages = retention.stages.length

  // ring buffer of stage0 values; NaN = empty slot
  private val buffer = Array.fill(capacity)(Double.NaN)
  private var stage0Ts: Long = -1L
  // per coarser stage (index 1..n-1): running (ts, value, count)
  private val stageTs = Array.fill(nStages)(-1L)
  private val stageValue = Array.fill(nStages)(Double.NaN)
  private val stageCount = Array.fill(nStages)(0.0)

  /** Restore from a checkpointed snapshot (streaming state). */
  def restore(st: MetricAggregates.State): this.type = {
    Array.copy(st.buffer, 0, buffer, 0, capacity)
    stage0Ts = st.stage0Ts
    Array.copy(st.stageTs, 0, stageTs, 0, nStages)
    Array.copy(st.stageValue, 0, stageValue, 0, nStages)
    Array.copy(st.stageCount, 0, stageCount, 0, nStages)
    this
  }

  /** One emitted downsampled point. */
  final case class Emitted(ts: Long, value: Double, count: Double, stage: Stage)

  /** Feed points (any order); returns emitted rows for all stages
    * (_downsampling.py:318-349). */
  def update(pointsIn: Seq[(Long, Double)]): Seq[Emitted] = {
    val points = pointsIn.sortBy(_._1)
    val (updated, expired) = updateStage0(points)
    if (updated.isEmpty) return Nil
    val nonExpired = nonExpiredStage0Points()
    val out = Seq.newBuilder[Emitted]
    out ++= updated
    var i = 1
    while (i < nStages) {
      out ++= updateStage(i, expired, nonExpired)
      i += 1
    }
    out.result()
  }

  /** _downsampling.py:128-189. Returns (updated stage0 emissions,
    * expired (ts, value) raw points). */
  private def updateStage0(points: Seq[(Long, Double)]): (Seq[Emitted], Seq[(Long, Double)]) = {
    if (stage0Ts == -1L) {
      if (points.isEmpty) return (Nil, Nil)
      stage0Ts = points.head._1
    }
    val expired = Seq.newBuilder[(Long, Double)]
    val updated = scala.collection.mutable.LinkedHashMap[Long, Emitted]()
    points.foreach { case (ts, value) =>
      val lastStep = stage0.step(stage0Ts)
      val pointStep = stage0.step(ts)
      val pointTs = stage0.roundDown(ts)
      val idx = math.floorMod(pointStep, capacity.toLong).toInt
      if (pointStep > lastStep) {
        val expiredCount = math.min(pointStep - lastStep, capacity.toLong)
        val startStep = lastStep - (capacity - 1)
        var s = startStep
        while (s < startStep + expiredCount) {
          val i = math.floorMod(s, capacity.toLong).toInt
          if (!buffer(i).isNaN) expired += ((s * stage0.precisionS, buffer(i)))
          buffer(i) = Double.NaN
          s += 1
        }
        stage0Ts = pointTs
        buffer(idx) = value
        updated(pointStep) = Emitted(pointTs, value, 1.0, stage0)
      } else if (pointStep > lastStep - capacity) {
        if (buffer(idx) != value)
          updated(pointStep) = Emitted(pointTs, value, 1.0, stage0)
        buffer(idx) = value
      } // else: older than the buffer — dropped from rollups
    }
    (updated.values.toSeq.sortBy(_.ts), expired.result())
  }

  /** _downsampling.py:191-211. */
  private def nonExpiredStage0Points(): Seq[(Long, Double)] = {
    if (stage0Ts == -1L) return Nil
    val startStep = stage0.step(stage0Ts) - (capacity - 1)
    (startStep until startStep + capacity).flatMap { s =>
      val i = math.floorMod(s, capacity.toLong).toInt
      if (buffer(i).isNaN) None else Some((s * stage0.precisionS, buffer(i)))
    }
  }

  /** _downsampling.py:246-302: commit expired points into the stage's
    * running aggregate, then merge non-expired points into the emission
    * only. */
  private def updateStage(stageIndex: Int, expired: Seq[(Long, Double)],
      nonExpired: Seq[(Long, Double)]): Seq[Emitted] = {
    val stage = retention.stages(stageIndex)
    var curTs = stageTs(stageIndex)
    val curValue = stageValue(stageIndex)
    val curCount = stageCount(stageIndex)
    if (curTs == -1L) {
      val first = expired.headOption.orElse(nonExpired.headOption)
      if (first.isEmpty) return Nil
      curTs = stage.step(first.get._1) * stage.precisionS
    }
    val result = scala.collection.mutable.ArrayBuffer(
      Emitted(curTs, curValue, curCount, stage))
    mergeInto(stage, result, expired)
    val last = result.last
    stageTs(stageIndex) = last.ts
    stageValue(stageIndex) = last.value
    stageCount(stageIndex) = last.count
    mergeInto(stage, result, nonExpired)
    result.toSeq
  }

  /** _downsampling.py:213-244: fold sorted stage0 points into per-step
    * emissions, merging within a step via the metric's aggregator. */
  private def mergeInto(stage: Stage,
      result: scala.collection.mutable.ArrayBuffer[Emitted],
      points: Seq[(Long, Double)]): Unit = {
    val agg = metadata.aggregator
    points.foreach { case (ts, value) =>
      val step = stage.step(ts)
      val cur = result.last
      val curStep = stage.step(cur.ts)
      if (curStep == step) {
        // order ids 0 (old) and 1 (new) emulate oldest→newest list order
        val (v, c) = agg.merge(Seq((cur.value, cur.count, 0L), (value, 1.0, 1L)))
        result(result.length - 1) = Emitted(step * stage.precisionS, v, c, stage)
      } else if (curStep < step) {
        result += Emitted(step * stage.precisionS, value, 1.0, stage)
      }
    }
  }

  /** Serializable snapshot for checkpointable streaming state. */
  def snapshot: MetricAggregates.State =
    MetricAggregates.State(buffer.clone(), stage0Ts,
      stageTs.clone(), stageValue.clone(), stageCount.clone())

  /** _downsampling.py:361-369: idle-state eviction predicate. */
  def obsolete(nowS: Long): Boolean = {
    val keepalive =
      if (retention.downsampledStages.isEmpty) stage0.precisionS * capacity
      else retention.stages(1).precisionS * 2
    stage0Ts < nowS - keepalive
  }
}

object MetricAggregates {
  /** Checkpointable downsampler state (ring buffer + per-stage running
    * aggregates) — a plain product type so Spark encoders can persist it
    * in a streaming state store. */
  final case class State(buffer: Array[Double], stage0Ts: Long,
      stageTs: Array[Long], stageValue: Array[Double], stageCount: Array[Double])
}
