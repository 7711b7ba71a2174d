package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel-stage event after stage mapping. `et` is the watermarked
  * event-time column — it must reach the stateful operator unprojected
  * or Spark rejects the event-time timeout. */
final case class FunnelIn(user: Long, et: java.sql.Timestamp, stage: Int) {
  def ts: Long = et.getTime / 1000L
}

/** A buffered (epoch-second ts, stage) point — state stores these, not
  * the full input rows. */
final case class FunnelPoint(ts: Long, stage: Int)

/** Per-user streaming state: the pruned buffer of potentially-relevant
  * stage events. Bounded: one stage-0 point (the anchor) plus stage>0
  * events inside the anchor's window or ahead of the watermark. */
final case class FunnelStreamState(events: Seq[FunnelPoint])

/** A completed funnel: slot timestamps (null = stage not reached). */
final case class FunnelDone(user_id: Long, slots: Seq[Option[Long]],
                            funnel_depth: Int)

/** Streaming face of [[graft.operators.Funnel.funnel]]: per-user funnel
  * progression held in `flatMapGroupsWithState`, finalized and emitted
  * EXACTLY ONCE when the watermark passes the conversion window's end
  * (funnel entry + windowS) — at that point no in-watermark event can
  * change the outcome, so the emitted row equals the batch fold.
  *
  * State is bounded, not history-sized: per user it holds
  *
  *  - the anchor (the earliest stage-0 event; non-minimal stage-0
  *    events can never become the anchor and are dropped on sight),
  *  - stage>0 events inside `(anchor, anchor + windowS]` — the only
  *    ones the fold can use,
  *  - stage>0 events ahead of the current watermark — late-arriving
  *    stage-0 events are watermark-bounded below, so an event at or
  *    behind the watermark can never belong to a FUTURE (lower) anchor
  *    and is dropped once outside the current window.
  *
  * Out-of-order arrival is exact: finalization replays the buffer
  * time-sorted through the batch recurrence, and the pruning rules
  * above never discard an event a lower future anchor could need.
  *
  * Unlike the batch operator (one funnel per user over a finite
  * dataset), the stream has no end-of-time: funnels REPEAT — when a
  * window finalizes, the next funnel anchors at the user's first entry
  * event past that window's end (windows never overlap), one emitted
  * row per completed window. Entry events inside an open window are
  * consumed by it, exactly as in the batch fold.
  */
object FunnelStream {

  /** Completed funnels as (user_id, s1_ts..sk_ts, funnel_depth) —
    * append-mode; rows appear once the watermark passes each funnel's
    * window end. `eventTimeCol` must be a timestamp column. */
  def funnelCompletions(events: DataFrame, userCol: String,
      eventTimeCol: String, stageCol: String, stages: Seq[String],
      windowS: Long, watermark: String = "1 hour"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val k = stages.size
    val stageIdx = graft.operators.Funnel.stageIndex(col(stageCol), stages)
    val ds = events
      .withWatermark(eventTimeCol, watermark)
      .filter(col(stageCol).isin(stages: _*))
      .select(col(userCol).cast("long").as("user"),
        col(eventTimeCol).as("et"),
        stageIdx.cast("int").as("stage"))
      .as[FunnelIn]
    val done = ds.groupByKey(_.user)
      .flatMapGroupsWithState[FunnelStreamState, FunnelDone](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(k, windowS))
    done.toDF().select(
      col("user_id") +:
        (0 until k).map(i => col("slots")(i).as(s"s${i + 1}_ts")) :+
        col("funnel_depth"): _*)
  }

  /** One handler for both data and timeout invocations (`rows` is
    * empty on timeout): merge, then loop — every funnel whose window
    * the watermark has passed finalizes and emits, its leftovers seed
    * the next one; the first still-open funnel (or anchorless buffer)
    * re-arms the state and its timeout. */
  private def process(k: Int, windowS: Long)(user: Long,
      rows: Iterator[FunnelIn],
      state: GroupState[FunnelStreamState]): Iterator[FunnelDone] = {
    val wmS = state.getCurrentWatermarkMs() / 1000L
    val prev = if (state.exists) state.get.events else Seq.empty
    var buf = prev ++ rows.map(r => FunnelPoint(r.ts, r.stage))
    val out = Seq.newBuilder[FunnelDone]
    var open = true
    while (open) {
      buf.filter(_.stage == 0).map(_.ts).minOption match {
        // STRICTLY past: wmS is the truncated watermark, so at
        // wmS == a+windowS an admissible event (event-time just above
        // the watermark) can still truncate INTO the inclusive window;
        // only wmS > a+windowS guarantees every future event's
        // truncated ts lands beyond it (matches the +1 s timeout slack)
        case Some(a) if a + windowS < wmS =>
          // watermark has passed this funnel's window end — no
          // in-watermark event can change it; emit and continue with
          // the events beyond the window (the next funnel's seed)
          out ++= finalizeFunnel(user, buf, k, windowS)
          buf = buf.filter(_.ts > a + windowS)
        case Some(a) =>
          // open funnel: keep the anchor, this window's stage>0
          // events, and everything that can matter later — entry
          // events after the window (the NEXT funnel starts at the
          // first entry past this window's end) and any event still
          // ahead of the watermark (a late, lower entry is
          // watermark-bounded below, so at-or-behind-watermark events
          // outside the window are settled)
          buf = buf.filter { p =>
            if (p.stage == 0) p.ts == a || p.ts > a + windowS
            else (p.ts > a && p.ts <= a + windowS) || p.ts > wmS
          }
          state.update(FunnelStreamState(buf))
          state.setTimeoutTimestamp((a + windowS) * 1000L + 1000L)
          open = false
        case None =>
          // no entry yet: only events ahead of the watermark can pair
          // with a future anchor; GC once the watermark passes them
          buf = buf.filter(_.ts > wmS)
          if (buf.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(FunnelStreamState(buf))
            state.setTimeoutTimestamp(
              (buf.map(_.ts).max + windowS) * 1000L + 1000L)
          }
          open = false
      }
    }
    out.result().iterator
  }

  /** The batch recurrence over the time-sorted buffer. */
  private def finalizeFunnel(user: Long, events: Seq[FunnelPoint], k: Int,
      windowS: Long): Seq[FunnelDone] = {
    val sorted = events.sortBy(p => (p.ts, p.stage))
    val slots = Array.fill[Option[Long]](k)(None)
    sorted.foreach { p =>
      if (p.stage == 0) {
        if (slots(0).isEmpty) slots(0) = Some(p.ts)
      } else if (slots(p.stage).isEmpty && slots(p.stage - 1).nonEmpty &&
        slots(0).nonEmpty && p.ts > slots(p.stage - 1).get &&
        p.ts <= slots(0).get + windowS) {
        slots(p.stage) = Some(p.ts)
      }
    }
    if (slots(0).isEmpty) Seq.empty
    else Seq(FunnelDone(user, slots.toSeq, slots.count(_.nonEmpty)))
  }
}
