package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming face of [[graft.operators.Sessionize]]: gap sessionization
  * over an unbounded event stream with Spark's native `session_window`
  * (merging session aggregation — the state store holds one in-flight
  * session per key, not the events, and the watermark closes sessions).
  *
  * Scale shape: state is (active keys × one session row), independent of
  * history length; a closed session emits exactly once (append mode)
  * when the watermark passes its end, so downstream consumers see each
  * session as one immutable row. No window-function shuffle at all —
  * the aggregation is a streaming hash agg on (keys, merged window).
  *
  * Gap rule parity with the batch operator: event times are
  * SECOND-granularity here (the carbon/event tables' grain); a gap of
  * exactly `gapS` stays inside the session — `session_window`'s
  * half-open [ts, ts+gap) merge window realizes the batch `> gapS`
  * split rule with a (gapS+1)-second gap duration.
  */
object SessionStream {

  /** Per-session stats over a stream: `n_events`, `start_ts`/`end_ts`
    * (epoch seconds), `duration_s`, plus `extraAggs`. `eventTimeCol`
    * must be a timestamp column at second granularity; sessions split
    * where consecutive events are more than `gapS` seconds apart
    * (exactly-`gapS` gaps merge, matching
    * [[graft.operators.Sessionize.byGap]]). Sessions emit once closed
    * by the watermark (append mode). */
  def sessionStats(events: DataFrame, keys: Seq[String],
      eventTimeCol: String, gapS: Long, watermark: String = "1 hour",
      extraAggs: Seq[Column] = Nil): DataFrame = {
    require(gapS > 0, s"gapS must be positive: $gapS")
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(unix_timestamp(col(eventTimeCol))).as("start_ts"),
      max(unix_timestamp(col(eventTimeCol))).as("end_ts"),
      (max(unix_timestamp(col(eventTimeCol))) -
        min(unix_timestamp(col(eventTimeCol)))).as("duration_s")) ++
      extraAggs
    events
      .withWatermark(eventTimeCol, watermark)
      .groupBy(
        session_window(col(eventTimeCol), s"${gapS + 1} seconds") +:
          keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop("session_window")
  }
}
