package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — group each key's time-ordered rows into
  * sessions split wherever consecutive timestamps are more than `gapS`
  * apart (the standard web-analytics/user-journey operator; the same
  * segmentation a curation pipeline uses to build interaction episodes
  * from event logs).
  *
  * One window pass over the key partition (lag to flag session starts,
  * running sum to number them) — a single shuffle on `keys`, with the
  * per-partition sort bounded by one key's history. No state store, no
  * driver-side grouping; at 100 TB this is the same plan at the same
  * shuffle count.
  */
object Sessionize {

  /** Append `session_seq` (1-based per key, in time order). Rows with
    * equal timestamps within a key are ordered by `tieBreak` so
    * numbering is deterministic; a gap of EXACTLY `gapS` stays inside
    * the session (strict `>` splits). */
  def byGap(df: DataFrame, keys: Seq[String], tsCol: String, gapS: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(gapS > 0, s"gapS must be positive: $gapS")
    require(!df.columns.contains("session_seq") &&
      !df.columns.contains("__start"),
      "input already has a session_seq/__start column")
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isStart = when(prev.isNull || col(tsCol) - prev > gapS, 1L)
      .otherwise(0L)
    df.withColumn("__start", isStart)
      .withColumn("session_seq", sum(col("__start"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__start")
  }

  /** Per-session aggregate: event count, start/end ts, duration. The
    * sessionized rows collapse with one more shuffle on
    * `(keys, session_seq)`; `agg` columns (e.g. `sum(value)`) ride
    * along. */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
      gapS: Long, tieBreak: Seq[String] = Nil,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val sessions = byGap(df, keys, tsCol, gapS, tieBreak)
    val base = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("start_ts"),
      max(col(tsCol)).as("end_ts"),
      (max(col(tsCol)) - min(col(tsCol))).as("duration_s"))
    sessions.groupBy((keys :+ "session_seq").map(col): _*)
      .agg(base.head, (base.tail ++ extraAggs): _*)
  }
}
