package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analysis over an event stream —
  * the product-analytics counterpart of [[Sessionize]] (the reference's
  * events table feeds both; biggraphite itself stops at time-series
  * aggregation, this is the event-level face a warehouse user expects
  * next to it).
  *
  * Both operators are one-shuffle plans:
  *
  *  - the funnel groups once per user and folds each user's
  *    time-sorted events through a single `aggregate` HOF — the
  *    sequential "earliest stage k after stage k-1, inside the
  *    conversion window" recurrence runs map-side per group, with no
  *    per-stage join cascade (k stages would otherwise be k shuffles,
  *    each over the full event set);
  *  - cohort retention is two aggregates co-partitioned on `user`
  *    (first-touch week, then distinct users per (cohort, offset)) —
  *    the join between them reuses the user_id shuffle.
  *
  * At 100 TB the funnel's per-user fold is bounded by a single user's
  * event history (the same bound sessionization already accepts), and
  * the cohort aggregate's key space (weeks × offsets) is tiny, so the
  * final rollup broadcasts trivially.
  */
object Funnel {

  /** Stage name → 0-based stage index as a when-chain (non-stage values
    * map to NULL). Shared by the batch fold and [[graft.streaming
    * .FunnelStream]] so the two faces cannot drift on stage matching. */
  private[graft] def stageIndex(stageCol: Column,
                                stages: Seq[String]): Column =
    stages.zipWithIndex.tail
      .foldLeft(when(stageCol === stages.head, lit(0))) {
        case (acc, (s, i)) => acc.when(stageCol === s, lit(i))
      }

  /** Earliest-completion ordered funnel.
    *
    * For each user: `t(0)` is the earliest event of `stages(0)`; for
    * `k > 0`, `t(k)` is the earliest event of `stages(k)` with
    * `ts > t(k-1)` and `ts <= t(0) + windowS` (the conversion window
    * anchors at funnel ENTRY, as in the usual product-analytics
    * definition). Strict `>` means same-timestamp events never
    * advance two stages at once, which keeps the result independent
    * of intra-timestamp ordering.
    *
    * Returns one row per user that entered the funnel:
    * `(user, s1_ts .. sk_ts nullable, funnel_depth)`.
    *
    * The fold is exactly the sequential-min recurrence: events are
    * sorted ascending, each stage slot is written at most once (the
    * first eligible event), so slot k holds the minimum eligible
    * timestamp given slots 0..k-1.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             stageCol: String, stages: Seq[String],
             windowS: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val k = stages.size
    // stage index as a compact int; non-stage events are dropped at the
    // scan (pushed filter), so the shuffle carries only funnel events
    val stageIdx = stageIndex(col(stageCol), stages)
    val evs = events
      .filter(col(stageCol).isin(stages: _*))
      .select(col(userCol).as("__u"),
        col(tsCol).cast("long").as("__ts"),
        stageIdx.cast("int").as("__st"))
    val sorted = evs.groupBy(col("__u"))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__st"))))
        .as("__evs"))
    // acc = array of k slot timestamps, null = not reached. One pass.
    val nullTs = lit(null).cast("long")
    val init = array(Seq.fill(k)(nullTs): _*)
    val folded = sorted.select(col("__u"),
      aggregate(col("__evs"), init, (acc, ev) => {
        val ts = ev.getField("__ts")
        val st = ev.getField("__st")
        val slots = (0 until k).map { i =>
          val eligible =
            if (i == 0) acc(0).isNull && st === 0
            else acc(i).isNull && acc(i - 1).isNotNull &&
              st === i && ts > acc(i - 1) && ts <= acc(0) + windowS
          when(eligible, ts).otherwise(acc(i))
        }
        array(slots: _*)
      }).as("__slots"))
    val withCols = (0 until k).foldLeft(folded) { (df, i) =>
      df.withColumn(s"s${i + 1}_ts", col("__slots")(i))
    }
    val depth = (0 until k)
      .map(i => when(col(s"s${i + 1}_ts").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withCols
      .filter(col("s1_ts").isNotNull)
      .withColumn("funnel_depth", depth.cast("int"))
      .select(col("__u").as(userCol) +:
        (0 until k).map(i => col(s"s${i + 1}_ts")) :+
        col("funnel_depth"): _*)
  }

  /** Weekly cohort retention: users are cohorted by the epoch week of
    * their first event; a cohort's week-`w` retention counts the
    * distinct users active `w` weeks after their cohort week.
    *
    * Returns `(cohort_week, week_offset, n_users, cohort_size,
    * retention_ppm)` — retention as parts-per-million (integer, so the
    * division rounds identically everywhere). `week_offset = 0` rows
    * have `n_users = cohort_size` by construction.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val weekS = 7L * 24 * 3600
    val evs = events.select(col(userCol).as("__u"),
      floor(col(tsCol).cast("long") / weekS).cast("long").as("__wk"))
    // ONE user-keyed shuffle produces first-touch AND the active-week
    // set together (collect_set is bounded by the retention horizon in
    // weeks, not by event count — map-side pre-aggregation dedups);
    // everything downstream is keyed on the tiny (week, offset) space
    val perUser = evs.groupBy(col("__u"))
      .agg(min(col("__wk")).as("cohort_week"),
        collect_set(col("__wk")).as("__wks"))
      .localCheckpoint(true) // two consumers: cells and cohort sizes
    val cells = perUser
      .select(col("cohort_week"), explode(col("__wks")).as("__wk"))
      .withColumn("week_offset",
        (col("__wk") - col("cohort_week")).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = perUser.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .withColumn("retention_ppm",
        floor((col("n_users") * 1000000L) / col("cohort_size"))
          .cast("long"))
      .select("cohort_week", "week_offset", "n_users", "cohort_size",
        "retention_ppm")
  }
}
