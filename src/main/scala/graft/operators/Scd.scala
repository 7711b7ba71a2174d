package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) construction from a
  * changelog — the warehouse operator that turns an event/CDC stream
  * of attribute updates into an interval table `(key, attrs,
  * valid_from, valid_to, is_current)` suitable for point-in-time
  * lookups and as-of joins (beyond-reference scope; the temporal-join
  * half already lives in [[AsOfJoin]]).
  *
  * Scale shape (100 TB changelog): three key-clustered steps, TWO
  * bounded exchanges (plan-pinned in ScdSpec).
  *  1. Last-write-wins within identical (key, ts): a
  *     `max(struct(seq, attrs*))` aggregate — partial-aggregatable
  *     (map-side combine), never a window, so a hot key's same-instant
  *     duplicate burst reduces BEFORE its (key, ts) exchange moves it.
  *     (An up-front repartition(key) would save the second exchange
  *     but ship every raw duplicate across the network — the wrong
  *     trade for CDC feeds, whose pathology is exactly retry bursts.)
  *  2. Changelog compression: consecutive rows whose tracked
  *     attributes did not change are dropped (`lag` over the key
  *     window, null-safe struct compare) — the classic SCD2 "no-op
  *     update" elimination.
  *  3. Intervals: `valid_from = ts`, `valid_to = lead(ts)` over the
  *     same key window, `is_current = valid_to IS NULL`.
  * The second exchange carries the LWW-collapsed relation to a
  * key-only partitioning that BOTH windows share (one sort, one
  * exchange for steps 2+3); per-partition window state is ONE key's
  * compressed history — bounded by how often that key genuinely
  * changed, never a corpus-scale funnel.
  */
object Scd {

  /** Build the SCD2 interval table from `changelog`.
    *
    * @param keyCols  entity key columns
    * @param tsCol    change timestamp (any orderable type)
    * @param seqCol   unique tiebreaker for same-(key, ts) updates —
    *                 the larger seq wins (last-write-wins)
    * @param attrCols tracked attribute columns; a row where none of
    *                 them changed is compressed away
    */
  def scd2(changelog: DataFrame, keyCols: Seq[String], tsCol: String,
      seqCol: String, attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val keys: Seq[Column] = keyCols.map(col)
    val attrStruct = struct(attrCols.map(col): _*)

    // 1. LWW per (key, ts): the max struct is ordered by seq first, so
    // with a unique seq this is exactly "the latest update wins"
    val lww = changelog
      .groupBy(keys :+ col(tsCol): _*)
      .agg(max(struct(col(seqCol) +: attrCols.map(col): _*)).as("__r"))
      .select(keys ++ (col(tsCol) +: attrCols.map(c => col(s"__r.$c").as(c))): _*)

    // 2. + 3. share one key-partitioned, ts-ordered window (ts is
    // unique within a key after step 1, so the order is total)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    lww
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      // null-safe: the first row of a key (lag null) always survives;
      // null attribute values compare equal to themselves
      .filter(!(col("__prev") <=> attrStruct))
      .drop("__prev")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** Point-in-time read of an SCD2 table built by [[scd2]]: each key's
    * attribute state as of `at` (keys whose first change is after `at`
    * are absent — they did not exist yet). A plain filter, so parquet
    * min/max footers prune files on BOTH interval bounds when the
    * table is stored sorted by key/valid_from. */
  def snapshotAt(scd2Table: DataFrame, at: Column): DataFrame =
    scd2Table.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** CDC extraction — the inverse of [[scd2]]: diff two snapshots of a
    * keyed table into a changelog of `(keys, op, old_*, new_*)` rows,
    * `op ∈ insert | delete | update`; keys whose tracked attributes
    * are unchanged (null-safe) are dropped. ONE co-keyed full outer
    * join (both sides shuffle on the key once; AQE broadcasts a small
    * side), no windows — the standard way to bootstrap a changelog
    * from periodic full dumps when the source system has no CDC feed. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(attrCols.nonEmpty, "snapshotDiff needs at least one attribute")
    // disjoint column namespaces: the two sides usually share lineage
    // (two reads of one table), so ambiguous names must not survive
    val o = oldSnap.select(
      keyCols.map(c => col(c).as(s"__ko_$c")) ++
        attrCols.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("__o_present"): _*)
    val n = newSnap.select(
      keyCols.map(c => col(c).as(s"__kn_$c")) ++
        attrCols.map(c => col(c).as(s"new_$c")) :+
        lit(true).as("__n_present"): _*)
    val joinCond = keyCols.map(c => col(s"__ko_$c") <=> col(s"__kn_$c"))
      .reduce(_ && _)
    val oldAttrs = struct(attrCols.map(c => col(s"old_$c")): _*)
    val newAttrs = struct(attrCols.map(c => col(s"new_$c")): _*)
    o.join(n, joinCond, "full_outer")
      // presence markers, not key-null checks: a legitimately null key
      // value must not read as a missing side
      .withColumn("op",
        when(col("__o_present").isNull, lit("insert"))
          .when(col("__n_present").isNull, lit("delete"))
          .when(!(oldAttrs <=> newAttrs), lit("update")))
      .filter(col("op").isNotNull)
      .select(
        keyCols.map(c => coalesce(col(s"__ko_$c"), col(s"__kn_$c")).as(c)) ++
          (col("op") +: (attrCols.map(c => col(s"old_$c")) ++
            attrCols.map(c => col(s"new_$c")))): _*)
  }
}
