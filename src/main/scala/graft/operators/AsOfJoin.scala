package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — the two time-correlation operators Spark has
  * no built-in node for (pandas `merge_asof`, DuckDB `ASOF JOIN`,
  * kdb `aj`). A naive SQL encoding is an inequality join that Catalyst
  * can only run as a broadcast-nested-loop or cartesian product — at
  * 100 TB that is the canonical scale-killer. Both operators here are
  * re-expressed as plans Catalyst executes with hash shuffles only:
  *
  *  - as-of: union the two tagged inputs and resolve each left row's
  *    match with ONE window pass (`last`/`first` over the time-sorted
  *    key partition) — zero join nodes in the plan;
  *  - range: bin both sides to fixed time buckets so the inequality
  *    collapses to an equi-join on `(keys, bin)` plus a residual
  *    filter — a hash join, never a nested loop.
  *
  * The reference correlates event streams against series the same way
  * at read time (biggraphite/plugins/graphite.py merges fetched series
  * onto request windows); these are that idea as reusable operators.
  *
  * Scale notes. The plain as-of forms shuffle once on `keys`, so the
  * per-partition window sort is bounded by the history of one key —
  * right for high-cardinality keys (users, metrics). When few keys
  * carry deep history, [[asofBackwardBucketed]] partitions by
  * `(keys, time-bucket)` instead and forwards each bucket's carry-in
  * via a metadata-scale (one row per key×bucket) cumulative window, so
  * no partition ever holds more than one bucket span of data.
  */
object AsOfJoin {

  /** For each left row: the single right row with the greatest
    * `rightTs <= leftTs` in the same key group. Right columns (minus
    * the keys) are appended with `rightPrefix`; unmatched left rows
    * keep nulls there (set `inner = true` to drop them).
    *
    * `toleranceS` (numeric ts only) voids matches older than
    * `leftTs - toleranceS`. Duplicate right rows on `(keys, rightTs)`
    * are resolved deterministically (lexicographically greatest
    * payload) before the join, so the output never depends on
    * partitioning order. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "right_",
      toleranceS: Option[Long] = None, inner: Boolean = false): DataFrame =
    asofCore(left, right, keys, leftTs, rightTs, rightPrefix, toleranceS,
      inner, backward = true, bucketSpanS = None)

  /** Mirror image: the single right row with the smallest
    * `rightTs >= leftTs` (matches at most `leftTs + toleranceS`). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "right_",
      toleranceS: Option[Long] = None, inner: Boolean = false): DataFrame =
    asofCore(left, right, keys, leftTs, rightTs, rightPrefix, toleranceS,
      inner, backward = false, bucketSpanS = None)

  /** [[asofBackward]] partitioned by `(keys, floor(ts / bucketSpanS))`
    * for low-key-cardinality/deep-history corpora: each bucket's
    * window sees only its own span plus ONE synthetic carry-in row
    * (the latest right row from any earlier bucket, routed via a
    * cumulative window over the key×bucket summary — metadata-scale).
    * Same answer as [[asofBackward]] by construction; numeric ts
    * required. */
  def asofBackwardBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      bucketSpanS: Long, rightPrefix: String = "right_",
      toleranceS: Option[Long] = None, inner: Boolean = false): DataFrame = {
    require(bucketSpanS > 0, s"bucketSpanS must be positive: $bucketSpanS")
    asofCore(left, right, keys, leftTs, rightTs, rightPrefix, toleranceS,
      inner, backward = true, bucketSpanS = Some(bucketSpanS))
  }

  private def asofCore(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String,
      toleranceS: Option[Long], inner: Boolean, backward: Boolean,
      bucketSpanS: Option[Long]): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    require(payloadCols.contains(rightTs),
      s"right ts column $rightTs missing or listed as a key")
    val leftOther = left.columns.filterNot(keys.contains).toSeq
    val collisions = payloadCols.map(rightPrefix + _).toSet & left.columns.toSet
    require(collisions.isEmpty,
      s"prefixed right columns collide with left: ${collisions.mkString(",")}")
    require(left.columns.forall(!_.startsWith("__")) &&
      right.columns.forall(!_.startsWith("__")), "reserved __ column prefix")

    // null timestamps never participate in a match: a null-ts right row
    // is dropped (it would sort nulls-first and pose as an older-than-
    // everything match), and a null-ts left row comes back unmatched
    // (voided below) instead of grabbing an arbitrary neighbor
    val rightNonNull = right.filter(col(rightTs).isNotNull)

    // one right row per (keys, ts): deterministic latest-wins payload.
    // ts leads the struct so the max is decided by the remaining columns
    // only among true (keys, ts) duplicates
    val others = payloadCols.filterNot(_ == rightTs)
    val rd = rightNonNull.groupBy((keys :+ rightTs).map(col): _*)
      .agg(max(struct((rightTs +: others).map(col): _*)).as("__r"))
      .select(keys.map(col) ++ Seq(col(rightTs).as("__ts"), col("__r")): _*)
    val rType = rd.schema("__r").dataType

    // tagged union: right rows sort before left at equal ts in the
    // backward direction (ties match: rightTs <= leftTs) and after it
    // in the forward direction (rightTs >= leftTs)
    val rightTag = if (backward) 0 else 2
    val lSide = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rType).as("__r")) ++ leftOther.map(col): _*)
    val rSide = rd.select(
      keys.map(col) ++ Seq(col("__ts"), lit(rightTag).as("__side"),
        col("__r")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val (tagged, partCols) = bucketSpanS match {
      case None => (lSide.unionByName(rSide), keys)
      case Some(span) =>
        val withB = (df: DataFrame) =>
          df.withColumn("__b", floor(col("__ts") / span).cast("long"))
        val lb = withB(lSide)
        val rb = withB(rSide)
        // latest right row per (keys, bucket), then the carry-in for
        // bucket b = latest over all buckets < b (cumulative window on
        // the key×bucket summary — one row per bucket, metadata-scale).
        // __ts leads the struct so max = latest-in-bucket
        val lastPer = rb.groupBy((keys :+ "__b").map(col): _*)
          .agg(max(struct(col("__ts"), col("__r"))).as("__lr"))
        val needed = lb.select((keys :+ "__b").map(col): _*)
          .union(rb.select((keys :+ "__b").map(col): _*)).distinct()
        val wb = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // a carry row keeps its REAL ts (< its target bucket's start),
        // so it naturally sorts before everything in the bucket
        val carry = needed
          .join(lastPer, keys :+ "__b", "left")
          .withColumn("__c", last(col("__lr"), ignoreNulls = true).over(wb))
          .filter(col("__c").isNotNull)
          .select(keys.map(col) ++ Seq(
            col("__c.__ts").as("__ts"), lit(rightTag).as("__side"),
            col("__c.__r").as("__r"), col("__b")) ++
            leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
        (lb.unionByName(rb).unionByName(carry), keys :+ "__b")
    }

    val w0 = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
    val (w, pick) =
      if (backward)
        (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__r"), ignoreNulls = true))
      else
        (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__r"), ignoreNulls = true))

    var m = tagged.withColumn("__m", pick.over(w))
      .filter(col("__side") === 1)
      .withColumn("__m", when(col("__ts").isNotNull, col("__m")))
    toleranceS.foreach { tol =>
      val rts = col("__m").getField(rightTs)
      val ok = if (backward) rts >= col("__ts") - tol
               else rts <= col("__ts") + tol
      m = m.withColumn("__m", when(ok, col("__m")))
    }
    if (inner) m = m.filter(col("__m").isNotNull)
    m.select(left.columns.map(col).toSeq ++
      payloadCols.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  /** Interval×point join on half-open windows `[lo, hi)` sharing
    * `keys`, as a pure equi-join: intervals explode to the fixed
    * `binSpanS`-wide time bins they overlap, points map to exactly one
    * bin, the join runs on `(keys, bin)` and a residual filter applies
    * the exact bounds. Each qualifying (interval, point) pair appears
    * exactly once — a point lives in one bin, so multi-bin intervals
    * cannot duplicate it. Point columns (minus keys) are appended with
    * `pointPrefix`.
    *
    * Pick `binSpanS` near the typical interval width: an interval
    * produces `⌈width/binSpanS⌉ (+1)` join rows, a point always one.
    * Degenerate intervals (`hi <= lo`) match nothing and are dropped
    * before the bin explode. */
  def rangeJoinBinned(intervals: DataFrame, loCol: String, hiCol: String,
      points: DataFrame, ptTs: String, keys: Seq[String], binSpanS: Long,
      pointPrefix: String = "pt_"): DataFrame = {
    require(binSpanS > 0, s"binSpanS must be positive: $binSpanS")
    val ptCols = points.columns.filterNot(keys.contains).toSeq
    require(ptCols.contains(ptTs),
      s"point ts column $ptTs missing or listed as a key")
    val collisions = ptCols.map(pointPrefix + _).toSet & intervals.columns.toSet
    require(collisions.isEmpty,
      s"prefixed point columns collide with intervals: ${collisions.mkString(",")}")
    require(intervals.columns.forall(!_.startsWith("__")) &&
      points.columns.forall(!_.startsWith("__")), "reserved __ column prefix")
    // the bin arithmetic (floor((hi-1)/span) as the last overlapped bin)
    // is only exact for integer-granularity bounds — fractional
    // timestamps would silently drop pairs near bin edges
    Seq(intervals.schema(loCol), intervals.schema(hiCol),
        points.schema(ptTs)).foreach { f =>
      import org.apache.spark.sql.types._
      val ok = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"rangeJoinBinned needs integer-typed bounds; ${f.name} is ${f.dataType}")
    }
    val binned = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binSpanS).cast("long"),
        floor((col(hiCol) - 1) / binSpanS).cast("long"))))
    val pts = points.select(
      keys.map(col) ++ Seq(floor(col(ptTs) / binSpanS).cast("long").as("__bin")) ++
        ptCols.map(c => col(c).as(pointPrefix + c)): _*)
    binned.join(pts, keys :+ "__bin")
      .filter(col(pointPrefix + ptTs) >= col(loCol) &&
        col(pointPrefix + ptTs) < col(hiCol))
      .drop("__bin")
  }
}
