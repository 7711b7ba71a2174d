package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Graphite render-function layer over fetched series.
  *
  * The reference exposes fetch results to graphite-web, which applies the
  * render API's series transforms (`derivative`, `summarize`,
  * `movingAverage`, `sumSeries`, …) driver-side in Python, one series at a
  * time (the plugin hands graphite-web a `FetchedSeries` iterable,
  * plugins/graphite.py:142-225). A user switching to this engine keeps the
  * same transforms, but they run AS the query plan — window functions
  * partitioned by series name and grouped aggregations, parallel over
  * metrics and codegen'd, instead of a Python loop over every point.
  *
  * All functions take the canonical fetched shape (name, ts, value) that
  * [[TimeSeriesReader.findAndFetchPlanned]] emits — value is nullable, a
  * null slot being graphite's `None` — and preserve extra columns where
  * noted. Null semantics follow graphite's `safe*` helpers: aggregates
  * skip None; pointwise transforms propagate it.
  *
  * Scale shape: every per-series window shuffles once on `name` (hash
  * partitioning over the metric space — even load at any metric count);
  * cross-series combines shuffle once on `ts`. Nothing here widens at
  * 100 TB beyond those single exchanges.
  */
object SeriesFunctions {

  /** Hard cardinality bound on the relations this layer ranks with a
    * single unpartitioned window (legend ordering, positional list
    * pairing). Those windows are display-sized BY CONTRACT — one row
    * per rendered series — so the bound exists to make a corpus-scale
    * misuse fail loudly at plan time instead of silently funnelling
    * millions of rows through one partition. Render targets resolve to
    * at most a few thousand series; 100k is an order of magnitude of
    * headroom past any legend a human reads. */
  val MaxRankedSeries: Long = 100000L

  /** Guard for the display-sized single-window contract above: counts
    * the (column-pruned, distinct-name) relation — cheap next to the
    * ranking it precedes — and fails loudly past [[MaxRankedSeries]].
    *
    * NOTE: this is an EAGER Spark action at call time — callers of
    * [[sortSeries]]/[[pairwiseSeriesLists]] that merely compose plans
    * still execute one distinct-count pass over the (display-sized)
    * input when they call, a deliberate trade: failing at plan-build
    * beats serializing a corpus through one window partition at
    * execution. */
  private def requireDisplaySized(df: DataFrame, fn: String): Long = {
    val n = df.select("name").distinct().count()
    require(n <= MaxRankedSeries,
      s"$fn: $n distinct series exceeds the display-sized bound " +
        s"$MaxRankedSeries for a single global ranking window — " +
        "narrow the fetch glob or aggregate per group instead")
    n
  }

  private def perSeries = Window.partitionBy("name").orderBy("ts")

  /** d/dt as graphite `derivative`: value − previous value, None for the
    * first point and across None gaps (functions.py derivative). */
  def derivative(df: DataFrame): DataFrame =
    df.withColumn("value", col("value") - lag("value", 1).over(perSeries))

  /** graphite's `_nonNegativeDelta` (functions.py), shared by
    * [[nonNegativeDerivative]] and [[perSecond]]: None when the
    * previous sample is missing or the delta is negative without a cap;
    * with a cap, a CURRENT sample above `maxValue` is a bogus reading
    * (beyond counter capacity) → None, and a negative delta is a wrap
    * worth `maxValue − prev + value + 1`. Exact transcription: graphite
    * checks only `val > maxValue`, so a bogus PREVIOUS sample still
    * feeds the wrap formula (and a misconfigured cap can even yield a
    * negative "wrap") — parity means keeping that quirk. */
  private def nonNegativeDelta(prev: Column,
      maxValue: Option[Double]): Column = {
    val delta = col("value") - prev
    maxValue match {
      case Some(m) =>
        when(col("value") > m, lit(null).cast("double"))
          .when(delta >= 0, delta)
          .otherwise(lit(m) - prev + col("value") + 1)
      case None => when(delta >= 0, delta)
    }
  }

  /** `nonNegativeDerivative`: like derivative but counter resets (negative
    * deltas) become None instead of misleading negatives. `maxValue`
    * recovers the true delta across a counter WRAP (and rejects samples
    * beyond the counter's capacity), graphite's `_nonNegativeDelta`. */
  def nonNegativeDerivative(df: DataFrame,
      maxValue: Option[Double] = None): DataFrame = {
    val prev = lag("value", 1).over(perSeries)
    df.withColumn("value", nonNegativeDelta(prev, maxValue))
  }

  /** `perSecond`: non-negative delta divided by the actual time gap to the
    * previous point — rate that stays correct across missing slots.
    * `maxValue` applies graphite's `_nonNegativeDelta` rules: samples
    * beyond the cap are bogus (None), negative deltas under it are a
    * counter wrap worth `maxValue − prev + value + 1`. */
  def perSecond(df: DataFrame, maxValue: Option[Double] = None): DataFrame = {
    val prev = lag("value", 1).over(perSeries)
    val dt = col("ts") - lag("ts", 1).over(perSeries)
    df.withColumn("value", nonNegativeDelta(prev, maxValue) / dt)
  }

  /** `integral`: running sum per series; None inputs stay None in the
    * output but do not reset the accumulator (graphite's behavior). */
  def integral(df: DataFrame): DataFrame =
    df.withColumn("value", integralCol)

  /** Column form of [[integral]] — lets a caller compute several window
    * transforms over ONE scan (they all share the per-series spec, so
    * Catalyst plans a single Window node instead of per-function joins). */
  def integralCol: Column =
    when(col("value").isNotNull, sum("value")
      .over(perSeries.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** `timeShift`: relabel each point `offsetS` later (negative = earlier).
    * Pure column arithmetic — composes with any downstream join/compare. */
  def timeShift(df: DataFrame, offsetS: Long): DataFrame =
    df.withColumn("ts", col("ts") + offsetS)

  /** `scale` + `offset` in one pass: value·factor + add. */
  def scaleOffset(df: DataFrame, factor: Double, add: Double = 0.0): DataFrame =
    df.withColumn("value", col("value") * factor + add)

  /** `movingAverage` over a trailing window of `points` slots (current
    * slot included), None slots skipped — graphite's safeAvg over the
    * window. The first slots average whatever prefix exists. */
  def movingAverage(df: DataFrame, points: Int): DataFrame =
    df.withColumn("value", movingAverageCol(points))

  /** Column form of [[movingAverage]] (see [[integralCol]]). */
  def movingAverageCol(points: Int): Column = {
    require(points > 0)
    avg("value").over(perSeries.rowsBetween(-(points - 1), 0))
  }

  /** `keepLastValue`: forward-fill None slots with the most recent
    * non-None value, without a gap limit (the common call;
    * [[keepLastValueLimited]] is graphite's bounded form). */
  def keepLastValue(df: DataFrame): DataFrame =
    df.withColumn("value", keepLastValueCol)

  /** Column form of [[keepLastValue]] (see [[integralCol]]). */
  def keepLastValueCol: Column =
    last("value", ignoreNulls = true)
      .over(perSeries.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** `keepLastValue(limit)`: forward-fill, but only for gaps of at most
    * `limit` consecutive None slots — graphite fills a None run ONLY
    * when the WHOLE run fits the limit (`0 < consecutiveNones <= limit`
    * in functions.py), so a longer outage stays entirely unfilled
    * rather than flatlining for its first `limit` slots. A trailing run
    * follows the same rule. Run length is measured in SLOTS via row
    * numbers, so it is correct on any spine density. */
  def keepLastValueLimited(df: DataFrame, limit: Int): DataFrame = {
    require(limit > 0)
    val upToNow =
      perSeries.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fromNow =
      perSeries.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rn = row_number().over(perSeries)
    val lastSeenRn =
      last(when(col("value").isNotNull, rn), ignoreNulls = true).over(upToNow)
    val nextSeenRn =
      first(when(col("value").isNotNull, rn), ignoreNulls = true).over(fromNow)
    val lastRn = max(rn).over(Window.partitionBy("name"))
    // the None run containing this row spans (lastSeenRn, gapEnd]
    val gapEnd = coalesce(nextSeenRn - 1, lastRn)
    df.withColumn("value",
      when(col("value").isNotNull, col("value"))
        .when(gapEnd - lastSeenRn <= limit, keepLastValueCol))
  }

  /** `filterSeries(series, 'fn', 'op', n)` — the modern general series
    * filter that the Above/Below function family special-cases: keep
    * series whose per-series statistic satisfies `op n`. Two-pass shape
    * like [[highest]]: tiny per-series aggregate, broadcast semi-join. */
  def filterSeries(df: DataFrame, fn: String, op: String,
      n: Double): DataFrame = {
    val stat: Column = fn match {
      case "max" => max("value")
      case "min" => min("value")
      case "avg" | "average" => avg("value")
      case "sum" | "total" => sum("value")
      // max_by skips null ordering keys → the latest NON-NULL value,
      // deterministic under partial aggregation (a bare `last` is not)
      case "last" | "current" =>
        max_by(col("value"), when(col("value").isNotNull, col("ts")))
      case other => throw new IllegalArgumentException(
        s"filterSeries: unknown function '$other'")
    }
    val keep: Column = op match {
      case "=" | "eq" => col("__stat") === n
      case "!=" | "ne" => col("__stat") =!= n
      case ">" | "gt" => col("__stat") > n
      case ">=" | "ge" => col("__stat") >= n
      case "<" | "lt" => col("__stat") < n
      case "<=" | "le" => col("__stat") <= n
      case other => throw new IllegalArgumentException(
        s"filterSeries: unknown operator '$other'")
    }
    val names = df.groupBy("name").agg(stat.as("__stat"))
      .filter(keep).select("name")
    df.join(broadcast(names), Seq("name"), "left_semi")
  }

  /** `legendValue(series, 'stat'...)`: append one or more per-series
    * statistics to the legend name — `name (last: 4.00) (max: 9.00)`.
    * Same shape as [[cactiStyle]] with graphite's legendValue
    * formatting. */
  def legendValue(df: DataFrame, stats: Seq[String]): DataFrame = {
    require(stats.nonEmpty)
    val whole = Window.partitionBy("name")
    val ordered = Window.partitionBy("name").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def statCol(s: String): Column = s match {
      case "last" | "current" => last("value", ignoreNulls = true).over(ordered)
      case "avg" | "average" => avg("value").over(whole)
      case "total" | "sum" => sum("value").over(whole)
      case "min" => min("value").over(whole)
      case "max" => max("value").over(whole)
      case other => throw new IllegalArgumentException(
        s"legendValue: unknown stat '$other'")
    }
    val annotated = stats.map { s =>
      val c = statCol(s)
      concat(lit(s" ($s: "),
        when(c.isNull, lit("nan")).otherwise(format_string("%.2f", c)),
        lit(")"))
    }
    df.withColumn("name", concat(col("name") +: annotated: _*))
  }

  /** `summarize`: re-bucket each series into `intervalS` windows with one
    * of graphite's summary functions ("sum", "avg", "max", "min", "last").
    * Windows align to multiples of `intervalS`, graphite's default. Only
    * non-empty windows are emitted (pair with a spine join for density). */
  def summarize(df: DataFrame, intervalS: Long, fn: String): DataFrame = {
    val w = (floor(col("ts") / intervalS) * intervalS).cast("long")
    val agg: Column = fn match {
      case "sum" => sum("value")
      case "avg" => avg("value")
      case "max" => max("value")
      case "min" => min("value")
      case "last" => max_by(col("value"), when(col("value").isNotNull, col("ts")))
      case other => throw new IllegalArgumentException(
        s"summarize: unknown function '$other'")
    }
    df.groupBy(col("name"), w.as("ts")).agg(agg.as("value"))
  }

  /** Cross-series combine — `sumSeries` / `averageSeries` / `minSeries` /
    * `maxSeries` / `countSeries`: collapse all input series into one named
    * `alias`, slot by slot, skipping None (graphite safe* semantics: a
    * slot where every series is None stays None — aggregates over all-null
    * groups already return null). One shuffle on ts. */
  def combineSeries(df: DataFrame, fn: String, alias: String): DataFrame =
    df.groupBy("ts").agg(combineAgg(fn).as("value"))
      .select(lit(alias).as("name"), col("ts"), col("value"))

  /** The slot-wise aggregate shared by [[combineSeries]] and
    * [[combineSeriesXff]] — graphite's full `aggregate` function set
    * (functions.py aggFuncs). `last` and `diff` depend on the series
    * LIST order, which for a glob fetch is the sorted name list. */
  private def combineAgg(fn: String): Column = fn match {
    case "sum" => sum("value")
    case "avg" => avg("value")
    case "min" => min("value")
    case "max" => max("value")
    case "count" => count("value").cast("double")
    case "range" => max("value") - min("value") // rangeOfSeries
    case "median" => median(col("value")) // exact; slot-wise like graphite
    case "stddev" => stddev_pop(col("value")) // stddevSeries (population)
    // safeLast: the last series (name order) with a present value
    case "last" => max_by(col("value"), when(col("value").isNotNull, col("name")))
    // safeDiff: first present value minus the sum of the rest
    // = 2·first − Σall (None slots are skipped by both aggregates)
    case "diff" =>
      lit(2.0) * min_by(col("value"),
        when(col("value").isNotNull, col("name"))) - sum("value")
    case other => throw new IllegalArgumentException(
      s"combineSeries: unknown function '$other'")
  }

  /** `aggregate(seriesList, fn, xFilesFactor)`: [[combineSeries]] with
    * graphite's xFilesFactor — a combined slot is kept only when the
    * fraction of input series with a present value reaches `xff`
    * (functions.py xffValues). The input's series count rides the plan
    * as a broadcast one-row aggregate, so nothing is resolved
    * driver-side. */
  def combineSeriesXff(df: DataFrame, fn: String, alias: String,
      xff: Double): DataFrame = {
    require(xff >= 0 && xff <= 1, s"xFilesFactor out of [0,1]: $xff")
    val total = df.agg(countDistinct("name").as("__total"))
    df.groupBy("ts")
      .agg(count(col("value")).as("__nn"), combineAgg(fn).as("value"))
      .crossJoin(broadcast(total))
      .select(lit(alias).as("name"), col("ts"),
        when(col("__nn") >= col("__total") * xff, col("value")).as("value"))
  }

  /** `aliasByNode`: rebuild the display name from selected dot-separated
    * components (0-based; graphite allows negatives — supported here). */
  def aliasByNode(df: DataFrame, nodes: Seq[Int]): DataFrame = {
    val parts = split(col("name"), "\\.")
    val picked = nodes.map { n =>
      if (n >= 0) parts.getItem(n)
      else element_at(parts, n) // element_at supports negative indexing
    }
    df.withColumn("name", concat_ws(".", picked: _*))
  }

  /** `groupByNode`: group series by one dot-separated name component and
    * combine each group slot-by-slot with a summary function — graphite's
    * fleet-rollup workhorse (`groupByNode(sys.cpu.*.load, 2, 'sum')`
    * sums per host index). The grouped name IS the component value.
    * One shuffle on (component, ts); map-side partials keep the exchange
    * at the aggregate's cardinality, not the points'. */
  def groupByNode(df: DataFrame, node: Int, fn: String): DataFrame = {
    val parts = split(col("name"), "\\.")
    // graphite raises on an out-of-range node; a silent null key would
    // collapse every short name into one null-named group instead
    val within =
      if (node >= 0) size(parts) > node else size(parts) >= -node
    val picked =
      if (node >= 0) parts.getItem(node) else element_at(parts, node)
    val key = when(within, picked).otherwise(raise_error(concat(
      lit(s"groupByNode: node $node out of range for series "), col("name"))))
    val agg: Column = fn match {
      case "sum" => sum("value")
      case "avg" => avg("value")
      case "min" => min("value")
      case "max" => max("value")
      case "count" => count("value").cast("double")
      case other => throw new IllegalArgumentException(
        s"groupByNode: unknown function '$other'")
    }
    df.groupBy(key.as("name"), col("ts")).agg(agg.as("value"))
  }

  /** `asPercent` (of the slot total): each series' share of the sum over
    * all input series at the same ts, × 100. None values contribute
    * nothing to the total and stay None in the output; a slot whose
    * total is 0 yields None (graphite returns None on zero/None
    * denominators). One window shuffle on ts. */
  def asPercent(df: DataFrame): DataFrame = {
    val total = sum("value").over(Window.partitionBy("ts"))
    df.withColumn("value",
      when(total =!= 0, col("value") / total * 100))
  }

  /** `asPercent(series, totalSeries)`: each series as a percentage of an
    * EXPLICIT total series (summed across its members per slot) instead
    * of the input's own slot total — `asPercent(app.*.hits,
    * app.total.hits)`. Zero/None totals yield None like [[asPercent]].
    * One shuffle on ts for the total + one ts join. */
  def asPercentOf(df: DataFrame, total: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val t = total.groupBy("ts").agg(sum("value").as("__total"))
    df.join(t, Seq("ts"), "left")
      .withColumn("value",
        when(col("__total") =!= 0, col("value") / col("__total") * 100))
      .select(cols.map(col): _*)
  }

  /** `stacked`: draw-stacking as data — each series' value becomes the
    * cumulative sum of itself and every series BEFORE it (name order) at
    * the same slot, the y-coordinates a stacked-area chart plots. None
    * slots stay None and contribute nothing to series above them. */
  def stacked(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("ts").orderBy("name")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("value",
      when(col("value").isNotNull, sum("value").over(w)))
  }

  /** `areaBetween`: graphite draws the band between EXACTLY two series —
    * the data is unchanged (the band is a draw option); this validates
    * the arity so a mis-globbed target fails loudly instead of silently
    * drawing garbage. The distinct count is series-metadata-sized. */
  def areaBetween(df: DataFrame): DataFrame = {
    val n = df.select("name").distinct().count()
    require(n == 2, s"areaBetween: exactly 2 series required, got $n")
    df
  }

  /** `cactiStyle`: append Current/Max/Min legend stats to each series
    * name (graphite right-aligns them in the legend; a set engine
    * carries them in the name column). Values %.2f, all-None → nan. */
  def cactiStyle(df: DataFrame): DataFrame = {
    // format_string feeds a NULL through java.util.Formatter, which
    // renders the string "null" precision-truncated to "nu" — guard
    // the null explicitly instead
    def fmt(c: Column): Column =
      when(c.isNull, lit("nan")).otherwise(format_string("%.2f", c))
    val whole = Window.partitionBy("name")
    val cur = last("value", ignoreNulls = true)
      .over(Window.partitionBy("name").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    df.withColumn("name", concat(col("name"),
      lit(" Current:"), fmt(cur),
      lit(" Max:"), fmt(max("value").over(whole)),
      lit(" Min:"), fmt(min("value").over(whole))))
  }

  /** `minMax`: per-series min-max normalization onto [0, 1]; a flat
    * series maps to 0 (graphite's convention for max == min). */
  def minMax(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("name")
    val mn = min("value").over(w)
    val mx = max("value").over(w)
    df.withColumn("value",
      when(col("value").isNull, lit(null).cast("double"))
        .when(mx === mn, lit(0.0))
        .otherwise((col("value") - mn) / (mx - mn)))
  }

  /** `timeFunction` (alias `time`): a SOURCE series whose value at each
    * step IS the timestamp — graphite's building block for synthetic
    * targets (`scale(timeFunction("x"), 0.001)` etc). Generated
    * distributed via `spark.range`, never a driver-side loop. */
  def timeFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      startS: Long, endS: Long, stepS: Long = 60): DataFrame = {
    require(stepS > 0, s"timeFunction: step must be positive, got $stepS")
    spark.range(math.max(0L, (endS - startS + stepS - 1) / stepS))
      .select(lit(name).as("name"),
        (lit(startS) + col("id") * stepS).as("ts"),
        (lit(startS) + col("id") * stepS).cast("double").as("value"))
  }

  /** `averageAbove` / `averageBelow`: keep only series whose per-series
    * mean (None-skipping) clears the threshold — graphite's noise filter.
    * Same two-pass shape as [[highest]]: tiny per-series aggregate,
    * broadcast semi-join back. */
  def averageAbove(df: DataFrame, threshold: Double,
      above: Boolean = true): DataFrame = {
    val stats = df.groupBy("name").agg(avg("value").as("__avg"))
    val kept = (if (above) stats.filter(col("__avg") >= threshold)
                else stats.filter(col("__avg") <= threshold)).select("name")
    df.join(broadcast(kept), Seq("name"), "left_semi")
  }

  /** `absolute`, `logarithm`, and `clamp` (graphite's `minimum`/`maximum`
    * pair) as single pointwise passes. `logarithm` yields None for
    * values ≤ 0 like graphite. */
  def absolute(df: DataFrame): DataFrame =
    df.withColumn("value", abs(col("value")))

  def logarithm(df: DataFrame, base: Double = 10.0): DataFrame =
    df.withColumn("value",
      when(col("value") > 0, log(base, col("value"))))

  def clamp(df: DataFrame, lo: Option[Double], hi: Option[Double]): DataFrame = {
    val lower = lo.map(l => greatest(col("value"), lit(l))).getOrElse(col("value"))
    val both = hi.map(h => least(lower, lit(h))).getOrElse(lower)
    // greatest/least skip nulls (so None would clamp to the bound);
    // graphite propagates None through pointwise transforms
    df.withColumn("value", when(col("value").isNotNull, both))
  }

  /** `alias`: rename every series to one fixed display name
    * (functions.py alias — a pure relabel, usually after a combine). */
  def aliasSeries(df: DataFrame, newName: String): DataFrame =
    df.withColumn("name", lit(newName))

  /** `sortByMaxima` / `sortByMinima` / `sortByTotal` / `sortByName`:
    * graphite's legend-order family. A set-based engine has no implicit
    * row order, so the order is MATERIALIZED as a 1-based `series_order`
    * column (ties break on the lexically smaller name) and the rows come
    * back sorted by it. The ranking window runs over the per-series
    * aggregate — metric-count rows, never the points — so the single
    * unpartitioned window is display-sized by construction, and a
    * [[MaxRankedSeries]] guard makes a corpus-scale misuse fail loudly
    * rather than serialize through one partition. */
  def sortSeries(df: DataFrame, by: String = "maxima"): DataFrame = {
    requireDisplaySized(df, "sortSeries")
    val ranked = by match {
      case "name" =>
        df.select("name").distinct()
          .withColumn("series_order",
            row_number().over(Window.orderBy(col("name").asc)))
      case _ =>
        val (stat, desc) = by match {
          case "maxima" => (max("value"), true)
          case "minima" => (min("value"), false)
          case "total" => (sum("value"), true)
          case "average" => (avg("value"), true)
          case other => throw new IllegalArgumentException(
            s"sortSeries: unknown key '$other'")
        }
        val ord =
          if (desc) col("__stat").desc_nulls_last else col("__stat").asc_nulls_last
        df.groupBy("name").agg(stat.as("__stat"))
          .withColumn("series_order",
            row_number().over(Window.orderBy(ord, col("name").asc)))
          .drop("__stat")
    }
    df.join(broadcast(ranked), Seq("name"), "left")
      .orderBy(col("series_order"), col("ts"))
  }

  /** `movingMedian`: exact median over a trailing window of `points`
    * slots, None-skipping (graphite's safeMedian; even windows average
    * the two middle values). Spark disallows `median` with a window
    * frame, so the window materializes its ≤`points` values as a sorted
    * array (collect_list skips nulls) and picks the middle — constant
    * work per row, bounded by the window width. */
  def movingMedian(df: DataFrame, points: Int): DataFrame = {
    require(points > 0)
    val arr = sort_array(
      collect_list(col("value")).over(perSeries.rowsBetween(-(points - 1), 0)))
    val n = size(arr)
    val mid = ((n + 1) / 2).cast("int") // n small; / is double division
    val med = when(n === 0, lit(null))
      .when(n % 2 === 1, element_at(arr, mid))
      .otherwise((element_at(arr, (n / 2).cast("int")) +
        element_at(arr, (n / 2).cast("int") + 1)) / 2.0)
    df.withColumn("value", med)
  }

  /** `stdev`: moving POPULATION standard deviation over a trailing
    * window of `points` slots (graphite's stdev divides by the count of
    * present points, not n−1), None-skipping. */
  def stdev(df: DataFrame, points: Int): DataFrame = {
    require(points > 0)
    df.withColumn("value",
      stddev_pop(col("value")).over(perSeries.rowsBetween(-(points - 1), 0)))
  }

  /** `movingMin` / `movingMax` / `movingSum`: the remaining trailing-
    * window family, same None-skipping frame as [[movingAverage]]. */
  def movingMin(df: DataFrame, points: Int): DataFrame = {
    require(points > 0)
    df.withColumn("value",
      min("value").over(perSeries.rowsBetween(-(points - 1), 0)))
  }

  def movingMax(df: DataFrame, points: Int): DataFrame = {
    require(points > 0)
    df.withColumn("value",
      max("value").over(perSeries.rowsBetween(-(points - 1), 0)))
  }

  def movingSum(df: DataFrame, points: Int): DataFrame = {
    require(points > 0)
    df.withColumn("value",
      sum("value").over(perSeries.rowsBetween(-(points - 1), 0)))
  }

  /** `removeAboveValue` / `removeBelowValue`: out-of-band points become
    * None (graphite keeps the slot, nulls the value). */
  def removeAboveValue(df: DataFrame, limit: Double): DataFrame =
    df.withColumn("value", when(col("value") <= limit, col("value")))

  def removeBelowValue(df: DataFrame, limit: Double): DataFrame =
    df.withColumn("value", when(col("value") >= limit, col("value")))

  /** `offsetToZero`: shift each series down by its own (None-skipping)
    * minimum — graphite's baseline-normalizer. One per-series window. */
  def offsetToZero(df: DataFrame): DataFrame =
    df.withColumn("value",
      col("value") - min("value").over(Window.partitionBy("name")))

  /** `invert` (1/x; None for 0), `pow`, `squareRoot` — pointwise. */
  def invert(df: DataFrame): DataFrame =
    df.withColumn("value", when(col("value") =!= 0, lit(1.0) / col("value")))

  def powSeries(df: DataFrame, exponent: Double): DataFrame =
    df.withColumn("value", pow(col("value"), lit(exponent)))

  def squareRoot(df: DataFrame): DataFrame =
    df.withColumn("value", when(col("value") >= 0, sqrt(col("value"))))

  /** `exclude` / `grep`: drop or keep series whose name matches a regex
    * (search semantics like Python's re.search — unanchored unless the
    * pattern anchors itself). Pure pushdown-able filters. */
  def exclude(df: DataFrame, pattern: String): DataFrame =
    df.filter(!col("name").rlike(pattern))

  def grep(df: DataFrame, pattern: String): DataFrame =
    df.filter(col("name").rlike(pattern))

  /** `currentAbove` / `currentBelow`: keep series whose LAST reported
    * (non-None) value clears the threshold. Same tiny-aggregate +
    * broadcast-semi-join shape as [[averageAbove]]. */
  def currentAbove(df: DataFrame, threshold: Double,
      above: Boolean = true): DataFrame = {
    val cur = max_by(col("value"), when(col("value").isNotNull, col("ts")))
    val stats = df.groupBy("name").agg(cur.as("__cur"))
    val kept = (if (above) stats.filter(col("__cur") >= threshold)
                else stats.filter(col("__cur") <= threshold)).select("name")
    df.join(broadcast(kept), Seq("name"), "left_semi")
  }

  /** `integralByInterval`: running sum per series that RESETS at each
    * `intervalS` boundary (graphite's per-day/per-hour cumulative
    * counter). One window shuffle on (name, bucket); None inputs stay
    * None without resetting the accumulator, as in [[integral]]. */
  def integralByInterval(df: DataFrame, intervalS: Long): DataFrame = {
    require(intervalS > 0)
    val bucket = (floor(col("ts") / intervalS) * intervalS).cast("long")
    val w = Window.partitionBy(col("name"), bucket).orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("value",
      when(col("value").isNotNull, sum("value").over(w)))
  }

  /** `transformNull`: replace None slots with a constant — the usual
    * "treat missing as 0" step before sums/diffs (functions.py
    * transformNull). */
  def transformNull(df: DataFrame, default: Double = 0.0): DataFrame =
    df.withColumn("value", coalesce(col("value"), lit(default)))

  /** graphite's non-interpolating `_getPercentile` rank over a sorted
    * values array: ceil(pct/100 · (n+1)) clamped to [1, n]. ONE home for
    * the formula — every percentile family member selects with it. */
  private def percentileRank(arr: Column, pct: Double): Column =
    least(greatest(
      ceil(lit(pct / 100.0) * (size(arr) + 1)).cast("int"), lit(1)), size(arr))

  /** One series' nth percentile over its sorted non-None values
    * ([[percentileRank]] selection). Returns metric-count rows
    * (name, __pctl). */
  private def seriesPercentile(df: DataFrame, n: Double): DataFrame = {
    require(n > 0 && n <= 100, s"percentile out of range: $n")
    val arr = sort_array(collect_list(col("value"))) // collect_list skips nulls
    df.groupBy("name").agg(
      when(size(arr) > 0, element_at(arr, percentileRank(arr, n)))
        .as("__pctl"))
  }

  /** `nPercentile`: flatten each series to its own nth percentile — every
    * slot gets the constant, graphite's horizontal reference line. */
  def nPercentile(df: DataFrame, n: Double): DataFrame =
    df.join(broadcast(seriesPercentile(df, n)), Seq("name"), "left")
      .withColumn("value", col("__pctl")).drop("__pctl")

  /** `removeAbovePercentile` / `removeBelowPercentile`: slots beyond the
    * series' own nth percentile become None (slot kept, value nulled,
    * like the value-threshold pair). */
  def removeAbovePercentile(df: DataFrame, n: Double): DataFrame =
    df.join(broadcast(seriesPercentile(df, n)), Seq("name"), "left")
      .withColumn("value", when(col("value") <= col("__pctl"), col("value")))
      .drop("__pctl")

  def removeBelowPercentile(df: DataFrame, n: Double): DataFrame =
    df.join(broadcast(seriesPercentile(df, n)), Seq("name"), "left")
      .withColumn("value", when(col("value") >= col("__pctl"), col("value")))
      .drop("__pctl")

  /** `maximumAbove`/`maximumBelow`/`minimumAbove`/`minimumBelow`: the
    * remaining series-filter family — keep series whose per-series
    * max/min clears the threshold. Same tiny-aggregate + broadcast
    * semi-join shape as [[averageAbove]]. */
  def maximumAbove(df: DataFrame, threshold: Double,
      above: Boolean = true): DataFrame =
    statFilter(df, max("value"), threshold, above)

  def minimumBelow(df: DataFrame, threshold: Double,
      below: Boolean = true): DataFrame =
    statFilter(df, min("value"), threshold, above = !below)

  private def statFilter(df: DataFrame, stat: Column, threshold: Double,
      above: Boolean): DataFrame = {
    val stats = df.groupBy("name").agg(stat.as("__stat"))
    val kept = (if (above) stats.filter(col("__stat") >= threshold)
                else stats.filter(col("__stat") <= threshold)).select("name")
    df.join(broadcast(kept), Seq("name"), "left_semi")
  }

  /** `divideSeries`: each dividend slot divided by the single divisor
    * series' value at the same ts; None or 0 divisor → None
    * (functions.py divideSeries). The divisor must be ONE series —
    * checked at plan time over the display-sized frame, as graphite
    * raises. Renamed `divideSeries(dividend,divisor)` like graphite. */
  def divideSeries(df: DataFrame, divisor: DataFrame): DataFrame = {
    val names = divisor.select("name").distinct().limit(2).collect()
    require(names.length == 1,
      s"divideSeries: divisor must be exactly one series, got ${names.length}")
    val divName = names(0).getString(0)
    val d = divisor.select(col("ts"), col("value").as("__div"))
    df.join(broadcast(d), Seq("ts"), "left")
      .withColumn("value",
        when(col("__div") =!= 0, col("value") / col("__div")))
      .withColumn("name",
        concat(lit("divideSeries("), col("name"), lit(s",$divName)")))
      .drop("__div")
  }

  /** `diffSeries` for the two-input call: per slot, safeDiff of the
    * dividend against the sum of the subtrahend's values — None counts
    * as 0 unless EVERY input at the slot is None (graphite safeDiff).
    * One broadcast of the (display-sized) subtrahend totals. */
  def diffSeries(df: DataFrame, subtrahend: DataFrame,
      alias: String = "diffSeries"): DataFrame = {
    val sub = subtrahend.groupBy("ts").agg(sum("value").as("__sub"))
    df.join(broadcast(sub), Seq("ts"), "left")
      .withColumn("value",
        when(col("value").isNull && col("__sub").isNull, lit(null))
          .otherwise(coalesce(col("value"), lit(0.0)) -
            coalesce(col("__sub"), lit(0.0))))
      .withColumn("name", lit(alias))
      .drop("__sub")
  }

  /** `hitcount`: re-bucket each series into `intervalS` windows as
    * value·step sums — rate × duration = hit estimate, robust to
    * consolidation (functions.py hitcount). The series' step is derived
    * from its own minimum ts gap, so the function composes after any
    * summarize/consolidation without a step argument. */
  def hitcount(df: DataFrame, intervalS: Long): DataFrame = {
    require(intervalS > 0)
    val gap = col("ts") - lag("ts", 1).over(perSeries)
    val step = min(when(gap > 0, gap)).over(Window.partitionBy("name"))
    val bucket = (floor(col("ts") / intervalS) * intervalS).cast("long")
    df.withColumn("__step", step)
      .groupBy(col("name"), bucket.as("ts"))
      .agg(sum(col("value") * col("__step")).as("value"))
  }

  /** `changed`: 1.0 where the value differs from the previous slot, else
    * 0.0 — None on either side counts as unchanged (functions.py
    * changed). */
  def changed(df: DataFrame): DataFrame = {
    val prev = lag("value", 1).over(perSeries)
    df.withColumn("value",
      when(col("value").isNotNull && prev.isNotNull && col("value") =!= prev,
        lit(1.0)).otherwise(lit(0.0)))
  }

  /** `delay`: shift each series' VALUES `steps` slots forward (negative =
    * backward) while keeping the time axis — graphite's lag-compare
    * helper. */
  def delay(df: DataFrame, steps: Int): DataFrame =
    df.withColumn("value",
      if (steps >= 0) lag("value", steps).over(perSeries)
      else lead("value", -steps).over(perSeries))

  /** `timeSlice`: None out every slot outside [startS, endS) — the
    * render-window mask. */
  def timeSlice(df: DataFrame, startS: Long, endS: Long): DataFrame =
    df.withColumn("value",
      when(col("ts") >= startS && col("ts") < endS, col("value")))

  /** `linearRegression`: replace each series with its own least-squares
    * fit over the (ts, value) pairs — two regression aggregates per
    * series, fit evaluated per slot; null slots get a fitted value too
    * (graphite draws the full line). */
  def linearRegression(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("name")
    val slope = regr_slope(col("value"), col("ts").cast("double")).over(w)
    val icept = regr_intercept(col("value"), col("ts").cast("double")).over(w)
    df.withColumn("value", slope * col("ts") + icept)
  }

  /** `highestMax` / `highestCurrent` / `highestAverage`: keep the `n`
    * series that rank highest by the chosen statistic. Two passes — a
    * per-series aggregate (map-side partials, tiny result) and a
    * broadcast semi-join back — never a global sort of the points. Ties
    * break on the lexically smaller name for determinism. */
  def highest(df: DataFrame, n: Int, by: String = "max"): DataFrame = {
    val stat: Column = by match {
      case "max" => max("value")
      case "average" => avg("value")
      case "current" => max_by(col("value"), when(col("value").isNotNull, col("ts")))
      case other => throw new IllegalArgumentException(
        s"highest: unknown statistic '$other'")
    }
    val ranked = df.groupBy("name").agg(stat.as("__stat"))
      .orderBy(col("__stat").desc_nulls_last, col("name").asc)
      .limit(n)
      .select("name")
    df.join(broadcast(ranked), Seq("name"), "left_semi")
  }

  // ---- wave 4 ---------------------------------------------------------

  /** `weightedAverage(seriesListAvg, seriesListWeight, *nodes)`: pair
    * each value series with its weight series by the selected name
    * components, then collapse ALL pairs into ONE series — per slot,
    * Σ(v·w) over the matched pairs divided by Σ(w) — graphite's
    * capacity-weighted fleet average (functions.py weightedAverage:
    * product series summed, weight series summed, safeDiv). A pair
    * whose value OR weight is None contributes nothing to the
    * numerator (safeMul); the weight still counts in the denominator
    * when present; zero/None weight sum → None. Keys present on only
    * one side are dropped (unmatched series pair with nothing). One
    * shuffle on (key, ts); both inputs are render-sized. */
  def weightedAverage(df: DataFrame, weights: DataFrame, nodes: Seq[Int],
      alias: String = "weightedAverage"): DataFrame = {
    def keyed(in: DataFrame, as: String): DataFrame = {
      val parts = split(col("name"), "\\.")
      val picked = nodes.map(n =>
        if (n >= 0) parts.getItem(n) else element_at(parts, n))
      in.select(concat_ws(".", picked: _*).as("name"), col("ts"),
        col("value").as(as))
    }
    keyed(df, "__v").join(keyed(weights, "__w"), Seq("name", "ts"))
      .groupBy("ts")
      .agg(sum(col("__v") * col("__w")).as("__n"), sum(col("__w")).as("__d"))
      .select(lit(alias).as("name"), col("ts"),
        when(col("__d") =!= 0, col("__n") / col("__d")).as("value"))
  }

  /** `multiplySeries`: slot-wise product of all input series. Graphite's
    * safeMul returns None when ANY factor is None, so a slot missing one
    * series is None (unlike the sum family). The per-slot factor list is
    * series-count sized — display-bounded — folded with a higher-order
    * `aggregate`, no UDF. */
  def multiplySeries(df: DataFrame, alias: String = "multiplySeries"): DataFrame =
    df.groupBy("ts")
      .agg(when(count(lit(1)) === count(col("value")),
        // fold in sorted order: FP multiplication is not associative, so
        // a fixed order keeps the result deterministic across shuffles
        aggregate(sort_array(collect_list(col("value"))), lit(1.0),
          (acc, x) => acc * x))
        .as("value"))
      .select(lit(alias).as("name"), col("ts"), col("value"))

  /** `percentileOfSeries`: collapse all series into one whose slot value
    * is the nth percentile ACROSS series at that ts — graphite's
    * non-interpolating `_getPercentile` rank (same formula as
    * [[nPercentile]], applied per slot instead of per series). */
  def percentileOfSeries(df: DataFrame, n: Double,
      alias: String = "percentileOfSeries"): DataFrame = {
    require(n > 0 && n <= 100, s"percentile out of range: $n")
    val arr = sort_array(collect_list(col("value")))
    df.groupBy("ts")
      .agg(when(size(arr) > 0, element_at(arr, percentileRank(arr, n)))
        .as("value"))
      .select(lit(alias).as("name"), col("ts"), col("value"))
  }

  /** `mostDeviant`: keep the `n` series with the largest population
    * variance (graphite computes Σx²/n − mean² per series, skipping
    * None). Same two-pass tiny-aggregate + broadcast-semi-join shape as
    * [[highest]]. */
  def mostDeviant(df: DataFrame, n: Int): DataFrame = {
    val ranked = df.groupBy("name").agg(var_pop(col("value")).as("__var"))
      .orderBy(col("__var").desc_nulls_last, col("name").asc)
      .limit(n).select("name")
    df.join(broadcast(ranked), Seq("name"), "left_semi")
  }

  /** `averageOutsidePercentile`: drop series whose per-series mean lies
    * strictly INSIDE the [100−n, n] percentile band of all the means
    * (n<50 flips to 100−n first, like functions.py). Both percentile
    * bounds use the non-interpolating rank over the metric-count frame
    * of averages, so everything after the one per-series aggregate is
    * display-sized. */
  def averageOutsidePercentile(df: DataFrame, n: Double): DataFrame = {
    val p = if (n < 50) 100 - n else n
    val stats = df.groupBy("name").agg(avg("value").as("__avg"))
    val arr = sort_array(collect_list(col("__avg")))
    val bounds = stats.agg(
      element_at(arr, percentileRank(arr, 100 - p)).as("__lo"),
      element_at(arr, percentileRank(arr, p)).as("__hi"))
    val kept = stats.crossJoin(broadcast(bounds))
      .filter(!(col("__avg") > col("__lo") && col("__avg") < col("__hi")))
      .select("name")
    df.join(broadcast(kept), Seq("name"), "left_semi")
  }

  /** `substr`: keep only name components [start, stop) (0-based;
    * stop = 0 keeps through the end; negatives count from the end like
    * Python slices) — graphite's legend trimmer. */
  def substrSeries(df: DataFrame, start: Int, stop: Int = 0): DataFrame = {
    val parts = split(col("name"), "\\.")
    val n = size(parts)
    def norm(i: Int): Column =
      if (i >= 0) least(lit(i), n) else greatest(n + i, lit(0))
    val from = norm(start)
    val until = if (stop == 0) n else norm(stop)
    // slice is 1-based; length < 0 is invalid so clamp at 0 (empty name)
    df.withColumn("name", concat_ws(".",
      slice(parts, from + 1, greatest(until - from, lit(0)))))
  }

  /** `aliasSub`: regex search/replace on every series name. Graphite
    * uses Python `re.sub` with `\1`-style backreferences; Spark's
    * regexp_replace wants `$1`, so translate the replacement string. */
  def aliasSub(df: DataFrame, search: String, replace: String): DataFrame = {
    val javaReplace = replace.replaceAll("""\\(\d)""", "\\$$1")
    df.withColumn("name", regexp_replace(col("name"), search, javaReplace))
  }

  /** `scaleToSeconds`: value · seconds/step — rescale a per-step count
    * to a per-N-seconds rate. Like [[hitcount]], the step is derived
    * from each series' own minimum positive ts gap, so the call
    * composes after any consolidation without a step argument. */
  def scaleToSeconds(df: DataFrame, seconds: Long): DataFrame = {
    require(seconds > 0)
    val gap = col("ts") - lag("ts", 1).over(perSeries)
    val step = min(when(gap > 0, gap)).over(Window.partitionBy("name"))
    // a one-point series has no derivable step; pass its value through
    // unchanged rather than nulling the whole series
    df.withColumn("value",
      when(step.isNull, col("value"))
        .otherwise(col("value") * seconds / step))
  }

  /** `smartSummarize`: like [[summarize]] but buckets align to the
    * query's start time instead of interval multiples — graphite's
    * "today-relative" re-bucketing. */
  def smartSummarize(df: DataFrame, intervalS: Long, fn: String,
      fromS: Long): DataFrame = {
    require(intervalS > 0)
    val shifted = df.withColumn("ts", col("ts") - fromS)
    summarize(shifted, intervalS, fn).withColumn("ts", col("ts") + fromS)
  }

  /** `interpolate`: fill interior None gaps linearly between the
    * neighboring non-None points; leading/trailing Nones stay None
    * (functions.py interpolate with the default unlimited gap). Four
    * windows over the same per-series sort — one shuffle. */
  def interpolate(df: DataFrame): DataFrame = {
    val before = perSeries.rowsBetween(Window.unboundedPreceding, -1)
    val after = perSeries.rowsBetween(1, Window.unboundedFollowing)
    val presentTs = when(col("value").isNotNull, col("ts"))
    val pv = last("value", ignoreNulls = true).over(before)
    val pt = last(presentTs, ignoreNulls = true).over(before)
    val nv = first("value", ignoreNulls = true).over(after)
    val nt = first(presentTs, ignoreNulls = true).over(after)
    df.withColumn("value",
      when(col("value").isNotNull, col("value"))
        .otherwise(pv + (nv - pv) * (col("ts") - pt) / (nt - pt)))
  }

  /** `isNonNull`: 1.0 where a value exists, else 0.0 — the gap
    * detector alerts build on. */
  def isNonNull(df: DataFrame): DataFrame =
    df.withColumn("value",
      when(col("value").isNotNull, lit(1.0)).otherwise(lit(0.0)))

  /** `roundFunction`: round to `precision` decimals. Python 3 rounds
    * HALF_EVEN, so this uses Spark's `bround` (same mode) rather than
    * `round` (HALF_UP) — midpoint values match graphite exactly. */
  def roundFunction(df: DataFrame, precision: Int = 0): DataFrame =
    df.withColumn("value", bround(col("value"), precision))

  /** `sigmoid` / `logit` / `exp` — the pointwise link-function trio
    * (graphite 1.1). logit is None outside (0, 1) where the transform
    * is undefined, like graphite's safe wrapper. */
  def sigmoid(df: DataFrame): DataFrame =
    df.withColumn("value", lit(1.0) / (lit(1.0) + exp(-col("value"))))

  def logit(df: DataFrame): DataFrame =
    df.withColumn("value",
      when(col("value") > 0 && col("value") < 1,
        log(col("value") / (lit(1.0) - col("value")))))

  def expFunction(df: DataFrame): DataFrame =
    df.withColumn("value", exp(col("value")))

  /** `aggregateLine`: flatten each series to a constant horizontal line
    * at its own aggregate (avg/min/max/last) — graphite's reference
    * line. Same broadcast-back shape as [[nPercentile]]. */
  def aggregateLine(df: DataFrame, fn: String = "avg"): DataFrame = {
    val stat: Column = fn match {
      case "avg" | "average" => avg("value")
      case "min" => min("value")
      case "max" => max("value")
      case "last" => max_by(col("value"), when(col("value").isNotNull, col("ts")))
      case other => throw new IllegalArgumentException(
        s"aggregateLine: unknown function '$other'")
    }
    val lines = df.groupBy("name").agg(stat.as("__line"))
    df.join(broadcast(lines), Seq("name"), "left")
      .withColumn("value", col("__line")).drop("__line")
  }

  /** `sumSeriesWithWildcards` / `averageSeriesWithWildcards`: drop the
    * given name components (0-based positions), then combine the series
    * that collapse onto the same remaining name, slot by slot — the
    * multi-node generalization of [[groupByNode]]. One shuffle on the
    * collapsed (name, ts). */
  def seriesWithWildcards(df: DataFrame, fn: String,
      positions: Seq[Int]): DataFrame = {
    require(positions.forall(_ >= 0),
      "seriesWithWildcards: positions are 0-based non-negative indices")
    val parts = split(col("name"), "\\.")
    val posArr = array(positions.map(lit): _*)
    val kept = filter(parts, (_, i) => !array_contains(posArr, i))
    // the full aggregate set so `aggregateWithWildcards(s,'fn',pos...)`
    // speaks every fn combineSeries does (average/total are graphite's
    // registered aliases)
    val agg: Column = fn match {
      case "sum" | "total" => sum("value")
      case "avg" | "average" => avg("value")
      case "min" => min("value")
      case "max" => max("value")
      case "count" => count("value").cast("double")
      case "median" => median(col("value"))
      case "range" | "rangeOf" => max("value") - min("value")
      // multiplySeriesWithWildcards: safeMul poisons the group's slot
      // when any member is None, folded in sorted order like
      // [[multiplySeries]]
      case "multiply" =>
        when(count(lit(1)) === count(col("value")),
          aggregate(sort_array(collect_list(col("value"))), lit(1.0),
            (acc, x) => acc * x))
      case other => throw new IllegalArgumentException(
        s"seriesWithWildcards: unknown function '$other'")
    }
    df.groupBy(concat_ws(".", kept).as("name"), col("ts"))
      .agg(agg.as("value"))
  }

  /** `timeStack`: overlay `start..end` copies of each series shifted by
    * k·shiftS, labeled `timeShift(name,-kN)` like graphite — the
    * week-over-week comparison view. One generator expression, no
    * repeated scans of the input. */
  def timeStack(df: DataFrame, shiftS: Long, start: Int = 0,
      end: Int = 7): DataFrame = {
    require(end >= start)
    df.select(explode(sequence(lit(start), lit(end))).as("__k"),
        col("name"), col("ts"), col("value"))
      .select(
        when(col("__k") === 0, col("name"))
          .otherwise(concat(lit("timeShift("), col("name"), lit(",-"),
            (col("__k") * shiftS).cast("string"), lit(")"))).as("name"),
        (col("ts") + col("__k") * shiftS).as("ts"),
        col("value"))
  }

  /** `fallbackSeries`: the input if it has any series, else the
    * fallback. The emptiness probe is one `limit(1)` action over the
    * display-sized frame — same plan-time-decision shape as
    * [[divideSeries]]'s arity check. */
  def fallbackSeries(df: DataFrame, fallback: DataFrame): DataFrame =
    if (df.limit(1).isEmpty) fallback else df

  /** `lowestMax` / `lowestCurrent` / `lowestAverage`: mirror of
    * [[highest]] — keep the `n` series ranking LOWEST by the statistic
    * (graphite's "what's starving" view). Null statistics rank last on
    * both sides so an all-None series never wins either direction. */
  def lowest(df: DataFrame, n: Int, by: String = "max"): DataFrame = {
    val stat: Column = by match {
      case "max" => max("value")
      case "average" => avg("value")
      case "current" => max_by(col("value"), when(col("value").isNotNull, col("ts")))
      case other => throw new IllegalArgumentException(
        s"lowest: unknown statistic '$other'")
    }
    val ranked = df.groupBy("name").agg(stat.as("__stat"))
      .orderBy(col("__stat").asc_nulls_last, col("name").asc)
      .limit(n)
      .select("name")
    df.join(broadcast(ranked), Seq("name"), "left_semi")
  }

  /** `groupByNodes`: group series by SEVERAL name components at once and
    * combine each group slot-by-slot — the multi-node [[groupByNode]]
    * (complement of [[seriesWithWildcards]], which DROPS positions).
    * Out-of-range nodes raise like groupByNode. */
  def groupByNodes(df: DataFrame, fn: String, nodes: Seq[Int]): DataFrame = {
    require(nodes.nonEmpty)
    val parts = split(col("name"), "\\.")
    val picked = nodes.map { node =>
      val within =
        if (node >= 0) size(parts) > node else size(parts) >= -node
      val p = if (node >= 0) parts.getItem(node) else element_at(parts, node)
      when(within, p).otherwise(raise_error(concat(
        lit(s"groupByNodes: node $node out of range for series "), col("name"))))
    }
    val agg: Column = fn match {
      case "sum" => sum("value")
      case "avg" => avg("value")
      case "min" => min("value")
      case "max" => max("value")
      case "count" => count("value").cast("double")
      case other => throw new IllegalArgumentException(
        s"groupByNodes: unknown function '$other'")
    }
    df.groupBy(concat_ws(".", picked: _*).as("name"), col("ts"))
      .agg(agg.as("value"))
  }

  /** `unique`: drop duplicate (name, ts) rows — the set-engine analog of
    * graphite's duplicate-series removal after a `group(...)` union. The
    * first value wins per graphite; here winners resolve by max_by on
    * non-null-ness then value for determinism without any row order. */
  def uniqueSeries(df: DataFrame): DataFrame =
    df.groupBy("name", "ts")
      .agg(max_by(col("value"),
        struct(col("value").isNotNull, col("value"))).as("value"))

  /** `toLowerCase` / `toUpperCase` (functions.py): case-transform the
    * series name; points pass through untouched. */
  def toLowerCaseSeries(df: DataFrame): DataFrame =
    df.withColumn("name", lower(col("name")))

  def toUpperCaseSeries(df: DataFrame): DataFrame =
    df.withColumn("name", upper(col("name")))

  /** Pie-mode reducers (functions.py pieAverage/pieMaximum/pieMinimum):
    * `graphType=pie` collapses each series to ONE value, so the output
    * is (name, value) — a terminal, display-shaped form. Nulls are
    * skipped like graphite's safe* reducers; a series with no non-null
    * point keeps a null slice value rather than disappearing. */
  def pieValue(df: DataFrame, fn: String): DataFrame = {
    val agg = fn match {
      case "average" => avg(col("value"))
      case "maximum" => max(col("value"))
      case "minimum" => min(col("value"))
      case other =>
        throw new IllegalArgumentException(s"pie: unknown reducer $other")
    }
    df.groupBy("name").agg(agg.as("value"))
  }

  /** `limit`: keep the first `n` series in NAME order (a set engine has
    * no arrival order; name order is the deterministic analog). */
  def limitSeries(df: DataFrame, n: Int): DataFrame = {
    val kept = df.select("name").distinct().orderBy("name").limit(n)
    df.join(broadcast(kept), Seq("name"), "left_semi")
  }

  /** `constantLine`: a fixed-value series spanning [startS, endS] with
    * two endpoint slots, like graphite renders it. */
  def constantLine(spark: org.apache.spark.sql.SparkSession, value: Double,
      startS: Long, endS: Long): DataFrame = {
    import spark.implicits._
    Seq((value.toString, startS, value), (value.toString, endS, value))
      .toDF("name", "ts", "value")
  }

  /** `sinFunction('name'[, amplitude[, stepS]])`: amplitude·sin(ts) on
    * the step grid — graphite's synthetic test source, deterministic by
    * construction. */
  def sinFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      amplitude: Double, startS: Long, endS: Long,
      stepS: Long = 60): DataFrame =
    timeFunction(spark, name, startS, endS, stepS)
      .withColumn("value", sin(col("ts").cast("double")) * amplitude)

  /** `randomWalkFunction('name'[, stepS])` — graphite seeds a true RNG;
    * a distributed engine needs replayable results, so the per-step
    * increments are HASH-derived from (name, ts): uniform-ish in
    * [−0.5, 0.5), identical on every run/partitioning, and the walk is
    * their running sum (one window pass). */
  def randomWalk(spark: org.apache.spark.sql.SparkSession, name: String,
      startS: Long, endS: Long, stepS: Long = 60): DataFrame = {
    val increment =
      (pmod(hash(col("name"), col("ts")).cast("long"), lit(1000L))
        .cast("double") / 1000.0) - 0.5
    timeFunction(spark, name, startS, endS, stepS)
      .withColumn("value", sum(increment)
        .over(Window.partitionBy("name").orderBy("ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** `verticalLine('ts'[, 'label'])`: a time-marker series — one point
    * at the given instant (the draw layer extends it vertically;
    * data-wise the instant is the content). */
  def verticalLine(spark: org.apache.spark.sql.SparkSession, tsS: Long,
      label: String): DataFrame = {
    import spark.implicits._
    Seq((label, tsS, 1.0)).toDF("name", "ts", "value")
  }

  /** `consolidateBy`: re-consolidate each fetched series down to at
    * most `maxDataPoints` slots using the CHOSEN function — graphite's
    * per-target override of the display consolidation (graphite-web
    * consolidates client-side after fetching; this is that step, so it
    * composes after any chain). Each series derives its own step and
    * factor from its own slots, like graphite does per series. A series
    * already inside the budget passes through unchanged (factor 1
    * buckets are the original slots). */
  def consolidateBy(df: DataFrame, fn: String,
      maxDataPoints: Int): DataFrame = {
    require(maxDataPoints > 0)
    val w = Window.partitionBy("name")
    val gap = col("ts") - lag("ts", 1).over(perSeries)
    val step = min(when(gap > 0, gap)).over(w)
    val slots = ((max("ts").over(w) - min("ts").over(w)) / step + 1)
      .cast("long")
    val factor = ceil(slots.cast("double") / maxDataPoints).cast("long")
    val interval = step * factor
    val anchor = min("ts").over(w)
    val bucket =
      (floor((col("ts") - anchor) / interval) * interval + anchor).cast("long")
    val agg: Column = fn match {
      case "sum" => sum("value")
      case "avg" | "average" => avg("value")
      case "max" => max("value")
      case "min" => min("value")
      case "last" => max_by(col("value"), when(col("value").isNotNull, col("ts")))
      case other => throw new IllegalArgumentException(
        s"consolidateBy: unknown function '$other'")
    }
    df.withColumn("__b", coalesce(bucket, col("ts")))
      .groupBy(col("name"), col("__b").as("ts"))
      .agg(agg.as("value"))
  }

  /** `exponentialMovingAverage`: EMA with graphite's constant
    * c = 2/(points+1), seeded with the simple average of the first
    * `points` slots (emitted at the end of that window; earlier slots
    * are None, functions.py exponentialMovingAverage). A None slot
    * emits None and leaves the EMA state unchanged. The recurrence is
    * sequential per series, so like [[HoltWinters]] this is a typed
    * `groupByKey(name).flatMapGroups` scan — one shuffle on name, then
    * a linear pass over render-sized points. */
  def exponentialMovingAverage(df: DataFrame, points: Int): DataFrame = {
    require(points > 0)
    val c = 2.0 / (points + 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("name"), col("ts").cast("long"),
        col("value").cast("double"))
      .as[(String, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (name, it) =>
        val pts = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        val out = Array.ofDim[(String, Long, Option[Double])](pts.length)
        var ema = 0.0
        var seeded = false
        var seedSum = 0.0; var seedCnt = 0
        var i = 0
        while (i < pts.length) {
          val (ts, v) = pts(i)
          if (!seeded) {
            v.foreach { x => seedSum += x; seedCnt += 1 }
            if (i == points - 1) {
              ema = if (seedCnt > 0) seedSum / seedCnt else 0.0
              seeded = true
              out(i) = (name, ts, Some(ema))
            } else out(i) = (name, ts, None)
          } else v match {
            case Some(x) =>
              ema = c * x + (1 - c) * ema
              out(i) = (name, ts, Some(ema))
            case None =>
              out(i) = (name, ts, None)
          }
          i += 1
        }
        out.iterator
      }
      .toDF("name", "ts", "value")
  }

  /** `movingWindow`: graphite's general trailing-window form —
    * `movingWindow(seriesList, windowSize, func)` — dispatching onto the
    * specific moving* implementations ('average' is the registered
    * default, functions.py movingWindow). */
  def movingWindow(df: DataFrame, points: Int,
      fn: String = "average"): DataFrame = fn match {
    case "average" | "avg" => movingAverage(df, points)
    case "median" => movingMedian(df, points)
    case "sum" => movingSum(df, points)
    case "min" => movingMin(df, points)
    case "max" => movingMax(df, points)
    case "stddev" => stdev(df, points)
    case other => throw new IllegalArgumentException(
      s"movingWindow: unknown function '$other'")
  }

  /** `removeEmptySeries`: drop series with no present values; with an
    * xFilesFactor, also series whose present fraction is below it
    * (functions.py removeEmptySeries). Same tiny-aggregate +
    * broadcast-semi-join shape as [[mostDeviant]]. */
  def removeEmptySeries(df: DataFrame, xff: Double = 0.0): DataFrame = {
    require(xff >= 0 && xff <= 1, s"xFilesFactor out of [0,1]: $xff")
    val kept = df.groupBy("name")
      .agg(count(col("value")).as("__nn"), count(lit(1)).as("__n"))
      .filter(col("__nn") > 0 && col("__nn") >= col("__n") * xff)
      .select("name")
    df.join(broadcast(kept), Seq("name"), "left_semi")
  }

  /** `removeBetweenPercentile`: keep only series that ESCAPE the
    * per-slot percentile band — at each ts the (100−n)th/nth rank
    * percentiles over all series' present values (graphite's
    * non-interpolating `_getPercentile`, same rank as
    * [[percentileOfSeries]]) form a band, and a series survives if any
    * of its values lies on or outside it (functions.py counts
    * `not lo < v < hi`; n<50 flips to 100−n first). The bound relation
    * is slot-count-sized; one ts join + a broadcast semi-join. */
  def removeBetweenPercentile(df: DataFrame, n: Double): DataFrame = {
    require(n > 0 && n <= 100, s"percentile out of range: $n")
    val p = if (n < 50) 100 - n else n
    val arr = sort_array(collect_list(col("value")))
    val bounds = df.groupBy("ts").agg(
      when(size(arr) > 0, element_at(arr, percentileRank(arr, 100 - p)))
        .as("__lo"),
      when(size(arr) > 0, element_at(arr, percentileRank(arr, p)))
        .as("__hi"))
    val kept = df.join(broadcast(bounds), Seq("ts"))
      .filter(col("value").isNotNull &&
        !(col("value") > col("__lo") && col("value") < col("__hi")))
      .select("name").distinct()
    df.join(broadcast(kept), Seq("name"), "left_semi")
  }

  /** `powSeries`: slot-wise left fold of x^y across all input series in
    * name order (functions.py safePow chain — graphite pairs by series
    * list position, which for a glob fetch is the sorted name list).
    * Any None factor poisons the slot, like [[multiplySeries]]. */
  def powSeriesList(df: DataFrame, alias: String = "powSeries"): DataFrame =
    df.groupBy("ts")
      .agg(when(count(lit(1)) === count(col("value")),
        aggregate(sort_array(collect_list(struct(col("name"), col("value")))),
          lit(null).cast("double"),
          (acc, s) => when(acc.isNull, s.getField("value"))
            .otherwise(pow(acc, s.getField("value")))))
        .as("value"))
      .select(lit(alias).as("name"), col("ts"), col("value"))

  /** `reduceSeries(mapSeries(...), fn, reduceNode, m1, m2)`: graphite's
    * per-group derived metric — series are keyed by their name with the
    * `reduceNode` component REMOVED, the removed component selects the
    * operand (`m1` = numerator/minuend, `m2` = denominator/subtrahend),
    * and each group emits one series named by its key (functions.py
    * reduceSeries/mapSeries; mapSeries' grouping is implicit in the
    * key). fn ∈ asPercent | divideSeries | diffSeries, each with the
    * same null/zero rules as its two-series form. One shuffle on
    * (key, ts). */
  def reduceSeries(df: DataFrame, fn: String, node: Int,
      matchers: Seq[String]): DataFrame = {
    require(matchers.length == 2,
      s"reduceSeries: $fn takes exactly 2 reduceMatchers, got " +
        s"${matchers.length}")
    require(node >= 0, "reduceSeries: reduceNode must be non-negative")
    val parts = split(col("name"), "\\.")
    val matcher = parts.getItem(node)
    // 4096 >> any real metric-path depth; slice clamps to the array end
    val key = concat_ws(".",
      concat(slice(parts, 1, node), slice(parts, node + 2, 4096)))
    val grouped = df.filter(matcher.isin(matchers: _*))
      .groupBy(key.as("name"), col("ts"))
      .agg(max(when(matcher === matchers.head, col("value"))).as("__a"),
        max(when(matcher === matchers(1), col("value"))).as("__b"))
    val value = fn match {
      case "asPercent" => when(col("__b") =!= 0, col("__a") / col("__b") * 100)
      case "divideSeries" => when(col("__b") =!= 0, col("__a") / col("__b"))
      // safeDiff: None counts as 0 unless both operands are None
      case "diffSeries" =>
        when(col("__a").isNull && col("__b").isNull, lit(null))
          .otherwise(coalesce(col("__a"), lit(0.0)) -
            coalesce(col("__b"), lit(0.0)))
      case other => throw new IllegalArgumentException(
        s"reduceSeries: unsupported reduce function '$other'")
    }
    grouped.select(col("name"), col("ts"), value.as("value"))
  }

  /** `sumSeriesLists` / `diffSeriesLists` / `multiplySeriesLists` /
    * `divideSeriesLists` / `aggregateSeriesLists`: pair the i-th series
    * of two lists and combine each pair slot-wise. Graphite pairs by
    * list position — a glob's resolution order, i.e. the sorted name
    * list — so ranks come from the two display-sized distinct-name
    * relations (broadcast joins; never a points-sized global sort).
    * Graphite raises when the lists differ in length; so does this, via
    * the same display-sized probe shape as `areaBetween`. Null rules
    * per pair follow the binary forms: sum/diff treat None as 0 unless
    * both are None; multiply poisons; divide needs a present non-zero
    * denominator. Result series are named `fn(a,b)` like graphite. */
  def pairwiseSeriesLists(df: DataFrame, other: DataFrame,
      op: String): DataFrame = {
    // guard on the distinct-name counts BEFORE planning the global
    // ranking windows, so corpus-scale input fails without ever
    // funnelling through the single-partition sort
    val na = requireDisplaySized(df, s"${op}SeriesLists")
    val nb = requireDisplaySized(other, s"${op}SeriesLists")
    require(na == nb && na > 0,
      s"${op}SeriesLists: lists must pair up 1:1, got $na vs $nb series")
    def ranked(in: DataFrame): DataFrame =
      in.select("name").distinct()
        .withColumn("__rank", row_number().over(Window.orderBy("name")))
    val ra = ranked(df)
    val rb = ranked(other)
    val fnName = op match {
      case "sum" => "sumSeries"
      case "diff" => "diffSeries"
      case "multiply" => "multiplySeries"
      case "divide" => "divideSeries"
      case other => throw new IllegalArgumentException(
        s"aggregateSeriesLists: unsupported pairwise function '$other'")
    }
    val a = df.join(broadcast(ra), Seq("name"))
      .select(col("__rank"), col("ts"), col("value").as("__av"))
    val b = other.join(broadcast(rb), Seq("name"))
      .select(col("__rank"), col("ts"), col("value").as("__bv"))
    val names = ra.select(col("__rank"), col("name").as("__an"))
      .join(rb.select(col("__rank"), col("name").as("__bn")), Seq("__rank"))
    val value = op match {
      case "sum" => when(col("__av").isNotNull || col("__bv").isNotNull,
        coalesce(col("__av"), lit(0.0)) + coalesce(col("__bv"), lit(0.0)))
      case "diff" => when(col("__av").isNotNull || col("__bv").isNotNull,
        coalesce(col("__av"), lit(0.0)) - coalesce(col("__bv"), lit(0.0)))
      case "multiply" => col("__av") * col("__bv")
      case "divide" => when(col("__bv") =!= 0, col("__av") / col("__bv"))
    }
    // full outer on (rank, ts): a slot present on either side renders
    // (graphite evaluates both operands over the same request window)
    a.join(b, Seq("__rank", "ts"), "full_outer")
      .join(broadcast(names), Seq("__rank"))
      .select(
        concat(lit(s"$fnName("), col("__an"), lit(","), col("__bn"),
          lit(")")).as("name"),
        col("ts"), value.as("value"))
  }
}
