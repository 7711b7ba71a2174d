package graft.model

/** Time-series aggregation functions with Whisper/Graphite semantics.
  *
  * Reference semantics: biggraphite/metric.py:197-370 — five aggregators
  * (minimum/maximum/total/average/last). Two operations:
  *   - `aggregate`: collapse (value, count) pairs to one final value
  *   - `merge`: collapse (value, count) pairs to one *partial* (value, count)
  * Average is carried as (sum, count) in aggregated stages and divided only
  * at read time (metric.py:237-241,282-284). NaN handling (metric.py:340-370):
  *   - total/average skip NaN values AND their counts (all-NaN → (NaN, NaN))
  *   - minimum/maximum skip NaN for the value but keep ALL counts
  *   - last picks the newest non-NaN value, keeps ALL counts
  * Values are ordered oldest→newest; we carry (value, count, order) triples
  * where order is a timestamp or sequence number, making "newest" explicit
  * (order-independent, hence Spark-friendly). Ties in order resolve to the
  * later element, matching the reference's list ordering.
  */
sealed abstract class Aggregator(val name: String, val carbonName: String) {

  /** Collapse (value, count, order) triples to a single final value.
    * All-NaN or empty → NaN. */
  def aggregate(points: Seq[(Double, Double, Long)]): Double

  /** Collapse to a partial (value, count) — what aggregated stages store.
    * Empty → (NaN, NaN). */
  def merge(points: Seq[(Double, Double, Long)]): (Double, Double)

  /** Final value from a stored (value, count) partial — identity except avg. */
  def finalizeValue(value: Double, count: Double): Double = value

  protected final def sumAndCount(ps: Seq[(Double, Double, Long)]): (Double, Double) = {
    var total = 0.0; var count = 0.0; var any = false
    ps.foreach { case (v, c, _) => if (!v.isNaN) { total += v; count += c; any = true } }
    if (!any || count == 0.0) (Double.NaN, Double.NaN) else (total, count)
  }

  protected final def allCounts(ps: Seq[(Double, Double, Long)]): Double =
    ps.iterator.map(_._2).sum

  protected final def newestNonNaN(ps: Seq[(Double, Double, Long)]): Double = {
    var best = Double.NaN; var bestOrder = Long.MinValue; var found = false
    ps.foreach { case (v, _, o) =>
      if (!v.isNaN && (!found || o >= bestOrder)) { best = v; bestOrder = o; found = true }
    }
    best
  }
}

object Aggregator {
  case object Minimum extends Aggregator("minimum", "min") {
    def aggregate(ps: Seq[(Double, Double, Long)]): Double = {
      val keep = ps.collect { case (v, _, _) if !v.isNaN => v }
      if (keep.isEmpty) Double.NaN else keep.min
    }
    def merge(ps: Seq[(Double, Double, Long)]): (Double, Double) =
      if (ps.isEmpty) (Double.NaN, Double.NaN) else (aggregate(ps), allCounts(ps))
  }

  case object Maximum extends Aggregator("maximum", "max") {
    def aggregate(ps: Seq[(Double, Double, Long)]): Double = {
      val keep = ps.collect { case (v, _, _) if !v.isNaN => v }
      if (keep.isEmpty) Double.NaN else keep.max
    }
    def merge(ps: Seq[(Double, Double, Long)]): (Double, Double) =
      if (ps.isEmpty) (Double.NaN, Double.NaN) else (aggregate(ps), allCounts(ps))
  }

  case object Total extends Aggregator("total", "sum") {
    def aggregate(ps: Seq[(Double, Double, Long)]): Double = sumAndCount(ps)._1
    def merge(ps: Seq[(Double, Double, Long)]): (Double, Double) =
      if (ps.isEmpty) (Double.NaN, Double.NaN) else sumAndCount(ps)
  }

  /** Stored as (sum, count); divided only at read (metric.py:237-241). */
  case object Average extends Aggregator("average", "average") {
    def aggregate(ps: Seq[(Double, Double, Long)]): Double = {
      val (t, c) = sumAndCount(ps)
      t / c // NaN/NaN = NaN for the all-skipped case
    }
    def merge(ps: Seq[(Double, Double, Long)]): (Double, Double) =
      if (ps.isEmpty) (Double.NaN, Double.NaN) else sumAndCount(ps)
    override def finalizeValue(value: Double, count: Double): Double = value / count
  }

  /** Newest non-NaN value (metric.py:243-249,286-292). */
  case object Last extends Aggregator("last", "last") {
    def aggregate(ps: Seq[(Double, Double, Long)]): Double =
      if (ps.isEmpty) Double.NaN else newestNonNaN(ps)
    def merge(ps: Seq[(Double, Double, Long)]): (Double, Double) =
      if (ps.isEmpty) (Double.NaN, Double.NaN)
      else (newestNonNaN(ps), allCounts(ps))
  }

  val all: Seq[Aggregator] = Seq(Minimum, Maximum, Total, Average, Last)

  def fromName(s: String): Aggregator =
    all.find(a => a.name == s || a.carbonName == s).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregator: $s"))
}
