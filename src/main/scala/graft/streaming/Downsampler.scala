package graft.streaming

import graft.model._

/** Per-process registry of incremental [[MetricAggregates]], keyed by metric
  * name, with idle-state purging.
  *
  * Reference: biggraphite/drivers/_downsampling.py:29-83 (capacity 20,
  * purge sweep every 3600 s; obsolete = idle longer than 2× the first
  * downsampled stage's precision).
  */
final class Downsampler(capacity: Int = Downsampler.Capacity) {
  import scala.collection.mutable
  private val aggregates = mutable.Map[String, MetricAggregates]()
  private var lastPurge = 0L

  def feed(metric: Metric, points: Seq[(Long, Double)]): Seq[MetricAggregates#Emitted] = {
    val agg = aggregates.getOrElseUpdate(metric.name,
      new MetricAggregates(metric.metadata, capacity))
    agg.update(points)
  }

  def size: Int = aggregates.size

  def clear(): Unit = { aggregates.clear(); lastPurge = 0L }

  def purge(nowS: Long, everyS: Long = Downsampler.PurgeEveryS): Unit = {
    if (nowS - lastPurge <= everyS) return
    lastPurge = nowS
    aggregates.filterInPlace { case (_, a) => !a.obsolete(nowS) }
  }
}

object Downsampler {
  val Capacity = 20
  val PurgeEveryS = 3600L
}
