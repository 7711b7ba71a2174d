package graft.model

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

/** Metric-name utilities.
  *
  * Reference: biggraphite/metric.py:106-194 (encode/sanitize drop empty
  * components), uuid5 id under a fixed namespace (metric.py:31,157-178),
  * components/depth/parent derivation mirroring the directory-tree columns
  * (drivers/elasticsearch.py:202-221, CASSANDRA_DESIGN.md:96-129).
  */
object MetricName {
  /** Fixed UUID namespace (metric.py:31). */
  val Namespace: UUID = UUID.fromString("00000000-1111-2222-3333-444444444444")

  /** Drop empty path components: "a..b." -> "a.b" (metric.py:181-194). */
  def sanitize(name: String): String =
    name.split("\\.", -1).iterator.filter(_.nonEmpty).mkString(".")

  def components(name: String): Array[String] =
    name.split("\\.", -1).filter(_.nonEmpty)

  def depth(name: String): Int = components(name).length

  /** Parent path with trailing dot like the reference's directory parent
    * ("a.b.c" -> "a.b."), empty for root-level names. */
  def parent(name: String): String = {
    val cs = components(name)
    if (cs.length <= 1) "" else cs.dropRight(1).mkString("", ".", ".")
  }

  /** All ancestor directory names of a metric: "a.b.c" -> ["a", "a.b"].
    * (drivers/cassandra.py:1783-1804 parent-chain generation.) */
  def ancestors(name: String): Seq[String] = {
    val cs = components(name)
    (1 until cs.length).map(i => cs.take(i).mkString("."))
  }

  /** RFC 4122 UUIDv5 (SHA-1, name-based) — same id the reference derives
    * (metric.py:157-178 uses uuid.uuid5). */
  def uuid5(namespace: UUID, name: String): UUID = {
    val md = MessageDigest.getInstance("SHA-1")
    val nsBytes = new Array[Byte](16)
    val bb = java.nio.ByteBuffer.wrap(nsBytes)
    bb.putLong(namespace.getMostSignificantBits)
    bb.putLong(namespace.getLeastSignificantBits)
    md.update(nsBytes)
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val hash = md.digest()
    hash(6) = ((hash(6) & 0x0f) | 0x50).toByte // version 5
    hash(8) = ((hash(8) & 0x3f) | 0x80).toByte // IETF variant
    val hb = java.nio.ByteBuffer.wrap(hash)
    new UUID(hb.getLong, hb.getLong)
  }

  def metricId(name: String): String = uuid5(Namespace, name).toString
}

/** Per-metric logical schema (metric.py:631-726). xfilesfactor is
  * normalized to 2 decimals on round-trip (metric.py:691-698). */
final case class MetricMetadata(
    aggregator: Aggregator = Aggregator.Average,
    retention: Retention = Retention.default,
    carbonXFilesFactor: Double = MetricMetadata.DefaultXFF) {
  def normalizedXFF: Double = math.rint(carbonXFilesFactor * 100) / 100.0
}

object MetricMetadata {
  val DefaultXFF = 0.5
}

/** A named metric with identity and lifecycle timestamps
  * (metric.py:47-103). */
final case class Metric(
    name: String,
    id: String,
    metadata: MetricMetadata,
    createdOnMs: Long = 0L,
    updatedOnMs: Long = 0L,
    readOnMs: Long = 0L) {
  def retention: Retention = metadata.retention
  def aggregator: Aggregator = metadata.aggregator
}

object Metric {
  def apply(name: String, metadata: MetricMetadata): Metric = {
    val clean = MetricName.sanitize(name)
    Metric(clean, MetricName.metricId(clean), metadata)
  }
}
