package graft.model

/** Carbon storage-schemas / storage-aggregation rule matching: the config
  * that decides a new metric's retention, aggregator, and xFilesFactor on
  * first write.
  *
  * Reference: plugins/carbon.py:310-369 reads carbon's storage_schemas and
  * agg_rules (first matching pattern wins; patterns are regexes searched
  * anywhere in the name, per carbon's conf format). Retention strings use
  * the whisper form "60s:1d,300s:30d" or the native
  * "points*precisions:..." form.
  */
final case class SchemaRule(
    pattern: String,
    retention: Retention,
    aggregator: Aggregator = Aggregator.Average,
    xFilesFactor: Double = MetricMetadata.DefaultXFF) {
  private val re = pattern.r
  def matches(name: String): Boolean = re.findFirstIn(name).isDefined
}

final case class StorageSchemas(rules: Seq[SchemaRule],
    default: MetricMetadata = MetricMetadata()) {

  /** First matching rule wins (carbon semantics). */
  def metadataFor(name: String): MetricMetadata =
    rules.find(_.matches(name))
      .map(r => MetricMetadata(r.aggregator, r.retention, r.xFilesFactor))
      .getOrElse(default)

  def metricFor(name: String): Metric = Metric(name, metadataFor(name))
}

object StorageSchemas {

  private val WhisperPart = """^(\d+)([smhdwy]?):(\d+)([smhdwy]?)$""".r
  private val unitS = Map("" -> 1L, "s" -> 1L, "m" -> 60L, "h" -> 3600L,
    "d" -> 86400L, "w" -> 604800L, "y" -> 31536000L)

  /** Parse a whisper-style retention "60s:1d,300s:30d" (precision:duration
    * pairs) or fall through to the native "N*Ms:..." form
    * (metric.py:571-591 equivalent). */
  def parseRetention(s: String): Retention =
    if (s.contains("*")) Retention.fromString(s)
    else Retention(s.split(",").toList.zipWithIndex.map { case (part, i) =>
      part.trim match {
        case WhisperPart(p, pu, d, du) =>
          val precision = p.toLong * unitS(pu)
          val duration = d.toLong * unitS(du)
          Stage(points = duration / precision, precisionS = precision,
            stage0 = i == 0)
        case other =>
          throw new IllegalArgumentException(s"invalid retention part: '$other'")
      }
    })

  /** Build from (pattern, retentionString, aggregatorName) triples. */
  def apply(rules: (String, String, String)*): StorageSchemas =
    StorageSchemas(rules.map { case (pat, ret, agg) =>
      SchemaRule(pat, parseRetention(ret), Aggregator.fromName(agg))
    })
}
