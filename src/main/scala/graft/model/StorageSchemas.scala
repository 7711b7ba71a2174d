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

/** storage-aggregation.conf rule: carbon resolves aggregationMethod and
  * xFilesFactor from a SEPARATE first-match rule list than retentions. */
final case class AggregationRule(pattern: String, aggregator: Aggregator,
    xFilesFactor: Double) {
  private val re = pattern.r
  def matches(name: String): Boolean = re.findFirstIn(name).isDefined
}

final case class StorageSchemas(rules: Seq[SchemaRule],
    default: MetricMetadata = MetricMetadata(),
    aggRules: Seq[AggregationRule] = Nil) {

  /** First matching rule wins (carbon semantics). When aggregation rules
    * are present (storage-aggregation.conf), the aggregator/xff of the
    * first matching aggregation rule OVERRIDES the schema rule's — the
    * two conf files match independently, exactly as carbon applies them. */
  def metadataFor(name: String): MetricMetadata = {
    val base = rules.find(_.matches(name))
      .map(r => MetricMetadata(r.aggregator, r.retention, r.xFilesFactor))
      .getOrElse(default)
    aggRules.find(_.matches(name)) match {
      case Some(a) => base.copy(aggregator = a.aggregator,
        carbonXFilesFactor = a.xFilesFactor)
      case None => base
    }
  }

  def metricFor(name: String): Metric = Metric(name, metadataFor(name))
}

object StorageSchemas {

  private val WhisperPart = """^(\d+)([smhdwy]?):(\d+)([smhdwy]?)$""".r
  private val unitS = Map("" -> 1L, "s" -> 1L, "m" -> 60L, "h" -> 3600L,
    "d" -> 86400L, "w" -> 604800L, "y" -> 31536000L)

  /** Parse a whisper-style retention "60s:1d,300s:30d" (precision:duration
    * pairs) or fall through to the native "N*Ms:..." form
    * (metric.py:571-591 equivalent). Whisper's historical second form is
    * honored: a UNITLESS second field is a POINT COUNT, not a duration
    * ("60:1440" = 1440 points of 60 s), matching
    * whisper.parseRetentionDef. */
  def parseRetention(s: String): Retention =
    if (s.contains("*")) Retention.fromString(s)
    else Retention(s.split(",").toList.zipWithIndex.map { case (part, i) =>
      part.trim match {
        case WhisperPart(p, pu, d, du) =>
          val precision = p.toLong * unitS(pu)
          val points =
            if (du.isEmpty) d.toLong // bare number → point count
            else d.toLong * unitS(du) / precision
          Stage(points = points, precisionS = precision, stage0 = i == 0)
        case other =>
          throw new IllegalArgumentException(s"invalid retention part: '$other'")
      }
    })

  /** Build from (pattern, retentionString, aggregatorName) triples. */
  def apply(rules: (String, String, String)*): StorageSchemas =
    StorageSchemas(rules.map { case (pat, ret, agg) =>
      SchemaRule(pat, parseRetention(ret), Aggregator.fromName(agg))
    })

  // ---- carbon conf-file parsing ---------------------------------------

  /** One INI section: [name] followed by key = value lines. Comments
    * (# or ;) and blank lines skipped; keys case-insensitive (carbon's
    * OrderedConfigParser behavior); file order preserved. */
  private[model] def parseIni(text: String): Seq[(String, Map[String, String])] = {
    val sections = Seq.newBuilder[(String, Map[String, String])]
    var current: Option[String] = None
    var kv = Map.empty[String, String]
    def commit(): Unit = current.foreach { name =>
      sections += ((name, kv)); kv = Map.empty
    }
    text.linesIterator.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") => ()
      case l if l.startsWith("[") && l.endsWith("]") =>
        commit(); current = Some(l.substring(1, l.length - 1).trim)
      case l if l.contains("=") && current.isDefined =>
        val Array(k, v) = l.split("=", 2)
        kv += (k.trim.toLowerCase -> v.trim)
      case _ => () // tolerate junk lines like carbon does
    }
    commit()
    sections.result()
  }

  /** Parse carbon's storage-schemas.conf + storage-aggregation.conf
    * contents into a rule set (plugins/carbon.py:310-369 loads exactly
    * these two files through carbon's config machinery; the reference
    * derives each new metric's MetricMetadata from them). Sections match
    * top-to-bottom, first match wins — per file, independently. */
  def fromConf(storageSchemasConf: String,
      storageAggregationConf: String = ""): StorageSchemas = {
    val schemaRules = parseIni(storageSchemasConf).flatMap { case (_, kv) =>
      for (pat <- kv.get("pattern"); ret <- kv.get("retentions"))
        yield SchemaRule(pat, parseRetention(ret),
          kv.get("aggregationmethod").map(Aggregator.fromName)
            .getOrElse(Aggregator.Average),
          kv.get("xfilesfactor").map(_.toDouble)
            .getOrElse(MetricMetadata.DefaultXFF))
    }
    val aggRules = parseIni(storageAggregationConf).flatMap { case (_, kv) =>
      kv.get("pattern").map { pat =>
        AggregationRule(pat,
          kv.get("aggregationmethod").map(Aggregator.fromName)
            .getOrElse(Aggregator.Average),
          kv.get("xfilesfactor").map(_.toDouble)
            .getOrElse(MetricMetadata.DefaultXFF))
      }
    }
    StorageSchemas(schemaRules, aggRules = aggRules)
  }
}
