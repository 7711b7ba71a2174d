package graft.glob

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** AST → Spark `Column` predicates over the catalog's per-component columns
  * `p0..pN` + `depth` — the pushdown-friendly prefilter, with the anchored
  * regex as the authoritative post-filter.
  *
  * Mirrors what the reference does against its indexes: SASI CQL generation
  * (biggraphite/drivers/cassandra_sasi.py:67-272 — equality / prefix LIKE /
  * name-equality shortcuts) and the ES query builder
  * (biggraphite/drivers/elasticsearch.py:232-324 — term/terms/wildcard/regexp
  * on p_i + depth). Equality and prefix predicates reach the Parquet scan as
  * pushed filters (min-max + dictionary skipping); `isin` covers `{a,b}`.
  */
object GlobPredicates {

  /** Max path components materialized as catalog columns (the reference's
    * COMPONENTS_MAX_LEN=64, drivers/cassandra_common.py:20-22). */
  val ComponentsMaxLen = 64

  /** Build a predicate over columns p0..pN + depth for metric names.
    * `nameCol` gets the final rlike regex; component columns get the
    * prunable prefilters. `maxComponents` bounds the positional predicates
    * to the columns the catalog actually materializes (deeper components
    * fall back to the regex post-filter instead of referencing a
    * nonexistent column). */
  def forMetrics(glob: String, nameCol: Column,
      maxComponents: Int = ComponentsMaxLen): Column = {
    val components = Glob.parse(glob)
    val regexFilter = nameCol.rlike(Glob.toRegex(glob))
    if (components.isEmpty) return regexFilter
    // bare top-level comma → the regex is a whole-pattern alternation;
    // component-wise predicates would contradict it (see Glob.toRegex:64)
    if (Glob.hasTopLevelAlternation(glob)) return regexFilter
    val hasGlobstar = components.contains(Glob.Globstar)
    val depthPred: Option[Column] =
      if (hasGlobstar) {
        val minDepth = components.count(_ != Glob.Globstar)
        if (minDepth > 0) Some(col("depth") >= minDepth) else None
      } else Some(col("depth") === components.length)

    // Positional predicates: exact positions before a globstar; after a
    // globstar positions are unknown, so skip them (regex still applies).
    val globstarIdx = components.indexOf(Glob.Globstar)
    val positional = components.zipWithIndex.flatMap { case (comp, i) =>
      if (i >= maxComponents || (globstarIdx >= 0 && i >= globstarIdx)) None
      else componentPredicate(comp, col(s"p$i"))
    }
    // whole-name literal prefix (leading fully-literal components) — a
    // directly pushable range predicate on the name column itself, like
    // the SASI prefix LIKE shortcut (drivers/cassandra_sasi.py:191-272)
    val namePrefix = {
      val lead = components.takeWhile {
        case Glob.Parts(List(Glob.Literal(_))) => true; case _ => false
      }.collect { case Glob.Parts(List(Glob.Literal(v))) => v }
      if (lead.isEmpty || lead.length == components.length) None
      else Some(nameCol.startsWith(lead.mkString("", ".", ".")))
    }
    (depthPred.toSeq ++ positional ++ namePrefix :+ regexFilter).reduce(_ && _)
  }

  /** Fully-defined glob (no wildcards at all) → direct name equality, the
    * reference's shortcut at drivers/cassandra.py:2100-2113. */
  def fullyDefined(glob: String): Option[Seq[String]] = {
    val components = Glob.parse(glob)
    if (components.isEmpty) return None
    val perComponent = components.map {
      case Glob.Parts(List(Glob.Literal(v))) => Some(List(v))
      case Glob.Parts(List(Glob.SequenceIn(vs))) => Some(vs)
      case Glob.Parts(parts) if parts.forall {
            case _: Glob.Literal | _: Glob.SequenceIn => true; case _ => false } =>
        // cross-product of literal/alternation runs
        Some(parts.foldLeft(List("")) {
          case (acc, Glob.Literal(v)) => acc.map(_ + v)
          case (acc, Glob.SequenceIn(vs)) => acc.flatMap(a => vs.map(a + _))
          case (acc, _) => acc
        })
      case _ => None
    }
    if (perComponent.exists(_.isEmpty)) None
    else Some(perComponent.map(_.get).foldLeft(List("")) { (acc, vs) =>
      acc.flatMap(a => vs.map(v => if (a.isEmpty) v else s"$a.$v"))
    })
  }

  private def componentPredicate(comp: Glob.Component, c: Column): Option[Column] =
    comp match {
      case Glob.Globstar => None
      case Glob.Parts(parts) =>
        parts match {
          case List(Glob.Literal(v)) => Some(c === v)
          case List(Glob.SequenceIn(vs)) => Some(c.isin(vs: _*))
          case Glob.Literal(prefix) :: rest if rest.nonEmpty =>
            Some(c.startsWith(prefix))
          case _ => None
        }
    }
}
