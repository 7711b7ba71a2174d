package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (Deequ-style expectations) —
  * the gate a training-data pipeline runs before ingesting a new drop
  * (beyond-reference scope). The contract is ONE verdict row per rule:
  * `(rule, checked, violations, pass)`.
  *
  * Scale shape (100 TB): never a scan per rule.
  *  - All row rules (not-null, range, accepted-values) AND all
  *    uniqueness rules fold into ONE aggregate pass over the table —
  *    row rules as `sum(when(violated, 1))`, uniqueness as
  *    `count(*) − count_distinct(keys)` (Catalyst plans the mixed
  *    distinct/non-distinct aggregate with one Expand over one scan).
  *    The one-row result is checkpointed and fanned out to verdict
  *    rows, so the corpus is read exactly once.
  *  - Each referential rule is one LEFT ANTI join against the
  *    (distinct, usually broadcastable) dimension key set — the only
  *    per-rule cost, and it is the join any FK check must pay.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** `col` must not be null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }

  /** Non-null values of `col` must lie in [lo, hi] (nulls are
    * [[NotNull]]'s business, not a range violation). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** Non-null values of `col` must be one of `values`. */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Rule {
    def name = s"accepted_values($col)"
  }

  /** The column tuple must be unique across the table; violations =
    * excess rows (total − distinct key tuples). */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every (non-null-tuple) key must exist in `dim`'s `dimCols`. */
  final case class ForeignKey(cols: Seq[String], dim: DataFrame,
      dimCols: Seq[String]) extends Rule {
    require(cols.size == dimCols.size, "FK arity mismatch")
    def name = s"foreign_key(${cols.mkString(",")})"
  }

  /** The per-row violation predicate of a row rule (shared with the
    * streaming gate's record routing). */
  private[graft] def rowViolated(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case AcceptedValues(c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case _ => throw new IllegalArgumentException(s"not a row rule: $r")
  }

  /** Validate `df` against `rules`: one verdict row per rule, ordered
    * by rule name. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val rowRules = rules.filter {
      case _: NotNull | _: InRange | _: AcceptedValues => true
      case _ => false
    }
    val uniqueRules = rules.collect { case u: Unique => u }
    val fkRules = rules.collect { case f: ForeignKey => f }

    // the single corpus pass: total + per-row-rule violation sums +
    // per-uniqueness-rule distinct key counts
    val aggs = (count(lit(1)).as("__n") +:
      rowRules.zipWithIndex.map { case (r, i) =>
        sum(when(rowViolated(r), 1L).otherwise(0L)).as(s"__v$i") }) ++
      uniqueRules.zipWithIndex.map { case (u, i) =>
        count_distinct(struct(u.cols.map(col): _*)).as(s"__u$i") }
    // ONE ROW of counters — collected driver-side (planning metadata,
    // the repo convention), never checkpointed: the streaming gate
    // calls validate per micro-batch, and a checkpoint here would pin
    // one cached RDD per batch for the job's lifetime
    val baseRow = df.agg(aggs.head, aggs.tail: _*).head()
    val n = baseRow.getLong(baseRow.fieldIndex("__n"))
    def counter(name: String): Long = // sums over an empty corpus: null
      Option(baseRow.get(baseRow.fieldIndex(name)))
        .map(_.asInstanceOf[Long]).getOrElse(0L)

    val spark = df.sparkSession
    import spark.implicits._
    val scalarVerdicts: Seq[(String, Long, Long)] =
      rowRules.zipWithIndex.map { case (r, i) =>
        (r.name, n, counter(s"__v$i")) } ++
      uniqueRules.zipWithIndex.map { case (u, i) =>
        (u.name, n, n - counter(s"__u$i")) }
    val scalarDf =
      if (scalarVerdicts.isEmpty) Nil
      else Seq(scalarVerdicts.toDF("rule", "checked", "violations"))
    val fkVerdicts = fkRules.map { f =>
      val dimKeys = f.dim
        .select(f.dimCols.map(c => col(c).as(s"__dk_$c")): _*).distinct()
      val cond = f.cols.zip(f.dimCols)
        .map { case (c, d) => col(c) === col(s"__dk_$d") }.reduce(_ && _)
      // null-tupled FKs are NotNull's business: anti-join keeps them,
      // so exclude rows where any key column is null
      val nonNull = f.cols.map(col(_).isNotNull).reduce(_ && _)
      df.filter(nonNull).join(dimKeys, cond, "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(f.name).as("rule"), lit(n).as("checked"),
          col("violations"))
    }

    (scalarDf ++ fkVerdicts)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("rule")
  }
}
