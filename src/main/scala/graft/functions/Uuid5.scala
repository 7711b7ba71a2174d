package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.MetricName

/** Native Catalyst expression computing the metric id: RFC 4122 UUIDv5 of
  * the name under the reference's fixed namespace (metric.py:31,157-178).
  *
  * A native expression (with codegen emitting a direct static call) keeps
  * id derivation inside whole-stage codegen — no Scala-UDF closure
  * serialization, no row boxing — so catalog builds over billions of names
  * stay in the fast path. */
case class MetricUuid5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(name: Any): Any =
    UTF8String.fromString(
      MetricName.metricId(name.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.model.MetricName.metricId($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): MetricUuid5 =
    copy(child = newChild)

  override def prettyName: String = "graft_uuid5"
}

/** SQL-surface registration of the engine's scalar functions — the
  * SparkSessionExtensions hook (installable with
  * `spark.sql.extensions=graft.functions.GraftExtensions`) plus a direct
  * `register(spark)` for already-built sessions. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.RegexPrefixPushdown)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  /** Int parameters of the native expressions must be literals in SQL
    * (they shape the generated code). */
  private def intArg(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private[functions] val builders
      : Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_uuid5", classOf[MetricUuid5],
      (es: Seq[Expression]) => MetricUuid5(es.head)),
    ("graft_fingerprint", classOf[RollingFingerprint],
      (es: Seq[Expression]) => RollingFingerprint(es(0),
        intArg(es(1), "graft_fingerprint", "window"))),
    ("graft_array_dot", classOf[ArrayDot],
      (es: Seq[Expression]) => ArrayDot(es(0), es(1))),
    ("graft_minhash_sig", classOf[MinHashSig],
      (es: Seq[Expression]) => MinHashSig(es(0),
        intArg(es(1), "graft_minhash_sig", "numHashes"),
        intArg(es(2), "graft_minhash_sig", "n"))),
    ("graft_simhash", classOf[SimHashSig],
      (es: Seq[Expression]) => SimHashSig(es(0),
        intArg(es(1), "graft_simhash", "bits"))),
    ("graft_shingle_set", classOf[ShingleSet],
      (es: Seq[Expression]) => ShingleSet(es(0),
        intArg(es(1), "graft_shingle_set", "n"))),
    ("graft_sorted_intersect_count", classOf[SortedIntersectCount],
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    ("graft_char_entropy", classOf[TextEntropy],
      (es: Seq[Expression]) => TextEntropy(es.head, token = false)),
    ("graft_token_entropy", classOf[TextEntropy],
      (es: Seq[Expression]) => TextEntropy(es.head, token = true)),
    ("graft_nfc", classOf[NfcNormalize],
      (es: Seq[Expression]) => NfcNormalize(es.head)),
    ("graft_media_probe", classOf[MediaProbe],
      (es: Seq[Expression]) => MediaProbe(es.head)),
    ("graft_adc_score", classOf[AdcScore],
      (es: Seq[Expression]) => AdcScore(es(0), es(1))))

  private[functions] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, cls, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
    }

  /** Register the functions on an existing session (test/driver use). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** Column-API form. */
  def graft_uuid5(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MetricUuid5(GraftColumnBridge.expression(c)))
  }
}
