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
    e.injectFunction(GraftFunctions.uuid5Descriptor)
    e.injectOptimizerRule(_ => graft.plans.RegexPrefixPushdown)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[functions] val uuid5Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_uuid5"),
      new ExpressionInfo(classOf[MetricUuid5].getName, "graft_uuid5"),
      (exprs: Seq[Expression]) => MetricUuid5(exprs.head))

  /** Register the functions on an existing session (test/driver use). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_uuid5", exprs => MetricUuid5(exprs.head), "built-in")

  /** Column-API form. */
  def graft_uuid5(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MetricUuid5(GraftColumnBridge.expression(c)))
  }
}
