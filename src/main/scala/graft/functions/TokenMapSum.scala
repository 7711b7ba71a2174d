package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native Σ weight(token) over a token array against a FROZEN
  * token→long weight table — the scoring kernel of
  * [[graft.operators.Classify.nbScoreFrozen]]: per (document, class),
  * the integer-scaled log-likelihood sum is one pass over the tokens
  * with an O(1) hash probe each, instead of the join-shaped path
  * (explode → broadcast join → groupBy → window) that cost a shuffle
  * per micro-batch in streaming routing.
  *
  * The table rides as a codegen REFERENCE object, never a literal
  * expression tree — a 100k-term vocabulary adds nothing to plan
  * analysis time (the broadcast-model contract, moved driver-side).
  *
  * Semantics (exact parity with the join path): tokens absent from the
  * table add 0 (out-of-vocab dropped); a token appearing k times adds
  * k·weight (explode counted occurrences); null elements add nothing;
  * a null token ARRAY is null — callers coalesce to 0 to reproduce the
  * join path's prior-only fallback for docs with no token rows. */
case class TokenMapSum(child: Expression, weights: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_map_sum needs array<string>, got ${other.sql}")
  }

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      weights.size * 2)
    weights.foreach { case (t, w) =>
      m.put(UTF8String.fromString(t), java.lang.Long.valueOf(w))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TokenMapSum.sum(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("weightTable", table,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenMapSum.sum($c, $tableRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenMapSum = copy(child = newChild)

  override def prettyName: String = "graft_token_map_sum"
}

object TokenMapSum {

  /** One pass, one hash probe per non-null token; misses add 0. */
  def sum(tokens: ArrayData,
      table: java.util.HashMap[UTF8String, java.lang.Long]): Long = {
    val n = tokens.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = table.get(tokens.getUTF8String(i))
        if (w != null) s += w.longValue()
      }
      i += 1
    }
    s
  }

  /** Column API: Σ weights(token) over `toks` (null array → null). */
  def token_map_sum(toks: Column, weights: Map[String, Long]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TokenMapSum(
      GraftColumnBridge.expression(toks), weights))
  }
}
