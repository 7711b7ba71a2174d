package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Top-2 of an integer-scaled score array under the (score DESC,
  * index ASC) tie rule — one linear pass, replacing the nested
  * CaseWhen argmax folds whose codegen cost exploded with the class
  * count (Catalyst's `reduceCodeSize` re-stringifies every enclosing
  * block per nesting level, measured at seconds of DRIVER time per
  * planning pass for a C≈8 top-2 fold in the nbMargin face).
  *
  * Input: per-class scores in LABEL-ASCENDING order (the classifier's
  * tie order), so "smallest index wins ties" IS the (score DESC,
  * label ASC) window rule. Returns
  * `struct<top_idx int, second_idx int, top long, second long>`;
  * single-class arrays report second_idx = -1, second = 0 (callers
  * that read the second have already required ≥ 2 classes). Null
  * array → null; null elements are not expected (scores are computed,
  * never read) and refuse loudly rather than mis-rank. */
case class Top2Scores(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top_idx", IntegerType, nullable = false),
    StructField("second_idx", IntegerType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("second", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top2_scores needs array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    Top2Scores.top2(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Top2Scores.top2($c)")

  override protected def withNewChildInternal(newChild: Expression): Top2Scores =
    copy(child = newChild)

  override def prettyName: String = "graft_top2_scores"
}

object Top2Scores {

  def top2(scores: ArrayData): GenericInternalRow = {
    val n = scores.numElements()
    require(n >= 1, "top2_scores needs at least one score")
    var topIdx = -1
    var top = Long.MinValue
    var secondIdx = -1
    var second = Long.MinValue
    var i = 0
    while (i < n) {
      require(!scores.isNullAt(i), s"top2_scores: null score at index $i")
      val s = scores.getLong(i)
      if (topIdx == -1 || s > top) {
        secondIdx = topIdx; second = top
        topIdx = i; top = s
      } else if (secondIdx == -1 || s > second) {
        secondIdx = i; second = s
      }
      i += 1
    }
    if (secondIdx == -1) { second = 0L }
    new GenericInternalRow(Array[Any](topIdx, secondIdx, top, second))
  }

  /** Column API over label-ascending scores. */
  def top2_scores(scores: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Top2Scores(GraftColumnBridge.expression(scores)))
  }
}
