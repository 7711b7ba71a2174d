package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns.
  *
  * The HOF route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) evaluates an
  * interpreted lambda tree per ELEMENT — the dominant cost of every
  * pairwise-similarity join once norms are factored out. This expression
  * runs the whole product as one tight codegen'd loop per pair: no
  * per-element virtual calls, no intermediate zipped array allocation.
  *
  * Exact parity with the HOF form, so swapping it in never changes
  * results: elements cast to double BEFORE multiplying, products
  * accumulated in ascending index order (same fold order → same IEEE
  * rounding), empty arrays → 0.0, null array / null element / unequal
  * lengths → null (zip_with pads the short side with null, which poisons
  * the HOF sum — mirrored here by an explicit null return). */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemTag(e: Expression): Char =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 'F'
      case DoubleType => 'D'
      case IntegerType => 'I'
      case LongType => 'L'
      case ShortType => 'S'
      case ByteType => 'B'
      case other => throw new IllegalStateException(s"unchecked $other")
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(et, _) => Seq(FloatType, DoubleType, IntegerType,
        LongType, ShortType, ByteType).contains(et)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot needs two numeric arrays, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    ArrayDot.dot(l.asInstanceOf[ArrayData], elemTag(left),
      r.asInstanceOf[ArrayData], elemTag(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $res = graft.functions.ArrayDot.dot(
         |  $a, '${elemTag(left)}', $b, '${elemTag(right)}');
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_array_dot"
}

object ArrayDot {

  /** Tight dot-product loop over Catalyst array data. `at`/`bt` tag the
    * element accessor (F/D/I/L/S/B); the tag compare is loop-invariant and
    * branch-predicted, so the loop stays a multiply-add per element. */
  def dot(a: ArrayData, at: Char, b: ArrayData, bt: Char): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += elem(a, at, i) * elem(b, bt, i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  private def elem(x: ArrayData, t: Char, i: Int): Double = (t: @annotation.switch) match {
    case 'F' => x.getFloat(i).toDouble
    case 'D' => x.getDouble(i)
    case 'I' => x.getInt(i).toDouble
    case 'L' => x.getLong(i).toDouble
    case 'S' => x.getShort(i).toDouble
    case 'B' => x.getByte(i).toDouble
  }

  /** Column API: `array_dot(a, b)` — drop-in for the HOF dot product. */
  def array_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
