package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native ADC (asymmetric distance computation) scoring for product
  * quantization: given a candidate's code array and a query's DENSE
  * per-slot distance table (slot = subspace·stride + code, built once
  * per query), return Σ_sub table[sub·stride + codes[sub]] — the
  * m-lookup inner loop of a PQ scan.
  *
  * The HOF route (`aggregate(transform(codes, lookup), 0.0, _+_)`)
  * pays an interpreted lambda per SUBSPACE per candidate, and a map
  * lookup there is an O(entries) MapData scan — more per-pair work
  * than the float dot the codes replaced. This expression is the
  * tight loop the scan deserves: m array loads and adds, inside
  * whole-stage codegen, summed in ascending subspace order (the same
  * fold order as the HOF form and the cross-engine oracle).
  *
  * The stride rides as the table's FIRST element (slot 0 is never a
  * valid lookup target only when stride ≥ 1 — see [[adc_score]], which
  * prepends it), keeping the expression binary and the table layout
  * self-describing. Null table slot / null code / out-of-range slot →
  * null (a code must always resolve against a well-formed table). */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val tableOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codesOk && tableOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"adc_score needs (array<int> codes, array<double> table), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(c: Any, t: Any): Any =
    AdcScore.score(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])

  // the loop is emitted inline (not a call into score()) so the hot
  // path allocates nothing: the boxed-Double bridge costs one
  // allocation per CANDIDATE, and the PQ scan evaluates this once per
  // (query, posting) pair
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val n = ctx.freshName("adcN")
      val stride = ctx.freshName("adcStride")
      val m = ctx.freshName("adcM")
      val s = ctx.freshName("adcSum")
      val i = ctx.freshName("adcI")
      val code = ctx.freshName("adcCode")
      val slot = ctx.freshName("adcSlot")
      val bad = ctx.freshName("adcBad")
      s"""
         |final int $n = $t.numElements();
         |boolean $bad = $n < 1 || $t.isNullAt(0);
         |final int $stride = $bad ? 0 : (int) $t.getDouble(0);
         |$bad = $bad || $stride < 1;
         |double $s = 0.0;
         |if (!$bad) {
         |  final int $m = $c.numElements();
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($c.isNullAt($i)) { $bad = true; break; }
         |    final int $code = $c.getInt($i);
         |    if ($code < 0 || $code >= $stride) { $bad = true; break; }
         |    final int $slot = 1 + $code + $i * $stride;
         |    if ($slot >= $n || $t.isNullAt($slot)) { $bad = true; break; }
         |    $s += $t.getDouble($slot);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_adc_score"
}

object AdcScore {

  /** table layout: [stride, slot0, slot1, …] — Σ_i table[1 + codes[i] +
    * i·stride], null on any null/missing slot. */
  def score(codes: ArrayData, table: ArrayData): java.lang.Double = {
    val n = table.numElements()
    if (n < 1 || table.isNullAt(0)) return null
    val stride = table.getDouble(0).toInt
    if (stride < 1) return null
    val m = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      // c >= stride would silently read a NEIGHBORING subspace's slot
      // (still inside [1, n)) — reject it like any other malformed
      // lookup; codes from pqEncode are < stride by construction, but
      // the expression is SQL-registered and must not alias subspaces
      // on arbitrary input
      if (c < 0 || c >= stride) return null
      val slot = 1 + c + i * stride
      if (slot >= n || table.isNullAt(slot)) return null
      s += table.getDouble(slot)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column API: `adc_score(codes, table, stride)`. `table` is the
    * dense per-slot array (length m·stride, nulls at unused slots);
    * the stride is prepended here so the scoring loop is
    * self-contained. */
  def adc_score(codes: Column, table: Column, stride: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.{concat, array, lit}
    val tagged = concat(array(lit(stride.toDouble)), table)
    GraftColumnBridge.column(AdcScore(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(tagged)))
  }
}
