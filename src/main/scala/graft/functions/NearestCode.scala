package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native per-subspace PQ code assignment — the kernel inside
  * [[graft.operators.ProductQuantization]]'s `assignCodes` (every
  * pqTrain round, every corpus/residual encode): given a subspace id
  * and its subvector, ONE pass over that subspace's frozen codebook
  * returns the squared-L2-argmin code. The join shape it replaces —
  * subvectors × broadcast(codebooks) then a per-(id, sub) min_by —
  * materialized ksub rows per subvector and paid a corpus-scale
  * shuffle per call.
  *
  * Exact parity with the join path (NearestCodeSpec pins it against
  * the retained `assignCodesJoin`):
  *  - d² = round((v·v − 2·v·c) + c·c, 6) with the [[ArrayDot]]
  *    ascending-index double folds, c·c frozen at build time from the
  *    same fold, Spark's double `round` (NaN/Inf pass through);
  *  - argmin iterates codes in ascending order with a STRICT
  *    `Double.compare < 0` — `min_by(struct(d2, code))` exactly: ties
  *    keep the LOWEST code, and a NaN d² (an Inf subvector element)
  *    never beats a finite one;
  *  - a subvector poisoning every dot (null element, or length ≠
  *    subDim) takes the sub's FIRST code — min_by's null-first
  *    ordering, which such a row hits on every code at once;
  *  - a NULL subvector (or sub) is null — the caller coalesces to the
  *    sub's first code, reproducing the join row.
  *
  * The codebooks ride flattened as codegen reference objects (per-sub
  * offsets + aligned code/centroid/self-norm vectors); m·ksub entries
  * add nothing to plan analysis. */
case class NearestCode(left: Expression, right: Expression,
    subStart: Array[Int], codes: Array[Int], cent: Array[Double],
    c2: Array[Double], subDim: Int) extends BinaryExpression {

  require(subStart.length >= 2 && subStart.head == 0 &&
    subStart.last == codes.length && c2.length == codes.length &&
    cent.length == codes.length * subDim && subDim > 0,
    s"nearest_code needs a consistent codebook layout: " +
      s"subs=${subStart.length - 1}, codes=${codes.length}, " +
      s"cent=${cent.length}, subDim=$subDim")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_code needs (int, array<double>), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(sub: Any, sv: Any): Any =
    NearestCode.nearest(sub.asInstanceOf[Int], sv.asInstanceOf[ArrayData],
      subStart, codes, cent, c2, subDim)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ssRef = ctx.addReferenceObj("ncSubStart", subStart, "int[]")
    val cdRef = ctx.addReferenceObj("ncCodes", codes, "int[]")
    val ctRef = ctx.addReferenceObj("ncCent", cent, "double[]")
    val c2Ref = ctx.addReferenceObj("ncC2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = graft.functions.NearestCode.nearest(" +
        s"$s, $v, $ssRef, $cdRef, $ctRef, $c2Ref, $subDim);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestCode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_nearest_code"
}

object NearestCode {

  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Squared-L2 argmin over one subspace's codes, ascending, strict
    * compare — `min_by(struct(round(d2, 6), code))` exactly. */
  def nearest(sub: Int, sv: ArrayData, subStart: Array[Int],
      codes: Array[Int], cent: Array[Double], c2: Array[Double],
      subDim: Int): Int = {
    val from = subStart(sub)
    val until = subStart(sub + 1)
    val n = sv.numElements()
    // a poisoned subvector (wrong length / null element) nulls every
    // d2 at once — min_by's null-first ordering lands on the first code
    if (n != subDim) return codes(from)
    var v2 = 0.0
    var i = 0
    while (i < n) {
      if (sv.isNullAt(i)) return codes(from)
      val e = sv.getDouble(i)
      v2 += e * e
      i += 1
    }
    var best = from
    var bestD2 = Double.NaN
    var e = from
    while (e < until) {
      var d = 0.0
      var j = 0
      val off = e * subDim
      while (j < subDim) {
        d += sv.getDouble(j) * cent(off + j)
        j += 1
      }
      val d2 = round6((v2 - 2.0 * d) + c2(e))
      if (e == from || java.lang.Double.compare(d2, bestD2) < 0) {
        best = e; bestD2 = d2
      }
      e += 1
    }
    codes(best)
  }

  /** Column API: the argmin code of `sv` in subspace `sub` (null
    * inputs → null; callers coalesce to the sub's first code to
    * reproduce the join path's null-poisoned row). */
  def nearest_code(sub: Column, sv: Column, subStart: Array[Int],
      codes: Array[Int], cent: Array[Double], c2: Array[Double],
      subDim: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCode(
      GraftColumnBridge.expression(sub), GraftColumnBridge.expression(sv),
      subStart, codes, cent, c2, subDim))
  }
}
