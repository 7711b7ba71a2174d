package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native quantile-bucket lookup: the count of `cuts` strictly below
  * the input value — the bucket index of a value against sorted cut
  * points (Z-order bucketization, [[graft.operators.Layout]]).
  *
  * Why native: the HOF form `size(filter(cuts, c => v > c))` is
  * CodegenFallback — an interpreted, boxing lambda call per CUT per
  * ROW (measured as the dominant map-side cost of a single-file
  * z-order write); a chained-`when` ladder is codegen'd but its
  * expression tree grows 2^bits deep. This expression is one
  * codegen'd O(log n) lower-bound binary search with CONSTANT
  * generated-code size at any cut count.
  *
  * Semantics (exact parity with the codegen'd `when`-fold, so layouts
  * stay byte-stable): count of cuts c with v > c under SPARK's double
  * ordering — NaN sorts greater than every value (top bucket), unlike
  * Java's always-false NaN comparisons; null lands in bucket 0;
  * duplicate cuts behave as the fold did (each strictly-below copy
  * counts); empty cuts → 0. */
case class BucketIndex(child: Expression, cuts: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bucket_index needs a double input, got ${child.dataType.sql}")

  @transient private lazy val arr: Array[Double] = cuts.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else BucketIndex.bucket(arr, v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val cutsRef = ctx.addReferenceObj("cuts", arr, "double[]")
    ev.copy(isNull = FalseLiteral, code =
      code"""
        ${childGen.code}
        int ${ev.value} = 0;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.BucketIndex.bucket(
            $cutsRef, ${childGen.value});
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIndex =
    copy(child = newChild)

  override def prettyName: String = "graft_bucket_index"
}

object BucketIndex {

  /** Lower bound: first index whose cut is >= v == count of cuts < v.
    * NaN is greater than everything (Spark's double ordering, which
    * the `v > c` fold used) → top bucket; Java's raw `<` would
    * silently send NaN to bucket 0 instead. */
  def bucket(cuts: Array[Double], v: Double): Int = {
    if (java.lang.Double.isNaN(v)) return cuts.length
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Column API: bucket index of `v` (double) against sorted `cuts`. */
  def bucket_index(v: Column, cuts: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BucketIndex(GraftColumnBridge.expression(v), cuts))
  }
}
