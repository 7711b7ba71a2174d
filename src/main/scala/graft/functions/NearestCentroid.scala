package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment — the kernel inside
  * [[graft.operators.Clustering.assignCells]], the single hottest
  * shared shape in the vector ladder (every k-means round, every IVF
  * build/append/probe assignment, SemDeDup, prototype pruning, the
  * streaming index append): per input vector, ONE pass over a frozen
  * k×dim centroid matrix returns `struct(cell_id, ccos)` — no
  * crossJoin×k row materialization, no per-doc groupBy shuffle, no
  * struct-ordering argmax.
  *
  * Exact parity with the join path it replaced (`crossJoin(broadcast(
  * centroids)) → round(dot/(|v||c|), 6) → max_by(struct(ccos,
  * -cell_id))`), pinned in NearestCentroidSpec:
  *  - dot and norms fold element-by-element in ascending index order
  *    with each element cast to double BEFORE multiplying — the
  *    [[ArrayDot]] contract, so every IEEE rounding step matches;
  *  - centroid self-norms are precomputed at freeze time from the same
  *    fold (identical doubles to `sqrt(array_dot(c, c))`);
  *  - ccos = round(dot / (vn · cn), 6) with Spark's double `round`
  *    semantics (HALF_UP on the Double.toString decimal; NaN/Infinity
  *    pass through unrounded);
  *  - the argmax iterates centroids in ascending cell_id and updates
  *    on a STRICT `Double.compare > 0`, which reproduces
  *    `max_by(struct(ccos, -cell_id))` exactly — ties (including
  *    all-NaN cosines from a zero-norm vector) keep the LOWEST
  *    cell_id, and NaN ranks above every finite cosine, Spark's
  *    double ordering;
  *  - a vector whose length mismatches the centroids, or carrying a
  *    null element, scores `ccos = null` on the lowest cell (the join
  *    path's null-poisoned dot under the same tie rule); a NULL vector
  *    column is null (the caller coalesces the cell to the lowest id,
  *    reproducing the join row).
  *
  * ONE deliberate divergence: a zero norm (all-zero vector or
  * centroid) makes that cosine NULL — exactly the join path's
  * non-ANSI zero-divisor semantics (Spark's legacy divide returns
  * null, and max_by ranks a null cosine below every non-null one) —
  * where the join path under Spark 4's ANSI default THROWS
  * DIVIDE_BY_ZERO. One degenerate embedding must not kill a
  * corpus-scale clustering job (NearestCentroidSpec pins both faces).
  *
  * The centroid matrix rides FLATTENED (k×dim doubles) as one codegen
  * reference object next to the cell-id and self-norm vectors — k=4096
  * centroids add nothing to plan analysis, and the inner loop is a
  * multiply-add over contiguous doubles. */
case class NearestCentroid(child: Expression, cellIds: Array[Long],
    flat: Array[Double], cns: Array[Double]) extends UnaryExpression {

  require(cellIds.nonEmpty && flat.length % cellIds.length == 0 &&
    cns.length == cellIds.length,
    s"nearest_centroid needs a consistent matrix: k=${cellIds.length}, " +
      s"flat=${flat.length}, cns=${cns.length}")
  require((1 until cellIds.length).forall(i => cellIds(i - 1) < cellIds(i)),
    "nearest_centroid needs strictly ascending cell ids")

  override def dataType: DataType = StructType(Seq(
    StructField("cell_id", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if Seq(FloatType, DoubleType, IntegerType,
      LongType, ShortType, ByteType).contains(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs a numeric array, got ${other.sql}")
  }

  private def elemTag: Char =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 'F'
      case DoubleType => 'D'
      case IntegerType => 'I'
      case LongType => 'L'
      case ShortType => 'S'
      case ByteType => 'B'
      case other => throw new IllegalStateException(s"unchecked $other")
    }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.nearest(input.asInstanceOf[ArrayData], elemTag,
      cellIds, flat, cns)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncCellIds", cellIds, "long[]")
    val flatRef = ctx.addReferenceObj("ncFlat", flat, "double[]")
    val cnsRef = ctx.addReferenceObj("ncCns", cns, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroid.nearest(" +
        s"$c, '$elemTag', $idsRef, $flatRef, $cnsRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)

  override def prettyName: String = "graft_nearest_centroid"
}

object NearestCentroid {

  private def elem(a: ArrayData, tag: Char, i: Int): Double = tag match {
    case 'F' => a.getFloat(i).toDouble
    case 'D' => a.getDouble(i)
    case 'I' => a.getInt(i).toDouble
    case 'L' => a.getLong(i).toDouble
    case 'S' => a.getShort(i).toDouble
    case _   => a.getByte(i).toDouble
  }

  /** Spark's double `round(x, 6)`: HALF_UP on the Double.toString
    * decimal; NaN and ±Infinity pass through unrounded. */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One pass: self-norm fold, then per centroid (ascending cell_id) a
    * contiguous multiply-add fold and the strict-compare argmax. */
  def nearest(v: ArrayData, tag: Char, cellIds: Array[Long],
      flat: Array[Double], cns: Array[Double]): InternalRow = {
    val k = cellIds.length
    val dim = flat.length / k
    val n = v.numElements()
    // length mismatch or a null element poisons every dot (the join
    // path's null ccos) — lowest cell under the tie rule, null cosine
    if (n != dim)
      return new GenericInternalRow(Array[Any](cellIds(0), null))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        return new GenericInternalRow(Array[Any](cellIds(0), null))
      val e = elem(v, tag, i)
      s += e * e
      i += 1
    }
    val vn = math.sqrt(s)
    var best = 0
    // boxed: a zero divisor yields a NULL cosine (the join path's
    // non-ANSI divide), which ranks below every non-null cosine and
    // ties to the lowest cell — max_by(struct(ccos, -cell_id)) exactly
    var bestCos: java.lang.Double = null
    var c = 0
    while (c < k) {
      var d = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) {
        d += elem(v, tag, j) * flat(off + j)
        j += 1
      }
      val denom = vn * cns(c)
      val cos: java.lang.Double =
        if (denom == 0.0) null
        else java.lang.Double.valueOf(round6(d / denom))
      val better =
        if (c == 0) false // seeded below
        else if (cos == null) false
        else bestCos == null ||
          java.lang.Double.compare(cos.doubleValue(),
            bestCos.doubleValue()) > 0
      if (c == 0) bestCos = cos
      else if (better) { best = c; bestCos = cos }
      c += 1
    }
    new GenericInternalRow(Array[Any](cellIds(best), bestCos))
  }

  /** Column API: struct(cell_id, ccos) of the nearest centroid (null
    * array → null; callers coalesce to the lowest cell id to reproduce
    * the join path's null-vector row). */
  def nearest_centroid(vec: Column, cellIds: Array[Long],
      flat: Array[Double], cns: Array[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(vec), cellIds, flat, cns))
  }
}
