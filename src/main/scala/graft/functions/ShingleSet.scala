package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The distinct word-n-shingle SET of a document as one sorted array, in
  * a single native pass — the doc-side half of exact Jaccard
  * verification. The composable route (explode shingles → distinct)
  * materializes and shuffles one row per (doc, shingle); this emits one
  * array row per document, map-only.
  *
  * Tokenization/shingling parity with [[graft.operators.Dedup.shingles]]
  * (same `\s+` split with limit −1, same `max(tokens−n+1, 1)` window) is
  * proven in `ShingleSetSpec`. The array is sorted by UTF8String binary
  * order — the SAME total order [[SortedIntersectCount]] merges by, which
  * is all the intersection count needs. */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSet.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_set"
}

object ShingleSet {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = Whitespace.split(text.toString, -1)
    val nShingles = math.max(toks.length - (n - 1), 1)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < nShingles) {
      val sb = new java.lang.StringBuilder()
      var t = i
      val end = math.min(i + n, toks.length)
      while (t < end) {
        if (t > i) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      set.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    // TreeSet iterates in UTF8String.compareTo order (binary) — sorted
    new GenericArrayData(set.toArray(new Array[AnyRef](set.size)))
  }

  def shingle_set(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      ShingleSet(GraftColumnBridge.expression(text), n))
  }
}

/** |A ∩ B| of two arrays PRE-SORTED under UTF8String binary order with
  * distinct elements (i.e. [[ShingleSet]] outputs): one merge pass, no
  * allocation — the pair-side half of exact Jaccard. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs two string arrays, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCount.count(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}

object SortedIntersectCount {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  def sorted_intersect_count(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
