package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native per-document hashed-TF-IDF featurization — the STAGE kernel
  * of [[graft.operators.LogReg.fitText]]: one pass over a token array
  * yields the document's active slots as `array<struct<slot: long,
  * weight: double>>`, ascending by slot, with
  * weight = round(tf·idf, 6) — exactly the rows
  * [[graft.operators.Vectorize.tfidfSparse]] produces for this
  * document through explode → groupBy(doc, slot) → idf join, minus the
  * explode, the corpus shuffle and the join.
  *
  * Contract parity with the relational path (LogRegSpec pins the
  * trained trajectory bit-equal):
  *  - slot(token) = first 4 md5 hex nibbles mod dim (the
  *    [[HashedTfidfMargin]]/Vectorize.termSlot cross-engine hash);
  *  - tf pools per slot BEFORE weighting (true feature hashing);
  *  - round is Spark's double `round` (HALF_UP on Double.toString);
  *  - slots whose idf is NaN (no corpus df — the inner-join drop) are
  *    omitted, exactly like the relational join;
  *  - empty token array → empty array; null elements skipped (explode
  *    emits no row for them... a null element yields no slot); a null
  *    ARRAY is null (callers decide the fallback).
  *
  * The idf vector rides as a codegen reference object. */
case class HashedTfidfSlots(child: Expression, idf: Array[Double])
    extends UnaryExpression {

  require(idf.nonEmpty, "hashed_tfidf_slots needs a non-empty idf vector")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("slot", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_tfidf_slots needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedTfidfSlots.slots(input.asInstanceOf[ArrayData], idf)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idfRef = ctx.addReferenceObj("tfidfIdf", idf, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedTfidfSlots.slots($c, $idfRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedTfidfSlots = copy(child = newChild)

  override def prettyName: String = "graft_hashed_tfidf_slots"
}

object HashedTfidfSlots {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def slotOf(token: UTF8String, dim: Int): Int = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(token.getBytes)
    (((digest(0) & 0xff) << 8) | (digest(1) & 0xff)) % dim
  }

  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One pass: slot histogram (open-addressed over the doc's distinct
    * slots), then the ascending-slot (slot, round6(tf·idf)) entries,
    * NaN-idf slots dropped. */
  def slots(tokens: ArrayData, idf: Array[Double]): ArrayData = {
    val dim = idf.length
    val n = tokens.numElements()
    var cap = 8
    while (cap < 2 * math.min(n, dim) + 2) cap <<= 1
    val keys = new Array[Int](cap)
    java.util.Arrays.fill(keys, -1)
    val tfs = new Array[Int](cap)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val slot = slotOf(tokens.getUTF8String(i), dim)
        var j = slot & (cap - 1)
        while (keys(j) != -1 && keys(j) != slot) j = (j + 1) & (cap - 1)
        keys(j) = slot
        tfs(j) += 1
      }
      i += 1
    }
    // gather live slots, ascending — the relational output order
    var live = 0
    var j = 0
    while (j < cap) {
      if (keys(j) != -1 && !java.lang.Double.isNaN(idf(keys(j)))) live += 1
      j += 1
    }
    val slotsArr = new Array[Int](live)
    var k = 0
    j = 0
    while (j < cap) {
      if (keys(j) != -1 && !java.lang.Double.isNaN(idf(keys(j)))) {
        slotsArr(k) = j; k += 1
      }
      j += 1
    }
    // sort (slot, tf) pairs by slot — the relational output order
    val pairs = slotsArr.map(j0 => (keys(j0), tfs(j0))).sortBy(_._1)
    val out = new Array[Any](pairs.length)
    var p = 0
    while (p < pairs.length) {
      val (slot, tf) = pairs(p)
      out(p) = new GenericInternalRow(Array[Any](slot.toLong,
        round6(tf * idf(slot))))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: the document's active (slot, weight) entries under the
    * frozen idf (null array → null). */
  def hashed_tfidf_slots(toks: Column, idf: Array[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HashedTfidfSlots(
      GraftColumnBridge.expression(toks), idf))
  }
}
