package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native hashed-TF-IDF linear margin — the frozen-scoring kernel of
  * [[graft.operators.LogReg.scoreFrozen]] (the logreg twin of
  * [[TokenMapSum]], which freezes NB): one pass over a document's token
  * array computes the 6-decimal-scaled dot product of its hashed
  * TF-IDF vector against a frozen weight vector, with no explode, no
  * model join and no per-doc groupBy shuffle.
  *
  * Exact parity with the join path ([[graft.operators.Vectorize
  * .tfidfSparse]] → slot join → per-doc sum), pinned in LogRegSpec:
  *  - slot(token) = first 4 md5 hex nibbles base-16 mod dim — the same
  *    cross-engine hash [[graft.operators.Vectorize.termSlot]] /
  *    Sampling.digestInt compute column-side (first two digest bytes
  *    big-endian, mod dim);
  *  - per active slot, weight = round(tf·idf, 6) (HALF_UP on the
  *    Double.toString decimal — java.math.BigDecimal.valueOf, the same
  *    rounding Spark's `round` applies to doubles), contribution =
  *    floor(weight · w · 1e6 + 0.5) as long — [[graft.operators
  *    .LogReg]]'s scaled6 idiom, so the per-doc sum is an integer sum,
  *    order-free under any slot iteration;
  *  - slots with no corpus idf contribute nothing (the join path's
  *    inner idf join drops them) — a frozen model scores NEW streaming
  *    docs whose tokens hash outside the training corpus's df support;
  *  - empty token array → 0 (no tf rows → left-join null → coalesce 0
  *    upstream); null array → null (callers coalesce, same contract as
  *    [[TokenMapSum]]).
  *
  * Both frozen vectors ride as ONE codegen reference object (idf and w
  * interleaved per slot), never a literal tree — dim 65536 adds nothing
  * to plan analysis. The per-row tf histogram is a small open hash over
  * the doc's DISTINCT slots (docs are short relative to dim), and the
  * md5 per token is the identical work the join path's termSlot did —
  * minus the explode, shuffle and join that surrounded it. */
case class HashedTfidfMargin(child: Expression, idf: Array[Double],
    w: Array[Double]) extends UnaryExpression {

  require(idf.length == w.length && w.nonEmpty,
    s"hashed_tfidf_margin needs matching idf/w vectors, " +
      s"got ${idf.length}/${w.length}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_tfidf_margin needs array<string>, got ${other.sql}")
  }

  /** idf and w interleaved: [idf(0), w(0), idf(1), w(1), …] — one
    * reference object, one cache line per probed slot. */
  @transient private lazy val model: Array[Double] = {
    val m = new Array[Double](idf.length * 2)
    var i = 0
    while (i < idf.length) {
      m(2 * i) = idf(i); m(2 * i + 1) = w(i); i += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    HashedTfidfMargin.margin6(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("tfidfModel", model, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedTfidfMargin.margin6(" +
        s"$c, $modelRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedTfidfMargin = copy(child = newChild)

  override def prettyName: String = "graft_hashed_tfidf_margin"
}

object HashedTfidfMargin {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** slot(token): first two md5 digest bytes big-endian (= the first 4
    * hex nibbles parsed base-16 — Sampling.digestInt's contract) mod
    * dim. The value is in [0, 65535], so the pmod is a plain %. */
  private def slotOf(token: org.apache.spark.unsafe.types.UTF8String,
      dim: Int): Int = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(token.getBytes)
    (((digest(0) & 0xff) << 8) | (digest(1) & 0xff)) % dim
  }

  /** Σ over the doc's active slots of floor(round(tf·idf, 6)·w·1e6+0.5)
    * — an exact integer, bit-identical to the join path's per-doc sum.
    * `model` = idf/w interleaved; idf NaN marks a slot with no corpus
    * df (skipped, the inner-join semantics). */
  def margin6(tokens: ArrayData, model: Array[Double]): Long = {
    val dim = model.length / 2
    val n = tokens.numElements()
    // open-addressed (slot → tf) histogram over the doc's distinct
    // slots; capacity ≥ 2·min(n, dim) keeps the load factor ≤ 0.5
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
    var m = 0L
    var j = 0
    while (j < cap) {
      val slot = keys(j)
      if (slot != -1) {
        val idf = model(2 * slot)
        if (!java.lang.Double.isNaN(idf)) {
          val weight = java.math.BigDecimal.valueOf(tfs(j) * idf)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          m += math.floor(weight * model(2 * slot + 1) * 1e6 + 0.5).toLong
        }
      }
      j += 1
    }
    m
  }

  /** Column API: 6-decimal-scaled TF-IDF margin of `toks` against the
    * frozen (idf, w) vectors (null array → null). */
  def hashed_tfidf_margin(toks: Column, idf: Array[Double],
      w: Array[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HashedTfidfMargin(
      GraftColumnBridge.expression(toks), idf, w))
  }
}
