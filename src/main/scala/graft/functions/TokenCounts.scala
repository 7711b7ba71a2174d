package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token/slot count kernels — the map-side-aggregation
  * principle (guide §2.3) taken to its limit: when an aggregation's
  * grouping key includes the document id, every row of a group lives in
  * the ONE source row the tokens came from, so the explode →
  * groupBy(doc, …) shuffle reunites rows that were never apart. These
  * kernels compute the per-doc aggregate inside the row and the plan
  * explodes the (already final) counts — no corpus-scale exchange, no
  * token-level hash-aggregate machinery (the measured r1 hot path:
  * `ByteArrayMethods.arrayEquals`/`findOrInsert` over exploded token
  * rows), same rows out.
  *
  * [[HashedTfidfSlots]] proved this shape for the logreg stage (r14);
  * these are its count-only siblings for Retrieval ([[TokenTf]]),
  * Vectorize ([[SlotTf]]) and DSIR ([[NgramSlotTf]]).
  *
  * Shared contracts:
  *  - output arrays are ASCENDING by key (UTF8String binary order /
  *    slot number) — deterministic, and exactly the orderless content
  *    the relational groupBy produced;
  *  - null array in → null out (nullIntolerant); null ELEMENTS are
  *    skipped (explode of a split() array never yields null, but the
  *    kernels stay total);
  *  - empty token array → empty output array (the groupBy emitted no
  *    rows for such docs).
  */
case class TokenTf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_tf needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenTf.counts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenTf.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenTf =
    copy(child = newChild)

  override def prettyName: String = "graft_token_tf"
}

object TokenTf {

  /** Sort-then-run-length: documents hold tens-to-hundreds of tokens,
    * where an O(n log n) sort on UTF8String binary order beats hash-map
    * allocation and gives the ascending output order for free. */
  def counts(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val toks = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) toks.add(tokens.getUTF8String(i))
      i += 1
    }
    val m = toks.size()
    if (m == 0) return new GenericArrayData(new Array[Any](0))
    val arr = toks.toArray(new Array[UTF8String](m))
    java.util.Arrays.sort(arr,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    // count distinct runs
    var distinct = 1
    i = 1
    while (i < m) {
      if (arr(i).compareTo(arr(i - 1)) != 0) distinct += 1
      i += 1
    }
    val out = new Array[Any](distinct)
    var idx = 0
    var runStart = 0
    i = 1
    while (i <= m) {
      if (i == m || arr(i).compareTo(arr(runStart)) != 0) {
        out(idx) = new GenericInternalRow(
          Array[Any](arr(runStart), (i - runStart).toLong))
        idx += 1
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: per-doc (term, tf) pairs, term-ascending —
    * `explode(token_tf(toks))` ≡ `explode(toks) → groupBy(doc, term)
    * count` for rows keyed by this doc. */
  def token_tf(toks: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TokenTf(GraftColumnBridge.expression(toks)))
  }
}

/** Per-doc hashed-slot counts: `slot(term) = first 4 md5 hex nibbles
  * mod dim` (the Vectorize.termSlot / Sampling.digestInt cross-engine
  * contract — [[HashedTfidfSlots]] uses the identical hash), counts
  * pooled per slot BEFORE any weighting, ascending by slot. */
case class SlotTf(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0 && dim <= 65536, s"dim must be in [1, 65536], got $dim")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("slot", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"slot_tf needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SlotTf.counts(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SlotTf.counts($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): SlotTf =
    copy(child = newChild)

  override def prettyName: String = "graft_slot_tf"
}

object SlotTf {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `slot(bytes) = ((md5[0] << 8) | md5[1]) % dim` — the md5-nibble
    * idiom over the token's UTF-8 bytes ([[HashedTfidfSlots]] parity). */
  private[functions] def slotOfBytes(bytes: Array[Byte], dim: Int): Int = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(bytes)
    (((digest(0) & 0xff) << 8) | (digest(1) & 0xff)) % dim
  }

  /** Open-addressed slot histogram (the [[HashedTfidfSlots.slots]]
    * table shape), gathered ascending. */
  def counts(tokens: ArrayData, dim: Int): ArrayData = {
    val n = tokens.numElements()
    var cap = 8
    while (cap < 2 * math.min(n, dim) + 2) cap <<= 1
    val keys = new Array[Int](cap)
    java.util.Arrays.fill(keys, -1)
    val cnts = new Array[Long](cap)
    var live = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val slot = slotOfBytes(tokens.getUTF8String(i).getBytes, dim)
        var j = slot & (cap - 1)
        while (keys(j) != -1 && keys(j) != slot) j = (j + 1) & (cap - 1)
        if (keys(j) == -1) { keys(j) = slot; live += 1 }
        cnts(j) += 1
      }
      i += 1
    }
    gather(keys, cnts, cap, live)
  }

  private[functions] def gather(keys: Array[Int], cnts: Array[Long],
      cap: Int, live: Int): ArrayData = {
    val slots = new Array[Int](live)
    val byIdx = new Array[Long](live)
    var k = 0
    var j = 0
    while (j < cap) {
      if (keys(j) != -1) { slots(k) = keys(j); byIdx(k) = cnts(j); k += 1 }
      j += 1
    }
    // insertion sort by slot — live is dim-bounded and usually small
    var a = 1
    while (a < live) {
      val ks = slots(a); val kc = byIdx(a)
      var b = a - 1
      while (b >= 0 && slots(b) > ks) {
        slots(b + 1) = slots(b); byIdx(b + 1) = byIdx(b); b -= 1
      }
      slots(b + 1) = ks; byIdx(b + 1) = kc
      a += 1
    }
    val out = new Array[Any](live)
    var p = 0
    while (p < live) {
      out(p) = new GenericInternalRow(Array[Any](slots(p).toLong, byIdx(p)))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: per-doc (slot, cnt) pairs, slot-ascending —
    * `explode(slot_tf(toks, dim))` ≡ the explode → termSlot →
    * groupBy(doc, slot) count relational path. */
  def slot_tf(toks: Column, dim: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SlotTf(GraftColumnBridge.expression(toks), dim))
  }
}

/** Per-doc DSIR feature-slot counts: every unigram AND every adjacent
  * bigram (`w1 ‖ ' ' ‖ w2` — the [[graft.operators.Dsir]] feature
  * string), md5-nibble-hashed into [0, dim), counts ascending by slot.
  * The bigram digest runs over the concatenated bytes directly — no
  * intermediate string is built. */
case class NgramSlotTf(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0 && dim <= 65536, s"dim must be in [1, 65536], got $dim")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("slot", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_slot_tf needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramSlotTf.counts(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramSlotTf.counts($c, $dim)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramSlotTf = copy(child = newChild)

  override def prettyName: String = "graft_ngram_slot_tf"
}

object NgramSlotTf {

  def counts(tokens: ArrayData, dim: Int): ArrayData = {
    val n = tokens.numElements()
    // unigrams + (n-1) bigrams; the relational path's zip_with slices
    // never emit null bigrams because split() arrays have no null
    // elements — null elements here only skip their own unigram and
    // adjacent bigrams, matching explode-over-concat semantics
    var cap = 8
    while (cap < 4 * math.min(math.max(2 * n - 1, 1), dim) + 2) cap <<= 1
    val keys = new Array[Int](cap)
    java.util.Arrays.fill(keys, -1)
    val cnts = new Array[Long](cap)
    var live = 0
    def bump(slot: Int): Unit = {
      var j = slot & (cap - 1)
      while (keys(j) != -1 && keys(j) != slot) j = (j + 1) & (cap - 1)
      if (keys(j) == -1) { keys(j) = slot; live += 1 }
      cnts(j) += 1
    }
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val cur = tokens.getUTF8String(i).getBytes
        bump(SlotTf.slotOfBytes(cur, dim))
        if (i + 1 < n && !tokens.isNullAt(i + 1)) {
          val nxt = tokens.getUTF8String(i + 1).getBytes
          val joined = new Array[Byte](cur.length + 1 + nxt.length)
          System.arraycopy(cur, 0, joined, 0, cur.length)
          joined(cur.length) = ' '
          System.arraycopy(nxt, 0, joined, cur.length + 1, nxt.length)
          bump(SlotTf.slotOfBytes(joined, dim))
        }
      }
      i += 1
    }
    SlotTf.gather(keys, cnts, cap, live)
  }

  /** Column API: per-doc DSIR (slot, cnt) pairs, slot-ascending. */
  def ngram_slot_tf(toks: Column, dim: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      NgramSlotTf(GraftColumnBridge.expression(toks), dim))
  }
}
