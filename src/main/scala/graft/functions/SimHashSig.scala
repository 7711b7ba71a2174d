package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash fingerprint as ONE native pass per document: tokenize, one
  * md5 per token, per-bit ±1 votes from the digest's first `bits`
  * nibbles, fingerprint = the sign vector packed into a long.
  *
  * The composable route explodes (token × bits) rows and runs two
  * grouped aggregations; this emits the fingerprint with no intermediate
  * rows and no shuffle. Bit-for-bit parity with that pipeline (and its
  * cross-engine oracle): vote for bit b is the high bit of hex char b of
  * md5(token) — duplicate tokens vote once per occurrence, exactly like
  * the exploded form. `bits ≤ 32` (one md5 yields 32 hex chars).
  *
  * One edge difference, deliberate: a NULL document row is KEPT with a
  * null fingerprint (explode would drop it). `\s+`-split of any non-null
  * string yields ≥ 1 token, so non-null rows agree everywhere. */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 32, "bits must be in 1..32")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashSig.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashSig {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** One pass: per token one md5; vote(b) += ±1 by the high bit of hex
    * char b (= nibble b of the digest); fingerprint bit b set iff the
    * vote sum is positive, packed MSB-first like the composable
    * Σ 2^(bits−b) form. */
  def compute(text: UTF8String, bits: Int): Long = {
    val toks = Whitespace.split(text.toString, -1)
    val votes = new Array[Int](bits)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    while (t < toks.length) {
      md.reset()
      val digest = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
      var b = 0
      while (b < bits) {
        val nibble =
          if ((b & 1) == 0) (digest(b >> 1) >> 4) & 0xf
          else digest(b >> 1) & 0xf
        votes(b) += (if (nibble >= 8) 1 else -1)
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) fp += 1L << (bits - 1 - b)
      b += 1
    }
    fp
  }

  /** Column API: `simhash_sig(loweredText, bits)`. The caller applies
    * `lower(substring(..))` so normalization stays in built-ins. */
  def simhash_sig(text: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      SimHashSig(GraftColumnBridge.expression(text), bits))
  }
}
