package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full per-document MinHash signature as ONE native expression:
  * tokenize → word n-shingles → ⌈k/4⌉ md5 digests per shingle → running
  * min of each 8-hex-char slice, all in a single pass over the document.
  *
  * The composable route (explode shingles → md5 columns → groupBy min)
  * is correct and partial-aggregated, but it materializes one row per
  * (document, shingle) and pays a full shuffle to regroup them — at
  * corpus scale the shuffle IS the cost (measured: the md5+explode
  * stage dominates d2/d4, not the min aggregate). This expression emits
  * one array per document with NO intermediate rows and no shuffle.
  *
  * Exact parity with the composable pipeline over
  * `lower(substring(text, 1, maxChars))` input, verified value-for-value
  * in `MinHashSigSpec`: same split regex (`\s+`, limit −1, trailing
  * empties kept), same shingle window (`max(tokens − n + 1, 1)`, short
  * docs yield one short shingle), same digest seeding
  * (`md5(seed ++ "_" ++ shingle)`), same lexicographic 8-char min.
  * Hashing matches the portable md5 derivation the cross-engine oracles
  * use (SparkEntry `SigCte`). */
case class MinHashSig(child: Expression, numHashes: Int, n: Int)
    extends UnaryExpression {
  require(numHashes > 0 && n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], numHashes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $numHashes, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = HexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** One pass over the document: k minhash values as 8-hex-char strings.
    * Mirrors split(text, "\\s+") [limit −1], slice/concat_ws shingling,
    * md5(seed_shingle) digest carving, and the StringType min. */
  def compute(text: UTF8String, k: Int, n: Int): ArrayData = {
    val toks = Whitespace.split(text.toString, -1)
    val nShingles = math.max(toks.length - (n - 1), 1)
    val digests = (k + 3) / 4
    val mins = new Array[String](k)
    val md = MessageDigest.getInstance("MD5")
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
      val shingle = sb.toString
      var s = 0
      while (s < digests) {
        md.reset()
        val hex = toHex(md.digest((s + "_" + shingle)
          .getBytes(StandardCharsets.UTF_8)))
        var j = 0
        while (j < 4 && s * 4 + j < k) {
          val h = s * 4 + j
          val sub = hex.substring(j * 8, j * 8 + 8)
          if (mins(h) == null || sub.compareTo(mins(h)) < 0) mins(h) = sub
          j += 1
        }
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): AnyRef))
  }

  /** Column API: `minhash_sig(loweredText, k, n)` → array of k 8-hex-char
    * minhash values. The caller applies `lower(substring(..))` so the
    * input normalization stays in (codegen'd) built-ins. */
  def minhash_sig(text: Column, numHashes: Int, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(text), numHashes, n))
  }
}
