package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a document's character (or whitespace-token)
  * distribution, in bits — the cheap gibberish/compressibility signal a
  * crawl pipeline uses before paying for an LM perplexity pass (very low
  * char entropy ⇒ repeated filler; very high ⇒ random bytes/base64).
  *
  * One native pass per row: histogram in a hash map, one −Σ p·log₂p
  * fold — no exploded (doc × char) relation, no shuffle, codegen'd like
  * the other graft expressions (the composable route would be two
  * grouped aggregations over ~doc×alphabet rows).
  *
  * Char mode counts UTF-16 code units (identical to code points on the
  * BMP; supplementary chars count as their surrogate pair). Token mode
  * splits on `\s+` like every other tokenizer in this library. Empty
  * input yields 0.0; NULL propagates. */
case class TextEntropy(child: Expression, token: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextEntropy.compute(input.asInstanceOf[UTF8String], token)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextEntropy.compute($c, $token)")

  override protected def withNewChildInternal(newChild: Expression): TextEntropy =
    copy(child = newChild)

  override def prettyName: String =
    if (token) "graft_token_entropy" else "graft_char_entropy"
}

object TextEntropy {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val Ln2 = math.log(2.0)

  def compute(text: UTF8String, token: Boolean): Double = {
    val s = text.toString
    val counts = new java.util.HashMap[AnyRef, Array[Int]]()
    var n = 0L
    if (token) {
      val toks = Whitespace.split(s, -1)
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) {
          val slot = counts.computeIfAbsent(toks(i), _ => new Array[Int](1))
          slot(0) += 1
          n += 1
        }
        i += 1
      }
    } else {
      var i = 0
      while (i < s.length) {
        val key = Character.valueOf(s.charAt(i))
        val slot = counts.computeIfAbsent(key, _ => new Array[Int](1))
        slot(0) += 1
        n += 1
        i += 1
      }
    }
    if (n == 0) return 0.0
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * (math.log(p) / Ln2)
    }
    h
  }

  def char_entropy(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      TextEntropy(GraftColumnBridge.expression(text), token = false))
  }

  def token_entropy(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      TextEntropy(GraftColumnBridge.expression(text), token = true))
  }
}
