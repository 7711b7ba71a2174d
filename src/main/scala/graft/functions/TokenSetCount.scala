package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native "how many tokens are in this word set" counter.
  *
  * The HOF route — `words.map(w => size(filter(toks, t => t === w)))
  * .reduce(_ + _)` — walks the token array once PER WORD with an
  * interpreted lambda per element: the stopword-marker features behind
  * the quality gate and the language-ID scores paid 16 such passes per
  * document, which profiling showed dominating the streaming-curation
  * gate (~0.5 s/1250 docs on one core). This expression is one
  * codegen'd pass over the token array with an O(1) hash probe per
  * token.
  *
  * Exact parity with the HOF sum, so swapping it in never changes an
  * oracle: `words` are distinct, so Σ_w count(t = w) = count(t ∈ set);
  * null token elements match nothing (`t === w` is null → filter
  * drops); a null token ARRAY is null (size(null) was null upstream of
  * every consumer); empty array → 0. */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty && words.distinct == words,
    s"token_set_count needs a non-empty distinct word list: $words")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_count needs array<string>, got ${other.sql}")
  }

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenSetCount.count(input.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetCount.count($c, $setRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetCount = copy(child = newChild)

  override def prettyName: String = "graft_token_set_count"
}

object TokenSetCount {

  /** One pass, one hash probe per non-null token. */
  def count(tokens: ArrayData,
      set: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Column API: count of `toks` elements contained in `words`. */
  def token_set_count(toks: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TokenSetCount(
      GraftColumnBridge.expression(toks), words))
  }
}
