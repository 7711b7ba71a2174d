package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer — drop-in replacement for
  * `split(text, "\\s+")` (Spark's `StringSplit` with the default
  * limit −1), the corpus-wide tokenization convention
  * ([[graft.operators.TextAnalysis.tokens]]).
  *
  * Why: Spark's `split` evaluates per row as
  * `UTF8String.toString().split(regex, -1)` — a UTF-8 → String
  * transcode, a fresh `Pattern.compile("\\s+")` (Java's `String.split`
  * fast path only covers single-char literals), a `String` allocation
  * per token, and a String → UTF-8 re-encode per token. Java-regex
  * `\s` is exactly the ASCII class `[ \t\n\x0B\f\r]` (no
  * UNICODE_CHARACTER_CLASS flag), and those byte values occur in UTF-8
  * only as those ASCII characters — so splitting on maximal runs of
  * the six whitespace BYTES is exactly the same partition of the
  * string, with no transcode and no regex. Token values are
  * `UTF8String.fromBytes` views over one per-row byte array (fresh —
  * `getBytes` copies unless the string already owns an exact-length
  * array, which is itself fresh per row, e.g. `lower`'s output), so
  * the whole row costs one byte scan plus one array.
  *
  * Semantics parity (`WsSplitSpec` property-pins against `split`):
  * Java `split("\\s+", -1)` yields the segments BETWEEN maximal
  * whitespace runs, keeping leading/trailing empties — `""` → `[""]`,
  * `" a "` → `["", "a", ""]`, `"  "` → `["", ""]` — i.e. exactly
  * (number of runs + 1) segments. Null in → null out. */
case class WsSplit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_split needs a string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WsSplit.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsSplit.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WsSplit =
    copy(child = newChild)

  override def prettyName: String = "graft_ws_split"
}

object WsSplit {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // segments = maximal-whitespace-run count + 1 (leading/trailing
    // runs contribute empty segments, the limit −1 contract)
    var count = 1
    var i = 0
    var inWs = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (ws && !inWs) count += 1
      inWs = ws
      i += 1
    }
    val out = new Array[Any](count)
    var idx = 0
    var start = 0
    i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        var j = i + 1
        while (j < n && isWs(bytes(j))) j += 1
        out(idx) = UTF8String.fromBytes(bytes, start, i - start)
        idx += 1
        start = j
        i = j
      } else i += 1
    }
    out(idx) = UTF8String.fromBytes(bytes, start, n - start)
    new GenericArrayData(out)
  }

  /** Column API: `ws_split(text)` ≡ `split(text, "\\s+")`. */
  def ws_split(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WsSplit(GraftColumnBridge.expression(text)))
  }
}
