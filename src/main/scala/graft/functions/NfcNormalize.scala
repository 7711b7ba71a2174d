package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * standard first step before any text hashing/dedup (the same visible
  * string can arrive composed or decomposed from different crawls;
  * without normalization, 'é' and 'e'+U+0301 hash apart and exact/
  * near-dup both miss). Spark has no built-in for this; a Scala UDF
  * would leave codegen — this stays inside the project's expression
  * family (java.text.Normalizer under the hood, one pass per row,
  * fast-path for strings Normalizer confirms are already NFC). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  import java.text.Normalizer

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    // isNormalized is a cheap scan; ASCII-dominant corpora skip the
    // allocating normalize call entirely
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def nfc(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      NfcNormalize(GraftColumnBridge.expression(text)))
  }
}
