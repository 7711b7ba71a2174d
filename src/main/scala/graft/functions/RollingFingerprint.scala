package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprint: the minimum 64-bit
  * polynomial hash over all `window`-byte substrings, in ONE O(n) pass per
  * document.
  *
  * The built-in route (explode n-grams → md5 → min) rehashes every window
  * from scratch — O(n·w) work plus an explode+groupBy shuffle. A native
  * expression slides the hash in O(1) per byte and emits one value per
  * row, no shuffle at all: the right shape for fingerprinting a 100 TB
  * corpus. Winnowing (Schleimer et al., SIGMOD 2003) selects min-hashes
  * exactly like this. */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "window must be positive")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.minRollingHash(
      input.asInstanceOf[UTF8String].getBytes, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprint.minRollingHash($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint"
}

object RollingFingerprint {
  private final val Base = 1000003L // polynomial base (coprime with 2^64)

  /** Minimum rolling hash over all `w`-byte windows; hash of the whole
    * (shorter) input when it has fewer than `w` bytes. One pass, O(1)
    * amortized per byte. */
  def minRollingHash(bytes: Array[Byte], w: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val win = math.min(w, n)
    // B^(win-1) for removing the outgoing byte (mod 2^64 via overflow)
    var pow = 1L
    var i = 1
    while (i < win) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < win) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    i = win
    while (i < n) {
      h = (h - (bytes(i - win) & 0xff) * pow) * Base + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def graft_fingerprint(c: Column, window: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      RollingFingerprint(GraftColumnBridge.expression(c), window))
  }
}
