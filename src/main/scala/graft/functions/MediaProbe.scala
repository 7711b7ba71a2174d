package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format probe over an opaque `binary` media column: sniffs
  * PNG / JPEG / GIF / BMP / WAV from the real byte layout (magic +
  * header fields) and returns typed metadata WITHOUT decoding pixel or
  * sample data — the metadata-extraction step of a multimodal curation
  * pipeline (filter by resolution/duration/channel count before paying
  * for a full decode). Pure JVM byte arithmetic, no codec libraries;
  * full pixel decode stays behind [[graft.operators.Multimodal]]'s
  * documented codec stub.
  *
  * Output struct: `format` (string, 'unknown' when unrecognized or
  * truncated), `width`/`height`/`channels` (images; null for audio),
  * `sample_rate`/`bit_depth`/`duration_ms` (audio; null for images).
  * Stays inside whole-stage codegen — the generated code calls the
  * static parser, like the other native expressions in this package. */
case class MediaProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaProbe.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaProbe.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaProbe.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaProbe =
    copy(child = newChild)

  override def prettyName: String = "graft_media_probe"
}

object MediaProbe {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bit_depth", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16).toLong |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL

  private def row(format: String, width: java.lang.Integer = null,
      height: java.lang.Integer = null, channels: java.lang.Integer = null,
      sampleRate: java.lang.Integer = null, bitDepth: java.lang.Integer = null,
      durationMs: java.lang.Long = null): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(format),
      width, height, channels, sampleRate, bitDepth, durationMs))

  private val Unknown = row("unknown")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return Unknown
    if (u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
        u8(b, 7) == 0x0a) png(b)
    else if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) jpeg(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') gif(b)
    else if (b(0) == 'B' && b(1) == 'M') bmp(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') wav(b)
    else Unknown
  }

  /** IHDR is mandated to be the first chunk: width/height at fixed
    * offsets 16/20, color type at 25 → channel count. */
  private def png(b: Array[Byte]): InternalRow = {
    if (b.length < 26 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' ||
        b(15) != 'R') return Unknown
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0) return Unknown
    val channels = u8(b, 25) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return Unknown
    }
    row("png", w, h, channels)
  }

  /** Walk the marker segments to the first SOFn (baseline/progressive
    * frame header): height/width/components live there. Fill bytes
    * (0xFF padding) and standalone markers are skipped per the spec. */
  private def jpeg(b: Array[Byte]): InternalRow = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return Unknown // desynced — corrupt stream
      var marker = u8(b, i + 1)
      var j = i + 1
      while (marker == 0xff && j + 1 < b.length) { j += 1; marker = u8(b, j) }
      i = j + 1 // first byte after the marker id
      marker match {
        case m if m >= 0xd0 && m <= 0xd9 => // RST/SOI/EOI: no payload
          if (m == 0xd9) return row("jpeg") // EOI before any SOF
        case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 &&
            m != 0xcc =>
          if (i + 7 >= b.length) return row("jpeg")
          val h = be16(b, i + 3); val w = be16(b, i + 5)
          val comps = u8(b, i + 7)
          if (w <= 0 || h <= 0) return Unknown
          return row("jpeg", w, h, comps)
        case 0xda => return row("jpeg") // SOS without SOF — give up
        case _ =>
          if (i + 1 >= b.length) return row("jpeg")
          val len = be16(b, i)
          if (len < 2) return Unknown
          i += len
      }
    }
    row("jpeg")
  }

  /** Logical-screen descriptor right after the signature (LE). */
  private def gif(b: Array[Byte]): InternalRow = {
    if (b.length < 10) return Unknown
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) return Unknown
    row("gif", w, h, 1) // palette-indexed
  }

  /** BITMAPINFOHEADER (or later): signed LE dims at 18/22; a negative
    * height encodes top-down row order, |height| is the real size.
    * Channels from the bit-count field at 28: palette depths (≤8) are
    * one indexed channel, 16/24 are RGB, 32 is RGBA. */
  private def bmp(b: Array[Byte]): InternalRow = {
    if (b.length < 30) return Unknown
    val dib = le32(b, 14)
    if (dib < 40) return Unknown
    val w = le32(b, 18).toInt; val h = math.abs(le32(b, 22).toInt)
    if (w <= 0 || h <= 0) return Unknown
    val channels = le16(b, 28) match {
      case 1 | 4 | 8 => 1
      case 16 | 24 => 3
      case 32 => 4
      case _ => return Unknown
    }
    row("bmp", w, h, channels)
  }

  /** Chunk walk: `fmt ` carries channels/rate/bits, `data`'s declared
    * size over the byte rate is the duration. Chunks pad to even. The
    * cursor is a Long: declared chunk sizes are unsigned 32-bit, so an
    * int cursor wraps negative past 2 GiB and a crafted size could stall
    * the walk — a Long cursor just runs past the buffer and stops. */
  private def wav(b: Array[Byte]): InternalRow = {
    var channels = -1; var rate = -1; var bits = -1
    var byteRate = -1L; var dataSize = -1L
    var i = 12L
    while (i + 8 <= b.length) {
      val p = i.toInt
      val size = le32(b, p + 4)
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' &&
          b(p + 3) == ' ') {
        if (p + 8 + 16 > b.length || size < 16) return Unknown
        channels = le16(b, p + 10)
        rate = le32(b, p + 12).toInt
        byteRate = le32(b, p + 16)
        bits = le16(b, p + 22)
      } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' &&
          b(p + 3) == 'a') {
        dataSize = size
      }
      i += 8L + size + (size & 1L)
    }
    if (channels <= 0 || rate <= 0 || byteRate <= 0) return Unknown
    val dur: java.lang.Long =
      if (dataSize >= 0) dataSize * 1000L / byteRate else null
    row("wav", channels = channels, sampleRate = rate, bitDepth = bits,
      durationMs = dur)
  }

  /** Column face: `media_probe(bin)` → the metadata struct. */
  def media_probe(bin: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MediaProbe(GraftColumnBridge.expression(bin)))
  }
}
