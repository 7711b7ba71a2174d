package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Multimodal

/** Real container-header parsing against byte-exact synthesized files:
  * the probe must read the same offsets a real decoder would. */
class MediaProbeSpec extends SparkSuite {
  import spark.implicits._

  // --- byte-exact synthetic files --------------------------------------

  private def pngBytes(w: Int, h: Int, colorType: Int = 6): Array[Byte] = {
    val bb = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    bb.put(8.toByte).put(colorType.toByte)
    bb.put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putInt(0xdeadbeef) // CRC — not validated by a prober
    bb.array()
  }

  private def jpegBytes(w: Int, h: Int, comps: Int = 3): Array[Byte] = {
    val app0 = Array(0xff, 0xe0, 0x00, 0x10) ++ "JFIF".getBytes.map(_.toInt) ++
      Array.fill(10)(0)
    val sof0 = Array(0xff, 0xc0, 0x00, 8 + comps * 3, 8,
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, comps) ++
      Array.fill(comps * 3)(0)
    (Array(0xff, 0xd8) ++ app0 ++ sof0 ++ Array(0xff, 0xd9))
      .map(_.toByte)
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes)
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h) // h may be negative (top-down)
    bb.putShort(1).putShort(24)
    bb.array()
  }

  private def wavBytes(channels: Int, rate: Int, bits: Int,
      dataSize: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val byteRate = rate * blockAlign
    val bb = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
    bb.putShort(1).putShort(channels.toShort).putInt(rate).putInt(byteRate)
    bb.putShort(blockAlign.toShort).putShort(bits.toShort)
    bb.put("data".getBytes).putInt(dataSize)
    bb.array() // headers only — the prober reads declared sizes
  }

  private def probe(b: Array[Byte]): Row = {
    val internal = MediaProbe.compute(b)
    if (internal == null) null
    else Row(internal.getUTF8String(0).toString,
      if (internal.isNullAt(1)) null else internal.getInt(1),
      if (internal.isNullAt(2)) null else internal.getInt(2),
      if (internal.isNullAt(3)) null else internal.getInt(3),
      if (internal.isNullAt(4)) null else internal.getInt(4),
      if (internal.isNullAt(5)) null else internal.getInt(5),
      if (internal.isNullAt(6)) null else internal.getLong(6))
  }

  test("png: IHDR dims + color-type channel mapping") {
    assert(probe(pngBytes(640, 480)) === Row("png", 640, 480, 4, null, null, null))
    assert(probe(pngBytes(1, 1, colorType = 0)) ===
      Row("png", 1, 1, 1, null, null, null))
    assert(probe(pngBytes(320, 200, colorType = 2)) ===
      Row("png", 320, 200, 3, null, null, null))
  }

  test("jpeg: SOF0 after APP0 segments; EOI-before-SOF keeps format only") {
    assert(probe(jpegBytes(1920, 1080)) ===
      Row("jpeg", 1920, 1080, 3, null, null, null))
    assert(probe(jpegBytes(8, 8, comps = 1)) ===
      Row("jpeg", 8, 8, 1, null, null, null))
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte) ++
      Array.fill(10)(0.toByte)
    assert(probe(noSof) === Row("jpeg", null, null, null, null, null, null))
  }

  test("gif + bmp dims; negative BMP height (top-down) is |height|") {
    assert(probe(gifBytes(13, 37)) === Row("gif", 13, 37, 1, null, null, null))
    assert(probe(bmpBytes(800, 600)) === Row("bmp", 800, 600, 3, null, null, null))
    assert(probe(bmpBytes(800, -600)) === Row("bmp", 800, 600, 3, null, null, null))
  }

  test("bmp channels follow the bit-count field") {
    def withBits(bits: Int): Array[Byte] = {
      val b = bmpBytes(64, 64)
      b(28) = (bits & 0xff).toByte; b(29) = ((bits >> 8) & 0xff).toByte
      b
    }
    assert(probe(withBits(8)) === Row("bmp", 64, 64, 1, null, null, null))
    assert(probe(withBits(32)) === Row("bmp", 64, 64, 4, null, null, null))
    assert(probe(withBits(17)) === Row("unknown", null, null, null, null, null, null))
  }

  test("wav chunk walk survives an unsigned-overflow declared size") {
    // declared chunk size 0xFFFFFFF0 (> Int.MaxValue): an int cursor
    // would wrap negative and stall the walk; the Long cursor must just
    // run past the buffer and terminate with the fields seen so far
    val bb = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
    bb.putShort(1).putShort(2).putInt(16000).putInt(64000)
    bb.putShort(4.toShort).putShort(16.toShort)
    bb.put("junk".getBytes).putInt(0xfffffff0) // oversized chunk, walked
    assert(probe(bb.array()) === Row("wav", null, null, 2, 16000, 16, null))
    // same oversized size directly on the data chunk: format survives,
    // duration reflects the (bogus) declared size — never a hang
    val b2 = wavBytes(1, 8000, 8, 4000)
    b2(b2.length - 4) = 0xf0.toByte; b2(b2.length - 3) = 0xff.toByte
    b2(b2.length - 2) = 0xff.toByte; b2(b2.length - 1) = 0xff.toByte
    val r = probe(b2)
    assert(r.getString(0) == "wav" && r.getInt(4) == 8000)
  }

  test("wav: fmt chunk fields + duration from declared data size") {
    // 16 kHz stereo 16-bit, 64000 data bytes / (16000*4) B/s = 1000 ms
    assert(probe(wavBytes(2, 16000, 16, 64000)) ===
      Row("wav", null, null, 2, 16000, 16, 1000L))
    assert(probe(wavBytes(1, 8000, 8, 4000)) ===
      Row("wav", null, null, 1, 8000, 8, 500L))
  }

  test("garbage, truncations, and bad magic are 'unknown', never a throw") {
    val cases = Seq(
      Array[Byte](),
      "hello world, not a media file".getBytes,
      pngBytes(640, 480).take(20),       // truncated before dims
      wavBytes(2, 16000, 16, 64).take(16), // truncated before fmt body
      pngBytes(0, 480),                  // nonsense dims
      Array.fill(64)(0xff.toByte))
    cases.foreach { b =>
      assert(probe(b).getString(0) === "unknown", b.mkString(","))
    }
  }

  test("probeMeta: whole-stage codegen path over a DataFrame, plus the " +
      "SQL-registered form") {
    val df = Seq(
      (1L, pngBytes(640, 480)),
      (2L, wavBytes(2, 16000, 16, 64000)),
      (3L, "not media".getBytes)).toDF("id", "payload")
    val got = Multimodal.probeMeta(df, "id", "payload")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "png"), (2L, "wav"), (3L, "unknown")))

    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("media_probe_in")
    val sql = spark.sql(
      "SELECT id, graft_media_probe(payload).format AS f " +
        "FROM media_probe_in ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(sql === got)

    // the probe must not break whole-stage codegen: range() forces a
    // real executed plan (a local Seq folds away), and the "*(n)"
    // prefix marks operators inside a WholeStageCodegen stage
    val synth = spark.range(4).select(col("id"),
      lit(pngBytes(32, 32)).as("payload"))
    val plan = Multimodal.probeMeta(synth, "id", "payload")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
