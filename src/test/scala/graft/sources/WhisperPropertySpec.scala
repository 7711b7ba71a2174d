package graft.sources

import java.nio.ByteBuffer

import org.scalacheck.{Gen, Prop, Properties}

/** Property: whisper bytes we encode decode back to exactly the archives
  * and stored points we put in (round-trip over the public pack layout). */
object WhisperPropertySpec extends Properties("whisper") {

  private case class Arch(precision: Int, slots: Seq[(Int, Double)])

  private val genArch: Gen[(Int, Int)] = for {
    precisionMult <- Gen.choose(1, 4)
    points <- Gen.choose(1, 6)
  } yield (precisionMult, points)

  private def encode(aggType: Int, xff: Float, archs: Seq[Arch]): Array[Byte] = {
    val headerLen = 16 + archs.length * 12
    val total = headerLen + archs.map(_.slots.length * 12).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(aggType)
    buf.putInt(archs.map(a => a.precision * a.slots.length).max)
    buf.putFloat(xff)
    buf.putInt(archs.length)
    var offset = headerLen
    archs.foreach { a =>
      buf.putInt(offset).putInt(a.precision).putInt(a.slots.length)
      offset += a.slots.length * 12
    }
    archs.foreach(_.slots.foreach { case (ts, v) =>
      buf.putInt(ts).putDouble(v)
    })
    buf.array()
  }

  property("encode→decode round-trips archives and non-empty slots") =
    Prop.forAll(Gen.choose(1, 5),
      Gen.nonEmptyListOf(genArch).map(_.take(4))) { (aggType, cfg) =>
      var precision = 0
      val archs = cfg.zipWithIndex.map { case ((mult, n), i) =>
        precision = if (i == 0) 60 * mult else precision * (mult + 1)
        val slots = (0 until n).map { s =>
          // slot 0 of every archive left empty (ts=0) to exercise skip
          if (s == 0) (0, 0.0)
          else (s * precision, s * 1.5 + i)
        }
        Arch(precision, slots)
      }
      val bytes = encode(aggType, 0.42f, archs)
      val info = WhisperImport.parseInfo(bytes)

      val decoded = WhisperImport.decodePoints(bytes)
      val expected = archs.zipWithIndex.flatMap { case (a, i) =>
        val stage = graft.model.Stage(a.slots.length.toLong,
          a.precision.toLong, stage0 = i == 0).toString
        a.slots.filter(_._1 != 0).map { case (ts, v) =>
          (stage, ts.toLong, v, 1.0)
        }
      }
      (info.archives.map(_.secondsPerPoint) == archs.map(_.precision)) &&
        (info.archives.map(_.points) == archs.map(_.slots.length)) &&
        math.abs(info.xFilesFactor - 0.42) < 1e-6 &&
        decoded == expected
    }
}
