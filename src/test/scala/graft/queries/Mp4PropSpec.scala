package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the ISO BMFF writer/parser: for ANY asset id the
  * container [[Mp4.bytes]] writes must parse back to exactly the closed
  * forms the DuckDB oracles encode — the same write→read contract the
  * x_mm_features / x_mm_frames gates exercise at fixed ids, here sampled
  * across the id space (including ids far beyond the gate corpus, where a
  * modulus or fixed-point bug would first appear).
  * (ScalaCheck generators sampled with a fixed seed — the scalatestplus
  * bridge isn't available offline.) */
class Mp4PropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] = {
    var seed = Seed(7L)
    (1 to n).flatMap { _ =>
      seed = seed.next
      try Some(g.pureApply(Gen.Parameters.default, seed, 100)) catch { case _: Throwable => None }
    }
  }

  private val genId: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, 500L),              // the gate corpus range
    Gen.chooseNum(0L, 1000000000L),       // large ids: fixed-point/modulus edges
    Gen.oneOf(0L, 1L, 27L, 28L, 319L, 320L, 239L, 240L, 63L, 64L))

  test("write → parse recovers the closed forms for any asset id") {
    samples(genId).distinct.foreach { id =>
      val m = Mp4.parse(Mp4.bytes(id))
      val (w, h) = Mp4.dims(id)
      val n = Mp4.frames(id)
      assert(m.width == w.toLong && m.height == h.toLong, s"id=$id dims")
      assert(m.nSamples == n.toLong, s"id=$id frames")
      assert(m.sampleBytes == (0 until n).map(Mp4.sampleSize(id, _).toLong).sum, s"id=$id bytes")
      assert(m.durationMs == n.toLong * Mp4.SampleDelta, s"id=$id duration")
    }
  }

  test("the container tiles exactly: box sizes sum to the file length") {
    samples(genId, 50).distinct.foreach { id =>
      val b = Mp4.bytes(id)
      def u32(at: Int): Long =
        ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
          ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
      var at = 0
      while (at < b.length) {
        val size = u32(at)
        assert(size >= 8 && at + size <= b.length, s"id=$id malformed box at $at")
        at += size.toInt
      }
      assert(at == b.length, s"id=$id boxes do not tile the file")
    }
  }

  test("parser rejects truncated and non-MP4 input instead of mis-reading") {
    val good = Mp4.bytes(5L)
    intercept[Exception](Mp4.parse(good.take(good.length - 3)))
    intercept[Exception](Mp4.parse("not an mp4 at all".getBytes("US-ASCII")))
    intercept[Exception](Mp4.parse(Array[Byte]()))
  }

  test("sample-table entry counts are bounded by their boxes (no overread)") {
    def boxAt(b: Array[Byte], tpe: String): Int = {
      val t = tpe.getBytes("US-ASCII")
      (0 until b.length - 4).find(i => b.slice(i, i + 4).sameElements(t)).get
    }
    def putU32(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
      b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
    }
    // stsz lying about its sample count must fail fast, not read sibling
    // boxes' bytes as sizes (box layout: [size][type][ver+flags][fixed][n])
    val lieStsz = Mp4.bytes(7L)
    putU32(lieStsz, boxAt(lieStsz, "stsz") + 12, 10000)
    val e1 = intercept[IllegalArgumentException](Mp4.parse(lieStsz))
    assert(e1.getMessage.contains("stsz"))
    // stts entry count beyond its box likewise ([size][type][ver+flags][n])
    val lieStts = Mp4.bytes(7L)
    putU32(lieStts, boxAt(lieStts, "stts") + 8, 10000)
    val e2 = intercept[IllegalArgumentException](Mp4.parse(lieStts))
    assert(e2.getMessage.contains("stts"))
    // fixed-size path: u32 × u32 can exceed Long — must fail fast, not
    // publish a wrapped-negative byte total
    val lieFixed = Mp4.bytes(7L)
    putU32(lieFixed, boxAt(lieFixed, "stsz") + 8, 0xffffffff.toInt)  // fixedSize
    putU32(lieFixed, boxAt(lieFixed, "stsz") + 12, 0xffffffff.toInt) // nSamples
    val e3 = intercept[IllegalArgumentException](Mp4.parse(lieFixed))
    assert(e3.getMessage.contains("overflow"))
  }
}
