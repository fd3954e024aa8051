package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the perceptual fingerprint cores — the contracts
  * the dedup gates exercise at 40 fixed twins, here pinned across the
  * sampled id space and (for audio) over arbitrary generated signals:
  *
  *  - AUDIO, exact: the energy-profile bits compare window mean vs clip
  *    mean cross-multiplied, so a uniform clamp-free gain shift +c adds
  *    c·cnt_w to every window sum and c·n to the total —
  *    (sum+c·cnt)·n > (tot+c·n)·cnt ⟺ sum·n > tot·cnt — the
  *    fingerprint is ALGEBRAICALLY invariant, bit for bit.
  *  - IMAGE, bounded: pHash's quantized basis rows don't sum to exactly
  *    zero, so a +2 brightness nudge perturbs AC coefficients slightly
  *    and only bits whose coefficient sits within that perturbation of
  *    the median may flip — the hamming stays within the banding
  *    budget (≤ 6), which is precisely what keeps every twin reachable
  *    by the pair-of-blocks candidate generator.
  *
  * (ScalaCheck generators sampled with a fixed seed — the scalatestplus
  * bridge isn't available offline; same pattern as Mp4PropSpec.) */
class PerceptualPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] = {
    var seed = Seed(11L)
    (1 to n).flatMap { _ =>
      seed = seed.next
      try Some(g.pureApply(Gen.Parameters.default, seed, 100)) catch { case _: Throwable => None }
    }
  }

  test("audio fingerprint is bit-exactly invariant under any clamp-free uniform gain") {
    val genClip = for {
      n <- Gen.chooseNum(1, 400)
      c <- Gen.chooseNum(1, 60)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 255 - c))
    } yield (xs.map(_.toByte).toArray, c)
    val clips = samples(genClip)
    assert(clips.size > 150)
    clips.foreach { case (pcm, c) =>
      val shifted = pcm.map(b => ((b & 0xff) + c).toByte)
      assert(Multimodal.audioFpOfPcm(pcm) == Multimodal.audioFpOfPcm(shifted),
        s"gain +$c changed the fingerprint of a ${pcm.length}-sample clip")
    }
  }

  test("audio fingerprint discriminates: a time-reversed non-palindromic profile differs") {
    // sanity against a vacuously-constant hash: reversing a clip flips
    // its energy profile; for a clearly asymmetric ramp the bits differ
    val ramp = Array.tabulate(128)(i => i.toByte)
    assert(Multimodal.audioFpOfPcm(ramp) != Multimodal.audioFpOfPcm(ramp.reverse),
      "the fingerprint must depend on the energy profile's shape")
  }

  test("pHash of a +2 brightness re-encode stays within the banding budget across the id space") {
    val genId: Gen[Long] = Gen.oneOf(
      Gen.chooseNum(0L, 500L),            // the gate corpus range
      Gen.chooseNum(0L, 1000000000L),     // large ids: modulus edges
      Gen.oneOf(0L, 1L, 23L, 24L, 15L, 16L, 47L, 48L))
    val ids = samples(genId, 400).distinct
    assert(ids.size > 100)
    ids.foreach { id =>
      val base = Multimodal.phashOfPng(Multimodal.pngBytes(id))
      val twin = Multimodal.phashOfPng(Multimodal.pngBytesPerturbed(id))
      val hamming = java.lang.Long.bitCount(base ^ twin)
      assert(hamming <= 6,
        s"id $id: twin hamming $hamming exceeds the pair-of-blocks completeness budget")
      assert(base >= 0L && twin >= 0L, "63-bit signatures must stay non-negative")
    }
  }
}
