package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the corpus-derived sizing: for ANY corpus size the
  * derived structures must keep their scale contracts — coarse tables
  * broadcastable, cell coverage complete, expected populations bounded —
  * not just at the handful of sizes the unit pins check. (ScalaCheck
  * generators sampled with a fixed seed — the scalatestplus bridge isn't
  * available offline.) */
class LshTuningPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] = {
    var seed = Seed(11L)
    (1 to n).flatMap { _ =>
      seed = seed.next
      try Some(g.pureApply(Gen.Parameters.default, seed, 100)) catch { case _: Throwable => None }
    }
  }

  private val genCorpus: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(1L, 10000L),                    // gate-to-bench sizes
    Gen.chooseNum(1L, 10_000_000_000L),           // production sizes
    Gen.oneOf(1L, 2L, 500L, 2000L, 65536L * 32L, // cap boundary and
      65536L * 32L + 1L, 10_000_000_000L))       //   its first overflow

  test("two-level sizing: coverage, broadcastability, and √-balance at any corpus size") {
    samples(genCorpus).foreach { corpus =>
      val total = math.max(1L, math.ceil(corpus.toDouble / 32).toLong)
      val (kc, kf) = LshTuning.ivfTwoLevel(corpus)
      assert(kc >= 1 && kf >= 1, s"corpus=$corpus: degenerate ($kc, $kf)")
      assert(kc <= 65536, s"corpus=$corpus: coarse table $kc not broadcast-sized")
      assert(kc.toLong * kf >= total,
        s"corpus=$corpus: $kc x $kf fails to cover $total cells")
      // no gross over-provisioning: one extra fine row per coarse cell at
      // most (the ceil slack), so expected cell population stays ~32
      assert(kc.toLong * kf <= total + kc,
        s"corpus=$corpus: $kc x $kf over-provisions $total cells")
      // √-balance below the cap keeps BOTH levels' fan-in sub-linear
      if (kc < 65536)
        assert(math.abs(kc - kf) <= kc + 1,
          s"corpus=$corpus: levels unbalanced ($kc vs $kf)")
    }
  }

  test("flat-cell count: bounded cell population up to the cap, then capped") {
    samples(genCorpus).foreach { corpus =>
      val k = LshTuning.ivfCells(corpus)
      assert(k >= 1 && k <= 65536, s"corpus=$corpus: k=$k out of range")
      if (k < 65536) // below the cap the expected cell stays ≈ targetCell
        assert(corpus.toDouble / k <= 33.0,
          s"corpus=$corpus: expected cell ${corpus.toDouble / k} drifted")
    }
  }

  test("sign planes and minhash bands stay within their S-curve clamps") {
    samples(genCorpus).foreach { corpus =>
      val p = LshTuning.signPlanes(corpus)
      assert(p >= 4 && p <= 16, s"corpus=$corpus: planes=$p")
      val r = LshTuning.minhashRowsPerBand(corpus)
      assert(r >= 4 && r <= 7, s"corpus=$corpus: rows=$r")
      val b = LshTuning.minhashBands(r)
      // S-curve threshold (1/b)^(1/r) pinned near the est_j >= 0.5 cut
      val thr = math.pow(1.0 / b, 1.0 / r)
      assert(thr > 0.5 && thr < 0.65, s"corpus=$corpus: threshold $thr drifted")
    }
  }
}
