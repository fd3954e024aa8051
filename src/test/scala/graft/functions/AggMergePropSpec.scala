package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the bounded partial aggregates' MERGE paths:
  * Spark may split the input into any partitioning and combine buffers
  * in any tree shape, so correctness requires that reduce-then-merge
  * over EVERY split equals the global sort-take — not just the
  * single-buffer path the query gates happen to exercise. (Fixed-seed
  * ScalaCheck sampling — the scalatestplus bridge isn't available
  * offline.) */
class AggMergePropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] = {
    var seed = Seed(23L)
    (1 to n).flatMap { _ =>
      seed = seed.next
      try Some(g.pureApply(Gen.Parameters.default, seed, 100)) catch { case _: Throwable => None }
    }
  }

  // duplicate scores (ties) and duplicate ids on purpose; scores from a
  // tiny value set so ties are COMMON, not corner cases
  private val genRows: Gen[(Int, List[(Double, Long)], Int)] = for {
    k <- Gen.chooseNum(1, 8)
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      c <- Gen.oneOf(0.0, 0.25, 0.5, 0.5, 1.0, -1.0)
      id <- Gen.chooseNum(0L, 12L)
    } yield (c, id))
    cut <- Gen.chooseNum(0, n)
  } yield (k, rows, cut)

  test("topk_agg: reduce-over-splits + merge == global (cos DESC, id ASC) take-k") {
    samples(genRows).foreach { case (k, rows, cut) =>
      val agg = TopKAgg(k)
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val want = rows.sortBy { case (c, id) => (-c, id) }.take(k)
      assert(merged == want, s"k=$k rows=$rows cut=$cut")
      // three-way tree merge agrees too (merge associativity in practice)
      val third = rows.grouped(math.max(1, rows.size / 3)).toList
      val tree = third.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(tree == want, s"tree merge k=$k rows=$rows")
    }
  }

  test("mink_agg: reduce-over-splits + merge == global (h ASC, id ASC) take-k") {
    samples(genRows).foreach { case (k, rows, cut) =>
      val agg = MinKAgg(k)
      val longRows = rows.map { case (c, id) => ((c * 4).toLong, id) }
      val (l, r) = longRows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val want = longRows.sortBy(identity).take(k)
      assert(merged == want, s"k=$k rows=$longRows cut=$cut")
    }
  }
}
