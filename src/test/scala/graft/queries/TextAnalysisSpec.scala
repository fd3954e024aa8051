package graft.queries

import graft.SparkSpecBase

/** The oracle gate hash-checks the exact text-analysis queries; this spec
  * pins the sketch-based scale path against its exact ground truth. */
class TextAnalysisSpec extends SparkSpecBase {

  test("vocabulary: tf >= df, descending tf, bounded size") {
    val rows = TextAnalysis.queries("x_text_vocab")(spark, sf).collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2)), "tf >= df per term")
    val tfs = rows.map(_.getLong(1)).toSeq
    assert(tfs == tfs.sorted.reverse, "ordered by tf descending")
  }

  test("cleaning funnel: monotone survivor counts") {
    val rows = TextAnalysis.queries("x_text_funnel")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq ==
      Seq("0_ingested", "1_quality", "2_language", "3_deduped"))
    val ns = rows.map(_._2).toSeq
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"not monotone: $ns")
    assert(ns.head > 0 && ns.last > 0)
  }

  test("approx_percentile sketch tracks the exact rank-arithmetic percentiles") {
    val exact = TextAnalysis.queries("x_text_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = TextAnalysis.queries("x_text_percentiles_approx")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((lang, (p50e, p90e)) <- exact) {
      val (p50a, p90a) = approx(lang)
      // accuracy=1000 on a few hundred rows per group: the sketch must
      // land within one token of the exact order statistic
      assert(math.abs(p50a - p50e) <= 1, s"$lang p50: approx $p50a vs exact $p50e")
      assert(math.abs(p90a - p90e) <= 1, s"$lang p90: approx $p90a vs exact $p90e")
    }
  }
}
