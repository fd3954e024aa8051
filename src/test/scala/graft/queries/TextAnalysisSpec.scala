package graft.queries

import graft.SparkSpecBase

/** The oracle gate hash-checks the exact text-analysis queries; this spec
  * pins the sketch-based scale path against its exact ground truth. */
class TextAnalysisSpec extends SparkSpecBase {

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
