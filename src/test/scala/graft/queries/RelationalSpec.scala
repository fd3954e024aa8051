package graft.queries

import graft.SparkSpecBase

/** Checks for the relational-surface queries the DuckDB oracle can't gate.
  * Today that is exactly one: `b_agg_approx`, whose HLL sketch is
  * engine-specific by design — so its estimate is gated here against the
  * exact count it ships alongside.
  */
class RelationalSpec extends SparkSpecBase {

  test("b_agg_approx: HLL estimate within the documented error of exact") {
    val rows = graft.SparkEntry.queries("b_agg_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (flag, approx, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(exact > 0, s"$flag: exact distinct count missing")
      val rel = math.abs(approx - exact).toDouble / exact
      // approx_count_distinct's default rsd is 0.05 — the estimate must
      // land within 3σ of exact at gate cardinalities
      assert(rel <= 0.15, s"$flag: approx $approx vs exact $exact (rel error $rel)")
    }
    // HLL++ is a deterministic sketch, not a sample: re-runs are identical
    val again = graft.SparkEntry.queries("b_agg_approx")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
