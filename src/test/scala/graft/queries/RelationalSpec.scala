package graft.queries

import graft.SparkSpecBase

/** Checks for the relational-surface queries the DuckDB oracle can't gate.
  * Today that is exactly one: `b_agg_approx`, whose HLL sketch is
  * engine-specific by design — so its estimate is anchored here against
  * the HASH-GATED exact twin `b_agg_distinct_having.n_part` (the same
  * column under the same grouping, verified by DuckDB every round), in
  * integer bound arithmetic.
  */
class RelationalSpec extends SparkSpecBase {

  test("b_agg_approx: HLL estimate within rsd bound of the hash-gated exact twin") {
    val rows = graft.SparkEntry.queries("b_agg_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the anchor: b_agg_distinct_having's n_part is count(DISTINCT
    // l_partkey) per l_returnflag — the exact value of the quantity the
    // sketch estimates, from the query the DuckDB oracle hash-gates
    val anchor = graft.SparkEntry.queries("b_agg_distinct_having")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (flag, approx, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(anchor.contains(flag), s"$flag: no hash-gated anchor row")
      val ext = anchor(flag)
      // the query's own exact column must agree with the gated twin
      // exactly — it is the same aggregate stated twice
      assert(exact == ext, s"$flag: n_exact $exact != gated n_part $ext")
      // approx_count_distinct's default rsd is 0.05 — the estimate must
      // land within 3σ of exact at gate cardinalities. Integer bound:
      // |approx − exact| · 100 ≤ exact · 15, no double rounding.
      assert(math.abs(approx - ext) * 100L <= ext * 15L,
        s"$flag: approx $approx vs exact $ext outside the 3·rsd bound")
    }
    // HLL++ is a deterministic sketch, not a sample: re-runs are identical
    val again = graft.SparkEntry.queries("b_agg_approx")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
