package graft.queries

import graft.SparkSpecBase

class ProfilingSpec extends SparkSpecBase {

  test("documents profile: one row per column, counts reconcile with the table") {
    val rows = Profiling.queries("x_prof_documents")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text").sorted)
    val docs = graft.Engine.table(spark, sf, "documents")
    val n = docs.count()
    rows.foreach { r =>
      assert(r.getLong(1) == n, s"${r.getString(0)}: n ${r.getLong(1)} != $n")
      assert(r.getLong(2) == 0L, s"${r.getString(0)}: synthetic corpus has no nulls")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)
    }
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    // doc_id is the primary key: fully distinct, min 0, max n-1
    assert(byCol("doc_id").getLong(3) == n)
    assert(byCol("doc_id").getString(4) == "0")
    assert(byCol("doc_id").getString(5) == (n - 1).toString)
    // lang/source are low-cardinality dimensions
    assert(byCol("lang").getLong(3) < 20)
    assert(byCol("source").getLong(3) < 50)
    // text is near-unique (planted dups may collide)
    assert(byCol("text").getLong(3) > n / 2)
  }
}
