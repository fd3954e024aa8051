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

  test("embeddings profile: dims contract, no NaN, norm mass matches a driver recompute") {
    val r = Profiling.queries("x_prof_embeddings")(spark, sf).collect()(0)
    val emb = graft.Engine.table(spark, sf, "embeddings").collect()
      .map(row => row.getSeq[Float](row.fieldIndex("embedding")).toArray)
    assert(r.getLong(0) == emb.length)
    assert(r.getLong(1) == 0L, "no null embeddings in the synthetic corpus")
    assert(r.getLong(2) == 1L && r.getLong(3) == 64L && r.getLong(4) == 64L,
      "dims contract: every vector is 64-wide")
    assert(r.getLong(5) == 0L, "no NaN components")
    // exact scaled-integer norm mass: recompute with the same fold
    val want = emb.map { v =>
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      math.floor(acc * 1e6).toLong
    }.sum / 1e6
    assert(math.abs(r.getDouble(6) - want) < 1e-9,
      s"norm mass ${r.getDouble(6)} != recompute $want")
  }
}
