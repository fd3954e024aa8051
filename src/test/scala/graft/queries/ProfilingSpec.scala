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

  test("embed outliers: per-dim median/MAD verdicts match a driver recompute") {
    val rows = Profiling.queries("x_prof_embed_outliers")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble))
    assert(rows.size == emb.length)
    val dims = emb.head._2.length
    def medianBy(vals: Seq[(Double, Long)]): Double = {
      val sorted = vals.sortBy(identity)
      sorted((sorted.length - 1) / 2)._1
    }
    val med = (0 until dims).map { p =>
      p -> medianBy(emb.map { case (id, v) => (v(p), id) }.toSeq) }.toMap
    val mad = (0 until dims).map { p =>
      p -> medianBy(emb.map { case (id, v) => (math.abs(v(p) - med(p)), id) }.toSeq) }.toMap
    for ((id, v) <- emb) {
      val n = (0 until dims).count(p => math.abs(v(p) - med(p)) > 5.0 * mad(p)).toLong
      assert(rows(id) == (n, n > 0), s"vec $id: ${rows(id)} vs ($n, ${n > 0})")
    }
    // non-vacuous both ways at gate scale
    assert(rows.values.map(_._2).toSet == Set(true, false))
  }
}
