package graft.queries

import graft.SparkSpecBase

class ProductQuantSpec extends SparkSpecBase {

  test("PQ codes: total coverage — every (vec_id, m) exactly once, codes dense in [0, ks)") {
    val rows = ProductQuant.queries("x_sim_pq_md5")(spark, sf).collect()
    val n = graft.Engine.table(spark, sf, "embeddings").count()
    assert(rows.length == n * ProductQuant.M,
      s"expected ${n * ProductQuant.M} (vec_id, m) code rows, got ${rows.length}")
    val ks = ProductQuant.pqK(spark, sf)
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < ks),
      "codes must index the densified codebook directly")
    // each subspace's code space is actually used (a degenerate fit that
    // collapsed to one centroid would still 'cover' but compress nothing)
    val perM = rows.groupBy(_.getLong(1)).map { case (m, rs) => m -> rs.map(_.getLong(2)).distinct.size }
    assert(perM.values.forall(_ >= 2), s"some subspace uses < 2 codes: $perM")
  }

  test("PQ codes: deterministic across re-fit (invalidation) and re-query") {
    val r1 = ProductQuant.queries("x_sim_pq_md5")(spark, sf).collect()
    assert(ProductQuant.memoizedCodebookCount(spark) >= 1)
    Similarity.invalidateIvfIndex(spark, sf) // the one ANN invalidation call covers PQ memos
    assert(ProductQuant.memoizedCodebookCount(spark) == 0,
      "invalidateIvfIndex must drop PQ codebook memos for the corpus dir")
    val r2 = ProductQuant.queries("x_sim_pq_md5")(spark, sf).collect()
    assert(r1.toSeq == r2.toSeq, "re-fit after invalidation must be bit-deterministic")
  }

  test("IVF-PQ: 5 exact-ranked neighbors per query, useful recall, deterministic") {
    val rows = ProductQuant.queries("x_sim_ivfpq_md5")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"not sorted: ${cos.toSeq}")
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
    val truth = Similarity.queries("x_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    // nprobe=4 of ~16 cells + an ADC shortlist of 20: the compressed
    // scorer must still surface a fair share of true neighbors
    assert(recall >= 0.2, s"ivfpq recall $recall too low")
    val again = ProductQuant.queries("x_sim_ivfpq_md5")(spark, sf).collect()
    assert(again.toSeq == rows.toSeq)
  }

  test("IVF-PQ candidates come from the probed cells of the exact-IVF twin") {
    // the PQ path changes SCORING, not probing: its emitted neighbors'
    // cells must be a subset of the cells the exact flat-IVF twin probes
    // (the direct containment check ADVICE r9 asked of the int8 paths)
    val ivf = Similarity.queries("x_sim_ivf_md5")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = ProductQuant.queries("x_sim_ivfpq_md5")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // both paths see identical candidate sets per query; PQ may RANK a
    // different top-5 out of them, but the shortlist=20 » 5 cut at the
    // ~30-vector probed-cell population keeps overlap high
    val overlap = (ivf & pq).size.toDouble / ivf.size
    assert(overlap >= 0.5, s"probed-cell agreement too low: $overlap")
  }

  test("ADC reconstruction: approximate cosine tracks the exact cosine") {
    // a planted sanity bound: mean |approx - exact| over the shortlist
    // survivors must be well under the cosine spread, else the codebook
    // carries no signal. Derived from the gate outputs: the top-5 exact
    // cosines the PQ path emits must correlate with ranks (already
    // descending) AND differ from the brute-force truth by rank at most
    // modestly — checked via recall above; here pin the codebook's
    // reconstruction error directly.
    import org.apache.spark.sql.functions._
    val cb = ProductQuant.codebook(spark, sf)
    val sub = ProductQuant.subVecs(Similarity.withNorm(spark, sf))
    val err = ProductQuant.assignSub(sub, cb)
      .join(cb, Seq("m", "cid", "code"))
      .select(expr("sqrt(aggregate(zip_with(sv, ce, (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))").as("d"),
        expr("sqrt(aggregate(sv, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))").as("nrm"))
      .agg(avg(col("d")).as("md"), avg(col("nrm")).as("mn"))
      .collect()(0)
    assert(err.getDouble(0) < err.getDouble(1),
      s"mean sub-vector quantization error ${err.getDouble(0)} not below mean sub-vector norm ${err.getDouble(1)}")
  }

  test("derived PQ sizing: gate corpus reproduces the oracle's ks=16, larger corpora refine") {
    assert(LshTuning.pqCentroids(500) == 16) // gate corpus — static oracle value
    assert(LshTuning.pqCentroids(2000) == 63) // sf0.1
    assert(LshTuning.pqCentroids(10) == 8) // min clamp
    assert(LshTuning.pqCentroids(1L << 40) == 256) // one-byte-code cap
    assert(ProductQuant.M * ProductQuant.SubDim == Similarity.EmbeddingDims)
  }
}
