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

  test("IVF2-PQ: ranked output, useful recall, probe agreement with the exact two-level twin") {
    val rows = ProductQuant.queries("x_sim_ivf2pq_md5")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    val truth = Similarity.queries("x_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    assert(recall >= 0.2, s"ivf2pq recall $recall too low")
    // the PQ stage changes scoring, not probing: high overlap with the
    // exact two-level twin that probes the same cells
    val twin = Similarity.queries("x_sim_ivf2_md5")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = (twin & approx).size.toDouble / twin.size
    assert(overlap >= 0.5, s"two-level probe agreement too low: $overlap")
    val again = ProductQuant.queries("x_sim_ivf2pq_md5")(spark, sf).collect()
    assert(again.toSeq == rows.toSeq)
  }

  test("persisted PQ index over the gate corpus matches the in-memory query") {
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("pqidx_codebook", "pqidx_cents", "pqidx_postings")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    ProductQuant.writePqIndex(spark, sf, "pqidx")
    val got = ProductQuant.ivfPqSearchAgainstIndex(spark, sf, "pqidx", 4, 20).collect().toSeq
    val mem = ProductQuant.queries("x_sim_ivfpq_md5")(spark, sf).collect().toSeq
    assert(got == mem, "indexed search must emit the in-memory verdicts")
  }

  test("persisted PQ index: indexed search == in-memory verdicts; append == frozen-fit union") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("pqapp_codebook", "pqapp_cents", "pqapp_postings")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    def postingsFiles(): Set[String] = {
      val dir = new java.io.File(warehouse, "pqapp_postings")
      dir.listFiles().filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    // freeze the fit over a strict subset; the increment is the remainder
    val base = java.nio.file.Files.createTempDirectory("graft-pqapp").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 400)
      .write.parquet(s"$base/embeddings.parquet")
    ProductQuant.writePqIndex(spark, base, "pqapp")
    val before = postingsFiles()
    val inc = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") >= 400)
      .select("vec_id", "embedding")
    assert(inc.count() > 0, "test needs a non-empty increment")
    ProductQuant.appendPqCodes(spark, "pqapp", inc)
    val after = postingsFiles()
    assert(before.subsetOf(after), s"append rewrote existing postings files: ${before -- after}")
    assert(after.size > before.size, "append must add posting files")
    // base+appended search == an index REBUILT over the union at the same
    // frozen fit (postings are per-vector functions of (vector, frozen
    // centroids/codebook), so batching cannot change them)
    for (t <- Seq("pqfull_codebook", "pqfull_cents", "pqfull_postings")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    spark.table("pqapp_codebook").write.format("parquet").saveAsTable("pqfull_codebook")
    spark.table("pqapp_cents").write.format("parquet").saveAsTable("pqfull_cents")
    ProductQuant.appendPqCodes(spark, "pqfull", // bootstrap append = rebuild
      spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding"))
    val got = ProductQuant.ivfPqSearchAgainstIndex(spark, sf, "pqapp", 4, 20).collect().toSeq
    val want = ProductQuant.ivfPqSearchAgainstIndex(spark, sf, "pqfull", 4, 20).collect().toSeq
    assert(got == want, "appended-index search must equal the frozen-fit union search")
    assert(got.nonEmpty && got.groupBy(_.getLong(0)).size == 10)
  }

  test("pq postings compaction: appended file groups collapse, search rows unchanged") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("pqcmp_codebook", "pqcmp_cents", "pqcmp_postings")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    // freeze the fit over a strict subset, two daily-crawl appends, then
    // the generic compaction — verdicts must not move
    val base = java.nio.file.Files.createTempDirectory("graft-pqcmp").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 300)
      .write.parquet(s"$base/embeddings.parquet")
    ProductQuant.writePqIndex(spark, base, "pqcmp")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    ProductQuant.appendPqCodes(spark, "pqcmp",
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 700))
    ProductQuant.appendPqCodes(spark, "pqcmp", emb.filter(col("vec_id") >= 700))
    def search() = ProductQuant.ivfPqSearchAgainstIndex(spark, sf, "pqcmp", 4, 20)
      .collect().toSeq
    val beforeRows = search()
    assert(beforeRows.nonEmpty)
    def files(t: String): Int =
      Option(new java.io.File(warehouse, t).listFiles()).map(
        _.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    def bucketSpec(t: String) = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t)).bucketSpec.get
    val (filesBefore, specBefore) = (files("pqcmp_postings"), bucketSpec("pqcmp_postings"))
    def audit() = graft.Engine.bucketFileAudit(spark, "pqcmp_postings", maxGroups = 1.5).head()
    // sparse-key case (see the ivf2 twin): the per-bucket MAX carries the
    // verdict where the mean under-counts
    assert(audit().getLong(3) >= 2,
      s"appends must stack >= 2 groups on some bucket (audit: ${audit()})")
    assert(audit().getBoolean(4), "audit must recommend compaction after two appends")
    graft.Engine.compactBucketedTable(spark, "pqcmp_postings")
    assert(!audit().getBoolean(4), "audit must clear after compaction")
    assert(bucketSpec("pqcmp_postings") == specBefore,
      "bucket+sort spec must survive compaction")
    assert(files("pqcmp_postings") < filesBefore,
      s"compaction must reduce the file count (was $filesBefore)")
    assert(files("pqcmp_postings") <= specBefore.numBuckets,
      "compacted postings are at most one file per bucket")
    assert(search() == beforeRows, "compaction changed search verdicts")
    for (t <- Seq("pqcmp_codebook", "pqcmp_cents", "pqcmp_postings"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("pq refit-from-postings: fit re-derives at union sizing, rows survive, search stays ranked") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("pqrf_codebook", "pqrf_cents", "pqrf_postings")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    // freeze over 400 vectors, fold a 500-copy hot spot, then re-center
    // the index on its own postings — the embeddings the postings carry
    // for exact re-rank are exactly what makes this possible
    val base = java.nio.file.Files.createTempDirectory("graft-pqrf").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 400)
      .write.parquet(s"$base/embeddings.parquet")
    ProductQuant.writePqIndex(spark, base, "pqrf")
    val v0 = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).toArray
    ProductQuant.appendPqCodes(spark, "pqrf",
      spark.range(500).select((col("id") + 1000000L).as("vec_id"),
        typedLit(v0).as("embedding")))
    def ids() = spark.table("pqrf_postings").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val before = ids()
    assert(before.size == 900)
    ProductQuant.refitPqIndexFromPostings(spark, "pqrf")
    assert(ids() == before, "refit must preserve the exact posting set")
    // cells re-derive at the UNION's sizing, not the frozen 400-vector one
    val kUnion = LshTuning.ivfCells(900)
    val kOld = LshTuning.ivfCells(400)
    assert(kUnion != kOld, "test needs distinguishable sizings")
    val nCents = spark.table("pqrf_cents").count()
    assert(nCents <= kUnion && nCents > kOld,
      s"cents must re-derive at union sizing (got $nCents, old $kOld, union $kUnion)")
    // every posting re-quantized to a full M-subspace code under the new
    // codebook, codes dense in [0, ks)
    val ksUnion = LshTuning.pqCentroids(900)
    val cd = spark.table("pqrf_postings")
      .select(size(col("cd")).as("m"), expr("array_max(cd)").as("mx")).agg(
        min("m"), max("m"), max("mx")).head()
    assert(cd.getInt(0) == ProductQuant.M && cd.getInt(1) == ProductQuant.M,
      s"every posting must carry exactly M codes: $cd")
    assert(cd.getLong(2) < ksUnion, s"codes must index the union codebook: $cd")
    // the refitted index still serves ranked deterministic output
    val rows = ProductQuant.ivfPqSearchAgainstIndex(spark, sf, "pqrf", 4, 20).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    val again = ProductQuant.ivfPqSearchAgainstIndex(spark, sf, "pqrf", 4, 20).collect()
    assert(again.toSeq == rows.toSeq, "refit search must stay deterministic")
    for (t <- Seq("pqrf_codebook", "pqrf_cents", "pqrf_postings"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("pq drift audit: exhaustive recall 1.0; hotspot appends flip the refit verdict") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("pqda_codebook", "pqda_cents", "pqda_postings")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    val base = java.nio.file.Files.createTempDirectory("graft-pqda").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 400)
      .write.parquet(s"$base/embeddings.parquet")
    ProductQuant.writePqIndex(spark, base, "pqda")
    val queries = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10).select("vec_id", "embedding")
    // probing every cell with a corpus-sized shortlist makes the ADC
    // search exhaustive + exactly re-ranked: sampled recall must be 1
    val full = ProductQuant.pqDriftAudit(spark, "pqda", queries,
      nprobe = 1024, shortlist = 100000).head()
    assert(full.getAs[Double]("mean_recall") == 1.0, s"exhaustive recall: $full")
    val imb0 = ProductQuant.pqDriftAudit(spark, "pqda", queries,
      minRecall = 0.0, maxImbalance = Double.MaxValue).head().getAs[Double]("imbalance")
    val bar = imb0 * 1.5
    def verdict() = ProductQuant.pqDriftAudit(spark, "pqda", queries,
      minRecall = 0.0, maxImbalance = bar).head().getAs[Boolean]("refit")
    assert(!verdict(), "healthy index must not demand a re-fit")
    val v0 = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).toArray
    ProductQuant.appendPqCodes(spark, "pqda",
      spark.range(500).select((col("id") + 1000000L).as("vec_id"),
        typedLit(v0).as("embedding")))
    assert(verdict(), "the hotspot fold must flip the refit verdict")
    for (t <- Seq("pqda_codebook", "pqda_cents", "pqda_postings"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("derived PQ sizing: gate corpus reproduces the oracle's ks=16, larger corpora refine") {
    assert(LshTuning.pqCentroids(500) == 16) // gate corpus — static oracle value
    assert(LshTuning.pqCentroids(2000) == 63) // sf0.1
    assert(LshTuning.pqCentroids(10) == 8) // min clamp
    assert(LshTuning.pqCentroids(1L << 40) == 256) // one-byte-code cap
    assert(ProductQuant.M * ProductQuant.SubDim == Similarity.EmbeddingDims)
  }
}
