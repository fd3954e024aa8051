package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up validation: derive m× corpora from the sf0.1
  * documents/embeddings tables (testdata itself is read-only) and
  * measure the heavy pipelines end-to-end at each scale, recording
  * runtime-vs-size growth exponents — the evidence behind the "sound
  * by design at 100×" plan-pin arguments. Expected: ~1.0 for scans,
  * banded joins and partial aggregates; up to ~n log n for
  * shuffle-sorts; a clearly superlinear exponent on any pipeline is a
  * found bug the plan pins missed.
  *
  * The derivation keeps the workload's STATISTICS, not its literal
  * rows:
  *
  *  - documents: copy k re-keys `doc_id += k·stride` and suffixes
  *    every token with the copy tag, so copies are NOT near-duplicates
  *    of the base (verbatim copies would plant n·C(m,2) duplicate
  *    pairs and the dedup pipelines would measure that planted
  *    artifact, not engine scaling); vocabulary and doc-length
  *    distributions grow the way a fresh crawl grows. `n_chars` is
  *    recomputed to keep the length-derived signals consistent.
  *  - embeddings: copy k re-keys `vec_id` and reflects each vector
  *    through a per-(copy, dim) deterministic ±1 mask — norms and
  *    intra-copy geometry are preserved, cross-copy directions
  *    decorrelate (fresh mass, no planted ANN hot spot).
  *
  * Every pipeline first runs ONCE against sf0.01 as an untimed warmup
  * (JIT + codegen + parquet footer caches dominate a fresh JVM's first
  * execution — a warmup against the measured dirs would instead
  * pre-build their memoized cluster labels and under-time them), then
  * one measurement per (pipeline, scale), scales ascending.
  * CONTAMINATION CAVEAT (measured, round 14): a pipeline that spills
  * tens of GB (dedup_rewrite at 256×) degrades the pipelines that run
  * after it in the same sweep — the shared JVM's heap and the page
  * cache carry the damage, and phash_index_build's tail read 1.17 in
  * the full sweep vs 0.99 re-measured alone. For a tail that matters,
  * re-run the pipeline in isolation via the pipelineFilter arg.
  * `x_cur_pipeline` reuses the cluster labels the dedup measurement
  * memoized, so the shard figure isolates mixture+pack+write (the same
  * composition at every scale — exponents stay comparable). Queries
  * are forced with the noop sink so no column is pruned away from the
  * measurement.
  *
  * Reported per pipeline: the least-squares exponent over all points
  * AND the tail exponent from the last scale pair — at small absolute
  * runtimes fixed per-job costs (scheduling, planning) flatten the
  * early points, so the tail pair is the asymptotic estimate the 100×
  * claim actually rests on.
  *
  * Usage: sbt "runMain graft.ScaleBench [baseDir] [workDir] [outJson]
  * [warmupDir] [pipelineFilter]" — pipelineFilter is a comma-separated
  * name list for targeted re-measurement (warmup narrows with it).
  */
object ScaleBench {

  private val Stride = 10000000L

  private def deriveDocuments(s: SparkSession, base: String, out: String, m: Int): Unit = {
    val docs = s.read.parquet(s"$base/documents.parquet")
    // chunked union + append: one 256-branch union would pay quadratic
    // analysis cost; 16-branch chunks keep each write's plan flat while
    // the on-disk result is identical
    var first = true
    (0 until m).grouped(16).foreach { ks =>
      val copies = ks.map { k =>
        if (k == 0) docs
        else docs.select(
          (col("doc_id") + lit(k * Stride)).as("doc_id"),
          expr(s"concat_ws(' ', transform(split(text, ' '), w -> concat(w, '_$k')))").as("text"),
          col("lang"), col("source"), lit(0L).as("n_chars"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .select("doc_id", "text", "lang", "source", "n_chars")
      }
      copies.reduce(_ unionByName _)
        .write.mode(if (first) "overwrite" else "append").parquet(s"$out/documents.parquet")
      first = false
    }
  }

  private def deriveEmbeddings(s: SparkSession, base: String, out: String, m: Int): Unit = {
    val emb = s.read.parquet(s"$base/embeddings.parquet")
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    // chunked like deriveDocuments: a 256-branch union pays quadratic
    // analysis cost; 16-branch chunks append to an identical result
    var first = true
    (0 until m).grouped(16).foreach { ks =>
      val copies = ks.map { k =>
        if (k == 0) emb
        else {
          // deterministic ±1 reflection mask for copy k (any fixed hash
          // works — no oracle reads this data)
          val mask = Array.tabulate(dims)(j =>
            if (((k.toLong * 2654435761L + j * 40503L) >>> 7) % 2 == 0) 1.0f else -1.0f)
          val maskSql = mask.mkString("array(", "F, ", "F)")
          emb.select(
            (col("vec_id") + lit(k * Stride)).as("vec_id"),
            expr(s"zip_with(embedding, $maskSql, (x, s) -> x * s)").as("embedding"),
            col("label"))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode(if (first) "overwrite" else "append").parquet(s"$out/embeddings.parquet")
      first = false
    }
  }

  private def deriveEvents(s: SparkSession, base: String, out: String, m: Int): Unit = {
    val ev = s.read.parquet(s"$base/events.parquet")
    var first = true
    (0 until m).grouped(16).foreach { ks =>
      val copies = ks.map { k =>
        if (k == 0) ev
        else ev.select(
          (col("event_id") + lit(k * Stride)).as("event_id"), col("ts"),
          // fresh user population per copy, same time range — how an event
          // stream actually grows (more concurrent users, not longer
          // history); per-user windows/joins then scale across keys
          (col("user_id") + lit(k * Stride)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      copies.reduce(_ unionByName _)
        .write.mode(if (first) "overwrite" else "append").parquet(s"$out/events.parquet")
      first = false
    }
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** One measured point: wall seconds plus the task-metric byte deltas
    * of the SAME run — the "shuffles carry signatures, never bodies"
    * claim made checkable: for the banded/dedup builds, shuffle bytes
    * must stay a small fraction of input bytes at every scale (the
    * shuffled rows are fixed-width keys/signatures while the input is
    * document/media mass), and spill must stay 0. */
  private final case class Point(m: Int, secs: Double,
    shuffleWrite: Long, shuffleRead: Long, input: Long, spill: Long)

  /** Cumulative task-metric counters, fed by a bus listener; deltas
    * around a run attribute bytes to that run (the bus drains via the
    * GraftListenerBus shim before every snapshot, so no tail event
    * leaks into the next pipeline's delta). */
  private final class MetricsListener extends org.apache.spark.scheduler.SparkListener {
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        input.addAndGet(m.inputMetrics.bytesRead)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        ()
      }
    }
    def snap(s: SparkSession): (Long, Long, Long, Long) = {
      org.apache.spark.GraftListenerBus.drain(s.sparkContext)
      (shuffleWrite.get, shuffleRead.get, input.get, spill.get)
    }
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Least-squares slope of ln(t) against ln(m) — the growth exponent. */
  private def exponent(points: Seq[(Int, Double)]): Double = {
    val xs = points.map(p => math.log(p._1.toDouble))
    val ys = points.map(p => math.log(p._2))
    val mx = xs.sum / xs.size
    val my = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    num / den
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val outJson = if (args.length > 2) args(2) else "SCALE_r12.json"
    // every family is measured through 256× (1.28M docs / 512k vectors
    // / 25.6M events) — the extra octave the 100× claim rests on
    val scales = Seq(1, 4, 16, 64, 256)
    // the deep ladder adds ONE more octave pair — a 1024× point that
    // either confirms the asymptote the 4×–256× points suggest or
    // exposes a bend they hid. Round 19 widened it from the two
    // near-linear text builds to every persisted-index BUILD family
    // (minhash/bm25/gram/ivf2) and the events family — the 1024× dir
    // now derives all three tables (5.1M docs / 2M vectors / 102M
    // events).
    val deepScales = scales :+ 1024
    // the sweep measures octave-grown corpora — the situation where a
    // real deployment passes a wider initial shuffle partitioning per
    // submit (see the Engine knob's scaladoc); without it the two
    // corpus-scale sorts land 4× coarser partitions and spill at the
    // deep octaves (measured: dedup_rewrite 17.9 GB at 1024× under the
    // gate default). Env still wins for targeted A/Bs.
    if (sys.env.get("SPARK_GRAFT_INIT_PARTITIONS").isEmpty &&
        !sys.props.contains("graft.initPartitions"))
      sys.props("graft.initPartitions") = "512"
    val spark = Engine.session()

    // targeted re-measurements can cap the ladder (deriving the 1024×
    // corpus costs more than a focused 64×/256× comparison needs);
    // unset = the full published ladder
    val allScales = sys.env.get("SPARK_GRAFT_SCALE_MAX").map(_.toInt) match {
      case Some(mx) => deepScales.filter(_ <= mx)
      case None => deepScales
    }
    val dirs: Map[Int, String] = allScales.map { m =>
      val dir = if (m == 1) base else s"$workDir/x$m"
      if (m > 1 && !new java.io.File(s"$dir/documents.parquet").exists())
        deriveDocuments(spark, base, dir, m)
      if (m > 1 && !new java.io.File(s"$dir/embeddings.parquet").exists())
        deriveEmbeddings(spark, base, dir, m)
      if (m > 1 && !new java.io.File(s"$dir/events.parquet").exists())
        deriveEvents(spark, base, dir, m)
      m -> dir
    }.toMap

    // the FIXED-SIZE image increment every probe uses: base-corpus ids
    // only (derived copies re-key at +k·10⁷), so the increment does not
    // grow with the scale factor — the probes measure index-size
    // sensitivity at constant increment, the ivf2_search shape
    def phashIncrement(s: SparkSession, d: String) =
      graft.queries.Multimodal.perturbedPngTwins(s, d, maxId = 120)

    // the FIXED 200-doc fold increment for minhash_append: base-corpus
    // texts under collision-free fresh ids (derived copies re-key at
    // +k·10⁷, far below the 10¹² offset); runTag separates the two
    // timed runs' id ranges
    var mhAppendRun = 0L
    var gmTakedownRun = 0L
    def mhIncrement(s: SparkSession, runTag: Long): DataFrame =
      s.read.parquet(s"$base/documents.parquet").filter(col("doc_id") < 200)
        .select((col("doc_id") + lit(1000000000000L) + lit(runTag * 1000000L)).as("doc_id"),
          col("text"))

    // the FIXED 50-query hybrid probe set: base-corpus doc prefixes as
    // the lexical terms joined to the matching base embeddings — query
    // mass constant across scales (the phashIncrement pattern), so the
    // hybrid_search exponent isolates index-size sensitivity
    def hybridQueries(s: SparkSession, qd: String): DataFrame =
      s.read.parquet(s"$qd/documents.parquet").filter(col("doc_id") < 50)
        .select(col("doc_id").as("qid"),
          expr("slice(split(text, ' '), 1, 3)").as("terms"))
        .join(s.read.parquet(s"$qd/embeddings.parquet").filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding")), Seq("qid"))

    val pipelines: Seq[(String, Seq[Int], (SparkSession, String, Int) => Unit)] = Seq(
      // between the two timed runs the memo is invalidated so both pay
      // the full multi-round build (the memoized labels then stay warm
      // for pack_shards below — same composition at every scale)
      ("dedup_clusters_full", scales, (s, d, _) => {
        graft.queries.Dedup.invalidateClusters(s, d)
        graft.queries.Dedup.clusterLabels(s, d).count()
        ()
      }),
      ("dedup_rewrite", deepScales, (s, d, _) =>
        noop(graft.queries.Dedup.queries("x_dedup_rewrite")(s, d))),
      ("bm25", scales, (s, d, _) =>
        noop(graft.queries.TextAnalysis.queries("x_text_bm25")(s, d))),
      // invalidate the fit memo so BOTH timed runs pay the Lloyd fit,
      // not just the first (same reasoning as the cluster memo)
      ("ivf2_build", deepScales, (s, d, m) => {
        graft.queries.Similarity.invalidateIvfIndex(s, d)
        graft.queries.Similarity.writeIvf2Index(s, d, s"scale_ivf2_x$m")
      }),
      ("ivf2_search", scales, (s, d, m) => {
        graft.queries.Similarity
          .ivf2SearchAgainstIndex(s, d, s"scale_ivf2_x$m", nprobeC = 2, nprobeF = 4)
          .collect()
        ()
      }),
      // index-backed kNN edge discovery (round 18): top-3 cosine edges
      // for a FIXED 200-node set against the m×-grown ivf2 index — the
      // phashIncrement pattern, so the exponent measures how the graph
      // family's edge-discovery cost tracks index size (near-flat is
      // the design claim: bucket-pruned postings scans, probe mass
      // independent of corpus)
      ("knn_edges_index", scales, (s, d, m) => {
        noop(graft.queries.Curation.knnEdgesFromIndex(
          s.read.parquet(s"$base/embeddings.parquet")
            .filter(col("vec_id") < 200).select("vec_id", "embedding"),
          s"scale_ivf2_x$m", nprobeC = 2, nprobeF = 4))
      }),
      // the round-12 serving family: the lexical index build scales
      // with the document corpus (a posting explode into three bucketed
      // writes); the hybrid probe runs a FIXED 50-query set against the
      // m×-grown bm25 + ivf2 indexes — like the phash probes it
      // measures how serving cost tracks index size (near-flat is the
      // design claim: term-bucket pruning ⊕ centroid-pruned postings,
      // fusion O(queries × 2k) regardless of corpus)
      ("bm25_index_build", deepScales, (s, d, m) =>
        graft.queries.TextAnalysis.writeBm25Index(s, d, s"scale_bm_x$m")),
      // the text-dedup serving index: build scales with the corpus (one
      // shingle+minhash pass into three bucketed writes); the append
      // folds a FIXED 200-doc crawl into the m×-grown index — keys/sigs
      // are increment-proportional, the counts merge is O(distinct
      // buckets) BY DESIGN (the price of an exact joint bound), so the
      // append exponent shows exactly that term's growth. Each timed
      // run re-keys its increment so min-of-two never appends the same
      // ids twice; the index gains 200 rows per run — noise at any m.
      ("minhash_index_build", deepScales, (s, d, m) =>
        graft.queries.Dedup.writeMinhashIndexBucketed(s, d, s"scale_mh_x$m")),
      ("minhash_append", scales, (s, d, m) => {
        mhAppendRun += 1
        graft.queries.Dedup.appendMinhashIndexBucketed(
          mhIncrement(s, mhAppendRun), s"scale_mh_x$m")
      }),
      ("hybrid_search", scales, (s, d, m) => {
        graft.queries.TextAnalysis.hybridSearchOf(
          hybridQueries(s, base), s"scale_bm_x$m", s"scale_ivf2_x$m").collect()
        ()
      }),
      ("pack_shards", scales, (s, d, m) => {
        graft.queries.Curation.writeShards(
          graft.queries.Curation.queries("x_cur_pipeline")(s, d),
          s"$workDir/shards_x$m")
        ()
      }),
      // the perceptual family (r11 verdict gap): index build scales
      // with the image corpus (encode + decode + DCT are map-side CPU;
      // the band-key write shuffles fixed-width keys); both probe
      // regimes run a FIXED increment against the m×-grown index, so
      // their exponents measure how probe cost tracks index size —
      // near-flat is the design claim (bucket-pruned scans)
      ("phash_index_build", deepScales, (s, d, m) =>
        graft.queries.Multimodal.writePhashIndex(s, d, s"scale_ph_x$m")),
      ("phash_ingest_probe", scales, (s, d, m) => {
        graft.queries.Multimodal.incrementalPhashDupsAgainstIndex(
          phashIncrement(s, d), s"scale_ph_x$m").collect()
        ()
      }),
      ("phash_bucketed_probe", scales, (s, d, m) => {
        graft.queries.Multimodal.incrementalPhashDupsAgainstBucketedIndex(
          phashIncrement(s, d), s"scale_ph_x$m").collect()
        ()
      }),
      // compaction is a full bucketed rewrite — LINEAR in index size BY
      // DESIGN (that is the amortization bargain: one O(index) rewrite
      // buys back per-append file accumulation); the measurement pins
      // that it is linear-not-worse, i.e. the staging write introduces
      // no extra shuffle on top of the bucket-aligned repartition
      ("phash_compaction", scales, (s, d, m) =>
        graft.Engine.compactBucketedTable(s, s"scale_ph_x${m}_keys")),
      // the events family: per-user windows (as-of, conversion,
      // sessions) and the bucketed non-equi range join — growth is
      // fresh users over the same time range, so these measure how the
      // user-partitioned shapes scale across keys
      ("events_asof", deepScales, (s, d, _) =>
        noop(graft.queries.Events.queries("x_events_asof")(s, d))),
      ("events_conversion", deepScales, (s, d, _) =>
        noop(graft.queries.Events.queries("x_events_conversion")(s, d))),
      ("events_sessions", deepScales, (s, d, _) =>
        noop(graft.queries.Events.queries("x_events_sessions")(s, d))),
      ("events_range_join", deepScales, (s, d, _) =>
        noop(graft.queries.Events.queries("x_events_range_join")(s, d))),
      // tokenizer SERVE throughput (the third family's scale claim):
      // greedy WordPiece serving of the m×-corpus against the dir's
      // FROZEN model. Min-of-two + the per-(session, dir) fit memo make
      // the KEPT run pure serving — run A pays the one-time fit, run B
      // reads the memo — the offline-train / online-serve split a
      // production tokenizer actually runs. Design claim: corpus-linear
      // (distinct words segment once, docs re-join key-equi).
      // both serve rows run the documents-only 1024× octave too: the
      // tokenizer serve is the one op a training-data pipeline runs
      // over the FULL corpus, so its corpus-linear claim gets the
      // extra-octave treatment the near-linear builds get
      ("tokenize_serve", deepScales, (s, d, _) =>
        noop(graft.queries.Wordpiece.tokenizeOf(
          s.read.parquet(s"$d/documents.parquet").select("doc_id", "text"),
          graft.queries.Wordpiece.wordpieceFit(s, d)))),
      // the BPE family's serve row (round 18 — completing the
      // three-family symmetry): same memo split as tokenize_serve /
      // unigram_serve — run A pays the (now memoized) fit, run B is
      // pure rank-heap expression serving
      ("bpe_serve", deepScales, (s, d, _) =>
        noop(graft.queries.TextAnalysis.tokenizeOf(
          s.read.parquet(s"$d/documents.parquet").select("doc_id", "text"),
          graft.queries.TextAnalysis.bpeFit(s, d, 3)))),
      // the unigram family's serve row (round 17): the LAST tokenizer
      // moved off the join-gather shape onto the native expression —
      // this row is the measurement the r16 verdict asked for (the
      // rejected shape class spilled 16-18 GB at 256×; the expression
      // must be corpus-linear, zero spill). Same memo split as
      // tokenize_serve: run A pays the EM fit, run B is pure serving.
      ("unigram_serve", deepScales, (s, d, _) =>
        noop(graft.queries.Unigram.tokenizeOf(
          s.read.parquet(s"$d/documents.parquet").select("doc_id", "text"),
          graft.queries.Unigram.unigramFit(s, d)))),
      // the EM FIT itself through the octaves (round 18 — the r17
      // verdict's missing row): the projection-substitution regression
      // class the r17 fix closed (DP columns re-evaluated per reference,
      // ~10⁸ ops/word, one task 20+ min at x64) would silently return in
      // a refactor of Unigram.emFit without a standing measurement.
      // emFit is unmemoized, so both timed runs pay the full 3-iteration
      // fit; above Unigram.localFitBytes (every octave ≥ 4) the
      // per-iteration driver localization branch — the shape that fixed
      // x64 — is what's measured; x1 (sf0.1, under the bound) measures
      // the lazy chain the gate queries run.
      ("unigram_fit", scales, (s, d, _) =>
        noop(graft.queries.Unigram.emFit(s, d))),
      // the counted gram index's lifecycle (round 17): build is
      // corpus-linear by design; takedown appends -1 deltas for a
      // FIXED ~200-doc tombstone set — the O(tombstoned docs) claim
      // says its cost stays FLAT as the index grows (the doc_id range
      // filter pushes into the parquet scan, so the corpus never
      // streams); compaction is the amortized O(index) rewrite, linear
      // by design (pinning linear-not-worse). Each timed run tombstones
      // a DIFFERENT slice so min-of-two never double-decrements a doc.
      ("gram_index_build", deepScales, (s, d, m) =>
        graft.queries.Dedup.writeGramIndexCounted(s, d, s"scale_gm_x$m")),
      ("gram_takedown", scales, (s, d, m) => {
        gmTakedownRun += 1
        val lo = 1000L + (gmTakedownRun % 2) * 1000L
        val docs = s.read.parquet(s"$d/documents.parquet")
          .filter(col("doc_id") >= lo && col("doc_id") < lo + 200)
          .select("doc_id", "text")
        graft.Takedown.add(s, s"scale_gm_x$m", docs.select(col("doc_id").as("id")))
        graft.queries.Dedup.reclaimGramIndexCounted(docs, s"scale_gm_x$m")
      }),
      ("gram_compaction", scales, (s, d, m) =>
        graft.queries.Dedup.compactGramIndexCounted(s, s"scale_gm_x$m"))
    )

    // optional 5th arg: comma-separated pipeline names for targeted
    // re-measurement (e.g. after a fix to one pipeline) — the warmup
    // narrows with it so a targeted run stays cheap
    val filterSet: Option[Set[String]] =
      if (args.length > 4) Some(args(4).split(",").toSet) else None
    def active(n: String): Boolean = filterSet.forall(_.contains(n))

    // untimed warmup against a DIFFERENT corpus dir (4th arg, default
    // sf0.01): exercises every code path (JIT, codegen caches,
    // ImageIO/parquet readers) without touching the measured dirs'
    // cluster-label memos. MUST differ from base — warming the measured
    // corpus itself would under-time the m=1 points and inflate every
    // exponent.
    {
      val warm = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
      require(new java.io.File(warm).getCanonicalPath !=
        new java.io.File(base).getCanonicalPath,
        s"warmup dir must differ from the measured base ($base)")
      if (active("dedup_clusters_full") || active("pack_shards")) {
        val wdf = graft.queries.Dedup.clusterLabels(spark, warm)
        wdf.count(); wdf.unpersist(blocking = true)
      }
      if (active("dedup_rewrite"))
        noop(graft.queries.Dedup.queries("x_dedup_rewrite")(spark, warm))
      if (active("bm25"))
        noop(graft.queries.TextAnalysis.queries("x_text_bm25")(spark, warm))
      if (active("ivf2_build") || active("ivf2_search") || active("hybrid_search") ||
          active("knn_edges_index")) {
        graft.queries.Similarity.writeIvf2Index(spark, warm, "scale_warm")
        graft.queries.Similarity
          .ivf2SearchAgainstIndex(spark, warm, "scale_warm", nprobeC = 2, nprobeF = 4)
          .collect()
        if (active("knn_edges_index"))
          noop(graft.queries.Curation.knnEdgesFromIndex(
            spark.read.parquet(s"$warm/embeddings.parquet")
              .filter(col("vec_id") < 200).select("vec_id", "embedding"),
            "scale_warm", nprobeC = 2, nprobeF = 4))
      }
      if (active("bm25_index_build") || active("hybrid_search"))
        graft.queries.TextAnalysis.writeBm25Index(spark, warm, "scale_bm_warm")
      if (active("minhash_index_build") || active("minhash_append")) {
        graft.queries.Dedup.writeMinhashIndexBucketed(spark, warm, "scale_mh_warm")
        graft.queries.Dedup.appendMinhashIndexBucketed(
          mhIncrement(spark, 999L), "scale_mh_warm")
      }
      if (active("hybrid_search"))
        graft.queries.TextAnalysis.hybridSearchOf(
          hybridQueries(spark, warm), "scale_bm_warm", "scale_warm").collect()
      if (active("pack_shards"))
        graft.queries.Curation.writeShards(
          graft.queries.Curation.queries("x_cur_pipeline")(spark, warm),
          s"$workDir/shards_warm")
      if (active("phash_index_build") || active("phash_ingest_probe") ||
          active("phash_bucketed_probe") || active("phash_compaction")) {
        graft.queries.Multimodal.writePhashIndex(spark, warm, "scale_ph_warm")
        graft.queries.Multimodal.incrementalPhashDupsAgainstIndex(
          phashIncrement(spark, warm), "scale_ph_warm").collect()
        graft.queries.Multimodal.incrementalPhashDupsAgainstBucketedIndex(
          phashIncrement(spark, warm), "scale_ph_warm").collect()
        if (active("phash_compaction"))
          graft.Engine.compactBucketedTable(spark, "scale_ph_warm_keys")
      }
      for (q <- Seq("x_events_asof", "x_events_conversion",
          "x_events_sessions", "x_events_range_join") if active(q.stripPrefix("x_")))
        noop(graft.queries.Events.queries(q)(spark, warm))
      if (active("tokenize_serve"))
        noop(graft.queries.Wordpiece.tokenizeOf(
          spark.read.parquet(s"$warm/documents.parquet").select("doc_id", "text"),
          graft.queries.Wordpiece.wordpieceFit(spark, warm)))
      if (active("unigram_serve"))
        noop(graft.queries.Unigram.tokenizeOf(
          spark.read.parquet(s"$warm/documents.parquet").select("doc_id", "text"),
          graft.queries.Unigram.unigramFit(spark, warm)))
      if (active("unigram_fit"))
        noop(graft.queries.Unigram.emFit(spark, warm))
      if (active("bpe_serve"))
        noop(graft.queries.TextAnalysis.tokenizeOf(
          spark.read.parquet(s"$warm/documents.parquet").select("doc_id", "text"),
          graft.queries.TextAnalysis.bpeFit(spark, warm, 3)))
      if (active("gram_index_build") || active("gram_takedown") ||
          active("gram_compaction")) {
        graft.queries.Dedup.writeGramIndexCounted(spark, warm, "scale_gm_warm")
        val wd = spark.read.parquet(s"$warm/documents.parquet")
          .filter(col("doc_id") < 50).select("doc_id", "text")
        graft.Takedown.add(spark, "scale_gm_warm", wd.select(col("doc_id").as("id")))
        graft.queries.Dedup.reclaimGramIndexCounted(wd, "scale_gm_warm")
        graft.queries.Dedup.compactGramIndexCounted(spark, "scale_gm_warm")
        spark.sql("DROP TABLE IF EXISTS scale_gm_warm_gramdf")
      }
      for (t <- Seq("_coarse", "_fine", "_postings"))
        spark.sql(s"DROP TABLE IF EXISTS scale_warm$t")
      for (t <- Seq("_sig", "_keys"))
        spark.sql(s"DROP TABLE IF EXISTS scale_ph_warm$t")
      for (t <- Seq("_tf", "_dl", "_stats"))
        spark.sql(s"DROP TABLE IF EXISTS scale_bm_warm$t")
      for (t <- Seq("_sig", "_keys", "_counts"))
        spark.sql(s"DROP TABLE IF EXISTS scale_mh_warm$t")
      for (t <- Seq("_merges", "_ids"))
        spark.sql("DROP TABLE IF EXISTS " +
          graft.queries.TextAnalysis.bpeModelTablePrefix(warm, 3) + t)
      println("SCALE warmup complete (sf0.01)")
    }

    // Untimed dependency prep (round-19 ADVICE): a TARGETED run
    // (pipelineFilter) can activate a probe/append/compaction pipeline
    // without its build sibling — the per-octave index tables it reads
    // then don't exist and the first timed point fails. Each entry
    // builds the tables its pipeline consumes IFF missing; when the
    // build sibling IS active it has already (re)written them this
    // octave and the prep is a no-op. Runs OUTSIDE the timed section,
    // so probe timings never absorb a build.
    def ensure(probe: String)(build: => Unit): Unit =
      if (!spark.catalog.tableExists(probe)) build
    def prepFor(name: String, d: String, m: Int): Unit = name match {
      case "ivf2_search" | "knn_edges_index" =>
        ensure(s"scale_ivf2_x${m}_coarse") {
          graft.queries.Similarity.writeIvf2Index(spark, d, s"scale_ivf2_x$m") }
      case "hybrid_search" =>
        ensure(s"scale_ivf2_x${m}_coarse") {
          graft.queries.Similarity.writeIvf2Index(spark, d, s"scale_ivf2_x$m") }
        ensure(s"scale_bm_x${m}_tf") {
          graft.queries.TextAnalysis.writeBm25Index(spark, d, s"scale_bm_x$m") }
      case "minhash_append" =>
        ensure(s"scale_mh_x${m}_sig") {
          graft.queries.Dedup.writeMinhashIndexBucketed(spark, d, s"scale_mh_x$m") }
      case "phash_ingest_probe" | "phash_bucketed_probe" | "phash_compaction" =>
        ensure(s"scale_ph_x${m}_sig") {
          graft.queries.Multimodal.writePhashIndex(spark, d, s"scale_ph_x$m") }
      case "gram_takedown" | "gram_compaction" =>
        ensure(s"scale_gm_x${m}_gramdf") {
          graft.queries.Dedup.writeGramIndexCounted(spark, d, s"scale_gm_x$m") }
      case _ => ()
    }

    val metrics = new MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Point]]()
    for (m <- allScales) {
      val d = dirs(m)
      for ((name, pScales, run) <- pipelines if pScales.contains(m) && active(name)) {
        prepFor(name, d, m)
        // min-of-two (the Bench.scala lesson): a single pass is hostage
        // to GC pauses and ambient load — at 64× one poisoned point
        // moved a tail exponent from ~0.9 to ~1.2 in an early run.
        // Byte metrics come from the faster run (bytes are load-
        // invariant; pairing them with the kept timing keeps one
        // coherent observation per point).
        def one(): Point = {
          val (sw0, sr0, in0, sp0) = metrics.snap(spark)
          val secs = timed(run(spark, d, m))
          val (sw1, sr1, in1, sp1) = metrics.snap(spark)
          Point(m, secs, sw1 - sw0, sr1 - sr0, in1 - in0, sp1 - sp0)
        }
        val (a, b) = (one(), one())
        val pt = if (a.secs <= b.secs) a else b
        results(name) = results.getOrElse(name, Seq.empty) :+ pt
        println(f"SCALE $name%-20s x$m%-3d ${pt.secs}%8.2f s  " +
          f"in ${pt.input / 1e6}%9.1f MB  sw ${pt.shuffleWrite / 1e6}%8.1f MB  " +
          f"spill ${pt.spill / 1e6}%6.1f MB")
      }
      // the per-scale serving indexes are measured; drop them before the
      // next scale so disk stays bounded
      for (t <- Seq("_coarse", "_fine", "_postings"))
        spark.sql(s"DROP TABLE IF EXISTS scale_ivf2_x$m$t")
      for (t <- Seq("_sig", "_keys"))
        spark.sql(s"DROP TABLE IF EXISTS scale_ph_x$m$t")
      for (t <- Seq("_tf", "_dl", "_stats"))
        spark.sql(s"DROP TABLE IF EXISTS scale_bm_x$m$t")
      for (t <- Seq("_sig", "_keys", "_counts"))
        spark.sql(s"DROP TABLE IF EXISTS scale_mh_x$m$t")
      for (t <- Seq("_gramdf", "_tomb"))
        spark.sql(s"DROP TABLE IF EXISTS scale_gm_x$m$t")
      // the write-through BPE model tables the bpe_serve fit persists
      for (t <- Seq("_merges", "_ids"))
        spark.sql("DROP TABLE IF EXISTS " +
          graft.queries.TextAnalysis.bpeModelTablePrefix(dirs(m), 3) + t)
    }

    def tailExp(pts: Seq[(Int, Double)]): Double = {
      val (m1, t1) = pts(pts.size - 2)
      val (m2, t2) = pts.last
      math.log(t2 / t1) / math.log(m2.toDouble / m1)
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale would render 2,823 — invalid JSON
    def d3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    // a TARGETED run (pipelineFilter set) merges into an existing
    // outJson — re-measured pipelines replace their entries, everything
    // else carries over verbatim, and "worst" spans the merged set — so
    // adding one pipeline never silently discards the full sweep
    val kept: Seq[(String, String, Double)] =
      if (filterSet.isDefined && new java.io.File(outJson).exists()) {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val p = mapper.readTree(new java.io.File(outJson)).get("pipelines")
        if (p == null) Seq.empty
        else {
          val it = p.fields()
          val buf = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
          while (it.hasNext) {
            val e = it.next()
            if (!results.contains(e.getKey))
              buf += ((e.getKey, e.getValue.toString,
                e.getValue.get("tail_exponent").asDouble))
          }
          buf.toSeq
        }
      } else Seq.empty
    val fresh = results.toSeq.map { case (name, pts) =>
      val tpts = pts.map(p => (p.m, p.secs))
      val secsJson = tpts.map { case (m, t) => s""""$m":${d3(t)}""" }.mkString(",")
      def mb(sel: Point => Long): String =
        pts.map(p => s""""${p.m}":${d3(sel(p) / 1e6)}""").mkString(",")
      // shuffle_frac = shuffle-write bytes / input bytes at the LARGEST
      // scale. CAUTION reading it on THIS corpus: input counts
      // parquet-COMPRESSED bytes (and the multimodal media is
      // generated, not read), so the ratio runs far above 1 even for
      // signature-only shuffles — the load-bearing evidence is the
      // per-scale columns: shuffle bytes growing LINEARLY with scale
      // at a fixed per-row mass (signatures), zero for the pure
      // map-side builds, and spill zero outside the one by-design
      // full-corpus sort (dedup_rewrite)
      val last = pts.last
      val frac = if (last.input > 0) last.shuffleWrite.toDouble / last.input else 0.0
      (name,
        s"""{"secs":{$secsJson},"exponent":${d3(exponent(tpts))},""" +
          s""""tail_exponent":${d3(tailExp(tpts))},""" +
          s""""input_mb":{${mb(_.input)}},"shuffle_write_mb":{${mb(_.shuffleWrite)}},""" +
          s""""shuffle_read_mb":{${mb(_.shuffleRead)}},"spill_mb":{${mb(_.spill)}},""" +
          s""""shuffle_frac_at_max":${d3(frac)}}""",
        tailExp(tpts))
    }
    val merged = kept ++ fresh
    val pipelineJson = merged.map { case (n, js, _) => s""""$n":$js""" }.mkString(",")
    val worst = merged.maxBy(_._3)
    val json = s"""{"metric":"scale_exponents","base":"$base",""" +
      s""""scales":[${allScales.mkString(",")}],""" +
      s""""base_rows":{"documents":${spark.read.parquet(s"$base/documents.parquet").count()},""" +
      s""""embeddings":${spark.read.parquet(s"$base/embeddings.parquet").count()}},""" +
      s""""pipelines":{$pipelineJson},""" +
      s""""worst":{"pipeline":"${worst._1}","exponent":${d3(worst._3)}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
