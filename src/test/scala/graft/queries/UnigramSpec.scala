package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpecBase {

  test("serving expression equals the relational training DP + id join per doc") {
    // round 17 moved serving off the join-gather plan into the native
    // UnigramTokenize expression; this pins the expression row-identical
    // to the relational Viterbi (Unigram.segment — still the trainer's
    // E-step) composed with the id lookup, on real corpus words under
    // the real trained model
    val model = Unigram.unigramFit(spark, sf)
    val docs = graft.Engine.table(spark, sf, "documents")
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    val idOf = model.select("piece", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wids = Unigram.segment(words, model)
      .select("w", "ts").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).map(idOf.getOrElse(_, -1L)))
      .toMap
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val ids = r.getString(1).split(" ").filter(_.nonEmpty).toSeq.flatMap(wids)
      r.getLong(0) -> ((ids.size.toLong, ids.mkString(" ")))
    }.toMap
    val got = Unigram.tokenizeOf(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == expected)
  }

  test("emFit localization gate: lazy-chain and localized branches train the identical model") {
    // the per-iteration driver materialization (the x64-octave fix) is
    // execution strategy only — above/below graft.unigramLocalFitBytes
    // the arithmetic is identical. Gate corpus sits under the bound.
    assert(Curation.textBytes(spark, sf) <= Unigram.localFitBytes,
      "gate corpus should take the lazy-chain branch")
    def modelRows = Unigram.emFit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val lazyChain = modelRows
    sys.props("graft.unigramLocalFitBytes") = "0"
    try assert(modelRows == lazyChain,
      "localized and lazy-chain EM fits diverged")
    finally sys.props.remove("graft.unigramLocalFitBytes")
  }

  test("viterbi: every segmentation matches a driver-side DP recompute") {
    // independent reimplementation of the stated algorithm (plain Scala,
    // no shared SQL): max score over ≤4-char pieces, ties to the
    // SHORTEST piece — every distinct word must match exactly
    val words = Unigram.wordCounts(spark, sf)
    val model = Unigram.emFit(spark, sf)
    val lp = model.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val segs = Unigram.segment(words, model).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs.nonEmpty)
    segs.foreach { case (w, ts) =>
      val n = w.length
      val dp = Array.fill(n + 1)(0.0)
      val bl = Array.fill(n + 1)(0)
      for (p <- 1 to n) {
        var bs = -1.0e18
        var b = 0
        for (l <- 1 to math.min(4, p)) {
          val piece = w.substring(p - l, p)
          lp.get(piece).foreach { v =>
            val cand = dp(p - l) + v
            if (cand > bs) { bs = cand; b = l }
          }
        }
        dp(p) = bs; bl(p) = b
      }
      val out = scala.collection.mutable.ListBuffer[String]()
      var pos = n
      while (pos > 0) { out.prepend(w.substring(pos - bl(pos), pos)); pos -= bl(pos) }
      assert(out.toSeq == ts, s"word '$w': engine ${ts.mkString("|")} != driver ${out.mkString("|")}")
      assert(ts.mkString("") == w, s"word '$w': segmentation does not tile the word")
    }
  }

  test("train: full char coverage, TopK bound, counts reconcile with segmentations") {
    val out = SparkEntryHelper.run(spark, sf, "x_text_unigram_train")
    val rows = out.collect()
    // all corpus characters present as pieces (Laplace keeps them alive)
    val chars = Unigram.wordCounts(spark, sf).select(explode(split(col("w"), "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    val tokens = rows.map(_.getString(0)).toSet
    assert(chars.subsetOf(tokens), s"missing chars: ${chars -- tokens}")
    assert(rows.count(_.getString(0).length > 1) <= 200, "multi-char pieces exceed TopK")
    // count mass == total tokens over the final segmentation
    val words = Unigram.wordCounts(spark, sf)
    val totalToks = Unigram.segment(words, Unigram.emFit(spark, sf))
      .select(sum(col("n") * size(col("ts")))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalToks, "count mass != segmented token mass")
    // both verdict classes: used and unused pieces exist (non-vacuous Laplace)
    assert(rows.exists(_.getLong(1) > 0) && rows.exists(_.getLong(1) == 0))
  }

  test("tokenize ids: decode reproduces the segmentation; id rule is frequency-ordered") {
    val model = Unigram.unigramFit(spark, sf)
    val mrows = model.collect()
    // the id assignment is exactly (count DESC, piece ASC) dense from 0
    val expectedIds = mrows.sortBy(r => (-r.getLong(1), r.getString(0)))
      .zipWithIndex.map { case (r, i) => r.getString(0) -> i.toLong }.toMap
    mrows.foreach(r => assert(r.getLong(3) == expectedIds(r.getString(0)),
      s"piece '${r.getString(0)}': id ${r.getLong(3)} != ${expectedIds(r.getString(0))}"))
    val idToPiece = mrows.map(r => r.getLong(3) -> r.getString(0)).toMap
    val segs = Unigram.segment(Unigram.wordCounts(spark, sf), model)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val out = SparkEntryHelper.run(spark, sf, "x_text_unigram_ids").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size, "every doc under the cut must tokenize")
    out.foreach { r =>
      val (id, n, ids) = (r.getLong(0), r.getLong(1), r.getString(2))
      val decoded = ids.split(" ").filter(_.nonEmpty)
        .map(s => idToPiece(s.toLong))
      assert(decoded.length == n, s"doc $id: n_tokens $n != ${decoded.length}")
      // ids decode to the words' own Viterbi segmentations, in order
      val expectedPieces = docs(id).split(" ", -1).flatMap(segs(_))
      assert(decoded.toSeq == expectedPieces.toSeq,
        s"doc $id: decoded pieces diverge from the segmentation")
      assert(decoded.mkString("") == docs(id).replace(" ", ""),
        s"doc $id: decoded pieces do not tile the text")
    }
  }

  test("persisted model: tokenization against the reloaded table matches the fresh fit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    Unigram.writeUnigramModel(spark, sf, "unigram_model_spec")
    try {
      val fresh = Unigram.tokenizeOf(docs, Unigram.unigramFit(spark, sf))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val loaded = Unigram.tokenizeOf(docs, spark.table("unigram_model_spec"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(fresh == loaded, "the persisted model must tokenize identically")
      assert(fresh.nonEmpty)
    } finally graft.Engine.reclaimManagedTable(spark, "unigram_model_spec")
  }

  test("fertility: BPE side equals the standalone query; unigram side reconciles") {
    val cmp = SparkEntryHelper.run(spark, sf, "x_text_unigram_fertility").collect()
      .map(r => r.getString(0) -> r).toMap
    val bpe = SparkEntryHelper.run(spark, sf, "x_text_bpe_fertility").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(cmp.keySet == bpe.keySet, "language sets differ")
    cmp.foreach { case (lang, r) =>
      assert(r.getLong(4) == bpe(lang).getLong(2), s"$lang: tokens_bpe mismatch")
      assert(r.getDouble(5) == bpe(lang).getDouble(3), s"$lang: fertility_bpe mismatch")
      assert(r.getDouble(3) > 1.0, s"$lang: unigram fertility must exceed 1 (multi-token words exist)")
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }
}

/** Tiny indirection so the spec reads the same entries the driver runs. */
private object SparkEntryHelper {
  def run(s: org.apache.spark.sql.SparkSession, d: String, name: String) =
    graft.SparkEntry.queries(name)(s, d)
}
