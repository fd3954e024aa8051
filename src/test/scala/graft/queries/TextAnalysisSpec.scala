package graft.queries

import graft.SparkSpecBase

/** The oracle gate hash-checks the exact text-analysis queries; this spec
  * pins the sketch-based scale path against its exact ground truth. */
class TextAnalysisSpec extends SparkSpecBase {

  test("vocabulary: tf >= df, descending tf, bounded size") {
    val rows = TextAnalysis.queries("x_text_vocab")(spark, sf).collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2)), "tf >= df per term")
    val tfs = rows.map(_.getLong(1)).toSeq
    assert(tfs == tfs.sorted.reverse, "ordered by tf descending")
  }

  test("cleaning funnel: monotone survivor counts") {
    val rows = TextAnalysis.queries("x_text_funnel")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq ==
      Seq("0_ingested", "1_quality", "2_language", "3_deduped"))
    val ns = rows.map(_._2).toSeq
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"not monotone: $ns")
    assert(ns.head > 0 && ns.last > 0)
  }

  test("truncation: 32-token budget on whitespace boundaries, flags consistent") {
    val rows = TextAnalysis.queries("x_text_truncate")(spark, sf).collect()
    assert(rows.length == 100)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("text"))).toMap
    rows.foreach { r =>
      val (id, nTok, nKept, head, trunc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4))
      val ws = texts(id).split(" ")
      assert(nTok == ws.length.toLong)
      assert(nKept == math.min(ws.length, 32).toLong)
      assert(head == ws.take(32).mkString(" "), s"doc $id: truncation not on token boundary")
      assert(trunc == ws.length > 32)
    }
  }

  test("top term: corpus-wide df, argmax matches a driver-side computation") {
    val rows = TextAnalysis.queries("x_text_topterm")(spark, sf).collect()
    assert(rows.length == 50)
    // recompute exactly for one document against the raw corpus
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("text")).split(" ").toSeq)
    val dfMap = all.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.length.toLong }
    val doc0 = all.toMap.apply(0L)
    val tf0 = doc0.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val expect = tf0.toSeq.map { case (w, tf) => (tf, -dfMap(w), w) }.max
    val got = rows.find(_.getLong(0) == 0L).get
    assert(got.getString(1) == expect._3 && got.getLong(2) == expect._1
      && got.getLong(3) == -expect._2)
    // df must be computed over the FULL corpus, not the doc_id < 50 sample
    rows.foreach(r => assert(r.getLong(3) == dfMap(r.getString(1))))
  }

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

  test("naive bayes: predictions and scores match a full driver-side recompute") {
    val got = TextAnalysis.queries("x_text_nb_classify")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)

    def lnq(x: Double): Double = math.floor(math.log(x) * 1000000.0) / 1000000.0
    def md5hex1(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x".substring(0, 1)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("text")).split(" ").toSeq).toMap
    val labels = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("label")).toLong).toMap
    val train = labels.filter { case (id, _) => md5hex1(id.toString) < "8" }
    // model: per-(label, w) counts over train docs, dense over the vocab
    val ttf = train.toSeq.flatMap { case (id, y) => docs(id).map(w => (y, w)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val vocab = ttf.keySet.map(_._2)
    val toks = ttf.groupBy(_._1._1).map { case (y, g) => y -> g.values.sum }
    val ls = toks.keys.toSeq.sorted
    val priors = train.groupBy(_._2).map { case (y, g) =>
      y -> lnq(g.size.toDouble / train.size.toDouble) }
    def lw(y: Long, w: String): Double =
      lnq((ttf.getOrElse((y, w), 0L) + 1.0) / (toks(y) + vocab.size).toDouble)
    for ((id, (lab, pred, score)) <- got) {
      assert(lab == labels(id))
      val tf = docs(id).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val scores = ls.map { y =>
        val fold = tf.filter(v => vocab(v._1)).toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (a, (w, n)) => a + n.toDouble * lw(y, w) }
        y -> (priors(y) + fold)
      }
      val best = scores.maxBy { case (y, sc) => (sc, -y) }
      assert(pred == best._1, s"doc $id: pred $pred vs driver ${best._1}")
      assert(score == best._2, s"doc $id: score $score vs driver ${best._2}")
    }
    // non-vacuous: above uniform chance on the gate corpus (labels are
    // embedding-space cluster ids — the text signal is weak by design;
    // the mechanism, not the synthetic signal strength, is what's gated)
    val acc = got.values.count { case (lab, pred, _) => lab == pred }.toDouble / got.size
    assert(acc > 1.0 / ls.size, s"accuracy $acc not above uniform chance (${ls.size} labels)")
  }

  test("ccnet perplexity: entropy and buckets match a full driver-side recompute") {
    val got = TextAnalysis.queries("x_text_ccnet_ppl")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toMap
    assert(got.size == 150)

    def lnq(x: Double): Double = math.floor(math.log(x) * 1000000.0) / 1000000.0
    def md5hex1(s: String): String = {
      val dg = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      f"${dg(0) & 0xff}%02x".substring(0, 1)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => (r.getLong(0), r.getString(r.fieldIndex("lang")),
        r.getString(r.fieldIndex("text"))))
    def trisOf(t: String): Seq[String] =
      if (t.length < 3) Seq.empty else (1 to t.length - 2).map(i => t.substring(i - 1, i + 2))
    val train = docs.filter(d => md5hex1(d._1.toString) < "8")
    val tm = train.flatMap { case (_, lang, t) => trisOf(t).map(tri => (lang, tri)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val bm = tm.groupBy { case ((lang, tri), _) => (lang, tri.substring(0, 2)) }
      .map { case (k, g) => k -> g.values.sum }
    val vs = tm.keys.groupBy(_._1).map { case (lang, g) => lang -> g.size.toLong }
    val hAll = docs.map { case (id, lang, t) =>
      val tf = trisOf(t).groupBy(identity).map { case (tri, g) => tri -> g.size.toLong }
      val n = tf.values.sum
      val ll = tf.toSeq.sortBy(_._1).foldLeft(0.0) { case (a, (tri, c)) =>
        a + c.toDouble * lnq((tm.getOrElse((lang, tri), 0L) + 1.0) /
          (bm.getOrElse((lang, tri.substring(0, 2)), 0L) + vs(lang)).toDouble)
      }
      (id, lang, n, if (n > 0) -ll / n else 0.0)
    }
    val thr = hAll.groupBy(_._2).map { case (lang, g) =>
      val sorted = g.sortBy(x => (x._4, x._1)).map(_._4)
      val cnt = sorted.length.toLong
      lang -> (sorted((1 + (cnt - 1) / 3).toInt - 1),
        sorted((1 + (cnt - 1) * 2 / 3).toInt - 1))
    }
    for ((id, lang, n, hExp) <- hAll if id < 150) {
      val (glang, gn, gh, gbucket) = got(id)
      assert(glang == lang && gn == n, s"doc $id meta")
      assert(gh == hExp, s"doc $id: h $gh vs driver $hExp")
      val (t1, t2) = thr(lang)
      val bExp = if (hExp <= t1) "head" else if (hExp <= t2) "middle" else "tail"
      assert(gbucket == bExp, s"doc $id: bucket $gbucket vs driver $bExp")
    }
    // non-vacuous: tertile split realizes all three buckets
    assert(got.values.map(_._4).toSet == Set("head", "middle", "tail"))
  }

  test("bpe pair counts match a driver-side recompute from the raw text") {
    val got = TextAnalysis.queries("x_text_bpe_pairs")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      var i = 1
      while (i < ws.length) {
        val p = ws(i - 1) + " " + ws(i)
        counts(p) = counts.getOrElse(p, 0L) + 1
        i += 1
      }
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got == expect, s"got ${got.take(5)}… want ${expect.take(5)}…")
  }

  test("winnowing matches a driver-side recompute (rightmost-min rule)") {
    val got = TextAnalysis.queries("x_text_winnow")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 50").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      val hs = (0 to ws.length - 3).map { p =>
        p.toLong -> graft.functions.Md5Long60.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(
            s"${ws(p)} ${ws(p + 1)} ${ws(p + 2)}"))
      }
      (0 to hs.length - 4).map { j =>
        val win = hs.slice(j, j + 4)
        val mh = win.map(_._2).min
        val pos = win.filter(_._2 == mh).map(_._1).max // rightmost tie-break
        (id, pos, mh)
      }.distinct
    }.distinct.sortBy(x => x).toSeq
    assert(got == expect, s"got ${got.length} fps, want ${expect.length}")
  }

  test("lm novelty: coherent counts, and shared text scores as known") {
    val rows = TextAnalysis.queries("x_text_lm_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, nk, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nb >= 1 && nk >= 0 && nk <= nb, s"doc ${r.getLong(0)}: $nk of $nb")
      assert(ratio == nk.toDouble / nb)
    }
    // the corpus's planted near-duplicates (docs 8 and 12 share almost all
    // their text) must score their bigrams as corpus-known
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(8L) > 0.5 && byId(12L) > 0.5,
      s"planted near-dups should be known: ${byId(8L)}, ${byId(12L)}")
  }

  /** The textbook BPE loop (explicit left-to-right merge walk, no
    * string-encoding trick): returns the merge list and the tokenized
    * vocabulary after `steps` merges — the reference both BPE tests
    * compare the engine against. */
  private def refBpe(steps: Int): (Seq[(String, String, Long)], Map[Seq[String], Long]) = {
    var vocab: Map[Seq[String], Long] = graft.Engine.table(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (w, g) => w.split("").toSeq -> g.length.toLong }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to steps) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab if syms.length >= 2; Seq(x, y) <- syms.sliding(2))
        pc((x, y)) = pc.getOrElse((x, y), 0L) + n
      val ((a, b), cnt) = pc.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head
      merges += ((a, b, cnt))
      def mergeSeq(s: Seq[String]): Seq[String] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
          else { out += s(i); i += 1 }
        }
        out.toSeq
      }
      vocab = vocab.toSeq.map { case (sy, n) => mergeSeq(sy) -> n }
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    }
    (merges.toSeq, vocab)
  }

  test("BPE fertility: per-language masses match a first-principles recompute") {
    val rows = TextAnalysis.queries("x_text_bpe_fertility")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (merges, _) = refBpe(3)
    def tokenize(w: String): Seq[String] =
      merges.foldLeft(w.split("").toSeq) { case (syms, (a, b, _)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
          else { out += syms(i); i += 1 }
        }
        out.toSeq
      }
    val byLang = graft.Engine.table(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (lang, g) => lang -> g.flatMap(_._2.split(" ")).toSeq }
    assert(rows.keySet == byLang.keySet)
    for ((lang, words) <- byLang) {
      val (gw, gt, fert, cpt) = rows(lang)
      val toks = words.map(w => tokenize(w).length.toLong).sum
      val chars = words.map(_.length.toLong).sum
      assert(gw == words.length.toLong, s"$lang word mass")
      assert(gt == toks, s"$lang token mass")
      assert(fert == toks.toDouble / words.length.toDouble, s"$lang fertility")
      assert(cpt == chars.toDouble / toks.toDouble, s"$lang chars/token")
      assert(fert >= 1.0 && fert <= words.map(_.length).max.toDouble)
    }
    // non-vacuous: a merge actually compresses somewhere (fertility < raw chars/word)
    assert(byLang.keys.exists { lang =>
      val words = byLang(lang)
      rows(lang)._3 < words.map(_.length.toLong).sum.toDouble / words.length
    }, "no language shows any merge compression")
  }

  test("tokenize ids: per-doc input_ids match a first-principles tokenizer walk") {
    val rows = TextAnalysis.queries("x_text_tokenize_ids")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows.size == 100)
    val (merges, _) = refBpe(3)
    def tokenize(w: String): Seq[String] =
      merges.foldLeft(w.split("").toSeq) { case (syms, (a, b, _)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
          else { out += syms(i); i += 1 }
        }
        out.toSeq
      }
    val texts = graft.Engine.table(spark, sf, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // frequency-ordered id table over the FULL corpus
    val tokCnt = texts.flatMap(_._2.split(" ")).flatMap(tokenize)
      .groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val ids = tokCnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> i.toLong }.toMap
    for ((id, text) <- texts if id < 100) {
      val want = text.split(" ").toSeq.flatMap(tokenize).map(ids)
      val (n, s) = rows(id)
      assert(n == want.length.toLong, s"doc $id token count")
      assert(s == want.mkString(" "), s"doc $id ids")
    }
    // non-vacuous: a merged multi-char token occurs in some doc's stream
    val idOf = ids.map(_.swap)
    assert(rows.values.exists(_._2.split(" ").exists(t => idOf(t.toLong).length > 1)),
      "no merged token ever appears in the tokenized docs")
  }

  test("persisted BPE model: reload == in-memory fit; write-through cache serves from tables") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    def ids(m: TextAnalysis.BpeModel): Set[(Long, Long, String)] =
      TextAnalysis.tokenizeOf(docs, m).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // in-memory fit — no tables touched
    val fresh = TextAnalysis.bpeFitUncached(spark, sf, 3)
    // explicit model-registry write + reload (the Wordpiece/Unigram pattern)
    TextAnalysis.writeBpeModel(spark, sf, 3, "bpe_model_spec")
    try {
      val loaded = TextAnalysis.bpeModelOf(spark, "bpe_model_spec")
      assert(loaded.merges == fresh.merges, "reloaded merge list diverges from the fit")
      val a = ids(fresh)
      assert(a.nonEmpty && ids(loaded) == a,
        "the reloaded model must tokenize row-identically to the in-memory fit")
      // the write-through fit cache serves the same ids from ITS tables
      assert(ids(TextAnalysis.bpeFit(spark, sf, 3)) == a,
        "the write-through cached model diverges from the fit")
      val prefix = TextAnalysis.bpeModelTablePrefix(sf, 3)
      assert(spark.catalog.tableExists(s"${prefix}_merges") &&
        spark.catalog.tableExists(s"${prefix}_ids"),
        "the fit cache must leave the frozen model on disk for fresh sessions")
      // invalidation drops the memo AND the write-through tables — the
      // corpus-rewrite path (the Dedup.invalidateClusters contract)
      TextAnalysis.invalidateBpeModel(spark, sf)
      assert(!spark.catalog.tableExists(s"${prefix}_merges") &&
        !spark.catalog.tableExists(s"${prefix}_ids"),
        "invalidation must drop the write-through model tables")
      // a post-invalidation fit retrains and still matches
      assert(ids(TextAnalysis.bpeFit(spark, sf, 3)) == a)
    } finally {
      graft.Engine.reclaimManagedTable(spark, "bpe_model_spec_merges")
      graft.Engine.reclaimManagedTable(spark, "bpe_model_spec_ids")
    }
  }

  test("BPE training: 3 merges match a first-principles driver implementation") {
    val rows = TextAnalysis.queries("x_text_bpe_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val (want, _) = refBpe(3)
    assert(rows.map(r => (r._2, r._3, r._4)).toSeq == want,
      s"merges ${rows.toSeq} != reference $want")
  }

  test("BPE apply: top-20 tokens match the reference tokenization") {
    val rows = TextAnalysis.queries("x_text_bpe_apply")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to 20L).toSeq, "ranks not dense")
    val (_, vocab) = refBpe(3)
    val counts = vocab.toSeq.flatMap { case (syms, n) => syms.map(_ -> n) }
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val want = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      .zipWithIndex.map { case ((t, c), i) => (i + 1L, t, c) }
    assert(rows.toSeq == want, s"top tokens ${rows.toSeq} != reference $want")
    // a trained merge actually fires: some multi-char token ranks top-20
    assert(rows.exists(_._2.length > 1), "no merged token in the applied top-20")
  }

  test("persisted BM25 index: indexed == in-memory; append scores exactly like a rebuild") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (p <- Seq("bm25idx", "bm25app"); t <- Seq("_tf", "_dl", "_stats")) {
      spark.sql(s"DROP TABLE IF EXISTS $p$t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, p + t))
    }
    TextAnalysis.writeBm25Index(spark, sf, "bm25idx")
    val queries = graft.Engine.table(spark, sf, "documents").filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), expr("slice(split(text, ' '), 1, 3)").as("terms"))
    val got = TextAnalysis.bm25SearchOf(queries, "bm25idx").collect().toSeq
    val mem = TextAnalysis.queries("x_text_bm25")(spark, sf).collect().toSeq
    assert(got == mem, "indexed search must emit the in-memory query's rows")
    // append path: index the first 400 docs, append the rest; because df
    // and stats derive from the union postings, scoring is EXACT — equal
    // to the full index, not approximately stale
    val base = java.nio.file.Files.createTempDirectory("graft-bm25app").toString
    graft.Engine.table(spark, sf, "documents").filter(col("doc_id") < 400)
      .write.parquet(s"$base/documents.parquet")
    TextAnalysis.writeBm25Index(spark, base, "bm25app")
    def tfFiles(): Set[String] = new java.io.File(warehouse, "bm25app_tf")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = tfFiles()
    TextAnalysis.appendBm25Postings(spark, "bm25app",
      graft.Engine.table(spark, sf, "documents").filter(col("doc_id") >= 400)
        .select("doc_id", "text"))
    assert(before.subsetOf(tfFiles()), "append must not rewrite existing postings files")
    val appended = TextAnalysis.bm25SearchOf(queries, "bm25app").collect().toSeq
    assert(appended == got, "append must score exactly like the full-corpus index")
  }

  test("bm25 index compaction: appended file groups collapse, search rows unchanged") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("_tf", "_dl", "_stats")) {
      spark.sql(s"DROP TABLE IF EXISTS bmcmp$t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, "bmcmp" + t))
    }
    // index the first 300 docs, then two daily-crawl appends covering
    // the rest — each append adds its own file group per bucket to the
    // postings and lengths tables (the generic bucketed-append tax)
    val docs = graft.Engine.table(spark, sf, "documents")
    val base = java.nio.file.Files.createTempDirectory("graft-bmcmp").toString
    docs.filter(col("doc_id") < 300).write.parquet(s"$base/documents.parquet")
    TextAnalysis.writeBm25Index(spark, base, "bmcmp")
    TextAnalysis.appendBm25Postings(spark, "bmcmp",
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 400).select("doc_id", "text"))
    TextAnalysis.appendBm25Postings(spark, "bmcmp",
      docs.filter(col("doc_id") >= 400).select("doc_id", "text"))
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), expr("slice(split(text, ' '), 1, 3)").as("terms"))
    def search() = TextAnalysis.bm25SearchOf(queries, "bmcmp").collect().toSeq
    val before = search()
    assert(before == TextAnalysis.queries("x_text_bm25")(spark, sf).collect().toSeq,
      "appended index must score like the full-corpus query before compaction")
    def files(t: String): Int =
      Option(new java.io.File(warehouse, t).listFiles()).map(
        _.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    def bucketSpec(t: String) = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t)).bucketSpec.get
    val (filesBefore, specBefore) = (files("bmcmp_tf"), bucketSpec("bmcmp_tf"))
    assert(filesBefore > specBefore.numBuckets,
      s"appends must have produced extra file groups (got $filesBefore)")
    assert(specBefore.sortColumnNames == Seq("w"),
      "postings table must be term-sorted before compaction (else the pin is vacuous)")
    def audit() = graft.Engine.bucketFileAudit(spark, "bmcmp_tf", maxGroups = 1.5).head()
    assert(audit().getBoolean(4), "audit must recommend compaction after two appends")
    graft.Engine.compactBucketedTable(spark, "bmcmp_tf")
    graft.Engine.compactBucketedTable(spark, "bmcmp_dl")
    assert(!audit().getBoolean(4), "audit must clear after compaction")
    // same rows under the same bucket AND sort spec — only file count changed
    assert(bucketSpec("bmcmp_tf") == specBefore, "bucket+sort spec must survive compaction")
    assert(files("bmcmp_tf") <= specBefore.numBuckets,
      "compacted postings are at most one file per bucket")
    assert(search() == before, "compaction changed search rows")
    for (t <- Seq("_tf", "_dl", "_stats")) spark.sql(s"DROP TABLE IF EXISTS bmcmp$t")
  }

  test("cms heavy hitters: estimates never undercount, bounded over, sketch agg partial") {
    val df = TextAnalysis.queries("x_text_heavy_hitters")(spark, sf)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    // exact side cross-checked against the raw corpus
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().flatMap(_.getString(0).split(" "))
    val counts = toks.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val n = toks.length.toLong
    rows.foreach { case (w, exact, est) =>
      assert(exact == counts(w), s"$w exact count")
      assert(est >= exact, s"$w: CMS must never undercount ($est < $exact)")
      // eps = 0.001 ⇒ over-estimate bounded by eps·N (w.h.p.; fixed seed)
      assert(est - exact <= math.ceil(0.001 * n).toLong + 1,
        s"$w: over-estimate ${est - exact} beyond the eps·N bound")
    }
    // the sketch is a TRUE partial aggregate — map-side sketches merge
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count_min_sketch"),
      s"sketch must build map-side:\n$p")
  }

  test("attributes: every composed signal equals its standalone gated query") {
    val at = TextAnalysis.queries("x_text_attributes")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getString(2), r.getLong(3), r.getString(4), r.getBoolean(5)))
      .toMap
    assert(at.size == 150)
    val go = TextAnalysis.queries("x_text_gopher")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("pass"))).toMap
    val cc = TextAnalysis.queries("x_text_ccnet_ppl")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("bucket"))).toMap
    val nb = TextAnalysis.queries("x_text_nb_classify")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("pred"))).toMap
    val li = TextAnalysis.langidPred(spark.read.parquet(s"$sf/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("predicted"))).toMap
    for ((id, (gp, bucket, pred, lp, keep)) <- at) {
      assert(gp == go(id) && bucket == cc(id) && pred == nb(id) && lp == li(id),
        s"doc $id: composed signals diverge from the standalone queries")
      assert(keep == (gp && bucket != "tail"), s"doc $id: keep rule")
    }
    // non-vacuous: the composite keep rule splits the corpus
    assert(at.values.map(_._5).toSet == Set(true, false))
  }

  test("index writers reclaim crash-orphaned warehouse locations") {
    // simulate a JVM that died between materializing files and
    // registering the table: directory exists, catalog has no entry —
    // the rebuild must reclaim and succeed, not LOCATION_ALREADY_EXISTS
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("nbct_counts", "nbct_ndocs")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
      val orphan = new java.io.File(warehouse, t)
      assert(orphan.mkdirs(), s"failed to plant orphan $t")
      java.nio.file.Files.writeString(orphan.toPath.resolve("junk"), "stale")
    }
    TextAnalysis.writeNbModel(spark, sf, "nbct")
    assert(spark.table("nbct_counts").count() > 0)
    assert(spark.table("nbct_ndocs").count() > 0)
  }

  test("persisted NB model: indexed == in-memory; append scores exactly like a refit") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (p <- Seq("nbm", "nbapp"); t <- Seq("_counts", "_ndocs")) {
      spark.sql(s"DROP TABLE IF EXISTS $p$t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, p + t))
    }
    val docs = graft.Engine.table(spark, sf, "documents").select("doc_id", "text")
    val labels = graft.Engine.table(spark, sf, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label").cast("long").as("label"))
    val train = labels.filter(substring(md5(col("doc_id").cast("string")), 1, 1) < "8")

    TextAnalysis.writeNbModel(spark, sf, "nbm")
    val mem = TextAnalysis.nbScoreOf(docs, TextAnalysis.nbFit(docs, train))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val idx = TextAnalysis.nbScoreOf(docs, TextAnalysis.nbModelOf(spark, "nbm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(idx == mem, "persisted-model scoring must equal the in-memory fit")

    // append path: fit on the first half's train docs, fold in the rest;
    // because counts are additive and everything else re-derives, the
    // appended model must score EXACTLY like a refit on the union
    val base = java.nio.file.Files.createTempDirectory("graft-nbapp").toString
    docs.filter(col("doc_id") < 250).write.parquet(s"$base/documents.parquet")
    labels.filter(col("doc_id") < 250).withColumnRenamed("doc_id", "vec_id")
      .withColumn("embedding", array(lit(0.0f)))
      .select("vec_id", "embedding", "label")
      .write.parquet(s"$base/embeddings.parquet")
    TextAnalysis.writeNbModel(spark, base, "nbapp")
    def countFiles(): Set[String] = new java.io.File(warehouse, "nbapp_counts")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = countFiles()
    TextAnalysis.appendNbModel(spark, "nbapp",
      docs.filter(col("doc_id") >= 250), train.filter(col("doc_id") >= 250))
    assert(before.subsetOf(countFiles()), "append must not rewrite existing count files")
    val appended = TextAnalysis.nbScoreOf(docs, TextAnalysis.nbModelOf(spark, "nbapp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(appended == mem, "appended model must score exactly like the union refit")
  }

  test("BM25: dense ranks, descending scores, self-retrieval, driver-side recompute") {
    val rows = TextAnalysis.queries("x_text_bm25")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to rs.length).toSeq, "ranks not dense")
      val sc = sorted.map(_.getDouble(3))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b }, s"scores not sorted: ${sc.toSeq}")
      // the gate vocabulary is dense: every query fills its top-10
      assert(rs.length == 10, s"query $qid returned ${rs.length} rows")
    }
    // driver-side recompute of query 0's scores from raw text (tolerance:
    // the recompute associates the arithmetic differently)
    val toks = graft.Engine.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.length.toLong).sum.toDouble / n
    val qterms = toks(0L).take(3).distinct
    def score(id: Long): Double = qterms.map { w =>
      val tf = toks(id).count(_ == w).toDouble
      if (tf == 0) 0.0
      else {
        val df = toks.values.count(_.contains(w)).toDouble
        val idf = math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6) / 1e6
        idf * tf * 2.2 /
          (tf + 1.2 * (0.25 + 0.75 * toks(id).length / avgdl))
      }
    }.sum
    byQ(0L).foreach { r =>
      val want = score(r.getLong(2))
      assert(math.abs(r.getDouble(3) - want) < 1e-9,
        s"doc ${r.getLong(2)}: engine ${r.getDouble(3)} vs recompute $want")
    }
  }

  test("gopher rules: driver-side recompute, every rule non-vacuous both ways") {
    val rows = TextAnalysis.queries("x_text_gopher")(spark, sf).collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    val stop = Set("the", "a", "of", "to", "and", "in", "is")
    rows.foreach { r =>
      val w = texts(r.getLong(0)).split(" ")
      val n = w.length.toLong
      val sumlen = w.map(_.length.toLong).sum
      val nStop = w.count(stop).toLong
      val nbg = math.max(n - 1, 0L)
      val best =
        if (n < 2) 0L
        else w.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(1) == n && r.getLong(3) == nStop)
      assert(r.getDouble(2) == sumlen.toDouble / n)
      assert(r.getDouble(4) == (if (nbg > 0) best.toDouble / nbg else 0.0))
      assert(r.getBoolean(5) == (n >= 25 && n <= 90), "r_nwords")
      assert(r.getBoolean(6) == (sumlen * 10 >= n * 40 && sumlen * 10 <= n * 49), "r_wordlen")
      assert(r.getBoolean(7) == (nStop >= 2), "r_stopword")
      assert(r.getBoolean(8) == (best * 100 <= nbg * 6), "r_repetition")
      assert(r.getBoolean(9) ==
        (r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8)))
    }
    // each rule must actually discriminate on the gate corpus — a rule
    // that never fires (or always fires) is untested plumbing
    (5 to 8).foreach { i =>
      assert(rows.exists(_.getBoolean(i)) && rows.exists(!_.getBoolean(i)),
        s"rule column $i is vacuous on the gate corpus")
    }
  }

  test("ccnet scoring surfaces unseen-at-ingest languages as 'unscored', anchored at h=0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val m = TextAnalysis.ccnetFit(spark, sf)
    // a language the frozen model has never seen, plus a seen-language
    // doc as the contrast case — the streaming attributesGate scenario
    val docs = Seq(
      (900001L, "zz", "hello world from nowhere"),
      (900002L, "en", "hello world from somewhere")).toDF("doc_id", "lang", "text")
    val rows = TextAnalysis.ccnetScoreOf(docs, m).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tri"), r.getAs[Double]("h"), r.getAs[String]("bucket"))).toMap
    assert(rows.size == 2, "no doc may vanish from the scored output")
    val (nTri, h, bucket) = rows(900001L)
    // unseen language: contributions drop at the model join (matching
    // the oracle's inner-join chain) and the docs-side anchor emits the
    // row with n_tri = 0 and EXACTLY h = 0.0 (positive zero), bucketed
    // by the explicit sentinel rather than a threshold it never had
    assert(nTri == 0L && h == 0.0 &&
      java.lang.Double.doubleToRawLongBits(h) == 0L, s"anchor: $nTri, $h")
    assert(bucket == "unscored")
    assert(Set("head", "middle", "tail")(rows(900002L)._3),
      "a seen language must bucket by its thresholds")
  }

  test("attributes keep policy: a gopher-passing unscored-language doc is KEPT") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs0 = spark.read.parquet(s"$sf/documents.parquet")
    // pick a doc the gopher battery passes, re-tag it with a language
    // the frozen ccnet model never saw — the explicit keep-policy case
    val passing = TextAnalysis.gopherRules(docs0).filter(col("pass"))
      .select("doc_id").as[Long].head()
    val planted = docs0.filter(col("doc_id") === passing)
      .select(lit(900001L).as("doc_id"), lit("zz").as("lang"), col("text"))
    val docs = docs0.select("doc_id", "lang", "text").unionByName(planted)
    val train = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("label").cast("long").as("label"))
    val out = TextAnalysis.attributesOf(docs,
        TextAnalysis.nbFit(docs, train), TextAnalysis.ccnetFit(spark, sf))
      .filter(col("doc_id") === 900001L)
      .select("gopher_pass", "ppl_bucket", "keep").head()
    assert(out.getBoolean(0), "planted doc must pass gopher (chosen that way)")
    assert(out.getString(1) == "unscored")
    // the PINNED policy: unscored + gopher-pass ⇒ keep = true (a model
    // coverage gap must not silently drop a language — see attributesOf)
    assert(out.getBoolean(2), "unscored gopher-passing doc must be kept")
  }

  test("hybrid rrf: fusion recomputed driver-side from the two gated source lists") {
    import org.apache.spark.sql.functions._
    val bm = TextAnalysis.queries("x_text_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap // (qid, doc) -> rank
    val fused = TextAnalysis.queries("x_text_hybrid_rrf")(spark, sf).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val (qid, rank, doc, rrf) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val rb = Option(r.getAs[Any]("r_bm25")).map(_.asInstanceOf[Long])
      val ra = Option(r.getAs[Any]("r_ann")).map(_.asInstanceOf[Long])
      // at least one source contributed, the bm25 rank matches the
      // gated bm25 list, and the score is exactly the two-term sum
      assert(rb.isDefined || ra.isDefined)
      assert(rb.forall(v => bm.get((qid, doc)).contains(v)), s"bm25 rank drift at ($qid,$doc)")
      val expect = rb.map(v => 1.0 / (60.0 + v)).getOrElse(0.0) +
        ra.map(v => 1.0 / (60.0 + v)).getOrElse(0.0)
      assert(rrf == expect, s"rrf $rrf != $expect at ($qid,$doc)")
      assert(rank >= 1 && rank <= 10)
    }
    // fusion must be non-vacuous in BOTH directions on the gate corpus:
    // some doc carries only a lexical rank, some only a semantic one
    assert(fused.exists(r => r.isNullAt(5) && !r.isNullAt(4)), "no bm25-only row")
    assert(fused.exists(r => r.isNullAt(4) && !r.isNullAt(5)), "no ann-only row")
  }

  test("hybrid serving: persisted-index fusion == driver recompute from the two searches") {
    import org.apache.spark.sql.functions._
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("hyx_bm25_tf", "hyx_bm25_dl", "hyx_bm25_stats",
        "hyx_ivf2_coarse", "hyx_ivf2_fine", "hyx_ivf2_postings")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(warehouse, t))
    }
    TextAnalysis.writeBm25Index(spark, sf, "hyx_bm25")
    graft.queries.Similarity.writeIvf2Index(spark, sf, "hyx_ivf2")
    val queries = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), expr("slice(split(text, ' '), 1, 3)").as("terms"))
      .join(spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding")),
        Seq("qid"))
    val got = TextAnalysis.hybridSearchOf(queries, "hyx_bm25", "hyx_ivf2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bm = TextAnalysis.bm25SearchOf(queries.select("qid", "terms"), "hyx_bm25")
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val ann = graft.queries.Similarity.ivf2SearchOf(
        queries.select(col("qid").as("vec_id"), col("embedding")), "hyx_ivf2", 2, 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    // first-principles fusion over the two index search outputs
    val expect = (bm.keySet ++ ann.keySet).groupBy(_._1).toSeq.flatMap { case (qid, keys) =>
      keys.toSeq.map { k =>
        val rrf = bm.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          ann.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
        (k._2, rrf)
      }.sortBy { case (doc, rrf) => (-rrf, doc) }.take(10).zipWithIndex.map {
        case ((doc, rrf), i) => (qid, i + 1L, doc, rrf)
      }
    }.toSet
    assert(got.toSet == expect,
      s"extra=${got.toSet.diff(expect).take(5)} missing=${expect.diff(got.toSet).take(5)}")
    assert(got.nonEmpty && (bm.keySet != ann.keySet),
      "fusion must actually merge two different lists")
    for (t <- Seq("hyx_bm25_tf", "hyx_bm25_dl", "hyx_bm25_stats",
        "hyx_ivf2_coarse", "hyx_ivf2_fine", "hyx_ivf2_postings"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("bpe at depth 64: merges match the first-principles loop, checkpoint bounds the plan") {
    import org.apache.spark.sql.functions._
    val steps = 64
    val v0 = TextAnalysis.bpeVocab(spark, sf).persist()
    val (merges, finalVocab, ckpt) =
      try TextAnalysis.bpeMerges(v0, steps, checkpointEvery = 8)
      finally v0.unpersist(blocking = false)
    assert(merges.length == steps, s"corpus must support $steps merges (got ${merges.length})")
    // checkpointing contract: the final vocab's logical plan is a
    // bounded stack of replace-projections over a checkpoint LEAF —
    // depth can never exceed checkpointEvery no matter how many merges
    // ran (64 unchecked merges would stack 64 projections)
    def depth(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      if (p.children.isEmpty) 1
      else 1 + p.children.map(c => depth(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])).max
    val d = depth(finalVocab.queryExecution.logical)
    assert(d <= 8 + 1, s"plan depth $d exceeds the checkpoint bound:\n${finalVocab.queryExecution.logical}")
    // first-principles reference loop over the SAME word counts: greedy
    // highest-count pair, ties to the lexicographically smallest (a, b),
    // left-to-right non-overlapping rewrite per word
    val wc = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Map[List[String], Long] = wc
      .map { case (w, n) => w.split("").filter(_.nonEmpty).toList -> n }
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val expect = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to steps) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      expect += ((step.toLong, a, b, cnt))
      def rewrite(syms: List[String]): List[String] = syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: rewrite(rest)
        case x :: rest => x :: rewrite(rest)
        case Nil => Nil
      }
      vocab = vocab.toSeq.map { case (k, n) => rewrite(k) -> n }
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    }
    assert(merges == expect.result(),
      s"depth-$steps merge list diverges from the reference loop")
    // release the final checkpoint's blocks at the RDD level (the level
    // they actually live at — Dataset.unpersist would be a CacheManager
    // no-op here)
    ckpt.foreach(_.unpersist(blocking = false))
  }

  test("batched bpe equals sequential at depth 256, with multi-merge rounds") {
    import org.apache.spark.sql.functions._
    val steps = 256
    // the raw corpus vocabulary exhausts its merges well short of 256;
    // union shifted-alphabet copies so the corpus both SUPPORTS the
    // depth and gives rounds disjoint high-count pairs to batch — the
    // shape a real mixed-domain corpus has
    val v0 = shiftedVocab(Seq(3, 7, 13)).persist()
    val (seqM, batM) =
      try {
        val (sm, _, sc) = TextAnalysis.bpeMerges(v0, steps, checkpointEvery = 32)
        sc.foreach(_.unpersist(blocking = false))
        val (bm, _, bc) = TextAnalysis.bpeMergesBatched(v0, steps, fetchK = 64,
          checkpointEvery = 32)
        bc.foreach(_.unpersist(blocking = false))
        (sm, bm)
      } finally v0.unpersist(blocking = false)
    assert(seqM.length == steps, s"corpus must support $steps merges (got ${seqM.length})")
    assert(batM == seqM, "batched trainer diverges from the sequential loop")
  }

  /** The base vocab unioned with alphabet-rotated copies (one per
    * shift), count-summed — a synthetic mixed-domain corpus whose top
    * pairs are symbol-disjoint across copies. */
  private def shiftedVocab(shifts: Seq[Int]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val az = "abcdefghijklmnopqrstuvwxyz"
    val v0raw = TextAnalysis.bpeVocab(spark, sf)
    shifts.map(k => v0raw.select(
        translate(col("v"), az, az.drop(k) + az.take(k)).as("v"), col("n")))
      .foldLeft(v0raw)(_ unionByName _)
      .groupBy("v").agg(sum("n").as("n"))
  }

  test("batched bpe actually batches: fewer driver rounds than merges") {
    val v1 = shiftedVocab(Seq(13))
    val perRound = Seq.newBuilder[Int]
    val (b64, _, c64) = TextAnalysis.bpeMergesBatched(v1, 64, fetchK = 64,
      checkpointEvery = 32, roundHook = perRound += _)
    c64.foreach(_.unpersist(blocking = false))
    val rounds = perRound.result()
    assert(b64.length == 64)
    assert(rounds.sum == 64)
    // the acceptance rule must actually BATCH, not degenerate to the
    // sequential 1-per-round path: the two disjoint alphabets guarantee
    // symbol-disjoint top pairs, so at least one round accepts several
    assert(rounds.length < 64 && rounds.max > 1,
      s"batching degenerated to sequential: per-round acceptance $rounds")
  }

  test("batched bpe: pre-existing fused symbol closes the batch (rule 3 hazard corpus)") {
    import spark.implicits._
    // the hazard: symbol `abc` already exists (here: in v0, standing in
    // for an earlier round's ('a','bc') merge); the batch's top row
    // ('ab','c') fuses to that SAME symbol, so applying it adds 5
    // created (x, abc) occurrences to the 4 pre-existing ones = 9 > 7 —
    // the true sequential run merges (x, abc) BEFORE (d, e), while a
    // rule-1/2-only prefix accepts ('ab','c') and ('d','e') together
    // (ceiling 5 < 7 passes the strict trim) and silently diverges
    val v0 = Seq(
      ("<x><ab><c>", 5L), ("<ab><c>", 4L), ("<x><abc>", 4L), ("<d><e>", 7L)
    ).toDF("v", "n").persist()
    try {
      val (seqM, _, sc) = TextAnalysis.bpeMerges(v0, 3)
      sc.foreach(_.unpersist(blocking = false))
      val (batM, _, bc) = TextAnalysis.bpeMergesBatched(v0, 3, fetchK = 6)
      bc.foreach(_.unpersist(blocking = false))
      // non-vacuous: the corpus really exhibits the created+pre-existing
      // count (9 = 4 pre + 5 created), out-ranking the (d, e) 7
      assert(seqM == Seq((1L, "ab", "c", 9L), (2L, "x", "abc", 9L), (3L, "d", "e", 7L)),
        s"hazard corpus lost its shape: $seqM")
      assert(batM == seqM, s"rule-3 divergence: batched $batM vs sequential $seqM")
    } finally v0.unpersist(blocking = false)
  }

  test("batched bpe: IN-BATCH fusion duplicate closes the batch (rule 3, same-round hazard)") {
    import spark.implicits._
    // the same-round half of the rule-3 hazard: TWO rows of ONE batch
    // fuse to the same novel symbol — ('a','bc') then ('ab','c') →
    // 'abc'. `known` cannot catch it (the symbol is created mid-batch),
    // and rules 1-2 accept both: their created (x, abc) pairs stack
    // (4 pre-splits + 5 = 9), out-ranking the also-accepted (d, e) 8 —
    // the sequential 3rd merge is (x, abc, 9), a rules-1-2+known
    // prefix emits (d, e, 8). The dup check captured before inserting
    // the row's own symbols closes the batch after ('ab','c').
    val v0 = Seq(
      ("<x><a><bc>", 5L), ("<a><bc>", 5L), ("<x><ab><c>", 4L),
      ("<ab><c>", 5L), ("<d><e>", 8L)
    ).toDF("v", "n").persist()
    try {
      val (seqM, _, sc) = TextAnalysis.bpeMerges(v0, 3)
      sc.foreach(_.unpersist(blocking = false))
      val (batM, _, bc) = TextAnalysis.bpeMergesBatched(v0, 3, fetchK = 6)
      bc.foreach(_.unpersist(blocking = false))
      // non-vacuous: the divergence this corpus manufactures is real —
      // sequential's 3rd merge is the stacked (x, abc, 9) over (d, e, 8)
      assert(seqM == Seq((1L, "a", "bc", 10L), (2L, "ab", "c", 9L), (3L, "x", "abc", 9L)),
        s"hazard corpus lost its shape: $seqM")
      assert(batM == seqM, s"in-batch dup divergence: batched $batM vs sequential $seqM")
    } finally v0.unpersist(blocking = false)
  }

  test("batched bpe acceptance rule: property-equal to greedy over 400 mid-state corpora") {
    // pure driver-side simulation of the EXACT algorithm pair —
    // reference greedy vs the batched loop built on the production
    // bpeAcceptPrefix — over corpora whose symbol sets contain composite
    // symbols with overlapping spellings (ab/bc/abc/bca/ca), the shape
    // that manufactures rule-3 collisions randomized testing over raw
    // characters almost never hits
    type Word = Vector[String]
    def pairCounts(v: Map[Word, Long]): Map[(String, String), Long] =
      v.toSeq.flatMap { case (w, n) =>
        w.zip(w.tail).map(p => p -> n)
      }.groupMapReduce(_._1)(_._2)(_ + _)
    def applyMerge(v: Map[Word, Long], a: String, b: String): Map[Word, Long] =
      v.toSeq.map { case (w, n) =>
        val r = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          if (i < w.length - 1 && w(i) == a && w(i + 1) == b) { r += (a + b); i += 2 }
          else { r += w(i); i += 1 }
        }
        (r.result(), n)
      }.groupMapReduce(_._1)(_._2)(_ + _)
    def sortedRows(v: Map[Word, Long]): Array[(String, String, Long)] =
      pairCounts(v).toArray.map { case ((a, b), c) => (a, b, c) }
        .sortBy { case (a, b, c) => (-c, a, b) }
    def greedy(v0: Map[Word, Long], steps: Int): Seq[(String, String, Long)] = {
      var v = v0
      val out = Seq.newBuilder[(String, String, Long)]
      var k = 0
      var done = false
      while (k < steps && !done) {
        val rows = sortedRows(v)
        if (rows.isEmpty) done = true
        else {
          val (a, b, c) = rows.head
          out += ((a, b, c)); v = applyMerge(v, a, b); k += 1
        }
      }
      out.result()
    }
    def batched(v0: Map[Word, Long], steps: Int, fetchK: Int): Seq[(String, String, Long)] = {
      var v = v0
      val known = scala.collection.mutable.Set.empty[String]
      v0.keysIterator.foreach(w => known ++= w)
      val out = Seq.newBuilder[(String, String, Long)]
      var done = 0
      var exhausted = false
      while (done < steps && !exhausted) {
        val rows = sortedRows(v).take(fetchK)
        if (rows.isEmpty) exhausted = true
        else {
          val p = TextAnalysis.bpeAcceptPrefix(rows, fetchK, known)
          val accept = rows.take(math.min(p, steps - done))
          accept.foreach { case (a, b, c) =>
            out += ((a, b, c)); known += (a + b); v = applyMerge(v, a, b)
          }
          done += accept.length
        }
      }
      out.result()
    }
    val syms = Vector("a", "b", "c", "ab", "bc", "abc", "x", "d", "e", "bca", "ca")
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 400) {
      val v0 = (1 to (3 + rnd.nextInt(7))).map { _ =>
        Vector.fill(1 + rnd.nextInt(6))(syms(rnd.nextInt(syms.length)))
      }.groupMapReduce(identity)(_ => 1L + rnd.nextInt(9))(_ + _)
      val g = greedy(v0, 15)
      val b = batched(v0, 15, fetchK = 6)
      assert(b == g, s"trial $trial diverged on $v0:\n greedy  $g\n batched $b")
    }
    // collision-dense second pass: only the a/b/c spelling family, so
    // two rows of one batch fusing to the SAME composite ('a','bc' and
    // 'ab','c' → 'abc') happen routinely — the same-round rule-3 case
    // the broad-alphabet pass above almost never manufactures
    val dense = Vector("a", "b", "c", "ab", "bc", "ca", "abc")
    for (trial <- 1 to 200) {
      val v0 = (1 to (3 + rnd.nextInt(7))).map { _ =>
        Vector.fill(1 + rnd.nextInt(5))(dense(rnd.nextInt(dense.length)))
      }.groupMapReduce(identity)(_ => 1L + rnd.nextInt(9))(_ + _)
      val g = greedy(v0, 15)
      val b = batched(v0, 15, fetchK = 6)
      assert(b == g, s"dense trial $trial diverged on $v0:\n greedy  $g\n batched $b")
    }
  }

  test("gopher repetition battery: every share/fraction driver-recomputed bit-exact") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.queries("x_text_gopher_rep")(spark, sf).collect()
    val docs = graft.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    val tops = Seq(2, 3, 4); val dups = Seq(5, 6, 7, 8, 9, 10)
    // independent recompute: counts via groupBy, coverage via a plain
    // boolean position array (the engine uses folds and interval unions)
    def topMass(ws: Array[String], n: Int): Long = {
      if (ws.length < n) return 0L
      val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
      val (g, cnt) = grams.groupBy(identity).view.mapValues(_.size)
        .toSeq.minBy { case (g, c) => (-c, g) }
      cnt.toLong * (g.length - (n - 1))
    }
    def dupChars(ws: Array[String], n: Int): Long = {
      if (ws.length < n) return 0L
      val grams = ws.sliding(n).map(_.mkString(" ")).toArray
      val dup = grams.groupBy(identity).filter(_._2.length >= 2).keySet
      val covered = Array.fill(ws.length)(false)
      for (i <- grams.indices if dup(grams(i)); j <- i until (i + n))
        covered(j) = true
      ws.indices.filter(covered).map(j => ws(j).length.toLong).sum
    }
    out.foreach { r =>
      val id = r.getLong(0)
      val ws = docs(id).split(" ", -1)
      val total = ws.map(_.length.toLong).sum
      def share(mass: Long): Double =
        if (total == 0) 0.0 else mass.toDouble / total.toDouble
      var expectPass = true
      tops.foreach { n =>
        val mass = topMass(ws, n)
        val cap = TextAnalysis.GopherTopCaps(n)
        assert(r.getAs[Double](s"top${n}_share") == share(mass),
          s"doc $id: top$n share diverges")
        val rule = mass * 100 <= total * cap
        assert(r.getAs[Boolean](s"r_top$n") == rule, s"doc $id: r_top$n")
        expectPass &&= rule
      }
      dups.foreach { n =>
        val dc = dupChars(ws, n)
        val cap = TextAnalysis.GopherDupCaps(n)
        assert(r.getAs[Double](s"dup${n}_frac") == share(dc),
          s"doc $id: dup$n fraction diverges")
        val rule = dc * 100 <= total * cap
        assert(r.getAs[Boolean](s"r_dup$n") == rule, s"doc $id: r_dup$n")
        expectPass &&= rule
      }
      assert(r.getAs[Boolean]("pass") == expectPass, s"doc $id: pass verdict")
    }
  }

  test("gopher repetition battery: crafted repetitive docs trip each rule class") {
    import spark.implicits._
    // doc 1: one dominant bigram (top-share trip); doc 2: a verbatim
    // repeated 10-word run (dup-coverage trip, overlapping occurrences
    // must not double-count); doc 3: clean prose-like filler (passes)
    val crafted = Seq(
      (1L, Array.fill(30)("click here").mkString(" ")),
      (2L, (("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3) +
        (1 to 40).map(i => s"w$i").mkString(" ")).trim),
      (3L, (1 to 60).map(i => s"word$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.gopherRepetition(crafted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows(1L).getAs[Boolean]("r_top2") && !rows(1L).getAs[Boolean]("pass"),
      "a dominant bigram must trip the top-2-gram share cap")
    Seq(5, 6, 7, 8, 9, 10).foreach { n =>
      assert(!rows(2L).getAs[Boolean](s"r_dup$n"),
        s"a verbatim repeated run must trip the dup-$n-gram coverage cap")
    }
    // coverage is a UNION: the 30 repeated words of doc 2 bound the
    // covered mass regardless of how many n-gram occurrences overlap
    val ws2 = rows(2L)
    val repChars = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      .split(" ").map(_.length).sum * 3
    val totChars = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
      .split(" ").map(_.length).sum * 3) +
      (1 to 40).map(i => s"w$i".length).sum
    assert(ws2.getAs[Double]("dup5_frac") <= repChars.toDouble / totChars + 1e-9,
      "dup coverage exceeds the repeated-run mass — double counting")
    assert(rows(3L).getAs[Boolean]("pass"), "clean filler must pass the battery")
  }
}
