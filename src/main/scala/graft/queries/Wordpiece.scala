package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer family — the THIRD subword family next to BPE
  * (frequency-scored merges, `TextAnalysis`) and unigram-LM
  * (probabilistic segmentation, `Unigram`), completing the set a
  * tokenizer-selection study actually compares (Schuster & Nakajima
  * 2012; the BERT-family default). Two published differences from BPE,
  * both implemented for real:
  *
  *   1. TRAINING scores a candidate merge by LIKELIHOOD GAIN, not raw
  *      frequency: score(a, b) = count(ab) / (count(a) · count(b)) — a
  *      pair merges when its parts co-occur more than their independent
  *      frequencies predict. Mechanically the merge loop reuses the
  *      delimiter-encoded vocabulary-chain discipline of the BPE
  *      trainer (one corpus scan into a cached word-count vocab, one
  *      pair-count partial aggregate + one symbol-count partial
  *      aggregate per step, a one-row driver argmax — the sequential
  *      round-trips ARE the algorithm), and the symbol universe carries
  *      the CONTINUATION MARKING (`##`) real WordPiece trains with:
  *      word-initial characters seed unmarked, all others `##`-marked,
  *      and a merge (a, ##y) fuses to `a`+`y` keeping the left part's
  *      marking.
  *   2. SERVING is greedy longest-match-first ("maximal munch") against
  *      the trained vocabulary — NOT a replay of the merge history: at
  *      each position the longest vocabulary piece (with `##` for
  *      non-initial positions) is taken, and a position with NO match
  *      maps the WHOLE word to `[UNK]` (id -1) — the real WordPiece
  *      unk semantics, different from BPE's per-symbol -1.
  *
  * Scale shape: training is vocabulary-sized after the one corpus scan;
  * serving segments DISTINCT words once (candidate substrings bounded
  * by [[MaxPieceLen]] join the broadcast vocabulary key-equi, the
  * greedy walk is an in-row fold over the per-word longest-match-per-
  * position array) and documents re-join their words key-equi — the
  * Unigram.tokenizeOf shape, corpus-linear with zero wide operators
  * beyond the word rollup. Everything is engine-portable: scores are
  * single fixed-order double operations over exact int64 counts, so
  * the DuckDB oracle replays training AND the greedy walk bit-for-bit.
  */
object Wordpiece {

  /** Merge steps the gate trains (the BPE gate's 3 — the fertility
    * comparison is at equal merge budget). */
  private[graft] val Steps = 3

  /** Candidate piece length bound for serving: a K-merge piece spans at
    * most 2^K characters (each merge concatenates two pieces), so the
    * greedy matcher need never probe longer substrings. Interpolated
    * into the oracle so both engines enumerate identical candidates. */
  private[graft] val MaxPieceLen = 1 << Steps

  /** Continuation-marked, delimiter-encoded vocabulary over distinct
    * words: "abc" → `<a><##b><##c>` with the word's corpus count. One
    * corpus scan, vocabulary-sized output — shared by training and the
    * fit. */
  private[graft] def wpVocabOf(words: DataFrame): DataFrame =
    // empty words (consecutive/leading/trailing spaces) are dropped on
    // BOTH engine and oracle sides: Spark's sequence(1, 0) yields the
    // DESCENDING [1, 0] (a phantom '<><##>' chain) while DuckDB's
    // generate_series(1, 0) is empty — filtered, the engines count
    // identical pairs on any corpus
    words.filter(length(col("w")) > 0).select(expr(
      """concat_ws('', transform(sequence(1, length(w)), i ->
        |  IF(i = 1, concat('<', substring(w, i, 1), '>'),
        |            concat('<##', substring(w, i, 1), '>'))))""".stripMargin).as("v"),
      col("n"))

  private def wpVocab(s: SparkSession, d: String): DataFrame =
    wpVocabOf(table(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n")))

  /** Adjacent-pair counts over the marked chain — identical mechanics
    * to the BPE pair pass (the RHS of every adjacent pair is a
    * non-initial symbol, hence always `##`-marked). */
  private def wpPairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("n"), expr("split(substring(v, 2, length(v) - 2), '><')").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
      .groupBy("p.a", "p.b").agg(sum("n").as("cnt"))

  /** Per-symbol occurrence counts (the score's denominator terms). */
  private def wpSymCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("n"), explode(expr("split(substring(v, 2, length(v) - 2), '><')")).as("t"))
      .groupBy("t").agg(sum("n").as("c"))

  /** The likelihood score as ONE fixed-order double chain —
    * cnt / (ca · cb) with each count cast to double first (overflow-
    * safe at any corpus size, bit-identical across engines). */
  private def scoreCol: Column =
    col("cnt").cast("double") / (col("ca").cast("double") * col("cb").cast("double"))

  /** The trained merge list (step, a, b, cnt, ca, cb, score) over a
    * vocab relation the caller persists. Each step: pair + symbol
    * partial aggregates, a one-row argmax by (score DESC, a, b), and a
    * chain rewrite fusing `a`+`b`-without-`##`. Stops early when no
    * pair remains.
    *
    * Depth discipline: like the BPE loop, every step stacks a replace
    * projection, so `checkpointEvery` bounds plan depth via the shared
    * [[TextAnalysis.checkpointVocab]] (materialize + truncate lineage,
    * eagerly releasing the previous checkpoint). Unlike BPE there is NO
    * batched variant: the likelihood score's denominators are GLOBAL
    * symbol counts, so every merge perturbs every score sharing a
    * symbol — the prefix-acceptance proof (bpeAcceptPrefix) does not
    * transfer, and deep WordPiece vocabs train through this sequential
    * checkpointed loop by design (stated bound). */
  private[graft] def wpMerges(v0: DataFrame, steps: Int,
      checkpointEvery: Int = 16,
      stepHook: (Int, Double) => Unit = (_, _) => ()):
      Seq[(Long, String, String, Long, Long, Long, Double)] = {
    var vocab = v0
    var prevCkpt: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
    val merges = Seq.newBuilder[(Long, String, String, Long, Long, Long, Double)]
    var exhausted = false
    for (step <- 1 to steps if !exhausted) {
      val tStep = System.nanoTime()
      val syms = wpSymCounts(vocab)
      val top = wpPairCounts(vocab)
        .join(syms.select(col("t").as("a"), col("c").as("ca")), Seq("a"))
        .join(syms.select(col("t").as("b"), col("c").as("cb")), Seq("b"))
        .withColumn("score", scoreCol)
        .orderBy(col("score").desc, col("a"), col("b")).limit(1)
        .select("a", "b", "cnt", "ca", "cb", "score").collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (a, b) = (r.getString(0), r.getString(1))
        merges += ((step.toLong, a, b, r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))
        val fused = a + b.stripPrefix("##")
        vocab = vocab.select(expr(s"replace(v, '<$a><$b>', '<$fused>')").as("v"), col("n"))
        if (step % checkpointEvery == 0) {
          val (ckpt, rdd) = TextAnalysis.checkpointVocab(vocab)
          prevCkpt.foreach(_.unpersist(blocking = false))
          prevCkpt = Some(rdd)
          vocab = ckpt
        }
      }
      stepHook(step, (System.nanoTime() - tStep) / 1e9)
    }
    prevCkpt.foreach(_.unpersist(blocking = false))
    merges.result()
  }

  /** Trained-model memo per (session, corpus dir) — the Unigram
    * fittedModel contract verbatim: a tokenizer trains once and serves
    * many times, so the serving entries must not re-run the merge loop
    * per query. The model is the final chain's vocabulary with counts
    * and frequency-ordered ids — driver-local, vocabulary-sized. */
  private val fittedModel = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  /** Drop the memoized model for (session, corpus dir) — call after the
    * corpus at `d` is rewritten in place; the next apply re-trains. */
  def invalidateWordpieceModel(s: SparkSession, d: String): Unit = {
    val inner = fittedModel.get(s)
    if (inner != null) { inner.remove(d); () }
  }

  /** The frozen model (token, cnt, id): train [[Steps]] merges, apply
    * the chain to the vocabulary, count final symbols, assign ids by
    * (cnt DESC, token) — the BpeModel.ids rule. Memoized. */
  private[graft] def wordpieceFit(s: SparkSession, d: String): DataFrame = {
    fittedModel.keySet.removeIf(sess => sess.sparkContext.isStopped)
    val perSession = fittedModel.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    val cached = perSession.get(d)
    if (cached != null) cached
    else {
      import org.apache.spark.sql.expressions.Window
      val v0 = wpVocab(s, d).persist()
      val merges = try wpMerges(v0, Steps) finally v0.unpersist(blocking = false)
      val applied = merges.foldLeft(wpVocab(s, d)) { case (v, (_, a, b, _, _, _, _)) =>
        val fused = a + b.stripPrefix("##")
        v.select(expr(s"replace(v, '<$a><$b>', '<$fused>')").as("v"), col("n"))
      }
      val m = applied
        .select(col("n"), explode(expr("split(substring(v, 2, length(v) - 2), '><')")).as("token"))
        .groupBy("token").agg(sum("n").as("cnt"))
        .withColumn("id",
          row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("long") - 1L)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      m.collect().foreach(rows.add)
      val built = s.createDataFrame(rows, m.schema)
      val prev = perSession.putIfAbsent(d, built)
      if (prev != null) prev else built
    }
  }

  /** The frozen model as a driver-side token→id map — what the serving
    * expression carries; vocabulary-sized (pieces ≤ chars + merges, the
    * TRAINING budget, never the corpus).
    *
    * The `##` continuation marker is only unambiguous when the corpus
    * alphabet excludes '#': a corpus '#' could train a word-initial
    * token that itself starts with "##", which the serving bifurcation
    * would misclassify as continuation-only. Asserted here — zero extra
    * corpus scans (the model is already driver-side), and the loud
    * failure names the fix (re-map '#' upstream) instead of silently
    * diverging from the oracle. A '#' anywhere AFTER the marker strip
    * is exactly the corpus-alphabet violation. */
  private def vocabMap(model: DataFrame): Map[String, Long] = {
    val m = model.select("token", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bad = m.keysIterator.filter(t => t.stripPrefix("##").contains('#')).toSeq
    require(bad.isEmpty, "WordPiece '##' continuation marker is ambiguous: corpus " +
      s"alphabet must exclude '#' but the trained vocabulary contains ${bad.mkString(", ")}")
    m
  }

  /** Tokenize any (doc_id, text) relation against a frozen model
    * relation ((token, cnt, id) — [[wordpieceFit]]'s shape, fresh or
    * read back from a [[writeWordpieceModel]] table). Output shape
    * matches TextAnalysis.tokenizeOf / Unigram.tokenizeOf:
    * (doc_id, n_tokens, ids_str); an unmatchable position fails the
    * WHOLE word to [UNK] → -1. Pure per-doc function of (doc, model) —
    * the streaming twin relies on it.
    *
    * Scale shape: ONE narrow map over the corpus — the whole greedy
    * walk lives inside [[graft.functions.WordpieceTokenize]] with the
    * vocabulary as O(1) hash maps, so serving has ZERO shuffles at any
    * corpus size. The relational alternatives are measured dead ends
    * (see the expression's scaladoc and the tokenize_serve ScaleBench
    * row: 16-18 GB spill / OOM for the join-gather shapes). */
  private[graft] def tokenizeOf(docs: DataFrame, model: DataFrame): DataFrame = {
    val ids = graft.functions.WordpieceTokenize.of(
      col("text"), vocabMap(model), MaxPieceLen)
    docs.select(col("doc_id"), ids.as("ids"))
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_tokens"),
        expr("array_join(transform(ids, i -> CAST(i AS STRING)), ' ')").as("ids_str"))
  }

  /** Persist the trained model as a plain parquet table — the frozen
    * tokenizer artifact a serving fleet loads by name
    * (`tokenizeOf(docs, spark.table(name))`); vocabulary-sized, no
    * bucketing — it broadcasts wherever it is applied. */
  def writeWordpieceModel(s: SparkSession, d: String, tableName: String): Unit = {
    graft.Engine.reclaimManagedTable(s, tableName)
    wordpieceFit(s, d).write.mode("overwrite").format("parquet").saveAsTable(tableName)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- the trainer, hash-gated end-to-end: every step's winning pair
    //    with its count, both part counts and the likelihood score —
    //    the oracle recomputes all three aggregates and the argmax per
    //    step, so a frequency-scored (BPE) argmax cannot pass.
    "x_text_wordpiece_train" -> ((s, d) => {
      import s.implicits._
      val v0 = wpVocab(s, d).persist()
      try wpMerges(v0, Steps).toDF("step", "a", "b", "cnt", "ca", "cb", "score")
        .orderBy("step")
      finally v0.unpersist(blocking = false)
    }),

    // -- the serving last-mile: per-doc input ids under the FROZEN
    //    model via greedy longest-match — the wordpiece twin of
    //    x_text_tokenize_ids / x_text_unigram_ids (same output shape,
    //    same frequency-ordered id rule; the unk convention is the
    //    REAL WordPiece one: an unmatchable position fails the whole
    //    word to [UNK] → -1).
    "x_text_wordpiece_ids" -> ((s, d) =>
      tokenizeOf(
        table(s, d, "documents").filter(col("doc_id") < 100).select("doc_id", "text"),
        wordpieceFit(s, d)).orderBy("doc_id")),

    // -- tokenizer-family fertility: per-language tokens/word under the
    //    trained wordpiece NEXT TO the 3-step BPE model — the
    //    commensurability row for choosing a family at equal merge
    //    budget (the x_text_unigram_fertility pattern, third family).
    "x_text_wordpiece_fertility" -> ((s, d) => {
      // per-word token counts via the serving expression itself (a
      // word is a one-word document), over the vocabulary-sized
      // distinct (lang, w) rollup — no per-occurrence re-tokenization
      val ntok = size(graft.functions.WordpieceTokenize.of(
        col("w"), vocabMap(wordpieceFit(s, d)), MaxPieceLen)).cast("long")
      val lw = table(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("n"))
      val wp = lw.withColumn("ntok", ntok)
        .groupBy("lang")
        .agg(sum("n").as("words"), sum(col("n") * col("ntok")).as("tokens_wordpiece"))
        .select(col("lang"), col("words"), col("tokens_wordpiece"),
          (col("tokens_wordpiece").cast("double") / col("words").cast("double"))
            .as("fertility_wordpiece"))
      val bpe = TextAnalysis.bpeFertilityOf(s, d, steps = 3)
        .select(col("lang"), col("tokens").as("tokens_bpe"),
          col("fertility").as("fertility_bpe"))
      wp.join(bpe, Seq("lang"))
        .select("lang", "words", "tokens_wordpiece", "fertility_wordpiece",
          "tokens_bpe", "fertility_bpe")
        .orderBy("lang")
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracle — the same algorithm in relational form. Training is
  // the BPE oracle's vocabulary-chain pattern plus a symbol-count CTE
  // and the likelihood argmax; the greedy walk is a recursive CTE
  // (state = cursor position per word) against the longest-match-per-
  // start relation — no list_reduce (the Unigram notes on DuckDB-1.0).
  // ------------------------------------------------------------------

  /** Marked-vocab seed + one (pair, symbol, best, rewrite) block per
    * step, CTE names wp_*. */
  private def wpChainSql: String = {
    def stepSql(i: Int) =
      s"""wp_p$i AS (SELECT u.a AS a, u.b AS b, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |  SELECT n, unnest(list_transform(generate_series(1, len(s) - 1),
         |           i -> {'a': s[i], 'b': s[i+1]})) AS u
         |  FROM (SELECT string_split(substr(v, 2, length(v) - 2), '><') AS s, n
         |        FROM wp_v${i - 1}))
         |  GROUP BY u.a, u.b),
         |wp_s$i AS (SELECT t, CAST(sum(n) AS BIGINT) AS c FROM (
         |  SELECT n, unnest(string_split(substr(v, 2, length(v) - 2), '><')) AS t
         |  FROM wp_v${i - 1}) GROUP BY t),
         |wp_b$i AS (SELECT p.a, p.b, p.cnt, sa.c AS ca, sb.c AS cb,
         |    CAST(p.cnt AS DOUBLE) / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)) AS score
         |  FROM wp_p$i p JOIN wp_s$i sa ON sa.t = p.a JOIN wp_s$i sb ON sb.t = p.b
         |  ORDER BY score DESC, p.a, p.b LIMIT 1),
         |wp_v$i AS (SELECT CASE WHEN b.a IS NULL THEN v
         |                  ELSE replace(v, '<' || b.a || '><' || b.b || '>',
         |                               '<' || b.a || substr(b.b, 3) || '>') END AS v, n
         |       FROM wp_v${i - 1} LEFT JOIN wp_b$i b ON TRUE)""".stripMargin
    s"""wp_t AS (SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |wp_v0 AS (SELECT array_to_string(list_transform(generate_series(1, length(w)),
       |               i -> CASE WHEN i = 1 THEN '<' || substr(w, i, 1) || '>'
       |                         ELSE '<##' || substr(w, i, 1) || '>' END), '') AS v, n
       |  FROM wp_t),
       |${(1 to Steps).map(stepSql).mkString(",\n")}""".stripMargin
  }

  /** Final-vocab ids + the greedy walk over distinct words (recursive
    * CTE) + per-doc reassembly inputs. `docWhere` scopes the corpus the
    * serving side reads. */
  private def wpServeSql(docWhere: String): String =
    s"""wp_vocab AS MATERIALIZED (SELECT token, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |  SELECT n, unnest(string_split(substr(v, 2, length(v) - 2), '><')) AS token
       |  FROM wp_v$Steps) GROUP BY token),
       |wp_ids AS MATERIALIZED (SELECT token,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, token) - 1 AS BIGINT) AS id
       |  FROM wp_vocab),
       |wp_words AS MATERIALIZED (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
       |  FROM documents$docWhere),
       |wp_cand AS MATERIALIZED (SELECT w, s, max(l) AS l FROM (
       |  SELECT c.w, c.i AS s, c.l,
       |    CASE WHEN c.i = 1 THEN substr(c.w, c.i, c.l)
       |         ELSE '##' || substr(c.w, c.i, c.l) END AS piece
       |  FROM (SELECT w, i, l FROM wp_words,
       |          unnest(generate_series(1, length(w))) AS a(i),
       |          unnest(generate_series(1, $MaxPieceLen)) AS b(l)
       |        WHERE i + l - 1 <= length(w)) c) c
       |  JOIN wp_vocab v ON v.token = c.piece
       |  GROUP BY w, s),
       |wp_walk AS (
       |  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS ts FROM wp_words
       |  UNION ALL
       |  SELECT s.w,
       |    CASE WHEN c.l IS NULL THEN length(s.w) + 1 ELSE s.pos + c.l END AS pos,
       |    CASE WHEN c.l IS NULL THEN ['[UNK]']
       |         ELSE list_append(s.ts,
       |           CASE WHEN s.pos = 1 THEN substr(s.w, s.pos, c.l)
       |                ELSE '##' || substr(s.w, s.pos, c.l) END) END AS ts
       |  FROM wp_walk s LEFT JOIN wp_cand c ON c.w = s.w AND c.s = s.pos
       |  WHERE s.pos <= length(s.w)),
       |wp_sg AS MATERIALIZED (SELECT w, ts FROM wp_walk WHERE pos > length(w))""".stripMargin

  val oracle: Map[String, String] = Map(
    "x_text_wordpiece_train" ->
      s"""WITH $wpChainSql
         |${(1 to Steps).map(i =>
            s"SELECT CAST($i AS BIGINT) AS step, a, b, cnt, ca, cb, score FROM wp_b$i")
            .mkString("", "\nUNION ALL\n", "")}
         |ORDER BY step""".stripMargin,

    "x_text_wordpiece_ids" ->
      s"""WITH RECURSIVE $wpChainSql,
         |${wpServeSql(" WHERE doc_id < 100")},
         |wp_docw AS (SELECT doc_id, i AS pos, ws[i] AS w FROM
         |  (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |   WHERE doc_id < 100), unnest(generate_series(1, len(ws))) AS u(i)),
         |wp_dtok AS (SELECT doc_id, pos, x.j AS j, x.token AS token FROM (
         |  SELECT d.doc_id, d.pos, unnest(list_transform(generate_series(1, len(sg.ts)),
         |           j -> {'j': j, 'token': sg.ts[j]})) AS x
         |  FROM wp_docw d JOIN wp_sg sg ON sg.w = d.w)),
         |wp_did AS (SELECT doc_id,
         |          list(CAST(coalesce(i.id, -1) AS VARCHAR) ORDER BY pos, j) AS ids
         |        FROM wp_dtok LEFT JOIN wp_ids i ON i.token = wp_dtok.token
         |        GROUP BY doc_id)
         |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
         |       array_to_string(ids, ' ') AS ids_str
         |FROM wp_did ORDER BY doc_id""".stripMargin,

    "x_text_wordpiece_fertility" ->
      s"""WITH RECURSIVE $wpChainSql,
         |${wpServeSql("")},
         |wp_lw AS MATERIALIZED (SELECT lang, w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY lang, w),
         |wp_fert AS MATERIALIZED (SELECT lang, CAST(sum(lw.n) AS BIGINT) AS words,
         |    CAST(sum(lw.n * len(sg.ts)) AS BIGINT) AS tokens_wordpiece
         |  FROM wp_lw lw JOIN wp_sg sg ON lw.w = sg.w GROUP BY lang),
         |${TextAnalysis.bpeFertilityCtes}
         |SELECT f.lang, f.words, f.tokens_wordpiece,
         |  CAST(f.tokens_wordpiece AS DOUBLE) / CAST(f.words AS DOUBLE)
         |    AS fertility_wordpiece,
         |  bpe.tokens AS tokens_bpe, bpe.fertility AS fertility_bpe
         |FROM wp_fert f JOIN bpe_fert bpe ON f.lang = bpe.lang
         |ORDER BY f.lang""".stripMargin
  )
}
