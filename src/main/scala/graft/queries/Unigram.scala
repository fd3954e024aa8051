package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (SentencePiece-style Viterbi-EM) — the
  * standard scalable alternative to BPE. BPE_DEPTH_r14 measured exact
  * batched BPE as honestly sequential at depth (~1.6 merges/s: each
  * merge's counts depend on the previous rewrite); unigram-LM has no
  * such chain — the vocabulary is FIXED after seeding and each EM
  * iteration is one corpus-shaped pass: E-step = per-word Viterbi
  * segmentation (a bounded in-row fold, the tokenizeOf shape), M-step =
  * one partial-aggregatable count pass. A 32k-piece vocabulary trains in
  * a constant number of passes regardless of vocab size.
  *
  * Algorithm (stated exactly — the DuckDB oracle replays it verbatim):
  *  1. Seed: all single characters plus the top-[[TopK]] substrings of
  *     length 2..[[MaxLen]] ranked by (occurrence-count·word-freq DESC,
  *     piece ASC). The vocabulary is FIXED from here on.
  *  2. Probabilities: lp(u) = lnq((c(u)+1) / (tot+V)) — Laplace-smoothed
  *     (single chars survive zero-count iterations, so every word always
  *     segments), floor-quantized at 1e-6 (the NB/CCNet lnq portability
  *     pattern: both engines consume identical doubles, so cross-engine
  *     float drift cannot compound across iterations).
  *  3. [[Iters]]× hard-EM: E-step Viterbi-segments each DISTINCT word
  *     under the current lp (DP over end positions; candidate pieces are
  *     the ≤[[MaxLen]]-char suffixes at each position; ties break to the
  *     SHORTEST piece — order-independent and engine-exact since scores
  *     are sums of identical quantized doubles accumulated left-to-
  *     right); M-step recounts pieces from the chosen segmentations
  *     weighted by word frequency and re-smooths.
  *
  * Scale shape: the model relation (vocab counts/probs, ≤ chars+TopK
  * rows) broadcasts; each E-step is explode(distinct words × ≤MaxLen·len
  * substrings) → broadcast join → one groupBy(w) collect into a bounded
  * per-word edge array → in-row DP — one shuffle per iteration, on the
  * distinct-word key. Nothing corpus-scale ever sits on the driver. A
  * production fit over 100 TB would persist the distinct-word relation
  * across the fixed iteration count (here it is re-derived: the gate
  * corpus scan is cheaper than managing cache lifetime inside a query
  * that must stay a pure function of (session, dir)).
  */
object Unigram {

  private val MaxLen = 4
  private val TopK = 200
  private val Iters = 2

  private def lnq(x: Column): Column =
    floor(log(x) * lit(1000000.0)) / lit(1000000.0)

  /** Distinct corpus words with frequencies — the E-step's unit of work
    * (a word's segmentation is a pure function of (word, model)). */
  private[queries] def wordCounts(s: SparkSession, d: String): DataFrame =
    // empty words are dropped on BOTH engine and oracle sides: Spark's
    // sequence(1, 0) yields the DESCENDING [1, 0] (phantom substring
    // rows in occs) while DuckDB's generate_series(1, 0) is empty
    table(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Every substring occurrence (w, n, i, l, piece), l ≤ MaxLen. */
  private def occs(words: DataFrame): DataFrame =
    words.select(col("w"), col("n"), explode(expr(
      s"""flatten(transform(sequence(1, length(w)), i ->
         |  transform(sequence(1, least($MaxLen, length(w) - i + 1)),
         |    l -> named_struct('i', i, 'l', l))))""".stripMargin)).as("o"))
      .select(col("w"), col("n"), col("o.i").as("i"), col("o.l").as("l"),
        expr("substring(w, o.i, o.l)").as("piece"))

  /** The fixed seed vocabulary with its substring-occurrence counts:
    * all single chars + top-K multi-char by (count DESC, piece ASC). */
  private[queries] def seedVocab(words: DataFrame): DataFrame = {
    val c = occs(words).groupBy("piece").agg(sum("n").as("c"))
    c.filter(length(col("piece")) === 1)
      .unionByName(c.filter(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece")).limit(TopK))
  }

  /** (piece, c, lp) — Laplace-smoothed quantized log-probs over counts
    * that already cover the FULL vocabulary (zeros included).
    *
    * tot and V come from GLOBAL WINDOW aggregates over the counts
    * relation itself, not from a crossJoin(broadcast(counts.agg(...))):
    * the broadcast form puts the counts subtree — which carries the
    * entire upstream segmentation chain — into the plan TWICE per EM
    * iteration, and the duplication compounds across iterations (the
    * final fit evaluated the iteration-1 Viterbi pass 4× — measured
    * 25 s to materialize the sf0.1 fit, ~6 s once single-evaluated).
    * The window spec is partition-less, but its input is the
    * vocabulary-sized counts relation (≤ chars + TopK rows), so the
    * one-partition window is bounded at any corpus scale. Arithmetic is
    * unchanged: double sums over integer counts are order-exact below
    * 2^53, so both engines still consume identical quantized lp. */
  private[queries] def probsOf(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    counts.select(col("piece"), col("c"),
      lnq((col("c").cast("double") + lit(1.0)) /
        (sum(col("c").cast("double")).over(w) +
          count(lit(1)).over(w).cast("double"))).as("lp"))
  }

  /** One candidate's score at end position p against a dp array named
    * `$dp`: dp[p-l] + lp(piece of length l ending at p), NULL when out
    * of range or not in vocab. dp arrays are 1-indexed with dp[k] at
    * index k+1. (Accumulators are PLAIN arrays, not structs: DuckDB
    * 1.0's list_reduce mangles struct accumulators — wrong results on a
    * minimal repro, segfaults at corpus size — so both engines fold the
    * score array alone and derive the argmax lengths afterwards as a
    * pure transform against the finished dp array, which is equivalent
    * because dp is append-only during the fold.) */
  private def candSql(l: Int, dp: String): String =
    s"""(CASE WHEN p >= $l AND element_at(element_at(lps, $l), p) IS NOT NULL
       | THEN element_at($dp, p - $l + 1) + element_at(element_at(lps, $l), p)
       | ELSE CAST(NULL AS DOUBLE) END)""".stripMargin

  private def bestScoreSql(dp: String): String =
    (1 to MaxLen).map(l => s"coalesce(${candSql(l, dp)}, -1.0e18)")
      .mkString("greatest(", ", ", ")")

  /** Argmax length with ties to the SHORTEST piece: first l (ascending)
    * whose candidate equals the chosen dp value — exact float equality
    * is safe because the winner is compared against itself. */
  private def bestLenSql: String =
    (1 to MaxLen).map(l =>
      s"WHEN coalesce(${candSql(l, "dps")}, -1.0e18) = element_at(dps, p + 1) THEN $l")
      .mkString("(CASE ", " ", " END)")

  /** Viterbi-segment each distinct word under `probs`: (w, n, ts) with
    * ts the chosen piece array. The DP is an in-row fold over end
    * positions; the per-(length, position) logp grid `lps` comes from
    * ONE broadcast join of the word's substring occurrences against the
    * model — no per-lookup vocabulary probe. The walk-back recovers the
    * current position from the characters already collected (pieces
    * tile the suffix), so its accumulator is the plain piece array. */
  private[queries] def segment(words: DataFrame, probs: DataFrame): DataFrame = {
    val edges = occs(words)
      .join(broadcast(probs.select("piece", "lp")), Seq("piece"))
      .select(col("w"), (col("i") + col("l") - lit(1)).as("p"), col("l"), col("lp"))
    // LEFT join + empty-edge default: a word with NO vocabulary piece at
    // all (an apply-time word of entirely unseen characters) must still
    // segment — the DP's no-candidate fallback then tiles it into
    // single chars for the -1 unk path. On the training corpus every
    // word has at least its single-char edges (all corpus chars are in
    // the seed vocab), so left ≡ inner there and the train/fertility
    // oracles are untouched.
    words.join(
      edges.groupBy("w")
        .agg(collect_list(struct(col("p"), col("l"), col("lp"))).as("es")),
      Seq("w"), "left")
      .withColumn("es", coalesce(col("es"),
        expr("CAST(array() AS array<struct<p:int,l:int,lp:double>>)")))
      // the per-word Viterbi DP below is COMPUTE-dense on a byte-LIGHT
      // relation: AQE's byte-based advisory coalesce sees a few MB of
      // edge arrays, collapses the post-join stage to one partition,
      // and runs every word's DP single-threaded (measured: 25 s to
      // materialize the sf0.1 fit vs ~1 s once spread). An explicit
      // numPartitions repartition is exempt from AQE coalescing; the
      // exchange moves only the distinct-word edge relation, and a
      // cluster submit's shuffle.partitions raises the spread with it.
      .repartition(math.max(1,
        words.sparkSession.sessionState.conf.numShufflePartitions), col("w"))
      // lps / dps / bls are LET-BOUND as lambda variables inside ONE
      // expression (the single-element-transform pattern the Gopher
      // battery documents), NOT separate columns: as column aliases,
      // predicate pushdown SUBSTITUTES them into any downstream filter
      // (InferFiltersFromGenerate plants `size(ts) > 0` under the
      // M-step explode and pushes it through this projection AND the
      // repartition), and interpreted higher-order functions re-
      // evaluate every reference — the inlined chain multiplies to
      // ~10⁸ interpreted ops PER WORD at derived-corpus word lengths
      // (measured on the first unigram_serve octave sweep: the x64 fit
      // pinned one task for 20+ min inside exactly that inferred
      // filter). A lambda variable binds its array ONCE per row at
      // eval time and is opaque to alias substitution, so the DP is
      // O(MaxLen·len·|es|) per word no matter where the optimizer
      // copies the expression.
      .withColumn("ts", expr(
        s"""element_at(transform(array(
           |  transform(sequence(1, $MaxLen), l ->
           |    transform(sequence(1, length(w)), p ->
           |      try_element_at(filter(es, e -> e.p = p AND e.l = l), 1).lp))), lps ->
           |element_at(transform(array(
           |  aggregate(sequence(1, length(w)), array(CAST(0.0 AS DOUBLE)),
           |    (acc, p) -> array_append(acc, ${bestScoreSql("acc")}))), dps ->
           |element_at(transform(array(
           |  transform(sequence(1, length(w)), p -> $bestLenSql)), bls ->
           |  aggregate(sequence(1, length(w)), CAST(array() AS array<string>),
           |    (a, x) -> CASE WHEN length(w) - length(concat_ws('', a)) <= 0 THEN a
           |      ELSE array_prepend(a, substring(w,
           |        length(w) - length(concat_ws('', a))
           |          - element_at(bls, length(w) - length(concat_ws('', a))) + 1,
           |        element_at(bls, length(w) - length(concat_ws('', a))))) END)
           |), 1)), 1)), 1)""".stripMargin))
      .select(col("w"), col("n"), col("ts"))
  }

  /** M-step counts over the FIXED vocab (zeros kept — Laplace needs the
    * full support and V must stay constant). */
  private def eStepCounts(vocab: DataFrame, segs: DataFrame): DataFrame =
    vocab.select("piece")
      .join(segs.select(col("n"), explode(col("ts")).as("piece"))
          .groupBy("piece").agg(sum("n").as("c")),
        Seq("piece"), "left")
      .select(col("piece"), coalesce(col("c"), lit(0L)).as("c"))

  /** Corpus-byte bound for [[emFit]]'s per-iteration driver
    * materialization, prop/env-overridable (`graft.unigramLocalFitBytes`
    * sys-prop for specs, `SPARK_GRAFT_UNIGRAM_LOCAL_FIT_BYTES` for a
    * submit) — the wideArgmaxRows pattern a third time. ABOVE the bound
    * each iteration's vocabulary-sized counts localize driver-side so
    * iteration k's plan never embeds k−1's segmentation (as one lazy
    * chain, Catalyst's alias substitution re-evaluates the interpreted
    * DP per consumer — measured 20+ min in one task at the x64 octave).
    * AT OR BELOW it the whole fit stays one lazy chain: the gate corpus'
    * re-evaluation is milliseconds while the localization's extra eager
    * job rounds cost ~0.7 s of scheduling (x_text_unigram_train 0.74 →
    * 1.47 s quiet, the r17 named trade this gate unwinds). Default 4 MiB:
    * sf0.1 (~1.5 MB — the bench corpus, lazy-proven at 0.74 s through
    * r12-r16) stays lazy; the first ScaleBench octave above it (x4,
    * ~6 MB) localizes. The fit is a STANDING sweep row — SCALE_r18
    * `unigram_fit`: tail exponent 0.535, zero shuffle-spill through
    * 256×, so the projection-substitution regression class the r17 fix
    * closed stays permanently fenced. */
  private[graft] def localFitBytes: Long =
    sys.props.get("graft.unigramLocalFitBytes")
      .orElse(sys.env.get("SPARK_GRAFT_UNIGRAM_LOCAL_FIT_BYTES"))
      .map(_.toLong).getOrElse(4L << 20)

  /** The trained model after [[Iters]] EM rounds: (piece, c, lp) with c
    * the final Viterbi counts and lp the final quantized log-probs.
    *
    * Above [[localFitBytes]], each iteration's VOCABULARY-SIZED
    * relations (seed vocab, per-iteration counts — ≤ chars + [[TopK]]
    * rows) materialize to driver-local relations between iterations
    * (the bpeFit persist pattern, driver-side because the rows are
    * model-sized): as one lazy chain, iteration k's plan EMBEDS
    * iteration k−1's entire segmentation — the nesting compounds across
    * iterations and Catalyst inlines the per-word DP columns into
    * downstream predicates, re-evaluating the interpreted lambda chain
    * per consumer (measured on the first unigram_serve octave sweep:
    * the x64 fit sat 20+ min in ONE task inside a Filter evaluating the
    * full ts chain; localized, the whole fit is seconds — each
    * corpus-shaped segmentation pass now runs EXACTLY ONCE, which is
    * the family's design claim). The trainer stays one corpus-shaped
    * pass per iteration; only model-sized rows ever reach the driver. */
  private[graft] def emFit(s: SparkSession, d: String): DataFrame = {
    val words = wordCounts(s, d)
    // both branches run IDENTICAL arithmetic — localization is purely an
    // execution strategy (where the model-sized intermediates live);
    // UnigramSpec pins branch equality on the gate corpus
    val localize = Curation.textBytes(s, d) > localFitBytes
    def localized(df: DataFrame): DataFrame =
      if (!localize) df
      else {
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
        df.collect().foreach(rows.add)
        s.createDataFrame(rows, df.schema)
      }
    val vocab = localized(seedVocab(words))
    (1 to Iters).foldLeft(probsOf(vocab)) { case (probs, _) =>
      probsOf(localized(eStepCounts(vocab, segment(words, probs))))
    }
  }

  /** The FROZEN serving model: (piece, c, lp, id) — the trained
    * [[emFit]] plus the conventional frequency-ordered id assignment
    * (count DESC, piece ASC — the BpeModel.ids rule). Localized to a
    * driver-side relation: the model is vocabulary-sized (≤ chars +
    * [[TopK]] rows — it broadcasts at apply time anyway, the
    * fittedCentroids argument), and apply consumes it TWICE (the lp
    * broadcast inside [[segment]], the id broadcast onto pieces) — as a
    * lazy plan each consumer would silently replay the whole EM fit. */
  /** Trained-model memo per (session, corpus dir) — the ivfCentroids
    * argument verbatim: a real tokenizer is TRAINED ONCE (offline) and
    * applied many times, so serving entries (`x_text_unigram_ids`, the
    * streaming twin) must not re-run the EM fit per query. The memo
    * holds a LOCAL (driver-side) vocabulary-sized relation — no
    * executor storage to leak — but stopped sessions are still purged
    * so a JVM hosting many short-lived sessions cannot grow the map. */
  private val fittedModel = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  /** Drop the memoized model for (session, corpus dir) — call after the
    * corpus at `d` is rewritten in place; the next apply re-trains. */
  def invalidateUnigramModel(s: SparkSession, d: String): Unit = {
    val inner = fittedModel.get(s)
    if (inner != null) { inner.remove(d); () }
  }

  private[graft] def unigramFit(s: SparkSession, d: String): DataFrame = {
    fittedModel.keySet.removeIf(sess => sess.sparkContext.isStopped)
    val perSession = fittedModel.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    // fit OUTSIDE the mapping function (the memoizedCentroids contract
    // note): racing fitters may duplicate work, winner served
    val cached = perSession.get(d)
    if (cached != null) cached
    else {
      import org.apache.spark.sql.expressions.Window
      val m = emFit(s, d).withColumn("id",
        row_number().over(Window.orderBy(col("c").desc, col("piece"))).cast("long") - 1L)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      m.collect().foreach(rows.add)
      val built = s.createDataFrame(rows, m.schema)
      val prev = perSession.putIfAbsent(d, built)
      if (prev != null) prev else built
    }
  }

  /** Tokenize any (doc_id, text) relation against a frozen model
    * relation (piece, lp, id — [[unigramFit]]'s shape, fresh or read
    * back from a [[writeUnigramModel]] table): per-word Viterbi under
    * the frozen lp (the SAME DP as training's [[segment]] — apply is
    * the E-step against a model that no longer moves), pieces map to
    * ids with -1 for a piece outside the table (a truly unseen
    * character decomposes to itself via the DP's no-candidate fallback
    * and then misses the id table — the BPE unk convention). Output
    * shape matches TextAnalysis.tokenizeOf: (doc_id, n_tokens,
    * ids_str). Pure per-doc function of (doc, model) — the streaming
    * twin (Streams.unigramTokenize) relies on it.
    *
    * Scale shape: ONE zero-shuffle narrow map — the whole Viterbi DP
    * and the id lookup live inside
    * [[graft.functions.UnigramTokenize]] with the model as O(1) hash
    * maps riding the plan (the WordpieceTokenize / BpeTokenize
    * treatment). This replaces the last join-gather serving plan: that
    * shape class is measured at 16-18 GB of spill / OOM at 256× on the
    * tokenize_serve ScaleBench row, and the unigram_serve row now
    * measures THIS form at octaves. The model relation is
    * vocabulary-sized (≤ chars + TopK rows), so the collect here is a
    * model materialization, never corpus-scale. */
  private[graft] def tokenizeOf(docs: DataFrame, model: DataFrame): DataFrame = {
    val m = model.select("piece", "lp", "id").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val ids = graft.functions.UnigramTokenize.of(col("text"), m, MaxLen)
    docs.select(col("doc_id"), ids.as("ids"))
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_tokens"),
        expr("array_join(transform(ids, i -> CAST(i AS STRING)), ' ')").as("ids_str"))
  }

  /** Persist the trained model as a plain parquet table — the frozen
    * tokenizer artifact a serving fleet loads by name
    * (`tokenizeOf(docs, spark.table(name))`); vocabulary-sized, so no
    * bucketing — it broadcasts wherever it is applied. */
  def writeUnigramModel(s: SparkSession, d: String, tableName: String): Unit = {
    graft.Engine.reclaimManagedTable(s, tableName)
    unigramFit(s, d).write.mode("overwrite").format("parquet").saveAsTable(tableName)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- the serving last-mile: per-doc input ids under the FROZEN
    //    trained model — the unigram twin of x_text_tokenize_ids (same
    //    output shape, same frequency-ordered id rule, same -1 unk
    //    convention), closing the train→apply lifecycle for this
    //    tokenizer family.
    "x_text_unigram_ids" -> ((s, d) =>
      tokenizeOf(
        table(s, d, "documents").filter(col("doc_id") < 100).select("doc_id", "text"),
        unigramFit(s, d)).orderBy("doc_id")),

    // -- the trainer itself, hash-gated end-to-end: seed ranking, both
    //    EM rounds' Viterbi segmentations, the Laplace/lnq arithmetic —
    //    the oracle replays every step in DuckDB (list_reduce mirrors
    //    the in-row DP fold exactly, including the shortest-piece
    //    tie-break and the left-to-right double accumulation).
    "x_text_unigram_train" -> ((s, d) =>
      emFit(s, d).select(col("piece").as("token"), col("c"), col("lp"))
        .orderBy("token")),

    // -- fertility under the trained unigram model NEXT TO the 3-step
    //    BPE model on the same corpus — the comparison row that makes
    //    the two tokenizer families commensurable (tokens/word per
    //    language; lower is better at equal vocab budget).
    "x_text_unigram_fertility" -> ((s, d) => {
      val words = wordCounts(s, d)
      val segs = segment(words, emFit(s, d))
        .select(col("w"), size(col("ts")).cast("long").as("ntok"))
      val lw = table(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("n"))
      val uni = lw.join(segs, Seq("w"))
        .groupBy("lang")
        .agg(sum("n").as("words"), sum(col("n") * col("ntok")).as("tokens_unigram"))
        .select(col("lang"), col("words"), col("tokens_unigram"),
          (col("tokens_unigram").cast("double") / col("words").cast("double"))
            .as("fertility_unigram"))
      val bpe = TextAnalysis.bpeFertilityOf(s, d, steps = 3)
        .select(col("lang"), col("tokens").as("tokens_bpe"),
          col("fertility").as("fertility_bpe"))
      uni.join(bpe, Seq("lang"))
        .select("lang", "words", "tokens_unigram", "fertility_unigram",
          "tokens_bpe", "fertility_bpe")
        .orderBy("lang")
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracle — the same algorithm, stated in DuckDB's lambda
  // dialect: list_reduce seeds from the list's FIRST element, so the
  // init state is prepended and the index arg (iteration counter,
  // 1-based) IS the word position. Dialect map: aggregate→list_reduce,
  // transform→list_transform, filter→list_filter, element_at→[i],
  // array_append→list_append, array_prepend(a,e)→list_prepend(e,a).
  // Two DuckDB-1.0 list_reduce bugs shape the formulation (both found
  // by minimal repro while gating): (1) STRUCT accumulators are
  // mangled (wrong results small, segfault at corpus size) — so the DP
  // folds the score array alone and derives argmax lengths afterwards;
  // (2) indexing an outer list by an expression mixing outer columns
  // with the accumulator yields NULL — so the walk-back carries the
  // current position as the accumulator's FIRST element (pieces follow
  // from index 2) and every index derives from the accumulator only.
  // ------------------------------------------------------------------

  /** Candidate score with explicit position/dp/lps expressions (the
    * recursive-CTE formulation carries them as correlated columns). */
  private def dCandSql(l: Int, p: String, dp: String, lps: String): String =
    s"""(CASE WHEN $p >= $l AND $lps[$l][$p] IS NOT NULL
       | THEN $dp[$p - $l + 1] + $lps[$l][$p]
       | ELSE CAST(NULL AS DOUBLE) END)""".stripMargin

  private def dBestScoreSql(p: String, dp: String, lps: String): String =
    (1 to MaxLen).map(l => s"coalesce(${dCandSql(l, p, dp, lps)}, -1.0e18)")
      .mkString("greatest(", ", ", ")")

  private def dBestLenSql: String =
    (1 to MaxLen).map(l =>
      s"WHEN coalesce(${dCandSql(l, "p", "dps", "lps")}, -1.0e18) = dps[p + 1] THEN $l")
      .mkString("(CASE ", " ", " END)")

  /** The E-step CTE block for iteration k: lp$prev → sg$k (per-word
    * Viterbi segmentations) — split from [[countBlockSql]] so the
    * fertility oracle can run ONE extra segmentation under the final
    * model without a count/re-smooth step (no string surgery). */
  private def segBlockSql(k: Int): String = {
    val prev = k - 1
    s"""ed$k AS (SELECT oc.w, oc.i + oc.l - 1 AS p, oc.l, lp.lp
       |  FROM oc JOIN lp$prev lp ON oc.piece = lp.piece),
       |ea$k AS MATERIALIZED (SELECT w, list({'p': p, 'l': l, 'lp': lp}) AS es FROM ed$k GROUP BY w),
       |ar$k AS MATERIALIZED (SELECT w, list_transform(generate_series(1, $MaxLen), l ->
       |    list_transform(generate_series(1, length(w)), p ->
       |      list_extract(list_filter(es, e -> e.p = p AND e.l = l), 1).lp)) AS lps
       |  FROM ea$k),
       |dpr$k (w, p, dps) AS (
       |  SELECT w, CAST(0 AS BIGINT), [CAST(0.0 AS DOUBLE)] FROM ar$k
       |  UNION ALL
       |  SELECT d.w, d.p + 1, list_append(d.dps,
       |    ${dBestScoreSql("(d.p + 1)", "d.dps", "a.lps")})
       |  FROM dpr$k d JOIN ar$k a ON a.w = d.w WHERE d.p < length(d.w)),
       |dp$k AS MATERIALIZED (SELECT w, dps FROM dpr$k WHERE p = length(w)),
       |bl$k AS MATERIALIZED (SELECT d.w, list_transform(generate_series(1, length(d.w)),
       |    p -> $dBestLenSql) AS bls
       |  FROM (SELECT dp.w, dp.dps, a.lps
       |        FROM dp$k dp JOIN ar$k a ON a.w = dp.w) d(w, dps, lps)),
       |wbr$k (w, pos, ts) AS (
       |  SELECT w, length(w), CAST([] AS VARCHAR[]) FROM bl$k
       |  UNION ALL
       |  SELECT b.w, b.pos - l.bls[b.pos],
       |    list_prepend(substr(b.w, CAST(b.pos - l.bls[b.pos] + 1 AS BIGINT),
       |                        CAST(l.bls[b.pos] AS BIGINT)), b.ts)
       |  FROM wbr$k b JOIN bl$k l ON l.w = b.w WHERE b.pos > 0),
       |sg$k AS MATERIALIZED (SELECT w, ts FROM wbr$k WHERE pos = 0)""".stripMargin
  }

  /** The M-step CTE block for iteration k: sg$k → counts over the fixed
    * vocab → smoothed quantized lp$k. */
  private def countBlockSql(k: Int): String =
    s"""ck$k AS (SELECT v.piece, coalesce(u.c, 0) AS c FROM vocab v LEFT JOIN (
       |    SELECT piece, CAST(sum(n) AS BIGINT) AS c FROM (
       |      SELECT wc.n, unnest(sg.ts) AS piece
       |      FROM sg$k sg JOIN wc ON sg.w = wc.w) GROUP BY piece) u
       |  ON v.piece = u.piece),
       |g$k AS MATERIALIZED (SELECT CAST(sum(c) AS DOUBLE) AS tot, CAST(count(*) AS DOUBLE) AS v
       |  FROM ck$k),
       |lp$k AS MATERIALIZED (SELECT piece, c,
       |    floor(ln((CAST(c AS DOUBLE) + 1.0) / (tot + v)) * 1000000.0) / 1000000.0 AS lp
       |  FROM ck$k, g$k)""".stripMargin

  private def iterSql(k: Int): String =
    s"${segBlockSql(k)},\n${countBlockSql(k)}"

  /** The shared oracle prelude: word counts, substring occurrences,
    * seed vocab + seed probs lp0, then [[Iters]] iteration blocks. */
  private def chainSql: String =
    s"""wc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |oc AS MATERIALIZED (SELECT w, n, u.i AS i, u.l AS l, substr(w, u.i, u.l) AS piece
       |  FROM wc, unnest(flatten(list_transform(generate_series(1, length(w)),
       |    i -> list_transform(generate_series(1, least($MaxLen, length(w) - i + 1)),
       |           l -> {'i': i, 'l': l})))) AS t(u)),
       |c0 AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS c FROM oc GROUP BY piece),
       |vocab AS MATERIALIZED (SELECT piece, c FROM c0 WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, c FROM (SELECT piece, c FROM c0 WHERE length(piece) > 1
       |                        ORDER BY c DESC, piece LIMIT $TopK)),
       |g0 AS MATERIALIZED (SELECT CAST(sum(c) AS DOUBLE) AS tot, CAST(count(*) AS DOUBLE) AS v
       |  FROM vocab),
       |lp0 AS MATERIALIZED (SELECT piece, c,
       |    floor(ln((CAST(c AS DOUBLE) + 1.0) / (tot + v)) * 1000000.0) / 1000000.0 AS lp
       |  FROM vocab, g0),
       |${(1 to Iters).map(iterSql).mkString(",\n")}""".stripMargin

  val oracle: Map[String, String] = Map(
    "x_text_unigram_ids" -> {
      // one extra segmentation under the FINAL model (the fertility
      // oracle's sg block), ids by (c DESC, piece) over lp$Iters, then
      // the per-doc reassembly CTEs of the x_text_tokenize_ids oracle
      val f = Iters + 1
      s"""WITH RECURSIVE $chainSql,
         |${segBlockSql(f)},
         |uids AS MATERIALIZED (SELECT piece,
         |    CAST(row_number() OVER (ORDER BY c DESC, piece) - 1 AS BIGINT) AS id
         |  FROM lp$Iters),
         |docw AS (SELECT doc_id, i AS pos, ws[i] AS w FROM
         |  (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |   WHERE doc_id < 100), unnest(generate_series(1, len(ws))) AS u(i)),
         |dtok AS (SELECT doc_id, pos, x.j AS j, x.piece AS piece FROM (
         |  SELECT d.doc_id, d.pos, unnest(list_transform(generate_series(1, len(sg.ts)),
         |           j -> {'j': j, 'piece': sg.ts[j]})) AS x
         |  FROM docw d JOIN sg$f sg ON sg.w = d.w)),
         |did AS (SELECT doc_id,
         |          list(CAST(coalesce(i.id, -1) AS VARCHAR) ORDER BY pos, j) AS ids
         |        FROM dtok LEFT JOIN uids i ON i.piece = dtok.piece GROUP BY doc_id)
         |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
         |       array_to_string(ids, ' ') AS ids_str
         |FROM did ORDER BY doc_id""".stripMargin
    },

    "x_text_unigram_train" ->
      s"""WITH RECURSIVE $chainSql
         |SELECT piece AS token, c, lp FROM lp$Iters ORDER BY token""".stripMargin,

    "x_text_unigram_fertility" -> {
      // one extra segmentation pass under the FINAL model (lp$Iters),
      // then per-language masses; the BPE side reuses the 3-step
      // sequential training chain verbatim (TextAnalysis' fertility
      // oracle CTEs)
      val f = Iters + 1
      s"""WITH RECURSIVE $chainSql,
         |${segBlockSql(f)},
         |ulw AS MATERIALIZED (SELECT lang, w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY lang, w),
         |uni AS MATERIALIZED (SELECT lang, CAST(sum(ulw.n) AS BIGINT) AS words,
         |    CAST(sum(ulw.n * len(sg.ts)) AS BIGINT) AS tokens_unigram
         |  FROM ulw JOIN sg$f sg ON ulw.w = sg.w GROUP BY lang),
         |${TextAnalysis.bpeFertilityCtes}
         |SELECT uni.lang, uni.words, uni.tokens_unigram,
         |  CAST(uni.tokens_unigram AS DOUBLE) / CAST(uni.words AS DOUBLE)
         |    AS fertility_unigram,
         |  bpe.tokens AS tokens_bpe, bpe.fertility AS fertility_bpe
         |FROM uni JOIN bpe_fert bpe ON uni.lang = bpe.lang
         |ORDER BY uni.lang""".stripMargin
    }
  )
}
