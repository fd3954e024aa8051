package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language ID, quality scoring,
  * token counting, fingerprinting. All pure Column expressions (codegen'd,
  * no UDFs); every query has an exact DuckDB oracle — arithmetic is
  * integer-derived doubles so both engines agree bit-for-bit.
  *
  * Scale: each operator is a narrow per-row projection + one aggregation;
  * no self-joins, no skew-prone keys; at 100 TB these pipeline into a
  * single scan pass per query.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  // marker stopwords per language (n-gram heuristic; the synthetic corpus
  // shares one vocabulary so 'en' markers dominate — the *mechanism* is
  // what's exercised; real corpora supply real profiles)
  private val markers = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "und", "die", "das"),
    "es" -> Seq("el", "y", "los", "que"))

  /** (doc_id, pair) — adjacent whitespace-token bigrams, shared by the
    * BPE-count and LM-novelty queries. The size(ws) >= 2 guard matters:
    * Spark's sequence(1, 0) would step DESCENDING, not return empty. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))")).as("pair"))

  val queries: Map[String, Q] = Map(
    // -- Okapi BM25 top-10 retrieval: the lexical-retrieval standard a
    //    RAG / data-curation pipeline runs next to ANN. Query terms are
    //    corpus-derived (each query doc's first 3 tokens), so the gate is
    //    non-vacuous at every scale. Scale shape: tf is one explode +
    //    partial-agg pass; query terms and their df relation are
    //    vocabulary-bounded and BROADCAST; the only corpus-sized joins
    //    (tf ⋈ terms, ⋈ dl) are key-equi; per-term contributions sum in
    //    w-order (a bounded ordered fold) so the double score reproduces
    //    bit-for-bit in DuckDB — ln() inputs are identical doubles.
    "x_text_bm25" -> ((s, d) => bm25(s, d)),

    // -- the takedown/DELETE verb over the persisted LEXICAL index,
    //    oracle-gated on SCORES: build the bucketed BM25 index over the
    //    corpus, file doc 25 (ranked top-10 at every driver scale, so
    //    the exclusion is non-vacuous), search — df, avgdl and N must
    //    all shrink exactly as a rebuild-without-the-doc's would (the
    //    oracle is the bm25 chain with the doc excluded from the
    //    corpus). This is the hardest exactness claim the ledger makes:
    //    not just "the doc never ranks" but "every OTHER score moves
    //    precisely as if the doc had never been indexed".
    "x_text_bm25_takedown" -> ((s, d) => {
      val p = "vx_bm_td"
      for (t <- Seq("_tf", "_dl", "_stats"))
        graft.Engine.reclaimManagedTable(s, p + t)
      graft.Engine.reclaimManagedTable(s, graft.Takedown.tombTable(p))
      writeBm25Index(s, d, p)
      graft.Takedown.add(s, p, s.range(25, 26).toDF("id"))
      val qs = table(s, d, "documents").filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          expr("slice(split(text, ' '), 1, 3)").as("terms"))
      bm25SearchOf(qs, p)
    }),

    // -- HYBRID retrieval via Reciprocal Rank Fusion: the production
    //    search stack's standard lexical ⊕ semantic merge — BM25 top-10
    //    (this module's gated pipeline) fused with brute cosine top-10
    //    over the embeddings (Similarity's gated pipeline) by
    //    score(d) = Σ 1/(60 + rank_source(d)), ranks from each list the
    //    doc appears in. Everything after the two gated retrievals is
    //    O(queries × 2k) rows: a full-outer merge on (qid, doc_id), a
    //    two-term fixed-order double sum (bm25 term first — the same
    //    expression in DuckDB, so the gate is hash-exact; 1/(60+r) is a
    //    correctly-rounded IEEE division in both engines), and a
    //    row_number over ≤ 2k candidates per query. At 100 TB the cost
    //    IS the two retrievals — both already scale-audited — and the
    //    fusion adds no corpus-sized work.
    "x_text_hybrid_rrf" -> ((s, d) => hybridRrf(s, d)),

    // -- BPE tokenizer TRAINING: the first 3 merge iterations of the
    //    byte-pair-encoding loop (x_text_bpe_pairs counts only the first
    //    merge's candidates; this RUNS the loop). The corpus is scanned
    //    ONCE for word counts; every merge iteration then works on the
    //    vocabulary-sized relation — pair counting is a partial
    //    aggregate, the argmax is one bounded driver row per step (the
    //    training control decision), and the merge itself is a string
    //    replace whose left-to-right non-overlap IS BPE's merge rule in
    //    both engines. Integer counts + exact strings → hash-gated with
    //    no floating point at all.
    "x_text_bpe_train" -> ((s, d) => bpeTrain(s, d, steps = 3)),

    // -- the BATCHED trainer ([[bpeMergesBatched]] — top-K fetch, exact
    //    prefix acceptance) run through the same oracle as the
    //    sequential loop: the acceptance rule is PROVABLY sequential-
    //    equal, and this gate pins that claim against an engine that
    //    knows nothing about batching. Production depth (32k merges)
    //    is where the batching pays; TextAnalysisSpec pins depth-256
    //    equality and multi-merge rounds.
    "x_text_bpe_train_batched" -> ((s, d) => bpeTrainBatched(s, d, steps = 3)),

    // -- BPE application: tokenize with the trained merges (order
    //    matters — merge 2 can consume merge 1's output) and report the
    //    top-20 tokens of the resulting corpus. See [[bpeApply]].
    "x_text_bpe_apply" -> ((s, d) => bpeApply(s, d, steps = 3)),

    // -- tokenizer FERTILITY per language (tokens/word, chars/token):
    //    the fairness metric tokenizer papers report — a tokenizer
    //    trained on a corpus-wide frequency mix spends more tokens per
    //    word on the languages its merges serve worst. Merges train
    //    once (corpus-wide, the gated chain); the per-language rollup
    //    is a (lang, word) vocabulary relation — vocabulary-sized, one
    //    extra corpus scan, partial-agg all the way. Integer masses +
    //    two fixed-order divisions ⇒ hash-exact.
    "x_text_bpe_fertility" -> ((s, d) => bpeFertilityOf(s, d, steps = 3)),

    // -- tokenizer LAST MILE: materialize each document's input_ids
    //    under the trained merges — what a training job actually reads.
    //    The word→symbols map and the token→id table are both
    //    VOCABULARY-sized (broadcast; the id-assignment window orders
    //    vocab rows, never corpus rows); the corpus pays one
    //    posexplode + two broadcast joins + one per-doc reassembly
    //    fold. Ids emit as a space-joined string (integer text — exact
    //    in any engine, and immune to array-repr truncation in
    //    comparison harnesses). Hash-exact end to end.
    "x_text_tokenize_ids" -> ((s, d) => tokenizeIds(s, d, steps = 3)),

    // -- language ID: stopword-profile scores + zh via CJK codepoints;
    //    prediction = argmax with deterministic tie-break order
    "x_text_langid" -> ((s, d) =>
      langidPred(table(s, d, "documents"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")),

    // -- quality scoring: exact per-doc stats on a bounded sample
    "x_text_quality" -> ((s, d) =>
      table(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("ws"))
        .select(
          col("doc_id"),
          col("n_chars"),
          size(col("ws")).cast("long").as("n_tokens"),
          size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
          (size(array_distinct(col("ws"))).cast("double") / size(col("ws"))).as("distinct_ratio"),
          (size(array_intersect(col("ws"),
            array(markers("en").map(lit): _*))).cast("double") / size(col("ws"))).as("stopword_ratio"),
          (expr("aggregate(ws, 0L, (a, w) -> a + length(w))").cast("double") / size(col("ws"))).as("avg_token_len"))
        .orderBy("doc_id")),

    // -- Gopher-style rule filter: the published heuristic battery
    //    (word-count bounds, mean-word-length band, minimum stopword
    //    evidence, top-bigram repetition cap) as ONE narrow projection —
    //    every statistic, including the per-doc top-bigram count (a
    //    sorted-run fold over the bigram array), is computed inside the
    //    row, so the whole battery is a zero-shuffle scan pass at any
    //    corpus size. Rule verdicts compare in INTEGER arithmetic
    //    (sumlen*10 vs 40*n, best*100 vs 6*nbg) so the booleans are
    //    engine-portable regardless of double rounding; the reported
    //    ratio columns are single fixed-order divisions, exact in both
    //    engines.
    "x_text_gopher" -> ((s, d) =>
      gopherRules(table(s, d, "documents")).orderBy("doc_id")),

    // -- the FULL Gopher repetition battery (the word-n-gram half of the
    //    published filter): top-{2,3,4}-gram character share and
    //    duplicate-{5..10}-gram character coverage per document, with
    //    the paper's thresholds as integer-arithmetic verdicts. Like
    //    x_text_gopher a pure narrow projection — every mode, dup-set
    //    and coverage union is an in-row fold — so the whole battery is
    //    a zero-shuffle scan pass at any corpus size. See
    //    [[gopherRepetition]].
    "x_text_gopher_rep" -> ((s, d) =>
      gopherRepetition(table(s, d, "documents")).orderBy("doc_id")),

    // -- the STRUCTURAL half of the repetition battery (round 19):
    //    duplicate-line / duplicate-paragraph fractions with the
    //    published thresholds, over deterministically synthesized line
    //    structure (the corpus itself has none — the r18 stated bound).
    //    See [[gopherRepetitionLines]].
    "x_text_gopher_rep_lines" -> ((s, d) =>
      gopherRepetitionLines(table(s, d, "documents")).orderBy("doc_id")),

    // -- token counting: whitespace tokens + a BPE-ish regex token count
    "x_text_tokens" -> ((s, d) =>
      table(s, d, "documents")
        .select(col("lang"), split(col("text"), " ").as("ws"), col("text"))
        .select(col("lang"), size(col("ws")).cast("long").as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).cast("long").as("n_re"))
        .groupBy("lang")
        .agg(sum("n_ws").as("ws_tokens"), sum("n_re").as("re_tokens"), count(lit(1)).as("docs"))
        .orderBy("lang")),

    // -- BPE-style adjacent-pair counts: the corpus statistic the first
    //    merge iteration of tokenizer training consumes. Pure generator
    //    fan-out + one count groupBy (map-side partials), so it scales as
    //    a single shuffle of (pair, partial-count) — never the text.
    "x_text_bpe_pairs" -> ((s, d) =>
      bigrams(table(s, d, "documents"))
        .groupBy("pair")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(20)),

    // -- LM-style novelty scoring: score a document slice against a
    //    CORPUS-WIDE bigram table (bigrams seen in ≥ 2 distinct docs are
    //    "known"); low known_ratio flags novel-or-noisy text — the
    //    exact-arithmetic stand-in for KenLM perplexity filtering (log
    //    probabilities would not be bit-portable across engines, count
    //    ratios are). Scale: the LM table shuffles keyed by bigram (never
    //    broadcast — corpus-wide it is large), the scoring join is
    //    key-equi, and both aggregations combine map-side.
    "x_text_lm_novelty" -> ((s, d) => {
      val bg = bigrams(table(s, d, "documents"))
      val lm = bg.groupBy("pair")
        .agg(countDistinct("doc_id").as("df")).filter(col("df") >= 2)
      val perDoc = bg.groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"))
      val known = bg.join(lm.select("pair"), Seq("pair"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_known"))
      perDoc.join(known, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bigrams"),
          coalesce(col("n_known"), lit(0L)).as("n_known"),
          (coalesce(col("n_known"), lit(0L)).cast("double") / col("n_bigrams")).as("known_ratio"))
        .filter(col("doc_id") < 200)
        .orderBy("doc_id")
    }),

    // -- exact per-language token-count percentiles (p50/p90) via rank
    //    arithmetic: integer inputs + integer index selection, so the
    //    DuckDB oracle matches bit-for-bit (no interpolated quantiles).
    //    One shuffle (the per-language window); the 100 TB path swaps in
    //    approx_percentile (a partial-aggregatable sketch) — this exact
    //    form is the ground truth it's validated against.
    "x_text_percentiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = table(s, d, "documents")
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws"))
      val w = Window.partitionBy("lang").orderBy(col("n_ws"), col("doc_id"))
      t.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
        .groupBy("lang")
        .agg(
          max(when(col("rn") === expr("1L + (cnt - 1L) div 2L"), col("n_ws"))).as("p50_tokens"),
          max(when(col("rn") === expr("1L + ((cnt - 1L) * 9L) div 10L"), col("n_ws"))).as("p90_tokens"),
          max("cnt").as("docs"))
        .orderBy("lang")
    }),

    // -- the 100 TB percentile path: approx_percentile's KLL-style sketch
    //    is partial-aggregatable (map-side combine, one tiny shuffle) —
    //    rows-only driver check (sketches are engine-specific); accuracy
    //    is pinned against x_text_percentiles in TextAnalysisSpec
    "x_text_percentiles_approx" -> ((s, d) =>
      table(s, d, "documents")
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_ws"))
        .groupBy("lang")
        .agg(expr("approx_percentile(n_ws, array(0.5D, 0.9D), 1000)").as("pcts"),
          count(lit(1)).as("docs"))
        .select(col("lang"), col("pcts").getItem(0).as("p50_approx"),
          col("pcts").getItem(1).as("p90_approx"), col("docs"))
        .orderBy("lang")),

    // -- document fingerprint: md5 over whitespace-normalized lowercase text
    "x_text_fingerprint" -> ((s, d) =>
      table(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), " +", " "))).as("fp"))
        .orderBy("doc_id")),

    // -- winnowing fingerprints (the MOSS algorithm): hash every 3-gram
    //    (engine-portable md5long60), slide a 4-hash window, keep each
    //    window's MINIMUM hash — rightmost position on ties — and dedupe.
    //    The guarantee: any shared run of ≥ 6 tokens between two docs
    //    yields a shared fingerprint, at ~2/(w+1) the storage of all
    //    shingles — the standard local fingerprint for plagiarism /
    //    contamination attribution. ONE windowed pass, no self-join: the
    //    rightmost-min of each frame is min(struct(h, -pos)) — struct
    //    ordering is lexicographic, so equal hashes tie-break to the
    //    larger position; frame completeness is a count over the same
    //    frame. A long document costs O(n·w), never O(n²).
    "x_text_winnow" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.Md5Long60.register(s)
      val sh = table(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(ws) - 2), i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          expr("md5long60(col)").as("h"))
      val frame = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.currentRow, 3)
      sh.withColumn("m", min(struct(col("h"), (-col("pos")).as("np"))).over(frame))
        .withColumn("cnt", count(lit(1)).over(frame))
        .filter(col("cnt") === 4) // complete 4-hash windows only
        .select(col("doc_id"), (-col("m.np")).as("pos"), col("m.h").as("h"))
        .distinct()
        .orderBy("doc_id", "pos", "h")
    }),

    // -- corpus vocabulary: term + document frequency, top 100 by tf —
    //    the tokenizer-building statistic. One explode + one groupBy with
    //    map-side partial counts; top-k is a TakeOrdered, never a full
    //    sort of the vocabulary
    "x_text_vocab" -> ((s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w")
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("w"))
        .limit(100)),

    // -- token-budget truncation: cut each document at a 32-token context
    //    budget on whitespace boundaries — the pre-packing normalization a
    //    training ingest runs. Pure narrow projection (no shuffle, no
    //    UDF); the truncated text itself is hash-gated.
    "x_text_truncate" -> ((s, d) =>
      table(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          least(size(col("ws")).cast("long"), lit(32L)).as("n_kept"),
          array_join(slice(col("ws"), 1, 32), " ").as("head_text"),
          (size(col("ws")) > 32).as("truncated"))
        .orderBy("doc_id")),

    // -- top distinguishing term per document: argmax over (tf desc,
    //    df asc, term desc) with document frequency computed over the FULL
    //    corpus — the tokenizer/keyword statistic. All-integer ranking so
    //    the oracle is exact (no float log). Scale shape: one explode, two
    //    partial-aggregatable groupBys, a key-equi join on the term (the
    //    df relation is vocabulary-sized, NOT corpus-sized), and a
    //    max(struct) argmax instead of a per-doc window; the doc_id < 50
    //    output bound pushes into the tf side of the join.
    "x_text_topterm" -> ((s, d) => {
      val words = table(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = words.distinct().groupBy("w").agg(count(lit(1)).as("df"))
      tf.filter(col("doc_id") < 50)
        .join(df, "w")
        .groupBy("doc_id")
        .agg(max(struct(col("tf"), (-col("df")).as("ndf"), col("w"))).as("top"))
        .select(col("doc_id"), col("top.w").as("term"),
          col("top.tf").as("tf"), (-col("top.ndf")).as("df"))
        .orderBy("doc_id")
    }),

    // -- training-corpus funnel: the composed cleaning pipeline a real
    //    ingest runs — quality gate (length + alpha ratio), language gate,
    //    exact-dedup keep — reported as per-stage survivor counts. ALL
    //    FOUR stages aggregate in ONE scan (conditional counts + a
    //    count(distinct md5) over the survivors), then unpivot via
    //    stack(); the only shuffled key is the 16-byte content hash
    // -- Multinomial Naive Bayes classifier, TRAIN + APPLY as one plan:
    //    the fastText-style linear bag-of-words classifier behind
    //    model-based quality/domain filtering (GPT-3 / LLaMA data
    //    pipelines). Train on the md5-split half of the corpus with
    //    labels from `embeddings`, apply to every document. Scale shape:
    //    the MODEL (vocab × labels likelihood grid + priors) is
    //    vocabulary-bounded and BROADCAST; the corpus pays one
    //    explode+partial-agg tf pass, a key-equi join against the
    //    broadcast grid, and a per-(doc,label) ordered fold — nothing
    //    corpus-sized is ever on the build side. ln() is floor-quantized
    //    (the BM25 pattern) and per-term contributions sum in w-order,
    //    so the double scores reproduce bit-for-bit in DuckDB.
    "x_text_nb_classify" -> ((s, d) => nbClassify(s, d)),

    // -- CCNet-style LM perplexity filter: a char-trigram language model
    //    per LANGUAGE, trained on the md5-split half, scores every
    //    document's cross-entropy; docs bucket into head/middle/tail by
    //    per-language tertile thresholds (CCNet's split, used to keep
    //    head+middle for training). Scale shape: the LM (per-lang
    //    trigram/bigram-context counts + vocab sizes) is
    //    vocabulary-bounded and BROADCAST; the corpus pays one in-row
    //    trigram expansion + partial-agg tf pass per side (fit + apply —
    //    the two inherent passes); thresholds are rank arithmetic over
    //    the SKINNY (doc, lang, H) relation windowed per language (the
    //    x_text_percentiles shape — swap approx_percentile in at
    //    petabyte scale, the gated sketch precedent). Quantized ln +
    //    tri-ordered folds ⇒ hash-exact in DuckDB.
    "x_text_ccnet_ppl" -> ((s, d) => ccnetPpl(s, d)),

    // -- Dolma-style per-doc quality ATTRIBUTES: the composed annotation
    //    pass a curation pipeline materializes before filtering — every
    //    signal tagged side by side (Gopher rule verdict, CCNet
    //    perplexity bucket, NB class, language ID) plus the composite
    //    keep rule, as ONE declarative plan. Every stage IS its gated
    //    standalone core (gopherRules / ccnetBuckets / nbScoreOf /
    //    langidPred — no re-implementation drift), composed by key-equi
    //    doc_id joins. Corpus passes: each tagger pays its own pass
    //    (the Dolma attribute-file shape — independent taggers), and
    //    the aggregates duplicated between a model's fit and its apply
    //    (NB's tf relation, CCNet's per-doc entropy feeding both the
    //    tertile thresholds and the bucketing probe) deduplicate at
    //    runtime via AQE exchange reuse — PlanQualitySpec pins the
    //    ReusedExchange nodes. The oracle recomposes the SAME shared
    //    CTE fragments the standalone oracles select from.
    "x_text_attributes" -> ((s, d) => attributes(s, d)),

    // -- CMS heavy hitters: the 100 TB path for frequent-term detection.
    //    Spark's built-in count_min_sketch aggregate compresses the
    //    whole token stream into a fixed-size sketch (a TRUE partial
    //    aggregate — map-side sketches merge), but ships no SQL way to
    //    QUERY it; graft's cms_estimate expression closes the loop, so
    //    build + broadcast + estimate stays one declarative plan. The
    //    exact counts ride alongside for the candidate top-20 — at
    //    petabyte scale only the sketch pass survives and candidates
    //    come from a sample, so estimates are rows-only (sketch
    //    internals are engine-specific); the spec pins the CMS
    //    guarantee: never under the exact count, bounded over.
    "x_text_heavy_hitters" -> ((s, d) => {
      graft.functions.Cms.register(s)
      val toks = table(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .select(col("w"), xxhash64(col("w")).as("h"))
      val sk = toks.agg(expr(
        "count_min_sketch(h, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"))
      val exact = toks.groupBy("w").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("w")).limit(20)
      exact.crossJoin(broadcast(sk))
        .select(col("w"), col("n_exact"),
          expr("cms_estimate(sk, xxhash64(w))").as("n_est"))
        .orderBy(col("n_exact").desc, col("w"))
    }),

    // -- the EXACT twin of x_text_heavy_hitters: same top-20 tokens by
    //    exact count, no sketch column, so the whole row hash-gates in
    //    DuckDB (the md5-twin pattern the LSH paths use). The spec pins
    //    the CMS estimates >= these counts (the sketch's one-sided
    //    error); together the pair upgrades the sketch query from
    //    rows-only to oracle-anchored.
    "x_text_heavy_hitters_exact" -> ((s, d) =>
      table(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("w")).limit(20)),

    "x_text_funnel" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val alpha = (length(regexp_replace(col("text"), "[^A-Za-z ]", "")).cast("double") /
        length(col("text"))).as("alpha_ratio")
      docs
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"), alpha)
        .withColumn("q_ok", col("n_chars") >= 50 && col("alpha_ratio") >= 0.8)
        .withColumn("l_ok", col("q_ok") && col("lang").isin("en", "fr", "de", "es"))
        .agg(
          count(lit(1)).as("n0"),
          count(when(col("q_ok"), 1)).as("n1"),
          count(when(col("l_ok"), 1)).as("n2"),
          count_distinct(when(col("l_ok"), md5(col("text")))).as("n3"))
        .selectExpr("""stack(4, '0_ingested', n0, '1_quality', n1,
                      |         '2_language', n2, '3_deduped', n3) AS (stage, n)""".stripMargin)
        .orderBy("stage")
    })
  )

  /** Okapi BM25 (k1 = 1.2, b = 0.75) top-10 per query — see the
    * x_text_bm25 entry. All constants appear as the same decimal
    * literals in both engines (never pre-folded in Scala, where e.g.
    * 1.2 + 1.0 rounds differently than the literal 2.2), and the score
    * sums per-term contributions in term order via a bounded fold, so
    * the gate is hash-exact. */
  private def bm25(s: SparkSession, d: String): DataFrame = {
    val t = table(s, d, "documents").select(col("doc_id"), split(col("text"), " ").as("ws"))
    val q = t.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), explode(expr("slice(ws, 1, 3)")).as("w"))
      .distinct()
    // push the query-term restriction BELOW the tf aggregation (guide
    // §2.3 "aggregate before you shuffle" / "project before the
    // exchange"): unrestricted bm25Tf exchanges the full corpus-sized
    // (doc_id, w) relation only for bm25Core to immediately drop every
    // non-query term via its broadcast join — Catalyst cannot push a
    // join through an aggregation, so the filter must live here. The
    // broadcast semi-filter before the groupBy keeps ALL docs for the
    // query terms, so per-term tf AND df are unchanged — identical rows
    // out (the x_text_bm25 oracle hash pins it), the exchange now
    // carries only query-term occurrences at any corpus size.
    val tfq = bm25TfOf(
      t.select(col("doc_id"), explode(col("ws")).as("w"))
        .join(broadcast(q.select("w").distinct()), Seq("w")))
    bm25Core(q, tfq, bm25Dl(t), bm25Stats(bm25Dl(t)), k = 10)
  }

  /** The composed attributes pass — see the x_text_attributes entry. */
  private def attributes(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val train = table(s, d, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label").cast("long").as("label"))
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
    attributesOf(docs, nbFit(docs, train), ccnetFit(s, d))
      .filter(col("doc_id") < 150)
      .orderBy("doc_id")
  }

  /** Annotate any (doc_id, lang, text) relation against FROZEN models —
    * the shared core of the gated batch query and the streaming
    * annotate-at-ingest gate (Streams.attributesGate). Every signal is
    * a pure per-doc function of (doc, models): the scan-side signals
    * (Gopher, langid) carry no state at all, and the two model stages
    * apply static broadcast relations — so micro-batch boundaries
    * cannot change any verdict.
    *
    * KEEP POLICY for unscored docs — an explicit decision, not an
    * accident of the join shape: a doc whose language the frozen CCNet
    * model never saw gets `ppl_bucket = 'unscored'` and PASSES the keep
    * gate when its Gopher verdict passes. Rationale: the perplexity
    * tertiles exist to trim the worst third WITHIN a language the model
    * can score; dropping every doc of an unseen language wholesale would
    * turn a model-coverage gap into a silent corpus filter (CCNet itself
    * keeps its unscored bucket for exactly this reason). Operators that
    * want quality-scored-only corpora filter `ppl_bucket != 'unscored'`
    * downstream — the bucket column carries the information either way.
    * TextAnalysisSpec pins this policy on a planted unseen-language doc. */
  private[graft] def attributesOf(docs: DataFrame, nb: NbModel,
      cc: CcModel): DataFrame = {
    val go = gopherRules(docs).select(col("doc_id"), col("pass").as("gopher_pass"))
    val ccb = ccnetScoreOf(docs, cc).select(col("doc_id"), col("bucket").as("ppl_bucket"))
    val nbp = nbScoreOf(docs.select("doc_id", "text"), nb)
      .select(col("doc_id"), col("pred").as("nb_pred"))
    val li = langidPred(docs).select(col("doc_id"), col("predicted").as("lang_pred"))
    docs.select("doc_id")
      .join(go, Seq("doc_id")).join(ccb, Seq("doc_id"))
      .join(nbp, Seq("doc_id")).join(li, Seq("doc_id"))
      .withColumn("keep", col("gopher_pass") && col("ppl_bucket") =!= "tail")
  }

  /** Per-doc n-gram-heuristic language prediction — the projection
    * behind x_text_langid, exposed unaggregated so the composed
    * attributes query can join it. Zero-shuffle scan pass. */
  private[graft] def langidPred(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    def score(lang: String) =
      size(array_intersect(ws, array(markers(lang).map(lit): _*))).cast("long")
    val zh = length(regexp_replace(col("text"), "[^\\x{4e00}-\\x{9fff}]", "")).cast("long")
    docs
      .select(col("doc_id"), col("lang"),
        score("en").as("s_en"), score("fr").as("s_fr"),
        score("de").as("s_de"), score("es").as("s_es"), zh.as("s_zh"))
      .withColumn("predicted",
        when(greatest(col("s_en"), col("s_fr"), col("s_de"), col("s_es"), col("s_zh")) === 0, "und")
          .when(col("s_zh") >= greatest(col("s_en"), col("s_fr"), col("s_de"), col("s_es")), "zh")
          .when(col("s_en") >= greatest(col("s_fr"), col("s_de"), col("s_es")), "en")
          .when(col("s_fr") >= greatest(col("s_de"), col("s_es")), "fr")
          .when(col("s_de") >= col("s_es"), "de")
          .otherwise("es"))
  }

  /** Multinomial Naive Bayes train + apply — see the x_text_nb_classify
    * entry. Labels come from `embeddings` (vec_id aligns with doc_id);
    * the train split is the stable md5-hex threshold (backfill- and
    * recrawl-deterministic, the x_cur_split rule). Out-of-vocabulary
    * apply-time tokens are IGNORED (the standard multinomial-NB choice;
    * every label drops the same tokens, so the argmax is unaffected by
    * any per-label constant for them). Output bounded to doc_id < 150. */
  private def nbClassify(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val labels = table(s, d, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label").cast("long").as("label"))
    val train = labels.filter(substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
    nbPredictOf(docs, labels, nbFit(docs, train))
      .filter(col("doc_id") < 150).orderBy("doc_id")
  }

  /** The broadcastable NB model: a dense (label, w, lw) log-likelihood
    * grid over the TRAIN vocabulary — Laplace add-one, lw floor-quantized
    * — plus (label, lp) log-priors. Dense matters: a label that never
    * saw w still scores ln(1/(toks+V)) for it, which the grid's left
    * join + coalesce(c, 0) materializes; with a sparse grid those rows
    * would silently vanish from the fold. */
  case class NbModel(grid: DataFrame, priors: DataFrame)

  private def lnq(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(log(x) * lit(1000000.0)) / lit(1000000.0)

  private[graft] def nbFit(docs: DataFrame, train: DataFrame): NbModel =
    nbModelFromCounts(nbCounts(docs, train),
      train.groupBy("label").agg(count(lit(1)).as("ndocs")))

  /** (label, w, c) token counts of the labeled train slice — the ONLY
    * corpus-derived model state. Additive: counts of a doc increment are
    * exactly the increment's own counts, which is what makes the
    * persisted-model append path EXACT rather than a drift contract. */
  private[graft] def nbCounts(docs: DataFrame, train: DataFrame): DataFrame =
    bm25Tf(docs.select(col("doc_id"), split(col("text"), " ").as("ws")))
      .join(train, Seq("doc_id"))
      .groupBy("label", "w").agg(sum(col("tf").cast("long")).as("c"))

  /** Derive the broadcastable model from (possibly multi-segment)
    * counts: vocabulary, per-label token masses and the smoothing
    * denominator all RE-DERIVE from the counts at build time — so a
    * model over base+appended counts equals a model refit on the union
    * corpus, bit for bit. `nd` may likewise carry one row per append
    * segment; priors re-sum it. */
  private[graft] def nbModelFromCounts(counts: DataFrame, nd: DataFrame): NbModel = {
    val ttf = counts.groupBy("label", "w").agg(sum("c").as("c"))
    val vocab = ttf.select("w").distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val lstats = ttf.groupBy("label").agg(sum("c").as("toks"))
    val grid = vocab.crossJoin(broadcast(lstats)).crossJoin(broadcast(vsize))
      .join(ttf, Seq("label", "w"), "left")
      .select(col("label"), col("w"),
        lnq((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("toks") + col("v")).cast("double")).as("lw"))
    val ndocs = nd.groupBy("label").agg(sum("ndocs").as("ndocs"))
    val nt = ndocs.agg(sum("ndocs").as("n"))
    val priors = ndocs.crossJoin(broadcast(nt))
      .select(col("label"), lnq(col("ndocs").cast("double") / col("n")).as("lp"))
    NbModel(grid, priors)
  }

  /** Persist the NB model's ADDITIVE state: `{prefix}_counts` (label, w,
    * c) bucketed on the term — the only corpus-derived relation — and
    * `{prefix}_ndocs` (label, ndocs), one row per label per segment.
    * Everything else (vocab size, token masses, priors) derives at
    * model-build time, so [[appendNbModel]] stays exact. Train slice =
    * the same md5-half rule the gated query uses. */
  def writeNbModel(s: SparkSession, d: String, tablePrefix: String,
      buckets: Int = 32): Unit = {
    val docs = table(s, d, "documents").select("doc_id", "text")
    val train = table(s, d, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label").cast("long").as("label"))
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
    for (t <- Seq("_counts", "_ndocs"))
      graft.Engine.reclaimManagedTable(s, tablePrefix + t)
    nbCounts(docs, train).write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "w").saveAsTable(s"${tablePrefix}_counts")
    train.groupBy("label").agg(count(lit(1)).as("ndocs"))
      .write.mode("overwrite").format("parquet").saveAsTable(s"${tablePrefix}_ndocs")
  }

  /** Fold a labeled increment into the persisted model: the increment's
    * own (label, w, c) counts shuffle INTO the counts table's bucket
    * layout (existing files never rewritten) and its per-label doc
    * counts append as new `{prefix}_ndocs` rows. Because counts are
    * additive and everything else re-derives, scoring after append is
    * EXACTLY a refit on the union corpus. Caller contract: `docs` are
    * not already folded in. */
  def appendNbModel(s: SparkSession, tablePrefix: String, docs: DataFrame,
      train: DataFrame): Unit = {
    val catalog = s.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(s"${tablePrefix}_counts")
    val buckets = catalog.getTableMetadata(ident).bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"${tablePrefix}_counts is not bucketed — not a persisted NB model"))
    nbCounts(docs, train).write.mode("append").format("parquet")
      .bucketBy(buckets, "w").saveAsTable(s"${tablePrefix}_counts")
    train.groupBy("label").agg(count(lit(1)).as("ndocs"))
      .write.mode("append").format("parquet").saveAsTable(s"${tablePrefix}_ndocs")
  }

  /** Build the scoring model from the persisted state — hand to
    * [[nbScoreOf]] / Streams.nbClassify for serving. */
  def nbModelOf(s: SparkSession, tablePrefix: String): NbModel =
    nbModelFromCounts(s.table(s"${tablePrefix}_counts"), s.table(s"${tablePrefix}_ndocs"))

  /** Score + argmax every document against a frozen [[NbModel]] —
    * (doc_id, pred, score). TOTAL: starts from the documents relation,
    * so a doc with zero in-vocab tokens still gets the prior-only
    * argmax. Per-doc verdicts are pure functions of (doc, model) —
    * micro-batching the docs cannot change them, which the streaming
    * twin (Streams.nbClassify) relies on. */
  private[graft] def nbScoreOf(docs: DataFrame, m: NbModel): DataFrame = {
    val tf = bm25Tf(docs.select(col("doc_id"), split(col("text"), " ").as("ws")))
    val folded = tf.join(broadcast(m.grid), Seq("w"))
      .select(col("doc_id"), col("label"), col("w"),
        (col("tf").cast("double") * col("lw")).as("c"))
      .groupBy("doc_id", "label")
      .agg(expr("aggregate(transform(array_sort(collect_list(struct(w, c))), p -> p.c), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("ll"))
    val scored = docs.select("doc_id").crossJoin(broadcast(m.priors))
      .join(folded, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (col("lp") + coalesce(col("ll"), lit(0.0))).as("score"))
    scored.groupBy("doc_id")
      .agg(max(struct(col("score").as("s"), (-col("label")).as("nl"))).as("m"))
      .select(col("doc_id"), (-col("m.nl")).as("pred"), col("m.s").as("score"))
  }

  private[graft] def nbPredictOf(docs: DataFrame, labels: DataFrame,
      m: NbModel): DataFrame =
    nbScoreOf(docs, m)
      .join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("label"), col("pred"), col("score"))

  /** CCNet-style perplexity bucketing — see the x_text_ccnet_ppl entry.
    * Add-one smoothing over the per-language train-trigram vocabulary:
    * logp(tri) = lnq((c(lang,tri)+1)/(c(lang,bi)+V_lang)) where the
    * bigram-context count derives from the trigram counts (no second
    * fit pass) and unseen trigrams/contexts coalesce to 0 — every
    * apply-time trigram scores, nothing silently drops. H(d) =
    * -(Σ tf·logp)/n_tri, folded in trigram order. Docs shorter than 3
    * chars stay TOTAL via the anchor left join (H = 0, n_tri = 0). */
  private def ccnetPpl(s: SparkSession, d: String): DataFrame =
    ccnetBuckets(s, d)
      .filter(col("doc_id") < 150)
      .select(col("doc_id"), col("lang"), col("n_tri"), col("h"), col("bucket"))
      .orderBy("doc_id")

  /** The full per-doc (doc_id, lang, n_tri, h, bucket) relation behind
    * x_text_ccnet_ppl — unfiltered so the composed attributes query can
    * join it. Fit + apply on the same corpus. */
  private[graft] def ccnetBuckets(s: SparkSession, d: String): DataFrame =
    ccnetScoreOf(table(s, d, "documents"), ccnetFit(s, d))

  /** The frozen CCNet state a serving path broadcasts: per-language
    * trigram counts, derived bigram contexts, vocab sizes — and the
    * tertile THRESHOLDS, which are global two-pass facts of the
    * backfill (exactly the mixture-rate pattern): a stream applies them
    * statelessly rather than re-deriving them per batch. */
  case class CcModel(tm: DataFrame, bm: DataFrame, vs: DataFrame, thr: DataFrame)

  private def ccnetTris(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), explode(
        expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")).as("tri"))

  private[graft] def ccnetFit(s: SparkSession, d: String): CcModel = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(s, d, "documents")
    val train = ccnetTris(docs)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
    val tm = train.groupBy("lang", "tri").agg(count(lit(1)).as("ct"))
    val bm = tm.groupBy(col("lang"), substring(col("tri"), 1, 2).as("bi"))
      .agg(sum("ct").as("cb"))
    val vs = tm.groupBy("lang").agg(count(lit(1)).as("v"))
    val thr = ccnetH(docs, tm, bm, vs)
      .withColumn("rn", row_number()
        .over(Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
      .groupBy("lang")
      .agg(
        max(when(col("rn") === expr("1L + (cnt - 1L) div 3L"), col("h"))).as("t1"),
        max(when(col("rn") === expr("1L + ((cnt - 1L) * 2L) div 3L"), col("h"))).as("t2"))
    CcModel(tm, bm, vs, thr)
  }

  /** Per-doc cross-entropy against the (broadcast) LM state — TOTAL via
    * the anchor left join (H = 0, n_tri = 0 for sub-trigram docs). */
  private def ccnetH(docs: DataFrame, tm: DataFrame, bm: DataFrame,
      vs: DataFrame): DataFrame = {
    val contrib = ccnetTris(docs).groupBy("doc_id", "lang", "tri").agg(count(lit(1)).as("tf"))
      .withColumn("bi", substring(col("tri"), 1, 2))
      .join(broadcast(tm), Seq("lang", "tri"), "left")
      .join(broadcast(bm), Seq("lang", "bi"), "left")
      // INNER join vs, deliberately: a language absent from the model
      // contributes NO trigram rows — and the docs-side anchor below
      // still emits its docs with n_tri = 0, h = 0.0, exactly what the
      // oracle's inner-join + anchor chain produces (a left join with a
      // fallback vocab would score those trigrams for real and diverge
      // from the gate). The 'unscored' sentinel downstream is what
      // surfaces them.
      .join(broadcast(vs), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("tri"), col("tf"),
        (col("tf").cast("double") *
          lnq((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (coalesce(col("cb"), lit(0L)) + col("v")).cast("double"))).as("c"))
    val h = contrib.groupBy("doc_id", "lang")
      .agg(
        expr("aggregate(transform(array_sort(collect_list(struct(tri, c))), p -> p.c), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("ll"),
        sum("tf").as("n_tri"))
    docs.select("doc_id", "lang").join(h, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("lang"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("n_tri"), lit(0L)) > 0, -col("ll") / col("n_tri"))
          .otherwise(lit(0.0)).as("h"))
  }

  /** Score + bucket any (doc_id, lang, text) relation against a frozen
    * [[CcModel]]. Per-doc verdicts are pure functions of (doc, model) —
    * micro-batching cannot change them (Streams.attributesGate). */
  private[graft] def ccnetScoreOf(docs: DataFrame, m: CcModel): DataFrame =
    ccnetH(docs, m.tm, m.bm, m.vs).join(broadcast(m.thr), Seq("lang"), "left")
      .withColumn("bucket",
        when(col("t1").isNull, "unscored") // lang unseen by the frozen model
          .when(col("h") <= col("t1"), "head")
          .when(col("h") <= col("t2"), "middle").otherwise("tail"))
      .drop("t1", "t2")

  /** tf over an already-exploded (doc_id, w) occurrence relation — the
    * shared tail of [[bm25Tf]] and the query-term-restricted path in
    * [[bm25]], so tf semantics can never silently diverge between the
    * persisted-index build and the in-memory query. */
  private[graft] def bm25TfOf(occ: DataFrame): DataFrame =
    occ.groupBy("doc_id", "w").agg(count(lit(1)).cast("double").as("tf"))

  /** (doc_id, w, tf) — the postings relation, one partial-agg pass. */
  private[graft] def bm25Tf(t: DataFrame): DataFrame =
    bm25TfOf(t.select(col("doc_id"), explode(col("ws")).as("w")))

  private[graft] def bm25Dl(t: DataFrame): DataFrame =
    t.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))

  /** 1-row (nn, sdl): exact global doc count + token mass — dl is
    * integral, so the long sum is order-independent; the double
    * division happens once downstream. */
  private[graft] def bm25Stats(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).cast("double").as("nn"), sum("dl").as("sdl"))

  /** The BM25 scoring core over a (qid, w) query relation and the
    * tf/dl/stats relations — shared verbatim by the in-memory query,
    * the persisted-index search ([[bm25SearchOf]]) and its streaming
    * twin, so every path scores bit-identically. */
  private[graft] def bm25Core(q: DataFrame, tf: DataFrame, dl: DataFrame,
      g: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qw = q.select("w").distinct()
    val tfq = tf.join(broadcast(qw), Seq("w"))
    val dft = tfq.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val avgdl = col("sdl").cast("double") / col("nn")
    // idf is the pipeline's one transcendental: Java Math.log and C
    // libm log can disagree by 1 ulp on the same input, so the value is
    // floor-quantized to 1e-6 (the portable-Lloyd 1e-9-mean pattern) —
    // every downstream op is exact arithmetic on identical doubles. A
    // 1-ulp input drift only flips the floor when ln·1e6 sits within
    // ~2e-10 of an integer; the fixed gate corpora verify it does not.
    val idf = floor(
      log(lit(1.0) + (col("nn") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        * lit(1000000.0)) / lit(1000000.0)
    val contrib = tfq
      .join(broadcast(q), Seq("w"))
      .join(broadcast(dft), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(g))
      .select(col("qid"), col("doc_id"), col("w"),
        (idf * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))).as("c"))
    val scored = contrib.groupBy("qid", "doc_id")
      .agg(expr("aggregate(transform(array_sort(collect_list(struct(w, c))), p -> p.c), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("score"))
    graft.functions.TopKAgg.topkOf(scored, "qid", "doc_id", "score", k)
      .orderBy("qid", "rank")
  }

  /** Reciprocal-rank fusion of the gated BM25 and brute-cosine top-10
    * lists — see the x_text_hybrid_rrf entry. Output: (qid, rank,
    * doc_id, rrf, r_bm25, r_ann) with NULL source ranks where a doc
    * appears in only one list. */
  private def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val bmR = bm25(s, d)
      .select(col("qid"), col("doc_id"), col("rank").as("r_bm25"))
    val annR = graft.queries.Similarity
      .bruteTopk(graft.queries.Similarity.withNorm(s, d), 10)
      .filter(col("qid") < 5)
      .select(col("qid"), col("vec_id").as("doc_id"), col("rank").as("r_ann"))
    rrfFuse(bmR, annR, 10)
  }

  /** The RRF fusion core over two (qid, doc_id, rank) lists — shared by
    * the gated in-memory query and the persisted-index serving path so
    * every fusion scores bit-identically. */
  private[graft] def rrfFuse(bmR: DataFrame, annR: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fused = bmR.join(annR, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"), col("r_bm25"), col("r_ann"),
        // fixed-order two-term sum: bm25 contribution first, then ann —
        // the oracle adds in the same order, so the double is bit-equal
        (coalesce(lit(1.0) / (lit(60.0) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("r_ann")), lit(0.0))).as("rrf"))
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "doc_id", "rrf", "r_bm25", "r_ann")
      .orderBy("qid", "rank")
  }

  /** Hybrid SERVING over the two persisted indexes — the production
    * composition of [[bm25SearchOf]] (term-bucketed lexical index) and
    * Similarity.ivf2SearchOf (bucket-pruned two-level ANN index) fused
    * by the SAME [[rrfFuse]] core as the gated in-memory query. Input:
    * one row per query `(qid, terms ARRAY<STRING>, embedding
    * ARRAY<FLOAT>)`. Per-query verdicts are pure functions of (query,
    * frozen indexes), so micro-batch boundaries cannot change them —
    * the streaming twin (Streams.hybridSearch) relies on it. Cost at
    * scale is the two index probes, each already increment-proportional
    * and bucket-pruned; the fusion adds O(queries × 2k) rows. */
  def hybridSearchOf(queries: DataFrame, bmPrefix: String, annPrefix: String,
      k: Int = 10, nprobeC: Int = 2, nprobeF: Int = 4): DataFrame = {
    val bmR = bm25SearchOf(queries.select(col("qid"), col("terms")), bmPrefix, k)
      .select(col("qid"), col("doc_id"), col("rank").as("r_bm25"))
    val annR = graft.queries.Similarity.ivf2SearchOf(
        queries.select(col("qid").as("vec_id"), col("embedding")),
        annPrefix, nprobeC, nprobeF)
      .select(col("qid"), col("vec_id").as("doc_id"), col("rank").as("r_ann"))
    rrfFuse(bmR, annR, k)
  }

  /** Persist the BM25 serving index: `{prefix}_tf` — the postings —
    * bucketed + sorted on the TERM so query-term restriction
    * bucket-prunes the scan (the inverted-index layout); `{prefix}_dl`
    * bucketed on doc_id (the contribution join's key); `{prefix}_stats`
    * one row. df is NOT materialized: it derives from the (pruned)
    * postings at query time, which is what makes [[appendBm25Postings]]
    * exact rather than approximately-stale. */
  def writeBm25Index(s: SparkSession, d: String, tablePrefix: String,
      buckets: Int = 32): Unit = {
    val t = table(s, d, "documents").select(col("doc_id"), split(col("text"), " ").as("ws"))
    for (tbl <- Seq("_tf", "_dl", "_stats"))
      graft.Engine.reclaimManagedTable(s, tablePrefix + tbl)
    // one tokenize pass for the whole build (the writeBandedIndex
    // discipline): the tokenized corpus persists across the `_tf` and
    // `_dl` writes and the lengths persist into the `_stats` aggregate —
    // previously each of the three writes re-scanned and re-split the
    // corpus (guide §2.4). The bucketed writes repartition onto their
    // bucket columns first (the writeIvf2Index trick) so each lands one
    // file per bucket instead of one per (task × bucket).
    val tc = t.persist()
    try {
      bm25Tf(tc).repartition(buckets, col("w"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "w").sortBy("w").saveAsTable(s"${tablePrefix}_tf")
      val dl = bm25Dl(tc).persist()
      try {
        dl.repartition(buckets, col("doc_id"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "doc_id").saveAsTable(s"${tablePrefix}_dl")
        bm25Stats(dl).write.mode("overwrite").format("parquet")
          .saveAsTable(s"${tablePrefix}_stats")
      } finally dl.unpersist(blocking = false)
    } finally {
      tc.unpersist(blocking = false)
      ()
    }
  }

  /** Append new documents into a persisted BM25 index: postings and
    * lengths shuffle INTO the existing bucket layouts (existing files
    * never rewritten), and the 1-ROW stats table is recomputed from the
    * union lengths (a metadata-cheap aggregate over `{prefix}_dl`).
    * Because df derives from the postings at query time, a search after
    * append scores EXACTLY like an index rebuilt over the union corpus
    * — no drift contract needed, unlike the ANN fits. Caller contract:
    * `docs` (doc_id, text) are not already indexed. */
  def appendBm25Postings(s: SparkSession, tablePrefix: String, docs: DataFrame): Unit =
    graft.Engine.withWriteIntent(s, tablePrefix, "bm25-append") {
      val catalog = s.sessionState.catalog
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(s"${tablePrefix}_tf")
      val buckets = catalog.getTableMetadata(ident).bucketSpec.map(_.numBuckets)
        .getOrElse(throw new IllegalStateException(
          s"${tablePrefix}_tf is not bucketed — not a BM25 serving index"))
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      bm25Tf(t).write.mode("append").format("parquet")
        .bucketBy(buckets, "w").sortBy("w").saveAsTable(s"${tablePrefix}_tf")
      bm25Dl(t).write.mode("append").format("parquet")
        .bucketBy(buckets, "doc_id").saveAsTable(s"${tablePrefix}_dl")
      bm25Stats(s.table(s"${tablePrefix}_dl"))
        .write.mode("overwrite").format("parquet").saveAsTable(s"${tablePrefix}_stats")
    }

  /** PHYSICAL takedown reclaim + file-hygiene compaction for the BM25
    * family, one verb: `_tf` and `_dl` rewrite under their own bucket
    * specs with the tombstone anti-join riding the scan (the
    * compactBucketedTable transform — the rewrite file hygiene was
    * already paying also drops the taken-down rows), the 1-row
    * `_stats` recomputes from the reclaimed lengths (N and avgdl equal
    * a rebuild-without-the-docs exactly), and the ledger clears only
    * after every table swapped — from then on bm25SearchOf's
    * no-ledger fast path (persisted stats, pass-through postings) is
    * byte-identical to pre-takedown plans. With no ledger pending
    * this is plain compaction. */
  def reclaimBm25Index(s: SparkSession, tablePrefix: String): Unit =
    graft.Engine.withWriteIntent(s, tablePrefix, "bm25-reclaim", holdOnFailure = true) {
      val pending = graft.Takedown.pending(s, tablePrefix)
      graft.Engine.compactBucketedTable(s, s"${tablePrefix}_tf",
        graft.Takedown.excluding(_, tablePrefix, "doc_id"))
      graft.Engine.compactBucketedTable(s, s"${tablePrefix}_dl",
        graft.Takedown.excluding(_, tablePrefix, "doc_id"))
      if (pending) {
        bm25Stats(s.table(s"${tablePrefix}_dl"))
          .write.mode("overwrite").format("parquet").saveAsTable(s"${tablePrefix}_stats")
        graft.Takedown.clear(s, tablePrefix)
      }
    }

  /** Search the persisted BM25 index with a (qid, terms array<string>)
    * query relation: the postings scan is restricted to the query terms
    * via [[Similarity.pruneToProbed]]'s two regimes (literal IN → bucket
    * pruning for interactive term sets, broadcast semi-join for bulk
    * batches); scoring is [[bm25Core]] verbatim. Per-query verdicts are
    * pure functions of (query, index state), so any micro-batching of
    * the query set emits identical rows — the streaming twin
    * (Streams.bm25Search) relies on exactly this. */
  def bm25SearchOf(queries: DataFrame, tablePrefix: String, k: Int = 10,
      literalProbeCap: Int = 1000): DataFrame = {
    val s = queries.sparkSession
    // materialized once (guide §2.4): the query-term relation is consumed
    // by pruneToProbed's probed-term collect AND (twice) inside bm25Core,
    // and each consumption re-evaluated the query-relation scan+explode.
    // (qid, w) ids only — query-sized at any batch size.
    val q = graft.Engine.materialize(
      queries.select(col("qid"), explode(col("terms")).as("w")).distinct())
    // logical takedown: tombstoned docs leave the score EXACTLY as a
    // rebuild-without-them would — postings and lengths anti-join the
    // broadcast ledger (df derives from the pruned postings at query
    // time, so it shrinks correctly for free), and the persisted 1-row
    // stats (N, avgdl) are recomputed from the excluded lengths while
    // a ledger is pending (a doc-count-sized aggregate; the persisted
    // row returns once reclaimBm25Index folds the takedown into the
    // files). With no ledger every branch is a pass-through — the
    // no-takedown plan is byte-identical.
    val tf = graft.Takedown.excluding(
      graft.queries.Similarity.pruneToProbed(
        s.table(s"${tablePrefix}_tf"), "w", q.select("w").distinct(), literalProbeCap),
      tablePrefix, "doc_id")
    val dl = graft.Takedown.excluding(s.table(s"${tablePrefix}_dl"), tablePrefix, "doc_id")
    val stats =
      if (graft.Takedown.pending(s, tablePrefix)) bm25Stats(dl)
      else s.table(s"${tablePrefix}_stats")
    bm25Core(q, tf, dl, stats, k)
  }

  /** BPE merge loop (see the x_text_bpe_train entry). Symbols are kept
    * as a `<s1><s2>…` encoded string: the bracket delimiters make
    * `replace(v, '<a><b>', '<ab>')` match exactly full-symbol pairs, and
    * engine `replace` semantics (left-to-right, non-overlapping) are
    * precisely BPE's merge-application rule — including the `xx` run
    * case. The corpus vocabulary is [a-z] words, so the delimiters can
    * never collide with symbol text. */
  /** [[bpeMerges]] for callers that need only the merge list: the
    * final vocab's checkpoint blocks are released immediately — a
    * caller dropping the returned DataFrame would otherwise pin one
    * materialized vocab copy in block storage per invocation until the
    * ContextCleaner GC's it (a no-op below checkpointEvery, where the
    * final vocab is an unmaterialized plan). */
  private def bpeMergesOnly(v0: DataFrame, steps: Int): Seq[(Long, String, String, Long)] = {
    val (merges, _, ckpt) = bpeMerges(v0, steps)
    ckpt.foreach(_.unpersist(blocking = false))
    merges
  }

  private def bpeTrain(s: SparkSession, d: String, steps: Int): DataFrame = {
    import s.implicits._
    val v0 = bpeVocab(s, d).persist()
    try bpeMergesOnly(v0, steps).toDF("step", "lhs", "rhs", "pair_count").orderBy("step")
    finally v0.unpersist(blocking = false)
  }

  /** [[bpeTrain]] through the batched trainer — same output contract
    * (the x_text_bpe_train_batched gate runs it against the sequential
    * oracle). */
  private def bpeTrainBatched(s: SparkSession, d: String, steps: Int): DataFrame = {
    import s.implicits._
    val v0 = bpeVocab(s, d).persist()
    try bpeMergesBatchedOnly(v0, steps).toDF("step", "lhs", "rhs", "pair_count").orderBy("step")
    finally v0.unpersist(blocking = false)
  }

  /** Per-language tokenizer fertility under the trained merges — see
    * the x_text_bpe_fertility entry. The lang-aware vocabulary carries
    * the RAW word alongside its encoding so char masses survive the
    * merge chain; merges themselves come from the corpus-wide trained
    * chain (one cached scan), applied as the same replace fold.
    * private[queries]: the unigram fertility comparison (Unigram.scala)
    * reuses it as the BPE side of its per-language row. */
  private[queries] def bpeFertilityOf(s: SparkSession, d: String, steps: Int): DataFrame = {
    val v0 = bpeVocab(s, d).persist()
    val merges = try bpeMergesOnly(v0, steps) finally v0.unpersist(blocking = false)
    val lv = table(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
      .withColumn("v", expr("concat_ws('', transform(split(w, ''), c -> concat('<', c, '>')))"))
    val applied = merges.foldLeft(lv) { case (v, (_, a, b, _)) =>
      v.withColumn("v", expr(s"replace(v, '<$a><$b>', '<$a$b>')"))
    }
    applied
      .select(col("lang"), col("n"),
        size(expr("split(substring(v, 2, length(v) - 2), '><')")).cast("long").as("ntok"),
        length(col("w")).cast("long").as("nchars"))
      .groupBy("lang")
      .agg(sum("n").as("words"),
        sum(col("n") * col("ntok")).as("tokens"),
        sum(col("n") * col("nchars")).as("chars"))
      .select(col("lang"), col("words"), col("tokens"),
        (col("tokens").cast("double") / col("words")).as("fertility"),
        (col("chars").cast("double") / col("tokens")).as("chars_per_token"))
      .orderBy("lang")
  }

  /** Tokenize the corpus into input ids — see the x_text_tokenize_ids
    * entry. Token ids rank by (corpus count DESC, token ASC) — the
    * conventional frequency-ordered id assignment, deterministic. */
  private def tokenizeIds(s: SparkSession, d: String, steps: Int): DataFrame =
    tokenizeOf(table(s, d, "documents").filter(col("doc_id") < 100),
      bpeFit(s, d, steps)).orderBy("doc_id")

  /** The frozen tokenizer: the ordered merge list (plain values — the
    * training control decisions) and the frequency-ordered token→id
    * table (vocabulary-sized, broadcast at apply time). */
  case class BpeModel(merges: Seq[(Long, String, String, Long)], ids: DataFrame)

  /** Persist a freshly trained BPE model as two plain parquet tables —
    * the frozen tokenizer artifact a serving fleet loads by name (the
    * Wordpiece/Unigram writeModel pattern, completing the tokenizer
    * lifecycle matrix's one asymmetric cell, round 19):
    * `${tablePrefix}_merges` (step, lhs, rhs, pair_count — the
    * rank-ordered training control decisions) and `${tablePrefix}_ids`
    * (token, id — the frequency-ordered id table). Both are
    * vocabulary/steps-sized, no bucketing — they localize wherever the
    * model is applied. */
  def writeBpeModel(s: SparkSession, d: String, steps: Int, tablePrefix: String): Unit = {
    import s.implicits._
    val m = bpeFitUncached(s, d, steps)
    graft.Engine.reclaimManagedTable(s, s"${tablePrefix}_merges")
    m.merges.toDF("step", "lhs", "rhs", "pair_count")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${tablePrefix}_merges")
    graft.Engine.reclaimManagedTable(s, s"${tablePrefix}_ids")
    m.ids.write.mode("overwrite").format("parquet").saveAsTable(s"${tablePrefix}_ids")
  }

  /** Reconstruct a [[BpeModel]] from the tables [[writeBpeModel]] wrote
    * — merges reload in training order (steps-sized, a driver list by
    * contract); ids stay a relation ([[tokenizeOf]] localizes them into
    * the serving expression). */
  def bpeModelOf(s: SparkSession, tablePrefix: String): BpeModel = {
    val merges = s.table(s"${tablePrefix}_merges")
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    BpeModel(merges, s.table(s"${tablePrefix}_ids").select("token", "id"))
  }

  /** Canonical managed-table prefix for the write-through fit cache —
    * one model per (corpus dir, steps), path canonicalized so spelling
    * variants of one dir share a model. */
  private[graft] def bpeModelTablePrefix(d: String, steps: Int): String = {
    val tag = new java.io.File(d).getCanonicalPath
      .toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]", "_")
    s"bpe_model_${tag}_s$steps"
  }

  /** Serving memo per (session, corpus dir, steps) — the
    * Wordpiece/Unigram fittedModel contract applied to the third
    * family: a tokenizer trains once (offline) and serves many times,
    * so serving entries must not re-run the merge loop per query; the
    * memoized ids relation is LOCALIZED driver-side (vocabulary-sized —
    * as a lazy plan every consumer would replay the whole fit). Stopped
    * sessions are purged on access. Since round 19 the memo is a
    * WRITE-THROUGH cache over the persisted model tables
    * ([[bpeModelTablePrefix]]): a miss loads the tables if they exist
    * and trains-then-writes them if not, and every served id comes from
    * the RELOADED tables — so a fresh session (a serving fleet member)
    * finds the frozen model on disk instead of re-training, closing the
    * r18 "new session re-trains" bound. */
  private val fittedBpe = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[(String, Int), BpeModel]]()

  /** Drop the memoized BPE model(s) for (session, corpus dir) AND the
    * write-through model tables — call after the corpus at `d` is
    * rewritten in place (the Dedup.invalidateClusters contract; like it,
    * advisory for in-flight fits — version the corpus dir for strict
    * semantics). */
  def invalidateBpeModel(s: SparkSession, d: String): Unit = {
    val inner = fittedBpe.get(s)
    if (inner != null) { inner.keySet.removeIf(_._1 == d); () }
    val stem = bpeModelTablePrefix(d, 0).stripSuffix("s0")
    s.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(stem))
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }

  private[graft] def bpeFit(s: SparkSession, d: String, steps: Int): BpeModel = {
    fittedBpe.keySet.removeIf(sess => sess.sparkContext.isStopped)
    val perSession = fittedBpe.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[(String, Int), BpeModel]())
    // fit OUTSIDE the mapping function (the memoizedCentroids contract
    // note): racing fitters may duplicate work, winner served
    val cached = perSession.get((d, steps))
    if (cached != null) cached
    else {
      val prefix = bpeModelTablePrefix(d, steps)
      if (!s.catalog.tableExists(s"${prefix}_merges") ||
          !s.catalog.tableExists(s"${prefix}_ids"))
        writeBpeModel(s, d, steps, prefix)
      val m = bpeModelOf(s, prefix)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      m.ids.collect().foreach(rows.add)
      val built = BpeModel(m.merges, s.createDataFrame(rows, m.ids.schema))
      val prev = perSession.putIfAbsent((d, steps), built)
      if (prev != null) prev else built
    }
  }

  private[graft] def bpeFitUncached(s: SparkSession, d: String, steps: Int): BpeModel = {
    import org.apache.spark.sql.expressions.Window
    val v0 = bpeVocab(s, d).persist()
    val merges = try bpeMergesOnly(v0, steps) finally v0.unpersist(blocking = false)
    val wc = table(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val ids = merges.foldLeft(
      wc.withColumn("v",
        expr("concat_ws('', transform(split(w, ''), c -> concat('<', c, '>')))"))) {
      case (v, (_, a, b, _)) => v.withColumn("v", expr(s"replace(v, '<$a><$b>', '<$a$b>')"))
    }
      .select(col("n"), explode(expr("split(substring(v, 2, length(v) - 2), '><')")).as("token"))
      .groupBy("token").agg(sum("n").as("cnt"))
      .withColumn("id",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("long") - 1L)
      .select("token", "id")
    BpeModel(merges, ids)
  }

  /** Tokenize any (doc_id, text) relation against a frozen [[BpeModel]]
    * — ONE zero-shuffle narrow map: the merge-chain replay and the id
    * lookup both live inside [[graft.functions.BpeTokenize]] (the
    * WordpieceTokenize treatment; the model's merges + vocabulary-sized
    * id table ride the plan as driver-built structures). Apply-time
    * words the training vocab never saw still decompose; symbols
    * outside the id table (a truly unseen character) map to the
    * conventional -1 unk id rather than silently dropping. Per-doc
    * outputs are pure functions of (doc, model) — the streaming twin
    * relies on it. */
  private[graft] def tokenizeOf(docs: DataFrame, m: BpeModel): DataFrame = {
    val idMap = m.ids.select("token", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // The training chain's '<sym>' delimiter encoding is only
    // unambiguous when the corpus alphabet excludes '<' and '>': a
    // corpus angle bracket would mangle the replace-chain (and the
    // oracle's identical replace) before any token forms. Detected
    // here on the driver-side vocabulary — a clean corpus can never
    // produce a token containing a delimiter, so a hit is exactly the
    // alphabet violation. Zero extra corpus scans.
    val bad = idMap.keysIterator.filter(t => t.contains('<') || t.contains('>')).toSeq
    require(bad.isEmpty, "BPE '<sym>' delimiter encoding is ambiguous: corpus alphabet " +
      s"must exclude '<' and '>' but the trained vocabulary contains ${bad.mkString(", ")}")
    val ids = graft.functions.BpeTokenize.of(col("text"),
      m.merges.map { case (_, a, b, _) => (a, b) }, idMap)
    docs.select(col("doc_id"), ids.as("ids"))
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_tokens"),
        expr("array_join(transform(ids, i -> CAST(i AS STRING)), ' ')").as("ids_str"))
  }

  /** The delimiter-encoded `<s1><s2>…` vocabulary with word counts — one
    * corpus scan; shared by training and application. */
  private[graft] def bpeVocab(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(expr("concat_ws('', transform(split(w, ''), c -> concat('<', c, '>')))").as("v"),
        col("n"))

  /** The trained merge list (step, lhs, rhs, pair_count) over a vocab
    * relation the CALLER persists — the corpus is scanned once into the
    * vocabulary and every merge step's pair count reads the cache (the
    * per-step driver argmax otherwise re-ran the corpus scan: a measured
    * 3 corpus passes → 1 at sf0.1). Memo-free beyond that: each step's
    * argmax is one driver row over a vocabulary-sized aggregate — the
    * loop is inherently sequential (merge k+1's counts depend on merge
    * k's rewrite), so the driver round-trips are the algorithm, not an
    * accident; each moves ONE row.
    *
    * Deep-vocab scaling: every step stacks a `replace` projection onto
    * the vocab lineage, so an unchecked 32k-merge run would carry an
    * O(steps)-deep plan whose re-analysis cost grows quadratically.
    * `checkpointEvery` bounds it — the evolving vocab is
    * localCheckpoint'ed (materialized, lineage truncated to a leaf)
    * every K merges, so plan depth never exceeds K projections over a
    * leaf and each step's pair count reads the latest materialization.
    * Also returns the final vocab so callers (and the depth-64 spec)
    * can pin the bounded plan. Training stops early if no pair remains
    * (fully merged corpus). */
  /** Materialize the evolving vocab into locally-checkpointed RDD
    * blocks and wrap them back as a LEAF DataFrame, returning the RDD
    * handle alongside. The handle is what makes eager release real:
    * `Dataset.unpersist` routes through the CacheManager, which has no
    * entry for checkpoint-backed datasets (only for `persist`ed ones),
    * so calling it on the checkpoint was a silent no-op and the blocks
    * lived until the ContextCleaner GC'd the RDD — `rdd.unpersist` on
    * the returned handle frees them NOW, which is what keeps a deep
    * training run at O(1) live vocab copies. */
  private[queries] def checkpointVocab(v: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    // coalesce to the session's base shuffle parallelism before
    // checkpointing: `.rdd` freezes whatever partition count the plan
    // ends on — under the wide-start AQE config (initialPartitionNum
    // 512) that can be 512 near-empty partitions, and every job of
    // every LATER merge step then schedules 512 tasks against a
    // vocabulary-sized relation. Only deep trainings checkpoint
    // (checkpointEvery=16), so this bounds the depth-64 path, not the
    // 3-step gate queries. coalesce is a narrow merge — no shuffle —
    // and a cluster submit that raises shuffle.partitions raises this
    // bound with it.
    val n = math.max(1, v.sparkSession.sessionState.conf.numShufflePartitions)
    val rdd = v.rdd.coalesce(n)
    rdd.localCheckpoint()
    rdd.count() // materialize: later steps read blocks, not lineage
    (v.sparkSession.createDataFrame(rdd, v.schema), rdd)
  }

  /** One pair-counting pass over a delimiter-encoded vocab: (a, b, cnt)
    * for every adjacent symbol pair, weighted by word count. */
  private def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("n"), expr("split(substring(v, 2, length(v) - 2), '><')").as("syms"))
      .filter(size(col("syms")) >= 2) // Spark's sequence(1, 0) steps DOWN, not empty
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
      .groupBy("p.a", "p.b").agg(sum("n").as("cnt"))

  private[graft] def bpeMerges(v0: DataFrame, steps: Int,
      checkpointEvery: Int = 16): (Seq[(Long, String, String, Long)], DataFrame,
      Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]) = {
    var vocab = v0
    var prevCkpt: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to steps if !exhausted) {
      val top = bpePairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step.toLong, a, b, cnt))
        vocab = vocab.select(expr(s"replace(v, '<$a><$b>', '<$a$b>')").as("v"), col("n"))
        if (step % checkpointEvery == 0) {
          val (ckpt, rdd) = checkpointVocab(vocab)
          // the previous checkpoint's blocks are dead once the new one
          // materializes — release them at the RDD level so a 32k-merge
          // run holds O(1) vocab copies, not O(steps / K)
          prevCkpt.foreach(_.unpersist(blocking = false))
          prevCkpt = Some(rdd)
          vocab = ckpt
        }
      }
    }
    (merges.result(), vocab, prevCkpt)
  }

  /** EXACT batched BPE training: identical merge list to [[bpeMerges]]
    * (TextAnalysisSpec pins equality at depth 256), but each driver
    * round fetches the top-`fetchK` pair rows and accepts a provably
    * safe PREFIX of them in one round — cutting a 32k-merge run from
    * 32k sequential count→argmax→rewrite round-trips to roughly
    * 32k / accepted-per-round (each round still moves only O(fetchK)
    * rows to the driver). This is NOT the approximate "batch the top-K"
    * heuristic some tokenizer trainers ship: the acceptance rule below
    * makes the batched run bit-identical to the greedy sequential
    * algorithm, counts included.
    *
    * Why the prefix is exact — rows sorted by (cnt DESC, a, b), the
    * sequential tie-break:
    *
    *  1. SYMBOL-DISJOINT: an accepted pair's symbols may not appear
    *     among any earlier accepted pair's symbols or its merged
    *     concatenation. Applying merge j only removes `a_j b_j`
    *     adjacencies and creates adjacencies involving the fused symbol
    *     `a_jb_j`, so a disjoint later pair's occurrence count is
    *     UNTOUCHED by merge j — at its sequential turn it still has
    *     exactly the pre-batch count the driver fetched.
    *  2. STRICT-COUNT CEILING: a pair CREATED by merge j has the form
    *     (x, a_jb_j) or (a_jb_j, y), and each of its occurrences embeds
    *     an occurrence of the parent pair (x, a_j) / (b_j, y) — so its
    *     count is bounded by a parent's pre-batch count. Parents share
    *     a symbol with an accepted merge, so they are NOT accepted rows
    *     (those are pairwise disjoint): every parent is a non-accepted
    *     pair, bounded by the first non-accepted row's count (sorted
    *     order), or by the last fetched row's count for pairs beyond
    *     the fetch horizon. Trimming the prefix until the last accepted
    *     count STRICTLY exceeds that ceiling guarantees no created (or
    *     decreased — decreases only help) pair can reach, let alone
    *     beat, any accepted row's count; strictness also kills
    *     tie-break steals. Within the prefix, equal-count rows resolve
    *     in fetched order — the same (cnt DESC, a, b) order sequential
    *     argmax uses.
    *  3. NOVEL-FUSION CLOSE: rule 2's ceiling bounds the count a
    *     created pair can have only when that pair is NEW. If the fused
    *     symbol `a_jb_j` already exists in the corpus (created by an
    *     earlier ROUND via a different split — e.g. `abc` from
    *     ('a','bc') then, now, ('ab','c') — or by an earlier row of
    *     THIS batch), a "created" pair (x, a_jb_j) may have pre-batch
    *     occurrences too, and its true sequential count is pre + created
    *     — up to 2× the ceiling, enough to out-argmax a later accepted
    *     row whose count only strictly exceeds 1× the ceiling. So a row
    *     whose fusion is not novel CLOSES the batch after itself,
    *     exactly like a self-pair: as the LAST accepted row there is no
    *     later row to protect, its own count was untouched by the
    *     disjoint merges before it, and the next round recounts fresh.
    *     The driver knows novelty exactly: the live symbol universe is
    *     (v0's distinct symbols) ∪ (fusions of merges accepted so far) —
    *     one vocabulary-sized distinct pass at training start, then
    *     O(1) per merge. TextAnalysisSpec pins the hazard corpus where
    *     the rule-1/2-only prefix provably diverges from sequential.
    *
    * Rounds where the corpus serializes merges (each top pair chaining
    * on the previous — `t h`, `th e`, `the _`) degrade gracefully to
    * accepted=1, i.e. exactly the sequential algorithm; natural-language
    * pair distributions spread across many disjoint words, which is
    * where the batching pays. */
  /** The pure acceptance rule of [[bpeMergesBatched]]: given the top
    * `fetchK` pair rows of one round (sorted (cnt DESC, a, b)) and the
    * symbol universe `known` (rule 3), return the length of the prefix
    * that is provably safe to merge in one round. Pure and
    * driver-side-only so the spec can property-simulate it against a
    * reference greedy loop over hundreds of corpora without touching
    * Spark. */
  private[graft] def bpeAcceptPrefix(rows: Array[(String, String, Long)],
      fetchK: Int, known: String => Boolean): Int = {
    // rule 1: maximal symbol-disjoint prefix. A SELF-pair (a, a) closes
    // the prefix after itself: merging it creates pairs like (aa, a)
    // whose parent is the accepted row ITSELF (count up to cnt_j >
    // ceiling), so rule 2's parent bound would not protect any row
    // accepted after it — as the LAST accepted row there is no later
    // row to protect, and the next round recounts fresh. Rule 3: a row
    // whose fusion a+b ALREADY EXISTS closes the prefix the same way —
    // pairs touching a pre-existing symbol gain count on top of their
    // pre-batch count, so rule 2's ceiling would under-bound them for
    // any later accepted row.
    val used = scala.collection.mutable.Set.empty[String]
    var c = 0
    var stop = false
    while (c < rows.length && !stop) {
      val (a, b, _) = rows(c)
      if (used(a) || used(b)) stop = true
      else {
        // in-batch fusion duplicate — an EARLIER accepted row of this
        // same batch already fuses to a+b (('a','bc') then ('ab','c')
        // → 'abc'): captured BEFORE this row's own symbols are
        // inserted, it is exactly the "earlier row of THIS batch"
        // half of rule 3 — without it both rows' created pairs stack
        // on one symbol, reaching 2× the rule-2 ceiling and
        // out-argmaxing a later accepted row (the pinned hazard
        // corpus in TextAnalysisSpec diverges on rules 1-2 + known)
        val dup = used(a + b)
        used += a; used += b; used += (a + b); c += 1
        if (a == b || known(a + b) || dup) stop = true
      }
    }
    // rule 2: strict-count trim. ceiling(p) = the largest count a
    // non-accepted (hence parent-eligible) pair can have once rows
    // 0..p-1 are the accepted set; None iff the fetch was provably
    // exhaustive and everything fetched is accepted (no parents exist
    // at all, so no pair can be created).
    val exhaustiveFetch = rows.length < fetchK
    def ceiling(p: Int): Option[Long] =
      if (p < rows.length) Some(rows(p)._3)
      else if (!exhaustiveFetch) Some(rows.last._3)
      else None
    var p = c
    while (p > 1 && ceiling(p).exists(_ >= rows(p - 1)._3)) p -= 1
    p
  }

  private[graft] def bpeMergesBatched(v0: DataFrame, steps: Int,
      fetchK: Int = 64, checkpointEvery: Int = 16,
      roundHook: Int => Unit = _ => ()): (Seq[(Long, String, String, Long)],
      DataFrame, Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]) = {
    require(fetchK >= 1, "fetchK must be positive")
    var vocab = v0
    var prevCkpt: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    // rule 3's symbol universe: every symbol alive now or ever created.
    // Seeded by one distinct pass over v0 (alphabet-sized result — for a
    // character-split corpus this is the character set), then grown by
    // one entry per accepted merge; conservative if a symbol's last
    // occurrence is later consumed (closing early is always exact).
    // SIZE GUARD on the driver-side collect below: it is bounded by
    // v0's DISTINCT SYMBOL count, which for the char-split v0 this
    // trainer consumes is alphabet-sized (tens to a few thousand for
    // CJK). A WORD-split v0 would make it vocabulary-sized — if a
    // future caller feeds one, seed `known` from a count-thresholded
    // distinct or a bloom instead of collecting the full set.
    val known = scala.collection.mutable.Set.empty[String]
    v0.select(explode(expr("split(substring(v, 2, length(v) - 2), '><')")).as("sym"))
      .distinct().collect().foreach(r => known += r.getString(0))
    var done = 0
    var sinceCkpt = 0
    var exhausted = false
    while (done < steps && !exhausted) {
      val rows = bpePairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(fetchK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (rows.isEmpty) exhausted = true
      else {
        val p = bpeAcceptPrefix(rows, fetchK, known)
        val accept = rows.take(math.min(p, steps - done))
        accept.foreach { case (a, b, _) => known += (a + b) }
        for (((a, b, cnt), i) <- accept.zipWithIndex)
          merges += ((done + i + 1L, a, b, cnt))
        // application order == sequential order: chained left-to-right
        // replaces, one projection per merge
        for ((a, b, _) <- accept)
          vocab = vocab.select(expr(s"replace(v, '<$a><$b>', '<$a$b>')").as("v"), col("n"))
        roundHook(accept.length) // observability: accepted-per-round
        done += accept.length
        sinceCkpt += accept.length
        if (sinceCkpt >= checkpointEvery) {
          val (ckpt, rdd) = checkpointVocab(vocab)
          prevCkpt.foreach(_.unpersist(blocking = false))
          prevCkpt = Some(rdd)
          vocab = ckpt
          sinceCkpt = 0
        }
      }
    }
    (merges.result(), vocab, prevCkpt)
  }

  /** [[bpeMergesBatched]] for callers that need only the merge list —
    * the [[bpeMergesOnly]] twin. */
  private def bpeMergesBatchedOnly(v0: DataFrame, steps: Int): Seq[(Long, String, String, Long)] = {
    val (merges, _, ckpt) = bpeMergesBatched(v0, steps)
    ckpt.foreach(_.unpersist(blocking = false))
    merges
  }

  /** Tokenize the corpus WITH the trained merges and report the top-20
    * resulting tokens — the train → apply loop closed. Application is a
    * chain of `steps` narrow string replaces over the vocabulary (the
    * merge-order-matters contract of BPE), then one explode + partial
    * aggregate; at 100 TB the replace chain maps over the corpus scan
    * and only (token, count) rows shuffle. */
  private def bpeApply(s: SparkSession, d: String, steps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v0 = bpeVocab(s, d).persist()
    val merges = try bpeMergesOnly(v0, steps) finally v0.unpersist(blocking = false)
    // the returned plan is LAZY, so it folds over a fresh (uncached)
    // vocab lineage: one corpus scan at training (cached across the 3
    // argmax steps) + one when the result executes
    val applied = merges.foldLeft(bpeVocab(s, d)) { case (v, (_, a, b, _)) =>
      v.select(expr(s"replace(v, '<$a><$b>', '<$a$b>')").as("v"), col("n"))
    }
    val wr = Window.orderBy(col("cnt").desc, col("token"))
    applied
      .select(col("n"), explode(expr("split(substring(v, 2, length(v) - 2), '><')")).as("token"))
      .groupBy("token").agg(sum("n").as("cnt"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("token"), col("cnt"))
      .orderBy("rank")
  }

  /** The Gopher rule battery over a `(doc_id, text, …)` relation — a
    * pure per-row projection (every statistic, including the top-bigram
    * mode count via a sorted-run fold, is computed inside the row), so
    * the SAME function is the batch query body and the streaming gate
    * (`Streams.gopherGate`): stateless ⇒ stream == batch by
    * construction, no watermark or state store involved. */
  def gopherRules(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("sumlen", expr("aggregate(ws, 0L, (a, w) -> a + length(w))"))
      .withColumn("n_stop", size(expr(
        "filter(ws, w -> array_contains(array('the','a','of','to','and','in','is'), w))"))
        .cast("long"))
      .withColumn("nbg", greatest(col("n") - 1, lit(0L)))
      // top-bigram occurrence count: sort the bigram array, fold a
      // (prev, run, best) accumulator — longest equal-run of a sorted
      // array IS the mode count; per-row, no explode, no shuffle
      .withColumn("best", expr(
        """aggregate(
          |  array_sort(transform(sequence(1, greatest(size(ws) - 1, 0)),
          |    i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
          |  (acc, x) -> named_struct(
          |    'prev', x,
          |    'run', IF(acc.prev <=> x, acc.run + 1L, 1L),
          |    'best', greatest(acc.best, IF(acc.prev <=> x, acc.run + 1L, 1L))),
          |  acc -> acc.best)""".stripMargin))
      .select(
        col("doc_id"),
        col("n").as("n_words"),
        (col("sumlen").cast("double") / col("n")).as("mean_word_len"),
        col("n_stop"),
        when(col("nbg") > 0, col("best").cast("double") / col("nbg"))
          .otherwise(lit(0.0)).as("top_bigram_share"),
        (col("n") >= 25 && col("n") <= 90).as("r_nwords"),
        (col("sumlen") * 10 >= col("n") * 40 && col("sumlen") * 10 <= col("n") * 49)
          .as("r_wordlen"),
        (col("n_stop") >= 2).as("r_stopword"),
        (col("best") * 100 <= col("nbg") * 6).as("r_repetition"))
      .withColumn("pass",
        col("r_nwords") && col("r_wordlen") && col("r_stopword") && col("r_repetition"))

  /** Gopher repetition thresholds (percent × 1): top-{2,3,4}-gram
    * character share caps and duplicate-{5..10}-gram character fraction
    * caps, from the published filter battery (Rae et al. 2021, table
    * A1). Shared by the Spark battery and the oracle generator so the
    * two verdicts derive from literally the same integers. */
  private[queries] val GopherTopCaps: Map[Int, Int] = Map(2 -> 20, 3 -> 18, 4 -> 16)
  private[queries] val GopherDupCaps: Map[Int, Int] =
    Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  /** The FULL Gopher repetition battery over a `(doc_id, text, …)`
    * relation — the word-n-gram half of the published filter (the
    * line/paragraph half needs line structure this corpus has none of;
    * stated bound). Per document:
    *
    *   - top-{2,3,4}-gram character share: occurrences of the most
    *     frequent n-gram × its character mass / total character mass
    *     (ties broken toward the lexicographically smallest gram — a
    *     total order, so both engines pick the same winner);
    *   - duplicate-{5..10}-gram character fraction: the character mass
    *     of word positions COVERED by ≥1 occurrence of any n-gram that
    *     occurs ≥2 times in the document, / total character mass — a
    *     coverage union (overlapping occurrences never double-count),
    *     the same interval discipline as the substring-dedup rewrite.
    *
    * Everything is computed INSIDE the row: the per-n top gram is a
    * sorted-run fold (mode of a sorted array), the duplicated-gram set
    * is the same fold collecting run-length-2 grams, and coverage is a
    * per-position exists() over the gram-flag window. Zero shuffles at
    * any corpus size — like [[gopherRules]] this is a pure narrow
    * projection, so it doubles as a streaming annotate-at-ingest gate
    * unchanged. Rule verdicts compare in INTEGER arithmetic
    * (mass·100 ≤ total·cap) so the booleans are engine-portable; the
    * reported ratio columns are single fixed-order divisions of exact
    * int64s — bit-identical across engines. */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    // grams_n / dup-set / coverage expressions, all over `ws` + `nw`
    def gramsSql(n: Int) =
      s"""IF(size(ws) < $n, CAST(array() AS ARRAY<STRING>),
         |  transform(sequence(1, size(ws) - ${n - 1}),
         |    i -> concat_ws(' ', slice(ws, i, $n))))""".stripMargin
    // (cnt, chars) of the most frequent n-gram: fold the SORTED gram
    // array with a (prev, run, best, bestg) accumulator — a strictly-
    // greater update keeps the FIRST maximal run, i.e. the smallest
    // gram under the sort order, matching the oracle's (cnt DESC, g)
    def topSql(n: Int) =
      s"""aggregate(array_sort(g$n),
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L,
         |               'bg', CAST(NULL AS STRING)),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run',  IF(acc.prev <=> x, acc.run + 1L, 1L),
         |    'best', IF(IF(acc.prev <=> x, acc.run + 1L, 1L) > acc.best,
         |               IF(acc.prev <=> x, acc.run + 1L, 1L), acc.best),
         |    'bg',   IF(IF(acc.prev <=> x, acc.run + 1L, 1L) > acc.best, x, acc.bg)),
         |  acc -> named_struct('cnt', acc.best,
         |    'chars', IF(acc.bg IS NULL, 0L,
         |                CAST(length(acc.bg) - ${n - 1} AS BIGINT))))""".stripMargin
    // distinct grams occurring ≥2 times in the doc: the same sorted
    // fold, appending each gram exactly when its run count reaches 2
    def dupSetSql(over: String) =
      s"""aggregate(array_sort($over),
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
         |               'ds', CAST(array() AS ARRAY<STRING>)),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run',  IF(acc.prev <=> x, acc.run + 1L, 1L),
         |    'ds',   IF(IF(acc.prev <=> x, acc.run + 1L, 1L) = 2L,
         |               array_append(acc.ds, x), acc.ds)),
         |  acc -> acc.ds)""".stripMargin
    // Character mass covered by duplicated-gram occurrences. Multiply-
    // referenced intermediates (gram array, dup set, flag array) are
    // LET-BOUND as lambda variables via single-element transform()s —
    // a plain withColumn would collapse into the consuming projection
    // and re-evaluate the array per fold iteration. The coverage union
    // itself is a left-to-right interval fold over the occurrence
    // flags: an occurrence at i covers [i, i+n-1]; only positions past
    // the previous high-water mark pay their word length — O(P +
    // covered), occurrences overlapping arbitrarily never double-count.
    def dupCharsSql(n: Int) =
      s"""element_at(transform(array(${gramsSql(n)}), g ->
         |  element_at(transform(array(${dupSetSql("g")}), ds ->
         |    IF(size(ds) = 0, 0L,
         |      element_at(transform(array(transform(g, x -> array_contains(ds, x))), fl ->
         |        aggregate(sequence(1, size(fl)),
         |          named_struct('hi', 0, 'chars', 0L),
         |          (acc, i) -> IF(element_at(fl, i),
         |            named_struct('hi', i + ${n - 1},
         |              'chars', acc.chars + aggregate(
         |                slice(ws, greatest(i, acc.hi + 1),
         |                      i + ${n - 1} - greatest(i, acc.hi + 1) + 1),
         |                0L, (a, w) -> a + length(w))),
         |            acc),
         |          acc -> acc.chars)), 1))), 1)), 1)""".stripMargin
    def share(massCol: org.apache.spark.sql.Column) =
      when(col("total") === 0L, lit(0.0))
        .otherwise(massCol.cast("double") / col("total").cast("double"))

    var df = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("total", expr("aggregate(ws, 0L, (a, w) -> a + length(w))"))
    for (n <- GopherTopCaps.keys.toSeq.sorted) df = df
      .withColumn(s"g$n", expr(gramsSql(n)))
      .withColumn(s"top$n", expr(topSql(n)))
      .drop(s"g$n")
    for (n <- GopherDupCaps.keys.toSeq.sorted) df = df
      .withColumn(s"dc$n", expr(dupCharsSql(n)))
    val tops = GopherTopCaps.keys.toSeq.sorted.flatMap { n =>
      Seq(share(col(s"top$n.cnt") * col(s"top$n.chars")).as(s"top${n}_share"),
        (col(s"top$n.cnt") * col(s"top$n.chars") * 100 <=
          col("total") * GopherTopCaps(n)).as(s"r_top$n"))
    }
    val dups = GopherDupCaps.keys.toSeq.sorted.flatMap { n =>
      Seq(share(col(s"dc$n")).as(s"dup${n}_frac"),
        (col(s"dc$n") * 100 <= col("total") * GopherDupCaps(n)).as(s"r_dup$n"))
    }
    val rules = GopherTopCaps.keys.toSeq.sorted.map(n => col(s"r_top$n")) ++
      GopherDupCaps.keys.toSeq.sorted.map(n => col(s"r_dup$n"))
    df.select(col("doc_id") +: (tops ++ dups): _*)
      .withColumn("pass", rules.reduce(_ && _))
  }

  /** Gopher duplicate-line / duplicate-paragraph fractions (round 19 —
    * the structural half of the published repetition battery; the
    * word-n-gram half is [[gopherRepetition]]). Rules and thresholds
    * from Rae et al. Table A1 in the Dolma formulation: a line
    * (paragraph) is "duplicate" when its exact text occurs ≥ 2 times in
    * the document, EVERY occurrence counts — duplicate-line fraction ≤
    * 0.30, duplicate-paragraph fraction ≤ 0.30, and the character-mass
    * twins ≤ 0.20 each.
    *
    * The synthetic corpus has no line structure (the stated r18 bound),
    * so the gate SYNTHESIZES it deterministically on both engines (the
    * piiPlanted pattern): lines are 5-word chunks of the text;
    * paragraphs are 3-line chunks of the final line array joined with
    * chr(10). Duplicates are PLANTED — docs id%4 repeat their first
    * line; docs id%9 (with ≥ 3 base lines) repeat their whole first
    * paragraph, first padding the line array to a 3-boundary with
    * copies of line 1 so the planted paragraph tiles exactly — both
    * verdict classes at every scale, and the planted paragraph is a
    * REAL paragraph duplicate, not an alignment accident. Verdicts
    * compare in integer arithmetic (cnt*100 <= n*30, chars*100 <=
    * total*20) so the booleans are engine-portable; the reported
    * fractions are single fixed-order divisions.
    *
    * Scale shape: like the n-gram half, a pure zero-shuffle narrow
    * projection — line synthesis, the sorted-run duplicate fold and
    * both char masses are in-row array work, so the battery rides one
    * corpus scan at any size. */
  def gopherRepetitionLines(docs: DataFrame): DataFrame = {
    // final line array: base 5-word chunks + the planted duplicates —
    // let-bound via single-element transform()s (the gopherRepetition
    // note: a plain withColumn would inline and re-evaluate per use)
    val linesSql =
      """element_at(transform(array(transform(sequence(1, (size(ws) + 4) div 5),
        |    k -> array_join(slice(ws, (k - 1) * 5 + 1, 5), ' '))), base ->
        |  element_at(transform(array(
        |      IF(doc_id % 4 = 0, array_append(base, element_at(base, 1)), base)), wl ->
        |    IF(doc_id % 9 = 0 AND size(base) >= 3,
        |       concat(wl,
        |         array_repeat(element_at(base, 1), (3 - size(wl) % 3) % 3),
        |         slice(base, 1, 3)),
        |       wl)), 1)), 1)""".stripMargin
    val parasSql =
      """transform(sequence(1, (size(lines) + 2) div 3),
        |  j -> array_join(slice(lines, (j - 1) * 3 + 1, 3), chr(10)))""".stripMargin
    // (duplicate occurrences, duplicate char mass) in ONE sorted-run
    // fold: when a run reaches 2 both occurrences turn duplicate (+2),
    // each further repeat adds 1 — Σ_{cnt≥2} cnt, the Dolma count
    def dupFold(over: String) =
      s"""aggregate(array_sort($over),
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'cnt', 0L, 'chars', 0L),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run',  IF(acc.prev <=> x, acc.run + 1L, 1L),
         |    'cnt',  acc.cnt + IF(acc.prev <=> x, IF(acc.run = 1L, 2L, 1L), 0L),
         |    'chars', acc.chars + IF(acc.prev <=> x, IF(acc.run = 1L, 2L, 1L) * length(x), 0L)),
         |  acc -> named_struct('cnt', acc.cnt, 'chars', acc.chars))""".stripMargin
    def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0L, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("lines", expr(linesSql))
      .withColumn("paras", expr(parasSql))
      .withColumn("lchars", expr("aggregate(lines, 0L, (a, x) -> a + length(x))"))
      .withColumn("pchars", expr("aggregate(paras, 0L, (a, x) -> a + length(x))"))
      .withColumn("ld", expr(dupFold("lines")))
      .withColumn("pd", expr(dupFold("paras")))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        col("ld.cnt").as("dup_line_cnt"),
        frac(col("ld.cnt"), size(col("lines")).cast("long")).as("dup_line_frac"),
        (col("ld.cnt") * 100 <= size(col("lines")).cast("long") * 30).as("r_dup_line"),
        frac(col("ld.chars"), col("lchars")).as("dup_line_char_frac"),
        (col("ld.chars") * 100 <= col("lchars") * 20).as("r_dup_line_chars"),
        size(col("paras")).cast("long").as("n_paras"),
        col("pd.cnt").as("dup_para_cnt"),
        frac(col("pd.cnt"), size(col("paras")).cast("long")).as("dup_para_frac"),
        (col("pd.cnt") * 100 <= size(col("paras")).cast("long") * 30).as("r_dup_para"),
        frac(col("pd.chars"), col("pchars")).as("dup_para_char_frac"),
        (col("pd.chars") * 100 <= col("pchars") * 20).as("r_dup_para_chars"))
      .withColumn("pass", col("r_dup_line") && col("r_dup_line_chars") &&
        col("r_dup_para") && col("r_dup_para_chars"))
  }

  // ---- shared oracle CTE fragments -------------------------------------
  // The composed attributes oracle recomposes EXACTLY the fragments the
  // standalone oracles select from, so the two gates can never drift.

  /** BPE oracle steps, shared by the train / apply / fertility entries:
    * pair counting + argmax (`p$i`/`b$i`) and the merge application
    * (`v$i`), over the delimiter-encoded vocabulary chain `v0..`. */
  private def bpePairStepSql(i: Int): String =
    s"""p$i AS (SELECT u.a AS a, u.b AS b, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |  SELECT n, unnest(list_transform(generate_series(1, len(s) - 1),
       |           i -> {'a': s[i], 'b': s[i+1]})) AS u
       |  FROM (SELECT string_split(substr(v, 2, length(v) - 2), '><') AS s, n FROM v${i - 1}))
       |  GROUP BY u.a, u.b),
       |b$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin

  private def bpeMergeStepSql(i: Int): String =
    s"""v$i AS (SELECT replace(v, '<' || b$i.a || '><' || b$i.b || '>',
       |                 '<' || b$i.a || b$i.b || '>') AS v, n
       |       FROM v${i - 1}, b$i)""".stripMargin

  /** The BM25 oracle chain up to the ranked list (`bm_ranked(qid,
    * doc_id, score, rank)`) — shared by x_text_bm25, the hybrid-RRF
    * fusion and the takedown gate so the lexical side is stated once.
    * `corpusWhere` scopes the corpus CTE (the takedown oracle passes
    * the victim exclusion) — a parameter, not post-hoc string surgery,
    * so a rewording of the chain can never silently turn the exclusion
    * into a no-op. */
  private def bm25Ctes(corpusWhere: String = ""): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') ws FROM documents$corpusWhere),
      |tfc AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
      |        FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY doc_id, w),
      |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM t),
      |g AS (SELECT CAST(count(*) AS DOUBLE) AS nn, sum(dl) AS sdl FROM dl),
      |q AS (SELECT DISTINCT doc_id AS qid, unnest(ws[1:3]) AS w FROM t WHERE doc_id < 5),
      |dft AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tfc
      |        WHERE w IN (SELECT w FROM q) GROUP BY w),
      |contrib AS (
      |  SELECT q.qid, x.doc_id, x.w,
      |         floor(ln(1.0 + (g.nn - f.df + 0.5) / (f.df + 0.5)) * 1000000.0)
      |           / 1000000.0 * x.tf * 2.2 /
      |           (x.tf + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE)
      |              / (CAST(g.sdl AS DOUBLE) / g.nn))) AS c
      |  FROM tfc x JOIN q ON x.w = q.w JOIN dft f ON x.w = f.w
      |  JOIN dl l ON x.doc_id = l.doc_id CROSS JOIN g),
      |bm_scored AS (SELECT qid, doc_id, list_sum(list(c ORDER BY w)) AS score
      |           FROM contrib GROUP BY qid, doc_id),
      |bm_ranked AS (SELECT qid, doc_id, score,
      |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) rank
      |           FROM bm_scored)""".stripMargin

  /** The 3-step BPE fertility oracle chain, ending in
    * `bpe_fert(lang, words, tokens, fertility, chars_per_token)` — the
    * full SELECT stated once so the unigram fertility comparison
    * (Unigram.scala) can compose it next to its own chain instead of
    * restating the merge arithmetic. lazy: referenced from the `oracle`
    * val during object init. */
  private[queries] lazy val bpeFertilityCtes: String = {
    def langMergeStep(i: Int): String =
      s"""lv$i AS (SELECT lang, w, n, replace(v, '<' || b$i.a || '><' || b$i.b || '>',
         |                 '<' || b$i.a || b$i.b || '>') AS v
         |       FROM lv${i - 1}, b$i)""".stripMargin
    s"""t AS (SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
       |v0 AS (SELECT array_to_string(list_transform(string_split(w, ''),
       |               c -> '<' || c || '>'), '') AS v, n FROM t),
       |${bpePairStepSql(1)},
       |${bpeMergeStepSql(1)},
       |${bpePairStepSql(2)},
       |${bpeMergeStepSql(2)},
       |${bpePairStepSql(3)},
       |lt AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY lang, w),
       |lv0 AS (SELECT lang, w, n, array_to_string(list_transform(string_split(w, ''),
       |               c -> '<' || c || '>'), '') AS v FROM lt),
       |${langMergeStep(1)},
       |${langMergeStep(2)},
       |${langMergeStep(3)},
       |ft AS (SELECT lang, n,
       |         CAST(len(string_split(substr(v, 2, length(v) - 2), '><')) AS BIGINT) AS ntok,
       |         CAST(length(w) AS BIGINT) AS nchars
       |       FROM lv3),
       |bpe_fert AS (SELECT lang, CAST(sum(n) AS BIGINT) AS words,
       |  CAST(sum(n * ntok) AS BIGINT) AS tokens,
       |  CAST(sum(n * ntok) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS fertility,
       |  CAST(sum(n * nchars) AS DOUBLE) / CAST(sum(n * ntok) AS DOUBLE) AS chars_per_token
       |FROM ft GROUP BY lang)""".stripMargin
  }

  /** The sequential 3-step training oracle, shared verbatim by
    * x_text_bpe_train AND x_text_bpe_train_batched (sequential-equal
    * by construction). lazy: referenced from the `oracle` val during
    * object init. */
  private lazy val bpeTrainOracleSql: String =
    s"""WITH t AS (SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
       |v0 AS (SELECT array_to_string(list_transform(string_split(w, ''),
       |               c -> '<' || c || '>'), '') AS v, n FROM t),
       |${bpePairStepSql(1)},
       |${bpeMergeStepSql(1)},
       |${bpePairStepSql(2)},
       |${bpeMergeStepSql(2)},
       |${bpePairStepSql(3)}
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS step, a AS lhs, b AS rhs, cnt AS pair_count FROM b1
       |  UNION ALL SELECT 2, a, b, cnt FROM b2
       |  UNION ALL SELECT 3, a, b, cnt FROM b3) ORDER BY step""".stripMargin

  /** Gopher battery → `go_out(doc_id, n_words, mean_word_len, n_stop,
    * top_bigram_share, r_*, pass)`. */
  private[queries] val goCtes: String =
    """go_t AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
      |go_st AS (SELECT doc_id, ws,
      |  CAST(len(ws) AS BIGINT) n,
      |  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) sumlen,
      |  CAST(len(list_filter(ws,
      |    w -> list_contains(['the','a','of','to','and','in','is'], w))) AS BIGINT) n_stop,
      |  CAST(greatest(len(ws) - 1, 0) AS BIGINT) nbg
      |  FROM go_t),
      |go_bg AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS b
      |       FROM go_st, unnest(generate_series(1, len(ws) - 1)) AS u(i)
      |       WHERE len(ws) >= 2),
      |go_bc AS (SELECT doc_id, b, count(*) c FROM go_bg GROUP BY 1, 2),
      |go_tp AS (SELECT doc_id, CAST(max(c) AS BIGINT) best FROM go_bc GROUP BY 1),
      |go_out AS (SELECT s.doc_id, s.n AS n_words,
      |  CAST(s.sumlen AS DOUBLE) / s.n AS mean_word_len,
      |  s.n_stop,
      |  CASE WHEN s.nbg > 0 THEN CAST(coalesce(tp.best, 0) AS DOUBLE) / s.nbg
      |       ELSE 0.0 END AS top_bigram_share,
      |  s.n >= 25 AND s.n <= 90 AS r_nwords,
      |  s.sumlen * 10 >= s.n * 40 AND s.sumlen * 10 <= s.n * 49 AS r_wordlen,
      |  s.n_stop >= 2 AS r_stopword,
      |  coalesce(tp.best, 0) * 100 <= s.nbg * 6 AS r_repetition,
      |  (s.n >= 25 AND s.n <= 90
      |   AND s.sumlen * 10 >= s.n * 40 AND s.sumlen * 10 <= s.n * 49
      |   AND s.n_stop >= 2
      |   AND coalesce(tp.best, 0) * 100 <= s.nbg * 6) AS pass
      |FROM go_st s LEFT JOIN go_tp tp USING (doc_id))""".stripMargin

  /** Gopher repetition-battery oracle (x_text_gopher_rep) — generated
    * from the SAME threshold tables as the Spark battery, so neither
    * side can drift. The oracle states coverage relationally (distinct
    * covered word positions joined back to per-position word lengths)
    * while the engine computes the identical union as an in-row
    * interval fold — two independent formulations of one definition. */
  private def gopherRepSql: String = {
    val tops = GopherTopCaps.keys.toSeq.sorted
    val dups = GopherDupCaps.keys.toSeq.sorted
    def gramCtes(n: Int) =
      s"""gr_g$n AS (SELECT doc_id, i, array_to_string(ws[i:i + ${n - 1}], ' ') AS g
         |  FROM gr_t, unnest(generate_series(1, len(ws) - ${n - 1})) AS u(i)
         |  WHERE len(ws) >= $n),
         |gr_c$n AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) cnt
         |  FROM gr_g$n GROUP BY 1, 2)""".stripMargin
    def topCte(n: Int) =
      s"""gr_top$n AS (SELECT doc_id, cnt * CAST(length(g) - ${n - 1} AS BIGINT) AS mass
         |  FROM (SELECT doc_id, g, cnt,
         |          row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) rn
         |        FROM gr_c$n) WHERE rn = 1)""".stripMargin
    def dupCtes(n: Int) =
      s"""gr_cov$n AS (SELECT DISTINCT gi.doc_id, gi.i + o AS j
         |  FROM gr_g$n gi JOIN gr_c$n c ON c.doc_id = gi.doc_id AND c.g = gi.g
         |    AND c.cnt >= 2, unnest(generate_series(0, ${n - 1})) AS u(o)),
         |gr_dc$n AS (SELECT c.doc_id, CAST(sum(w.wl) AS BIGINT) dchars
         |  FROM gr_cov$n c JOIN gr_wp w ON w.doc_id = c.doc_id AND w.j = c.j
         |  GROUP BY 1)""".stripMargin
    def ruleTop(n: Int) =
      s"coalesce(t$n.mass, 0) * 100 <= tot.total * ${GopherTopCaps(n)}"
    def ruleDup(n: Int) =
      s"coalesce(d$n.dchars, 0) * 100 <= tot.total * ${GopherDupCaps(n)}"
    val ctes = Seq(
      "gr_t AS (SELECT doc_id, string_split(text, ' ') ws FROM documents)",
      """gr_wp AS (SELECT doc_id, i AS j, CAST(length(ws[i]) AS BIGINT) wl
        |  FROM gr_t, unnest(generate_series(1, len(ws))) AS u(i))""".stripMargin,
      "gr_tot AS (SELECT doc_id, CAST(sum(wl) AS BIGINT) total FROM gr_wp GROUP BY doc_id)") ++
      tops.map(n => s"${gramCtes(n)},\n${topCte(n)}") ++
      dups.map(n => s"${gramCtes(n)},\n${dupCtes(n)}")
    val shareCols = tops.flatMap(n => Seq(
      s"""CASE WHEN tot.total = 0 THEN 0.0
         |  ELSE CAST(coalesce(t$n.mass, 0) AS DOUBLE) / CAST(tot.total AS DOUBLE)
         |  END AS top${n}_share""".stripMargin,
      s"${ruleTop(n)} AS r_top$n")) ++
      dups.flatMap(n => Seq(
        s"""CASE WHEN tot.total = 0 THEN 0.0
           |  ELSE CAST(coalesce(d$n.dchars, 0) AS DOUBLE) / CAST(tot.total AS DOUBLE)
           |  END AS dup${n}_frac""".stripMargin,
        s"${ruleDup(n)} AS r_dup$n"))
    val passExpr = (tops.map(ruleTop) ++ dups.map(ruleDup)).mkString(" AND ")
    val joins = tops.map(n => s"LEFT JOIN gr_top$n t$n ON t$n.doc_id = tot.doc_id")
      .mkString("\n  ") + "\n  " +
      dups.map(n => s"LEFT JOIN gr_dc$n d$n ON d$n.doc_id = tot.doc_id").mkString("\n  ")
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT tot.doc_id, ${shareCols.mkString(",\n  ")},
       |  ($passExpr) AS pass
       |FROM gr_tot tot
       |  $joins
       |ORDER BY tot.doc_id""".stripMargin
  }

  /** Gopher duplicate-line/paragraph oracle (x_text_gopher_rep_lines)
    * — the same deterministic line synthesis + plants restated, but the
    * duplicate masses computed RELATIONALLY (per-doc line/paragraph
    * group-by with FILTER sums) against the engine's in-row sorted-run
    * fold — two independent formulations of the Dolma counts. */
  private def gopherRepLinesSql: String = {
    def statsCte(src: String, out: String) =
      s"""${out}_c AS (SELECT doc_id, x, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT doc_id, unnest($src) AS x FROM gl_p) GROUP BY 1, 2),
         |$out AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
         |    CAST(coalesce(sum(cnt) FILTER (WHERE cnt >= 2), 0) AS BIGINT) AS dcnt,
         |    CAST(sum(cnt * length(x)) AS BIGINT) AS tchars,
         |    CAST(coalesce(sum(cnt * length(x)) FILTER (WHERE cnt >= 2), 0) AS BIGINT) AS dchars
         |  FROM ${out}_c GROUP BY 1)""".stripMargin
    def frac(num: String, den: String) =
      s"CASE WHEN $den = 0 THEN 0.0 ELSE CAST($num AS DOUBLE) / CAST($den AS DOUBLE) END"
    s"""WITH gl_t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |gl_b AS (SELECT doc_id, list_transform(generate_series(1, (len(ws) + 4) // 5),
       |           k -> array_to_string(ws[(k - 1) * 5 + 1 : (k - 1) * 5 + 5], ' ')) AS base
       |         FROM gl_t),
       |gl_w AS (SELECT doc_id, base,
       |           CASE WHEN doc_id % 4 = 0 THEN list_append(base, base[1]) ELSE base END AS wl
       |         FROM gl_b),
       |gl_l AS (SELECT doc_id,
       |           CASE WHEN doc_id % 9 = 0 AND len(base) >= 3
       |                THEN list_concat(wl, list_concat(
       |                       list_transform(generate_series(1, (3 - len(wl) % 3) % 3),
       |                         x -> base[1]),
       |                       base[1:3]))
       |                ELSE wl END AS lines
       |         FROM gl_w),
       |gl_p AS (SELECT doc_id, lines,
       |           list_transform(generate_series(1, (len(lines) + 2) // 3),
       |             j -> array_to_string(lines[(j - 1) * 3 + 1 : (j - 1) * 3 + 3], chr(10)))
       |             AS paras
       |         FROM gl_l),
       |${statsCte("lines", "gl_ls")},
       |${statsCte("paras", "gl_ps")}
       |SELECT l.doc_id, l.n AS n_lines, l.dcnt AS dup_line_cnt,
       |  ${frac("l.dcnt", "l.n")} AS dup_line_frac,
       |  l.dcnt * 100 <= l.n * 30 AS r_dup_line,
       |  ${frac("l.dchars", "l.tchars")} AS dup_line_char_frac,
       |  l.dchars * 100 <= l.tchars * 20 AS r_dup_line_chars,
       |  p.n AS n_paras, p.dcnt AS dup_para_cnt,
       |  ${frac("p.dcnt", "p.n")} AS dup_para_frac,
       |  p.dcnt * 100 <= p.n * 30 AS r_dup_para,
       |  ${frac("p.dchars", "p.tchars")} AS dup_para_char_frac,
       |  p.dchars * 100 <= p.tchars * 20 AS r_dup_para_chars,
       |  (l.dcnt * 100 <= l.n * 30 AND l.dchars * 100 <= l.tchars * 20
       |   AND p.dcnt * 100 <= p.n * 30 AND p.dchars * 100 <= p.tchars * 20) AS pass
       |FROM gl_ls l JOIN gl_ps p USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** CCNet LM chain → `cc_out(doc_id, lang, n_tri, h, bucket)`. */
  private val ccCtes: String =
    """cc_tris AS (SELECT doc_id, lang, unnest(list_transform(
      |         generate_series(1, length(text) - 2), i -> substr(text, i, 3))) AS tri
      |       FROM documents WHERE length(text) >= 3),
      |cc_tr AS (SELECT * FROM cc_tris
      |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
      |cc_tm AS (SELECT lang, tri, CAST(count(*) AS BIGINT) AS ct FROM cc_tr GROUP BY lang, tri),
      |cc_bm AS (SELECT lang, substr(tri, 1, 2) AS bi, CAST(sum(ct) AS BIGINT) AS cb
      |       FROM cc_tm GROUP BY lang, substr(tri, 1, 2)),
      |cc_vs AS (SELECT lang, CAST(count(*) AS BIGINT) AS v FROM cc_tm GROUP BY lang),
      |cc_tf AS (SELECT doc_id, lang, tri, CAST(count(*) AS BIGINT) AS tf
      |       FROM cc_tris GROUP BY doc_id, lang, tri),
      |cc_contrib AS (SELECT tf.doc_id, tf.lang, tf.tri, tf.tf,
      |    CAST(tf.tf AS DOUBLE) * (floor(ln((coalesce(tm.ct, 0) + 1.0) /
      |       CAST(coalesce(bm.cb, 0) + vs.v AS DOUBLE)) * 1000000.0) / 1000000.0) AS c
      |  FROM cc_tf tf LEFT JOIN cc_tm tm ON tm.lang = tf.lang AND tm.tri = tf.tri
      |  LEFT JOIN cc_bm bm ON bm.lang = tf.lang AND bm.bi = substr(tf.tri, 1, 2)
      |  JOIN cc_vs vs ON vs.lang = tf.lang),
      |cc_hh AS (SELECT doc_id, lang, list_sum(list(c ORDER BY tri)) AS ll,
      |         CAST(sum(tf) AS BIGINT) AS n_tri
      |       FROM cc_contrib GROUP BY doc_id, lang),
      |cc_anch AS (SELECT d.doc_id, d.lang, coalesce(hh.n_tri, 0) AS n_tri,
      |    CASE WHEN coalesce(hh.n_tri, 0) > 0 THEN -hh.ll / hh.n_tri
      |         ELSE 0.0 END AS h
      |  FROM documents d LEFT JOIN cc_hh hh ON hh.doc_id = d.doc_id AND hh.lang = d.lang),
      |cc_r AS (SELECT lang, doc_id, h,
      |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn,
      |        count(*) OVER (PARTITION BY lang) AS cnt FROM cc_anch),
      |cc_thr AS (SELECT lang, max(CASE WHEN rn = 1 + (cnt - 1) // 3 THEN h END) AS t1,
      |          max(CASE WHEN rn = 1 + ((cnt - 1) * 2) // 3 THEN h END) AS t2
      |        FROM cc_r GROUP BY lang),
      |cc_out AS (SELECT a.doc_id, a.lang, a.n_tri, a.h,
      |  CASE WHEN a.h <= t.t1 THEN 'head'
      |       WHEN a.h <= t.t2 THEN 'middle' ELSE 'tail' END AS bucket
      |FROM cc_anch a JOIN cc_thr t USING (lang))""".stripMargin

  /** NB chain → `nb_out(doc_id, label, pred, score)`. */
  private val nbCtes: String =
    """nb_t AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
      |nb_tfc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      |        FROM (SELECT doc_id, unnest(ws) AS w FROM nb_t) GROUP BY doc_id, w),
      |nb_lab AS (SELECT vec_id AS doc_id, CAST(label AS BIGINT) AS label FROM embeddings),
      |nb_tr AS (SELECT doc_id, label FROM nb_lab
      |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
      |nb_ttf AS (SELECT label, w, CAST(sum(tf) AS BIGINT) AS c
      |        FROM nb_tfc JOIN nb_tr USING (doc_id) GROUP BY label, w),
      |nb_voc AS (SELECT DISTINCT w FROM nb_ttf),
      |nb_vc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM nb_voc),
      |nb_ls AS (SELECT label, CAST(sum(c) AS BIGINT) AS toks FROM nb_ttf GROUP BY label),
      |nb_grid AS (SELECT ls.label, voc.w,
      |           floor(ln((coalesce(ttf.c, 0) + 1.0) / CAST(ls.toks + vc.v AS DOUBLE))
      |                 * 1000000.0) / 1000000.0 AS lw
      |         FROM nb_voc voc CROSS JOIN nb_ls ls CROSS JOIN nb_vc vc
      |         LEFT JOIN nb_ttf ttf ON ttf.label = ls.label AND ttf.w = voc.w),
      |nb_nd AS (SELECT label, CAST(count(*) AS BIGINT) AS ndocs FROM nb_tr GROUP BY label),
      |nb_nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nb_tr),
      |nb_pri AS (SELECT nd.label,
      |          floor(ln(CAST(nd.ndocs AS DOUBLE) / CAST(nt.n AS DOUBLE))
      |                * 1000000.0) / 1000000.0 AS lp
      |        FROM nb_nd nd CROSS JOIN nb_nt nt),
      |nb_folded AS (SELECT tfc.doc_id, g.label, list_sum(list(CAST(tfc.tf AS DOUBLE) * g.lw
      |                    ORDER BY tfc.w)) AS ll
      |           FROM nb_tfc tfc JOIN nb_grid g ON tfc.w = g.w GROUP BY tfc.doc_id, g.label),
      |nb_scored AS (SELECT dd.doc_id, p.label, p.lp + coalesce(f.ll, 0.0) AS score
      |           FROM (SELECT doc_id FROM documents) dd CROSS JOIN nb_pri p
      |           LEFT JOIN nb_folded f ON f.doc_id = dd.doc_id AND f.label = p.label),
      |nb_ranked AS (SELECT doc_id, label, score,
      |             row_number() OVER (PARTITION BY doc_id
      |               ORDER BY score DESC, label ASC) AS rk FROM nb_scored),
      |nb_out AS (SELECT r.doc_id, nb_lab.label, r.label AS pred, r.score
      |FROM nb_ranked r JOIN nb_lab ON nb_lab.doc_id = r.doc_id
      |WHERE r.rk = 1)""".stripMargin

  /** Language-ID heuristic → `li_out(doc_id, lang, predicted)`. */
  private val liCtes: String =
    """li_sc AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_intersect(string_split(text,' '), ['the','a','of','and'])) AS BIGINT) s_en,
      |    CAST(len(list_intersect(string_split(text,' '), ['le','la','et','les'])) AS BIGINT) s_fr,
      |    CAST(len(list_intersect(string_split(text,' '), ['der','und','die','das'])) AS BIGINT) s_de,
      |    CAST(len(list_intersect(string_split(text,' '), ['el','y','los','que'])) AS BIGINT) s_es,
      |    CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS BIGINT) s_zh
      |  FROM documents),
      |li_out AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN greatest(s_en, s_fr, s_de, s_es, s_zh) = 0 THEN 'und'
      |         WHEN s_zh >= greatest(s_en, s_fr, s_de, s_es) THEN 'zh'
      |         WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
      |         WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
      |         WHEN s_de >= s_es THEN 'de'
      |         ELSE 'es' END AS predicted
      |  FROM li_sc)""".stripMargin

  val oracle: Map[String, String] = Map(
    // the four standalone gates select from the SAME fragments the
    // composed attributes oracle joins — shared single source of truth
    "x_text_attributes" ->
      s"""WITH $goCtes,
         |$ccCtes,
         |$nbCtes,
         |$liCtes
         |SELECT d.doc_id, go.pass AS gopher_pass, cc.bucket AS ppl_bucket,
         |       nb.pred AS nb_pred, li.predicted AS lang_pred,
         |       (go.pass AND cc.bucket <> 'tail') AS keep
         |FROM documents d
         |JOIN go_out go ON go.doc_id = d.doc_id
         |JOIN cc_out cc ON cc.doc_id = d.doc_id
         |JOIN nb_out nb ON nb.doc_id = d.doc_id
         |JOIN li_out li ON li.doc_id = d.doc_id
         |WHERE d.doc_id < 150 ORDER BY d.doc_id""".stripMargin,

    "x_text_bpe_train" -> bpeTrainOracleSql,

    // the batched trainer is sequential-EQUAL by construction, so it
    // gates against the IDENTICAL unrolled sequential oracle — the
    // strongest statement the gate can make about the acceptance rule
    "x_text_bpe_train_batched" -> bpeTrainOracleSql,

    // the same unrolled chain carried one merge further (v3), then the
    // applied corpus's token counts
    "x_text_bpe_apply" -> {
      s"""WITH t AS (SELECT w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
         |v0 AS (SELECT array_to_string(list_transform(string_split(w, ''),
         |               c -> '<' || c || '>'), '') AS v, n FROM t),
         |${bpePairStepSql(1)},
         |${bpeMergeStepSql(1)},
         |${bpePairStepSql(2)},
         |${bpeMergeStepSql(2)},
         |${bpePairStepSql(3)},
         |${bpeMergeStepSql(3)},
         |tok AS (SELECT token, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |  SELECT n, unnest(string_split(substr(v, 2, length(v) - 2), '><')) AS token
         |  FROM v3) GROUP BY token),
         |ranked AS (SELECT token, cnt,
         |             row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM tok)
         |SELECT CAST(rank AS BIGINT) AS rank, token, cnt
         |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin
    },

    "x_text_bm25" ->
      s"""WITH ${bm25Ctes()}
        |SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score
        |FROM bm_ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    // the takedown gate IS the bm25 chain over the corpus minus the
    // tombstoned doc — df/avgdl/N all re-derive smaller, so score
    // equality proves the ledger's exact-rebuild semantics. The query
    // docs (< 5) still come from the full corpus: only the INDEX side
    // loses the doc, which the `q` CTE keeps because 25 is not a query
    // doc.
    "x_text_bm25_takedown" ->
      s"""WITH ${bm25Ctes(" WHERE doc_id != 25")}
        |SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score
        |FROM bm_ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    // the SAME bm25 chain fused with the x_sim_topk-style exact cosine
    // ranking by RRF — both retrievals re-derived, then the identical
    // fixed-order two-term 1/(60+rank) sum and (rrf DESC, doc_id) rank
    "x_text_hybrid_rrf" ->
      s"""WITH ${bm25Ctes()},
        |bmr AS (SELECT qid, doc_id, rank AS rb FROM bm_ranked WHERE rank <= 10),
        |e AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
        |       i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) nrm
        |  FROM embeddings),
        |sc AS (
        |  SELECT q.vec_id qid, t2.vec_id,
        |    list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(t2.embedding[i] AS DOUBLE)))
        |      / (q.nrm * t2.nrm) AS cos
        |  FROM e q, e t2 WHERE q.vec_id < 5 AND q.vec_id != t2.vec_id),
        |annr AS (SELECT qid, vec_id, rank AS ra FROM (
        |           SELECT qid, vec_id,
        |                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) rank
        |           FROM sc) WHERE rank <= 10),
        |cand AS (SELECT COALESCE(b.qid, a.qid) AS qid,
        |                COALESCE(b.doc_id, a.vec_id) AS doc_id, b.rb, a.ra
        |         FROM bmr b FULL OUTER JOIN annr a
        |           ON b.qid = a.qid AND b.doc_id = a.vec_id),
        |fused AS (SELECT qid, doc_id,
        |            COALESCE(1.0 / (60 + rb), 0.0) + COALESCE(1.0 / (60 + ra), 0.0) AS rrf,
        |            rb, ra FROM cand),
        |outr AS (SELECT qid, doc_id, rrf, rb, ra,
        |           row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id ASC) rank
        |         FROM fused)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, rrf,
        |       CAST(rb AS BIGINT) AS r_bm25, CAST(ra AS BIGINT) AS r_ann
        |FROM outr WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    // the same LM arithmetic re-derived: per-lang trigram/context
    // counts on the md5 train half, quantized ln, tri-ordered folds,
    // rank-arithmetic tertile thresholds per language
    "x_text_ccnet_ppl" ->
      s"""WITH $ccCtes
         |SELECT doc_id, lang, n_tri, h, bucket
         |FROM cc_out WHERE doc_id < 150 ORDER BY doc_id""".stripMargin,

    // the same model arithmetic re-derived end-to-end: quantized ln,
    // dense vocab×label grid, w-ordered contribution sums, argmax with
    // the label-ASC tie-break that mirrors max(struct(score, -label))
    "x_text_nb_classify" ->
      s"""WITH $nbCtes
         |SELECT doc_id, label, pred, score
         |FROM nb_out WHERE doc_id < 150 ORDER BY doc_id""".stripMargin,

    // the corpus-wide merge chain (shared steps), the word→syms map,
    // frequency-ordered id assignment, and per-doc (pos, j)-ordered
    // reassembly
    "x_text_tokenize_ids" -> {
      def wmStep(i: Int): String =
        s"""wm$i AS (SELECT w, n, replace(v, '<' || b$i.a || '><' || b$i.b || '>',
           |                 '<' || b$i.a || b$i.b || '>') AS v
           |       FROM wm${i - 1}, b$i)""".stripMargin
      s"""WITH t AS (SELECT w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
         |v0 AS (SELECT array_to_string(list_transform(string_split(w, ''),
         |               c -> '<' || c || '>'), '') AS v, n FROM t),
         |${bpePairStepSql(1)},
         |${bpeMergeStepSql(1)},
         |${bpePairStepSql(2)},
         |${bpeMergeStepSql(2)},
         |${bpePairStepSql(3)},
         |wm0 AS (SELECT w, n, array_to_string(list_transform(string_split(w, ''),
         |               c -> '<' || c || '>'), '') AS v FROM t),
         |${wmStep(1)},
         |${wmStep(2)},
         |${wmStep(3)},
         |wmap AS (SELECT w, n,
         |           string_split(substr(v, 2, length(v) - 2), '><') AS syms FROM wm3),
         |tok AS (SELECT u.sym AS token, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |  SELECT n, unnest(list_transform(generate_series(1, len(syms)),
         |           j -> {'sym': syms[j]})) AS u FROM wmap) GROUP BY u.sym),
         |ids AS (SELECT token,
         |          CAST(row_number() OVER (ORDER BY cnt DESC, token) - 1 AS BIGINT) AS id
         |        FROM tok),
         |docw AS (SELECT doc_id, i AS pos, ws[i] AS w FROM
         |  (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |   WHERE doc_id < 100), unnest(generate_series(1, len(ws))) AS u(i)),
         |dsym AS (SELECT doc_id, pos, x.j AS j, x.sym AS sym FROM (
         |  SELECT d.doc_id, d.pos, unnest(list_transform(generate_series(1, len(m.syms)),
         |           j -> {'j': j, 'sym': m.syms[j]})) AS x
         |  FROM docw d JOIN wmap m USING (w))),
         |did AS (SELECT doc_id, list(CAST(i.id AS VARCHAR) ORDER BY pos, j) AS ids
         |        FROM dsym JOIN ids i ON i.token = dsym.sym GROUP BY doc_id)
         |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
         |       array_to_string(ids, ' ') AS ids_str
         |FROM did ORDER BY doc_id""".stripMargin
    },

    // the corpus-wide merge chain (shared steps), then the lang-aware
    // vocabulary rolled up through the same replaces
    "x_text_bpe_fertility" ->
      s"""WITH $bpeFertilityCtes
         |SELECT lang, words, tokens, fertility, chars_per_token
         |FROM bpe_fert ORDER BY lang""".stripMargin,

    "x_text_bpe_pairs" ->
      """WITH t AS (SELECT string_split(text, ' ') ws FROM documents),
        |p AS (SELECT unnest(list_transform(generate_series(2, len(ws)),
        |               i -> ws[i-1] || ' ' || ws[i])) pair
        |      FROM t WHERE len(ws) >= 2)
        |SELECT pair, count(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,

    "x_text_lm_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(generate_series(2, len(ws)),
        |          i -> ws[i-1] || ' ' || ws[i])) pair
        |       FROM t WHERE len(ws) >= 2),
        |lm AS (SELECT pair FROM (SELECT pair, count(DISTINCT doc_id) df FROM bg GROUP BY pair)
        |       WHERE df >= 2),
        |pd AS (SELECT doc_id, count(*) n_bigrams FROM bg GROUP BY doc_id),
        |kn AS (SELECT doc_id, count(*) n_known FROM bg JOIN lm USING (pair) GROUP BY doc_id)
        |SELECT pd.doc_id, n_bigrams, coalesce(n_known, 0) AS n_known,
        |       CAST(coalesce(n_known, 0) AS DOUBLE) / n_bigrams AS known_ratio
        |FROM pd LEFT JOIN kn ON pd.doc_id = kn.doc_id
        |WHERE pd.doc_id < 200 ORDER BY pd.doc_id""".stripMargin,

    "x_text_langid" ->
      s"""WITH $liCtes
         |SELECT lang, predicted, count(*) AS n FROM li_out
         |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    "x_text_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(ws) AS BIGINT) n_tokens,
        |  CAST(len(list_distinct(ws)) AS BIGINT) n_distinct,
        |  CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) distinct_ratio,
        |  CAST(len(list_intersect(ws, ['the','a','of','and'])) AS DOUBLE) / len(ws) stopword_ratio,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws) avg_token_len
        |FROM (SELECT doc_id, n_chars, string_split(text, ' ') ws
        |      FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id""".stripMargin,

    // Rule verdicts in integer arithmetic on both sides; the oracle
    // computes the top-bigram count by explode/group (correctness only —
    // the Spark side's sorted-run fold is the scale shape).
    "x_text_gopher" ->
      s"""WITH $goCtes
         |SELECT * FROM go_out ORDER BY doc_id""".stripMargin,

    "x_text_gopher_rep" -> gopherRepSql,

    "x_text_gopher_rep_lines" -> gopherRepLinesSql,

    "x_text_tokens" ->
      """SELECT lang,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) re_tokens,
        |  count(*) docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "x_text_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, ' +', ' ', 'g'))) fp
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,

    "x_text_winnow" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') ws FROM documents
        |           WHERE doc_id < 50),
        |sh0 AS (SELECT doc_id, unnest(generate_series(3, len(ws))) AS i, ws
        |        FROM t WHERE len(ws) >= 3),
        |sh AS (SELECT doc_id, CAST(i - 3 AS BIGINT) AS pos,
        |         ('0x' || substr(md5(ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i]), 1, 15))::BIGINT AS h
        |       FROM sh0),
        |w AS (SELECT doc_id,
        |        min(struct_pack(h := h, np := -pos)) OVER fr AS m,
        |        count(*) OVER fr AS cnt
        |      FROM sh
        |      WINDOW fr AS (PARTITION BY doc_id ORDER BY pos
        |                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING))
        |SELECT DISTINCT doc_id, CAST(-m.np AS BIGINT) AS pos, m.h AS h
        |FROM w WHERE cnt = 4 ORDER BY doc_id, pos, h""".stripMargin,

    "x_text_percentiles" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) n_ws
        |  FROM documents),
        |r AS (
        |  SELECT lang, n_ws,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n_ws, doc_id) AS BIGINT) rn,
        |         count(*) OVER (PARTITION BY lang) cnt
        |  FROM t)
        |SELECT lang,
        |  max(CASE WHEN rn = 1 + (cnt - 1) // 2 THEN n_ws END) AS p50_tokens,
        |  max(CASE WHEN rn = 1 + ((cnt - 1) * 9) // 10 THEN n_ws END) AS p90_tokens,
        |  max(cnt) AS docs
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "x_text_vocab" ->
      """SELECT w, CAST(count(*) AS BIGINT) AS tf,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY tf DESC, w LIMIT 100""".stripMargin,

    "x_text_truncate" ->
      """SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) n_tokens,
        |  CAST(least(len(ws), 32) AS BIGINT) n_kept,
        |  array_to_string(list_slice(ws, 1, 32), ' ') head_text,
        |  len(ws) > 32 AS truncated
        |FROM (SELECT doc_id, string_split(text, ' ') ws
        |      FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id""".stripMargin,

    "x_text_topterm" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) tf FROM words GROUP BY doc_id, w),
        |df AS (SELECT w, count(DISTINCT doc_id) df FROM words GROUP BY w),
        |j AS (SELECT t.doc_id, t.w, t.tf, d.df
        |      FROM tf t JOIN df d USING (w) WHERE t.doc_id < 50),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY doc_id ORDER BY tf DESC, df ASC, w DESC) rn
        |      FROM j)
        |SELECT doc_id, w AS term, CAST(tf AS BIGINT) tf, CAST(df AS BIGINT) df
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "x_text_heavy_hitters_exact" ->
      """SELECT w, count(*) AS n_exact
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY n_exact DESC, w LIMIT 20""".stripMargin,

    "x_text_funnel" ->
      """WITH staged AS (
        |  SELECT doc_id, text, lang, n_chars,
        |    CAST(len(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
        |      / len(text) AS alpha_ratio
        |  FROM documents),
        |flags AS (
        |  SELECT *, (n_chars >= 50 AND alpha_ratio >= 0.8) AS q_ok,
        |    (n_chars >= 50 AND alpha_ratio >= 0.8
        |      AND lang IN ('en', 'fr', 'de', 'es')) AS l_ok
        |  FROM staged),
        |kept AS (
        |  SELECT md5(text) h, min(doc_id) keeper FROM flags WHERE l_ok GROUP BY 1)
        |SELECT '0_ingested' AS stage, count(*) AS n FROM flags
        |UNION ALL SELECT '1_quality', count(*) FROM flags WHERE q_ok
        |UNION ALL SELECT '2_language', count(*) FROM flags WHERE l_ok
        |UNION ALL SELECT '3_deduped', count(*) FROM kept
        |ORDER BY stage""".stripMargin
  )
}
