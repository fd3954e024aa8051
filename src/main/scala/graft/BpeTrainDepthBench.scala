package graft

import org.apache.spark.sql.functions._

/** Production-depth measurement for the BATCHED BPE trainer — the
  * round-17 verdict's last unmeasured tokenizer-lifecycle axis: serving
  * is depth-safe (rank-heap, BPE_SERVE_DEPTH_r17) and the batched
  * trainer is spec-equal to the sequential algorithm, but its
  * accepted-prefix rate — the thing that divides driver rounds and
  * therefore wall time at a 32k-merge production vocab — had never been
  * recorded past 256 merges. This bench trains `steps` (default 1,024)
  * merges on a copies-derived vocabulary and records:
  *
  *  - per-round observability: accepted merges and wall per driver
  *    round (the roundHook seam), hence driver_rounds vs merges_trained
  *    and the mean accepted-prefix rate — the claimed ~merges/rounds
  *    division made a number;
  *  - wall-per-merge by 256-merge window: whether step cost grows with
  *    depth (the replace-chain depth is bounded by checkpointEvery, so
  *    the expected trajectory is flat-ish with checkpoint sawtooth);
  *  - train → serve closed at depth: the full-depth merge list serves
  *    through the rank-heap expression — heap == replay equality
  *    asserted over every distinct corpus word at FULL depth (extending
  *    the serve bench's pin to the deepest trained model), driver-side
  *    heap words/sec, and one corpus-serve wall through the actual
  *    [[graft.functions.BpeTokenize]] expression over the base corpus.
  *
  * The copy derivation has two modes, because the accepted-prefix rate
  * is a CORPUS property, not a trainer property:
  *  - `tag` (the serve-bench derivation): copy k suffixes every word
  *    with `_k`. Copies share their base characters, so the global
  *    top pairs are the SAME ~31-base-word chains at 64× the count —
  *    pair mass chains and count-ties everywhere, the worst case for
  *    prefix acceptance (rule 1 stops on chained symbols, rule 2's
  *    strict-count trim stops on ties). This measures the DEGENERATE
  *    regime: accepted → 1, i.e. exactly the sequential algorithm.
  *  - `rotate`: copy k additionally rotates the a-z alphabet by k
  *    (translate; ≤ 26 copies — one per distinct rotation, enforced),
  *    so each copy carries its OWN character population — pair
  *    distributions disjoint across copies, the way a fresh crawl's
  *    vocabulary actually grows. Measured 1.3 accepted/round (max 38).
  *  - `rotatew`: rotate + copy k's counts scaled by (k+1), breaking the
  *    cross-copy count ties — disjoint pairs AND distinct counts, the
  *    Zipf-like top a real crawl presents. Measured 1.4 accepted/round.
  *
  * The regime split's conclusion (BPE_TRAIN_DEPTH_r18.json): on this
  * 31-base-word testdata the DOMINANT acceptance bound is Zipf-top
  * pair CHAINING within each word family (rule 1 — inherent, correct),
  * not the count ties; a broad-vocabulary crawl spreads its top-512
  * across disjoint words far more than 31 base words can.
  *
  * Round 19 adds the regime the r18 conclusion called for:
  *  - `wide`: vocabulary sampled from the REAL corpus at realistic
  *    breadth — all word 1-/2-/3-grams of the token stream as
  *    vocabulary words with their true counts (10⁴⁺ distinct words,
  *    shared character substructure, Zipf counts). `copies` ignored.
  *
  * Usage: sbt "runMain graft.BpeTrainDepthBench [sfDir] [steps]
  * [outJson] [copies] [mode]" — defaults sf0.01, 1024,
  * BPE_TRAIN_DEPTH_r18.json, 64 copies, tag.
  */
object BpeTrainDepthBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = if (args.length > 1) args(1).toInt else 1024
    val out = if (args.length > 2) args(2) else "BPE_TRAIN_DEPTH_r18.json"
    val copies = if (args.length > 3) args(3).toInt else 64
    val mode = if (args.length > 4) args(4) else "tag"
    // the rotate regimes' whole premise is per-copy-DISJOINT character
    // populations; a 27th copy would wrap (k % 26) onto an existing
    // alphabet and silently dilute the regime back toward `tag`
    require(mode == "tag" || mode == "wide" || copies <= 26,
      s"rotate modes support at most 26 copies (26 distinct a-z rotations), got $copies")
    val spark = Engine.session()
    val words = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val az = "abcdefghijklmnopqrstuvwxyz"
    val tagged =
      if (mode == "wide") {
        // `wide` (round 19): realistic vocabulary BREADTH sampled from
        // the REAL corpus, not synthesized by rotation — every word
        // 1-, 2- and 3-gram of the token stream, concatenated without a
        // separator, becomes a vocabulary word carrying its true corpus
        // occurrence count. The n-gram compounds are exactly how a
        // broad crawl vocabulary looks to a byte-pair trainer (shared
        // character substructure, Zipf counts, 10⁴⁺ distinct words) —
        // the regime BPE_TRAIN_DEPTH_r18 showed the 31-base-word
        // testdata cannot reach by copying: acceptance is a corpus
        // property, and this corpus has the breadth the batching
        // exists for. `copies` is ignored.
        spark.read.parquet(s"$d/documents.parquet")
          .select(split(col("text"), " ").as("ws"))
          .select(explode(expr(
            """flatten(transform(array(1, 2, 3), n ->
              |  IF(size(ws) >= n,
              |     transform(sequence(1, size(ws) - n + 1),
              |       i -> concat_ws('', slice(ws, i, n))),
              |     array())))""".stripMargin)).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
      } else (0 until copies).map { k =>
        if (k == 0) words
        else {
          val base =
            if (mode == "rotate" || mode == "rotatew") {
              val rot = az.substring(k % 26) + az.substring(0, k % 26)
              words.select(translate(col("w"), az, rot).as("w"), col("n"))
            } else words
          val weighted =
            if (mode == "rotatew")
              base.select(col("w"), (col("n") * lit(k + 1L)).as("n"))
            else base
          weighted.select(concat(col("w"), lit(s"_$k")).as("w"), col("n"))
        }
      }.reduce(_ unionByName _)
    val v0 = tagged
      .select(expr("concat_ws('', transform(split(w, ''), c -> concat('<', c, '>')))").as("v"),
        col("n"))
      .groupBy("v").agg(sum("n").as("n")).persist()

    // per-round (accepted, wall): the hook fires once per driver round,
    // so nanoTime deltas between firings attribute that round's full
    // cost (pair count + argmax fetch + replace chain + any checkpoint)
    val rounds = Seq.newBuilder[(Int, Double)]
    var lastT = System.nanoTime()
    val t0 = lastT
    val (trained, _, ckpt) = graft.queries.TextAnalysis.bpeMergesBatched(
      v0, steps, fetchK = 512, checkpointEvery = 256,
      roundHook = acc => {
        val now = System.nanoTime()
        rounds += ((acc, (now - lastT) / 1e9))
        lastT = now
      })
    val trainWall = (System.nanoTime() - t0) / 1e9
    ckpt.foreach(_.unpersist(blocking = false))
    v0.unpersist(blocking = false)
    val merges = trained.map { case (_, a, b, _) => (a, b) }
    val roundLog = rounds.result()

    def d1(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(x))
    def d3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

    // wall-per-merge by 256-merge window: assign each round's wall to
    // the window its LAST accepted merge lands in (rounds never span
    // more than one window boundary materially at accepted ≪ 256)
    val windowWall = scala.collection.mutable.LinkedHashMap[Int, (Int, Double)]()
    var cum = 0
    roundLog.foreach { case (acc, secs) =>
      cum += acc
      val w = (cum - 1) / 256
      val (m0, s0) = windowWall.getOrElse(w, (0, 0.0))
      windowWall(w) = (m0 + acc, s0 + secs)
    }
    val windows = windowWall.toSeq.map { case (w, (m, s)) =>
      s"""{"window":$w,"merges":$m,"wall_sec":${d1(s)},""" +
        s""""sec_per_merge":${d3(s / math.max(m, 1))}}"""
    }

    // ---- serve the deep model: equality pin + throughput at FULL depth
    val wordList = tagged.select("w").distinct().collect().map(_.getString(0))
      .map(w => w.codePoints().toArray)
    val ranks = graft.functions.BpeTokenize.rankMapOf(merges)
    wordList.foreach { cps =>
      val h = graft.functions.BpeTokenize.heapWord(cps, 0, cps.length, ranks)
      val r = graft.functions.BpeTokenize.replayWord(cps, 0, cps.length, merges)
      require(h == r,
        s"heap != replay at depth ${merges.length} on ${new String(cps, 0, cps.length)}")
    }
    def timeHeap(): Double = {
      val t = System.nanoTime()
      wordList.foreach(cps =>
        graft.functions.BpeTokenize.heapWord(cps, 0, cps.length, ranks))
      (System.nanoTime() - t) / 1e9
    }
    timeHeap() // JIT warm
    val heapWps = wordList.length / math.min(timeHeap(), timeHeap())

    // corpus serve through the ACTUAL expression (ids: frequency order
    // is irrelevant to serving cost — a stable token → index map)
    val ids = wordList.flatMap(cps =>
      graft.functions.BpeTokenize.heapWord(cps, 0, cps.length, ranks))
      .distinct.sorted.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
    val docs = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
    def serveOnce(): Double = {
      val t = System.nanoTime()
      docs.select(col("doc_id"),
        graft.functions.BpeTokenize.of(col("text"), merges, ids).as("ids"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    serveOnce() // warm
    val serveWall = math.min(serveOnce(), serveOnce())

    val accepted = roundLog.map(_._1)
    val json = s"""{"metric":"bpe_train_depth","corpus":"$d","copies":$copies,"mode":"$mode",""" +
      s""""distinct_words":${wordList.length},"steps_requested":$steps,""" +
      s""""merges_trained":${merges.length},"train_wall_sec":${d1(trainWall)},""" +
      s""""sec_per_merge":${d3(trainWall / math.max(merges.length, 1))},""" +
      s""""driver_rounds":${roundLog.length},""" +
      s""""accepted_prefix_mean":${d1(merges.length.toDouble / math.max(roundLog.length, 1))},""" +
      s""""accepted_per_round_min":${if (accepted.isEmpty) 0 else accepted.min},""" +
      s""""accepted_per_round_max":${if (accepted.isEmpty) 0 else accepted.max},""" +
      s""""wall_by_256merge_window":[${windows.mkString(",")}],""" +
      s""""serve_full_depth":{"heap_equals_replay":true,""" +
      s""""heap_words_per_sec":${d1(heapWps)},""" +
      s""""corpus_serve_wall_sec":${d3(serveWall)}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
