package graft

import org.apache.spark.sql.functions._

/** Serving-depth measurement for the rank-heap BPE expression — the
  * round-16 ask: the chain-replay serve is O(merges × len) per word,
  * fine at the 3-merge gate but ~10⁴× the per-word work at a 32k-merge
  * production vocab; the rank-heap formulation in
  * [[graft.functions.BpeTokenize]] is O(len log len) REGARDLESS of
  * merge depth (only pairs that actually merge are touched). This
  * bench makes that separation a measured number instead of a
  * complexity claim:
  *
  *  1. derive a deep vocabulary (the BpeDepthBench copies derivation —
  *     the gate corpus's 62-word pool caps merge capacity far below
  *     production depth) and train `steps` merges with the existing
  *     exact batched trainer;
  *  2. at each depth prefix (16, 64, 256, … up to `steps`), tokenize
  *     every distinct corpus word with BOTH algorithms, assert
  *     output equality word-for-word (the correctness pin at every
  *     measured depth, not just the gate's 3), and record per-word
  *     wall for each;
  *  3. emit one JSON line per depth: words/sec for heap and replay and
  *     the ratio — the replay column should degrade ~linearly with
  *     depth while the heap column stays flat.
  *
  * Driver-side micro-timing by design: both algorithms are pure
  * per-word JVM functions (the expression's own eval calls the same
  * heapWord), so timing them over the collected distinct-word list
  * isolates the algorithm from Spark scheduling noise. The word list
  * is vocabulary-sized (~4k words at 64 copies), never the corpus.
  *
  * Usage: sbt "runMain graft.BpeServeDepthBench [sfDir] [steps]
  * [outJson] [copies]" — defaults sf0.01, 256 merges, 64 copies.
  */
object BpeServeDepthBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = if (args.length > 1) args(1).toInt else 256
    val out = if (args.length > 2) args(2) else "BPE_SERVE_DEPTH_r17.json"
    val copies = if (args.length > 3) args(3).toInt else 64
    val spark = Engine.session()
    val words = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val tagged = (0 until copies).map { k =>
      if (k == 0) words
      else words.select(concat(col("w"), lit(s"_$k")).as("w"), col("n"))
    }.reduce(_ unionByName _)
    val v0 = tagged
      .select(expr("concat_ws('', transform(split(w, ''), c -> concat('<', c, '>')))").as("v"),
        col("n"))
      .groupBy("v").agg(sum("n").as("n")).persist()
    val t0 = System.nanoTime()
    val (trained, _, ckpt) = graft.queries.TextAnalysis.bpeMergesBatched(
      v0, steps, fetchK = 512, checkpointEvery = 256)
    val trainWall = (System.nanoTime() - t0) / 1e9
    ckpt.foreach(_.unpersist(blocking = false))
    v0.unpersist(blocking = false)
    val merges = trained.map { case (_, a, b, _) => (a, b) }
    val wordList = tagged.select("w").distinct().collect().map(_.getString(0))
      .map(w => w.codePoints().toArray)
    def d1(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(x))

    def run(depth: Int): String = {
      val chain = merges.take(depth)
      val ranks = graft.functions.BpeTokenize.rankMapOf(chain)
      // equality pin at THIS depth — every distinct word, both forms
      wordList.foreach { cps =>
        val h = graft.functions.BpeTokenize.heapWord(cps, 0, cps.length, ranks)
        val r = graft.functions.BpeTokenize.replayWord(cps, 0, cps.length, chain)
        require(h == r, s"heap != replay at depth $depth on ${new String(cps, 0, cps.length)}")
      }
      // timed passes (min-of-two per algorithm, interleaved)
      def timeHeap(): Double = {
        val t = System.nanoTime()
        wordList.foreach(cps =>
          graft.functions.BpeTokenize.heapWord(cps, 0, cps.length, ranks))
        (System.nanoTime() - t) / 1e9
      }
      def timeReplay(): Double = {
        val t = System.nanoTime()
        wordList.foreach(cps =>
          graft.functions.BpeTokenize.replayWord(cps, 0, cps.length, chain))
        (System.nanoTime() - t) / 1e9
      }
      val (h, r) = (math.min(timeHeap(), timeHeap()),
        math.min(timeReplay(), timeReplay()))
      val (hw, rw) = (wordList.length / h, wordList.length / r)
      s"""{"depth":$depth,"heap_words_per_sec":${d1(hw)},""" +
        s""""replay_words_per_sec":${d1(rw)},"heap_over_replay":${d1(hw / rw)}}"""
    }

    // warm the JIT on both paths before any timed depth
    run(math.min(16, merges.length))
    val depths = Seq(16, 64, 256, 1024, 4096).filter(_ <= merges.length) match {
      case s if s.isEmpty || s.last != merges.length => // always include full depth
        (Seq(16, 64, 256, 1024, 4096).filter(_ < merges.length) :+ merges.length)
      case s => s
    }
    val rows = depths.map(run)
    val json = s"""{"metric":"bpe_serve_depth","corpus":"$d","copies":$copies,""" +
      s""""distinct_words":${wordList.length},"merges_trained":${merges.length},""" +
      s""""train_wall_sec":${d1(trainWall)},"by_depth":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
