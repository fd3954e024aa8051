package graft

import org.apache.spark.sql.functions._

/** Production-depth measurement for the EXACT batched BPE trainer —
  * the round-12 ask: train deep via the existing roundHook and record
  * wall time plus the accepted-per-round histogram. The interesting
  * question is how acceptance degrades with depth: early rounds ride
  * many symbol-disjoint word families (acceptance ≫ 1 — the batching
  * payoff), late rounds increasingly collide on composite symbols
  * where rule 3 (incl. the round-14 in-batch-duplicate close)
  * truncates batches — if acceptance decays toward 1/round the trainer
  * degrades to the sequential algorithm and a different batching
  * design (count-partitioned acceptance) would be the next move.
  *
  * The testdata corpus's word pool is deliberately tiny (62 distinct
  * words at sf0.01 — merge capacity ~174), so depth needs a DERIVED
  * vocabulary: `copies` suffix-tagged copies of every word
  * (`word_k`), the ScaleBench documents derivation at the vocabulary
  * level. Copies share their stem, so the trainer first rebuilds the
  * common stems — thousands of symbol-disjoint families, exactly the
  * structure that lets batched acceptance pay — then diverges into
  * per-copy suffixes. 64 copies ≈ 4k words ≈ 36k merge capacity.
  *
  * Two derivation MODES probe the two ends of the acceptance spectrum:
  *  - `suffix`: copies share their stems AND the alphabet — the top
  *    pair rows are the same hot-letter bigrams, rule 1's prefix check
  *    collides immediately, and acceptance measures the DEGRADED end
  *    (measured: 1.01/round at 64 copies — the trainer honestly falls
  *    back to the sequential algorithm rather than approximate).
  *  - `rotate`: alphabet-rotated copies — each domain's hot pairs use
  *    different letters, the spread that lets the prefix rule accept
  *    several disjoint families per round (the mixed-crawl shape).
  *
  * Usage: sbt "runMain graft.BpeDepthBench [sfDir] [steps] [fetchK]
  * [outJson] [copies] [mode]" — defaults sf0.01, 8192 merges,
  * fetchK 512, 64 copies, mode suffix.
  */
object BpeDepthBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = if (args.length > 1) args(1).toInt else 8192
    val fetchK = if (args.length > 2) args(2).toInt else 512
    val out = if (args.length > 3) args(3) else "BPE_DEPTH_r14.json"
    val copies = if (args.length > 4) args(4).toInt else 64
    val mode = if (args.length > 5) args(5) else "suffix"
    val spark = Engine.session()
    val az = "abcdefghijklmnopqrstuvwxyz"
    val words = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val tagged = (0 until copies).map { k =>
      if (k == 0) words
      else if (mode == "rotate") {
        val r = k % 25 + 1 // rotation 1..25, suffix-tagged past 25
        val rot = words.select(translate(col("w"), az, az.drop(r) + az.take(r)).as("w"), col("n"))
        if (k <= 25) rot
        else rot.select(concat(col("w"), lit(s"_${k / 25}")).as("w"), col("n"))
      }
      else words.select(concat(col("w"), lit(s"_$k")).as("w"), col("n"))
    }.reduce(_ unionByName _)
    val v0 = tagged
      .select(expr("concat_ws('', transform(split(w, ''), c -> concat('<', c, '>')))").as("v"),
        col("n"))
      .groupBy("v").agg(sum("n").as("n")).persist()
    val vocabWords = v0.count()
    val perRound = Seq.newBuilder[Int]
    val t0 = System.nanoTime()
    val (merges, _, ckpt) = graft.queries.TextAnalysis.bpeMergesBatched(
      v0, steps, fetchK = fetchK, checkpointEvery = 256, roundHook = perRound += _)
    val wall = (System.nanoTime() - t0) / 1e9
    ckpt.foreach(_.unpersist(blocking = false))
    v0.unpersist(blocking = false)
    val rounds = perRound.result()
    // histogram over power-of-two acceptance buckets + the acceptance
    // trajectory by run quartile (the decay signal)
    def bucket(n: Int): String =
      if (n == 1) "1" else if (n <= 3) "2-3" else if (n <= 7) "4-7"
      else if (n <= 15) "8-15" else if (n <= 31) "16-31"
      else if (n <= 63) "32-63" else if (n <= 127) "64-127"
      else if (n <= 255) "128-255" else "256+"
    val hist = rounds.groupBy(bucket).view.mapValues(_.size).toMap
    val histJson = Seq("1", "2-3", "4-7", "8-15", "16-31", "32-63",
        "64-127", "128-255", "256+")
      .map(b => s""""$b":${hist.getOrElse(b, 0)}""").mkString(",")
    val quarters = if (rounds.isEmpty) Seq.empty[Double] else
      rounds.grouped(math.max(1, (rounds.size + 3) / 4)).toSeq
        .map(q => q.sum.toDouble / q.size)
    def d2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    val json = s"""{"metric":"bpe_depth","corpus":"$d","mode":"$mode","copies":$copies,""" +
      s""""vocab_words":$vocabWords,""" +
      s""""steps_requested":$steps,"steps_done":${merges.length},""" +
      s""""fetch_k":$fetchK,"rounds":${rounds.size},"wall_sec":${d2(wall)},""" +
      s""""merges_per_sec":${d2(merges.length / math.max(wall, 1e-9))},""" +
      s""""accepted_per_round_mean":${d2(
        if (rounds.isEmpty) 0.0 else rounds.sum.toDouble / rounds.size)},""" +
      s""""accepted_mean_by_quartile":[${quarters.map(d2).mkString(",")}],""" +
      s""""histogram":{$histJson}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
