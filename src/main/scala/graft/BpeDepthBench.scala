package graft

import org.apache.spark.sql.functions._

/** Production-depth measurement for the EXACT batched BPE trainer —
  * the round-12 ask: train deep on a mixed-domain corpus via the
  * existing roundHook and record wall time plus the accepted-per-round
  * histogram. The interesting question is how acceptance degrades with
  * depth: early rounds ride many symbol-disjoint word families
  * (acceptance ≫ 1 — the batching payoff), late rounds increasingly
  * collide on composite symbols where rule 3 (incl. the round-14
  * in-batch-duplicate close) truncates batches — if acceptance decays
  * toward 1/round the trainer degrades to the sequential algorithm and
  * a different batching design (e.g. count-partitioned acceptance)
  * would be the next move. The corpus is the base vocabulary unioned
  * with an alphabet-rotated copy (two disjoint "domains", the
  * TextAnalysisSpec shiftedVocab pattern) so top pairs spread across
  * domains the way a mixed crawl's do.
  *
  * Usage: sbt "runMain graft.BpeDepthBench [sfDir] [steps] [fetchK]
  * [outJson]" — defaults sf0.01, 4096 merges, fetchK 256.
  */
object BpeDepthBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = if (args.length > 1) args(1).toInt else 4096
    val fetchK = if (args.length > 2) args(2).toInt else 256
    val out = if (args.length > 3) args(3) else "BPE_DEPTH_r14.json"
    val spark = Engine.session()
    val az = "abcdefghijklmnopqrstuvwxyz"
    val v0raw = graft.queries.TextAnalysis.bpeVocab(spark, d)
    val v0 = v0raw.unionByName(
        v0raw.select(translate(col("v"), az, az.drop(13) + az.take(13)).as("v"), col("n")))
      .groupBy("v").agg(sum("n").as("n")).persist()
    val vocabWords = v0.count()
    val perRound = Seq.newBuilder[Int]
    val t0 = System.nanoTime()
    val (merges, _, ckpt) = graft.queries.TextAnalysis.bpeMergesBatched(
      v0, steps, fetchK = fetchK, checkpointEvery = 64, roundHook = perRound += _)
    val wall = (System.nanoTime() - t0) / 1e9
    ckpt.foreach(_.unpersist(blocking = false))
    v0.unpersist(blocking = false)
    val rounds = perRound.result()
    // histogram over power-of-two acceptance buckets + the acceptance
    // trajectory by run quartile (the decay signal)
    def bucket(n: Int): String =
      if (n == 1) "1" else if (n <= 3) "2-3" else if (n <= 7) "4-7"
      else if (n <= 15) "8-15" else if (n <= 31) "16-31"
      else if (n <= 63) "32-63" else "64+"
    val hist = rounds.groupBy(bucket).view.mapValues(_.size).toMap
    val histJson = Seq("1", "2-3", "4-7", "8-15", "16-31", "32-63", "64+")
      .map(b => s""""$b":${hist.getOrElse(b, 0)}""").mkString(",")
    val quarters = if (rounds.isEmpty) Seq.empty[Double] else
      rounds.grouped(math.max(1, (rounds.size + 3) / 4)).toSeq
        .map(q => q.sum.toDouble / q.size)
    def d2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    val json = s"""{"metric":"bpe_depth","corpus":"$d","vocab_words":$vocabWords,""" +
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
