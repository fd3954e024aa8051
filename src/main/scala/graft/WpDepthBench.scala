package graft

import org.apache.spark.sql.functions._

/** Depth measurement for the sequential WordPiece trainer — the
  * round-16 ask: `wpMerges` is sequential BY DESIGN (the likelihood
  * score's denominators are GLOBAL symbol counts, so every merge
  * perturbs every score sharing a symbol and the batched-BPE prefix
  * proof does not transfer), but that bound was a scaladoc sentence,
  * not a number. This bench trains `steps` merges on a copies-derived
  * vocabulary (the BpeDepthBench derivation — the gate corpus's 62
  * distinct words exhaust after a handful of merges) and records the
  * wall-per-merge TRAJECTORY: per-step times by quartile (does the
  * stacked replace chain grow step cost before each checkpoint
  * truncates it?), checkpoint-step vs plain-step cost (the overhead
  * the cadence buys lineage truncation with), and merges/sec overall —
  * the number a 32k-piece production budget multiplies.
  *
  * Usage: sbt "runMain graft.WpDepthBench [sfDir] [steps] [outJson]
  * [copies] [checkpointEvery]" — defaults sf0.01, 64, 64, 16.
  */
object WpDepthBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = if (args.length > 1) args(1).toInt else 64
    val out = if (args.length > 2) args(2) else "WP_DEPTH_r17.json"
    val copies = if (args.length > 3) args(3).toInt else 64
    val ckptEvery = if (args.length > 4) args(4).toInt else 16
    val spark = Engine.session()
    val words = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val tagged = (0 until copies).map { k =>
      if (k == 0) words
      else words.select(concat(col("w"), lit(s"_$k")).as("w"), col("n"))
    }.reduce(_ unionByName _)
    val v0 = graft.queries.Wordpiece.wpVocabOf(tagged)
      .groupBy("v").agg(sum("n").as("n")).persist()
    val vocabWords = v0.count()
    val stepSecs = Seq.newBuilder[(Int, Double)]
    val t0 = System.nanoTime()
    val merges = graft.queries.Wordpiece.wpMerges(v0, steps,
      checkpointEvery = ckptEvery,
      stepHook = (step, secs) => stepSecs += ((step, secs)))
    val wall = (System.nanoTime() - t0) / 1e9
    v0.unpersist(blocking = false)
    val times = stepSecs.result()
    def d2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    def mean(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sum / xs.size
    val quarters = if (times.isEmpty) Seq.empty[Double] else
      times.map(_._2).grouped(math.max(1, (times.size + 3) / 4)).toSeq.map(mean)
    val (ckptSteps, plainSteps) = times.partition(_._1 % ckptEvery == 0)
    val json = s"""{"metric":"wp_depth","corpus":"$d","copies":$copies,""" +
      s""""vocab_words":$vocabWords,"steps_requested":$steps,""" +
      s""""steps_done":${merges.length},"checkpoint_every":$ckptEvery,""" +
      s""""wall_sec":${d2(wall)},""" +
      s""""merges_per_sec":${d2(merges.length / math.max(wall, 1e-9))},""" +
      s""""sec_per_merge_by_quartile":[${quarters.map(d2).mkString(",")}],""" +
      s""""checkpoint_step_mean_sec":${d2(mean(ckptSteps.map(_._2)))},""" +
      s""""plain_step_mean_sec":${d2(mean(plainSteps.map(_._2)))}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
