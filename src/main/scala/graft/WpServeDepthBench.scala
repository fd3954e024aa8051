package graft

import org.apache.spark.sql.functions._

/** SERVE-depth measurement for the greedy WordPiece expression — the
  * round-17 verdict's #5: WP_DEPTH_r17 measured the sequential TRAINER
  * at depth 64; serving is nominally depth-independent (vocabulary
  * lookup, not merge replay) but the greedy walk probes up to
  * maxPieceLen candidate lengths per cursor position, and the longest
  * trained piece grows with depth — this bench makes the "flat" claim a
  * number. It trains `steps` WordPiece merges on the copies-derived
  * vocabulary (the WP_DEPTH_r17 derivation), then at each depth prefix
  * builds the frozen serving vocabulary (applied chain → token counts →
  * ids), and micro-times [[graft.functions.WordpieceTokenize.greedyWord]]
  * over every distinct corpus word — driver-side by design (the
  * BpeServeDepthBench rationale: the walk is a pure per-word JVM
  * function, so timing the collected word list isolates the algorithm
  * from Spark scheduling noise).
  *
  * Usage: sbt "runMain graft.WpServeDepthBench [sfDir] [steps] [outJson]
  * [copies] [checkpointEvery]" — defaults sf0.01, 64,
  * WP_SERVE_DEPTH_r18.json, 64, 16.
  */
object WpServeDepthBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = if (args.length > 1) args(1).toInt else 64
    val out = if (args.length > 2) args(2) else "WP_SERVE_DEPTH_r18.json"
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
    val merges = graft.queries.Wordpiece.wpMerges(v0, steps, checkpointEvery = ckptEvery)
    val wordList = tagged.select("w").distinct().collect().map(_.getString(0))
      .map(w => w.codePoints().toArray)
    def d1(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(x))

    def atDepth(depth: Int): String = {
      // the frozen serving vocabulary of the depth-prefix model: apply
      // the chain, count surviving tokens, ids by (cnt DESC, token) —
      // the wordpieceFit rule at an arbitrary depth
      val applied = merges.take(depth).foldLeft(
        graft.queries.Wordpiece.wpVocabOf(tagged)) { case (v, (_, a, b, _, _, _, _)) =>
        val fused = a + b.stripPrefix("##")
        v.select(expr(s"replace(v, '<$a><$b>', '<$fused>')").as("v"), col("n"))
      }
      val tokens = applied
        .select(col("n"),
          explode(expr("split(substring(v, 2, length(v) - 2), '><')")).as("token"))
        .groupBy("token").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("token")).collect()
      val vocab = tokens.zipWithIndex
        .map { case (r, i) => r.getString(0) -> i.toLong }.toMap
      // serving probes raw substrings: the effective bound is the
      // longest PROBE string (continuation tokens probe ##-stripped)
      val maxLen = vocab.keysIterator
        .map(t => t.stripPrefix("##").codePointCount(0, t.stripPrefix("##").length))
        .max
      val (ini, cont) = graft.functions.WordpieceTokenize.bifurcate(vocab)
      val outBuf = new scala.collection.mutable.ArrayBuffer[Long](64)
      def pass(): Double = {
        val t = System.nanoTime()
        wordList.foreach { cps =>
          outBuf.clear()
          graft.functions.WordpieceTokenize
            .greedyWord(cps, 0, cps.length, ini, cont, maxLen, outBuf)
        }
        (System.nanoTime() - t) / 1e9
      }
      pass() // JIT warm per depth (tables differ)
      val wps = wordList.length / math.min(pass(), pass())
      s"""{"depth":$depth,"vocab_tokens":${vocab.size},"max_piece_len":$maxLen,""" +
        s""""words_per_sec":${d1(wps)}}"""
    }

    val depths = (Seq(0, 16) ++ Seq(merges.length)).distinct.filter(_ <= merges.length)
    val rows = depths.map(atDepth)
    v0.unpersist(blocking = false)
    val json = s"""{"metric":"wp_serve_depth","corpus":"$d","copies":$copies,""" +
      s""""distinct_words":${wordList.length},"merges_trained":${merges.length},""" +
      s""""by_depth":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
