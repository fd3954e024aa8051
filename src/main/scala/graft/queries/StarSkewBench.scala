package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew/round measurement for the [[Dedup.starClusters]] fixpoint — the
  * evidence the round-20 largeStar-distinct removal was gated on: does
  * dropping largeStar's trailing `distinct()` (one edge-relation
  * Exchange + aggregate per round) hold up on graphs where the distinct
  * previously bounded duplicate volume?
  *
  * Both round shapes are timed from ONE binary: the OLD round is
  * `smallStar(largeStar(e).distinct())` — appending the distinct
  * reproduces the pre-round-20 code verbatim — and the NEW round is
  * `smallStar(largeStar(e))`. The fixpoint loop, fingerprint
  * convergence test and label join are the production ones, replicated
  * here with the round function as the only difference, so the A/B
  * isolates exactly the removed exchange.
  *
  * Three planted pair graphs at `n` nodes, chosen for opposite stress:
  *
  *  - `hub`: one node adjacent to every other — the maximal single hot
  *    key (a recrawled boilerplate page duplicating everything).
  *  - `chain`: a length-n path — maximal round count (O(log n) rounds),
  *    so the per-round saving compounds; no skew.
  *  - `blocks`: n/1000 stars of 1000 — the production-shaped many-
  *    medium-clusters graph.
  *
  * Prints one line per graph: min-of-two seconds per shape
  * (position-matched old,new,new,old), rounds, and the round-1 row
  * count entering smallStar with and without the distinct (the
  * duplicate-volume bound made observable; measured OUTSIDE the timed
  * runs). Also writes the two one-round plans to
  * plans/r20/starclusters_round_{before,after}.txt.
  *
  * Usage: sbt "runMain graft.queries.StarSkewBench [n]" (default 300000).
  */
object StarSkewBench {

  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(hi, lo))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The production fixpoint with the round shape as the only variable. */
  private def fixpoint(docs: DataFrame, pairs: DataFrame,
      oldShape: Boolean): (DataFrame, Int) = {
    var edges = graft.Engine.materialize(
      pairs.select(col("db").as("hi"), col("da").as("lo")).distinct())
    var fp = fingerprint(edges)
    var rounds = 0
    var converged = fp._1 == 0L
    while (!converged) {
      rounds += 1
      val ls = Dedup.largeStar(edges)
      val next = graft.Engine.materialize(
        Dedup.smallStar(if (oldShape) ls.distinct() else ls))
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      graft.Engine.release(edges)
      edges = next
    }
    val lbl = docs
      .join(edges.withColumnRenamed("hi", "doc_id"), Seq("doc_id"), "left")
      .groupBy("doc_id").agg(min("lo").as("mn"))
      .select(col("doc_id"), coalesce(col("mn"), col("doc_id")).as("cluster"))
    (lbl, rounds)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val spark = graft.Engine.session()
    val docs = spark.range(0, n).toDF("doc_id")
    val hub = spark.range(1, n).select(lit(0L).as("da"), col("id").as("db"))
    val chain = spark.range(0, n - 1)
      .select(col("id").as("da"), (col("id") + 1).as("db"))
    val blocks = spark.range(0, n)
      .select((col("id") - (col("id") % 1000)).as("da"), col("id").as("db"))
      .filter(col("da") =!= col("db"))

    // one-round plan dump (both shapes) — the per-round Exchange diff
    val e0 = graft.Engine.materialize(
      chain.select(col("db").as("hi"), col("da").as("lo")).distinct())
    val mode = org.apache.spark.sql.execution.FormattedMode
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r20"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r20/starclusters_round_before.txt"),
      Dedup.smallStar(Dedup.largeStar(e0).distinct())
        .queryExecution.explainString(mode).getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r20/starclusters_round_after.txt"),
      Dedup.smallStar(Dedup.largeStar(e0))
        .queryExecution.explainString(mode).getBytes("UTF-8"))

    def once(pairs: DataFrame, oldShape: Boolean): (Int, Double) = {
      val t0 = System.nanoTime()
      val (lbl, rounds) = fixpoint(docs, pairs, oldShape)
      lbl.write.format("noop").mode("overwrite").save()
      (rounds, (System.nanoTime() - t0) / 1e9)
    }
    // warmup: JIT/codegen on a small throwaway graph, both shapes
    once(spark.range(0, 999).select(col("id").as("da"), (col("id") + 1).as("db")), true)
    once(spark.range(0, 999).select(col("id").as("da"), (col("id") + 1).as("db")), false)
    // position-matched: old,new then new,old per graph; min per shape
    for ((name, pairs) <- Seq("hub" -> hub, "chain" -> chain, "blocks" -> blocks)) {
      spark.sparkContext.setJobDescription(s"starskew: $name")
      val o1 = once(pairs, true); val n1 = once(pairs, false)
      val n2 = once(pairs, false); val o2 = once(pairs, true)
      val (ro, to) = if (o1._2 <= o2._2) o1 else o2
      val (rn, tn) = if (n1._2 <= n2._2) n1 else n2
      // round-1 duplicate volume, UNTIMED: rows entering smallStar with
      // and without largeStar's distinct
      val edges1 = graft.Engine.materialize(
        pairs.select(col("db").as("hi"), col("da").as("lo")).distinct())
      val volNew = Dedup.largeStar(edges1).count()
      val volOld = Dedup.largeStar(edges1).distinct().count()
      println(f"STARSKEW $name%-7s n=$n old: rounds=$ro secs=$to%.3f | " +
        f"new: rounds=$rn secs=$tn%.3f | ratio=${tn / to}%.3f | " +
        f"round1 rows new=$volNew old=$volOld")
    }
    spark.stop()
  }
}
