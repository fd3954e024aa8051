package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Octave-scale A/B for the round-19 index-build changes that read flat
  * at sf0.1 (VERDICT r19 "what's wrong" #4): the one-pass build
  * (persisted sig/keys/tokenize relations across the sibling table
  * writes) and the bucket-aligned repartition (one file per bucket
  * instead of one per task × bucket). Runs the CURRENT writers against
  * an inline replica of the pre-r19 shape (three writes, each re-running
  * the corpus pass, no bucket-aligned repartition — lifted verbatim from
  * the pre-change source) on the same corpus dir, and reports wall
  * seconds plus the post-build parquet file count per table. The old
  * shape lives only here, in a measurement harness — never in a query
  * path.
  *
  * Usage: sbt "runMain graft.queries.IndexBuildAb <dir> [reps]"
  * (dir: a ScaleBench-derived octave dir or a testdata sf dir).
  */
object IndexBuildAb {

  private def files(s: SparkSession, table: String): Int = {
    val meta = s.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(meta.location)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.listStatus(p).count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Pre-r19 writeMinhashIndexBucketed: no persist, no bucket-aligned
    * repartition (verbatim shape from 90c6cdc~1). */
  private def oldMinhashBuild(s: SparkSession, d: String, tablePrefix: String,
      buckets: Int = 32): Unit = {
    val toks = graft.Engine.table(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val (sig, keysBn) = Dedup.md5SigKeysCounted(toks)
    val kept = keysBn.filter(col("bn") <= Dedup.hotBucketCap)
    for (t <- Seq("_sig", "_keys", "_counts"))
      graft.Engine.reclaimManagedTable(s, tablePrefix + t)
    sig.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(s"${tablePrefix}_sig")
    kept.drop("bn").write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "band", "bh")
      .saveAsTable(s"${tablePrefix}_keys")
    keysBn.select(col("band"), col("bh"), col("bn").as("n")).distinct()
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "band", "bh")
      .saveAsTable(s"${tablePrefix}_counts")
  }

  /** Pre-r19 writeBm25Index: three corpus scans, no repartition. */
  private def oldBm25Build(s: SparkSession, d: String, tablePrefix: String,
      buckets: Int = 32): Unit = {
    val t = graft.Engine.table(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    for (tbl <- Seq("_tf", "_dl", "_stats"))
      graft.Engine.reclaimManagedTable(s, tablePrefix + tbl)
    TextAnalysis.bm25Tf(t).write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "w").sortBy("w").saveAsTable(s"${tablePrefix}_tf")
    TextAnalysis.bm25Dl(t).write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "doc_id").saveAsTable(s"${tablePrefix}_dl")
    TextAnalysis.bm25Stats(TextAnalysis.bm25Dl(t))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${tablePrefix}_stats")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Engine.session()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(f: => Unit): Double = (0 until reps).map(_ => timed(f)).min
    // warmup both shapes on sf0.01 (JIT/codegen; never the measured dir)
    oldMinhashBuild(spark, "/root/testdata/sf0.01", "ab_mh_warm")
    Dedup.writeMinhashIndexBucketed(spark, "/root/testdata/sf0.01", "ab_mh_warm")
    oldBm25Build(spark, "/root/testdata/sf0.01", "ab_bm_warm")
    TextAnalysis.writeBm25Index(spark, "/root/testdata/sf0.01", "ab_bm_warm")
    val cases: Seq[(String, String, () => Unit, Seq[String])] = Seq(
      ("minhash_old", "ab_mh_o", () => oldMinhashBuild(spark, d, "ab_mh_o"),
        Seq("_sig", "_keys", "_counts")),
      ("minhash_new", "ab_mh_n", () => Dedup.writeMinhashIndexBucketed(spark, d, "ab_mh_n"),
        Seq("_sig", "_keys", "_counts")),
      ("bm25_old", "ab_bm_o", () => oldBm25Build(spark, d, "ab_bm_o"),
        Seq("_tf", "_dl", "_stats")),
      ("bm25_new", "ab_bm_n", () => TextAnalysis.writeBm25Index(spark, d, "ab_bm_n"),
        Seq("_tf", "_dl", "_stats")))
    // position-matched double pass: old,new then new,old — the host
    // drifts within a session, so a single ordered pair is confounded
    for ((name, prefix, run, tables) <- cases) {
      spark.sparkContext.setJobDescription(s"indexbuild-ab: $name")
      val secs = minOf(run())
      val fc = tables.map(t => s"$t=${files(spark, prefix + t)}").mkString(" ")
      println(f"INDEXAB $name%-12s dir=$d secs=$secs%.2f files: $fc")
    }
    for ((_, prefix, run, tables) <- cases.reverse) {
      spark.sparkContext.setJobDescription(s"indexbuild-ab pass2")
      val secs = minOf(run())
      println(f"INDEXAB2 ${prefix}%-8s secs=$secs%.2f")
      val _ = tables
    }
    spark.stop()
  }
}
