package graft

/** Stage-isolation probe for the counted gram index's lifecycle spill
  * (the PhashProbe pattern: when a ScaleBench row shows bytes the plan
  * shape doesn't predict, measure the verbs one at a time in a fresh
  * JVM and print the table's actual mass). Builds the index for one
  * corpus dir, reports row count and per-verb wall + spill + shuffle.
  *
  * Usage: sbt "runMain graft.GramProbe [corpusDir]"
  */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale/x256")
    val spark = Engine.session()
    val m = new org.apache.spark.scheduler.SparkListener {
      var sw = 0L; var spill = 0L
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          sw += te.taskMetrics.shuffleWriteMetrics.bytesWritten
          spill += te.taskMetrics.diskBytesSpilled
        }
    }
    spark.sparkContext.addSparkListener(m)
    def phase(name: String)(body: => Unit): Unit = {
      Thread.sleep(500)
      val (sw0, sp0) = (m.sw, m.spill)
      val t = System.nanoTime()
      body
      Thread.sleep(500)
      println(f"PROBE $name%-12s ${(System.nanoTime() - t) / 1e9}%8.2f s  " +
        f"sw ${(m.sw - sw0) / 1e6}%9.1f MB  spill ${(m.spill - sp0) / 1e6}%9.1f MB")
    }
    phase("build_member")(graft.queries.Dedup.writeGramIndex(spark, d, "gram_probe_m"))
    println("member rows=" + spark.table("gram_probe_m_grams").count())
    spark.sql("DROP TABLE IF EXISTS gram_probe_m_grams")
    phase("build")(graft.queries.Dedup.writeGramIndexCounted(spark, d, "gram_probe"))
    println("rows=" + spark.table("gram_probe_gramdf").count() +
      " files=" + spark.table("gram_probe_gramdf").inputFiles.length)
    phase("compact")(graft.queries.Dedup.compactGramIndexCounted(spark, "gram_probe"))
    phase("compact2")(graft.queries.Dedup.compactGramIndexCounted(spark, "gram_probe"))
    spark.sql("DROP TABLE IF EXISTS gram_probe_gramdf")
    spark.stop()
  }
}
