package graft

/** Stage-isolation probe for the sessionization window's spill at
  * octave scale (the PhashProbe/GramProbe pattern), splitting the two
  * spill meters ScaleBench sums: `memoryBytesSpilled` counts the
  * IN-MEMORY bytes released each time a sorter rotates to disk (an
  * execution-memory CONTENTION footprint — under local[32] every
  * concurrent task holds a window-sort buffer against one shared
  * pool), while `diskBytesSpilled` is actual serialized disk traffic.
  * A pipeline with zero disk bytes and bounded per-rotation memory is
  * healthy at cluster memory-per-core; one with real disk writes has a
  * plan problem.
  *
  * Usage: sbt "runMain graft.EventsProbe [corpusDir]"
  */
object EventsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale/x256")
    val spark = Engine.session()
    val m = new org.apache.spark.scheduler.SparkListener {
      var disk = 0L; var mem = 0L; var sw = 0L
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          disk += te.taskMetrics.diskBytesSpilled
          mem += te.taskMetrics.memoryBytesSpilled
          sw += te.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
    }
    spark.sparkContext.addSparkListener(m)
    def phase(name: String)(body: => Unit): Unit = {
      Thread.sleep(500)
      val (d0, m0, s0) = (m.disk, m.mem, m.sw)
      val t = System.nanoTime()
      body
      Thread.sleep(500)
      println(f"PROBE $name%-14s ${(System.nanoTime() - t) / 1e9}%8.2f s  " +
        f"sw ${(m.sw - s0) / 1e6}%8.1f MB  disk ${(m.disk - d0) / 1e6}%8.1f MB  " +
        f"memfreed ${(m.mem - m0) / 1e6}%8.1f MB")
    }
    def run(): Unit = {
      val df = graft.queries.Events.queries("x_events_sessions")(spark, d)
      df.write.format("noop").mode("overwrite").save()
    }
    phase("warm")(run())
    phase("sessions")(run())
    phase("sessions2")(run())
    spark.stop()
  }
}
