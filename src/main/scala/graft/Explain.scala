package graft

/** Plan-quality inspector: prints the formatted physical plan for the named
  * queries (all when no names given). Review checklist per SURVEY §4 /
  * the scale posture: broadcasts on dimension joins, PushedFilters +
  * pruned ReadSchema at parquet scans, wide WholeStageCodegen spans, no
  * unexpected cartesian products.
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Engine.session()
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          println(s"\n=================== $n ===================")
          try println(q(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
