package graft

/** Scratch probe: stage timing for x_text_unigram_ids at a given dir. */
object UidsProbe {
  def main(args: Array[String]): Unit = {
    val s = Engine.session()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val docs = Engine.table(s, d, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    t("emfit_count") { graft.queries.Unigram.emFit(s, d).count() }
    t("emfit_collect") { graft.queries.Unigram.emFit(s, d).collect().length }
    t("emfit_window_count") {
      import org.apache.spark.sql.expressions.Window
      graft.queries.Unigram.emFit(s, d).withColumn("id",
        row_number().over(Window.orderBy(col("c").desc, col("piece"))).cast("long") - 1L)
        .count()
    }
    val model = t("fit_collect") { graft.queries.Unigram.unigramFit(s, d) }
    t("tokenize") { graft.queries.Unigram.tokenizeOf(docs, model).orderBy("doc_id").count() }
    t("tokenize2") { graft.queries.Unigram.tokenizeOf(docs, model).orderBy("doc_id").count() }
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val _ = words // segment is queries-private; tokenize2 isolates warm-path cost
    s.stop()
  }
}
