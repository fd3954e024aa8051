package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpecBase {

  test("topk_agg == the row_number window form, incl. ties, duplicates and short groups") {
    import spark.implicits._
    val name = TopKAgg.register(spark, 3)
    // adversarial: cos collapses to 10 distinct values (many exact ties),
    // ids collide within groups (duplicate (cos, id) rows), and group 7
    // is shorter than k
    val rows = (for { g <- 0 until 7; i <- 0 until 50 } yield
      (g.toLong, (i * 2654435761L + g) % 97L, ((i * 31 + g * 7) % 10).toDouble / 10.0)) ++
      Seq((7L, 1L, 0.5), (7L, 2L, 0.5))
    val df = rows.toDF("key", "id", "cos")
    val viaAgg = df.groupBy("key").agg(expr(s"$name(cos, id)").as("tk"))
      .select(col("key"), posexplode(col("tk")).as(Seq("pos", "hit")))
      .select(col("key"), col("pos"), col("hit.cos"), col("hit.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sorted
    val w = Window.partitionBy("key").orderBy(col("cos").desc, col("id").asc)
    val viaWin = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("key"), (col("rn") - 1).cast("int").as("pos"), col("cos"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sorted
    assert(viaAgg == viaWin, s"agg $viaAgg != window $viaWin")
    // the short group yields its whole membership
    assert(viaAgg.count(_._1 == 7L) == 2)
  }

  test("topk_agg aggregates partially — no window, map-side combine in the plan") {
    import spark.implicits._
    val name = TopKAgg.register(spark, 3)
    val df = (0 until 100).map(i => (i % 5L, i.toLong, i / 100.0)).toDF("key", "id", "cos")
      .groupBy("key").agg(expr(s"$name(cos, id)").as("tk"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"top-k must not plan a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"UDAF must plan as a (partial-capable) aggregate:\n$p")
  }

  test("mink_agg == the ascending row_number window form, exact on sub-double-precision hashes") {
    import spark.implicits._
    // hash pairs differing only in the low bits — below double-mantissa
    // resolution, the exact failure mode a score-typed top-k would hit
    val base = 1L << 59
    val rows = (for { g <- 0 until 5; i <- 0 until 40 } yield
      (g.toLong, (i * 2654435761L + g) % 97L, base + (i % 7).toLong)) ++
      Seq((5L, 1L, base), (5L, 2L, base))
    val df = rows.toDF("key", "id", "h")
    val got = MinKAgg.minkOf(df, "key", "id", "h", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val w = Window.partitionBy("key").orderBy(col("h").asc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3).select("key", "rank", "id", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == want, s"mink $got != window $want")
    assert(got.count(_._1 == 5L) == 2, "short group yields its whole membership")
    val p = MinKAgg.minkOf(df, "key", "id", "h", 3).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"cap-per-key must not plan a window:\n$p")
  }
}
