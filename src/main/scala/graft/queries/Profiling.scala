package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling operator — the pre-ingest audit step of a training-data
  * pipeline: per-column row count, null count, exact distinct count and
  * min/max, emitted as one row per column. The profile a 100 TB ingest
  * runs before committing a new crawl into the corpus (schema drift, null
  * explosions, key-range regressions all surface here first).
  *
  * Scale shape: ONE aggregation pass over the table. Multiple exact
  * COUNT(DISTINCT) columns compile to Spark's Expand-based single-pass
  * plan (rows × #columns intermediate, partial-aggregated map-side);
  * at petabyte scale a caller trades exactness for approx_count_distinct
  * (the b_agg_approx surface) — the profile shape is unchanged. The
  * stack() unpivot runs on the single 1-row aggregate result.
  *
  * min/max are CAST to string so one schema carries every column type;
  * the profiled columns here are string/integer (float formatting is
  * engine-specific — profile floats via their exact aggregates instead).
  */
object Profiling {

  type Q = (SparkSession, String) => DataFrame

  private val DocCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  val queries: Map[String, Q] = Map(
    "x_prof_documents" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val aggs = DocCols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c")))
      val one = docs.agg(count(lit(1)).as("n"), aggs: _*)
      val stacked = DocCols
        .map(c => s"'$c', n - cnt_$c, nd_$c, min_$c, max_$c")
        .mkString(s"stack(${DocCols.size}, ", ", ", ")")
      one.select(col("n"),
          expr(s"$stacked AS (col_name, nulls, n_distinct, min_v, max_v)"))
        .select(col("col_name"), col("n"), col("nulls"), col("n_distinct"),
          col("min_v"), col("max_v"))
        .orderBy("col_name")
    }),

    // -- array-column profile for the embeddings table: the vector-
    //    specific invariants a serving pipeline must audit before an
    //    index build — dimensionality drift (distinct/min/max dims),
    //    NaN poisoning, and the corpus norm mass (an exact scaled-
    //    integer DECIMAL sum — order-independent, partial-aggregatable
    //    — so re-profiles byte-agree; the double division happens once
    //    on the final scalar). One aggregation pass, no shuffle beyond
    //    the 1-row reduce.
    "x_prof_embeddings" -> ((s, d) => {
      graft.functions.CosineSimilarity.register(s)
      table(s, d, "embeddings")
        .agg(
          count(lit(1)).as("n"),
          count(col("embedding")).as("n_nonnull"),
          countDistinct(size(col("embedding"))).as("n_dims_distinct"),
          min(size(col("embedding"))).cast("long").as("dims_min"),
          max(size(col("embedding"))).cast("long").as("dims_max"),
          sum(when(expr("exists(embedding, x -> isnan(CAST(x AS DOUBLE)))"), 1L)
            .otherwise(0L)).as("n_nan"),
          (sum(floor(expr("float_dot(embedding, embedding)") * lit(1000000.0))
            .cast("decimal(38,0)")).cast("double") / lit(1000000.0)).as("norm_sq_mass"))
        .select(col("n"), (col("n") - col("n_nonnull")).as("nulls"),
          col("n_dims_distinct"), col("dims_min"), col("dims_max"),
          col("n_nan"), col("norm_sq_mass"))
    })
  )

  val oracle: Map[String, String] = Map(
    "x_prof_documents" -> DocCols.map(c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
         |       CAST(count(*) - count($c) AS BIGINT) AS nulls,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "x_prof_embeddings" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) - count(embedding) AS BIGINT) AS nulls,
         |  CAST(count(DISTINCT len(embedding)) AS BIGINT) AS n_dims_distinct,
         |  CAST(min(len(embedding)) AS BIGINT) AS dims_min,
         |  CAST(max(len(embedding)) AS BIGINT) AS dims_max,
         |  CAST(sum(CASE WHEN len(list_filter(embedding,
         |         x -> isnan(CAST(x AS DOUBLE)))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
         |  CAST(sum(CAST(floor(${Similarity.dotSql("embedding", "embedding")} * 1000000.0)
         |         AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS norm_sq_mass
         |FROM embeddings""".stripMargin
  )
}
