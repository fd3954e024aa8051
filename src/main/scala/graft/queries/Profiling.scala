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
    }),

    // -- robust per-dimension OUTLIER detection: flag vectors with any
    //    coordinate beyond 5×MAD of that dimension's median — the
    //    poisoned-embedding audit (a corrupted encoder or bit-flipped
    //    shard shows up as per-dim outliers long before it shifts a
    //    mean). Medians are exact rank arithmetic in two window passes,
    //    each PARTITIONED BY DIMENSION (64-way parallel; at petabyte
    //    scale swap approx_percentile — the gated sketch precedent —
    //    for the same report shape). The 5×MAD compare is exact double
    //    arithmetic on identical inputs, so verdicts hash-gate.
    "x_prof_embed_outliers" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val x = table(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select(col("vec_id"), col("pos"), col("xf").cast("double").as("x"))
      def medOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
        val w = Window.partitionBy("pos").orderBy(col(valueCol), col("vec_id"))
        df.withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("pos")))
          .groupBy("pos")
          .agg(max(when(col("rn") === expr("1L + (cnt - 1L) div 2L"), col(valueCol))).as(out))
      }
      val med = medOf(x, "x", "med")
      val dev = x.join(broadcast(med), Seq("pos"))
        .withColumn("adev", abs(col("x") - col("med")))
      val mad = medOf(dev.select(col("vec_id"), col("pos"), col("adev")), "adev", "mad")
      dev.join(broadcast(mad), Seq("pos"))
        .select(col("vec_id"),
          (col("adev") > lit(5.0) * col("mad")).cast("long").as("o"))
        .groupBy("vec_id").agg(sum("o").as("n_out_dims"))
        .withColumn("is_outlier", col("n_out_dims") > 0)
        .orderBy("vec_id")
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
         |FROM embeddings""".stripMargin,

    // the same two rank-arithmetic median passes per dimension
    "x_prof_embed_outliers" ->
      """WITH x AS (SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |           FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)),
        |m1 AS (SELECT pos, max(CASE WHEN rn = 1 + (cnt - 1) // 2 THEN x END) AS med
        |       FROM (SELECT pos, x,
        |               row_number() OVER (PARTITION BY pos ORDER BY x, vec_id) AS rn,
        |               count(*) OVER (PARTITION BY pos) AS cnt FROM x) GROUP BY pos),
        |dv AS (SELECT x.vec_id, x.pos, abs(x.x - m1.med) AS adev
        |       FROM x JOIN m1 USING (pos)),
        |m2 AS (SELECT pos, max(CASE WHEN rn = 1 + (cnt - 1) // 2 THEN adev END) AS mad
        |       FROM (SELECT pos, adev,
        |               row_number() OVER (PARTITION BY pos ORDER BY adev, vec_id) AS rn,
        |               count(*) OVER (PARTITION BY pos) AS cnt FROM dv) GROUP BY pos),
        |f AS (SELECT dv.vec_id,
        |        CASE WHEN dv.adev > 5.0 * m2.mad THEN 1 ELSE 0 END AS o
        |      FROM dv JOIN m2 USING (pos))
        |SELECT vec_id, CAST(sum(o) AS BIGINT) AS n_out_dims,
        |       sum(o) > 0 AS is_outlier
        |FROM f GROUP BY vec_id ORDER BY vec_id""".stripMargin
  )
}
