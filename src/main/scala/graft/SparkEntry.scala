package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from SURVEY.md §2;
  * each has a DuckDB-equivalent `oracleSql` entry unless the operator is not
  * SQL-expressible (those get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("b_join_multiway")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TerraformQ.queries ++
      graft.queries.Dedup.queries ++ graft.queries.Similarity.queries ++
      graft.queries.ProductQuant.queries ++ graft.queries.Profiling.queries ++
      graft.queries.TextAnalysis.queries ++ graft.queries.Events.queries ++
      graft.queries.Multimodal.queries ++ graft.queries.Curation.queries ++
      graft.queries.Unigram.queries ++ graft.queries.Wordpiece.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.TerraformQ.oracle ++
      graft.queries.Dedup.oracle ++ graft.queries.Similarity.oracle ++
      graft.queries.ProductQuant.oracle ++ graft.queries.Profiling.oracle ++
      graft.queries.TextAnalysis.oracle ++ graft.queries.Events.oracle ++
      graft.queries.Multimodal.oracle ++ graft.queries.Curation.oracle ++
      graft.queries.Unigram.oracle ++ graft.queries.Wordpiece.oracle
}
