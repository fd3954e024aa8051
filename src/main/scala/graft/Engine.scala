package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + testdata helpers shared by Verify / Bench / tests.
  *
  * Scale posture: every knob here is chosen so the same code runs unchanged
  * on a real cluster — AQE on (runtime re-planning, skew-join splitting),
  * shuffle partitions sized for local[32] via config (a cluster submit
  * overrides them), broadcast threshold left at default so Catalyst promotes
  * dimension tables (region/nation/...) automatically.
  */
object Engine {

  def session(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts has shipped as both parquet timestamp[ns] and
      // timestamp[us] across testdata generations; keep ns readable as
      // long so Events.usFor can dispatch on whichever layout arrives
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one driver-generated parquet table from a scale-factor dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Crash-safe managed-table overwrite: a JVM that died between
    * materializing a managed table's files and registering it leaves an
    * orphaned warehouse location, and the NEXT overwrite then fails with
    * LOCATION_ALREADY_EXISTS (the in-memory catalog forgot the table,
    * the directory survived). Every index/model writer reclaims — drop
    * any catalog entry AND the orphaned location — before rewriting, so
    * a rebuild always succeeds regardless of how its predecessor died. */
  def reclaimManagedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table.toLowerCase(java.util.Locale.ROOT))
    if (loc.exists()) {
      org.apache.hadoop.fs.FileUtil.fullyDelete(loc)
      ()
    }
  }

  /** Row count for plan-build sizing probes (LSH banding, ANN planes):
    * plan statistics when they are EXACT by construction — Range, a
    * MATERIALIZED cache (whose stats come from its row-count accumulator),
    * and LocalRelation under test configs — so sizing costs NO job;
    * otherwise one count() scan (itself metadata-cheap on parquet:
    * row-group counts, no column IO). Catalog stats from ANALYZE are
    * deliberately NOT trusted: they survive table rewrites, and a stale
    * count silently resizes LSH planes/bands — correctness-relevant, not
    * just a costing hint. An UNmaterialized cache falls back to its
    * child's stats, which can carry exactly those stale catalog counts,
    * so it must count(). */
  def rowCountFast(df: DataFrame): Long =
    exactStatsRowCount(df).getOrElse(df.count())

  /** The exact-by-construction whitelist behind [[rowCountFast]], exposed
    * so probes that COMBINE the count with other per-corpus facts in one
    * job (x_sim_lsh's dims+count agg) apply the SAME trust policy instead
    * of reading raw `stats.rowCount` (which can carry stale ANALYZE
    * counts). None = no trusted stats; run your own job. */
  def exactStatsRowCount(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Range}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val plan = df.queryExecution.optimizedPlan
    val exact = plan match {
      case _: LocalRelation | _: Range => plan.stats.rowCount
      case r: InMemoryRelation if r.cacheBuilder.isCachedColumnBuffersLoaded =>
        plan.stats.rowCount
      case _ => None
    }
    exact.map(_.toLong)
  }
}
