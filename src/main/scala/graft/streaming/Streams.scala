package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over an `events`-shaped stream
  * (ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE).
  *
  * The reference's only "streaming" feature is file-watch re-query
  * (connection_config.go watch tags — SURVEY A21); the batch analog is
  * re-running the registered views. These operators are the north-star
  * extension: real event-time processing with watermarks and state.
  *
  * Scale: state is keyed (user_id / window), so it partitions across
  * executors; watermarks bound state size; all aggregations use Spark's
  * incremental state store — the standard production layout.
  */
object Streams {

  /** Tumbling 1-hour event-time windows with a 10-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows: 1 hour wide, every 30 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows: 30-minute inactivity gap per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup on a key column within the watermark horizon —
    * the streaming twin of x_dedup_exact. */
  def dedupe(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicates(keyCols :+ "ts")

  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user totals
    * (the pattern for bespoke state the built-in aggs can't express). */
  def runningTotals(events: Dataset[(java.sql.Timestamp, Long, String, Double)]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._2)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { r => n += 1; total += r._4 }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }
}
