package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

/** Events operators (windowing is oracle-gated in Verify; the as-of join
  * gets a brute-force semantic proof here on top of its DuckDB ASOF
  * oracle). */
class EventsSpec extends SparkSpecBase {

  test("ns→µs conversion floors pre-epoch timestamps like DuckDB epoch_us") {
    // epoch_us(TIMESTAMP_NS '1969-12-31 23:59:59.9999985') = -2 in DuckDB
    // (floor), while `ts div 1000` would truncate -1500 → -1
    val got = spark.sql(
      s"SELECT ${Events.nsToUs} AS us FROM VALUES (-1500L), (-1000L), (-999L), (0L), (999L), (1500L) AS t(ts)")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-2L, -1L, -1L, 0L, 0L, 1L))
  }

  test("usFor dispatches on the ts layout; every layout yields epoch µs") {
    // long ns → floor-div path
    val ns = spark.sql("SELECT CAST(1500 AS BIGINT) AS ts")
    assert(ns.select(Events.usFor(ns).as("us")).head().getLong(0) == 1L)
    // TIMESTAMP_NTZ (parquet timestamp[us], the regenerated-testdata
    // layout) → timezone-independent µs diff, pre-epoch included
    val ntz = spark.sql(
      """SELECT ts FROM VALUES
        |  (TIMESTAMP_NTZ'1969-12-31 23:59:59.999998'),
        |  (TIMESTAMP_NTZ'1970-01-01 00:00:00'),
        |  (TIMESTAMP_NTZ'1970-01-01 00:00:01.000001') AS t(ts)""".stripMargin)
    assert(ntz.select(Events.usFor(ntz).as("us")).collect().map(_.getLong(0)).toSeq
      == Seq(-2L, 0L, 1000001L))
    // zoned TIMESTAMP → unix_micros (session tz is UTC in specs)
    val tz = spark.sql("SELECT TIMESTAMP'1970-01-01 00:00:02' AS ts")
    assert(tz.select(Events.usFor(tz).as("us")).head().getLong(0) == 2000000L)
  }

  test("as-of join equals the brute-force per-purchase latest-view") {
    val rows = Events.queries("x_events_asof")(spark, sf).collect()

    val raw = spark.read.parquet(s"$sf/events.parquet")
    val ev = raw
      .select(col("event_id"), col("user_id"), Events.usFor(raw).as("us"),
        col("event_type"))
      .collect()
    val views = ev.filter(_.getString(3) == "view")
      .groupBy(r => (r.getLong(1), r.getLong(2)))
      .map { case ((u, us), rs) => (u, us, rs.map(_.getLong(0)).max) }.toSeq
    val purchases = ev.filter(_.getString(3) == "purchase")

    assert(rows.length == purchases.length, "one output row per purchase (left join)")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    purchases.foreach { p =>
      val (pid, u, pus) = (p.getLong(0), p.getLong(1), p.getLong(2))
      val best = views.filter(v => v._1 == u && v._2 <= pus)
        .sortBy(v => (v._2, v._3)).lastOption
      val r = byId(pid)
      best match {
        case Some((_, vus, vid)) =>
          assert(r.getLong(3) == vid && r.getLong(4) == vus && r.getLong(5) == pus - vus,
            s"purchase $pid: got (${r.get(3)}, ${r.get(4)}) want ($vid, $vus)")
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
            s"purchase $pid should have no prior view")
      }
    }
  }

  test("conversion attribution: first later purchase per view, brute-force proof") {
    val rows = Events.queries("x_events_conversion")(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val raw = graft.Engine.table(spark, sf, "events")
    val us = raw.withColumn("us", Events.usFor(raw))
      .select("event_id", "user_id", "event_type", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = us.filter(_._3 == "view")
    val purch = us.filter(_._3 == "purchase")
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId.size == views.length, "one row per view")
    views.foreach { case (vid, u, _, vus) =>
      val later = purch.filter(p => p._2 == u && p._4 > vus)
      val want = if (later.isEmpty) None
        else Some(later.minBy(p => (p._4, p._1))._1)
      val (_, gotP, conv) = byId(vid)
      assert(gotP == want, s"view $vid: first later purchase")
      val wantConv = later.nonEmpty &&
        later.minBy(p => (p._4, p._1))._4 <= vus + 3600000000L
      assert(conv == wantConv, s"view $vid: conversion label")
    }
    // both labels and the no-purchase case all occur at gate scale
    assert(rows.map(_._3).toSet == Set(true, false))
    assert(rows.exists(_._2.isEmpty), "some view should have no later purchase")
  }

  test("sessionization spread gate: branches agree; footer row probe is exact") {
    // gate corpus sits under the bound → the window's own AQE-coalesced
    // exchange, no explicit repartition in the plan
    val q = Events.queries("x_events_sessions")
    def planStr = q(spark, sf).queryExecution.optimizedPlan.toString
    assert(!planStr.contains("RepartitionByExpression"),
      s"gate corpus should skip the explicit spread:\n$planStr")
    val plain = q(spark, sf).collect().toSeq
    // force the spread branch (the wideArgmaxRows sys-prop idiom) and
    // pin row-for-row equality — the spread is execution strategy only.
    // The forced target derives from the corpus so the branch trips at
    // ~4× fleet width (a few hundred partitions), not footerRows/10
    // tasks (tens of thousands of ~10-row tasks at gate scale)
    val rows = Curation.footerRows(spark, s"$sf/events.parquet")
    val forced = math.max(1L, rows / (4L * spark.sparkContext.defaultParallelism))
    sys.props("graft.sessionSpreadRows") = forced.toString
    try {
      assert(planStr.contains("RepartitionByExpression"),
        s"tiny spread target should engage the explicit spread:\n$planStr")
      assert(q(spark, sf).collect().toSeq == plain,
        "spread and plain sessionization branches diverged")
    } finally sys.props.remove("graft.sessionSpreadRows")
    // the sizing probe reads parquet footers only — exact vs a real count
    assert(Curation.footerRows(spark, s"$sf/events.parquet") ==
      spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("rate anomaly: integer z² verdicts match a driver recompute; both verdicts occur") {
    val rows = Events.queries("x_events_anomaly")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._2)
    byType.foreach { case (_, g) =>
      val hh = g.length.toLong
      val ss = g.map(_._3).sum
      val ss2 = g.map(n => n._3 * n._3).sum
      g.foreach { case (w, t, n, mu, anomaly) =>
        assert(mu == ss.toDouble / hh, s"($w,$t) mean")
        val dev = BigInt(n * hh - ss)
        val want = dev * dev > BigInt(4) * (BigInt(hh) * BigInt(ss2) - BigInt(ss) * BigInt(ss))
        assert(anomaly == want, s"($w,$t) verdict")
      }
    }
    // the 2σ cut is non-vacuous on the gate corpus — both verdicts occur
    assert(rows.map(_._5).toSet == Set(true, false))
  }
}
