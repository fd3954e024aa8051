package graft.queries

import graft.SparkSpecBase

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

  test("as-of join equals the brute-force per-purchase latest-view") {
    val rows = Events.queries("x_events_asof")(spark, sf).collect()

    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", s"${Events.nsToUs} AS us", "event_type")
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
}
