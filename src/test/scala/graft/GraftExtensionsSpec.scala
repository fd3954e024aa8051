package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions must expose every native function to pure SQL with no
  * register calls. */
class GraftExtensionsSpec extends SparkSpecBase {

  test("extension-built session resolves all graft functions from SQL") {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions exercises the same injection as
      // --conf spark.sql.extensions=graft.GraftExtensions (the conf form
      // is read at SparkContext creation, which this suite shares)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c,
          |       float_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d,
          |       int_dot(array(4L, 5L), array(2L, 3L)) AS id,
          |       size(minhash_sig(array('a', 'b'), 8)) AS m,
          |       simhash64(array('x', 'y')) AS sh""".stripMargin).collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 6.0)
      assert(r.getLong(2) == 23L)
      assert(r.getInt(3) == 8)
      // the Bloom sketch pair (Catalyst internals surfaced as functions):
      // build over 3 values, then membership — present hits, absent may
      // only false-positive (assert the definite-negative direction via
      // a filter sized to make fp unlikely)
      val bloom = s2.sql(
        """SELECT hex(bloom_agg(xxhash64(v), CAST(3 AS BIGINT), CAST(8192 AS BIGINT))) AS bf
          |FROM VALUES ('a'), ('b'), ('c') t(v)""".stripMargin).collect().head.getString(0)
      val mc = s2.sql(
        s"""SELECT bloom_contains(X'$bloom', xxhash64('a')),
           |       bloom_contains(X'$bloom', xxhash64('definitely-absent-key'))""".stripMargin)
        .collect().head
      assert(mc.getBoolean(0), "bloom must contain an inserted key (no false negatives)")
      assert(!mc.getBoolean(1), "8192-bit filter over 3 items must reject an absent key")
      // cms: build via the BUILTIN aggregate, query via graft's estimate
      val cms = s2.sql(
        """SELECT hex(count_min_sketch(xxhash64(v), CAST(0.01 AS DOUBLE),
          |  CAST(0.99 AS DOUBLE), 42)) AS sk
          |FROM VALUES ('a'), ('a'), ('b') t(v)""".stripMargin).collect().head.getString(0)
      val est = s2.sql(
        s"""SELECT cms_estimate(X'$cms', xxhash64('a')),
           |       cms_estimate(X'$cms', xxhash64('b'))""".stripMargin).collect().head
      assert(est.getLong(0) >= 2L && est.getLong(1) >= 1L,
        "cms estimates must never undercount")
      // parity with the register()-path expression on the same input
      graft.functions.SimHash64.register(base)
      val want = base.sql("SELECT simhash64(array('x', 'y'))").collect().head.getLong(0)
      assert(r.getLong(4) == want)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
