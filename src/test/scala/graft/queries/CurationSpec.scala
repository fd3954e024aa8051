package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {

  test("stratified sample: deterministic, per-stratum rates near targets") {
    val s1 = Curation.queries("x_cur_sample_stratified")(spark, sf).collect()
    val s2 = Curation.queries("x_cur_sample_stratified")(spark, sf).collect()
    assert(s1.map(_.toString).toSeq == s2.map(_.toString).toSeq, "sampler must be deterministic")

    val audit = Curation.queries("x_cur_sample_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // realized rates within a loose tolerance of the 25%/50% targets
    val (_, _, enRate) = audit("en")
    assert(enRate > 0.10 && enRate < 0.40, s"en rate $enRate far from 0.25")
    audit.filterNot(_._1 == "en").foreach { case (lang, (_, _, rate)) =>
      assert(rate > 0.30 && rate < 0.70, s"$lang rate $rate far from 0.5")
    }
    // the sample is exactly the audit's kept counts
    assert(s1.length == audit.values.map(_._2).sum)
  }

  test("contamination: only non-benchmark docs reported, ratios in (0, 1]") {
    val rows = Curation.queries("x_cur_contamination")(spark, sf).collect()
    assert(rows.nonEmpty, "word-soup corpus must show 3-gram overlap")
    rows.foreach { r =>
      assert(r.getLong(0) >= 20, "benchmark docs (id < 20) must not self-report")
      val ratio = r.getDouble(3)
      assert(ratio > 0 && ratio <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "overlap cannot exceed total shingles")
    }
    // sorted by ratio desc
    val ratios = rows.map(_.getDouble(3))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
  }

  test("repetition: top-share ratio bounded and consistent with raw counts") {
    val rows = Curation.queries("x_cur_repetition")(spark, sf).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (n, top, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(top >= 1 && top <= n)
      assert(math.abs(ratio - top.toDouble / n) < 1e-15)
    }
    // cross-check one doc against a direct computation
    val doc = rows.head.getLong(0)
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === doc).select("text").collect().head.getString(0).split(" ")
    val top = words.groupBy(identity).map(_._2.length).max
    assert(rows.head.getLong(2) == top.toLong)
  }
}
