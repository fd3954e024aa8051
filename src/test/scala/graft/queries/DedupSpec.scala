package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.Row

/** Invariants for the hash-based dedup operators (no SQL oracle: xxhash64
  * is Spark-only). The sf0.001 corpus has planted near-duplicates —
  * (8,12) and (0,50) at 3-gram Jaccard ≈ 0.97/0.95. */
class DedupSpec extends SparkSpecBase {

  private def pairs(name: String): Set[(Long, Long)] =
    Dedup.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH finds the planted near-duplicate pairs") {
    val got = pairs("x_dedup_minhash")
    assert(got.contains((8L, 12L)), s"missing (8,12) in $got")
    assert(got.contains((0L, 50L)), s"missing (0,50) in $got")
  }

  test("minhash estimate tracks exact jaccard for planted pairs") {
    val est = Dedup.queries("x_dedup_minhash")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = Dedup.queries("x_dedup_ngram_jaccard")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (p <- Seq((8L, 12L), (0L, 50L))) {
      assert(math.abs(est(p) - exact(p)) < 0.35, s"est ${est(p)} vs exact ${exact(p)} for $p")
    }
  }

  test("simhash puts planted near-duplicates within the hamming budget") {
    val got = pairs("x_dedup_simhash")
    assert(got.contains((8L, 12L)) && got.contains((0L, 50L)), s"got $got")
  }

  test("documents shorter than 3 tokens produce no shingles") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val docs = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "one two three"),
      (5L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val got = Dedup.shinglesOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((4L, "one two three"), (5L, "a b c"), (5L, "b c d")))
  }

  test("dedup operators are deterministic across runs") {
    val a = Dedup.queries("x_dedup_minhash")(spark, sf).collect().toSeq
    val b = Dedup.queries("x_dedup_minhash")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
