package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpecBase {

  /** Round-1 lambda formulation the native expression replaces. */
  private def lambdaSig(nPerm: Int): String =
    s"transform(sequence(0, ${nPerm - 1}), p -> array_min(transform(shs, t -> xxhash64(p, t))))"

  test("minhash_sig matches the xxhash64 lambda formulation value-for-value") {
    MinHashSignature.register(spark)
    val shs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id").agg(collect_set("w").as("shs"))
    val diff = shs
      .select(expr("minhash_sig(shs, 32)").as("fast"), expr(lambdaSig(32)).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0)
  }

  test("minhash_sig over pre-hashed long shingles matches the xxhash64 lambda form") {
    MinHashSignature.register(spark)
    val shs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id").agg(collect_set(xxhash64(col("w"))).as("shs"))
    val diff = shs
      .select(expr("minhash_sig(shs, 32)").as("fast"),
        expr("transform(sequence(0, 31), p -> array_min(transform(shs, t -> xxhash64(p, t))))").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0)
  }

  test("minhash_agg partial aggregate equals minhash_sig over the collected set") {
    MinHashSignature.register(spark)
    val aggName = MinHashAgg.register(spark, 32) // size-carrying name
    val hashes = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val diff = hashes
      .groupBy("doc_id")
      .agg(expr(s"$aggName(h)").as("agg"), collect_set("h").as("shs"))
      .select(col("agg"), expr("minhash_sig(shs, 32)").as("sig"))
      .filter(col("agg") =!= col("sig"))
      .count()
    assert(diff == 0)
  }

  test("null input and signature length") {
    MinHashSignature.register(spark)
    val r = spark.sql(
      """SELECT minhash_sig(CAST(NULL AS ARRAY<STRING>), 8) AS n,
        |       size(minhash_sig(array('a', 'b'), 16)) AS len""".stripMargin).collect().head
    assert(r.isNullAt(0))
    assert(r.getInt(1) == 16)
  }

  test("null ELEMENTS match the xxhash64 lambda form (seed pass-through)") {
    MinHashSignature.register(spark)
    // SQL xxhash64(p, NULL) = hash of p alone — the lambda form therefore
    // folds the seeded value in; the native expression must agree, and
    // must not NPE (both eval and codegen paths)
    val r = spark.sql(
      """SELECT minhash_sig(array('a', CAST(NULL AS STRING), 'b'), 16) AS fast,
        |       transform(sequence(0, 15),
        |         p -> array_min(transform(array('a', CAST(NULL AS STRING), 'b'),
        |                                  t -> xxhash64(p, t)))) AS slow,
        |       minhash_sig(array(CAST(NULL AS BIGINT), 7L), 16) AS fastl,
        |       transform(sequence(0, 15),
        |         p -> array_min(transform(array(CAST(NULL AS BIGINT), 7L),
        |                                  t -> xxhash64(p, t)))) AS slowl""".stripMargin)
      .collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](2) == r.getSeq[Long](3))
  }

  test("signatures of identical sets are identical, supersets dominate elementwise") {
    MinHashSignature.register(spark)
    val r = spark.sql(
      """SELECT minhash_sig(array('x', 'y', 'z'), 32) AS a,
        |       minhash_sig(array('z', 'x', 'y'), 32) AS b,
        |       minhash_sig(array('x', 'y', 'z', 'w'), 32) AS sup""".stripMargin).collect().head
    val a = r.getSeq[Long](0)
    val b = r.getSeq[Long](1)
    val sup = r.getSeq[Long](2)
    assert(a == b, "order-independent")
    assert(a.indices.forall(i => sup(i) <= a(i)), "superset min can only decrease")
  }
}
