package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpecBase {

  /** Round-1 lambda formulation the native expression replaces: per-token
    * ±1 bit vectors summed, sign per bit. */
  private val lambdaSig =
    """transform(
      |  aggregate(
      |    transform(ws, w -> transform(sequence(0, 63),
      |      b -> CASE WHEN shiftright(xxhash64(w), b) % 2 != 0 THEN 1L ELSE -1L END)),
      |    array_repeat(0L, 64),
      |    (acc, x) -> zip_with(acc, x, (p, q) -> p + q)),
      |  v -> CASE WHEN v > 0 THEN 1 ELSE 0 END)""".stripMargin

  test("simhash64 matches the round-1 lambda formulation bit-for-bit") {
    SimHash64.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val diff = docs
      .select(expr("simhash64(ws)").as("fast"), expr(lambdaSig).as("slowbits"))
      // unfold the native long into the 0/1 bit array (index = bit
      // position) and compare arrays — avoids ANSI overflow on bit 63
      .select(expr(
        "transform(sequence(0, 63), b -> CASE WHEN (shiftright(fast, b) & 1) != 0 THEN 1 ELSE 0 END)").as("fastbits"),
        col("slowbits"))
      .filter(col("fastbits") =!= col("slowbits"))
      .count()
    assert(diff == 0)
  }

  test("null input and bit_count hamming") {
    SimHash64.register(spark)
    val r = spark.sql(
      """SELECT simhash64(CAST(NULL AS ARRAY<STRING>)) AS n,
        |       bit_count(simhash64(array('a','b','c')) ^ simhash64(array('a','b','c'))) AS zero""".stripMargin)
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getInt(1) == 0)
  }

  test("null ELEMENTS hash as the xxhash64 seed (no NPE, parity with SQL)") {
    SimHash64.register(spark)
    // a null token contributes xxhash64's seed pass-through (42), exactly
    // what the round-1 lambda form would fold in via xxhash64(w)
    val r = spark.sql(
      """SELECT simhash64(array('a', CAST(NULL AS STRING), 'b')) AS withNull,
        |       simhash64(array('a', 'b')) AS without""".stripMargin).collect().head
    assert(!r.isNullAt(0)) // computes, doesn't NPE
    assert(r.getLong(0) != r.getLong(1)) // and the null element weighs in
  }

  test("banded simhash LSH finds exactly the all-pairs result on the bounded subset") {
    import graft.queries.Dedup
    val exact = Dedup.queries("x_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.queries("x_dedup_simhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (da, db, _) => da < 200 && db < 200 }.toSet
    // pigeonhole over 8 blocks is complete for hamming <= 6: no false
    // negatives; exact re-verification removes all false positives
    assert(banded == exact, s"banded=${banded.size} exact=${exact.size}")
  }
}
