package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpecBase {

  private val composed =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v) " +
      "/ (sqrt(aggregate(a, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * " +
      "   sqrt(aggregate(b, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  test("cosine_sim matches the composed lambda formula bit-for-bit") {
    CosineSimilarity.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < 20 && col("ib") < 20)
    val diff = pairs
      .select(expr("cosine_sim(a, b)").as("fast"), expr(composed).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0)
  }

  test("null/empty/mismatched/zero-norm inputs are NULL (composed-form parity)") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS n,
        |       cosine_sim(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS z,
        |       cosine_sim(array(CAST(1.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS mis,
        |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS ne,
        |       cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS zn,
        |       float_dot(array(CAST(1.0 AS FLOAT)),
        |                 array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS dmis,
        |       float_dot(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS dz
        |""".stripMargin).collect().head
    assert(r.isNullAt(0), "null input")
    // the composed form divides 0/0 → NULL; a mismatched length zip_with
    // pads with nulls → NULL; a null element → NULL; zero norm → NULL —
    // malformed rows surface as NULL, never as plausible scores
    assert(r.isNullAt(1), "empty arrays")
    assert(r.isNullAt(2), "mismatched lengths")
    assert(r.isNullAt(3), "null element")
    assert(r.isNullAt(4), "zero norm")
    assert(r.isNullAt(5), "float_dot mismatched lengths")
    assert(r.getDouble(6) == 0d, "float_dot over equal empty arrays is the fold init")
  }

  test("int_dot equals the composed aggregate/zip_with fold, edges included") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      """SELECT int_dot(array(3L, -2L, 7L), array(5L, 4L, 2L)) AS v,
        |       aggregate(zip_with(array(3L, -2L, 7L), array(5L, 4L, 2L),
        |         (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS composed,
        |       int_dot(array(1L), array(1L, 2L)) AS mis,
        |       int_dot(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS ne,
        |       int_dot(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS z
        |""".stripMargin).collect().head
    assert(r.getLong(0) == 21L && r.getLong(1) == 21L, "value parity with the fold")
    assert(r.isNullAt(2), "mismatched lengths")
    assert(r.isNullAt(3), "null element")
    assert(r.getLong(4) == 0L, "equal empty arrays are the fold init")
  }

  test("codegen path produces same results as interpreted eval") {
    CosineSimilarity.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(5).collect()
    val a = e(0).getSeq[Float](1)
    val b = e(1).getSeq[Float](1)
    // interpreted (driver-side nullSafeEval via literal folding is avoided
    // by routing through a DataFrame with codegen on)
    import spark.implicits._
    val df = Seq((a, b)).toDF("a", "b")
    val viaDf = df.selectExpr("cosine_sim(a, b)").collect().head.getDouble(0)
    var dot = 0d; var nx = 0d; var ny = 0d
    (a.indices).foreach { i =>
      dot += a(i).toDouble * b(i).toDouble
      nx += a(i).toDouble * a(i).toDouble
      ny += b(i).toDouble * b(i).toDouble
    }
    val want = dot / (math.sqrt(nx) * math.sqrt(ny))
    assert(viaDf == want)
  }
}
