package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** md5long60 must be bit-identical to the composed
  * conv(substring(md5(s), 1, 15), 16, 10) form it replaces — that form
  * is what the DuckDB oracles reproduce. */
class Md5Long60Spec extends SparkSpecBase {

  test("equals the conv/substring form on corpus tokens and edge strings") {
    import spark.implicits._
    Md5Long60.register(spark)
    val edge = Seq("", " ", "a", "ü ñ 中文", "0", "\t", "a" * 300)
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w")).limit(5000)
      .as[String].collect().toSeq
    val df = (edge ++ corpus).toDF("w")
      .select(col("w"),
        expr("md5long60(w)").as("fast"),
        expr("CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)").as("ref"))
    val bad = df.filter(col("fast") =!= col("ref")).collect()
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).mkString(",")}")
    // range: 60-bit unsigned → always non-negative
    assert(df.filter(col("fast") < 0).count() == 0)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    Md5Long60.register(spark)
    val rows = Seq("x", "hello world", "").toDF("w")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try rows.select(expr("md5long60(w)")).collect().map(_.getLong(0)).toSeq
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = rows.select(expr("md5long60(w)")).collect().map(_.getLong(0)).toSeq
    assert(interp == gen)
  }
}
