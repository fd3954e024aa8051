package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {

  test("salted join is row-identical to the plain join on skewed data") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      // manufacture skew: fold most rows onto one hot key
      .withColumn("k", when(col("l_orderkey") % 7 === 0, 1L).otherwise(col("l_orderkey") % 100))
      .select("k", "l_quantity")
    val dim = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("g"), (col("id") % 5)).as("grp"))

    val plain = lineitem.join(dim, "k")
      .groupBy("grp").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(25,2)")).cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)

    val salted = SkewJoin.saltedJoin(lineitem, dim, "k", salts = 8)
      .groupBy("grp").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(25,2)")).cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)

    assert(plain.toSeq == salted.toSeq)
  }

  test("outer/semi/anti join types are rejected (not row-identical when salted)") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "va")
    val b = Seq((1L, "y")).toDF("k", "vb")
    for (jt <- Seq("full_outer", "right", "left_semi", "left_anti"))
      assertThrows[IllegalArgumentException](SkewJoin.saltedJoin(a, b, "k", 4, jt))
  }

  test("left join keeps unmatched large-side rows") {
    import spark.implicits._
    val large = Seq((1L, "a"), (1L, "b"), (99L, "z")).toDF("k", "v")
    val small = Seq((1L, "dim1")).toDF("k", "d")
    val rows = SkewJoin.saltedJoin(large, small, "k", salts = 4, joinType = "left")
      .orderBy("v").collect()
    assert(rows.length == 3)
    assert(rows.count(_.isNullAt(2)) == 1) // the k=99 row has no dim match
  }
}
