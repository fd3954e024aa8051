package graft.sources

import graft.SparkSpecBase
import graft.tf.Terraform
import org.apache.spark.sql.functions._

/** The DataSource V2 packaging must be indistinguishable from the
  * registered temp views: same columns, same types, same rows — plus the
  * DSv2-native behaviors (planning-time path pruning, column pruning). */
class TerraformDsv2Spec extends SparkSpecBase {

  private val dir = new java.io.File("fixtures").getAbsolutePath

  private def v2(table: String) =
    spark.read.format("terraform")
      .option("table", table)
      .option("configurationFilePaths", s"$dir/*.tf")
      .option("planFilePaths", s"$dir/tfplan.json,$dir/tfplan_oneline.json")
      .option("stateFilePaths", s"$dir/terraform.tfstate")
      .load()

  private lazy val views: Unit = {
    Terraform.register(spark, Terraform.Paths(
      configurationFilePaths = Seq(s"$dir/*.tf"),
      planFilePaths = Seq(s"$dir/tfplan.json", s"$dir/tfplan_oneline.json"),
      stateFilePaths = Seq(s"$dir/terraform.tfstate")))
    ()
  }

  private val allTables = Seq("terraform_resource", "terraform_data_source",
    "terraform_local", "terraform_module", "terraform_output",
    "terraform_provider", "terraform_variable", "terraform_diagnostics")

  test("spark.read.format(terraform) matches the registered views, all tables") {
    views
    allTables.foreach { t =>
      val a = v2(t)
      val b = spark.table(t)
      assert(a.columns.toSeq == b.columns.toSeq, s"$t columns")
      assert(a.schema.map(f => (f.name, f.dataType)) ==
        b.schema.map(f => (f.name, f.dataType)), s"$t types")
      val as = a.collect().map(_.toString).sorted.toSeq
      val bs = b.collect().map(_.toString).sorted.toSeq
      assert(as == bs, s"$t rows differ")
    }
  }

  test("path = qual prunes input partitions at planning time (A2)") {
    val all = v2("terraform_resource")
    val one = all.filter(col("path") === s"$dir/main.tf")
    assert(all.rdd.getNumPartitions > 1, "fixture corpus spans several files")
    assert(one.rdd.getNumPartitions == 1,
      "pushed path qual must prune the file list before any file is opened")
    assert(one.count() > 0)
    // a non-matching path is an empty result, not an error
    assert(all.filter(col("path") === "/no/such.tf").count() == 0)
  }

  test("column pruning reaches the reader") {
    val df = v2("terraform_variable").select("name", "sensitive")
    val leaf = df.queryExecution.executedPlan.collectLeaves().head
    assert(leaf.output.map(_.name) == Seq("name", "sensitive"),
      s"scan must project only required columns, got ${leaf.output.map(_.name)}")
    assert(df.collect().nonEmpty)
  }

  test("positional load paths are configuration sources (single and multi)") {
    val one = spark.read.format("terraform").load(s"$dir/*.tf")
    assert(one.count() > 0)
    // multi-path load() arrives as a JSON array option
    val dir2 = java.nio.file.Files.createTempDirectory("dsv2-multi").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir2, "extra.tf"),
      "resource \"aws_sqs_queue\" \"q\" {}\n")
    val multi = spark.read.format("terraform").load(s"$dir/*.tf", s"$dir2/*.tf")
    assert(multi.count() == one.count() + 1)
    assert(multi.filter(col("type") === "aws_sqs_queue").count() == 1)
  }

  test("unknown table name fails fast") {
    val e = intercept[IllegalArgumentException](
      spark.read.format("terraform").option("table", "terraform_nope").load())
    assert(e.getMessage.contains("terraform_nope"))
  }
}
