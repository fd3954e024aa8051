package graft.tf

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Span elision (SURVEY §4): projections that prune every span column run
  * the spanless parse; span consumers keep the full one, byte-identical. */
class SpanElisionSpec extends SparkSpecBase {

  private val dir = new java.io.File("fixtures").getAbsolutePath
  private def paths = Terraform.Paths(
    configurationFilePaths = Seq(s"$dir/*.tf"),
    planFilePaths = Seq(s"$dir/tfplan.json", s"$dir/tfplan_oneline.json"),
    stateFilePaths = Seq(s"$dir/terraform.tfstate"))

  // uncached rows: the elision rule targets the live parse plan (a cached
  // Dataset has already materialized every column)
  private def resource = Terraform.resource(Terraform.rows(spark, paths))

  test("spanless projection swaps in the nospan parse") {
    val pruned = resource.select("name", "type")
    val p = pruned.queryExecution.optimizedPlan.toString
    assert(p.contains(SpanElision.ParseNoSpanName), s"elision did not fire:\n$p")

    val spanful = resource.select("name", "type", "start_line", "source")
    val q = spanful.queryExecution.optimizedPlan.toString
    assert(!q.contains(SpanElision.ParseNoSpanName),
      s"elision fired under a span consumer:\n$q")
  }

  test("elided plan returns identical non-span values; spans stay real when selected") {
    val spanful = resource.select("name", "type", "start_line")
    val pruned = resource.select("name", "type")
    assert(pruned.collect().map(_.toString).sorted.toSeq ==
      spanful.drop("start_line").collect().map(_.toString).sorted.toSeq)
    assert(spanful.filter(col("start_line").isNotNull).count() > 0)
  }

  test("validation is span-derived: selecting it keeps the full parse") {
    // validation is regex-extracted from the block SOURCE — a query that
    // selects validation (but no explicit span column) must NOT elide
    val variable = Terraform.variable(Terraform.rows(spark, paths))
    val q = variable.select("name", "validation")
    val p = q.queryExecution.optimizedPlan.toString
    assert(!p.contains(SpanElision.ParseNoSpanName),
      s"elision fired under a validation consumer:\n$p")
    assert(q.filter(col("validation").isNotNull).count() > 0,
      "fixture variable's validation block must survive")
  }

  test("whole-row consumers (typed Dataset ops) never see elided spans") {
    // a typed map consumes the full TfRow struct — the rule must not fire
    import spark.implicits._
    val ds = Terraform.rows(spark, paths)
    val spans = ds.map(r => r.startLine.getOrElse(-1L)).collect()
    assert(spans.exists(_ > 0), "typed access must still see real spans")
  }

  test("DSv2 reader elides spans under column pruning but keeps them when selected") {
    def v2 = spark.read.format("terraform")
      .option("table", "terraform_resource")
      .option("configurationFilePaths", s"$dir/*.tf").load()
    assert(v2.select("name").collect().nonEmpty)
    assert(v2.select("name", "start_line")
      .filter(col("start_line").isNotNull).count() > 0)
  }
}
