package graft.tf

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame

/** Acceptance tests: every documented example query from the reference
  * (docs/index.md + docs/tables/ — the de-facto correctness corpus,
  * SURVEY §5) translated to the Spark surface and run over fixtures/.
  *
  * Translation table (Postgres → Spark SQL):
  *   x -> 'k'            → json_get(x, 'k')
  *   x ->> 'k'           → json_get_str(x, 'k')
  *   (x)::jsonb          → x                  (columns already carry JSON text)
  *   (x)::boolean        → CAST(x AS BOOLEAN)
  *   x::text             → x
  *   ~                   → rlike
  *   jsonb_array_elements→ explode(json_array_elements(...))
  *   jsonb_pretty        → jsonb_pretty       (shim)
  *   ilike / split_part  → native
  */
class DocQueriesSpec extends SparkSpecBase {

  private lazy val fx: Unit = {
    val dir = new java.io.File("fixtures").getAbsolutePath
    Terraform.register(spark, Terraform.Paths(
      configurationFilePaths = Seq(s"$dir/*.tf"),
      planFilePaths = Seq(s"$dir/tfplan.json"),
      stateFilePaths = Seq(s"$dir/terraform.tfstate")))
    ()
  }

  private def sql(q: String): DataFrame = { fx; spark.sql(q) }

  // ---- docs/index.md:62-69
  test("index: jsonb_pretty over resource arguments") {
    val rows = sql("select name, type, jsonb_pretty(arguments) as args from terraform_resource").collect()
    assert(rows.length == 9) // 3 config + 3 plan + 3 state
    val app = rows.find(r => r.getString(0) == "app_server" && r.getString(2) != null
      && r.getString(2).contains("ami")).get
    // byte-for-byte the docs/index.md example shape: jsonb key order
    // (length, then lex) → ami, tags, instance_type
    assert(app.getString(2) ==
      """{
        |    "ami": "ami-830c94e3",
        |    "tags": {
        |        "Name": "ExampleAppServerInstance"
        |    },
        |    "instance_type": "${var.instance_type}"
        |}""".stripMargin)
  }

  // ---- terraform_resource.md (8 examples)
  test("resource: basic + type filter + plan/state path quals") {
    assert(sql("select name, type, address, attributes_std, path from terraform_resource").count() == 9)
    assert(sql("select name from terraform_resource where type = 'aws_iam_role'").count() == 0)
    assert(sql("select name from terraform_resource where type = 'aws_instance'").count() == 6)
    val dir = new java.io.File("fixtures").getAbsolutePath
    assert(sql(s"select name, type, address, attributes_std, path from terraform_resource where path = '$dir/tfplan.json'").count() == 3)
    assert(sql(s"select name from terraform_resource where path = '$dir/terraform.tfstate'").count() == 3)
  }

  test("resource: ->> projection (ami)") {
    val rows = sql(
      """select address, name, json_get_str(attributes_std, 'ami') as ami, path
        |from terraform_resource where type = 'aws_instance'""".stripMargin).collect()
    assert(rows.forall(r => r.getString(2) == "ami-830c94e3" || r.getString(2) == null))
    assert(rows.count(_.getString(2) != null) >= 4) // config app_server/worker + plan + state
  }

  test("resource: -> is null (kms_key_id missing)") {
    val rows = sql(
      """select address, name, path from terraform_resource
        |where type = 'aws_cloudtrail' and json_get(attributes_std, 'kms_key_id') is null""".stripMargin).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("trail"))
  }

  test("resource: ::boolean cast + case-when defaulting") {
    // azurerm examples exercise the cast machinery; fixture uses force_destroy
    val rows = sql(
      """select address, name,
        |  case when json_get(attributes_std, 'force_destroy') is null then false
        |       else CAST(json_get(attributes_std, 'force_destroy') AS BOOLEAN) end as fd
        |from terraform_resource where type = 'aws_s3_bucket'""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(!_.getBoolean(2)))
    // IN-list + NOT boolean combination (azurerm_mssql/mysql pattern)
    assert(sql(
      """select name from terraform_resource
        |where type in ('aws_instance', 'aws_s3_bucket')
        |  and not coalesce(CAST(json_get(attributes_std, 'force_destroy') AS BOOLEAN), false)""".stripMargin)
      .count() == 8) // 6 aws_instance + 2 aws_s3_bucket (plan + state)
  }

  // ---- terraform_data_source.md (3 examples)
  test("data source: basic + type filter + lateral filter expansion") {
    assert(sql("select name, type, arguments, path from terraform_data_source").count() == 2)
    assert(sql("select name from terraform_data_source where type = 'aws_ami'").count() == 2)
    val rows = sql(
      """with filters as (
        |  select name, type, explode(json_array_elements(json_get(arguments, 'filter'))) as filter, path
        |  from terraform_data_source where type = 'aws_ami')
        |select name, type, json_get(filter, 'name') as fname, json_get(filter, 'values') as fvalues, path
        |from filters""".stripMargin).collect()
    assert(rows.length == 3) // ubuntu×1 + amzn×2
    assert(rows.exists(r => r.getString(2) == "\"architecture\"" && r.getString(3) == """["x86_64"]"""))
  }

  // ---- terraform_local.md (2 examples)
  test("local: basic + ilike") {
    assert(sql("select name, value, path from terraform_local").count() == 3)
    val rows = sql("select name, value, path from terraform_local where name ilike 'owner'").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("owner", "\"team-a\"")))
  }

  // ---- terraform_module.md (2 examples)
  test("module: basic + split_part/regex version pinning") {
    assert(sql("select name, module_source, version from terraform_module").count() == 3)
    val rows = sql(
      """select name, split_part(module_source, '=', -1) as ref from terraform_module
        |where module_source like '%gitlab.com%'
        |  and not split_part(module_source, '=', -1) rlike '^[0-9]'""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("s3_bucket", "v1.2.0")))
  }

  // ---- terraform_output.md (3 examples)
  test("output: basic + sensitive + value LIKE") {
    assert(sql("select name, description, value, path from terraform_output").count() == 4)
    val sens = sql("select name from terraform_output where sensitive").collect()
    assert(sens.map(_.getString(0)).sorted.toSeq == Seq("instance_ip", "instance_ip"))
    val arn = sql(
      "select name from terraform_output where value like '%aws_s3_bucket.%.arn%'").collect()
    assert(arn.map(_.getString(0)).toSeq == Seq("bucket_arn"))
  }

  // ---- terraform_provider.md (3 examples)
  test("provider: basic + version not null + ->> region") {
    assert(sql("select name, alias, arguments, path from terraform_provider").count() == 2)
    val ver = sql("select name, alias, version, path from terraform_provider where version is not null").collect()
    assert(ver.map(_.getString(1)).toSeq == Seq("west"))
    val reg = sql(
      """select name, alias, json_get_str(arguments, 'region') as region, path
        |from terraform_provider where name = 'aws'""".stripMargin).collect()
    assert(reg.map(_.getString(2)).sorted.toSeq == Seq("us-east-1", "us-west-2"))
  }

  // ---- terraform_variable.md (3 examples)
  test("variable: basic + validation + sensitive") {
    assert(sql("select name, description, type, default_value, path from terraform_variable").count() == 1)
    val v = sql("select name, validation, type from terraform_variable where validation is not null").collect()
    assert(v.length == 1 && v.head.getString(1).contains("can(regex"))
    // documented divergence: the reference's variable.sensitive is always
    // NULL (un-assigned, table_terraform_variable.go:226-233); we fix it
    val sens = sql("select name, description, sensitive from terraform_variable where sensitive").collect()
    assert(sens.map(_.getString(0)).toSeq == Seq("instance_type"))
  }

  // ---- terraform.spc:23-25: a no-argument registration defaults to CWD
  test("default path: no-argument register finds CWD files like the shipped spc") {
    val cwd = java.nio.file.Paths.get("").toAbsolutePath
    val dst = cwd.resolve("zz_doc_default.tf")
    java.nio.file.Files.copy(java.nio.file.Paths.get("fixtures", "main.tf"), dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    try {
      Terraform.register(spark, Terraform.Paths())
      val rows = spark.sql(
        s"select name, type from terraform_resource where path = '$dst'").collect()
      assert(rows.map(_.getString(0)).sorted.toSeq == Seq("app_server", "trail", "worker"),
        "the documented default '*.tf' must resolve relative to CWD")
    } finally {
      java.nio.file.Files.deleteIfExists(dst)
      // restore the fixtures registration the rest of the suite memoized
      val dir = new java.io.File("fixtures").getAbsolutePath
      Terraform.register(spark, Terraform.Paths(
        configurationFilePaths = Seq(s"$dir/*.tf"),
        planFilePaths = Seq(s"$dir/tfplan.json"),
        stateFilePaths = Seq(s"$dir/terraform.tfstate")))
    }
  }
}
