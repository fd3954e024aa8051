package graft.tf

import graft.SparkSpecBase

/** The reference's `sql+sqlite` doc examples run VERBATIM through
  * SqliteDialect — the sqlite half of the "switch without rewriting your
  * queries" check (the Postgres half is PgDialectSpec). Corpus: every
  * sqlite block under docs/tables/ except terraform_module.md's second,
  * which is literally an error message in the reference docs ("Error:
  * SQLite does not support split_part…"). */
class SqliteDialectSpec extends SparkSpecBase {

  private lazy val fx: Unit = {
    val dir = new java.io.File("fixtures").getAbsolutePath
    Terraform.register(spark, Terraform.Paths(
      configurationFilePaths = Seq(s"$dir/*.tf"),
      planFilePaths = Seq(s"$dir/tfplan.json"),
      stateFilePaths = Seq(s"$dir/terraform.tfstate")))
    ()
  }

  private def lite(q: String) = { fx; SqliteDialect.sql(spark, q) }

  test("rewrite unit: boolean-int compare and truthiness wrap") {
    assert(SqliteDialect.rewrite("select x from t where sensitive = 1") ==
      "select x from t where sensitive = true")
    assert(SqliteDialect.rewrite("where sensitive = 0") == "where sensitive = false")
    // value positions untouched
    assert(SqliteDialect.rewrite("select sensitive = 1 as s from t")
      .contains("sensitive = true")) // select-list compare still maps
    assert(SqliteDialect.rewrite("select insensitive = 1 from t") ==
      "select insensitive = 1 from t") // word-bounded
    // predicate-position json_extract wraps; value positions don't
    assert(SqliteDialect.rewrite("where a = 1 and json_extract(x, '$.b')") ==
      "where a = 1 and sqlite_truthy(json_extract(x, '$.b'))")
    assert(SqliteDialect.rewrite("where not json_extract(x, '$.b')") ==
      "where not sqlite_truthy(json_extract(x, '$.b'))")
    assert(SqliteDialect.rewrite(
      "where (json_extract(x, '$.b') is null or json_extract(x, '$.b'))") ==
      "where (json_extract(x, '$.b') is null or sqlite_truthy(json_extract(x, '$.b')))")
    assert(SqliteDialect.rewrite("select json_extract(x, '$.b') as b from t") ==
      "select json_extract(x, '$.b') as b from t")
    // idempotent
    val once = SqliteDialect.rewrite("where json_extract(x, '$.b')")
    assert(SqliteDialect.rewrite(once) == once)
  }

  test("rewrite unit: qualified and literal-first boolean-int compares") {
    // qualified column: alias prefix is not a word-boundary violation
    assert(SqliteDialect.rewrite("select x from t where t.sensitive = 1") ==
      "select x from t where t.sensitive = true")
    assert(SqliteDialect.rewrite("where tv.sensitive = 0") ==
      "where tv.sensitive = false")
    // literal-first form
    assert(SqliteDialect.rewrite("where 1 = sensitive") == "where true = sensitive")
    assert(SqliteDialect.rewrite("where 0 = t.sensitive") == "where false = t.sensitive")
    // both forms in one predicate
    assert(SqliteDialect.rewrite("where sensitive = 1 and 1 = v.sensitive") ==
      "where sensitive = true and true = v.sensitive")
    // guards: non-equality operators and non-0/1 literals untouched
    assert(SqliteDialect.rewrite("where sensitive != 1") == "where sensitive != 1")
    assert(SqliteDialect.rewrite("where sensitive <= 1") == "where sensitive <= 1")
    assert(SqliteDialect.rewrite("where 10 = sensitive") == "where 10 = sensitive")
    assert(SqliteDialect.rewrite("where 1.0 = sensitive") == "where 1.0 = sensitive")
    assert(SqliteDialect.rewrite("where x1 = sensitive") == "where x1 = sensitive")
    // string literals never rewritten
    assert(SqliteDialect.rewrite("where name = 'sensitive = 1'") ==
      "where name = 'sensitive = 1'")
    // arithmetic context: the 1/0 is an operand, not a boolean literal
    assert(SqliteDialect.rewrite("where n + 1 = sensitive") ==
      "where n + 1 = sensitive")
    assert(SqliteDialect.rewrite("where sensitive = 1 + n") ==
      "where sensitive = 1 + n")
    assert(SqliteDialect.rewrite("where x - 1 = t.sensitive") ==
      "where x - 1 = t.sensitive")
  }

  // ---- terraform_resource.md sqlite examples (10)
  test("resource: basic + iam_role filter + json_extract statement") {
    assert(lite("select name, type, address, attributes_std, path from terraform_resource;").count() == 9)
    assert(lite(
      """select name, type, address, attributes_std, path
        |from terraform_resource where type = 'aws_iam_role';""".stripMargin).count() == 0)
    val df = lite(
      """select path, name, address,
        |  json_extract(attributes_std, '$.assume_role_policy.Statement') as statement
        |from terraform_resource where type = 'aws_iam_role'""".stripMargin)
    assert(df.count() == 0) // shape must analyze (fixtures carry no iam_role)
  }

  test("resource: json_extract ami projection") {
    val rows = lite(
      """select address, name, json_extract(attributes_std, '$.ami') as ami, path
        |from terraform_resource where type = 'aws_instance';""".stripMargin).collect()
    assert(rows.length == 6)
    assert(rows.flatMap(r => Option(r.getString(2))).forall(_ == "ami-830c94e3"))
  }

  test("resource: cloudtrail kms_key_id is null") {
    val rows = lite(
      """select address, name, path from terraform_resource
        |where type = 'aws_cloudtrail'
        |  and json_extract(attributes_std, '$.kms_key_id') is null;""".stripMargin).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("trail"))
  }

  test("resource: azurerm truthiness predicates (storage/mysql/mssql)") {
    // no azurerm resources in fixtures — these pin that sqlite's dynamic
    // predicates analyze and run (truthiness shim), returning 0 rows
    assert(lite(
      """select address, name,
        |  case
        |    when json_extract(attributes_std, '$.allow_blob_public_access') is null then 0
        |    else json_extract(attributes_std, '$.allow_blob_public_access')
        |  end as allow_blob_public_access,
        |  path
        |from terraform_resource
        |where type = 'azurerm_storage_account'
        |  and json_extract(attributes_std, '$.allow_blob_public_access');""".stripMargin).count() == 0)
    assert(lite(
      """select address, name,
        |  json_extract(attributes_std, '$.ssl_enforcement_enabled') as ssl_enforcement_enabled,
        |  path
        |from terraform_resource
        |where type = 'azurerm_mysql_server'
        |  and not json_extract(attributes_std, '$.ssl_enforcement_enabled');""".stripMargin).count() == 0)
    assert(lite(
      """select address, name,
        |  case
        |    when json_extract(attributes_std, '$.public_network_access_enabled') is null then 1
        |    else json_extract(attributes_std, '$.public_network_access_enabled')
        |  end as public_network_access_enabled,
        |  path
        |from terraform_resource
        |where type in ('azurerm_mssql_server', 'azurerm_mysql_server')
        |  and (json_extract(attributes_std, '$.public_network_access_enabled') is null or json_extract(attributes_std, '$.public_network_access_enabled'));""".stripMargin).count() == 0)
  }

  test("resource: plan/state path quals") {
    val dir = new java.io.File("fixtures").getAbsolutePath
    assert(lite(
      s"select name, type, address, attributes_std, path from terraform_resource where path = '$dir/tfplan.json';").count() == 3)
    assert(lite(
      s"select name, type, address, attributes_std, path from terraform_resource where path = '$dir/terraform.tfstate';").count() == 3)
  }

  // ---- terraform_data_source.md sqlite examples (3)
  test("data source: basic + type filter + json_each filter expansion") {
    assert(lite("select name, type, arguments, path from terraform_data_source;").count() == 2)
    assert(lite(
      "select name, type, arguments, path from terraform_data_source where type = 'aws_ami';").count() == 2)
    val rows = lite(
      """with filters as (
        |select
        |  name,
        |  type,
        |  json_each(arguments, '$.filter') as filter,
        |  path
        |from
        |  terraform_data_source
        |where
        |  type = 'aws_ami'
        |)
        |select
        |  name,
        |  type,
        |  json_extract(filter.value, '$.name') as name,
        |  json_extract(filter.value, '$.values') as values,
        |  path
        |from
        |  filters;""".stripMargin).collect()
    assert(rows.length == 3) // ubuntu×1 + amzn×2, same as the Postgres twin
    assert(rows.exists(r => r.getString(2) == "architecture" && r.getString(3) == """["x86_64"]"""))
  }

  // ---- terraform_local.md sqlite examples (2)
  test("data source: json_each full virtual-table schema (key/type/atom/fullkey)") {
    // sqlite's json_each exposes key,value,type,atom,id,fullkey,path — a
    // user porting sqlite SQL that reads more than .value must see them
    val rows = lite(
      """with f as (
        |  select name, json_each(arguments, '$.filter') as e
        |  from terraform_data_source where type = 'aws_ami')
        |select name, e.key as k, e.type as t, e.atom as a, e.fullkey as fk, e.path as p
        |from f order by name, k;""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2) == "object") // each filter element is a block object
      assert(r.isNullAt(3)) // atom NULL for containers
      assert(r.getString(5) == "$.filter")
    }
    // array iteration: key = index, fullkey = path[index]
    val amzn = rows.filter(_.getString(0).contains("amzn"))
    assert(amzn.map(_.getString(1)).toSeq == Seq("0", "1"))
    assert(amzn.map(_.getString(4)).toSeq == Seq("$.filter[0]", "$.filter[1]"))
    // single-block leniency: one object row, key/fullkey fall back to the path
    val ubuntu = rows.filter(_.getString(0).contains("ubuntu"))
    assert(ubuntu.length == 1 && ubuntu.head.isNullAt(1) && ubuntu.head.getString(4) == "$.filter")
    // scalar elements: type/atom reflect the value
    val scal = lite(
      "select e.key as k, e.value as v, e.type as t, e.atom as a " +
        "from (select json_each('[\"x\", 3, 1.5, true, null]', '$') as e) order by k;").collect()
    assert(scal.map(r => (r.getString(2), r.getString(3))).toSeq ==
      Seq(("text", "x"), ("integer", "3"), ("real", "1.5"), ("true", "true"), ("null", "null")))
    assert(scal.map(_.getString(1)).toSeq == Seq("\"x\"", "3", "1.5", "true", "null"))
  }

  test("local: basic + like") {
    assert(lite("select name, value, path from terraform_local;").count() == 3)
    val rows = lite(
      "select name, value, path from terraform_local where name like 'owner';").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("owner", "\"team-a\"")))
  }

  // ---- terraform_module.md sqlite example (1 runnable)
  test("module: basic") {
    assert(lite("select name, module_source, version from terraform_module;").count() == 3)
  }

  // ---- terraform_output.md sqlite examples (3)
  test("output: basic + sensitive = 1 + value like") {
    assert(lite("select name, description, value, path from terraform_output;").count() == 4)
    val sens = lite(
      "select name, description, path from terraform_output where sensitive = 1;").collect()
    assert(sens.map(_.getString(0)).sorted.toSeq == Seq("instance_ip", "instance_ip"))
    assert(lite(
      """select name, description, value, path from terraform_output
        |where value like '%aws_s3_bucket.%.arn%';""".stripMargin).count() == 1)
  }

  // ---- terraform_provider.md sqlite examples (3)
  test("provider: basic + version not null + json_extract region") {
    assert(lite("select name, alias, arguments, path from terraform_provider;").count() == 2)
    val ver = lite(
      "select name, alias, version, path from terraform_provider where version is not null;").collect()
    assert(ver.map(_.getString(1)).toSeq == Seq("west"))
    val reg = lite(
      """select name, alias, json_extract(arguments, '$.region') as region, path
        |from terraform_provider where name = 'aws';""".stripMargin).collect()
    assert(reg.map(_.getString(2)).sorted.toSeq == Seq("us-east-1", "us-west-2"))
  }

  // ---- terraform_variable.md sqlite examples (3)
  test("variable: basic + validation + sensitive = 1") {
    assert(lite(
      "select name, description, type, default_value, path from terraform_variable;").count() == 1)
    val v = lite(
      "select name, validation, type from terraform_variable where validation is not null;").collect()
    assert(v.length == 1 && v.head.getString(1).contains("can(regex"))
    val sens = lite(
      "select name, description, sensitive from terraform_variable where sensitive = 1;").collect()
    assert(sens.map(_.getString(0)).toSeq == Seq("instance_type"))
  }
}
