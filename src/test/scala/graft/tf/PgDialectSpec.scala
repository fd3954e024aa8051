package graft.tf

import graft.SparkSpecBase

/** The reference's documented queries run VERBATIM (Postgres dialect)
  * through PgDialect — the "switch without rewriting your queries" check. */
class PgDialectSpec extends SparkSpecBase {

  private lazy val fx: Unit = {
    val dir = new java.io.File("fixtures").getAbsolutePath
    Terraform.register(spark, Terraform.Paths(
      configurationFilePaths = Seq(s"$dir/*.tf"),
      planFilePaths = Seq(s"$dir/tfplan.json"),
      stateFilePaths = Seq(s"$dir/terraform.tfstate")))
    ()
  }

  private def pg(q: String) = { fx; PgDialect.sql(spark, q) }

  test("rewrite unit: operators") {
    assert(PgDialect.rewrite("a -> 'k'") == "json_get(a, 'k')")
    assert(PgDialect.rewrite("a ->> 'k'") == "json_get_str(a, 'k')")
    assert(PgDialect.rewrite("(a ->> 'k')::jsonb -> 'S'") ==
      "json_get((json_get_str(a, 'k')), 'S')")
    assert(PgDialect.rewrite("x::boolean") == "CAST(x AS BOOLEAN)")
    assert(PgDialect.rewrite("value::text like '%x%'") == "value like '%x%'")
    assert(PgDialect.rewrite("not m ~ '^[0-9]'") == "not m rlike  '^[0-9]'")
    assert(PgDialect.rewrite("'lit->net'") == "'lit->net'") // strings untouched
    assert(PgDialect.rewrite("jsonb_array_elements(a -> 'f') as x") ==
      "explode(json_array_elements(json_get(a, 'f'))) as x")
  }

  test("rewrite unit: parens inside string literals never break splicing") {
    // a ')' inside a json-path literal must not close the call early
    assert(PgDialect.rewrite("select json_each(x, '$.a)b') as f from t") ==
      "select explode(json_each_values(x, '$.a)b')) as f from t")
    assert(PgDialect.rewrite("jsonb_array_elements(f(x, 'a)b')) as e") ==
      "explode(json_array_elements(f(x, 'a)b'))) as e")
    // cast operand back-scan: ')' in a literal must not unbalance the group
    assert(PgDialect.rewrite("x + (a || ')')::boolean") ==
      "x + CAST((a || ')') AS BOOLEAN)")
    // arrow operand back-scan: '(' in a literal must not end the group early
    assert(PgDialect.rewrite("(a || '(') ->> 'k'") ==
      "json_get_str((a || '('), 'k')")
  }

  test("rewrite unit: regex-match token boundaries and trailing arrow") {
    // !~ must become NOT rlike, not a mangled ' rlike' with a stray '!'
    assert(PgDialect.rewrite("m !~ '^[0-9]'") == "m NOT rlike  '^[0-9]'")
    // ~* / !~* case-insensitive variants fold (?i) into the pattern
    assert(PgDialect.rewrite("m ~* 'x'") == "m  rlike '(?i)x'")
    assert(PgDialect.rewrite("m !~* 'x'") == "m  NOT rlike '(?i)x'")
    // non-literal pattern: pass through untouched
    assert(PgDialect.rewrite("m ~* other_col") == "m ~* other_col")
    // an arrow at the very end of the text must not throw
    assert(PgDialect.rewrite("a ->") == "json_get(a, )")
  }

  test("verbatim: iam_role statement extraction shape") {
    val df = pg(
      """select path, name, address,
        |  (attributes_std ->> 'assume_role_policy')::jsonb -> 'Statement' as statement
        |from terraform_resource where type = 'aws_iam_role'""".stripMargin)
    assert(df.count() == 0) // no iam_role in fixtures; shape must analyze
  }

  test("verbatim: instance ami projection") {
    val rows = pg(
      """select address, name, attributes_std ->> 'ami' as ami, path
        |from terraform_resource where type = 'aws_instance'""".stripMargin).collect()
    assert(rows.length == 6)
    assert(rows.flatMap(r => Option(r.getString(2))).forall(_ == "ami-830c94e3"))
  }

  test("verbatim: cloudtrail kms_key_id is null") {
    val rows = pg(
      """select address, name, path from terraform_resource
        |where type = 'aws_cloudtrail' and attributes_std -> 'kms_key_id' is null""".stripMargin).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("trail"))
  }

  test("verbatim: not (...)::boolean filter") {
    val rows = pg(
      """select address, name from terraform_resource
        |where type = 'aws_s3_bucket' and not (attributes_std -> 'force_destroy')::boolean""".stripMargin).collect()
    assert(rows.nonEmpty)
  }

  test("verbatim: data source lateral filter CTE") {
    val rows = pg(
      """with filters as (
        |select name, type, jsonb_array_elements(arguments -> 'filter') as filter, path
        |from terraform_data_source where type = 'aws_ami'
        |)
        |select name, type, filter -> 'name' as fname, filter -> 'values' as fvalues, path
        |from filters""".stripMargin).collect()
    assert(rows.length == 3)
  }

  test("verbatim: local ilike + output sensitive + output value::text like") {
    assert(pg("select name, value, path from terraform_local where name ilike 'owner'").count() == 1)
    assert(pg("select name, description, path from terraform_output where sensitive").count() == 2)
    assert(pg(
      "select name from terraform_output where value::text like '%aws_s3_bucket.%.arn%'").count() == 1)
  }

  test("verbatim: module version regex ~") {
    val rows = pg(
      """select name, split_part(module_source,'=',-1) as ref from terraform_module
        |where module_source like '%gitlab.com%'
        |  and not split_part(module_source,'=',-1) ~ '^[0-9]'""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("s3_bucket"))
  }

  test("verbatim: provider ->> region + variable docs") {
    assert(pg(
      """select name, alias, arguments ->> 'region' as region, path
        |from terraform_provider where name = 'aws'""".stripMargin).count() == 2)
    assert(pg("select name, validation, type from terraform_variable where validation is not null").count() == 1)
    assert(pg("select name, description, sensitive from terraform_variable where sensitive").count() == 1)
  }

  test("chained arrows nest leftmost-first (the canonical PG JSON idiom)") {
    assert(PgDialect.rewrite("x -> 'a' ->> 'b'") ==
      "json_get_str(json_get(x, 'a'), 'b')")
    assert(PgDialect.rewrite("x -> 'a' -> 'b' ->> 'c'") ==
      "json_get_str(json_get(json_get(x, 'a'), 'b'), 'c')")
    // end-to-end over fixtures: two-level access through the tags map
    val rows = pg(
      "select name from terraform_resource where arguments -> 'tags' ->> 'Name' is not null")
      .collect().map(_.getString(0))
    assert(rows.contains("app_server"))
  }

  test("function-call operands absorb their name; casts keep parameters") {
    assert(PgDialect.rewrite("lower(x) -> 'k'") == "json_get(lower(x), 'k')")
    assert(PgDialect.rewrite("json_get(x, 'k')::boolean") ==
      "CAST(json_get(x, 'k') AS BOOLEAN)")
    assert(PgDialect.rewrite("x::varchar(255)") == "x")
    assert(PgDialect.rewrite("x::numeric(10,2)") == "CAST(x AS DECIMAL(10,2))")
    // keyword before a paren group (whitespace-separated) is NOT absorbed
    assert(PgDialect.rewrite("where (x)::boolean") == "where CAST((x) AS BOOLEAN)")
  }

  test("block comments, escaped keys, negative indices, unary tilde") {
    // an apostrophe inside a block comment must not flip quote state
    assert(PgDialect.rewrite("/* don't */ select x -> 'k' from t") ==
      "/* don't */ select json_get(x, 'k') from t")
    // '' doubling inside a key; negative array index
    assert(PgDialect.rewrite("x -> 'it''s'") == "json_get(x, 'it''s')")
    assert(PgDialect.rewrite("x -> -1") == "json_get(x, -1)")
    // unary bitwise NOT has no left operand — passes through untouched,
    // including straight after a comment (comments are not operands)
    assert(PgDialect.rewrite("select ~flags from t") == "select ~flags from t")
    assert(PgDialect.rewrite("select /* note */ ~flags from t") ==
      "select /* note */ ~flags from t")
    // binary regex match still rewrites, incl. literal-first spelling
    assert(PgDialect.rewrite("a ~ 'p'") == "a rlike  'p'")
    assert(PgDialect.rewrite("'p' ~ a") == "'p' rlike  a")
  }

  test("negative array index counts from the end, like Postgres") {
    // '[1,2,3]'::jsonb -> -1 is 3 in Postgres; ->> -1 returns text
    val r = pg("select '[10,20,30]'::jsonb -> -1 as a, '[10,20,30]'::jsonb ->> -3 as b, " +
      "'[10,20,30]'::jsonb -> -4 as c").collect().head
    assert(r.getString(0) == "30" && r.getString(1) == "10" && r.isNullAt(2))
  }
}
