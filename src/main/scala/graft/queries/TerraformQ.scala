package graft.queries

import graft.tf.Terraform
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries over the seven Terraform tables, built from the
  * fixture corpus (fixtures/ — see FIXTURES.md). The oracle side is pinned
  * VALUES literals: fixture outputs are deterministic, and their semantics
  * are independently pinned against the reference by graft.tf.BuildersSpec,
  * so these act as a regression net wired into the driver's DuckDB compare.
  */
object TerraformQ {

  type Q = (SparkSession, String) => DataFrame

  private val fixDir: String = sys.env.get("GRAFT_FIXTURES").getOrElse {
    val rel = new java.io.File("fixtures")
    if (rel.exists()) rel.getAbsolutePath else "/root/repo/fixtures"
  }

  /** Ensure the fixture-backed views are this session's registration
    * (cached parse reused when they already are). Session tracking and
    * dead-session purging live in Terraform's own registrations map —
    * no second JVM-lifetime map here. */
  def ensure(spark: SparkSession): Unit = {
    Terraform.ensureRegistered(spark, Terraform.Paths(
      configurationFilePaths = Seq(s"$fixDir/*.tf"),
      planFilePaths = Seq(s"$fixDir/tfplan.json", s"$fixDir/tfplan_oneline.json"),
      stateFilePaths = Seq(s"$fixDir/terraform.tfstate")))
    ()
  }

  private def q(sql: String): Q = (spark, _) => { ensure(spark); spark.sql(sql) }

  val queries: Map[String, Q] = Map(
    "tf_resource_types" -> q(
      "SELECT type, count(*) AS n FROM terraform_resource GROUP BY type ORDER BY type"),

    // same aggregation through the DataSource V2 connector — pins that a
    // `spark.read.format("terraform")` user sees exactly the view rows
    "tf_dsv2_resource_types" -> ((spark, _) =>
      spark.read.format("terraform")
        .option("table", "terraform_resource")
        .option("configurationFilePaths", s"$fixDir/*.tf")
        .option("planFilePaths", s"$fixDir/tfplan.json,$fixDir/tfplan_oneline.json")
        .option("stateFilePaths", s"$fixDir/terraform.tfstate")
        .load()
        .groupBy("type").agg(count(lit(1)).as("n"))
        .orderBy("type")),

    // same aggregation resolved through the DSv2 TableCatalog — pins the
    // zero-registration "installed plugin" path (SELECT … FROM
    // terraform.terraform_resource with only session conf set) in the
    // driver's DuckDB gate
    "tf_catalog_resource_types" -> ((spark, _) => {
      // Spark caches a DSv2 catalog instance at first resolution; a later
      // conf change would be silently ignored. Fail fast on a conflicting
      // pre-existing value rather than read a stale file set.
      def setOnce(key: String, value: String): Unit =
        spark.conf.getOption(key) match {
          case Some(existing) if existing != value =>
            throw new IllegalStateException(
              s"$key already set to '$existing' (catalog may be cached with it); expected '$value'")
          case _ => spark.conf.set(key, value)
        }
      setOnce("spark.sql.catalog.terraform", "graft.sources.TerraformCatalog")
      setOnce("spark.sql.catalog.terraform.configurationFilePaths", s"$fixDir/*.tf")
      setOnce("spark.sql.catalog.terraform.planFilePaths",
        s"$fixDir/tfplan.json,$fixDir/tfplan_oneline.json")
      setOnce("spark.sql.catalog.terraform.stateFilePaths", s"$fixDir/terraform.tfstate")
      spark.sql("SELECT type, count(*) AS n FROM terraform.terraform_resource " +
        "GROUP BY type ORDER BY type")
    }),

    "tf_resource_meta" -> q(
      """SELECT name, address, count, count_src, provider
        |FROM terraform_resource WHERE path LIKE '%main.tf' ORDER BY name""".stripMargin),

    "tf_variable_all" -> q(
      """SELECT name, type, default_value, description, sensitive,
        |       validation IS NOT NULL AS has_validation
        |FROM terraform_variable ORDER BY name""".stripMargin),

    "tf_output_all" -> q(
      """SELECT substring_index(path, '/', -1) AS file, name, value, description,
        |       sensitive, depends_on
        |FROM terraform_output ORDER BY file, name""".stripMargin),

    "tf_provider_dup" -> q(
      """SELECT name, alias, version, arguments FROM terraform_provider
        |ORDER BY alias NULLS FIRST""".stripMargin),

    "tf_local_quirk" -> q(
      """SELECT name, value, start_line, end_line FROM terraform_local
        |ORDER BY name""".stripMargin),

    "tf_module_row" -> q(
      "SELECT name, module_source, version, arguments FROM terraform_module ORDER BY name"),

    "tf_data_filter" -> q(
      """SELECT name, json_get(arguments, 'filter') AS filter,
        |       json_get_str(arguments, 'most_recent') AS most_recent
        |FROM terraform_data_source ORDER BY name""".stripMargin),

    "tf_state_instances" -> q(
      """SELECT address, json_get_str(attributes, 'id') AS id
        |FROM terraform_resource WHERE path LIKE '%.tfstate' ORDER BY address""".stripMargin),

    "tf_pretty" -> q(
      """SELECT name, jsonb_pretty(arguments) AS args FROM terraform_resource
        |WHERE path LIKE '%main.tf' ORDER BY name""".stripMargin),

    "tf_plan_pushdown" -> q(
      s"""SELECT name, type, address FROM terraform_resource
         |WHERE path = '$fixDir/tfplan.json' ORDER BY address""".stripMargin)
  )

  val oracle: Map[String, String] = Map(
    "tf_resource_types" ->
      """SELECT * FROM (VALUES
        | ('aws_cloudtrail', CAST(1 AS BIGINT)),
        | ('aws_instance',   CAST(8 AS BIGINT)),
        | ('aws_s3_bucket',  CAST(3 AS BIGINT))) AS t(type, n) ORDER BY type""".stripMargin,

    "tf_dsv2_resource_types" ->
      """SELECT * FROM (VALUES
        | ('aws_cloudtrail', CAST(1 AS BIGINT)),
        | ('aws_instance',   CAST(8 AS BIGINT)),
        | ('aws_s3_bucket',  CAST(3 AS BIGINT))) AS t(type, n) ORDER BY type""".stripMargin,

    "tf_catalog_resource_types" ->
      """SELECT * FROM (VALUES
        | ('aws_cloudtrail', CAST(1 AS BIGINT)),
        | ('aws_instance',   CAST(8 AS BIGINT)),
        | ('aws_s3_bucket',  CAST(3 AS BIGINT))) AS t(type, n) ORDER BY type""".stripMargin,

    "tf_resource_meta" ->
      """SELECT * FROM (VALUES
        | ('app_server', 'aws_instance.app_server', CAST(2 AS BIGINT), '2', '${aws.west}'),
        | ('trail', 'aws_cloudtrail.trail', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        | ('worker', 'aws_instance.worker', CAST(NULL AS BIGINT), '"${var.replicas}"', CAST(NULL AS VARCHAR))
        |) AS t(name, address, count, count_src, provider) ORDER BY name""".stripMargin,

    "tf_variable_all" ->
      """SELECT * FROM (VALUES
        | ('instance_type', 'string', '"t2.micro"', 'EC2 instance type', true, true)
        |) AS t(name, type, default_value, description, sensitive, has_validation) ORDER BY name""".stripMargin,

    "tf_output_all" ->
      """SELECT * FROM (VALUES
        | ('main.tf', 'instance_ip', '"${aws_instance.app_server[0].public_ip}"', 'IP', true, '["${aws_instance.app_server}"]'),
        | ('second.tf', 'bucket_arn', '"${aws_s3_bucket.logs.arn}"', CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)),
        | ('terraform.tfstate', 'bucket_name', '"example-logs"', CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)),
        | ('terraform.tfstate', 'instance_ip', '"10.0.0.5"', CAST(NULL AS VARCHAR), true, CAST(NULL AS VARCHAR))
        |) AS t(file, name, value, description, sensitive, depends_on) ORDER BY file, name""".stripMargin,

    "tf_provider_dup" ->
      """SELECT * FROM (VALUES
        | ('aws', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '{"region":"us-east-1"}'),
        | ('aws', 'west', '~> 4.0', '{"region":"us-west-2"}')
        |) AS t(name, alias, version, arguments) ORDER BY alias NULLS FIRST""".stripMargin,

    "tf_local_quirk" ->
      """SELECT * FROM (VALUES
        | ('count_expr', '"${length(var.instance_type)}"', CAST(27 AS BIGINT), CAST(30 AS BIGINT)),
        | ('owner', '"team-a"', CAST(27 AS BIGINT), CAST(30 AS BIGINT)),
        | ('region', '"us-east-1"', CAST(27 AS BIGINT), CAST(30 AS BIGINT))
        |) AS t(name, value, start_line, end_line) ORDER BY name""".stripMargin,

    "tf_module_row" ->
      """SELECT * FROM (VALUES
        | ('net', 'git::https://gitlab.com/acme/net?ref=2abc', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        | ('s3_bucket', 'git::https://gitlab.com/acme/s3?ref=v1.2.0', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        | ('vpc', 'terraform-aws-modules/vpc/aws', '5.0.0', '{"cidr":"10.0.0.0/16"}')
        |) AS t(name, module_source, version, arguments) ORDER BY name""".stripMargin,

    "tf_data_filter" ->
      """SELECT * FROM (VALUES
        | ('amzn', '[{"name":"name","values":["amzn2-ami-hvm-*"]},{"name":"architecture","values":["x86_64"]}]', 'false'),
        | ('ubuntu', '{"name":"name","values":["ubuntu/images/*"]}', 'true')
        |) AS t(name, filter, most_recent) ORDER BY name""".stripMargin,

    "tf_state_instances" ->
      """SELECT * FROM (VALUES
        | ('aws_instance.app_server[0]', 'i-0abc'),
        | ('aws_instance.app_server[1]', 'i-0def'),
        | ('aws_s3_bucket.logs', 'example-logs')
        |) AS t(address, id) ORDER BY address""".stripMargin,

    "tf_pretty" ->
      ("""SELECT * FROM (VALUES
        | ('app_server', '{' || chr(10) ||
        |   '    "ami": "ami-830c94e3",' || chr(10) ||
        |   '    "tags": {' || chr(10) ||
        |   '        "Name": "ExampleAppServerInstance"' || chr(10) ||
        |   '    },' || chr(10) ||
        |   '    "instance_type": "$' || '{var.instance_type}"' || chr(10) ||
        |   '}'),
        | ('trail', CAST(NULL AS VARCHAR)),
        | ('worker', '{' || chr(10) || '    "ami": "ami-830c94e3"' || chr(10) || '}')
        |) AS t(name, args) ORDER BY name""").stripMargin,

    "tf_plan_pushdown" ->
      """SELECT * FROM (VALUES
        | ('app_server', 'aws_instance', 'aws_instance.app_server[0]'),
        | ('app_server', 'aws_instance', 'aws_instance.app_server[1]'),
        | ('logs', 'aws_s3_bucket', 'aws_s3_bucket.logs')
        |) AS t(name, type, address) ORDER BY address""".stripMargin
  )
}
