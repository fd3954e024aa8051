package graft.tf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Fixture-pinned semantics tests for the per-file row builders — every
  * branch from SURVEY §2A exercised against fixtures/. */
class BuildersSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)

  private lazy val configRows =
    Builders.rowsForFile("/fx/main.tf", FileKind.Config, read("fixtures/main.tf"))
  private lazy val planRows =
    Builders.rowsForFile("/fx/tfplan.json", FileKind.Plan, read("fixtures/tfplan.json"))
  private lazy val planRows1L =
    Builders.rowsForFile("/fx/tfplan_oneline.json", FileKind.Plan, read("fixtures/tfplan_oneline.json"))
  private lazy val stateRows =
    Builders.rowsForFile("/fx/terraform.tfstate", FileKind.State, read("fixtures/terraform.tfstate"))

  private def of(rows: Seq[TfRow], table: String) = rows.filter(_.table == table)

  // ------------------------------------------------------------ HCL config

  test("resource rows: meta-arg extraction (A10)") {
    val rs = of(configRows, "resource").sortBy(_.name)
    assert(rs.map(_.name) == Seq(Some("app_server"), Some("trail"), Some("worker")))

    val app = rs.head
    assert(app.tfType == Some("aws_instance"))
    assert(app.address == Some("aws_instance.app_server"))
    assert(app.count == Some(2L))
    assert(app.countSrc == Some("2"))
    assert(app.provider == Some("${aws.west}"))
    assert(app.dependsOn == Some("""["${aws_s3_bucket.b}"]"""))
    assert(app.lifecycle == Some("""{"create_before_destroy":true}"""))
    assert(app.arguments == Some(
      """{"ami":"ami-830c94e3","instance_type":"${var.instance_type}","tags":{"Name":"ExampleAppServerInstance"}}"""))
    assert(app.attributesStd == app.arguments)
    assert(app.attributes.isEmpty)
    assert(app.mode.isEmpty) // reference never assigns mode for config files
    assert(app.source.exists(_.startsWith("resource \"aws_instance\" \"app_server\"")))
    assert(app.startLine.exists(_ > 0) && app.endLine.exists(e => e > app.startLine.get))

    val worker = rs(2)
    assert(worker.count.isEmpty) // non-literal count → NULL
    assert(worker.countSrc == Some("\"${var.replicas}\""))

    val trail = rs(1)
    assert(trail.arguments.isEmpty) // NullIfEmptyMap
    assert(trail.address == Some("aws_cloudtrail.trail"))
  }

  test("data source row with nested repeated-able block (A7)") {
    val ds = of(configRows, "data_source")
    assert(ds.size == 1)
    val d = ds.head
    assert(d.tfType == Some("aws_ami") && d.name == Some("ubuntu"))
    assert(d.arguments == Some(
      """{"filter":{"name":"name","values":["ubuntu/images/*"]},"most_recent":true}"""))
  }

  test("locals: all rows report the FIRST locals block span (A13 quirk)") {
    val ls = of(configRows, "local").sortBy(_.name)
    assert(ls.map(_.name.get) == Seq("count_expr", "owner", "region"))
    assert(ls.map(_.value.get).sorted == Seq(
      "\"${length(var.instance_type)}\"", "\"team-a\"", "\"us-east-1\"").sorted)
    // quirk: 'region' lives in the second locals block but reports the first's span
    assert(ls.map(_.startLine).distinct.size == 1)
    assert(ls.map(_.source).distinct.size == 1)
    assert(ls.head.source.exists(_.contains("owner")))
  }

  test("module: source renamed, lifecycle dropped, residual args") {
    val ms = of(configRows, "module")
    assert(ms.size == 1)
    val m = ms.head
    assert(m.name == Some("vpc"))
    assert(m.moduleSource == Some("terraform-aws-modules/vpc/aws"))
    assert(m.version == Some("5.0.0"))
    assert(m.arguments == Some("""{"cidr":"10.0.0.0/16"}"""))
  }

  test("output: value canonicalization + sensitive + depends_on") {
    val os = of(configRows, "output")
    assert(os.size == 1)
    val o = os.head
    assert(o.name == Some("instance_ip"))
    assert(o.value == Some("\"${aws_instance.app_server[0].public_ip}\""))
    assert(o.description == Some("IP"))
    assert(o.sensitive == Some(true))
    assert(o.dependsOn == Some("""["${aws_instance.app_server}"]"""))
  }

  test("provider duplicate-name fan-out (A18), span = first matching block") {
    val ps = of(configRows, "provider")
    assert(ps.size == 2)
    assert(ps.forall(_.name == Some("aws")))
    val aliased = ps.find(_.alias.isDefined).get
    assert(aliased.alias == Some("west"))
    assert(aliased.version == Some("~> 4.0"))
    assert(aliased.arguments == Some("""{"region":"us-west-2"}"""))
    val plain = ps.find(_.alias.isEmpty).get
    assert(plain.arguments == Some("""{"region":"us-east-1"}"""))
    // both report the first provider block's span
    assert(ps.map(_.startLine).distinct.size == 1)
  }

  test("variable: ${type} unwrap (A20), quoted default, validation (A19), sensitive fix") {
    val vs = of(configRows, "variable")
    assert(vs.size == 1)
    val v = vs.head
    assert(v.name == Some("instance_type"))
    assert(v.tfType == Some("string"))
    assert(v.defaultValue == Some("\"t2.micro\""))
    assert(v.description == Some("EC2 instance type"))
    assert(v.sensitive == Some(true)) // documented divergence: reference bug leaves this NULL
    assert(v.validation.exists(_.startsWith("validation {")))
    assert(v.validation.exists(_.contains("condition")))
  }

  // ------------------------------------------------------------- plan file

  test("plan resources: projection + spans (A5/A9/A14)") {
    assert(planRows.forall(_.table == "resource")) // only resource serves plans
    assert(planRows.size == 3)
    val r0 = planRows.head
    assert(r0.address == Some("aws_instance.app_server[0]"))
    assert(r0.mode == Some("managed"))
    assert(r0.arguments == Some(
      """{"ami":"ami-830c94e3","instance_type":"t2.micro","tags":{"Name":"ExampleAppServerInstance"}}"""))
    assert(r0.attributesStd == r0.arguments)
    assert(r0.attributes.isEmpty)
    assert(r0.startLine.exists(_ > 1))
    assert(r0.source.exists(_.contains("aws_instance.app_server[0]")))
    val s3 = planRows.find(_.tfType == Some("aws_s3_bucket")).get
    assert(s3.arguments == Some("""{"bucket":"example-logs","force_destroy":false}"""))
  }

  test("plan sniff: .tf-configured path with plan content routes to plan branch (A3)") {
    val sniffed = Builders.rowsForFile("/fx/x.tf", FileKind.Config, read("fixtures/tfplan.json"))
    assert(sniffed.size == 3 && sniffed.forall(_.table == "resource"))
    assert(sniffed.head.address == Some("aws_instance.app_server[0]"))
  }

  test("single-line plan: reference span fallback — 1..totalLines + regex-sliced source (A14)") {
    // utils.go:495-547: the formatted-scan fails (no `"resources": [` line),
    // so every row reports line 1..total (1 for this file) and source = the
    // json.Marshal (sorted keys) of the LAST planned_values resource whose
    // printed form contains both the address and the type
    assert(planRows1L.size == 3)
    assert(planRows1L.forall(r => r.startLine == Some(1L) && r.endLine == Some(1L)))
    val a0 = planRows1L.find(_.address == Some("aws_instance.app_server[0]")).get
    assert(a0.source == Some(
      """{"address":"aws_instance.app_server[0]","mode":"managed","name":"app_server","provider_name":"registry.terraform.io/hashicorp/aws","type":"aws_instance","values":{"ami":"ami-830c94e3","instance_type":"t2.micro","tags":{"Name":"ExampleAppServerInstance"}}}"""))
    val logs = planRows1L.find(_.address == Some("aws_s3_bucket.logs")).get
    assert(logs.source == Some(
      """{"address":"aws_s3_bucket.logs","mode":"managed","name":"logs","provider_name":"registry.terraform.io/hashicorp/aws","type":"aws_s3_bucket","values":{"bucket":"example-logs","force_destroy":false}}"""))
  }

  test("unformatted state: span fallback 1..totalLines, no source") {
    // compact the pretty fixture onto one line: the reference's scanner
    // finds no `"resources": [` line and its plan-shaped fallback regex
    // cannot match state content → spans 1..1, source NULL
    val compact = read("fixtures/terraform.tfstate")
      .replace("\n", "").replaceAll("\\s{2,}", "")
    val rows = Builders.rowsForFile("/fx/one.tfstate", FileKind.State, compact)
    val rs = of(rows, "resource")
    assert(rs.size == 3)
    assert(rs.forall(r => r.startLine == Some(1L) && r.endLine == Some(1L) && r.source.isEmpty))
    val outs = of(rows, "output")
    assert(outs.nonEmpty && outs.forall(r => r.startLine == Some(1L) && r.source.isEmpty))
  }

  test("formatted state: trailing-newline sources; variables always take the fallback") {
    // the reference's getSourceFromFile appends \n to EVERY line (incl.
    // the last), and its scanner has no closing logic for a "variables"
    // block — every state variable reports 1..totalLines with NO source
    // even in a pretty-printed file
    val state =
      """{
        |  "version": 4,
        |  "outputs": {
        |    "ip": { "value": "10.0.0.9", "type": "string" }
        |  },
        |  "resources": [
        |    {
        |      "mode": "managed",
        |      "type": "aws_instance",
        |      "name": "web",
        |      "instances": [
        |        { "attributes": { "id": "i-9" } }
        |      ]
        |    }
        |  ],
        |  "variables": {
        |    "region": { "value": "us-east-1" }
        |  }
        |}""".stripMargin
    val rows = Builders.rowsForFile("/fx/fmt.tfstate", FileKind.State, state)
    val totalLines = state.split("\n", -1).length.toLong

    val res = of(rows, "resource").head
    assert(res.source.exists(_.endsWith("\n")), "formatted resource source must end with \\n")
    val out = of(rows, "output").head
    assert(out.source.exists(_.endsWith("\n")), "formatted output source must end with \\n")

    val v = of(rows, "variable").head
    assert(v.name == Some("region"))
    assert(v.startLine == Some(1L) && v.endLine == Some(totalLines),
      s"state variable must take the 1..totalLines fallback, got ${v.startLine}..${v.endLine}")
    assert(v.source.isEmpty, "state variable source must be NULL (scanner cannot close the block)")
  }

  test("plan resource without an address publishes NULL (no type.name fallback)") {
    // buildTerraformPlanResource (parse_tfplan.go:38-59) copies the plan
    // address verbatim; the type.name fallback is config/state-only
    val plan =
      """{"format_version":"1.1","planned_values":{"root_module":{"resources":[
        |{"type":"aws_instance","name":"web","mode":"managed","values":{"ami":"a"}}
        |]}},"resource_changes":[]}""".stripMargin.replace("\n", "")
    val rows = Builders.rowsForFile("/fx/noaddr.json", FileKind.Plan, plan)
    val r = of(rows, "resource").head
    assert(r.name == Some("web") && r.address.isEmpty,
      s"plan row without address must publish NULL, got ${r.address}")
  }

  test("count meta-arg: out-of-Long-range whole numbers yield NULL, not a wrapped value") {
    val rows = Builders.rowsForFile("/fx/big.tf", FileKind.Config,
      """resource "aws_instance" "x" {
        |  count = 10000000000000000000
        |}
        |""".stripMargin)
    val r = of(rows, "resource").head
    assert(r.count.isEmpty, s"overflowing count must be NULL, got ${r.count}")
    assert(r.countSrc == Some("10000000000000000000"), "count_src keeps the raw JSON")
  }

  // ------------------------------------------------------------ state file

  test("state instance fan-out + index_key addressing (A8)") {
    val rs = of(stateRows, "resource")
    assert(rs.size == 3)
    val apps = rs.filter(_.name == Some("app_server"))
    assert(apps.map(_.address) == Seq(Some("aws_instance.app_server[0]"), Some("aws_instance.app_server[1]")))
    val a0 = apps.head
    assert(a0.mode == Some("managed"))
    assert(a0.provider == Some("provider[\"registry.terraform.io/hashicorp/aws\"]"))
    // arguments = envelope keys minus handled ones; 'type' kept (reference quirk)
    assert(a0.arguments == Some("""{"type":"aws_instance"}"""))
    assert(a0.attributes == Some(
      """{"ami":"ami-830c94e3","id":"i-0abc","instance_type":"t2.micro"}"""))
    assert(a0.attributesStd == a0.attributes)
    val logs = rs.find(_.name == Some("logs")).get
    assert(logs.address == Some("aws_s3_bucket.logs")) // no index_key → default address
  }

  test("state outputs (+ sensitive NullIfZero)") {
    val os = of(stateRows, "output").sortBy(_.name)
    assert(os.map(_.name.get) == Seq("bucket_name", "instance_ip"))
    val ip = os(1)
    assert(ip.value == Some("\"10.0.0.5\""))
    assert(ip.sensitive == Some(true))
    assert(os.head.sensitive.isEmpty) // false/absent → NULL (NullIfZero)
    assert(ip.startLine.exists(_ > 0))
  }

  // ---------------------------------------------------------------- parser

  test("hcl: heredocs, escapes, templates") {
    val doc = Hcl.parse(
      """locals {
        |  text = <<EOT
        |line1
        |line2
        |EOT
        |  tpl  = "a-${var.x}-b"
        |  esc  = "a\"b$${lit}"
        |  n    = 1.5
        |  none = null
        |}
        |""".stripMargin)
    val locals = doc.doc.get("locals").get.asInstanceOf[JObj]
    assert(locals.get("text") == Some(JStr("line1\nline2\n")))
    assert(locals.get("tpl") == Some(JStr("a-${var.x}-b")))
    assert(locals.get("esc") == Some(JStr("a\"b${lit}")))
    assert(locals.get("n") == Some(JNum("1.5")))
    assert(locals.get("none") == Some(JNull))
  }

  test("tf.json config: same tables/meta-args as HCL, spans from JSON locations") {
    val rows = Builders.rowsForFile("/fx/config.tf.json", FileKind.Config,
      read("fixtures/config.tf.json"))
    assert(rows.filter(_.table == "_error").isEmpty, rows.filter(_.table == "_error").toString)

    val r = of(rows, "resource").head
    assert(r.tfType == Some("aws_instance") && r.name == Some("web"))
    assert(r.count == Some(2L), "count meta-arg extracted")
    assert(r.provider == Some("aws.west"))
    assert(r.address == Some("aws_instance.web"))
    assert(r.dependsOn == Some("""["aws_s3_bucket.logs"]"""))
    assert(r.arguments.exists(_.contains("ami-123456")))
    assert(r.attributesStd == r.arguments, "A9: attributes_std = arguments for config")
    assert(r.startLine.exists(_ > 1) && r.endLine.exists(_ >= r.startLine.get), "JSON spans")
    assert(r.source.exists(_.contains("ami-123456")), "source slice covers the block")

    assert(of(rows, "data_source").map(_.name) == Seq(Some("ubuntu")))
    assert(of(rows, "variable").head.defaultValue == Some("\"us-east-1\""))
    assert(of(rows, "output").head.sensitive == Some(true))
    // duplicate provider names fan out one row each (A18), alias extracted
    val provs = of(rows, "provider")
    assert(provs.size == 2 && provs.flatMap(_.alias) == Seq("west"))
    assert(of(rows, "local").map(_.name).toSet == Set(Some("owner"), Some("env")))
    val m = of(rows, "module").head
    assert(m.moduleSource == Some("terraform-aws-modules/vpc/aws") && m.version == Some("3.0.0"))
  }

  test("json canonical render matches Go json.Marshal conventions") {
    val v = JObj(Vector(
      "b" -> JStr("x<y&z>"),
      "a" -> JArr(Vector(JNum("1"), JBool(true), JNull))))
    // keys sorted, compact, HTML chars escaped like Go's json.Marshal
    assert(v.render == "{\"a\":[1,true,null],\"b\":\"x\\u003cy\\u0026z\\u003e\"}")
  }
}
