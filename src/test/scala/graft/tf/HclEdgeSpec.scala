package graft.tf

import org.scalatest.funsuite.AnyFunSuite

/** Edge-case coverage for the HCL parser beyond the fixture corpus. */
class HclEdgeSpec extends AnyFunSuite {

  private def body(src: String): JObj =
    Hcl.parse(src).doc.get("x").get.asInstanceOf[JObj]

  test("one-line block") {
    val d = Hcl.parse("""x { a = 1 }""")
    assert(body("""x { a = 1 }""").get("a") == Some(JNum("1")))
    assert(d.blocks.head.startLine == 1 && d.blocks.head.endLine == 1)
  }

  test("numbers: negative, float, scientific") {
    val b = body("x {\n  a = -5\n  b = 3.14\n  c = 1e9\n  d = -2.5e-3\n}")
    assert(b.get("a") == Some(JNum("-5")))
    assert(b.get("b") == Some(JNum("3.14")))
    assert(b.get("c") == Some(JNum("1e9")))
    assert(b.get("d") == Some(JNum("-2.5e-3")))
  }

  test("multi-line arrays with trailing commas and comments") {
    val b = body(
      """x {
        |  a = [
        |    "one",   # first
        |    "two",   // second
        |    /* third */ "three",
        |  ]
        |}""".stripMargin)
    assert(b.get("a") == Some(JArr(Vector(JStr("one"), JStr("two"), JStr("three")))))
  }

  test("nested objects and arrays of objects") {
    val b = body(
      """x {
        |  o = { k = { k2 = [1, 2] } }
        |  l = [{ a = 1 }, { a = 2 }]
        |}""".stripMargin)
    assert(b.get("o").get.render == """{"k":{"k2":[1,2]}}""")
    assert(b.get("l").get.render == """[{"a":1},{"a":2}]""")
  }

  test("conditional and arithmetic expressions stay opaque") {
    val b = body(
      """x {
        |  a = var.n > 1 ? "big" : "small"
        |  b = 1 + 2 * 3
        |  c = length(var.xs) == 0
        |}""".stripMargin)
    assert(b.get("a") == Some(JStr("${var.n > 1 ? \"big\" : \"small\"}")))
    assert(b.get("b") == Some(JStr("${1 + 2 * 3}")))
    assert(b.get("c") == Some(JStr("${length(var.xs) == 0}")))
  }

  test("function calls spanning lines inside parens") {
    val b = body(
      """x {
        |  a = merge(
        |    var.a,
        |    { k = "v" }
        |  )
        |}""".stripMargin)
    assert(b.get("a").get.asInstanceOf[JStr].value.startsWith("${merge("))
  }

  test("labeled nested blocks chain into nested objects") {
    val b = body(
      """x {
        |  provisioner "local-exec" {
        |    command = "echo hi"
        |  }
        |}""".stripMargin)
    assert(b.get("provisioner").get.render == """{"local-exec":{"command":"echo hi"}}""")
  }

  test("repeated nested blocks become arrays") {
    val b = body(
      """x {
        |  rule { id = 1 }
        |  rule { id = 2 }
        |}""".stripMargin)
    assert(b.get("rule").get.render == """[{"id":1},{"id":2}]""")
  }

  test("escaped quotes and dollar signs in strings") {
    val b = body("""x { a = "say \"hi\"" """ + "\n" + """  b = "cost: $5" }""")
    assert(b.get("a") == Some(JStr("say \"hi\"")))
    assert(b.get("b") == Some(JStr("cost: $5")))
  }

  test("heredoc with dedent marker") {
    val b = body(
      "x {\n  a = <<-EOT\n    line1\n      line2\n    EOT\n}")
    assert(b.get("a") == Some(JStr("line1\n  line2\n")))
  }

  test("block comments between blocks and attrs") {
    val d = Hcl.parse(
      """/* header */
        |x {
        |  # comment
        |  a = 1 /* trailing */
        |  b = 2
        |}""".stripMargin)
    val b = d.doc.get("x").get.asInstanceOf[JObj]
    assert(b.get("a") == Some(JNum("1")) && b.get("b") == Some(JNum("2")))
  }

  test("unparseable content yields a diagnostics row, not an exception") {
    val bad = Builders.rowsForFile("/f.tf", FileKind.Config, "resource \"a\" {{{")
    assert(bad.size == 1 && bad.head.table == "_error")
    assert(bad.head.description.exists(_.startsWith("hcl:")))
    val badJson = Builders.rowsForFile("/f.json", FileKind.Plan, "not json")
    assert(badJson.size == 1 && badJson.head.table == "_error")
    // structurally-unexpected but valid JSON → zero rows (no error)
    assert(Builders.rowsForFile("/f.tfstate", FileKind.State, "{\"resources\": 42}").isEmpty)
  }

  test("case-insensitive label matching for spans (isBlockMatch)") {
    val d = Hcl.parse(
      """resource "AWS_Instance" "Web" {
        |  ami = "a"
        |}""".stripMargin)
    assert(d.firstBlock("resource", Seq("aws_instance", "web")).isDefined)
  }
}
