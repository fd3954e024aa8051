package graft.tf

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the canonical JSON layer (SURVEY §5.2: normalization
  * round-trips). render is the oracle-visible output — it must be stable
  * under parse ∘ render and deterministic under field reordering.
  * (ScalaCheck generators sampled with a fixed seed — the scalatestplus
  * bridge isn't available offline.) */
class JsonPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      seed = seed.next
      try Some(g.pureApply(Gen.Parameters.default, seed, 100)) catch { case _: Throwable => None }
    }
  }

  private val genLeaf: Gen[JValue] = Gen.oneOf(
    Gen.const(JNull),
    Gen.oneOf(true, false).map(JBool(_)),
    Gen.chooseNum(-1000000L, 1000000L).map(n => JNum(n.toString)),
    Gen.chooseNum(-999.0, 999.0).map(d => JNum(BigDecimal(d).underlying.toPlainString)),
    Gen.alphaNumStr.map(JStr(_)),
    Gen.oneOf("a\"b", "x\\y", "t\tn\nr\r", "<&>", "∂elta", "${var.x}").map(JStr(_)))

  private def genValue(depth: Int): Gen[JValue] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(l => JArr(l.toVector)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), genValue(depth - 1)))
        .map(l => JObj(l.toVector)))

  test("parse(render(v)) re-renders identically (canonical fixpoint)") {
    samples(genValue(3)).foreach { v =>
      val r1 = v.render
      assert(Json.parse(r1).render == r1, s"not a fixpoint: $r1")
    }
  }

  test("render is invariant under object field order") {
    samples(Gen.listOfN(5, Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), genLeaf))).foreach { fields =>
      val uniq = fields.toMap.toVector
      val shuffled = new scala.util.Random(7).shuffle(uniq)
      assert(JObj(uniq).render == JObj(shuffled).render)
    }
  }

  test("rendered strings always re-parse (escaping is complete)") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      assert(Json.parse(JStr(s).render) == JStr(s))
    }
    samples(Gen.listOf(Gen.chooseNum(0x20, 0xD700).map(_.toChar)).map(_.mkString)).foreach { s =>
      assert(Json.parse(JStr(s).render) == JStr(s))
    }
  }

  test("go-marshal parity edges: trailing garbage, U+2028/9, lone surrogates, key order") {
    // trailing content after the first value is malformed (json.Unmarshal
    // parity — the plan sniff must reject `{…}garbage`)
    assert(Json.parseOpt("""{"a":1} trailing""").isEmpty)
    assert(Json.parseOpt("""{"a":1}{"b":2}""").isEmpty)
    assert(Json.parseOpt("""{"a":1}   """).isDefined) // whitespace is fine

    // Go escapes the JS line separators unconditionally
    assert(JStr("a" + 0x2028.toChar + "b").render == "\"a\\u2028b\"")
    assert(JStr("a" + 0x2029.toChar + "b").render == "\"a\\u2029b\"")

    // a lone surrogate is invalid on encode → the � replacement
    // escape (Go behavior); a valid pair passes through untouched
    assert(JStr("x" + 0xD800.toChar).render == "\"x\\ufffd\"")
    assert(JStr("x" + 0xDC00.toChar + "y").render == "\"x\\ufffdy\"")
    val emoji = new String(Character.toChars(0x1F600))
    assert(Json.parse(JStr(emoji).render) == JStr(emoji))

    // keys sort by CODE POINT (UTF-8 byte order), not UTF-16 code units:
    // U+FFFD < U+1F600 although the emoji's high surrogate 0xD83D < 0xFFFD
    val o = JObj(Vector(emoji -> JNum("1"), "�" -> JNum("2")))
    assert(o.render == "{\"�\":2,\"" + emoji + "\":1}")
  }

  test("hcl literal numbers round-trip; bare words go opaque") {
    samples(Gen.chooseNum(-1000000L, 1000000L)).foreach { n =>
      assert(Hcl.literalOrOpaque(n.toString) == JNum(n.toString))
    }
    samples(Gen.alphaStr.suchThat(s => s.nonEmpty && !Set("true", "false", "null").contains(s))).foreach { w =>
      assert(Hcl.literalOrOpaque(w) == JStr("${" + w + "}"))
    }
  }
}
