package graft.tf

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import scala.util.Try

/** Property tests for the recursive-descent HCL parser: generated
  * well-formed documents must parse back to exactly the blocks, labels,
  * attribute values and in-range spans they were built from, under
  * varied interleaved trivia (comments, blank lines); arbitrary garbage
  * must terminate with an orderly exception, never a hang or a
  * non-Exception throwable. (ScalaCheck generators sampled with a fixed
  * seed — the scalatestplus bridge isn't available offline.) */
class HclPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 120): Seq[A] = {
    var seed = Seed(11L)
    (1 to n).flatMap { _ =>
      seed = seed.next
      try Some(g.pureApply(Gen.Parameters.default, seed, 100)) catch { case _: Throwable => None }
    }
  }

  private val genIdent: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private final case class Attr(name: String, rendered: String, expect: JValue)

  private val genAttrValue: Gen[(String, JValue)] = Gen.oneOf(
    Gen.chooseNum(-100000L, 100000L).map(n => (n.toString, JNum(n.toString))),
    Gen.oneOf(true, false).map(b => (b.toString, JBool(b))),
    Gen.const(("null", JNull)),
    genIdent.map(s => ("\"" + s + "\"", JStr(s))),
    Gen.listOfN(3, Gen.chooseNum(0L, 99L)).map { ns =>
      (ns.mkString("[", ", ", "]"), JArr(ns.toVector.map(n => JNum(n.toString))))
    },
    genIdent.map(s => (s"{ k = \"$s\" }", JObj(Vector("k" -> JStr(s))))))

  private final case class Block(tpe: String, labels: List[String], attrs: List[Attr])

  private val genBlock: Gen[Block] = for {
    tpe <- genIdent
    nLabels <- Gen.chooseNum(0, 2)
    labels <- Gen.listOfN(nLabels, genIdent)
    nAttrs <- Gen.chooseNum(1, 4)
    vals <- Gen.listOfN(nAttrs, genAttrValue)
    names <- Gen.listOfN(nAttrs, genIdent)
  } yield Block(tpe, labels,
    names.zipWithIndex.zip(vals).map { case ((n, i), (r, e)) => Attr(s"$n$i", r, e) })

  private val genTrivia: Gen[String] = Gen.oneOf(
    "", "\n", "# comment\n", "// comment\n", "/* block\n comment */\n", "\n\n")

  test("generated documents parse back to their blocks, values, and spans") {
    val docs = samples(for {
      blocks <- Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, genBlock))
      trivia <- Gen.listOfN(blocks.length + 1, genTrivia)
    } yield (blocks, trivia))
    assert(docs.nonEmpty)
    docs.foreach { case (blocks, trivia) =>
      val text = trivia.head + blocks.zip(trivia.tail).map { case (b, t) =>
        val labels = b.labels.map(l => s""""$l"""").mkString(" ")
        val attrs = b.attrs.map(a => s"  ${a.name} = ${a.rendered}").mkString("\n")
        s"${b.tpe} $labels {\n$attrs\n}\n" + t
      }.mkString
      val parsed = Hcl.parse(text)
      assert(parsed.blocks.length == blocks.length, s"block count in:\n$text")
      val nLines = text.split("\n", -1).length
      parsed.blocks.zip(blocks).foreach { case (got, want) =>
        assert(got.blockType == want.tpe)
        assert(got.labels.toList == want.labels)
        want.attrs.foreach { a =>
          assert(got.body.get(a.name).contains(a.expect),
            s"attr ${a.name}: got ${got.body.get(a.name)}, want ${a.expect} in:\n$text")
        }
        assert(got.startLine >= 1 && got.startLine <= got.endLine && got.endLine <= nLines,
          s"span ${got.startLine}..${got.endLine} outside 1..$nLines")
        assert(got.source.startsWith(want.tpe), s"source slice must start at the block")
      }
    }
  }

  test("arbitrary garbage terminates with an orderly exception or a parse") {
    val garbage = samples(Gen.listOfN(40,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('{', '}', '"', '=', '[', ']', '$', '\n', '#', '<')))
      .map(_.mkString), n = 200)
    garbage.foreach { g =>
      Try(Hcl.parse(g)).fold(
        e => assert(e.isInstanceOf[Exception], s"non-Exception throwable for:\n$g"),
        _ => ())
    }
  }
}
