package graft.tf

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the PgDialect pre-parser rewrite: whatever the code
  * regions look like, SINGLE-QUOTED LITERALS and line COMMENTS must pass
  * through byte-identical — a rewriter that edits inside strings corrupts
  * query data silently. (Fixed-seed sampling; the scalatestplus bridge
  * isn't available offline.) */
class PgDialectPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] = {
    var seed = Seed(7L)
    (1 to n).flatMap { _ =>
      seed = seed.next
      try Some(g.pureApply(Gen.Parameters.default, seed, 100)) catch { case _: Throwable => None }
    }
  }

  // literal payloads full of operator look-alikes the rewriter must not touch
  private val genPayload: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf("a -> b", "x ->> y", "c::jsonb", "m ~ n", "p !~* q", "--dash", "%like%", "$.path[0]"),
    Gen.listOfN(3, Gen.oneOf("->", "::", "~", "~*", " ", "id")).map(_.mkString))

  private val genCode: Gen[String] = Gen.oneOf(
    "select x from t where ", "and y = 1 ", "or attributes ", " name ilike ", " , ")

  test("single-quoted literals survive every rewrite byte-for-byte") {
    val gen = for {
      c1 <- genCode; p <- genPayload; c2 <- genCode
    } yield (s"$c1'$p'$c2", p)
    samples(gen).foreach { case (sql, payload) =>
      val out = PgDialect.rewrite(sql)
      assert(out.contains(s"'$payload'"),
        s"literal corrupted:\n in: $sql\nout: $out")
    }
  }

  test("line comments survive untouched") {
    val gen = for { p <- genPayload; c <- genCode } yield (s"$c -- note: $p\n$c", s"-- note: $p")
    samples(gen).foreach { case (sql, comment) =>
      val out = PgDialect.rewrite(sql)
      assert(out.contains(comment), s"comment corrupted:\n in: $sql\nout: $out")
    }
  }

  test("block comments survive untouched (apostrophes inside must not leak)") {
    val gen = for { p <- genPayload; c <- genCode } yield (s"$c /* don't $p */ $c", s"/* don't $p */")
    samples(gen).filter { case (_, com) =>
      // a payload containing the closing marker legitimately ends the
      // comment early — only well-formed comments must survive whole
      !com.dropRight(2).contains("*/")
    }.foreach { case (sql, comment) =>
      val out = PgDialect.rewrite(sql)
      assert(out.contains(comment), s"block comment corrupted:\n in: $sql\nout: $out")
    }
  }

  test("rewrite is idempotent on its own output for the documented corpus") {
    val examples = Seq(
      "select attributes_std ->> 'acl' from terraform_resource",
      "select (attributes_std ->> 'policy')::jsonb -> 'Statement' from t",
      "select * from t where version ~ '^[0-9]' and name !~* 'prod'",
      "select jsonb_array_elements(arguments -> 'filter') as f from t",
      "select arguments -> 'tags' -> 'a' ->> 'b' from terraform_resource",
      "select lower(x) -> 'k', y::numeric(10,2) from t /* don't */",
      "select x -> 'it''s', x -> -1, ~flags from t")
    examples.foreach { sql =>
      val once = PgDialect.rewrite(sql)
      assert(PgDialect.rewrite(once) == once, s"not idempotent: $sql -> $once")
    }
  }

  test("sqlite dialect: literals survive and rewrite is idempotent") {
    val gen = for { c1 <- genCode; p <- genPayload; c2 <- genCode } yield (s"$c1'$p'$c2", p)
    samples(gen).foreach { case (sql, payload) =>
      val out = SqliteDialect.rewrite(sql)
      assert(out.contains(s"'$payload'"), s"literal corrupted:\n in: $sql\nout: $out")
    }
    val examples = Seq(
      "select json_extract(attributes_std, '$.ami') from terraform_resource",
      "select * from terraform_output where sensitive = 1",
      "select * from t where json_extract(x, '$.a') is null and json_extract(x, '$.b')",
      "select json_each(arguments, '$.filter') as f from t",
      "select * from t where not json_extract(x, '$.on')")
    examples.foreach { sql =>
      val once = SqliteDialect.rewrite(sql)
      assert(SqliteDialect.rewrite(once) == once, s"not idempotent: $sql -> $once")
    }
  }

  test("regex-match rewrite handles mixed literal/non-literal ~* chains") {
    // the earlier literal ~* must still rewrite when a later ~* has a
    // non-literal pattern (round-2 advice: pass 1 used to stop early)
    assert(PgDialect.rewrite("a ~* 'x' and b ~* col") ==
      "a  rlike '(?i)x' and b ~* col")
    assert(PgDialect.rewrite("a !~* 'x' and b ~* col and c ~* 'y'") ==
      "a  NOT rlike '(?i)x' and b ~* col and c  rlike '(?i)y'")
  }

  test("call expansion continues past identifiers containing the needle") {
    // round-2 advice: an identifier containing jsonb_array_elements used
    // to stop the scan before later genuine calls
    assert(PgDialect.rewrite("select my_jsonb_array_elements_col, jsonb_array_elements(x) from t") ==
      "select my_jsonb_array_elements_col, explode(json_array_elements(x)) from t")
  }
}
