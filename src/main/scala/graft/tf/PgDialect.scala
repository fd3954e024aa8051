package graft.tf

import org.apache.spark.sql.SparkSession

/** Postgres-dialect compatibility rewriter: lets the reference's documented
  * queries run VERBATIM (SURVEY §2B — `->`, `->>`, `::jsonb`/`::boolean`/
  * `::text` casts, `~` regex match, `jsonb_array_elements`) by rewriting
  * the SQL text into the Spark surface before parsing:
  *
  *   x -> 'k'    → json_get(x, 'k')        x ->> 'k' → json_get_str(x, 'k')
  *   x::jsonb    → x                       x::text   → x
  *   x::boolean  → CAST(x AS BOOLEAN)      a ~ 'p'   → a rlike 'p'
  *   jsonb_array_elements(e) → explode(json_array_elements(e))
  *
  * The rewrite is lexer-aware (single-quoted strings, double-quoted
  * identifiers, and comments pass through untouched) and operates on
  * operand expressions bounded by SQL word boundaries — sufficient for the
  * entire documented corpus (PgDialectSpec runs every example verbatim).
  * Deliberately a pre-parser text transform, not a Catalyst fork: the
  * Spark SQL grammar stays authoritative for everything else.
  */
object PgDialect {

  /** spark.sql wrapper applying the dialect rewrite. */
  def sql(spark: SparkSession, pgSql: String): org.apache.spark.sql.DataFrame =
    spark.sql(rewrite(pgSql))

  def rewrite(sql: String): String = {
    // pass 1: table-valued JSON iteration (both dialects' spellings):
    //   jsonb_array_elements(e) → explode(json_array_elements(e))
    //   json_each(e, p)         → explode(json_each_values(e, p))   (sqlite)
    var v = tokenize(expandCalls(
      expandCalls(sql, "jsonb_array_elements", "json_array_elements"),
      "json_each", "json_each_values"))
    // pass 2: :: casts
    v = rewriteCasts(v)
    // pass 3: -> / ->> then ~
    rewriteRegexMatch(rewriteArrow(v.map(_.text).mkString("")))
  }

  // --- tokenizer ---------------------------------------------------------
  private sealed trait Kind
  private case object Code extends Kind
  private case object Quoted extends Kind
  private final case class Tok(kind: Kind, text: String)

  private def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    val code = new StringBuilder
    def flush(): Unit = if (code.nonEmpty) { out += Tok(Code, code.toString); code.clear() }
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        flush()
        val start = i; i += 1
        while (i < n && !(sql.charAt(i) == '\'' && (i + 1 >= n || sql.charAt(i + 1) != '\''))) {
          if (sql.charAt(i) == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 else i += 1
        }
        i = math.min(i + 1, n)
        out += Tok(Quoted, sql.substring(start, i))
      } else if (c == '"') {
        flush()
        val start = i; i += 1
        while (i < n && sql.charAt(i) != '"') i += 1
        i = math.min(i + 1, n)
        out += Tok(Quoted, sql.substring(start, i))
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-' &&
                 !(i + 2 < n && sql.charAt(i + 2) == '>')) {
        flush()
        val start = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        out += Tok(Quoted, sql.substring(start, i))
      } else { code.append(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** `needle(args)` → `explode(fnName(args))`: one balanced-paren splice per
    * occurrence (code regions only, word-bounded, case-insensitive). A
    * non-qualifying occurrence (embedded in a longer identifier, or not
    * followed by `(`) advances the search offset and scanning CONTINUES —
    * later genuine calls in the same query are still expanded. The offset
    * is also advanced past each inserted `explode(fnName` head, so a
    * replacement that contains the needle (`json_each` → `json_each_values`)
    * never rematches: the rewrite is idempotent (PgDialectPropSpec). */
  private[tf] def expandCalls(sql0: String, needle: String, fnName: String): String = {
    var s = sql0
    var from = 0
    var searching = true
    while (searching) {
      val at = findCodeImpl(s.toLowerCase, needle, last = false, minPos = from)
      if (at < 0) searching = false
      else {
        val bounded =
          (at == 0 || { val c = s.charAt(at - 1); !c.isLetterOrDigit && c != '_' }) &&
          (at + needle.length >= s.length || {
            val c = s.charAt(at + needle.length); !c.isLetterOrDigit && c != '_'
          })
        var advanced = false
        if (bounded) {
          var j = at + needle.length
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          if (j < s.length && s.charAt(j) == '(') {
            val k = pastBalanced(s, j)
            if (k >= 0) {
              s = s.substring(0, at) + "explode(" + fnName +
                s.substring(j, k) + ")" + s.substring(k)
              from = at + "explode(".length + fnName.length
              advanced = true
            }
          }
        }
        if (!advanced) from = at + needle.length
      }
    }
    s
  }

  /** `expr::type` — operand is the token run back to the previous
    * word-boundary at paren depth 0 (handles `(…)::jsonb` and
    * `col ->> 'k')::jsonb` shapes because the operand scan stops at a
    * balanced open paren). */
  private def rewriteCasts(toks: Vector[Tok]): Vector[Tok] = {
    var s = toks.map(_.text).mkString("")
    var changed = true
    while (changed) {
      changed = false
      val at = findCode(s, "::")
      if (at >= 0) {
        changed = true
        // type name after ::
        var j = at + 2
        while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        val tpe = s.substring(at + 2, j).toLowerCase
        // operand before ::
        var k = at - 1
        while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
        val opEnd = k + 1
        var opStart = 0
        if (k >= 0 && s.charAt(k) == ')') {
          opStart = backBalanced(s, k).max(0)
          k = opStart - 1
        } else {
          while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_' || s.charAt(k) == '.' ||
                 s.charAt(k) == '\'' )) {
            if (s.charAt(k) == '\'') { // back over a string literal
              k -= 1
              while (k >= 0 && s.charAt(k) != '\'') k -= 1
            }
            k -= 1
          }
          opStart = k + 1
        }
        val operand = s.substring(opStart, opEnd)
        val replacement = tpe match {
          case "jsonb" | "json" | "text" | "varchar" => operand
          case t => s"CAST($operand AS ${sqlType(t)})"
        }
        s = s.substring(0, opStart) + replacement + s.substring(j)
      }
    }
    tokenize(s)
  }

  private def sqlType(t: String): String = t match {
    case "boolean" | "bool" => "BOOLEAN"
    case "int" | "integer" | "int4" => "INT"
    case "bigint" | "int8" => "BIGINT"
    case "float8" | "double" => "DOUBLE"
    case "numeric" | "decimal" => "DECIMAL(38,9)"
    case other => other.toUpperCase
  }

  /** `a -> 'k'` / `a ->> 'k'`: operand to the left as in casts; key is the
    * following string literal or number. Innermost-first via repeated
    * rightmost rewrite. */
  private def rewriteArrow(sql0: String): String = {
    var s = sql0
    var changed = true
    while (changed) {
      changed = false
      val at2 = findCodeLast(s, "->>")
      val at1r = findCodeLast(s, "->")
      // choose the rightmost arrow; ->> wins at same position
      val (at, len, fn) =
        if (at2 >= 0 && at2 >= at1r) (at2, 3, "json_get_str")
        else if (at1r >= 0 && (at1r + 2 >= s.length || s.charAt(at1r + 2) != '>')) (at1r, 2, "json_get")
        else if (at1r >= 0) (at1r, 3, "json_get_str")
        else (-1, 0, "")
      if (at >= 0) {
        changed = true
        // key after arrow
        var j = at + len
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        var keyEnd = j
        if (keyEnd < s.length && s.charAt(keyEnd) == '\'') {
          keyEnd += 1
          while (keyEnd < s.length && s.charAt(keyEnd) != '\'') keyEnd += 1
          keyEnd += 1
        } else while (keyEnd < s.length && (s.charAt(keyEnd).isLetterOrDigit || s.charAt(keyEnd) == '_')) keyEnd += 1
        val key = s.substring(j, keyEnd)
        // operand before arrow
        var k = at - 1
        while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
        val opEnd = k + 1
        var opStart = 0
        if (k >= 0 && s.charAt(k) == ')') {
          opStart = backBalanced(s, k).max(0)
          k = opStart - 1
        } else {
          while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_' || s.charAt(k) == '.' || s.charAt(k) == ')')) k -= 1
          opStart = k + 1
        }
        val operand = s.substring(opStart, opEnd)
        s = s.substring(0, opStart) + s"$fn($operand, $key)" + s.substring(keyEnd)
      }
    }
    s
  }

  /** Postgres regex-match operators → Spark `rlike` (code regions only):
    *   `a ~ 'p'` → `a rlike 'p'`        `a !~ 'p'` → `a NOT rlike 'p'`
    *   `a ~* 'p'` → `a rlike '(?i)p'`   `a !~* 'p'` → `a NOT rlike '(?i)p'`
    * The case-insensitive forms require a string-literal pattern (true of
    * all practical usage) so `(?i)` can be folded into it; a non-literal
    * pattern passes through untouched. Each `~` must be a standalone
    * operator token. */
  private def rewriteRegexMatch(sql0: String): String = {
    // pass 1: case-insensitive variants, rightmost-first with a SHRINKING
    // right bound: a `~*` whose pattern is not a string literal is skipped
    // (left for pass 2's guards) and scanning continues leftward, so
    // `a ~* 'x' AND b ~* col` still rewrites the earlier literal match.
    // Text left of each handled occurrence is unchanged, so offsets below
    // the bound stay stable.
    var s = sql0
    var bound = Int.MaxValue
    var scanning = true
    while (scanning) {
      val atStar = findCodeImpl(s, "~*", last = true, maxPos = bound)
      if (atStar < 0) scanning = false
      else {
        val bang = atStar > 0 && s.charAt(atStar - 1) == '!'
        var j = atStar + 2
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '\'') {
          val op = if (bang) " NOT rlike " else " rlike "
          val start = if (bang) atStar - 1 else atStar
          s = s.substring(0, start) + op + s.substring(j, j + 1) + "(?i)" + s.substring(j + 1)
        }
        bound = if (bang) atStar - 1 else atStar
      }
    }
    // pass 2: plain ~ / !~ (any remaining ~* — non-literal pattern — is
    // skipped by the (?![~*]) guards)
    val toks = tokenize(s)
    toks.map {
      case Tok(Code, t) => Tok(Code,
        t.replaceAll("!~(?![~*])", " NOT rlike ")
         .replaceAll("(?<![!~])~(?![~*])", " rlike "))
      case other        => other
    }.map(_.text).mkString("")
  }

  /** `s(open) == '('` → index just past the matching `)`, or -1 if
    * unbalanced. Skips single-quoted literals so a `)` inside a string
    * (e.g. `json_each(x, '$.a)b')`) never closes the paren early. */
  private def pastBalanced(s: String, open: Int): Int = {
    var depth = 0
    var k = open
    while (k < s.length) {
      val c = s.charAt(k)
      if (c == '\'') { k += 1; while (k < s.length && s.charAt(k) != '\'') k += 1 }
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return k + 1 }
      k += 1
    }
    -1
  }

  /** `s(close) == ')'` → index of the matching `(`, or -1. Backward twin of
    * [[pastBalanced]]; same string-literal skip. */
  private def backBalanced(s: String, close: Int): Int = {
    var depth = 0
    var k = close
    while (k >= 0) {
      val c = s.charAt(k)
      if (c == '\'') { k -= 1; while (k >= 0 && s.charAt(k) != '\'') k -= 1 }
      else if (c == ')') depth += 1
      else if (c == '(') { depth -= 1; if (depth == 0) return k }
      k -= 1
    }
    -1
  }

  /** index of `needle` outside quoted regions, first occurrence. */
  private def findCode(s: String, needle: String): Int = findCodeImpl(s, needle, last = false)
  private def findCodeLast(s: String, needle: String): Int = findCodeImpl(s, needle, last = true)

  /** Lexing always starts at 0 (so quote state is correct); `minPos`/`maxPos`
    * bound which match POSITIONS qualify. */
  private[tf] def findCodeImpl(s: String, needle: String, last: Boolean,
      minPos: Int = 0, maxPos: Int = Int.MaxValue): Int = {
    var i = 0
    var found = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { i += 1; while (i < s.length && s.charAt(i) != '\'') i += 1; i += 1 }
      else if (c == '"') { i += 1; while (i < s.length && s.charAt(i) != '"') i += 1; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-' &&
               !(i + 2 < s.length && s.charAt(i + 2) == '>')) {
        // line comment (same `-->` carve-out as tokenize): skip to newline
        while (i < s.length && s.charAt(i) != '\n') i += 1
      }
      else if (s.startsWith(needle, i) && i >= minPos && i < maxPos) {
        if (!last) return i
        found = i; i += needle.length
      } else i += 1
    }
    found
  }
}
