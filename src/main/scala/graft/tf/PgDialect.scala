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
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        // block comment: an apostrophe inside must not flip quote state
        flush()
        val start = i; i += 2
        while (i < n && !(sql.charAt(i) == '*' && i + 1 < n && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
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
  /** Char-wise lowercase: 1:1 length-preserving (so indices computed on
    * the lowered string are valid in the original) and locale-independent
    * (String.toLowerCase under tr_TR maps I to dotless ı, and İ expands
    * to two chars, shifting every offset). */
  private[tf] def asciiLower(s: String): String = s.map(Character.toLowerCase)

  private[tf] def expandCalls(sql0: String, needle: String, fnName: String): String = {
    var s = sql0
    var from = 0
    var searching = true
    while (searching) {
      val at = findCodeImpl(asciiLower(s), needle, last = false, minPos = from)
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

  /** Start of the operand expression ending at `end` (exclusive): walks
    * left over identifier chars/dots, string literals ('' doubling
    * respected) and balanced paren groups; an identifier written FLUSH
    * against a group's '(' (function-call syntax) is absorbed with it,
    * while `AND (x)` style keywords — separated by whitespace — are not.
    * Shared by the cast and arrow rewrites. */
  private def operandStart(s: String, end: Int): Int = {
    var k = end - 1
    var done = false
    while (!done && k >= 0) {
      val c = s.charAt(k)
      if (c == ')') {
        val o = backBalanced(s, k)
        if (o < 0) done = true else k = o - 1 // loop absorbs a flush fn name
      } else if (c == '\'') {
        k -= 1
        var inStr = true
        while (inStr && k >= 0) {
          if (s.charAt(k) == '\'') {
            if (k - 1 >= 0 && s.charAt(k - 1) == '\'') k -= 2 // '' escape
            else { inStr = false; k -= 1 }
          } else k -= 1
        }
      } else if (c.isLetterOrDigit || c == '_' || c == '.') k -= 1
      else done = true
    }
    k + 1
  }

  /** Parameterized type names whose `(…)` arguments belong to the cast. */
  private val paramTypes = Set("varchar", "char", "numeric", "decimal")

  /** `expr::type` — operand via [[operandStart]] (handles `(…)::jsonb`,
    * `fn(args)::boolean` and chained forms); parameterized types consume
    * their argument list (`::varchar(255)` passes through like ::varchar,
    * `::numeric(p,s)` keeps its precision). */
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
        // a parameterized type's (…) is part of the cast, not trailing SQL
        var args = ""
        if (j < s.length && s.charAt(j) == '(' && paramTypes.contains(tpe)) {
          val k2 = pastBalanced(s, j)
          if (k2 >= 0) { args = s.substring(j, k2); j = k2 }
        }
        // operand before ::
        var k = at - 1
        while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
        val opEnd = k + 1
        val opStart = operandStart(s, opEnd)
        val operand = s.substring(opStart, opEnd)
        val replacement = tpe match {
          case "jsonb" | "json" | "text" | "varchar" | "char" => operand
          case t @ ("numeric" | "decimal") if args.nonEmpty =>
            s"CAST($operand AS DECIMAL$args)"
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

  /** `a -> 'k'` / `a ->> 'k'`: operand via [[operandStart]]; key is the
    * following string literal ('' doubling respected), possibly-negative
    * number, or bare word. LEFTMOST-first: rewriting `x -> 'a' ->> 'b'`
    * first turns the left arrow into `json_get(x, 'a')`, which the next
    * iteration's operand scan absorbs whole — chained arrows (the
    * canonical Postgres idiom) nest correctly; each rewrite removes one
    * arrow and inserts none, so the loop terminates. */
  private def rewriteArrow(sql0: String): String = {
    var s = sql0
    var changed = true
    while (changed) {
      changed = false
      val at = findCode(s, "->")
      if (at >= 0) {
        changed = true
        val (len, fn) =
          if (at + 2 < s.length && s.charAt(at + 2) == '>') (3, "json_get_str")
          else (2, "json_get")
        // key after arrow
        var j = at + len
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        var keyEnd = j
        if (keyEnd < s.length && s.charAt(keyEnd) == '\'') {
          keyEnd += 1
          var inStr = true
          while (inStr && keyEnd < s.length) {
            if (s.charAt(keyEnd) == '\'') {
              if (keyEnd + 1 < s.length && s.charAt(keyEnd + 1) == '\'') keyEnd += 2
              else { inStr = false; keyEnd += 1 }
            } else keyEnd += 1
          }
        } else {
          if (keyEnd < s.length && s.charAt(keyEnd) == '-') keyEnd += 1 // negative index
          while (keyEnd < s.length && (s.charAt(keyEnd).isLetterOrDigit || s.charAt(keyEnd) == '_')) keyEnd += 1
        }
        val key = s.substring(j, keyEnd)
        // operand before arrow
        var k = at - 1
        while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
        val opEnd = k + 1
        val opStart = operandStart(s, opEnd)
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
    // skipped by the (?![~*]) guards). The operator must FOLLOW an operand
    // (identifier/')'/ literal end) — a unary bitwise NOT (`~flags`) has
    // none and passes through untouched.
    val toks = tokenize(s)
    toks.zipWithIndex.map {
      case (Tok(Code, t), idx) =>
        val t1 = TildeBinRe.replaceAllIn(t, m => {
          val word = m.group(1)
          // a keyword before ~ means the tilde is unary bitwise NOT
          // (`select ~flags`, `where ~x`) — leave it alone
          if (sqlKeywords(asciiLower(word))) scala.util.matching.Regex.quoteReplacement(m.matched)
          else scala.util.matching.Regex.quoteReplacement(
            word + (if (m.group(3) == "!") " NOT rlike " else " rlike "))
        })
        // a ~ at the token's start follows a string literal ('p' ~ x):
        // that literal IS the left operand, it just sits in the previous
        // token — still a binary match. Comments also tokenize as Quoted
        // but are NOT operands (`/* note */ ~flags` stays unary), so
        // require the previous token to actually be a string literal.
        val t2 = if (idx > 0 && toks(idx - 1).kind == Quoted &&
            toks(idx - 1).text.startsWith("'"))
          TildeLeadRe.findFirstMatchIn(t1) match {
            case Some(m) =>
              (if (m.group(2) == "!") " NOT rlike " else " rlike ") + t1.substring(m.end)
            case None => t1
          }
        else t1
        Tok(Code, t2)
      case (other, _) => other
    }.map(_.text).mkString("")
  }

  /** binary ~ / !~ preceded by an operand word/paren/bracket (group 1);
    * group 3 is the optional `!`. */
  private val TildeBinRe = "([A-Za-z0-9_.]+|\\)|\\])(\\s*)(!?)~(?![~*])".r
  private val TildeLeadRe = "^(\\s*)(!?)~(?![~*])".r

  private val sqlKeywords = Set(
    "select", "where", "and", "or", "not", "when", "then", "else", "end",
    "in", "on", "like", "between", "case", "from", "join", "having",
    "group", "order", "by", "union", "all", "distinct", "as", "is",
    "exists", "returning", "set", "values", "limit", "offset")

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
      else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        // block comment: skip to the closing marker
        i += 2
        while (i < s.length && !(s.charAt(i) == '*' && i + 1 < s.length && s.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, s.length)
      }
      else if (s.startsWith(needle, i) && i >= minPos && i < maxPos) {
        if (!last) return i
        found = i; i += needle.length
      } else i += 1
    }
    found
  }
}
