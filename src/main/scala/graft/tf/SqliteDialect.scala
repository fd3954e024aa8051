package graft.tf

import org.apache.spark.sql.SparkSession

/** SQLite-dialect compatibility rewriter: lets the reference's `sql+sqlite`
  * doc examples (every sqlite block under docs/tables/) run VERBATIM.
  *
  * SQLite is dynamically typed; two of its idioms don't type-check in
  * Spark SQL (ANSI or legacy — probed, not assumed):
  *
  *  1. **Boolean columns queried as integers** — sqlite stores our BOOLEAN
  *     columns as 0/1, so the docs write `sensitive = 1`
  *     (terraform_output.md:40, terraform_variable.md:61). Rewrites the
  *     integer literal to a boolean literal, driven by the published
  *     schemas' declared boolean columns.
  *  2. **Truthiness of `json_extract` in predicate position** — sqlite's
  *     json_extract returns 1/0 for JSON booleans and the bare call is a
  *     valid WHERE conjunct (`and json_extract(attributes_std,
  *     '$.ssl_enforcement_enabled')`, terraform_resource.md:160,183).
  *     Wraps such calls in the `sqlite_truthy` shim (registered in
  *     [[Terraform.registerFunctions]]), which reproduces sqlite's
  *     truthiness: JSON true/false → that value, numeric prefix ≠ 0 →
  *     true, other text → false, NULL → NULL.
  *
  * A call is "in predicate position" iff the token before it is one of
  * `where | and | or | not | (` AND the token after its balanced close is
  * one of `and | or | )` or end-of-statement — so value positions
  * (select list, CASE branches, `is null` operands, comparisons) pass
  * through untouched. Everything else (json_each, `->`/`->>`, which sqlite
  * shares with Postgres) delegates to [[PgDialect.rewrite]].
  */
object SqliteDialect {

  /** spark.sql wrapper applying the sqlite-dialect rewrite. */
  def sql(spark: SparkSession, liteSql: String): org.apache.spark.sql.DataFrame =
    spark.sql(rewrite(liteSql))

  def rewrite(sql: String): String =
    PgDialect.rewrite(rewriteBoolIntCompare(rewriteTruthyJsonExtract(sql)))

  /** Boolean columns across the seven published tables (sqlite stores them
    * as 0/1): `sensitive` (terraform_output, terraform_variable). */
  private val booleanColumns = Seq("sensitive")

  /** `<boolcol> = 1|0` → `<boolcol> = true|false` (code regions only,
    * word-bounded both sides). Handles the qualified form
    * (`t.sensitive = 1` — a leading `.` is an alias qualifier, not a
    * word-boundary violation) and the literal-first form
    * (`1 = sensitive`, `0 = t.sensitive`). */
  private def rewriteBoolIntCompare(sql0: String): String = {
    var s = sql0
    booleanColumns.foreach { col =>
      var from = 0
      var searching = true
      while (searching) {
        val at = PgDialect.findCodeImpl(PgDialect.asciiLower(s), col, last = false, minPos = from)
        if (at < 0) searching = false
        else {
          from = at + col.length
          val bounded =
            (at == 0 || { val c = s.charAt(at - 1); !c.isLetterOrDigit && c != '_' }) &&
            (at + col.length >= s.length || {
              val c = s.charAt(at + col.length); !c.isLetterOrDigit && c != '_'
            })
          if (bounded) {
            // the literal must be a BARE comparison operand, not part of
            // arithmetic: reject when an operator adjoins it (skipping
            // whitespace), e.g. `sensitive = 1 + x` or `n + 1 = sensitive`
            def arithAt(pos: Int, step: Int): Boolean = {
              var m = pos
              while (m >= 0 && m < s.length && s.charAt(m).isWhitespace) m += step
              m >= 0 && m < s.length && "+-*/%|&^~".contains(s.charAt(m))
            }
            // column-first: <col> = 0|1
            var j = at + col.length
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            var rewritten = false
            if (j < s.length && s.charAt(j) == '=' && (j + 1 >= s.length || s.charAt(j + 1) != '=') &&
                (j == 0 || !"<>!".contains(s.charAt(j - 1)))) {
              var k = j + 1
              while (k < s.length && s.charAt(k).isWhitespace) k += 1
              val lit =
                if (s.startsWith("1", k)) Some("true")
                else if (s.startsWith("0", k)) Some("false")
                else None
              val litBounded = lit.isDefined &&
                (k + 1 >= s.length || { val c = s.charAt(k + 1); !c.isLetterOrDigit && c != '.' && c != '_' }) &&
                !arithAt(k + 1, +1)
              if (litBounded) {
                s = s.substring(0, k) + lit.get + s.substring(k + 1)
                from = k + lit.get.length
                rewritten = true
              }
            }
            // literal-first: 0|1 = [alias.]<col>
            if (!rewritten) {
              var k = at - 1
              if (k >= 0 && s.charAt(k) == '.') { // back over the qualifier
                k -= 1
                while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')) k -= 1
              }
              while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
              if (k >= 0 && s.charAt(k) == '=' && (k == 0 || !"<>!=".contains(s.charAt(k - 1)))) {
                var m = k - 1
                while (m >= 0 && s.charAt(m).isWhitespace) m -= 1
                val lit =
                  if (m >= 0 && s.charAt(m) == '1') Some("true")
                  else if (m >= 0 && s.charAt(m) == '0') Some("false")
                  else None
                val litBounded = lit.isDefined &&
                  (m == 0 || { val c = s.charAt(m - 1); !c.isLetterOrDigit && c != '.' && c != '_' }) &&
                  (m + 1 >= s.length || { val c = s.charAt(m + 1); !c.isDigit && c != '.' }) &&
                  !arithAt(m - 1, -1)
                if (litBounded) {
                  s = s.substring(0, m) + lit.get + s.substring(m + 1)
                  from = at + col.length + lit.get.length - 1 // splice was left of `at`
                }
              }
            }
          }
        }
      }
    }
    s
  }

  private val predicateKeywords = Set("where", "and", "or", "not", "when", "having", "on")
  private val afterPredicate = Set("and", "or", ")", ";", "then", "")

  /** Is position `at` a predicate position? Walk left, skipping grouping
    * parens; the first word decides: a predicate keyword → yes, any other
    * word (a function name whose call paren we just crossed — including an
    * already-inserted `sqlite_truthy`) → no, any symbol (`,` `=` …) → no. */
  private def inPredicatePosition(s: String, at: Int): Boolean = {
    var k = at - 1
    while (k >= 0) {
      while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
      if (k < 0) return false
      val c = s.charAt(k)
      if (c == '(') k -= 1
      else if (c.isLetterOrDigit || c == '_') {
        val end = k + 1
        while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')) k -= 1
        return predicateKeywords(s.substring(k + 1, end).toLowerCase)
      } else return false
    }
    false
  }

  /** Wrap predicate-position `json_extract(...)` in `sqlite_truthy(...)`. */
  private def rewriteTruthyJsonExtract(sql0: String): String = {
    val needle = "json_extract"
    var s = sql0
    var from = 0
    var searching = true
    while (searching) {
      val at = PgDialect.findCodeImpl(PgDialect.asciiLower(s), needle, last = false, minPos = from)
      if (at < 0) searching = false
      else {
        from = at + needle.length
        val bounded =
          (at == 0 || { val c = s.charAt(at - 1); !c.isLetterOrDigit && c != '_' }) &&
          (at + needle.length >= s.length || {
            val c = s.charAt(at + needle.length); !c.isLetterOrDigit && c != '_'
          })
        if (bounded && inPredicatePosition(s, at)) {
          // balanced-paren extent of the call
          var j = at + needle.length
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          if (j < s.length && s.charAt(j) == '(') {
            var depth = 0
            var k = j
            var done = false
            while (k < s.length && !done) {
              val c = s.charAt(k)
              if (c == '\'') { k += 1; while (k < s.length && s.charAt(k) != '\'') k += 1 }
              else if (c == '(') depth += 1
              else if (c == ')') { depth -= 1; if (depth == 0) done = true }
              k += 1
            }
            if (done && afterPredicate(tokenAfter(s, k))) {
              s = s.substring(0, at) + "sqlite_truthy(" + s.substring(at, k) + ")" + s.substring(k)
              from = k + "sqlite_truthy()".length
            }
          }
        }
      }
    }
    s
  }

  /** Word or symbol token immediately after position `k` (lowercased;
    * "" for end-of-statement). */
  private def tokenAfter(s: String, k0: Int): String = {
    var k = k0
    while (k < s.length && s.charAt(k).isWhitespace) k += 1
    if (k >= s.length) ""
    else if (!s.charAt(k).isLetterOrDigit && s.charAt(k) != '_') s.charAt(k).toString
    else {
      val start = k
      while (k < s.length && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')) k += 1
      s.substring(start, k).toLowerCase
    }
  }
}
