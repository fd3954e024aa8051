package graft.tf

import scala.collection.mutable

/** Hand-written recursive-descent parser for the HCL2 subset the reference
  * engine recognizes (see /root/reference/terraform/utils.go:316-358 for the
  * block schema; the reference delegates parsing to the kics Terraform
  * parser, whose observable output we reproduce):
  *
  *   - top-level blocks `type "label1" "label2" { body }`,
  *   - attributes `name = <expr>`,
  *   - nested blocks (single occurrence → JSON object, repeated → array),
  *   - literal values (strings/numbers/bools/null/arrays/objects) become
  *     native JSON values; any other expression is rendered opaque as a
  *     `"${<source text>}"` template string (kics never evaluates HCL —
  *     e.g. `type = string` arrives as `"${string}"`, unwrapped later by
  *     the variable table per table_terraform_variable.go:245-252),
  *   - template strings keep their interpolations verbatim,
  *   - heredocs; hash, double-slash, and block comments.
  *
  * The parser is a pure function of the file content — thread-safe by
  * construction, so Spark executors parse files concurrently (the reference
  * serializes all parsing behind a global mutex, utils.go:35-36; we do not).
  *
  * Spans: every top-level block records its 1-based start/end line and raw
  * source slice, reproducing `getBlock` (utils.go:268-298). Label matching
  * there is case-insensitive; `firstBlock` below mirrors that plus the
  * "first match wins" behavior that gives every local the span of the first
  * `locals` block (utils.go:275-295).
  */
final case class HclBlock(
    blockType: String,
    labels: Vector[String],
    body: JObj,
    startLine: Int,
    endLine: Int,
    source: String)

final case class HclDoc(doc: JObj, blocks: Vector[HclBlock]) {
  /** getBlock emulation (isBlockMatch, utils.go:300-314): first block whose
    * type matches case-insensitively AND whose label count EQUALS the
    * request's, labels compared case-insensitively. The locals path passes
    * an empty request, which therefore matches the first label-less
    * `locals` block — the A13 quirk. */
  def firstBlock(blockType: String, labels: Seq[String]): Option[HclBlock] =
    blocks.find { b =>
      b.blockType.equalsIgnoreCase(blockType) &&
      b.labels.length == labels.length &&
      labels.zip(b.labels).forall { case (want, got) => want.equalsIgnoreCase(got) }
    }
}

object Hcl {

  def parse(content: String): HclDoc = {
    val p = new P(content)
    val lines = content.split("\n", -1)
    val blocks = Vector.newBuilder[HclBlock]
    val top = mutable.LinkedHashMap[String, JValue]()
    p.skipTrivia()
    while (!p.eof) {
      val startLine = p.line
      val blockType = p.ident()
      val labels = Vector.newBuilder[String]
      p.skipHeaderTrivia()
      while (!p.eof && p.peek != '{') {
        if (p.peek == '"') labels += p.quotedString()._1
        else labels += p.ident()
        p.skipHeaderTrivia()
      }
      p.expect('{')
      val body = parseBody(p)
      val endLine = p.line
      p.expect('}')
      val src = lines.slice(startLine - 1, endLine).mkString("\n")
      blocks += HclBlock(blockType, labels.result(), body, startLine, endLine, src)
      insertChain(top, blockType :: labels.result().toList, body)
      p.skipTrivia()
    }
    HclDoc(JObj(top.toVector), blocks.result())
  }

  /** Merge a block body into the document at its type+labels chain.
    * Mid-chain levels merge as maps (resource type → name); a collision at
    * the leaf becomes an array — the shape the reference's table code
    * switches on for duplicate providers and repeated `locals` blocks
    * (table_terraform_provider.go:119-145, table_terraform_local.go:99-136).
    */
  private def insertChain(root: mutable.LinkedHashMap[String, JValue], chain: List[String], body: JObj): Unit = {
    def toMap(o: JObj): mutable.LinkedHashMap[String, JValue] = {
      val m = mutable.LinkedHashMap[String, JValue]()
      o.fields.foreach { case (k, v) => m(k) = v }
      m
    }
    chain match {
      case key :: Nil =>
        root.get(key) match {
          case None              => root(key) = body
          case Some(JArr(items)) => root(key) = JArr(items :+ body)
          case Some(prev)        => root(key) = JArr(Vector(prev, body))
        }
      case key :: rest =>
        root.get(key) match {
          case Some(o: JObj) =>
            val child = toMap(o)
            insertChain(child, rest, body)
            root(key) = JObj(child.toVector)
          case None =>
            val child = mutable.LinkedHashMap[String, JValue]()
            insertChain(child, rest, body)
            root(key) = JObj(child.toVector)
          case Some(other) =>
            // mixed-arity collision (`foo {}` then `foo "bar" {}` — invalid
            // Terraform, but accepted input must degrade gracefully): keep
            // the earlier value(s) alongside the new subtree instead of
            // silently dropping them
            val child = mutable.LinkedHashMap[String, JValue]()
            insertChain(child, rest, body)
            val merged = JObj(child.toVector)
            root(key) = other match {
              case JArr(items) => JArr(items :+ merged)
              case prev        => JArr(Vector(prev, merged))
            }
        }
      case Nil => // unreachable: chain always starts with blockType
    }
  }

  /** Body = attributes + nested blocks until the closing '}'. */
  private def parseBody(p: P): JObj = {
    val fields = mutable.LinkedHashMap[String, JValue]()
    p.skipTrivia()
    while (!p.eof && p.peek != '}') {
      val key = if (p.peek == '"') p.quotedString()._1 else p.ident()
      p.skipInline()
      if (!p.eof && p.peek == '=') {
        p.advance() // '='
        p.skipInline()
        if (!p.eof && p.peek == '<' && p.peekAt(1) == '<') fields(key) = JStr(p.heredoc())
        else fields(key) = literalOrOpaque(p.scanExprRaw())
      } else {
        // nested block, possibly labeled
        val labels = Vector.newBuilder[String]
        p.skipHeaderTrivia()
        while (!p.eof && p.peek != '{') {
          if (p.peek == '"') labels += p.quotedString()._1 else labels += p.ident()
          p.skipHeaderTrivia()
        }
        p.expect('{')
        val body = parseBody(p)
        p.expect('}')
        insertChain(fields, key :: labels.result().toList, body)
      }
      p.skipTrivia()
    }
    JObj(fields.toVector)
  }

  /** Literal if the whole snippet parses as one; else `"${snippet}"`. */
  def literalOrOpaque(raw: String): JValue = {
    val t = raw.trim
    if (t.isEmpty) JStr("")
    else parseLiteral(t).getOrElse(JStr("${" + t + "}"))
  }

  /** Strict literal parse over a snippet; None unless fully consumed. */
  def parseLiteral(t: String): Option[JValue] = {
    val p = new P(t)
    try {
      val v = p.literalValue()
      p.skipTrivia()
      if (p.eof) Some(v) else None
    } catch { case _: HclParseError => None }
  }

  private[tf] final class HclParseError(msg: String) extends RuntimeException(msg)

  private val NumberRe = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$".r

  /** Char-cursor parser with 1-based line tracking. */
  private[tf] final class P(val s: String) {
    var i = 0
    var line = 1
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def peekAt(k: Int): Char = if (i + k < s.length) s.charAt(i + k) else ' '
    def advance(): Char = { val c = s.charAt(i); if (c == '\n') line += 1; i += 1; c }
    def expect(c: Char): Unit = {
      skipTrivia()
      if (eof || peek != c) fail(s"expected '$c' at line $line" + (if (eof) " (eof)" else s", got '$peek'"))
      advance()
    }
    def fail(msg: String): Nothing = throw new HclParseError(msg)

    /** whitespace incl newlines + comments */
    def skipTrivia(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n') advance()
        else if (c == '#' || (c == '/' && peekAt(1) == '/')) { while (!eof && peek != '\n') advance() }
        else if (c == '/' && peekAt(1) == '*') {
          advance(); advance()
          while (!eof && !(peek == '*' && peekAt(1) == '/')) advance()
          if (!eof) { advance(); advance() }
        } else go = false
      }
    }

    /** whitespace NOT crossing newlines (attribute scanning) */
    def skipInline(): Unit =
      while (!eof && (peek == ' ' || peek == '\t' || peek == '\r')) advance()

    /** Block-header trivia: inline whitespace plus slash-star block
      * comments between labels and '{' (hclsyntax accepts an inline block
      * comment after the last label). Line comments are NOT skipped —
      * they would push '{' to another line, which HCL rejects. */
    def skipHeaderTrivia(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (c == ' ' || c == '\t' || c == '\r') advance()
        else if (c == '/' && peekAt(1) == '*') {
          advance(); advance()
          while (!eof && !(peek == '*' && peekAt(1) == '/')) advance()
          if (!eof) { advance(); advance() }
        } else go = false
      }
    }

    def ident(): String = {
      skipTrivia()
      val start = i
      while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-' || peek == '.')) advance()
      if (i == start) fail(s"expected identifier at line $line" + (if (eof) " (eof)" else s", got '$peek'"))
      s.substring(start, i)
    }

    /** Parse a quoted string; returns (cooked value with interpolations kept
      * verbatim, hadInterpolation). Escapes: \" \\ \n \r \t \uXXXX; `$${`
      * and `%%{` are escaped template intros. */
    def quotedString(): (String, Boolean) = {
      expect('"')
      val sb = new StringBuilder
      var interp = false
      var done = false
      while (!done) {
        if (eof) fail(s"unterminated string at line $line")
        val c = advance()
        c match {
          case '"' => done = true
          case '\\' =>
            if (eof) fail("dangling escape")
            val e = advance()
            e match {
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case 'u' =>
                val hex = s.substring(i, math.min(i + 4, s.length))
                if (hex.length < 4 || !hex.forall(ch => Character.digit(ch, 16) >= 0))
                  fail(s"invalid \\u escape at line $line") // HclParseError, not NumberFormatException
                (0 until 4).foreach(_ => advance())
                sb.append(Integer.parseInt(hex, 16).toChar)
              case other => sb.append('\\').append(other)
            }
          case '$' if !eof && peek == '$' && peekAt(1) == '{' =>
            advance(); sb.append("${") ; advance() // escaped literal "${"
          case '%' if !eof && peek == '%' && peekAt(1) == '{' =>
            advance(); sb.append("%{") ; advance() // escaped directive intro
          case '$' if !eof && peek == '{' =>
            interp = true
            sb.append('$')
            sb.append(advance()) // '{'
            var depth = 1
            while (depth > 0) {
              if (eof) fail(s"unterminated interpolation at line $line")
              val c2 = advance()
              sb.append(c2)
              if (c2 == '"') {
                // nested quoted string inside the interpolation (function
                // arguments): copied opaquely — a brace literal in it must
                // not move the interpolation depth
                var strDone = false
                while (!strDone) {
                  if (eof) fail(s"unterminated string at line $line")
                  val c3 = advance()
                  sb.append(c3)
                  if (c3 == '\\') { if (!eof) sb.append(advance()) }
                  else if (c3 == '"') strDone = true
                }
              }
              else if (c2 == '{') depth += 1
              else if (c2 == '}') depth -= 1
            }
          case other => sb.append(other)
        }
      }
      (sb.toString, interp)
    }

    /** Heredoc: cursor sits on "<<". Returns content (trailing newline kept,
      * `<<-` dedents by the closing marker's indentation like HCL). */
    def heredoc(): String = {
      advance(); advance() // <<
      val dedent = if (!eof && peek == '-') { advance(); true } else false
      val tagStart = i
      while (!eof && peek != '\n' && peek != '\r') advance()
      val tag = s.substring(tagStart, i).trim
      while (!eof && peek != '\n') advance()
      if (!eof) advance() // consume newline
      val lines = Vector.newBuilder[String]
      var done = false
      while (!done) {
        val lineStart = i
        while (!eof && peek != '\n') advance()
        val ln = s.substring(lineStart, i)
        if (!eof) advance()
        if (ln.trim == tag) done = true
        else if (eof) { lines += ln; done = true }
        else lines += ln
      }
      var out = lines.result()
      if (dedent) {
        val indents = out.filter(_.trim.nonEmpty).map(_.takeWhile(c => c == ' ' || c == '\t').length)
        val cut = if (indents.isEmpty) 0 else indents.min
        out = out.map(l => l.drop(math.min(cut, l.takeWhile(c => c == ' ' || c == '\t').length)))
      }
      // empty heredoc (terminator on the first line) is "", not "\n"
      if (out.isEmpty) "" else out.mkString("", "\n", "\n")
    }

    /** Capture one attribute expression's raw source: scan until a newline,
      * '}' , ',' or comment at bracket depth 0. Strings/heredocs/comments
      * are skipped opaquely; newlines inside brackets are fine. */
    def scanExprRaw(): String = {
      skipInline()
      val start = i
      var depth = 0
      var done = false
      while (!done && !eof) {
        val c = peek
        if (c == '"') { quotedString(); () }
        else if (c == '<' && peekAt(1) == '<') { heredoc(); () }
        else if (c == '#' || (c == '/' && peekAt(1) == '/')) {
          if (depth == 0) done = true
          else while (!eof && peek != '\n') advance()
        }
        else if (c == '/' && peekAt(1) == '*') {
          advance(); advance()
          while (!eof && !(peek == '*' && peekAt(1) == '/')) advance()
          if (!eof) { advance(); advance() }
        }
        else if (c == '(' || c == '[' || c == '{') { depth += 1; advance() }
        else if (c == ')' || c == ']') { depth -= 1; advance() }
        else if (c == '}') { if (depth == 0) done = true else { depth -= 1; advance() } }
        else if (c == '\n') { if (depth == 0) done = true else advance() }
        else if (c == ',' && depth == 0) done = true
        else advance()
      }
      s.substring(start, i)
    }

    /** Strict literal: string (template interpolations allowed — kics keeps
      * them verbatim in the cooked string), number, bool, null, array,
      * object. Fails (→ opaque) on anything else. */
    def literalValue(): JValue = {
      skipTrivia()
      if (eof) fail("empty")
      val c = peek
      if (c == '"') { JStr(quotedString()._1) }
      else if (c == '[') {
        advance()
        val items = Vector.newBuilder[JValue]
        skipTrivia()
        while (!eof && peek != ']') {
          val raw = scanElementRaw(']')
          if (raw.trim.nonEmpty) items += Hcl.literalOrOpaque(raw)
          skipTrivia()
          if (!eof && peek == ',') { advance(); skipTrivia() }
        }
        expect(']')
        JArr(items.result())
      }
      else if (c == '{') {
        advance()
        val fields = mutable.LinkedHashMap[String, JValue]()
        skipTrivia()
        while (!eof && peek != '}') {
          val key = if (peek == '"') quotedString()._1 else ident()
          skipTrivia()
          if (eof || (peek != '=' && peek != ':')) fail(s"expected '=' in object at line $line")
          advance()
          skipInline()
          val raw = scanElementRaw('}')
          fields(key) = Hcl.literalOrOpaque(raw)
          skipTrivia()
          if (!eof && peek == ',') { advance(); skipTrivia() }
        }
        expect('}')
        JObj(fields.toVector)
      }
      else {
        val start = i
        while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '.' || peek == '-' || peek == '+')) advance()
        val word = s.substring(start, i)
        word match {
          case "true"  => JBool(true)
          case "false" => JBool(false)
          case "null"  => JNull
          case w if NumberRe.matches(w) => JNum(w)
          case _ => fail(s"not a literal: '$word'")
        }
      }
    }

    /** Element capture inside []/{} — stops at ',' or the closing char at
      * depth 0. Inside an OBJECT a depth-0 newline also terminates the
      * element: HCL2 object constructors accept newline separators (the
      * standard multi-line `tags` map), while tuple elements require
      * commas, so array capture lets newlines ride. */
    private def scanElementRaw(close: Char): String = {
      val start = i
      var depth = 0
      var done = false
      while (!done && !eof) {
        val c = peek
        if (c == '"') { quotedString(); () }
        else if (c == '<' && peekAt(1) == '<') { heredoc(); () }
        else if (c == '#' || (c == '/' && peekAt(1) == '/')) { while (!eof && peek != '\n') advance() }
        else if (c == '/' && peekAt(1) == '*') {
          advance(); advance()
          while (!eof && !(peek == '*' && peekAt(1) == '/')) advance()
          if (!eof) { advance(); advance() }
        }
        else if (c == '(' || c == '[' || c == '{') { depth += 1; advance() }
        else if (c == ')') { depth -= 1; advance() }
        else if (c == ']' || c == '}') {
          if (depth == 0 && c == close) done = true
          else if (depth == 0 && c != close) advance() // tolerate; literal parse will fail
          else { depth -= 1; advance() }
        }
        else if (c == ',' && depth == 0) done = true
        else if (c == '\n' && depth == 0 && close == '}') done = true
        else advance()
      }
      s.substring(start, i)
    }
  }
}
