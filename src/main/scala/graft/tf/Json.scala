package graft.tf

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import scala.collection.mutable

/** Minimal JSON value tree + canonical serializer.
  *
  * Canonical form matches Go's `encoding/json.Marshal` (the serializer the
  * reference relies on for all JSON-typed columns — see
  * /root/reference/terraform/utils.go:210-251 `convertExpressionValue`):
  *   - compact (no spaces),
  *   - object keys sorted lexicographically (Go marshals maps sorted),
  *   - `<`, `>`, `&` escaped as </>/& (Go HTML-escapes by
  *     default),
  *   - numbers keep their source lexeme (Go json.Number / cty round-trip).
  *
  * Parsing uses Jackson (ships with Spark) in streaming-token mode so we
  * keep raw number lexemes and source line spans; thread-safe (a
  * JsonFactory is immutable/shareable, parsers are per-call).
  */
sealed trait JValue {
  def render: String = { val sb = new StringBuilder; Json.write(this, sb); sb.toString }
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
/** raw = source lexeme, e.g. "2", "3.14", "1e9" */
final case class JNum(raw: String) extends JValue
final case class JStr(value: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
/** Insertion-ordered; `render` sorts keys. Duplicate keys kept last-wins on
  * lookup but all retained for diagnostics. */
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  def get(key: String): Option[JValue] = fields.reverseIterator.collectFirst { case (k, v) if k == key => v }
  def keys: Vector[String] = fields.map(_._1)
  def without(drop: Set[String]): JObj = JObj(fields.filterNot { case (k, _) => drop(k) })
  def isEmpty: Boolean = fields.isEmpty
}

object Json {
  private val factory = new JsonFactory()

  def write(v: JValue, sb: StringBuilder): Unit = v match {
    case JNull       => sb.append("null")
    case JBool(b)    => sb.append(if (b) "true" else "false")
    case JNum(raw)   => sb.append(raw)
    case JStr(s)     => writeString(s, sb)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it => if (!first) sb.append(','); first = false; write(it, sb) }
      sb.append(']')
    case o: JObj =>
      sb.append('{')
      var first = true
      // last-wins for duplicate keys, then sort — mirrors a Go map marshal.
      // Sort order is CODE POINTS (= UTF-8 byte order, Go's sort.Strings
      // on the marshaled keys); Java's compareTo orders by UTF-16 code
      // unit, which differs once supplementary-plane keys appear.
      val dedup = mutable.LinkedHashMap[String, JValue]()
      o.fields.foreach { case (k, v2) => dedup(k) = v2 }
      dedup.toSeq.sortBy(_._1)(codePointOrdering).foreach { case (k, v2) =>
        if (!first) sb.append(','); first = false
        writeString(k, sb); sb.append(':'); write(v2, sb)
      }
      sb.append('}')
  }

  private val codePointOrdering: Ordering[String] = (a: String, b: String) => {
    val n = math.min(a.length, b.length)
    var i = 0
    var res = 0
    while (res == 0 && i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) res = Integer.compare(ca, cb)
      else i += Character.charCount(ca)
    }
    if (res != 0) res else Integer.compare(a.length, b.length)
  }

  def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '<'  => sb.append("\\u003c")
        case '>'  => sb.append("\\u003e")
        case '&'  => sb.append("\\u0026")
        // Go escapes the JS line separators U+2028/U+2029 unconditionally
        // (numeric compare: a source literal would pre-process as a line break)
        case c2 if c2.toInt == 0x2028 => sb.append("\\u2028")
        case c2 if c2.toInt == 0x2029 => sb.append("\\u2029")
        case c2 if c2 < ' ' => sb.append(f"\\u${c2.toInt}%04x")
        case c2 if Character.isHighSurrogate(c2) =>
          // valid pair passes through; a LONE surrogate is invalid UTF-8
          // on encode — Go emits the � replacement escape
          if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) {
            sb.append(c2).append(s.charAt(i + 1)); i += 1
          } else sb.append("\\ufffd")
        case c2 if Character.isLowSurrogate(c2) => sb.append("\\ufffd")
        case c2   => sb.append(c2)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Parse a full JSON document. Throws on malformed input, INCLUDING
    * trailing content after the first value — Go's json.Unmarshal parity
    * (the plan sniff must reject `{…}garbage` exactly as the reference
    * does, else the file mis-routes to the plan branch). */
  def parse(text: String): JValue = {
    val p = factory.createParser(text)
    try { p.nextToken(); val v = readValue(p, null); requireEof(p); v }
    finally p.close()
  }

  def parseOpt(text: String): Option[JValue] =
    try Some(parse(text)) catch { case _: Exception => None }

  /** Parse, attaching the source line span (1-based, inclusive) of every
    * object/array — used for plan/state source-span recovery (SURVEY §2A
    * A14). Returns the tree plus a map from JValue identity to
    * (startLine, endLine). Same grammar as [[parse]] (shared reader). */
  def parseWithSpans(text: String): (JValue, java.util.IdentityHashMap[JValue, (Int, Int)]) = {
    val spans = new java.util.IdentityHashMap[JValue, (Int, Int)]()
    val p = factory.createParser(text)
    try { p.nextToken(); val v = readValue(p, spans); requireEof(p); (v, spans) }
    finally p.close()
  }

  private def requireEof(p: JsonParser): Unit =
    if (p.nextToken() != null)
      throw new IllegalArgumentException("trailing content after JSON value")

  /** The one token-dispatch reader behind both parse paths; a non-null
    * `spans` map records every object/array's 1-based line span. */
  private def readValue(p: JsonParser,
      spans: java.util.IdentityHashMap[JValue, (Int, Int)]): JValue = {
    val startLine = if (spans != null) p.currentTokenLocation().getLineNr else 0
    val v: JValue = p.currentToken() match {
      case JsonToken.START_OBJECT =>
        val buf = Vector.newBuilder[(String, JValue)]
        while (p.nextToken() != JsonToken.END_OBJECT) {
          val name = p.currentName()
          p.nextToken()
          buf += ((name, readValue(p, spans)))
        }
        JObj(buf.result())
      case JsonToken.START_ARRAY =>
        val buf = Vector.newBuilder[JValue]
        while (p.nextToken() != JsonToken.END_ARRAY) buf += readValue(p, spans)
        JArr(buf.result())
      case JsonToken.VALUE_STRING => JStr(p.getText)
      case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => JNum(p.getText)
      case JsonToken.VALUE_TRUE  => JBool(true)
      case JsonToken.VALUE_FALSE => JBool(false)
      case JsonToken.VALUE_NULL  => JNull
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }
    if (spans != null) v match {
      case _: JObj | _: JArr => spans.put(v, (startLine, p.currentLocation().getLineNr))
      case _ =>
    }
    v
  }
}
