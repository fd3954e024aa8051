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
      // last-wins for duplicate keys, then sort — mirrors a Go map marshal
      val dedup = mutable.LinkedHashMap[String, JValue]()
      o.fields.foreach { case (k, v2) => dedup(k) = v2 }
      dedup.toSeq.sortBy(_._1).foreach { case (k, v2) =>
        if (!first) sb.append(','); first = false
        writeString(k, sb); sb.append(':'); write(v2, sb)
      }
      sb.append('}')
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
        case c2 if c2 < ' ' => sb.append(f"\\u${c2.toInt}%04x")
        case c2   => sb.append(c2)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Parse a full JSON document. Throws on malformed input. */
  def parse(text: String): JValue = {
    val p = factory.createParser(text)
    try { p.nextToken(); readValue(p) } finally p.close()
  }

  def parseOpt(text: String): Option[JValue] =
    try Some(parse(text)) catch { case _: Exception => None }

  /** Parse, attaching the source line span (1-based, inclusive) of every
    * object/array element encountered at `spanDepthKeys` — used for
    * plan/state source-span recovery (SURVEY §2A A14). Returns the tree
    * plus a map from JValue identity to (startLine, endLine).
    */
  def parseWithSpans(text: String): (JValue, java.util.IdentityHashMap[JValue, (Int, Int)]) = {
    val spans = new java.util.IdentityHashMap[JValue, (Int, Int)]()
    val p = factory.createParser(text)
    def read(): JValue = {
      val tok = p.currentToken()
      val startLine = p.currentTokenLocation().getLineNr
      val v: JValue = tok match {
        case JsonToken.START_OBJECT =>
          val buf = Vector.newBuilder[(String, JValue)]
          while (p.nextToken() != JsonToken.END_OBJECT) {
            val name = p.currentName()
            p.nextToken()
            buf += ((name, read()))
          }
          JObj(buf.result())
        case JsonToken.START_ARRAY =>
          val buf = Vector.newBuilder[JValue]
          while (p.nextToken() != JsonToken.END_ARRAY) buf += read()
          JArr(buf.result())
        case JsonToken.VALUE_STRING => JStr(p.getText)
        case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => JNum(p.getText)
        case JsonToken.VALUE_TRUE  => JBool(true)
        case JsonToken.VALUE_FALSE => JBool(false)
        case JsonToken.VALUE_NULL  => JNull
        case other => throw new IllegalArgumentException(s"unexpected token $other")
      }
      val endLine = p.currentLocation().getLineNr
      v match {
        case _: JObj | _: JArr => spans.put(v, (startLine, endLine))
        case _ =>
      }
      v
    }
    try { p.nextToken(); val v = read(); (v, spans) } finally p.close()
  }

  private def readValue(p: JsonParser): JValue = p.currentToken() match {
    case JsonToken.START_OBJECT =>
      val buf = Vector.newBuilder[(String, JValue)]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        buf += ((name, readValue(p)))
      }
      JObj(buf.result())
    case JsonToken.START_ARRAY =>
      val buf = Vector.newBuilder[JValue]
      while (p.nextToken() != JsonToken.END_ARRAY) buf += readValue(p)
      JArr(buf.result())
    case JsonToken.VALUE_STRING => JStr(p.getText)
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => JNum(p.getText)
    case JsonToken.VALUE_TRUE  => JBool(true)
    case JsonToken.VALUE_FALSE => JBool(false)
    case JsonToken.VALUE_NULL  => JNull
    case other => throw new IllegalArgumentException(s"unexpected token $other")
  }
}
