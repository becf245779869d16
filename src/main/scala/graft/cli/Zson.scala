package graft.cli

/** ZSON-lite reader: transpiles the subset of the reference's native text
  * format that its demo/test fixtures actually use into JSON lines
  * (cmd/zync/produce/command.go:72-81 reads "any Zed format"; our `produce`
  * feeds the result through the Spark JSON reader).
  *
  * Handled (all present in the demo ZSON fixtures): unquoted field names, trailing
  * commas, `//` comments, multi-line concatenated top-level records, nested
  * records/arrays, string escapes, and record type decorators — `{…}(=name)`
  * becomes a `_type: "name"` field (the Spark rendering of a named type,
  * same discriminator-column idea as the envelope `_kind`). Primitive
  * decorators (`1(uint32)`) are consumed and dropped — the JSON reader
  * re-infers. NOT handled (absent from the fixtures): block comments and
  * sets/maps/unions/bytes literals — those raise a clear error rather than
  * mis-parsing.
  */
object Zson {

  /** ZSON serializer — the inverse of [[toJsonLines]] on its subset, used by
    * `consume -f zson` (the reference writes any Zed output format,
    * cmd/zync/consume/command.go:71-107; ZSON is its terminal default).
    * Field names are emitted unquoted when identifier-safe, strings quoted,
    * numbers/booleans/null bare, and a record's string `_type` field (at any
    * depth) becomes a trailing `(=name)` type decorator, exactly undoing the
    * parser's decorator injection.
    */
  def fromJsonLine(json: String): String = renderZson(mapper.readTree(json))

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  private val BareName = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Shared with [[Tabular]]: may this field name print unquoted? */
  private[cli] def isBareName(name: String): Boolean = name match {
    case BareName() => true
    case _          => false
  }

  private def renderZson(n: com.fasterxml.jackson.databind.JsonNode): String = {
    if (n.isNull) "null"
    else if (n.isTextual) quoteJson(n.asText)
    else if (n.isNumber || n.isBoolean) n.asText
    else if (n.isArray)
      (0 until n.size).map(i => renderZson(n.get(i))).mkString("[", ",", "]")
    else if (n.isObject) {
      val names = {
        val it = n.fieldNames()
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) buf += it.next()
        buf.toSeq
      }
      val decorator = names.collectFirst {
        case "_type" if n.get("_type").isTextual => n.get("_type").asText
      }
      val body = names.filterNot(name => decorator.isDefined && name == "_type")
        .map { name =>
          val key = name match {
            case BareName() => name
            case other      => quoteJson(other)
          }
          s"$key:${renderZson(n.get(name))}"
        }
        .mkString("{", ",", "}")
      decorator.fold(body)(d => s"$body(=$d)")
    } else
      throw new IllegalArgumentException(s"cannot render ${n.getNodeType} as ZSON")
  }

  private def quoteJson(v: String): String = graft.codec.MiniJson.quote(v)

  def toJsonLines(text: String): Seq[String] = {
    val p = new Parser(text)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    p.skipWs()
    while (!p.eof) {
      out += p.topLevel()
      p.skipWs()
    }
    out.toSeq
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length

    def skipWs(): Unit = {
      while (i < s.length) {
        val c = s.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else return
      }
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"ZSON parse error at offset $i (…${s.slice(i, (i + 24).min(s.length))}…): $msg")

    private def expect(c: Char): Unit = {
      if (eof || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    /** One top-level value → JSON text. */
    def topLevel(): String = value()

    /** A value plus any trailing decorators (decorators bind to values at
      * ANY depth in ZSON): `(=name)` on a record injects the named type as
      * a `_type` discriminator field — unless the record already carries a
      * top-level `_type` (either declared or from an earlier decorator):
      * injecting twice would emit duplicate JSON keys and Jackson keeps the
      * LAST one, silently dropping the decorator. Primitive cast decorators
      * are dropped (the JSON reader re-infers).
      */
    private def value(): String = {
      var v = rawValue()
      skipWs()
      while (!eof && s.charAt(i) == '(') {
        decorator() match {
          case Some(name) if v.startsWith("{") && !hasTopLevelType(v) =>
            v = if (v == "{}") s"""{"_type":${quote(name)}}"""
            else s"""{"_type":${quote(name)},${v.drop(1)}"""
          case _ => ()
        }
        skipWs()
      }
      v
    }

    /** Does the generated compact JSON record have a TOP-LEVEL `_type` key?
      * (Scans at brace depth 1, skipping strings — the text is our own
      * well-formed output, so this is a simple state walk.)
      */
    private def hasTopLevelType(json: String): Boolean = {
      var depth = 0; var k = 0
      while (k < json.length) {
        json.charAt(k) match {
          case '{' | '[' => depth += 1
          case '}' | ']' => depth -= 1
          case '"' =>
            val start = k
            k += 1
            while (k < json.length && json.charAt(k) != '"') {
              if (json.charAt(k) == '\\') k += 1
              k += 1
            }
            if (depth == 1 && json.substring(start, k + 1) == "\"_type\"" &&
              k + 1 < json.length && json.charAt(k + 1) == ':') return true
          case _ => ()
        }
        k += 1
      }
      false
    }

    /** `( = name )` → Some(name); `( typename )` → None (consumed). */
    private def decorator(): Option[String] = {
      expect('(')
      skipWs()
      val named = !eof && s.charAt(i) == '='
      if (named) { i += 1; skipWs() }
      val start = i
      while (!eof && s.charAt(i) != ')') i += 1
      val body = s.substring(start, i).trim
      expect(')')
      if (named) Some(body) else None
    }

    private def rawValue(): String = {
      skipWs()
      if (eof) fail("expected a value")
      s.charAt(i) match {
        case '{' => record()
        case '[' => array()
        case '"' => string()
        case '|' => fail("ZSON set/map literals are not supported by this reader")
        case _ => primitive()
      }
    }

    private def record(): String = {
      expect('{')
      val b = new StringBuilder("{")
      skipWs()
      var first = true
      while (!eof && s.charAt(i) != '}') {
        if (!first) b.append(',')
        first = false
        b.append(fieldName()).append(':')
        skipWs(); expect(':')
        b.append(value())
        skipWs()
        if (!eof && s.charAt(i) == ',') { i += 1; skipWs() } // incl. trailing comma
      }
      expect('}')
      b.append('}').toString
    }

    private def array(): String = {
      expect('[')
      val b = new StringBuilder("[")
      skipWs()
      var first = true
      while (!eof && s.charAt(i) != ']') {
        if (!first) b.append(',')
        first = false
        b.append(value())
        skipWs()
        if (!eof && s.charAt(i) == ',') { i += 1; skipWs() }
      }
      expect(']')
      b.append(']').toString
    }

    private def fieldName(): String = {
      skipWs()
      if (s.charAt(i) == '"') string()
      else {
        val start = i
        while (!eof && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        if (i == start) fail("expected a field name")
        quote(s.substring(start, i))
      }
    }

    /** Copies a quoted string verbatim (escapes are JSON-compatible). */
    private def string(): String = {
      val start = i
      expect('"')
      while (!eof && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        i += 1
      }
      expect('"')
      s.substring(start, i)
    }

    /** Bare token: number/true/false/null pass through; anything else (bare
      * enums, timestamps) is quoted as a string. A `//` glued to the token
      * ends it (comment), and `0x…` bytes literals raise rather than
      * silently decoding as strings.
      */
    private def primitive(): String = {
      val start = i
      while (!eof && !",}])(".contains(s.charAt(i)) && !s.charAt(i).isWhitespace
          && !(s.charAt(i) == '/' && i + 1 < s.length && s.charAt(i + 1) == '/')) i += 1
      val tok = s.substring(start, i)
      if (tok.isEmpty) fail("expected a value")
      if (tok.startsWith("0x") || tok.startsWith("0X"))
        fail("ZSON bytes literals are not supported by this reader")
      if (tok == "true" || tok == "false" || tok == "null") tok
      else if (tok.matches("-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?")) tok
      else quote(tok)
    }

    private def quote(v: String): String = graft.codec.MiniJson.quote(v)
  }
}
