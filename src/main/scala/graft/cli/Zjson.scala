package graft.cli

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeType

/** ZJSON — Zed's publicly specified JSON interchange format — as a consume/
  * produce format next to json/zson/zng (the reference's `consume` writes
  * any Zed format via its io layer, cmd/zync/consume/command.go:71-107;
  * zjson is one of the formats that layer registers).
  *
  * Stream shape (one JSON object per line):
  * {{{ {"type": <type>, "value": <encoding>} }}}
  *
  * Types are trees of `{"kind": …}` objects. Complex types (record, array,
  * named) carry an `"id"` on first definition and are referenced by
  * `{"kind":"ref","id":N}` afterwards — the stream's type context. Values
  * encode per the spec: records as arrays of field encodings (in field
  * order), arrays as arrays, primitives as their text form in a JSON
  * string, nulls as null.
  *
  * Bridges to the engine's JSON-lines interchange with the same conventions
  * as [[Zson]]: a record's string `_type` field (the Spark rendering of a
  * Zed named type) becomes a `named` type wrapper on encode and is
  * re-injected on decode; JSON numbers map to int64/float64. The subset is
  * what the engine's pools can hold (records/arrays/primitives); set, map,
  * union, enum and error types raise a clear error rather than mis-parsing
  * — the same contract as the ZSON-lite reader.
  */
object Zjson {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  // ---- encode: JSON record lines → zjson lines -----------------------------

  /** Encode a stream of JSON record lines as zjson lines. Stateful across
    * the stream (the type context), hence lines-in/lines-out rather than a
    * per-line function.
    */
  def fromJsonLines(lines: Seq[String]): Seq[String] = {
    val ctx = new EncodeContext
    lines.map { line =>
      val n = mapper.readTree(line)
      if (!n.isObject)
        throw new IllegalArgumentException(s"zjson: top-level value must be a record, got $line")
      val (t, v) = ctx.encode(n)
      s"""{"type":$t,"value":$v}"""
    }
  }

  private final class EncodeContext {
    private var nextId = 1
    // canonical (id-free) type text → assigned id
    private val ids = scala.collection.mutable.LinkedHashMap[String, Int]()

    /** (type JSON — full def or ref, value JSON) for one node. */
    def encode(n: JsonNode): (String, String) = {
      val (canonical, value) = walk(n)
      (define(canonical), value)
    }

    /** Emit a full definition (with fresh ids woven in) on first use of a
      * canonical complex type, a `ref` afterwards. Primitives pass through.
      */
    private def define(canonical: Typ): String = canonical match {
      case Prim(name) => s"""{"kind":"primitive","name":"$name"}"""
      case complex =>
        val key = complex.key
        ids.get(key) match {
          case Some(id) => s"""{"kind":"ref","id":$id}"""
          case None =>
            // children define (or ref) BEFORE the parent takes its id, so a
            // nested repeat of an earlier type still refs correctly
            val body = complex match {
              case Rec(fields) =>
                val fs = fields.map { case (fn, ft) =>
                  s"""{"name":${q(fn)},"type":${define(ft)}}"""
                }.mkString("[", ",", "]")
                val id = freshId(key)
                s"""{"kind":"record","id":$id,"fields":$fs}"""
              case Arr(elem) =>
                val et = define(elem)
                val id = freshId(key)
                s"""{"kind":"array","id":$id,"type":$et}"""
              case Named(name, under) =>
                val ut = define(under)
                val id = freshId(key)
                s"""{"kind":"named","id":$id,"name":${q(name)},"type":$ut}"""
              case Prim(_) => throw new IllegalStateException("unreachable")
            }
            body
        }
    }

    private def freshId(key: String): Int = {
      val id = nextId; nextId += 1; ids(key) = id; id
    }

    /** Infer the canonical type and encode the value. */
    private def walk(n: JsonNode): (Typ, String) = n.getNodeType match {
      case JsonNodeType.NULL => (Prim("null"), "null")
      case JsonNodeType.STRING => (Prim("string"), q(n.asText))
      case JsonNodeType.BOOLEAN => (Prim("bool"), "\"" + n.asText + "\"")
      case JsonNodeType.NUMBER =>
        if (n.isIntegralNumber) {
          // zjson has no bignum: a value outside int64 would type-lie and
          // overflow any conformant consumer — raise, don't mis-encode
          if (!n.canConvertToLong)
            throw new IllegalArgumentException(
              s"zjson: integer ${n.asText} does not fit int64")
          (Prim("int64"), "\"" + n.asText + "\"")
        } else (Prim("float64"), "\"" + n.asText + "\"")
      case JsonNodeType.ARRAY =>
        val items = (0 until n.size).map(i => walk(n.get(i)))
        val elemT = unify(items.map(_._1))
        (Arr(elemT), items.map(_._2).mkString("[", ",", "]"))
      case JsonNodeType.OBJECT =>
        val names = {
          val it = n.fieldNames()
          val buf = scala.collection.mutable.ArrayBuffer[String]()
          while (it.hasNext) buf += it.next()
          buf.toSeq
        }
        val typeName = names.collectFirst {
          case "_type" if n.get("_type").isTextual => n.get("_type").asText
        }
        val fields = names.filterNot(f => typeName.isDefined && f == "_type")
          .map { f => val (t, v) = walk(n.get(f)); (f, t, v) }
        val rec = Rec(fields.map(f => (f._1, f._2)))
        val value = fields.map(_._3).mkString("[", ",", "]")
        (typeName.fold[Typ](rec)(Named(_, rec)), value)
      case other =>
        throw new IllegalArgumentException(s"zjson: cannot encode JSON node type $other")
    }

    /** Array element types must agree (modulo nulls — `null` unifies with
      * anything). Mixed element types would need a Zed union, which the
      * engine's pools cannot hold — raise, don't guess.
      */
    private def unify(ts: Seq[Typ]): Typ =
      ts.foldLeft[Typ](Prim("null")) {
        case (Prim("null"), t) => t
        case (t, Prim("null")) => t
        case (a, b) if a.key == b.key => a
        case (a, b) => throw new IllegalArgumentException(
          s"zjson: mixed array element types ${a.key} vs ${b.key} (unions are outside the engine surface)")
      }
  }

  private sealed trait Typ { def key: String }
  private final case class Prim(name: String) extends Typ {
    def key: String = name
  }
  private final case class Rec(fields: Seq[(String, Typ)]) extends Typ {
    def key: String = fields.map { case (n, t) => s"${q(n)}:${t.key}" }.mkString("{", ",", "}")
  }
  private final case class Arr(elem: Typ) extends Typ {
    def key: String = s"[${elem.key}]"
  }
  private final case class Named(name: String, under: Typ) extends Typ {
    def key: String = s"${q(name)}=${under.key}"
  }

  private def q(v: String): String = graft.codec.MiniJson.quote(v)

  // ---- decode: zjson lines → JSON record lines -----------------------------

  private val IntNames = Set("int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64")
  private val FloatNames = Set("float16", "float32", "float64")
  private val JsonNumber = "-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?".r

  /** Decode a zjson stream (text or lines) back to JSON record lines — the
    * inverse of [[fromJsonLines]] on its subset, tolerant of the wider
    * primitive vocabulary any spec-conformant producer may emit (all int/
    * uint/float widths, time, duration, ip, net — non-numeric primitives
    * stay strings, which is exactly how the JSON-lines interchange carries
    * them).
    */
  def toJsonLines(text: String): Seq[String] =
    toJsonLines(text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq)

  def toJsonLines(lines: Seq[String]): Seq[String] = {
    val byId = scala.collection.mutable.Map[Int, JsonNode]()

    // register every complex type definition in the tree (parents and
    // children), so later refs resolve no matter which level defined them
    def register(t: JsonNode): Unit = if (t.isObject && t.has("id") && !isRef(t)) {
      byId(t.get("id").asInt) = t
      if (t.has("type")) register(t.get("type"))
      if (t.has("fields")) (0 until t.get("fields").size)
        .foreach(i => register(t.get("fields").get(i).get("type")))
    }
    def isRef(t: JsonNode): Boolean = t.get("kind").asText == "ref"
    def resolve(t: JsonNode): JsonNode =
      if (isRef(t)) byId.getOrElse(t.get("id").asInt,
        throw new IllegalArgumentException(s"zjson: ref to undefined type id ${t.get("id")}"))
      else t

    def decode(t0: JsonNode, v: JsonNode): String = {
      val t = resolve(t0)
      t.get("kind").asText match {
        case "primitive" =>
          val name = t.get("name").asText
          if (v == null || v.isNull) "null"
          else if (IntNames(name) || FloatNames(name) || name == "bool") {
            val text = v.asText
            // Zed renders whole floats with a trailing dot ("3.") — legal
            // Zed text, not a legal JSON number; normalize. Non-finite
            // floats (+Inf/-Inf/NaN) have no JSON number form at all —
            // carry them as strings, the same convention the engine's
            // JSON interchange uses elsewhere
            val num = if (text.matches("-?[0-9]+\\.")) text + "0" else text
            if (name == "bool" || JsonNumber.matches(num)) num else q(text)
          }
          else q(v.asText) // string, time, duration, ip, net, bytes, …
        case "record" =>
          if (v == null || v.isNull) "null"
          else {
            val fields = t.get("fields")
            if (v.size != fields.size)
              throw new IllegalArgumentException(
                s"zjson: record value arity ${v.size} != ${fields.size} fields")
            (0 until fields.size).map { i =>
              val f = fields.get(i)
              s"${q(f.get("name").asText)}:${decode(f.get("type"), v.get(i))}"
            }.mkString("{", ",", "}")
          }
        case "array" | "set" =>
          if (v == null || v.isNull) "null"
          else (0 until v.size).map(i => decode(t.get("type"), v.get(i)))
            .mkString("[", ",", "]")
        case "named" =>
          // re-inject the engine's `_type` discriminator, first position —
          // the exact inverse of the encoder (and of Zson's `(=name)`)
          val body = decode(t.get("type"), v)
          val name = t.get("name").asText
          if (!body.startsWith("{")) body
          else if (body == "{}") s"""{"_type":${q(name)}}"""
          else s"""{"_type":${q(name)},${body.drop(1)}"""
        case other =>
          throw new IllegalArgumentException(
            s"zjson: type kind '$other' is outside the engine surface (records/arrays/primitives)")
      }
    }

    lines.map { line =>
      val n = mapper.readTree(line)
      if (!n.isObject || !n.has("type") || !n.has("value"))
        throw new IllegalArgumentException(s"zjson: line is not {type, value}: $line")
      register(n.get("type"))
      decode(n.get("type"), n.get("value"))
    }
  }
}
