package graft.codec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import scala.collection.concurrent.TrieMap

/** Confluent schema-registry client surface the codec needs (reference:
  * zavro/decoder.go:54-72 fetch-by-id; zavro/encoder.go:37-57
  * register+cache; subject naming `zng_<md5(type)>` per encoder.go:45-50 —
  * RecordNameStrategy, so many schemas can coexist on one topic).
  *
  * `HttpSchemaRegistry` is the production implementation (thin REST client
  * over the Confluent Schema Registry HTTP API); `InMemoryRegistry` backs
  * tests and local runs. Executors hold per-(cacheKey, id) caches in the
  * codec itself, so a registry is consulted once per (executor, schema-id).
  */
trait SchemaRegistry extends Serializable {
  /** Avro schema JSON by registry id. */
  def schemaById(id: Int): String
  /** Register (idempotently) and return the id. */
  def register(subject: String, schemaJson: String): Int
  /** All registered subject names (cmd/zync/ls/command.go:42-64). */
  def subjects(): Seq[String]
  /** A subject's latest (id, version, schema) — the `ls` detail lines
    * (ls/command.go:55-62 GetLatestSchema).
    */
  def latest(subject: String): (Int, Int, String)

  /** Key for the codec's executor-static id→schema cache. The default is
    * per-origin-instance but stable across task-closure serialization: a
    * UUID minted at construction rides along with the serialized registry,
    * so every task copy of the same driver-side registry shares one cache
    * entry set (an identity-hash key would mint a fresh key per task and
    * grow the cache unboundedly in a long streaming job). Network-backed
    * implementations override with a stable endpoint key instead.
    */
  private val instanceKey: String = java.util.UUID.randomUUID().toString
  def cacheKey: String = s"${getClass.getName}@$instanceKey"
}

object SchemaRegistry {
  /** Subject for a schema, matching the reference's RecordNameStrategy
    * naming: `zng_<md5-hex>` of the canonical schema text
    * (zavro/encoder.go:45-50, zavro/schema.go:62).
    */
  def subjectFor(schemaJson: String): String = {
    val md5 = MessageDigest.getInstance("MD5")
      .digest(schemaJson.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"zng_$md5"
  }
}

/** Deterministic in-memory registry (ids assigned in registration order).
  * Serializable: closures capture it whole; state is shared per-JVM which
  * matches local[*] testing. On a cluster, use an external registry.
  */
final class InMemoryRegistry extends SchemaRegistry {
  private val byId = new TrieMap[Int, String]
  private val bySchema = new TrieMap[String, Int]
  // subject → ordered version history of schema ids
  private val subjectVersions = new TrieMap[String, Vector[Int]]
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

  def schemaById(id: Int): String =
    byId.getOrElse(id, throw new NoSuchElementException(s"schema id $id not registered"))

  def register(subject: String, schemaJson: String): Int = {
    val id = bySchema.getOrElseUpdate(schemaJson, {
      val nid = nextId.getAndIncrement()
      byId.put(nid, schemaJson)
      nid
    })
    subjectVersions.synchronized {
      val vs = subjectVersions.getOrElse(subject, Vector.empty)
      if (!vs.contains(id)) subjectVersions.put(subject, vs :+ id)
    }
    id
  }

  def subjects(): Seq[String] = subjectVersions.keySet.toSeq.sorted

  def latest(subject: String): (Int, Int, String) = {
    val vs = subjectVersions.getOrElse(subject,
      throw new NoSuchElementException(s"subject $subject not registered"))
    val id = vs.last
    (id, vs.length, byId(id))
  }
}

/** Thin REST client over the Confluent Schema Registry API — the semantics
  * the reference's client exercises (zavro/decoder.go:54-72 fetch-by-id;
  * encoder.go:37-57 register):
  *
  *   - `GET /schemas/ids/{id}`            → `{"schema": "<json-escaped avro>"}`
  *   - `POST /subjects/{subject}/versions` body `{"schema": "..."}` → `{"id": N}`
  *   - `GET /subjects`                    → `["subject", …]`
  *
  * Responses are parsed with a purpose-built minimal JSON reader (the only
  * shapes on this API are the three above) — no library dependency, no
  * reflection in the executor hot path. The instance is Serializable: only
  * the base URL ships to executors; the HttpClient is rebuilt lazily per JVM.
  */
final class HttpSchemaRegistry(baseUrl: String,
    credentials: Option[(String, String)] = None) extends SchemaRegistry {
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(java.time.Duration.ofSeconds(10)).build()

  override def cacheKey: String = s"http:$baseUrl"

  private def url(path: String) = URI.create(baseUrl.stripSuffix("/") + path)

  /** Confluent Cloud-style basic auth (the reference sends its
    * schema_registry.json user/password the same way, cli/flags.go:35-41 →
    * srclient basic auth).
    */
  private def withAuth(b: HttpRequest.Builder): HttpRequest.Builder =
    credentials.fold(b) { case (user, pass) =>
      b.header("Authorization", "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$user:$pass".getBytes(StandardCharsets.UTF_8)))
    }

  private def send(req: HttpRequest): String = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"schema registry ${req.method()} ${req.uri()} → HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  def schemaById(id: Int): String = {
    val body = send(withAuth(HttpRequest.newBuilder(url(s"/schemas/ids/$id")).GET()).build())
    MiniJson.stringField(body, "schema")
      .getOrElse(throw new java.io.IOException(s"no \"schema\" field in registry response: ${body.take(200)}"))
  }

  def register(subject: String, schemaJson: String): Int = {
    val payload = s"""{"schema":${MiniJson.quote(schemaJson)}}"""
    val req = withAuth(HttpRequest.newBuilder(url(s"/subjects/$subject/versions"))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(HttpRequest.BodyPublishers.ofString(payload, StandardCharsets.UTF_8)))
      .build()
    val body = send(req)
    MiniJson.intField(body, "id")
      .getOrElse(throw new java.io.IOException(s"no \"id\" field in registry response: ${body.take(200)}"))
  }

  def subjects(): Seq[String] = {
    val body = send(withAuth(HttpRequest.newBuilder(url("/subjects")).GET()).build())
    MiniJson.stringArray(body)
  }

  /** `GET /subjects/{subject}/versions/latest` →
    * `{"subject":…,"version":N,"id":N,"schema":"…"}`.
    */
  def latest(subject: String): (Int, Int, String) = {
    val body = send(withAuth(
      HttpRequest.newBuilder(url(s"/subjects/$subject/versions/latest")).GET()).build())
    def bad(field: String) =
      throw new java.io.IOException(s"no \"$field\" field in registry response: ${body.take(200)}")
    (MiniJson.intField(body, "id").getOrElse(bad("id")),
      MiniJson.intField(body, "version").getOrElse(bad("version")),
      MiniJson.stringField(body, "schema").getOrElse(bad("schema")))
  }
}

/** Minimal JSON helpers for the three registry response shapes. Handles the
  * full JSON string escape set; deliberately NOT a general parser.
  */
private[graft] object MiniJson {

  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }

  /** Parse the JSON string starting at `i` (which must point at `"`).
    * Returns (decoded value, index just past the closing quote).
    */
  private def parseString(s: String, i0: Int): (String, Int) = {
    require(s.charAt(i0) == '"', s"expected string at $i0")
    val b = new StringBuilder
    var i = i0 + 1
    while (s.charAt(i) != '"') {
      s.charAt(i) match {
        case '\\' =>
          s.charAt(i + 1) match {
            case '"' => b.append('"'); i += 2
            case '\\' => b.append('\\'); i += 2
            case '/' => b.append('/'); i += 2
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case 'u' =>
              b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case c => throw new java.io.IOException(s"bad JSON escape \\$c")
          }
        case c => b.append(c); i += 1
      }
    }
    (b.toString, i + 1)
  }

  /** Index of the value of the TOP-LEVEL key `name` in a JSON object (first
    * char past `"name":` and any whitespace). A real object walk — tracking
    * string literals and nested objects/arrays — not an `indexOf` scan: a
    * key name appearing inside another string value (e.g. a password
    * containing `"user":`) or inside a nested object must not match.
    */
  private def topLevelValueStart(json: String, name: String): Option[Int] = {
    var i = json.indexOf('{')
    if (i < 0) return None
    i += 1
    while (i < json.length) {
      while (i < json.length &&
        (json.charAt(i).isWhitespace || json.charAt(i) == ',')) i += 1
      if (i >= json.length || json.charAt(i) != '"') return None // '}' or malformed
      val (key, afterKey) = parseString(json, i)
      i = afterKey
      while (i < json.length && json.charAt(i).isWhitespace) i += 1
      if (i >= json.length || json.charAt(i) != ':') return None
      i += 1
      while (i < json.length && json.charAt(i).isWhitespace) i += 1
      if (i >= json.length) return None
      if (key == name) return Some(i)
      i = skipValue(json, i)
    }
    None
  }

  /** Index just past the JSON value starting at `i0` (string, number,
    * literal, object, or array — nested structures skipped whole).
    */
  private def skipValue(json: String, i0: Int): Int = json.charAt(i0) match {
    case '"' => parseString(json, i0)._2
    case '{' | '[' =>
      var depth = 0
      var i = i0
      while (i < json.length) {
        json.charAt(i) match {
          case '"' => i = parseString(json, i)._2
          case '{' | '[' => depth += 1; i += 1
          case '}' | ']' => depth -= 1; i += 1; if (depth == 0) return i
          case _ => i += 1
        }
      }
      i
    case _ => // number / true / false / null
      var i = i0
      while (i < json.length && json.charAt(i) != ',' && json.charAt(i) != '}' &&
        json.charAt(i) != ']' && !json.charAt(i).isWhitespace) i += 1
      i
  }

  /** Value of the top-level string field `name` in a JSON object. */
  def stringField(json: String, name: String): Option[String] =
    topLevelValueStart(json, name) match {
      case Some(k) if json.charAt(k) == '"' => Some(parseString(json, k)._1)
      case _ => None
    }

  /** Value of the top-level integer field `name` in a JSON object. */
  def intField(json: String, name: String): Option[Int] =
    topLevelValueStart(json, name).flatMap { start =>
      var k = start
      while (k < json.length && (json.charAt(k).isDigit || json.charAt(k) == '-')) k += 1
      if (k > start) Some(json.substring(start, k).toInt) else None
    }

  /** Value of the top-level boolean field `name` in a JSON object. */
  def boolField(json: String, name: String): Option[Boolean] =
    topLevelValueStart(json, name) match {
      case Some(k) if json.startsWith("true", k) => Some(true)
      case Some(k) if json.startsWith("false", k) => Some(false)
      case _ => None
    }

  /** A top-level JSON array of strings → decoded values. */
  def stringArray(json: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = json.indexOf('[')
    require(i >= 0, s"expected JSON array: ${json.take(80)}")
    i += 1
    while (i < json.length && json.charAt(i) != ']') {
      json.charAt(i) match {
        case '"' =>
          val (v, next) = parseString(json, i)
          out += v
          i = next
        case _ => i += 1
      }
    }
    out.toSeq
  }
}
