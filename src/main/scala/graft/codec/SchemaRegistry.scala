package graft.codec

import java.security.MessageDigest
import scala.collection.concurrent.TrieMap

/** Confluent schema-registry client surface the codec needs (reference:
  * zavro/decoder.go:54-72 fetch-by-id; zavro/encoder.go:37-57
  * register+cache; subject naming `zng_<md5(type)>` per encoder.go:45-50 —
  * RecordNameStrategy, so many schemas can coexist on one topic).
  *
  * `HttpSchemaRegistry` is the production implementation point (thin REST
  * client, injected at the edge); `InMemoryRegistry` backs tests and local
  * runs. Executors hold per-id caches in the codec itself, so the registry
  * is consulted once per (executor, schema-id) — the Spark analog of the
  * reference's in-process caches.
  */
trait SchemaRegistry extends Serializable {
  /** Avro schema JSON by registry id. */
  def schemaById(id: Int): String
  /** Register (idempotently) and return the id. */
  def register(subject: String, schemaJson: String): Int
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
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

  def schemaById(id: Int): String =
    byId.getOrElse(id, throw new NoSuchElementException(s"schema id $id not registered"))

  def register(subject: String, schemaJson: String): Int =
    bySchema.getOrElseUpdate(schemaJson, {
      val id = nextId.getAndIncrement()
      byId.put(id, schemaJson)
      id
    })
}
