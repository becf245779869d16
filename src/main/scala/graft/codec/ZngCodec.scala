package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.cli.Zng
import graft.pool.Envelope

/** ZNG as a TOPIC codec (the third wire codec next to C1 Confluent-Avro and
  * C5/C6 Connect-JSON): the reference's native binary interchange framed one
  * record per Kafka message value. `produce`/`consume` already speak ZNG at
  * the file boundary (cli/Zng.scala); this lifts the same reader/writer into
  * the [[graft.streaming.StreamSync]] decode/encode seam so
  * `fromTopics`/`etlPipeline`/`toTopic` can sync ZNG-valued topics.
  *
  * Shape note: the codec is a per-row JVM transcode (ZNG bytes ↔ JSON text)
  * feeding Spark's codegen'd `from_json`/`to_json` — the right tool at the
  * IO boundary, same placement as the Multimodal decoders: codec work can't
  * be a Catalyst expression tree, and it runs exactly once per wire record,
  * off the relational hot path. A value framing SEVERAL ZNG records (a
  * producer batching records per message) explodes into one envelope row
  * per record — no data is dropped; corrupt or empty values (undecodable
  * bytes, zero records) decode to a single null-valued row rather than
  * failing the stream — the quarantine convention used across the engine's
  * decoders, and the null rows keep misframed producers countable.
  */
object ZngCodec {

  /** One ZNG-framed record → its JSON text (null = corrupt/misframed).
    * Used for KEYS, where one record per key is the only sane framing.
    */
  val zngToJson: UserDefinedFunction = udf((bytes: Array[Byte]) =>
    if (bytes == null) null
    else
      try Zng.readJsonLines(bytes) match {
        case Seq(one) => one
        case _ => null // zero or many records in one message value
      }
      catch { case scala.util.control.NonFatal(_) => null })

  /** All ZNG-framed records in one message value → their JSON texts
    * (null = corrupt or zero records, which `explode_outer` turns into a
    * single quarantined null row downstream).
    */
  val zngToJsonAll: UserDefinedFunction = udf((bytes: Array[Byte]) =>
    if (bytes == null) null
    else
      try {
        val recs = Zng.readJsonLines(bytes)
        if (recs.isEmpty) null else recs
      } catch { case scala.util.control.NonFatal(_) => null })

  /** One JSON record → ZNG-framed bytes. */
  val jsonToZng: UserDefinedFunction = udf((json: String) =>
    if (json == null) null else Zng.write(Seq(json)))

  /** Decode hook for `StreamSync.fromTopics`/`etlPipeline`: wire batches
    * whose `value` (and optionally `key`) bytes are ZNG-framed records →
    * envelope batches typed by the given schemas.
    */
  def decoder(valueSchema: StructType, keySchema: Option[StructType] = None)
      : DataFrame => DataFrame = { batch =>
    batch.select(
      struct(col("topic"), col("partition"), col("offset")).as("kafka"),
      // no key schema → pass the raw key bytes through opaquely, like the
      // Avro/Connect decoders (consumer.go:129-134 parity) — a keyed topic
      // must not lose its partition keys on a sync round-trip
      keySchema.map(ks => from_json(zngToJson(col("key")), ks))
        .getOrElse(col("key").cast("binary")).as("key"),
      // multi-record values explode to one row per record (sharing the
      // message's kafka coordinates); corrupt/empty → one null row
      explode_outer(zngToJsonAll(col("value"))).as("_zjson"),
      lit(Envelope.KindRecord).as(Envelope.KindCol))
      .select(col("kafka"), col("key"),
        from_json(col("_zjson"), valueSchema).as("value"),
        col(Envelope.KindCol))
  }

  /** Encode hook for `StreamSync.toTopic`: envelope rows → wire rows with
    * ZNG-framed value (and key, when present) bytes. `ignoreNullFields` is
    * off so a round-trip preserves null-valued fields instead of silently
    * dropping them from the record type.
    */
  val encoder: DataFrame => DataFrame = { df =>
    val jsonOpts = Map("ignoreNullFields" -> "false")
    val keyCol =
      if (!df.schema.fieldNames.contains("key")) lit(null).cast("binary")
      else df.schema("key").dataType match {
        case _: StructType => jsonToZng(to_json(col("key"), jsonOpts))
        case org.apache.spark.sql.types.BinaryType => col("key") // opaque pass-through
        case _ => col("key").cast("binary")
      }
    df.select(
      col("kafka.topic").as("topic"),
      col("kafka.partition").as("partition"),
      col("kafka.offset").as("offset"),
      keyCol.as("key"),
      jsonToZng(to_json(col("value"), jsonOpts)).as("value"))
  }
}
