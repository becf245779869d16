package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ready-made wire↔envelope compositions for the sync layer — the decode/
  * encode hooks `StreamSync.fromTopics`/`toTopic` take, assembled from the
  * codec layer (reference: consumer assembly fifo/consumer.go:123-147,
  * producer extraction fifo/producer.go:73-101).
  */
object WireCodec {

  /** Kafka wire batch (topic, partition, offset, key, value bytes) →
    * envelope rows, with the value decoded as Confluent Avro to `schema`.
    * Key stays opaque binary when `keySchema` is None (consumer.go:129-134:
    * null key handling).
    */
  def avroEnvelopeDecoder(registry: SchemaRegistry, schema: StructType,
      keySchema: Option[StructType] = None)(batch: DataFrame): DataFrame = {
    val withValue = ConfluentAvro.decodeDF(batch, "value", "_value", schema, registry)
    val withKey = keySchema match {
      case Some(ks) => ConfluentAvro.decodeDF(withValue, "key", "_key", ks, registry)
      case None => withValue.withColumn("_key", col("key").cast("binary"))
    }
    withKey.select(
      struct(col("topic"), col("partition"), col("offset")).as("kafka"),
      col("_key").as("key"),
      col("_value").as("value"),
      lit("record").as(graft.pool.Envelope.KindCol))
  }

  /** Connect-JSON variant: value bytes hold a `{"schema":…,"payload":…}`
    * envelope; the embedded schema must shape to `schema`.
    */
  def connectEnvelopeDecoder(schema: StructType)(batch: DataFrame): DataFrame =
    batch.select(
      struct(col("topic"), col("partition"), col("offset")).as("kafka"),
      col("key").cast("binary").as("key"),
      ConnectJson.decode(col("value").cast("string"), schema).as("value"),
      lit("record").as(graft.pool.Envelope.KindCol))

  /** Envelope rows → Kafka producer shape (topic, key, value bytes) with
    * Confluent Avro values (to-kafka path, fifo/producer.go:83-93: value =
    * `value` field; whole record if absent is not reproduced — envelopes
    * always carry `value`).
    */
  /** Structured keys serialize as JSON bytes; opaque binary keys pass
    * through (producer.go:86-92: key encoded only when present/typed).
    */
  private def keyBytes(env: DataFrame) = env.schema("key").dataType match {
    case _: StructType => to_json(col("key")).cast("binary")
    case _ => col("key").cast("binary")
  }

  def avroProducerEncoder(registry: SchemaRegistry)(env: DataFrame): DataFrame = {
    val wire = ConfluentAvro.encodeDF(env, "value", "_value_bytes", registry)
    wire.select(
      col("kafka.topic").as("topic"),
      keyBytes(wire).as("key"),
      col("_value_bytes").as("value"))
  }

  /** Envelope rows → Connect-JSON producer shape. */
  def connectProducerEncoder(env: DataFrame): DataFrame = {
    val vSchema = env.schema("value").dataType.asInstanceOf[StructType]
    env.select(
      col("kafka.topic").as("topic"),
      keyBytes(env).as("key"),
      ConnectJson.encode(col("value"), vSchema).cast("binary").as("value"))
  }
}
