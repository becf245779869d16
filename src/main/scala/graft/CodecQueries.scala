package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.codec.{ConfluentAvro, ConnectJson, InMemoryRegistry, SchemaRegistry}
import graft.Queries.Q

/** Codec layer as driver-checkable queries. Round-trips are compared against
  * an identity oracle: encode→decode must reproduce the source values
  * exactly, so any header, schema-translation, or value-mapping bug breaks
  * the hash match (the Spark analog of connectjson_test.go:12-46's
  * table-driven round-trip corpus).
  */
object CodecQueries {

  val all: Map[String, Q] = Map(

    // C5+C6: Connect JSON envelope encode → decode+shape → flatten
    "codec_connect_roundtrip" -> Q(
      (s, d) => {
        val ev = Tables.load(s, d, "events")
          .select(struct(col("event_id"), col("user_id"), col("value"), col("event_type")).as("v"))
        val vSchema = ev.schema("v").dataType.asInstanceOf[StructType]
        val enveloped = ev.select(ConnectJson.encode(col("v"), vSchema).as("env"))
        // decode side resolves the schema from the envelope text itself
        // (connectjson.go:191-201): parse it back into a StructType at plan time.
        val shaped = enveloped.select(ConnectJson.decode(col("env"),
          ConnectJson.sparkTypeOf(ConnectJson.schemaJson(vSchema)).asInstanceOf[StructType]).as("v"))
        shaped.select(col("v.event_id").as("event_id"), col("v.user_id").as("user_id"),
          col("v.value").as("value"), col("v.event_type").as("event_type"))
      },
      Some("""SELECT event_id, user_id, value, event_type FROM events""")),

    // C1+C2: Confluent wire-format Avro encode (with registry registration)
    // → decode (schema resolved by embedded id) → flatten
    "codec_avro_roundtrip" -> Q(
      (s, d) => {
        val registry: SchemaRegistry = new InMemoryRegistry
        val ev = Tables.load(s, d, "orders")
          .select(struct(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderpriority")).as("v"))
        val vSchema = ev.schema("v").dataType.asInstanceOf[StructType]
        val wire = ConfluentAvro.encodeDF(ev, "v", "bytes", registry).select("bytes")
        val decoded = ConfluentAvro.decodeDF(wire, "bytes", "v", vSchema, registry)
        decoded.select(col("v.o_orderkey").as("o_orderkey"), col("v.o_custkey").as("o_custkey"),
          col("v.o_orderstatus").as("o_orderstatus"), col("v.o_totalprice").as("o_totalprice"),
          col("v.o_orderpriority").as("o_orderpriority"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
             |FROM orders""".stripMargin)),

    // C1 header handling: schema id round-trips through the 5-byte wire
    // header (magic 0x00 + BE uint32, decoder.go:39-42), read back by the
    // native codegen expression (plans/ConfluentExpressions).
    "codec_avro_header" -> Q(
      (s, d) => {
        val registry: SchemaRegistry = new InMemoryRegistry
        val ev = Tables.load(s, d, "events")
          .select(struct(col("event_id")).as("v"))
        val wire = ConfluentAvro.encodeDF(ev, "v", "bytes", registry)
        wire.select(
          graft.plans.ConfluentFunctions.confluent_schema_id(col("bytes")).as("schema_id"),
          (octet_length(graft.plans.ConfluentFunctions.confluent_body(col("bytes")))
            - octet_length(col("bytes")) + 5).as("hdr_delta"))
          .groupBy("schema_id", "hdr_delta").agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT 1 AS schema_id, 0 AS hdr_delta, count(*) AS cnt FROM events""")),

    // C3 union surface: a non-optional Avro union decodes as the tag struct
    // {tag, b0, b1} (schema.go:234-244, decoder.go:141-161 → SURVEY §1.2).
    // Long-branch events carry their id, purchases carry a string — the
    // oracle recomputes tag/branches straight from the source table.
    "codec_avro_union" -> Q(
      (s, d) => {
        import org.apache.spark.sql.{Encoders, Row}
        import org.apache.spark.sql.types.{BinaryType, StructField}
        val registry: SchemaRegistry = new InMemoryRegistry
        val writerJson =
          """{"type":"record","name":"u","fields":[{"name":"v","type":["long","string"]}]}"""
        val id = registry.register("u-subj", writerJson)
        val wire = Tables.load(s, d, "events")
          .select(col("event_id"), col("event_type"))
          .mapPartitions { it =>
            val schema = new org.apache.avro.Schema.Parser().parse(writerJson)
            it.map { r =>
              val rec = new org.apache.avro.generic.GenericData.Record(schema)
              if (r.getString(1) == "purchase")
                rec.put("v", new org.apache.avro.util.Utf8("id-" + r.getLong(0)))
              else rec.put("v", java.lang.Long.valueOf(r.getLong(0)))
              Row(ConfluentAvro.encodeBytes(rec, schema, id): Any)
            }
          }(Encoders.row(StructType(Seq(StructField("bytes", BinaryType)))))
        val target = ConfluentAvro.sparkType(
          new org.apache.avro.Schema.Parser().parse(writerJson)).asInstanceOf[StructType]
        ConfluentAvro.decodeDF(wire, "bytes", "v", target, registry)
          .groupBy(col("v.v.tag").as("tag"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("v.v.b0")).as("sum_long"),
            max(col("v.v.b1")).as("max_str"))
      },
      Some("""SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag,
             |       count(*) AS cnt,
             |       CAST(sum(CASE WHEN event_type <> 'purchase' THEN event_id END) AS BIGINT) AS sum_long,
             |       max(CASE WHEN event_type = 'purchase' THEN 'id-' || CAST(event_id AS VARCHAR) END) AS max_str
             |FROM events GROUP BY 1""".stripMargin))
  )
}
