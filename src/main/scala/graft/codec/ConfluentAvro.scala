package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Confluent wire-format Avro codec (reference: zavro/).
  *
  * Wire format (zavro/decoder.go:39-42, encoder.go:59-66): 1 magic byte 0x00,
  * 4-byte big-endian schema id, Avro binary body.
  *
  * Schema translation (zavro/schema.go:35-71): every record field is encoded
  * as a `[null, T]` union — i.e. Spark nullability — and time maps to
  * `timestamp-micros` longs (encoder.go:153-156), which is exactly Spark's
  * native µs TimestampType.
  *
  * No spark-avro module ships in this environment, so the converter is
  * implemented directly on org.apache.avro (same library Spark itself
  * vendors). Encode runs as a codegen-compatible UDF over a struct column;
  * decode maps with a Row encoder. Per-id parsed-schema caches live in
  * executor statics — the Spark analog of the reference's caches
  * (zavro/decoder.go:54-72, encoder.go:37-57).
  */
object ConfluentAvro {

  val MagicByte: Byte = 0x0

  // ---------------------------------------------------------------------------
  // Spark StructType → Avro schema (zavro/schema.go:35-71 semantics)
  // ---------------------------------------------------------------------------

  def avroSchema(st: StructType, name: String): Schema = structSchema(st, name, new java.util.HashSet[String])

  private def structSchema(st: StructType, name: String, seen: java.util.HashSet[String]): Schema = {
    val rec = Schema.createRecord(name, null, "graft", false)
    val fields = st.fields.map { f =>
      val base = fieldSchema(f.dataType, s"${name}_${f.name}", seen)
      // nullable union wrap, matching schema.go:45-51
      val union = Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    rec.setFields(java.util.List.of(fields: _*))
    rec
  }

  private def fieldSchema(dt: DataType, name: String, seen: java.util.HashSet[String]): Schema = dt match {
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType | TimestampNTZType =>
      // ns→µs truncation caveat documented at encoder.go:149-156
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType => Schema.create(Schema.Type.INT)
    case ArrayType(et, _) => Schema.createArray(fieldSchema(et, name, seen))
    case st: StructType => structSchema(st, name, seen)
    case other => throw new IllegalArgumentException(s"Avro codec: unsupported type $other")
  }

  // ---------------------------------------------------------------------------
  // Row ↔ GenericRecord
  // ---------------------------------------------------------------------------

  private def toAvro(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    // unwrap [null, T] unions
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else schema
    (dt, value) match {
      case (ByteType, v: Byte)   => v.toInt
      case (ShortType, v: Short) => v.toInt
      case (TimestampType | TimestampNTZType, v: java.sql.Timestamp) =>
        v.getTime * 1000L + (v.getNanos / 1000) % 1000
      case (TimestampType | TimestampNTZType, v: java.time.Instant) =>
        v.getEpochSecond * 1000000L + v.getNano / 1000
      case (TimestampNTZType, v: java.time.LocalDateTime) =>
        v.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          v.getNano / 1000
      case (DateType, v: java.sql.Date)      => v.toLocalDate.toEpochDay.toInt
      case (DateType, v: java.time.LocalDate) => v.toEpochDay.toInt
      case (BinaryType, v: Array[Byte]) => ByteBuffer.wrap(v)
      case (ArrayType(et, _), v: scala.collection.Seq[_]) =>
        val out = new java.util.ArrayList[Any](v.length)
        v.foreach(x => out.add(toAvro(x, et, s.getElementType)))
        out
      case (st: StructType, r: Row) => rowToRecord(r, st, s)
      case (_, v) => v
    }
  }

  def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val v = if (row.isNullAt(i)) null
        else toAvro(row.get(i), f.dataType, schema.getField(f.name).schema())
      rec.put(f.name, v)
      i += 1
    }
    rec
  }

  private def fromAvro(value: Any, dt: DataType): Any = {
    if (value == null) return null
    (dt, value) match {
      case (ByteType, v: Integer)  => v.toByte
      case (ShortType, v: Integer) => v.toShort
      case (StringType, v)         => v.toString // Utf8 → String
      case (TimestampType, v: java.lang.Long) =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(v, 1000000L), Math.floorMod(v, 1000000L) * 1000L))
      case (TimestampNTZType, v: java.lang.Long) =>
        java.time.LocalDateTime.ofEpochSecond(v / 1000000L, ((v % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case (DateType, v: Integer) => java.time.LocalDate.ofEpochDay(v.toLong)
      case (BinaryType, v: ByteBuffer) =>
        val arr = new Array[Byte](v.remaining()); v.duplicate().get(arr); arr
      case (ArrayType(et, _), v: java.util.Collection[_]) =>
        v.asScala.map(x => fromAvro(x, et)).toSeq
      case (st: StructType, r: GenericRecord) => recordToRow(r, st)
      case (_, v) => v
    }
  }

  /** Fields are matched by name against the row's writer schema; target
    * fields the writer doesn't carry decode as null (heterogeneous-batch
    * superset reads, SURVEY §7.4.2).
    */
  def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map { f =>
      if (rec.getSchema.getField(f.name) == null) null
      else fromAvro(rec.get(f.name), f.dataType)
    })

  // ---------------------------------------------------------------------------
  // Wire encode / decode
  // ---------------------------------------------------------------------------

  def encodeBytes(rec: GenericRecord, schema: Schema, id: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    out.write(MagicByte)
    out.write(ByteBuffer.allocate(4).putInt(id).array())
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def schemaIdOf(bytes: Array[Byte]): Int = {
    require(bytes.length > 5 && bytes(0) == MagicByte,
      s"bad Confluent wire header (len=${bytes.length})") // decoder.go:36-42
    ByteBuffer.wrap(bytes, 1, 4).getInt
  }

  def decodeBytes(bytes: Array[Byte], schema: Schema): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    new GenericDatumReader[GenericRecord](schema).read(null, dec)
  }

  // executor-local parsed-schema cache (decoder.go:54-72 analog)
  @transient private lazy val parseCache =
    new scala.collection.concurrent.TrieMap[String, Schema]
  private def parsed(json: String): Schema =
    parseCache.getOrElseUpdate(json, new Schema.Parser().parse(json))

  /** C2: struct column → Confluent wire bytes appended as `outCol`;
    * registers the derived schema under its RecordNameStrategy subject
    * (encoder.go:29-66). Registration happens once, on the driver, at plan
    * time — executors only serialize.
    */
  def encodeDF(df: DataFrame, structCol: String, outCol: String,
      registry: SchemaRegistry, recordName: String = "value"): DataFrame = {
    val st = df.schema(structCol).dataType.asInstanceOf[StructType]
    val schemaJson = avroSchema(st, recordName).toString
    val id = registry.register(SchemaRegistry.subjectFor(schemaJson), schemaJson)
    val idx = df.schema.fieldIndex(structCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    df.map { row =>
      val bytes =
        if (row.isNullAt(idx)) null
        else encodeBytes(rowToRecord(row.getStruct(idx), st, parsed(schemaJson)),
          parsed(schemaJson), id)
      Row.fromSeq(row.toSeq :+ bytes)
    }(Encoders.row(outSchema))
  }

  /** C1: wire bytes column → decoded struct appended as `outCol`. The
    * registry is consulted per schema id per executor (cached); a single
    * batch may carry many ids (SURVEY §7.4.2) — each row resolves its own.
    */
  def decodeDF(df: DataFrame, bytesCol: String, outCol: String,
      schema: StructType, registry: SchemaRegistry): DataFrame = {
    val idx = df.schema.fieldIndex(bytesCol)
    val outSchema = df.schema.add(outCol, schema, nullable = true)
    df.map { row =>
      val bytes = row.getAs[Array[Byte]](idx)
      val decoded =
        if (bytes == null) null
        else {
          val writer = parsed(registry.schemaById(schemaIdOf(bytes)))
          recordToRow(decodeBytes(bytes, writer), schema)
        }
      Row.fromSeq(row.toSeq :+ decoded)
    }(Encoders.row(outSchema))
  }
}
