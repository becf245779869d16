package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalType, LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Confluent wire-format Avro codec (reference: zavro/).
  *
  * Wire format (zavro/decoder.go:39-42, encoder.go:59-66): 1 magic byte 0x00,
  * 4-byte big-endian schema id, Avro binary body.
  *
  * Schema translation (zavro/schema.go:35-71): every record field is encoded
  * as a `[null, T]` union — i.e. Spark nullability — except fields whose type
  * IS null (schema.go:45-51); time maps to `timestamp-micros` longs
  * (encoder.go:153-156), which is exactly Spark's native µs TimestampType.
  * Record names are `zng_<md5(canonical type)>` (schema.go:58-62), so a
  * repeated record type re-uses one definition and later occurrences render
  * as named references (schema.go:36-37 `RecursiveSchema`; golden behavior
  * zavro/schema_test.go:80-117).
  *
  * Decode direction (zavro/schema.go:174-244): optional `[null, T]` unions
  * collapse to nullable T; a non-optional union becomes a tag struct
  * `{tag:int, b0:…, b1:…}` (the Spark rendering of decoder.go:156-160's
  * tagged container, SURVEY §1.2); enums stringify (connectjson.go:87-89);
  * Avro maps become `map<string, T>`.
  *
  * No spark-avro module ships in this environment, so the converter is
  * implemented directly on org.apache.avro (same library Spark itself
  * vendors). Both codec directions run as `mapPartitions` with per-partition
  * reuse of the decoder/reader/encoder machinery (the cost model of the
  * reference's streaming decoder, zavro/decoder.go:74-221) — allocation per
  * row is limited to the output Row itself. Per-id parsed-schema caches live
  * in executor statics, the Spark analog of zavro/decoder.go:54-72 and
  * encoder.go:37-57.
  */
object ConfluentAvro {

  val MagicByte: Byte = 0x0

  // ---------------------------------------------------------------------------
  // Spark StructType → Avro schema (zavro/schema.go:35-71 semantics)
  // ---------------------------------------------------------------------------

  /** Canonical type string hashed into the record name — rendered zed-style
    * (`{a:int64,b:{…}}`, zson.FormatType analog) so structurally identical
    * record types get identical names regardless of field position. For the
    * types both systems share, the md5 therefore matches the reference's
    * (zavro/schema_test.go golden hashes).
    */
  def canonicalType(dt: DataType): String = dt match {
    case st: StructType =>
      st.fields.map(f => s"${f.name}:${canonicalType(f.dataType)}").mkString("{", ",", "}")
    case ArrayType(et, _) => s"[${canonicalType(et)}]"
    case MapType(kt, vt, _) => s"|{${canonicalType(kt)}:${canonicalType(vt)}}|"
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case BooleanType => "bool"
    case StringType => "string"
    case BinaryType => "bytes"
    case TimestampType | TimestampNTZType => "time"
    case DateType => "date"
    case NullType => "null"
    case other => other.simpleString
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def recordName(st: StructType): String = s"zng_${md5Hex(canonicalType(st))}"

  def avroSchema(st: StructType, name: String): Schema =
    avroSchema(st, Some(name))

  /** Derive the Avro schema; with no explicit name, records are named by
    * content hash (`zng_<md5>`) like the reference, and a record type that
    * appears more than once is emitted once and referenced by name thereafter
    * (Avro renders a reused Schema instance as a name reference).
    */
  def avroSchema(st: StructType, name: Option[String] = None): Schema =
    structSchema(st, name, new java.util.HashMap[String, Schema])

  private def structSchema(st: StructType, name: Option[String],
      defined: java.util.HashMap[String, Schema]): Schema = {
    val recName = name.getOrElse(recordName(st))
    val existing = defined.get(recName)
    if (existing != null) return existing // named reference (schema.go:36-37)
    val rec = Schema.createRecord(recName, null, "graft", false)
    defined.put(recName, rec)
    val fields = st.fields.map { f =>
      val base = fieldSchema(f.dataType, defined)
      // nullable union wrap, matching schema.go:45-51 — except a field whose
      // type IS null stays bare null (can't union null with null)
      val fieldType =
        if (base.getType == Schema.Type.NULL) base
        else Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      new Schema.Field(f.name, fieldType, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    rec.setFields(java.util.List.of(fields: _*))
    rec
  }

  private def fieldSchema(dt: DataType,
      defined: java.util.HashMap[String, Schema]): Schema = dt match {
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case NullType    => Schema.create(Schema.Type.NULL)
    case TimestampType | TimestampNTZType =>
      // ns→µs truncation caveat documented at encoder.go:149-156
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType => Schema.create(Schema.Type.INT)
    case ArrayType(et, _) => Schema.createArray(fieldSchema(et, defined))
    case MapType(StringType, vt, _) => Schema.createMap(fieldSchema(vt, defined))
    case st: StructType => structSchema(st, None, defined)
    case other => throw new IllegalArgumentException(s"Avro codec: unsupported type $other")
  }

  // ---------------------------------------------------------------------------
  // Avro schema → Spark DataType (zavro/schema.go:174-244 semantics)
  // ---------------------------------------------------------------------------

  /** Optional-union detection (schema.go:195-209): `[null, T]` (either
    * order) → Some(T); anything else None.
    */
  def optionalBranch(s: Schema): Option[Schema] =
    if (s.getType != Schema.Type.UNION) None
    else s.getTypes.asScala.toList match {
      case a :: b :: Nil if a.getType == Schema.Type.NULL => Some(b)
      case a :: b :: Nil if b.getType == Schema.Type.NULL => Some(a)
      case _ => None
    }

  /** Avro → Spark type. Non-optional unions become the tag struct
    * `{tag:int, b0, b1, …}` (SURVEY §1.2, mirroring the reference's tagged
    * union container, decoder.go:156-160); enums stringify; maps keep string
    * keys.
    *
    * Recursive schemas (a record containing itself — the reference's
    * `RecursiveSchema` named refs, zavro/schema.go:36-37): Spark schemas are
    * finite trees, so genuine recursion is UNROLLED to `recursiveFieldMaxDepth`
    * occurrences of the type and the recursive field is dropped past that
    * depth (deeper data decodes as absent) — the same contract as
    * spark-avro's `recursiveFieldMaxDepth` option. The default 0 keeps the
    * historical behavior: recursion is rejected with a clear error.
    */
  def sparkType(schema: Schema): DataType = sparkType(schema, 0)

  def sparkType(schema: Schema, recursiveFieldMaxDepth: Int): DataType =
    sparkType(schema, Map.empty, recursiveFieldMaxDepth)
      .getOrElse(throw new IllegalArgumentException(
        s"recursive Avro schema ${schema.getFullName} cannot map onto a Spark schema; " +
          "pass recursiveFieldMaxDepth >= 1 to unroll a bounded depth"))

  /** None = this is a recursive reference past the allowed depth (the
    * enclosing field is dropped).
    */
  private def sparkType(schema: Schema, seen: Map[String, Int],
      maxDepth: Int): Option[DataType] =
    schema.getType match {
      case Schema.Type.NULL => Some(NullType)
      case Schema.Type.BOOLEAN => Some(BooleanType)
      case Schema.Type.INT =>
        if (schema.getLogicalType != null && schema.getLogicalType.getName == "date") Some(DateType)
        else Some(IntegerType)
      case Schema.Type.LONG =>
        val lt: LogicalType = schema.getLogicalType
        if (lt != null && lt.getName == "timestamp-micros") Some(TimestampType) else Some(LongType)
      case Schema.Type.FLOAT => Some(FloatType)
      case Schema.Type.DOUBLE => Some(DoubleType)
      case Schema.Type.STRING | Schema.Type.ENUM => Some(StringType)
      case Schema.Type.BYTES | Schema.Type.FIXED => Some(BinaryType)
      case Schema.Type.ARRAY =>
        sparkType(schema.getElementType, seen, maxDepth).map(ArrayType(_))
      case Schema.Type.MAP =>
        sparkType(schema.getValueType, seen, maxDepth).map(MapType(StringType, _))
      case Schema.Type.RECORD =>
        val full = schema.getFullName
        val depth = seen.getOrElse(full, 0)
        if (depth > 0 && depth >= maxDepth) {
          if (maxDepth <= 0)
            throw new IllegalArgumentException(
              s"recursive Avro schema $full cannot map onto a Spark schema; " +
                "pass recursiveFieldMaxDepth >= 1 to unroll a bounded depth")
          None // depth budget spent: drop the recursive field
        } else {
          val inner = seen.updated(full, depth + 1)
          Some(StructType(schema.getFields.asScala.toSeq.flatMap { f =>
            val ft = optionalBranch(f.schema()).getOrElse(f.schema())
            sparkType(ft, inner, maxDepth).map(t =>
              StructField(f.name(), t, nullable = true))
          }))
        }
      case Schema.Type.UNION =>
        optionalBranch(schema) match {
          case Some(b) => sparkType(b, seen, maxDepth)
          case None =>
            // tag struct: selector + one nullable field per branch
            Some(StructType(StructField("tag", IntegerType, nullable = true) +:
              schema.getTypes.asScala.toSeq.zipWithIndex.flatMap { case (b, i) =>
                sparkType(b, seen, maxDepth).map(t =>
                  StructField(s"b$i", t, nullable = true))
              }))
        }
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
      case (MapType(StringType, vt, _), m: scala.collection.Map[_, _]) =>
        val out = new java.util.HashMap[String, Any](m.size)
        m.foreach { case (k, x) => out.put(k.toString, toAvro(x, vt, s.getValueType)) }
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

  /** [[rowToRecord]]'s Catalyst-internal mirror: InternalRow → GenericRecord
    * directly (UTF8String bytes → Avro Utf8, µs longs pass through for
    * timestamp-micros, ArrayData/MapData walked without materializing Scala
    * collections) — the encode expression's hot path. Skipping the external
    * `Row` plus the CatalystTypeConverters walk removes one full tree
    * materialization per record, symmetric with [[recordToInternal]] on the
    * decode side.
    */
  def internalToRecord(row: InternalRow, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val sf = schema.getField(f.name)
      val v = if (row.isNullAt(i)) null
        else toAvroInternal(row.get(i, f.dataType), f.dataType, sf.schema())
      rec.put(sf.pos(), v)
      i += 1
    }
    rec
  }

  private def toAvroInternal(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    // unwrap [null, T] unions
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else schema
    (dt, value) match {
      case (ByteType, v: java.lang.Byte)   => v.intValue()
      case (ShortType, v: java.lang.Short) => v.intValue()
      case (StringType, v: UTF8String) => new org.apache.avro.util.Utf8(v.getBytes)
      case (TimestampType | TimestampNTZType, v: java.lang.Long) => v // already µs
      case (DateType, v: java.lang.Integer) => v
      case (BinaryType, v: Array[Byte]) => ByteBuffer.wrap(v)
      case (ArrayType(et, _), v: org.apache.spark.sql.catalyst.util.ArrayData) =>
        val n = v.numElements()
        val out = new java.util.ArrayList[Any](n)
        var i = 0
        while (i < n) {
          out.add(if (v.isNullAt(i)) null
            else toAvroInternal(v.get(i, et), et, s.getElementType))
          i += 1
        }
        out
      case (MapType(StringType, vt, _), m: org.apache.spark.sql.catalyst.util.MapData) =>
        val ks = m.keyArray(); val vs = m.valueArray()
        val n = m.numElements()
        val out = new java.util.HashMap[String, Any](n)
        var i = 0
        while (i < n) {
          out.put(ks.getUTF8String(i).toString,
            if (vs.isNullAt(i)) null else toAvroInternal(vs.get(i, vt), vt, s.getValueType))
          i += 1
        }
        out
      case (nested: StructType, r: InternalRow) => internalToRecord(r, nested, s)
      case (_, v) => v // int/long/float/double/boolean primitives
    }
  }

  /** Decoded Avro datum → Spark value, guided by the target Spark type and
    * (when available) the writer field schema for union/enum dispatch.
    * Numeric writer→reader promotions (int→long, int/long/float→double,
    * int→float) match Avro schema-resolution widening — the superset reads
    * SchemaUnion.merge produces for heterogeneous pools.
    */
  private def fromAvro(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    // union handling against the writer schema (decoder.go:141-161)
    if (schema != null && schema.getType == Schema.Type.UNION) {
      optionalBranch(schema) match {
        case Some(b) => return fromAvro(value, dt, b)
        case None =>
          val selector = GenericData.get().resolveUnion(schema, value)
          val st = dt.asInstanceOf[StructType] // tag struct by construction
          val vals = new Array[Any](st.fields.length)
          vals(0) = selector
          // a branch absent from the target struct was dropped by recursive
          // unrolling (sparkType recursiveFieldMaxDepth) — decode as absent
          val branchField = st.fields.indexWhere(_.name == s"b$selector")
          if (branchField >= 0)
            vals(branchField) =
              fromAvro(value, st.fields(branchField).dataType, schema.getTypes.get(selector))
          return Row.fromSeq(vals.toSeq)
      }
    }
    (dt, value) match {
      case (ByteType, v: Integer)  => v.toByte
      case (ShortType, v: Integer) => v.toShort
      case (StringType, v)         => v.toString // Utf8 / enum symbol → String
      case (LongType, v: Integer)  => v.toLong
      case (DoubleType, v: Integer) => v.toDouble
      case (DoubleType, v: java.lang.Long) => v.toDouble
      case (DoubleType, v: java.lang.Float) => v.toDouble
      case (FloatType, v: Integer) => v.toFloat
      case (TimestampType, v: java.lang.Long) =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(v, 1000000L), Math.floorMod(v, 1000000L) * 1000L))
      case (TimestampNTZType, v: java.lang.Long) =>
        java.time.LocalDateTime.ofEpochSecond(v / 1000000L, ((v % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case (DateType, v: Integer) => java.time.LocalDate.ofEpochDay(v.toLong)
      case (BinaryType, v: ByteBuffer) =>
        val arr = new Array[Byte](v.remaining()); v.duplicate().get(arr); arr
      case (BinaryType, v: org.apache.avro.generic.GenericFixed) => v.bytes().clone()
      case (ArrayType(et, _), v: java.util.Collection[_]) =>
        val es = if (schema != null && schema.getType == Schema.Type.ARRAY) schema.getElementType else null
        v.asScala.map(x => fromAvro(x, et, es)).toSeq
      case (MapType(StringType, vt, _), m: java.util.Map[_, _]) =>
        val vs = if (schema != null && schema.getType == Schema.Type.MAP) schema.getValueType else null
        m.asScala.map { case (k, x) => k.toString -> fromAvro(x, vt, vs) }.toMap
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
      val wf = rec.getSchema.getField(f.name)
      if (wf == null) null
      else fromAvro(rec.get(f.name), f.dataType, wf.schema())
    })

  /** As [[recordToRow]] but producing Catalyst-internal values directly
    * (UTF8String / GenericInternalRow / GenericArrayData / µs longs) — the
    * decode expression's hot path. Skipping the external `Row` plus the
    * CatalystTypeConverters walk removes one full tree materialization per
    * record; timestamp-micros longs pass through untouched (InternalRow
    * stores µs) instead of round-tripping through java.sql.Timestamp.
    */
  def recordToInternal(rec: GenericRecord, st: StructType): InternalRow = {
    val vals = new Array[Any](st.fields.length)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val wf = rec.getSchema.getField(f.name)
      vals(i) =
        if (wf == null) null
        else fromAvroInternal(rec.get(f.name), f.dataType, wf.schema())
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private def fromAvroInternal(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    if (schema != null && schema.getType == Schema.Type.UNION) {
      optionalBranch(schema) match {
        case Some(b) => return fromAvroInternal(value, dt, b)
        case None =>
          val selector = GenericData.get().resolveUnion(schema, value)
          val st = dt.asInstanceOf[StructType] // tag struct by construction
          val vals = new Array[Any](st.fields.length)
          vals(0) = selector
          // a branch absent from the target struct was dropped by recursive
          // unrolling (sparkType recursiveFieldMaxDepth) — decode as absent
          val branchField = st.fields.indexWhere(_.name == s"b$selector")
          if (branchField >= 0)
            vals(branchField) = fromAvroInternal(
              value, st.fields(branchField).dataType, schema.getTypes.get(selector))
          return new GenericInternalRow(vals)
      }
    }
    (dt, value) match {
      case (ByteType, v: Integer)  => v.toByte
      case (ShortType, v: Integer) => v.toShort
      case (StringType, v)         => UTF8String.fromString(v.toString)
      case (LongType, v: Integer)  => v.toLong
      case (DoubleType, v: Integer) => v.toDouble
      case (DoubleType, v: java.lang.Long) => v.toDouble
      case (DoubleType, v: java.lang.Float) => v.toDouble
      case (FloatType, v: Integer) => v.toFloat
      case (TimestampType, v: java.lang.Long)    => v.longValue() // already µs
      case (TimestampNTZType, v: java.lang.Long) => v.longValue()
      case (DateType, v: Integer) => v.intValue()
      case (BinaryType, v: ByteBuffer) =>
        val arr = new Array[Byte](v.remaining()); v.duplicate().get(arr); arr
      case (BinaryType, v: org.apache.avro.generic.GenericFixed) => v.bytes().clone()
      case (ArrayType(et, _), v: java.util.Collection[_]) =>
        val es = if (schema != null && schema.getType == Schema.Type.ARRAY) schema.getElementType else null
        val out = new Array[Any](v.size())
        val it = v.iterator(); var i = 0
        while (it.hasNext) { out(i) = fromAvroInternal(it.next(), et, es); i += 1 }
        new GenericArrayData(out)
      case (MapType(StringType, vt, _), m: java.util.Map[_, _]) =>
        val vs = if (schema != null && schema.getType == Schema.Type.MAP) schema.getValueType else null
        val ks = new Array[Any](m.size()); val xs = new Array[Any](m.size())
        val it = m.entrySet().iterator(); var i = 0
        while (it.hasNext) {
          val e = it.next()
          ks(i) = UTF8String.fromString(e.getKey.toString)
          xs(i) = fromAvroInternal(e.getValue, vt, vs)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(xs))
      case (st: StructType, r: GenericRecord) => recordToInternal(r, st)
      case (_, v) => v
    }
  }

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

  // Executor-static caches (decoder.go:54-72, encoder.go:37-57 analogs):
  // parse results keyed by schema JSON, and id→parsed-Schema keyed by
  // (registry cache key, id) so an HttpSchemaRegistry is consulted once per
  // (executor, id) — not once per row, and never poisoned across distinct
  // registries (each in-memory test registry numbers ids from 1).
  @transient private lazy val parseCache =
    new scala.collection.concurrent.TrieMap[String, Schema]
  private def parsed(json: String): Schema =
    parseCache.getOrElseUpdate(json, new Schema.Parser().parse(json))

  // Access-ordered LRU (vs the r3 clear()-on-overflow, which stampeded the
  // registry with a full refetch wave whenever >4096 live (registry, id)
  // pairs existed, and raced its size check): the eldest entry is evicted on
  // insert, hot ids are never dropped. All map access is under the map's own
  // lock; the registry fetch happens OUTSIDE it, so a slow registry can't
  // serialize every decode task (a racing duplicate fetch is just redundant).
  private val IdCacheMax = 4096
  @transient private lazy val idCache =
    new java.util.LinkedHashMap[(String, Int), Schema](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Schema]): Boolean = size() > IdCacheMax
    }
  def writerSchemaFor(registry: SchemaRegistry, id: Int): Schema = {
    val key = (registry.cacheKey, id)
    val hit = idCache.synchronized(idCache.get(key))
    if (hit != null) hit
    else {
      val schema = parsed(registry.schemaById(id))
      idCache.synchronized(idCache.put(key, schema))
      schema
    }
  }

  /** Parsed schema through the executor-static parse cache (public for the
    * codec expressions in the sql shim package).
    */
  def parsedSchema(json: String): Schema = parsed(json)

  /** C2: struct column → Confluent wire bytes appended as `outCol`;
    * registers the derived schema under its RecordNameStrategy subject
    * (encoder.go:29-66). Registration happens once, on the driver, at plan
    * time — executors only serialize. The encode itself is a Catalyst
    * expression: the projection stays whole-stage-codegen'd, only this
    * column's bytes are built outside Tungsten (vs a mapPartitions pass,
    * which would ser/deser EVERY column through Row encoders).
    */
  def encodeDF(df: DataFrame, structCol: String, outCol: String,
      registry: SchemaRegistry, recordName: String = "value"): DataFrame = {
    val st = df.schema(structCol).dataType.asInstanceOf[StructType]
    val schemaJson = avroSchema(st, recordName).toString
    val id = registry.register(SchemaRegistry.subjectFor(schemaJson), schemaJson)
    df.withColumn(outCol,
      graft.plans.ConfluentFunctions.confluent_avro_encode(
        org.apache.spark.sql.functions.col(structCol), schemaJson, id))
  }

  /** C1: wire bytes column → decoded struct appended as `outCol`. A single
    * batch may carry many schema ids (SURVEY §7.4.2) — each row resolves its
    * own writer schema through the executor-static id cache. Runs as a
    * Catalyst expression with per-task reuse of the BinaryDecoder and, per
    * writer id, the DatumReader + record (zavro/decoder.go:74-221 cost
    * model); all other columns stay in Tungsten format.
    */
  def decodeDF(df: DataFrame, bytesCol: String, outCol: String,
      schema: StructType, registry: SchemaRegistry): DataFrame =
    df.withColumn(outCol,
      graft.plans.ConfluentFunctions.confluent_avro_decode(
        org.apache.spark.sql.functions.col(bytesCol), schema, registry))
}
