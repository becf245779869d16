package org.apache.spark.sql.graft

import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, IntegerType, StructType}

/** Spark-sql-package shim: Expression↔Column conversion and the wire-header
  * expressions, which need `private[sql]` types (`AbstractDataType`,
  * `ExpressionUtils`). One small file in the sql package — the standard
  * pattern for Spark-native extension libraries; the public surface is
  * `graft.plans`.
  */
object GraftColumnsBridge {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}

object ConfluentHeaderError {
  /** Raise the wire-format error (reference zavro/decoder.go:36-38 analog). */
  def badHeader(length: Int): Nothing =
    throw new IllegalArgumentException(s"bad Confluent wire header (len=$length)")
}

/** Schema id of a Confluent wire-format value — `confluent_schema_id(bytes)`.
  *
  * Wire format (zavro/decoder.go:39-42): byte 0 = magic 0x00, bytes 1-4 =
  * big-endian uint32 schema id, rest = Avro body. Implemented as a native
  * codegen expression: header parsing stays inside the whole-stage-codegen
  * loop (vs. a Scala UDF's per-row boxing + closure dispatch) — the custom
  * Catalyst work item identified in SURVEY §4.
  */
case class ConfluentSchemaId(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def prettyName: String = "confluent_schema_id"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 6 || b(0) != 0) ConfluentHeaderError.badHeader(b.length)
    ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 8) | (b(4) & 0xff)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      |if ($b.length < 6 || $b[0] != 0) {
      |  org.apache.spark.sql.graft.ConfluentHeaderError.badHeader($b.length);
      |}
      |${ev.value} = (($b[1] & 0xff) << 24) | (($b[2] & 0xff) << 16) | (($b[3] & 0xff) << 8) | ($b[4] & 0xff);
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ConfluentSchemaId =
    copy(child = newChild)
}

/** Avro body of a wire-format value (5-byte header stripped) —
  * `confluent_body(bytes)`.
  */
case class ConfluentBody(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def prettyName: String = "confluent_body"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 6 || b(0) != 0) ConfluentHeaderError.badHeader(b.length)
    java.util.Arrays.copyOfRange(b, 5, b.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      |if ($b.length < 6 || $b[0] != 0) {
      |  org.apache.spark.sql.graft.ConfluentHeaderError.badHeader($b.length);
      |}
      |${ev.value} = java.util.Arrays.copyOfRange($b, 5, $b.length);
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ConfluentBody =
    copy(child = newChild)
}

/** Confluent wire decode as a Catalyst expression: bytes → struct typed as
  * `target`. CodegenFallback: the surrounding projection stays inside
  * whole-stage codegen and only this column's value is produced via `eval` —
  * unlike a `df.mapPartitions` codec pass, no other column leaves Tungsten
  * format. Per-task (deserialized-instance) caches reuse the BinaryDecoder
  * and, per writer id, the DatumReader + record, matching the reference's
  * streaming decoder cost model (zavro/decoder.go:74-221).
  */
case class ConfluentAvroDecode(child: Expression, target: StructType,
    registry: graft.codec.SchemaRegistry)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = target
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def prettyName: String = "confluent_avro_decode"

  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(target)
  @transient private lazy val readers =
    new java.util.HashMap[Integer, GenericDatumReader[GenericRecord]]
  @transient private lazy val reusable = new java.util.HashMap[Integer, GenericRecord]
  @transient private var dec: BinaryDecoder = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val id = Integer.valueOf(graft.codec.ConfluentAvro.schemaIdOf(bytes))
    var reader = readers.get(id)
    if (reader == null) {
      reader = new GenericDatumReader[GenericRecord](
        graft.codec.ConfluentAvro.writerSchemaFor(registry, id))
      readers.put(id, reader)
    }
    dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, dec)
    val rec = reader.read(reusable.get(id), dec)
    reusable.put(id, rec)
    toCatalyst(graft.codec.ConfluentAvro.recordToRow(rec, target))
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentAvroDecode =
    copy(child = newChild)
}

/** Confluent wire encode as a Catalyst expression: struct → header+body
  * bytes under the (plan-time registered) schema id. Same CodegenFallback
  * rationale as decode; the datum writer, buffer, and encoder are reused
  * per task.
  */
case class ConfluentAvroEncode(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[AbstractDataType] = Seq(StructType)
  override def prettyName: String = "confluent_avro_encode"

  @transient private lazy val childType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(childType)
  @transient private lazy val schema =
    graft.codec.ConfluentAvro.parsedSchema(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val buf = new java.io.ByteArrayOutputStream(256)
  @transient private lazy val header =
    java.nio.ByteBuffer.allocate(4).putInt(schemaId).array()
  @transient private var enc: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    val row = toScala(input).asInstanceOf[org.apache.spark.sql.Row]
    buf.reset()
    buf.write(graft.codec.ConfluentAvro.MagicByte)
    buf.write(header)
    enc = EncoderFactory.get().directBinaryEncoder(buf, enc)
    writer.write(graft.codec.ConfluentAvro.rowToRecord(row, childType, schema), enc)
    enc.flush()
    buf.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentAvroEncode =
    copy(child = newChild)
}
