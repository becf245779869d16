package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, IntegerType}

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
