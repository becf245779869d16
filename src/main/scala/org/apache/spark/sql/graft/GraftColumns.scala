package org.apache.spark.sql.graft

import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType, StructType}

/** Spark-sql-package shim: Expression↔Column conversion and the wire-header
  * expressions, which need `private[sql]` types (`AbstractDataType`,
  * `ExpressionUtils`). One small file in the sql package — the standard
  * pattern for Spark-native extension libraries; the public surface is
  * `graft.plans`.
  */
object GraftColumnsBridge {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Deterministically release the storage blocks of a `localCheckpoint`ed
    * frame. `Dataset.unpersist` is a silent no-op for checkpointed frames:
    * the checkpoint persists the underlying RDD directly, outside the
    * CacheManager's plan registry, so `uncacheQuery` finds nothing and the
    * blocks survive until the ContextCleaner garbage-collects the RDD.
    * Iterative loops that checkpoint per round (connected components,
    * Lloyd rounds) call this on the superseded round instead, keeping
    * executor storage one frame deep by construction.
    *
    * Accepts ONLY the checkpointed frame itself — the analyzed plan's root
    * must be the checkpoint's `LogicalRDD`. A frame merely DERIVED from a
    * checkpoint (select/filter/join over it) is a no-op by design: its plan
    * can reference other frames' still-live checkpoints, and since
    * localCheckpoint truncates lineage, unpersisting those through a shared
    * leaf would make the other frames unrecoverable. Safe on
    * non-checkpointed frames (root isn't a LogicalRDD → nothing to do).
    */
  def releaseCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Block until the listener bus has delivered all queued events — lets
    * measurement probes (tools/) read listener-accumulated task metrics
    * deterministically after a job. Probe-only; never on a hot path.
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** RDD blocks currently MEMORY-resident across executors (block-manager
    * master, driver metadata). Seeds the bench's evict-transition tracker
    * at listener registration: a block persisted BEFORE the listener
    * attached would otherwise have its first genuine memory→disk-only fall
    * uncounted — the r14-ADVICE blind spot. Probe-only.
    */
  def inMemoryRddBlocks(spark: org.apache.spark.sql.SparkSession): Seq[org.apache.spark.storage.BlockId] =
    org.apache.spark.SparkEnv.get.blockManager.master.getStorageStatus.toSeq
      .flatMap(_.rddBlocks.collect {
        case (id, st) if st.storageLevel.useMemory && st.memSize > 0 => id
      })

  /** SNAPSHOT of the calling thread's Spark local properties (job group,
    * job description, scheduler pool — the thread-local context every
    * submitted job is attributed to). `getLocalProperties` is
    * `private[spark]`, hence this bridge. Cloned: the live Properties
    * object is mutated by later `setJobDescription` calls on the caller.
    */
  def cloneLocalProperties(sc: org.apache.spark.SparkContext): java.util.Properties =
    sc.getLocalProperties.clone().asInstanceOf[java.util.Properties]

  /** Install `props` as THIS thread's Spark local properties — the worker-
    * thread half of caller-context propagation (see
    * [[graft.ops.ConcurrentJobs]]): jobs the thread submits are then
    * attributed (and cancellable) exactly as the caller's own would be.
    */
  def setLocalProperties(sc: org.apache.spark.SparkContext,
      props: java.util.Properties): Unit =
    sc.setLocalProperties(props)
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
    // internal-format values directly — no external Row, no converter walk
    graft.codec.ConfluentAvro.recordToInternal(rec, target)
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentAvroDecode =
    copy(child = newChild)
}

/** Confluent wire encode as a Catalyst expression: struct → header+body
  * bytes under the (plan-time registered) schema id. Same CodegenFallback
  * rationale as decode; the datum writer, buffer, and encoder are reused
  * per task. The input stays in Catalyst-internal format end to end
  * (InternalRow → GenericRecord directly) — no external Row, no
  * CatalystTypeConverters walk, symmetric with the decode side.
  */
case class ConfluentAvroEncode(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[AbstractDataType] = Seq(StructType)
  override def prettyName: String = "confluent_avro_encode"

  @transient private lazy val childType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val schema =
    graft.codec.ConfluentAvro.parsedSchema(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val buf = new java.io.ByteArrayOutputStream(256)
  @transient private lazy val header =
    java.nio.ByteBuffer.allocate(4).putInt(schemaId).array()
  @transient private var enc: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    buf.reset()
    buf.write(graft.codec.ConfluentAvro.MagicByte)
    buf.write(header)
    enc = EncoderFactory.get().directBinaryEncoder(buf, enc)
    writer.write(graft.codec.ConfluentAvro.internalToRecord(row, childType, schema), enc)
    enc.flush()
    buf.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentAvroEncode =
    copy(child = newChild)
}

/** Cosine similarity of two numeric arrays — `cosine_sim(a, b)` — as a
  * native whole-stage-codegen expression.
  *
  * The declarative alternative (`aggregate(zip_with(a, b, _*_), ...)`)
  * builds on higher-order functions, which are CodegenFallback in Spark:
  * every evaluation leaves the generated loop, allocates a zipped array, and
  * boxes each lambda application. Inside a pairwise dedup join or a top-k
  * scan, that is the per-row hot path — here the dot product and both norms
  * are one fused primitive loop over the unsafe array data, no allocation.
  *
  * Semantics mirror the HOF formulation exactly (left-to-right double
  * accumulation, so results are bit-identical to the previous plan and the
  * DuckDB oracle): null input, length mismatch, or a null element → null;
  * zero vectors → NaN (0/0), as before. Any numeric element type is accepted
  * and widened to double — like the HOF form's implicit casts, so integer or
  * quantized (decimal) vectors keep working.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType, ArrayType)
  override def prettyName: String = "cosine_sim"
  // Nullable regardless of children: length mismatch / null element → null.
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = super.checkInputDataTypes()
    if (!ok.isSuccess) ok
    else if (Seq(left, right).forall(e => elemType(e).isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs numeric array inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"cosine_sim over $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (tx, ty) = (elemType(left), elemType(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = get(x, tx, i); val yi = get(y, ty, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def acc(t: DataType, arr: String, i: String): String = t match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType => s"(double) $arr.getFloat($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case other => throw new UnsupportedOperationException(s"cosine_sim over $other")
    }
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    final double xv = ${acc(elemType(left), x, i)};
         |    final double yv = ${acc(elemType(right), y, i)};
         |    $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
