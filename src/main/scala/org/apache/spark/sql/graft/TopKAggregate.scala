package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate — `top_k_by_score(score, payload, k)` — the
  * two-phase distributed top-k primitive behind `graft.ops.Similarity`.
  *
  * Returns `array<struct<score:double, payload:P>>`, sorted by
  * (score DESC, payload ASC) and truncated to k. Because it is a
  * TypedImperativeAggregate, Spark runs it through ObjectHashAggregate with a
  * PARTIAL mode per input partition: each map task keeps at most k candidates
  * per group in a bounded heap, so the shuffle for a group carries
  * k × partitions rows instead of the whole candidate set. That removes the
  * single-reducer-per-query bottleneck of ranking with
  * `Window.partitionBy(query_id)`, where every candidate row for a query
  * lands on one task (the round-3 scale-killer in per-query top-k: a handful
  * of tasks each sorting ~|corpus| rows at 100 TB).
  *
  * Ordering matches `row_number() OVER (ORDER BY score DESC, payload ASC)`:
  * NaN scores count as larger than any number and equal to each other
  * (Spark's nan-safe comparison semantics, same as the window ordering the
  * oracle uses). Rows with a NULL score or NULL payload are dropped — a null
  * similarity is never a neighbor, and a null payload has nothing to rank
  * (it would also make the tiebreak comparator partial).
  *
  * The heap is worst-first (min score, then max payload at the head), so an
  * insert into a full buffer is one comparison + O(log k) sift; merge streams
  * one buffer into the other the same way.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  def this(score: Expression, payload: Expression, kExpr: Expression) =
    this(score, payload, {
      require(kExpr.foldable, "top_k_by_score: k must be a literal")
      kExpr.eval().asInstanceOf[Number].intValue()
    })

  require(k >= 1, s"top_k_by_score: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", payload.dataType, nullable = true))),
    containsNull = false)

  /** Payload types the shuffle codec ([[writePayload]]/[[readPayload]])
    * handles — checked at analysis time so an unsupported type is a clear
    * plan error, not an UnsupportedOperationException mid-shuffle.
    */
  private def supportedPayload(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
         BooleanType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    // structs ride the shuffle as UnsafeRow bytes; orderability of the
    // fields (the ASC tiebreak) is enforced by checkForOrderingExpr below
    case st: StructType => st.fields.forall(f => supportedPayload(f.dataType))
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a double score, got ${score.dataType.sql}")
    else if (!supportedPayload(payload.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports primitive/string/binary/struct payloads, got ${payload.dataType.sql}")
    else TypeUtils.checkForOrderingExpr(payload.dataType, prettyName)
  }

  @transient private lazy val payloadOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(payload.dataType)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, payloadOrdering)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      // copy payloads that may alias reused row/array buffers
      val p = payload.eval(input) match {
        case u: UTF8String => u.copy()
        case b: Array[Byte] => b.clone()
        case r: InternalRow => r.copy()
        case v => v
      }
      if (p != null) buffer.insert(s.asInstanceOf[Double], p)
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.sortedDesc()
    val out = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) {
      out(i) = new GenericInternalRow(Array[Any](sorted(i)._1, sorted(i)._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- shuffle codec: compact type-directed binary, not Java serialization
  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { (s, p) =>
      out.writeDouble(s)
      out.writeBoolean(p == null)
      if (p != null) writePayload(out, p)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val p = if (in.readBoolean()) null else readPayload(in)
      buf.insert(s, p)
      i += 1
    }
    buf
  }

  private def writePayload(out: DataOutputStream, p: Any): Unit = payload.dataType match {
    case LongType | TimestampType | TimestampNTZType => out.writeLong(p.asInstanceOf[Long])
    case IntegerType | DateType => out.writeInt(p.asInstanceOf[Int])
    case ShortType => out.writeShort(p.asInstanceOf[Short].toInt)
    case ByteType => out.writeByte(p.asInstanceOf[Byte].toInt)
    case DoubleType => out.writeDouble(p.asInstanceOf[Double])
    case FloatType => out.writeFloat(p.asInstanceOf[Float])
    case BooleanType => out.writeBoolean(p.asInstanceOf[Boolean])
    case StringType =>
      val b = p.asInstanceOf[UTF8String].getBytes
      out.writeInt(b.length); out.write(b)
    case BinaryType =>
      val b = p.asInstanceOf[Array[Byte]]
      out.writeInt(b.length); out.write(b)
    case _: StructType =>
      val b = structProj(p.asInstanceOf[InternalRow]).getBytes
      out.writeInt(b.length); out.write(b)
    case other => throw new UnsupportedOperationException(
      s"top_k_by_score: unsupported payload type ${other.sql}")
  }

  @transient private lazy val structProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      payload.dataType.asInstanceOf[StructType])

  private def readPayload(in: DataInputStream): Any = payload.dataType match {
    case LongType | TimestampType | TimestampNTZType => in.readLong()
    case IntegerType | DateType => in.readInt()
    case ShortType => in.readShort()
    case ByteType => in.readByte()
    case DoubleType => in.readDouble()
    case FloatType => in.readFloat()
    case BooleanType => in.readBoolean()
    case StringType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b); UTF8String.fromBytes(b)
    case BinaryType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b); b
    case st: StructType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(st.length)
      row.pointTo(b, b.length)
      row
    case other => throw new UnsupportedOperationException(
      s"top_k_by_score: unsupported payload type ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), payload = newChildren(1))
}

/** Bounded worst-first binary heap of (score, payload) pairs.
  *
  * "Worse" = lower score, NaN-safe (NaN counts as the LARGEST score, matching
  * Spark comparison/ordering semantics); score ties break toward the LARGER
  * payload being worse, so the kept set and the final (score DESC,
  * payload ASC) order agree exactly with `row_number` ranking.
  */
final class TopKBuffer(k: Int, payloadOrdering: Ordering[Any]) {
  private val scores = new Array[Double](k)
  private val payloads = new Array[Any](k)
  private var n = 0

  def size: Int = n

  /** a strictly worse than b? (lower score; tie → larger payload)
    *
    * The `+ 0.0` folds -0.0 onto +0.0 (NaN and every other value pass
    * through unchanged): `Double.compare` alone orders -0.0 < 0.0, but
    * Spark's ordering and SQL engines treat them equal — without the fold,
    * tied ±0.0 scores would skip the payload tiebreak and the kept set at
    * the k boundary could diverge from row_number semantics.
    */
  private def worse(sa: Double, pa: Any, sb: Double, pb: Any): Boolean = {
    val c = java.lang.Double.compare(sa + 0.0, sb + 0.0) // NaN > everything, NaN == NaN
    if (c != 0) c < 0 else payloadOrdering.compare(pa, pb) > 0
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val parent = (i - 1) >> 1
      if (worse(scores(i), payloads(i), scores(parent), payloads(parent))) {
        swap(i, parent); i = parent
      } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < n && worse(scores(l), payloads(l), scores(w), payloads(w))) w = l
      if (r < n && worse(scores(r), payloads(r), scores(w), payloads(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val p = payloads(i); payloads(i) = payloads(j); payloads(j) = p
  }

  def insert(score: Double, payload: Any): Unit = {
    if (n < k) {
      scores(n) = score; payloads(n) = payload; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), payloads(0), score, payload)) {
      scores(0) = score; payloads(0) = payload
      siftDown(0)
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.foreach((s, p) => insert(s, p))

  def foreach(f: (Double, Any) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), payloads(i)); i += 1 }
  }

  /** Contents by (score DESC, payload ASC) — the output rank order. */
  def sortedDesc(): Array[(Double, Any)] = {
    val out = new Array[(Double, Any)](n)
    var i = 0
    while (i < n) { out(i) = (scores(i), payloads(i)); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[(Double, Any)] {
      override def compare(a: (Double, Any), b: (Double, Any)): Int = {
        val c = java.lang.Double.compare(b._1 + 0.0, a._1 + 0.0) // ±0.0 tie → payload
        if (c != 0) c else payloadOrdering.compare(a._2, b._2)
      }
    })
    out
  }
}
