package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `nearest_centroids(vec, cents, nprobe)` — the IVF cell-assignment kernel:
  * given a vector and the (broadcast) centroid array
  * `array<struct<cid, cv:array<numeric>>>`, return the `nprobe` nearest
  * centroids as `array<struct<cos:double, cid>>`, ordered by
  * (cos DESC, cid ASC); NaN counts as the largest cosine and a null cosine
  * (length mismatch / null element) sorts last — exactly the
  * `array_sort(transform(...))` comparator semantics this replaces.
  *
  * Why a dedicated expression: the declarative form runs inside higher-order
  * functions, which are CodegenFallback — per CENTROID per row it allocates a
  * struct, boxes a lambda frame, and re-enters interpreted eval. At
  * production cell counts (K≈4096) that is thousands of allocations per
  * corpus row on the similarity flagship path. Here the whole scan is one
  * fused primitive loop (dot + norms accumulated in locals, bounded
  * insertion into an nprobe-sized buffer); the expression itself is
  * CodegenFallback, costing ONE boxed call per row — amortized across the
  * K-element inner loop, which is where all the time goes.
  */
case class NearestCentroids(left: Expression, right: Expression, nprobe: Int)
    extends BinaryExpression with CodegenFallback {
  require(nprobe >= 1, s"nearest_centroids: nprobe must be >= 1, got $nprobe")

  override def prettyName: String = "nearest_centroids"
  override def nullable: Boolean = true

  private def centStruct: StructType = right.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def cidIdx: Int = centStruct.fieldIndex("cid")
  private def cvIdx: Int = centStruct.fieldIndex("cv")
  private def cidType: DataType = centStruct.fields(cidIdx).dataType
  private def vecElem(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def numericArray(dt: DataType): Boolean = dt match {
      case ArrayType(et, _) => et.isInstanceOf[NumericType]
      case _ => false
    }
    val ok = left.dataType match {
      case dt if numericArray(dt) => right.dataType match {
        case ArrayType(st: StructType, _) =>
          st.getFieldIndex("cid").isDefined && st.getFieldIndex("cv").exists(i =>
            numericArray(st.fields(i).dataType))
        case _ => false
      }
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<numeric>, array<struct<cid, cv:array<numeric>>>), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cos", DoubleType, nullable = true),
      StructField("cid", cidType, nullable = true))),
    containsNull = false)

  @transient private lazy val cidOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(cidType)
  @transient private lazy val vt = vecElem(left.dataType)
  @transient private lazy val ct = vecElem(centStruct.fields(cvIdx).dataType)

  private def elem(a: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"$prettyName over $other")
  }

  /** (cos desc NaN-largest nulls-last, cid asc nulls-first): is (ca, ia)
    * better than (cb, ib)? cid ASC NULLS FIRST matches Spark's default asc
    * null ordering in the window this kernel replaces; comparing null cids
    * explicitly here also keeps `cidOrdering` (which assumes non-null
    * inputs) from NPE-ing on a null centroid id with tied cosines.
    */
  private def better(ca: java.lang.Double, ia: Any, cb: java.lang.Double, ib: Any): Boolean = {
    if (ca == null && cb == null) return cidLess(ia, ib)
    if (ca == null) return false
    if (cb == null) return true
    val c = java.lang.Double.compare(ca + 0.0, cb + 0.0) // NaN > everything; -0.0 == 0.0
    if (c != 0) c > 0 else cidLess(ia, ib)
  }

  private def cidLess(ia: Any, ib: Any): Boolean =
    if (ia == null) ib != null // nulls first: null < non-null, null == null
    else ib != null && cidOrdering.compare(ia, ib) < 0

  /** Per-task decode of the centroid array: ids, primitive double planes,
    * and each plane's accumulated square-norm sum — hoisted out of the
    * per-row path (the r4.0 version re-walked the array-of-structs with
    * type-dispatched accessors per centroid per row). Decoded once per
    * expression instance: the centroid child is the single build-side row of
    * the 1-row broadcast join `ivfAssignN` constructs, constant for the
    * whole plan (accessor wrappers change identity per row, so decode is
    * keyed to first use). Each row cheaply re-verifies the centroid IDS plus
    * a per-centroid vector fingerprint (length + first element) against the
    * cache (O(k) reads vs k×dims of dot-product work) and re-decodes on any
    * mismatch. The fingerprint is deliberately partial: a per-row-varying
    * centroid column — outside this expression's intended construction —
    * is caught when ids, lengths, or first elements change, but vectors
    * that differ ONLY beyond element 0 under identical ids would still
    * reuse the cache; `ivfAssignN`'s query-constant build side cannot
    * produce that shape. A plane with a
    * null/absent vector decodes to null (its cosine is always null). Norm
    * sums accumulate left-to-right, so the final cosines are bit-identical
    * to the single-loop CosineSimilarity contract.
    */
  @transient private var cacheIds: Array[Any] = _
  @transient private var cachePlanes: Array[Array[Double]] = _
  @transient private var cacheNormSums: Array[Double] = _
  // per-centroid vector fingerprint (length + first-element bits): catches
  // same-ids-different-vectors misuse unless vectors differ only beyond
  // element 0; -1/NaN encodes a null cv
  @transient private var cacheVecLen: Array[Int] = _
  @transient private var cacheVec0: Array[Long] = _

  private def vecFingerprint(cent: org.apache.spark.sql.catalyst.InternalRow): (Int, Long) =
    if (cent.isNullAt(cvIdx)) (-1, java.lang.Double.doubleToLongBits(Double.NaN))
    else {
      val cv = cent.getArray(cvIdx)
      val m = cv.numElements()
      val v0 = if (m > 0 && !cv.isNullAt(0)) elem(cv, ct, 0) else Double.NaN
      (m, java.lang.Double.doubleToLongBits(v0))
    }

  private def decodeCents(cents: ArrayData): Unit = {
    val k = cents.numElements()
    cacheIds = new Array[Any](k)
    cachePlanes = new Array[Array[Double]](k)
    cacheNormSums = new Array[Double](k)
    cacheVecLen = new Array[Int](k)
    cacheVec0 = new Array[Long](k)
    var i = 0
    while (i < k) {
      val cent = cents.getStruct(i, centStruct.length)
      cacheIds(i) = if (cent.isNullAt(cidIdx)) null else cent.get(cidIdx, cidType)
      val fp = vecFingerprint(cent)
      cacheVecLen(i) = fp._1
      cacheVec0(i) = fp._2
      if (!cent.isNullAt(cvIdx)) {
        val cv = cent.getArray(cvIdx)
        val m = cv.numElements()
        var ok = true
        val plane = new Array[Double](m)
        var nb = 0.0
        var j = 0
        while (j < m && ok) {
          if (cv.isNullAt(j)) ok = false
          else { plane(j) = elem(cv, ct, j); nb += plane(j) * plane(j); j += 1 }
        }
        if (ok) { cachePlanes(i) = plane; cacheNormSums(i) = nb }
      }
      i += 1
    }
  }

  private def cacheValid(cents: ArrayData): Boolean = {
    if (cacheIds == null || cacheIds.length != cents.numElements()) return false
    var i = 0
    while (i < cacheIds.length) {
      val cent = cents.getStruct(i, centStruct.length)
      val cid = if (cent.isNullAt(cidIdx)) null else cent.get(cidIdx, cidType)
      val cached = cacheIds(i)
      if (!(if (cached == null) cid == null else cid != null && cidOrdering.compare(cached, cid) == 0))
        return false
      val fp = vecFingerprint(cent)
      if (fp._1 != cacheVecLen(i) || fp._2 != cacheVec0(i)) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(vecAny: Any, centsAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val cents = centsAny.asInstanceOf[ArrayData]
    if (!cacheValid(cents)) decodeCents(cents)
    val ids = cacheIds; val planes = cachePlanes; val normSums = cacheNormSums
    val k = ids.length
    val keep = math.min(nprobe, k)

    // vector decoded once per row; its square-norm sum accumulates
    // left-to-right exactly like the fused single loop did
    val n = vec.numElements()
    val xs = new Array[Double](n)
    var vOk = true
    var na = 0.0
    var i = 0
    while (i < n && vOk) {
      if (vec.isNullAt(i)) vOk = false
      else { xs(i) = elem(vec, vt, i); na += xs(i) * xs(i); i += 1 }
    }
    val sqrtNa = math.sqrt(na)

    // bounded insertion sort, best-first — nprobe is small (1..4 typical)
    val topCos = new Array[java.lang.Double](keep)
    val topCid = new Array[Any](keep)
    var size = 0
    i = 0
    while (i < k) {
      val plane = planes(i)
      val cos: java.lang.Double =
        if (!vOk || plane == null || plane.length != n) null
        else {
          var dot = 0.0
          var j = 0
          while (j < n) { dot += xs(j) * plane(j); j += 1 }
          dot / (sqrtNa * math.sqrt(normSums(i)))
        }
      val cid = ids(i)
      if (size < keep || better(cos, cid, topCos(size - 1), topCid(size - 1))) {
        var j = if (size < keep) size else size - 1
        while (j > 0 && better(cos, cid, topCos(j - 1), topCid(j - 1))) {
          topCos(j) = topCos(j - 1); topCid(j) = topCid(j - 1)
          j -= 1
        }
        topCos(j) = cos; topCid(j) = cid
        if (size < keep) size += 1
      }
      i += 1
    }
    val out = new Array[Any](size)
    i = 0
    while (i < size) {
      out(i) = new GenericInternalRow(Array[Any](topCos(i), topCid(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(left = newLeft, right = newRight)
}
