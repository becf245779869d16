package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): the embedding compression +
  * search path that makes 100 TB of vectors scannable — each d-dim float
  * vector becomes m byte-ish codes (one per subspace), and asymmetric
  * distance scoring reads only the codes plus a per-query lookup table.
  *
  * Two expressions:
  *
  * - `pq_encode(vec, books)` — assign each of the vector's m contiguous
  *   subvectors to its sub-codebook's nearest centroid by SQUARED L2 (the PQ
  *   metric: subspace L2 is what makes full-vector reconstruction error —
  *   and hence inner products / cosines against the reconstruction —
  *   decompose exactly into per-subspace terms; per-subspace cosine would
  *   not). Output: array<int> of dense centroid ids, one per subspace.
  * - `pq_adc_score(codes, dots, norms, qnorm)` — the ADC scan kernel:
  *   `cos(q, x̂) = Σ_s dots[s][code_s] / (qnorm · sqrt(Σ_s norms[s][code_s]))`
  *   where x̂ is the (never materialized) reconstruction, `dots[s][j] =
  *   <q_s, c_{s,j}>` is the per-query lookup table and `norms[s][j] =
  *   |c_{s,j}|²` is query-independent. O(m) per candidate — the whole point:
  *   scoring touches m ints + 2m table reads instead of d floats.
  *
  * Both are CodegenFallback like [[NearestCentroids]]: the per-row work is a
  * fused primitive loop (encode) or m array reads (score); one boxed call
  * per row is amortized across it. Accumulation is strictly left-to-right
  * (subspace 0..m-1; within a subspace, element order), so scores are
  * bit-comparable with a SQL oracle that sums in the same order.
  */
object PqExpressions {
  /** Decoded flat codebook: per subspace, dense-id-indexed centroid planes.
    * `planes(s)(j)` is null for a dense id absent from the codebook (an
    * emptied training cell); its slot is never produced by `pq_encode`.
    */
  final class Books(val m: Int, val subLens: Array[Int],
      val planes: Array[Array[Array[Double]]]) {
    val totalLen: Int = subLens.sum
  }
}

/** `pq_encode(vec, books)` with `books: array<struct<sub:int, cid:int,
  * cv:array<numeric>>>` (the flat collected codebook; `cid` dense 0..k-1 per
  * subspace, holes allowed). Returns `array<int>` of length m — the dense
  * centroid id per subspace, argmin squared-L2, ties → lowest cid — or null
  * when the vector is null, contains a null element, or its length differs
  * from the codebook's total subvector length.
  *
  * The codebook child is the single build-side row of a 1-row broadcast join
  * (see `Similarity.pqEncode`) — constant for the whole plan — so it is
  * decoded once per task and cheaply re-verified per row by a partial
  * fingerprint (subspace count, (sub,cid) id sets, plane lengths, first
  * elements), the same guard-with-documented-limits as [[NearestCentroids]]:
  * a per-row-varying codebook differing ONLY beyond element 0 under
  * identical ids would reuse the cache, a shape the intended 1-row-broadcast
  * construction cannot produce.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  private def bookStruct: StructType = right.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def subIdx: Int = bookStruct.fieldIndex("sub")
  private def cidIdx: Int = bookStruct.fieldIndex("cid")
  private def cvIdx: Int = bookStruct.fieldIndex("cv")

  override def checkInputDataTypes(): TypeCheckResult = {
    def numericArray(dt: DataType): Boolean = dt match {
      case ArrayType(et, _) => et.isInstanceOf[NumericType]
      case _ => false
    }
    val ok = numericArray(left.dataType) && (right.dataType match {
      case ArrayType(st: StructType, _) =>
        st.getFieldIndex("sub").exists(i => st.fields(i).dataType == IntegerType) &&
          st.getFieldIndex("cid").exists(i => st.fields(i).dataType == IntegerType) &&
          st.getFieldIndex("cv").exists(i => numericArray(st.fields(i).dataType))
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<numeric>, array<struct<sub:int, cid:int, " +
        s"cv:array<numeric>>>), got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val vt =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ct =
    bookStruct.fields(cvIdx).dataType.asInstanceOf[ArrayType].elementType

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

  // decoded-once cache (per task), fingerprint-guarded like NearestCentroids
  @transient private var cacheBooks: PqExpressions.Books = _
  @transient private var cacheSubs: Array[Int] = _
  @transient private var cacheCids: Array[Int] = _
  @transient private var cacheLens: Array[Int] = _
  @transient private var cacheV0: Array[Long] = _

  private def entryFingerprint(row: org.apache.spark.sql.catalyst.InternalRow): (Int, Long) =
    if (row.isNullAt(cvIdx)) (-1, java.lang.Double.doubleToLongBits(Double.NaN))
    else {
      val cv = row.getArray(cvIdx)
      val n = cv.numElements()
      val v0 = if (n > 0 && !cv.isNullAt(0)) elem(cv, ct, 0) else Double.NaN
      (n, java.lang.Double.doubleToLongBits(v0))
    }

  private def decode(books: ArrayData): Unit = {
    val n = books.numElements()
    cacheSubs = new Array[Int](n)
    cacheCids = new Array[Int](n)
    cacheLens = new Array[Int](n)
    cacheV0 = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val row = books.getStruct(i, bookStruct.length)
      if (row.isNullAt(subIdx) || row.isNullAt(cidIdx))
        throw new IllegalArgumentException(s"$prettyName: null sub/cid in codebook")
      cacheSubs(i) = row.getInt(subIdx)
      cacheCids(i) = row.getInt(cidIdx)
      val fp = entryFingerprint(row)
      cacheLens(i) = fp._1
      cacheV0(i) = fp._2
      if (cacheSubs(i) < 0 || cacheCids(i) < 0)
        throw new IllegalArgumentException(s"$prettyName: negative sub/cid in codebook")
      if (cacheSubs(i) + 1 > m) m = cacheSubs(i) + 1
      i += 1
    }
    if (m == 0) throw new IllegalArgumentException(s"$prettyName: empty codebook")
    val subLens = new Array[Int](m)
    java.util.Arrays.fill(subLens, -1)
    val maxCid = new Array[Int](m)
    i = 0
    while (i < n) {
      val row = books.getStruct(i, bookStruct.length)
      if (row.isNullAt(cvIdx))
        throw new IllegalArgumentException(s"$prettyName: null centroid vector")
      val cv = row.getArray(cvIdx)
      val s = cacheSubs(i)
      if (subLens(s) == -1) subLens(s) = cv.numElements()
      else if (subLens(s) != cv.numElements())
        throw new IllegalArgumentException(
          s"$prettyName: inconsistent centroid lengths in subspace $s")
      if (cacheCids(i) + 1 > maxCid(s)) maxCid(s) = cacheCids(i) + 1
      i += 1
    }
    var s = 0
    while (s < m) {
      if (subLens(s) == -1)
        throw new IllegalArgumentException(s"$prettyName: subspace $s has no centroids")
      s += 1
    }
    val planes = Array.tabulate(m)(s0 => new Array[Array[Double]](maxCid(s0)))
    i = 0
    while (i < n) {
      val row = books.getStruct(i, bookStruct.length)
      val cv = row.getArray(cvIdx)
      val len = cv.numElements()
      val plane = new Array[Double](len)
      var j = 0
      var ok = true
      while (j < len && ok) {
        if (cv.isNullAt(j)) ok = false
        else { plane(j) = elem(cv, ct, j); j += 1 }
      }
      if (!ok) throw new IllegalArgumentException(s"$prettyName: null centroid element")
      if (planes(cacheSubs(i))(cacheCids(i)) != null)
        throw new IllegalArgumentException(
          s"$prettyName: duplicate (sub=${cacheSubs(i)}, cid=${cacheCids(i)}) in codebook")
      planes(cacheSubs(i))(cacheCids(i)) = plane
      i += 1
    }
    cacheBooks = new PqExpressions.Books(m, subLens, planes)
  }

  private def cacheValid(books: ArrayData): Boolean = {
    if (cacheBooks == null || cacheSubs.length != books.numElements()) return false
    var i = 0
    while (i < cacheSubs.length) {
      val row = books.getStruct(i, bookStruct.length)
      if (row.isNullAt(subIdx) || row.isNullAt(cidIdx)) return false
      if (row.getInt(subIdx) != cacheSubs(i) || row.getInt(cidIdx) != cacheCids(i))
        return false
      val fp = entryFingerprint(row)
      if (fp._1 != cacheLens(i) || fp._2 != cacheV0(i)) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(vecAny: Any, booksAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val books = booksAny.asInstanceOf[ArrayData]
    if (!cacheValid(books)) decode(books)
    val b = cacheBooks
    val n = vec.numElements()
    if (n != b.totalLen) return null

    // decode the vector once (null element → null result)
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      xs(i) = elem(vec, vt, i)
      i += 1
    }

    val codes = new Array[Any](b.m)
    var off = 0
    var s = 0
    while (s < b.m) {
      val plane = b.planes(s)
      val len = b.subLens(s)
      var bestCid = -1
      var bestDist = Double.NaN
      var j = 0
      while (j < plane.length) {
        val c = plane(j)
        if (c != null) {
          var dist = 0.0
          var t = 0
          while (t < len) {
            val d = xs(off + t) - c(t)
            dist += d * d
            t += 1
          }
          // strictly-less keeps the LOWEST cid on exact ties; NaN (possible
          // only from infinite inputs) loses to any real distance
          if (bestCid == -1 || dist < bestDist ||
            (java.lang.Double.isNaN(bestDist) && !java.lang.Double.isNaN(dist))) {
            bestCid = j; bestDist = dist
          }
          j += 1
        } else j += 1
      }
      codes(s) = bestCid // >= 0: decode() rejects empty subspaces
      off += len
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc_score(codes, dots, norms, qnorm)` — asymmetric-distance cosine:
  * `Σ_s dots[s][codes[s]] / (qnorm · sqrt(Σ_s norms[s][codes[s]]))`, sums
  * strictly left-to-right over subspaces. Null codes / null table slot /
  * out-of-range code → null (a code can only be out of range against a
  * MISMATCHED query's tables — `pqTopK` builds both from one codebook).
  * Zero-norm reconstructions divide by zero like `cosine_sim` does (NaN/Inf
  * rather than a silent drop).
  */
case class PqAdcScore(codes: Expression, dots: Expression,
    norms: Expression, qnorm: Expression)
    extends Expression with CodegenFallback {
  override def prettyName: String = "pq_adc_score"
  override def children: Seq[Expression] = Seq(codes, dots, norms, qnorm)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def dd(dt: DataType): Boolean = dt match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val ok = (codes.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }) && dd(dots.dataType) && dd(norms.dataType) && qnorm.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<int>, array<array<double>>, " +
        s"array<array<double>>, double), got ${children.map(_.dataType.sql).mkString(", ")}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cAny = codes.eval(input)
    val dAny = dots.eval(input)
    val nAny = norms.eval(input)
    val qAny = qnorm.eval(input)
    if (cAny == null || dAny == null || nAny == null || qAny == null) return null
    val cs = cAny.asInstanceOf[ArrayData]
    val dt = dAny.asInstanceOf[ArrayData]
    val nt = nAny.asInstanceOf[ArrayData]
    val m = cs.numElements()
    if (dt.numElements() != m || nt.numElements() != m) return null
    var dot = 0.0
    var n2 = 0.0
    var s = 0
    while (s < m) {
      if (cs.isNullAt(s) || dt.isNullAt(s) || nt.isNullAt(s)) return null
      val code = cs.getInt(s)
      val dRow = dt.getArray(s)
      val nRow = nt.getArray(s)
      if (code < 0 || code >= dRow.numElements() || code >= nRow.numElements()) return null
      if (dRow.isNullAt(code) || nRow.isNullAt(code)) return null
      dot += dRow.getDouble(code)
      n2 += nRow.getDouble(code)
      s += 1
    }
    dot / (qAny.asInstanceOf[Double] * math.sqrt(n2))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcScore =
    copy(codes = newChildren(0), dots = newChildren(1),
      norms = newChildren(2), qnorm = newChildren(3))
}
