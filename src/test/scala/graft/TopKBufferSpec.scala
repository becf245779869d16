package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.{TopKBuffer, TopKByScore}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Direct invariants of the bounded top-k machinery behind the two-phase
  * similarity ranking: heap vs reference sort, NaN ordering, merge, and the
  * shuffle serde round-trip.
  */
class TopKBufferSpec extends AnyFunSuite {

  private def ordering: Ordering[Any] =
    (a: Any, b: Any) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])

  /** Reference semantics: sort by (score desc NaN-largest, payload asc), truncate. */
  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith { case ((sa, pa), (sb, pb)) =>
      val c = java.lang.Double.compare(sb, sa)
      if (c != 0) c < 0 else pa < pb
    }.take(k)

  test("bounded heap matches sort-truncate on random streams (incl. ties and NaN)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(8)
      val xs = (1 to n).map { i =>
        val s = rnd.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => 0.5 // force score ties → payload tiebreak
          case _ => rnd.nextDouble()
        }
        (s, rnd.nextInt(40).toLong)
      }
      val buf = new TopKBuffer(k, ordering)
      xs.foreach { case (s, p) => buf.insert(s, p) }
      val got = buf.sortedDesc().toSeq.map { case (s, p) => (s, p.asInstanceOf[Long]) }
      val want = reference(xs, k)
      // compare via total-order keys (NaN == NaN under Double.compare)
      def key(t: (Double, Long)) = (java.lang.Double.doubleToLongBits(t._1), t._2)
      assert(got.map(key) == want.map(key), s"trial $trial: $got vs $want")
    }
  }

  test("merge equals concatenated insert") {
    val rnd = new scala.util.Random(7)
    val xs = (1 to 120).map(_ => (rnd.nextDouble(), rnd.nextInt(50).toLong))
    val (l, r) = xs.splitAt(60)
    val a = new TopKBuffer(5, ordering)
    val b = new TopKBuffer(5, ordering)
    l.foreach { case (s, p) => a.insert(s, p) }
    r.foreach { case (s, p) => b.insert(s, p) }
    a.mergeFrom(b)
    val got = a.sortedDesc().toSeq.map { case (s, p) => (s, p.asInstanceOf[Long]) }
    assert(got == reference(xs, 5))
  }

  test("serde round-trips the buffer exactly (long and string payloads)") {
    val aggL = TopKByScore(BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), 4)
    val bufL = aggL.createAggregationBuffer()
    Seq((3.0, 30L), (1.0, 10L), (2.0, 20L), (5.0, 50L), (4.0, 40L))
      .foreach { case (s, p) => bufL.insert(s, p) }
    val backL = aggL.deserialize(aggL.serialize(bufL))
    assert(backL.sortedDesc().toSeq == bufL.sortedDesc().toSeq)

    val aggS = TopKByScore(BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, StringType, nullable = true), 3)
    val bufS = aggS.createAggregationBuffer()
    Seq((1.0, "aa"), (2.0, "bb"), (3.0, null))
      .foreach { case (s, p) => bufS.insert(s,
        if (p == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(p)) }
    val backS = aggS.deserialize(aggS.serialize(bufS))
    assert(backS.sortedDesc().toSeq.map { case (s, p) => (s, String.valueOf(p)) } ==
      bufS.sortedDesc().toSeq.map { case (s, p) => (s, String.valueOf(p)) })
  }

  test("update skips null scores; eval emits rank order") {
    val agg = TopKByScore(BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), 2)
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow(null, 1L))
    agg.update(buf, InternalRow(1.5, 2L))
    agg.update(buf, InternalRow(2.5, 3L))
    agg.update(buf, InternalRow(2.0, 4L))
    val arr = agg.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val ids = (0 until arr.numElements()).map(i => arr.getStruct(i, 2).getLong(1))
    assert(ids == Seq(3L, 4L)) // null-score row never entered
  }

  test("-0.0 and 0.0 scores tie: payload breaks it, like SQL row_number") {
    // Double.compare alone orders -0.0 < 0.0, which would let the 0.0 row
    // displace a smaller payload at the k boundary and reorder the output.
    val buf = new TopKBuffer(1, ordering)
    buf.insert(-0.0, 1L)
    buf.insert(0.0, 2L) // equal score under SQL semantics, larger payload → rejected
    assert(buf.sortedDesc().toSeq.map(_._2) == Seq(1L))

    val buf2 = new TopKBuffer(2, ordering)
    buf2.insert(0.0, 2L)
    buf2.insert(-0.0, 1L)
    assert(buf2.sortedDesc().toSeq.map(_._2) == Seq(1L, 2L)) // payload asc, not -0.0 last
  }
}
