package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — `point ∈ [lo, hi)` per key — the other
  * join shape Spark's planner has no efficient physical strategy for: a
  * plain non-equi condition compiles to BroadcastNestedLoop / cartesian,
  * which is quadratic per key and a non-starter at 100 TB.
  *
  * Spark-first scale path: BIN BUCKETING. Every interval explodes into the
  * fixed-width bins it overlaps; every point maps to exactly one bin; the
  * join becomes an EQUI-join on (key..., bin) that Catalyst/AQE plan like
  * any other shuffle join, followed by the exact containment filter. Each
  * qualifying (interval, point) pair meets in exactly one bin — the point's
  * — so no dedup is needed. Cost: intervals are replicated
  * ceil(len/binWidth)+1 times; pick binWidth near the typical interval
  * length so the blow-up is ~2× while bins stay selective.
  */
object RangeJoin {

  /** Both inputs must use disjoint column names (select/alias first).
    * `lo`/`hi`/`pt` are integral epoch columns (hi exclusive); `binWidth`
    * in the same unit.
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      keyCols: Seq[String], lo: String, hi: String, pt: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ib = intervals.withColumn("_bin",
      explode(sequence(expr(s"$lo div ${binWidth}L"), expr(s"($hi - 1) div ${binWidth}L"))))
    val pb = points.withColumn("_bin", expr(s"$pt div ${binWidth}L"))
    ib.join(pb, keyCols :+ "_bin")
      .filter(col(pt) >= col(lo) && col(pt) < col(hi))
      .drop("_bin")
  }
}
