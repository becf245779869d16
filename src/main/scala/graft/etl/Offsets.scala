package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Globally-consecutive offset assignment that never leaves the DataFrame
  * plan (etl/pipeline.go:127-164's numbering, minus its driver-memory TODO).
  */
object Offsets {

  /** Number `df`'s rows `start, start+1, …` in their current
    * (partition index, within-partition) order, appended as `outCol`.
    *
    * Replaces the former `rdd.zipWithIndex` hop, which forced every output
    * row through an InternalRow→Row conversion pass and planted an
    * ExistingRDD scan in the plan (killing downstream Tungsten/codegen).
    * Here `monotonically_increasing_id()` supplies the within-partition row
    * index (its low 33 bits, assigned in row order), the per-partition counts
    * are one partial-aggregated groupBy over `spark_partition_id()` —
    * P rows, metadata-scale, same driver footprint as zipWithIndex's own
    * count job — and the driver-side prefix sums broadcast-join back onto the
    * rows. The data path stays in Tungsten end to end; the only data-sized
    * work is one map-side count and one broadcast hash join.
    *
    * `df` must be persisted (both the counts job and the output job must see
    * the same partitioning/order — the same contract zipWithIndex had).
    */
  def assignSequential(df: DataFrame, start: Long, outCol: String): DataFrame =
    assignSequentialCounted(df, start, outCol)._1

  /** As [[assignSequential]], also returning the row count — the counts job
    * runs either way, so callers that need the total (Etl.run's record
    * count, append sizing) get it for free instead of re-counting.
    */
  def assignSequentialCounted(df: DataFrame, start: Long, outCol: String): (DataFrame, Long) = {
    val localMask = (1L << 33) - 1 // MonotonicallyIncreasingID: pid<<33 | row#
    val withId = df
      .withColumn("_g_pid", spark_partition_id())
      .withColumn("_g_local", monotonically_increasing_id().bitwiseAND(lit(localMask)))
    val counts = withId.groupBy("_g_pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = start
    val bases = counts.map { case (pid, c) => val b = acc; acc += c; (pid, b) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val baseDf = bases.toDF("_g_pid", "_g_base")
    val out = withId.join(broadcast(baseDf), Seq("_g_pid"))
      .withColumn(outCol, col("_g_base") + col("_g_local"))
      .select(df.columns.map(col).toSeq :+ col(outCol): _*)
    (out, counts.map(_._2).sum)
  }
}
