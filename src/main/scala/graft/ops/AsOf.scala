package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row with
  * `right.ts <= left.ts` (inclusive) and equal keys — the standard
  * time-series enrichment Spark's DataFrame API lacks (reference scope
  * excludes it too, SURVEY §2.5; this is a beyond-reference extension like
  * the event-time windows).
  *
  * Spark-first formulation: ONE shuffle, no join at all. Tag both inputs,
  * union them, and take `last(right_payload, ignoreNulls)` over a
  * (key, ts, side)-ordered running window — right rows sort before left
  * rows at equal ts, so the match is inclusive. Compared to the naive
  * `left.join(right, keys && l.ts >= r.ts) + rank`, which explodes to the
  * full history per left row before pruning (quadratic in events-per-key at
  * 100 TB), this is linear: sort-shuffle on the key, one ordered pass per
  * partition. Keys are the parallelism unit; per-key history length only
  * affects the sorted run, never an intermediate blow-up.
  */
object AsOf {

  /** @param leftTs/rightTs event-time columns (any orderable type — with
    *   `nanosAsLong` parquet reads these are ns BIGINTs, which is fine:
    *   only ordering is used).
    * @param rightPayload right columns to carry onto matches; emitted as a
    *   struct column `asof` (null when no right row precedes the left row).
    * @param joinType "left" keeps unmatched left rows (asof is null);
    *   "inner" drops them.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      joinType: String = "left"): DataFrame = {
    require(joinType == "left" || joinType == "inner", s"bad joinType $joinType")
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_l"),
        lit(null).cast(payloadType).as("_r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(l.schema("_l").dataType).as("_l"),
        payload.as("_r")): _*)

    // Tiebreak: when several right rows share (key, ts), `last(_r)` would
    // otherwise pick a partition-order-dependent payload — ordering by the
    // payload's ORDERABLE columns makes the winner deterministic. Columns
    // with unorderable types (maps) are excluded from the sort key rather
    // than rejected, so map payloads keep working; if NO payload column is
    // orderable the tiebreak is a documented no-op (nondeterministic under
    // duplicate right timestamps, as before r4). Left rows carry _r = null
    // and sort first within their (ts, side) group, which is irrelevant:
    // every left row at a ts sees the same last-right-payload.
    val orderablePayload = right.select(payload.as("_r")).schema.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.filter(f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col("_r").getField(f.name).asc_nulls_first)
      .toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col("_ts"), col("_side")) ++ orderablePayload: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("asof"))
    if (joinType == "inner") matched.filter(col("asof").isNotNull) else matched
  }
}
