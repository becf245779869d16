package graft.pool

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The envelope every synced record is wrapped in (fifo/consumer.go:54,
  * 123-147; README.md:124-133):
  *
  * {{{ {kafka:{topic,partition,offset}, key:<nullable>, value:<record>} }}}
  *
  * Named marker types — `(=done)`, `(=cursor)` (etl/build.go:90,
  * design.md:120-125) — have no Spark counterpart, so a `_kind` discriminator
  * column carries the type identity (SURVEY §1.1): `record` | `done` |
  * `cursor`. Heterogeneous pools (records + markers in one table,
  * etl/pipeline.go:101-115) are a superset schema with nullable absent
  * fields.
  */
object Envelope {
  val KindCol = "_kind"
  val KindRecord = "record"
  val KindDone = "done"
  val KindCursor = "cursor"

  /** Wrap a flat DataFrame into envelopes. `topic`/`offset` are expressions
    * so callers can derive them from data (tests) or Kafka metadata columns
    * (streaming).
    */
  def wrap(df: DataFrame, topic: Column, offset: Column, key: Column, valueCols: Seq[String]): DataFrame =
    df.select(
      struct(
        topic.cast("string").as("topic"),
        lit(0L).as("partition"),
        offset.cast("long").as("offset")).as("kafka"),
      key.as("key"),
      struct(valueCols.map(col): _*).as("value"),
      lit(KindRecord).as(KindCol))

  def records(df: DataFrame): DataFrame = df.filter(col(KindCol) === KindRecord)
  def markers(df: DataFrame): DataFrame = df.filter(col(KindCol) === KindDone)
}
