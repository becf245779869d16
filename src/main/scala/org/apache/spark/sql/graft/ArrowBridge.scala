package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.arrow.{ArrowConverters, ArrowWriter}

/** Arrow IPC stream bridge built on Spark's own (package-private) Arrow
  * machinery — the same `ArrowWriter` field writers and `fromIPCStream`
  * reader that back `toPandas`, so every Spark type Arrow interop supports
  * (timestamps, decimals, nested arrays/structs/maps, binary) is supported
  * here without reimplementing a vector codec. Lives in the spark.sql
  * package tree for `private[sql]` access; graft.cli.Commands wraps it as
  * the `arrow` consume/produce format.
  *
  * The produced bytes are ONE standard Arrow IPC stream (schema header,
  * record batches, end-of-stream marker) — readable by pyarrow, arrow-cpp,
  * arrow-go, DuckDB, etc. Collection happens driver-side, matching the
  * consume contract (a terminal stdout-scale read); batches are bounded by
  * `maxRecordsPerBatch` so memory stays flat while writing.
  */
object ArrowBridge {

  def toIpcStream(df: DataFrame, maxRecordsPerBatch: Int = 1 << 16): Array[Byte] = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    val tz = cdf.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rows = cdf.queryExecution.executedPlan.executeCollect()
    val writer = ArrowWriter.create(cdf.schema, tz,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val out = new ByteArrayOutputStream()
    val stream = new ArrowStreamWriter(writer.root, null, Channels.newChannel(out))
    try {
      stream.start()
      rows.grouped(maxRecordsPerBatch).foreach { batch =>
        batch.foreach(writer.write)
        writer.finish()
        stream.writeBatch()
        writer.reset()
      }
      stream.end()
    } finally {
      stream.close()
      writer.root.close()
    }
    out.toByteArray
  }

  def fromIpcStream(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val (iter, schema) = ArrowConverters.fromIPCStream(bytes)
    // rows come out of a reused columnar batch: copy before buffering
    val rows = try iter.map(_.copy()).toIndexedSeq finally iter.close()
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(cs.sparkContext.parallelize(rows, 1), schema)
  }
}
