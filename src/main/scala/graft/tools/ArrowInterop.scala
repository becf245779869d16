package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.graft.ArrowBridge
import org.apache.spark.sql.types._
import graft.GraftSession

/** Cross-implementation interop check for the Arrow IPC format:
  * `write <path>` dumps a sample typed frame as an IPC stream for an
  * external reader (pyarrow/DuckDB) to consume; `read <path>` parses an
  * externally-written stream and prints schema + rows. Used to pin that
  * consume -f arrow speaks the real wire format, not a dialect.
  */
object ArrowInterop {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import scala.jdk.CollectionConverters._
    args.toSeq match {
      case Seq("write", path) =>
        val schema = StructType.fromDDL(
          "id bigint, name string, score double, ok boolean, ts timestamp, tags array<string>")
        val t = java.sql.Timestamp.from(java.time.Instant.parse("2021-03-04T05:06:07.000008Z"))
        val df = spark.createDataFrame(Seq(
          Row(1L, "alpha", 1.5, true, t, Seq("x", "y")),
          Row(2L, null, null, false, null, Seq())).asJava, schema)
        Files.write(Paths.get(path), ArrowBridge.toIpcStream(df))
      case Seq("read", path) =>
        val df = ArrowBridge.fromIpcStream(spark, Files.readAllBytes(Paths.get(path)))
        println(df.schema.toDDL)
        df.collect().foreach(r => println(r.toString))
      case _ => sys.error("usage: ArrowInterop write|read <path>")
    }
    spark.stop()
  }
}
