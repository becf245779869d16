package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.graft.ArrowBridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Commands
import graft.pool.Pool

/** Arrow IPC stream format (consume -f arrow / produce *.arrow). The writer
  * is arrow-java's own ArrowStreamWriter and the reader is Spark's
  * fromIPCStream — two independent implementations cross-checking each
  * other, so a round-trip pin here is a real interop test, not a
  * self-golden.
  */
class ArrowSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType.fromDDL(
    "id bigint, name string, score double, ok boolean, ts timestamp, " +
      "blob binary, tags array<string>, nested struct<a: bigint, b: string>")

  private val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2021-03-04T05:06:07.000008Z"))

  private def frame() = spark.createDataFrame(Seq(
    Row(1L, "alpha", 1.5, true, t0, Array[Byte](1, 2, 3), Seq("x", "y"), Row(10L, "in")),
    Row(2L, null, null, false, null, null, Seq(), Row(null, "deep")),
    Row(3L, "", 0.0, null, t0, Array[Byte](), null, null)).asJava, schema)

  test("IPC stream round-trips every column type bit-exactly, including µs timestamps") {
    val bytes = ArrowBridge.toIpcStream(frame())
    // a real stream: starts with the 0xFFFFFFFF continuation + schema message
    assert(bytes.length > 8)
    val back = ArrowBridge.fromIpcStream(spark, bytes)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // render binary cells by content (Row.toString prints array identity)
    def text(r: Row): String = r.toSeq.map {
      case b: Array[Byte] => b.mkString("<", ",", ">")
      case x => String.valueOf(x)
    }.mkString("|")
    val a = frame().collect().map(text).sorted
    val b = back.collect().map(text).sorted
    assert(a.toSeq == b.toSeq)
    // µs precision survives (ts carries .000008)
    val ts = back.filter("id = 1").collect()(0).getAs[java.sql.Timestamp]("ts")
    assert(ts.getNanos == 8000)
  }

  test("multi-batch streams land identical to single-batch") {
    val big = spark.range(0, 5000).selectExpr("id", "cast(id % 7 as string) AS tag")
    val one = ArrowBridge.toIpcStream(big)
    val many = ArrowBridge.toIpcStream(big, maxRecordsPerBatch = 256)
    assert(ArrowBridge.fromIpcStream(spark, many).collect().toSeq ==
      ArrowBridge.fromIpcStream(spark, one).collect().toSeq)
    assert(many.length > one.length) // more batch headers, same data
  }

  test("produce loads an .arrow file with its typed schema intact") {
    val dir = Files.createTempDirectory("arrow")
    val f = dir.resolve("batch.arrow")
    Files.write(f, ArrowBridge.toIpcStream(frame()))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    val n = Commands.produce(spark, pool, f.toString, "A")
    assert(n == 3)
    val v = pool.read().selectExpr("value.id", "value.ts", "value.nested.b", "value.tags")
      .orderBy("id").collect()
    assert(v(0).getAs[java.sql.Timestamp]("ts").getNanos == 8000)
    assert(v(1).getAs[String]("b") == "deep")
    assert(v(0).getAs[scala.collection.Seq[String]]("tags") == Seq("x", "y"))
  }

  test("consume -f arrow emits a stream that reads back to the pool contents") {
    val dir = Files.createTempDirectory("arrowpool")
    val f = dir.resolve("batch.jsonl")
    Files.write(f, Seq(
      """{"id": 1, "name": "x"}""",
      """{"id": 2, "name": "y"}""").mkString("\n").getBytes("UTF-8"))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    Commands.produce(spark, pool, f.toString, "T")
    val bytes = Commands.consumeArrow(pool)
    val back = ArrowBridge.fromIpcStream(spark, bytes)
    assert(back.count() == 2)
    assert(back.selectExpr("value.name").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("x", "y"))
    assert(back.schema.fieldNames.toSeq == Seq("kafka", "key", "value", "_kind"))
  }

  test("consume -f parquet emits one file that reads back to the pool contents") {
    val dir = Files.createTempDirectory("pqpool")
    val f = dir.resolve("batch.jsonl")
    Files.write(f, Seq(
      """{"id": 1, "name": "x"}""",
      """{"id": 2, "name": "y"}""").mkString("\n").getBytes("UTF-8"))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    Commands.produce(spark, pool, f.toString, "T")
    val bytes = Commands.consumeParquet(pool)
    val out = dir.resolve("out.parquet")
    Files.write(out, bytes)
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 2)
    assert(back.selectExpr("value.name").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("x", "y"))
    assert(back.schema.fieldNames.toSeq == Seq("kafka", "key", "value", "_kind"))
  }
}
