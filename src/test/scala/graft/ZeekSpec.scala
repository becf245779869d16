package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.{Commands, Zeek}
import graft.pool.Pool

/** Self-golden pins for the zeek TSV format (consume -f zeek / produce
  * *.zeek). The reference repo carries no zeek fixtures; Zeek.scala
  * documents the public-zeek-convention choices these goldens encode.
  */
class ZeekSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType.fromDDL(
    "_path string, ts timestamp, uid string, id struct<orig_h: string, resp_p: bigint>, " +
      "duration double, established boolean, tags array<string>")

  private def frame(rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2019-06-27T18:35:55.100000Z"))

  test("golden: header block, dotted fields, zeek scalar spellings") {
    val lines = Zeek.write(frame(
      Row("conn", t0, "C1", Row("10.0.0.1", 443L), 1.5, true, Seq("a", "b")),
      Row("conn", null, "C2", Row(null, null), null, false, Seq())))
    assert(lines == Seq(
      "#separator \\x09",
      "#set_separator\t,",
      "#empty_field\t(empty)",
      "#unset_field\t-",
      "#path\tconn",
      "#fields\tts\tuid\tid.orig_h\tid.resp_p\tduration\testablished\ttags",
      "#types\ttime\tstring\tstring\tint\tdouble\tbool\tvector[string]",
      "1561660555.100000\tC1\t10.0.0.1\t443\t1.5\tT\ta,b",
      "-\tC2\t-\t-\t-\tF\t(empty)"))
  }

  test("escaping: tabs, commas in vector elements, unset/empty collisions") {
    val s = StructType.fromDDL("v string, xs array<string>")
    val df = spark.createDataFrame(Seq(
      Row("has\ttab", Seq("a,b", "-", "")),
      Row("-", Seq[String]()),
      Row("(empty)", null),
      Row("", Seq("plain"))).asJava, s)
    val lines = Zeek.write(df)
    assert(lines.drop(6) == Seq(
      "has\\x09tab\ta\\x2cb,\\x2d,(empty)",
      "\\x2d\t(empty)",
      "\\x28empty)\t-",
      "(empty)\tplain"))
    // and they read back to the original values (unset xs drops the field)
    val json = Zeek.toJsonLines(lines.mkString("\n"))
    assert(json == Seq(
      """{"v":"has\ttab","xs":["a,b","-",""]}""",
      """{"v":"-","xs":[]}""",
      """{"v":"(empty)"}""",
      """{"v":"","xs":["plain"]}"""))
  }

  test("a mid-stream _path change starts a new header block") {
    val lines = Zeek.write(frame(
      Row("conn", t0, "C1", Row("h", 1L), 0.5, true, Seq("x")),
      Row("dns", t0, "C2", Row("h", 2L), 0.5, false, Seq("y"))))
    assert(lines.count(_ == "#separator \\x09") == 2)
    assert(lines.contains("#path\tconn") && lines.contains("#path\tdns"))
  }

  test("reader: #path injects _path, dotted fields nest, types map to JSON") {
    val json = Zeek.toJsonLines(Zeek.write(frame(
      Row("conn", t0, "C1", Row("10.0.0.1", 443L), 1.5, true, Seq("a", "b")))).mkString("\n"))
    assert(json == Seq(
      """{"_path":"conn","ts":1561660555.100000,"uid":"C1",""" +
        """"id":{"orig_h":"10.0.0.1","resp_p":443},"duration":1.5,""" +
        """"established":true,"tags":["a","b"]}"""))
  }

  test("produce loads a .zeek file; values match the equivalent jsonl load") {
    val dir = Files.createTempDirectory("zeek")
    val zeekFile = dir.resolve("batch.zeek")
    Files.write(zeekFile, Zeek.write(frame(
      Row("conn", t0, "C1", Row("10.0.0.1", 443L), 1.5, true, Seq("a", "b")),
      Row("conn", null, "C2", Row(null, 80L), null, false, Seq())))
      .mkString("\n").getBytes("UTF-8"))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    val n = Commands.produce(spark, pool, zeekFile.toString, "Z")
    assert(n == 2)
    val vals = pool.read().selectExpr("value.uid", "value.id.resp_p", "value._path",
      "value.established", "value.ts").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2), r.getBoolean(3))).toSet
    assert(vals == Set(("C1", 443L, "conn", true), ("C2", 80L, "conn", false)))
    // zeek time is epoch seconds: survives as a double column
    val ts = pool.read().selectExpr("value.ts").collect()
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(ts == Seq(1561660555.1))
  }

  test("consume -f zeek renders a pool's merged-schema stream") {
    val dir = Files.createTempDirectory("zeekpool")
    val f = dir.resolve("batch.jsonl")
    Files.write(f, Seq(
      """{"id": 1, "ok": true, "name": "x"}""",
      """{"id": 2, "ok": false, "name": null}""").mkString("\n").getBytes("UTF-8"))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    Commands.produce(spark, pool, f.toString, "T")
    val lines = Commands.consume(pool, format = "zeek")
    assert(lines.contains(
      "#fields\tkafka.topic\tkafka.partition\tkafka.offset\tkey\tvalue.id\tvalue.name\tvalue.ok\t_kind"))
    assert(lines.contains("#types\tstring\tint\tint\tstring\tint\tstring\tbool\tstring"))
    assert(lines.exists(_.startsWith("T\t0\t0\t-\t1\tx\tT")))
    assert(lines.exists(_.startsWith("T\t0\t1\t-\t2\t-\tF")))
  }
}
