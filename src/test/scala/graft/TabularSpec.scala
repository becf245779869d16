package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.{Commands, Tabular}
import graft.pool.Pool

/** Self-golden pins for the tabular consume formats (csv, tsv, text, table,
  * line). The reference repo has no fixtures for these zed output formats,
  * so these goldens define the contract (Tabular.scala documents the
  * zed-doc-guided choices they encode).
  */
class TabularSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  // two envelopes with a nested value record, a null field, and a string
  // that needs csv quoting
  private def fixturePool(): Pool = {
    val dir = Files.createTempDirectory("tabular")
    val f = dir.resolve("batch.jsonl")
    Files.write(f, Seq(
      """{"id": 1, "name": "plain", "note": "a,b \"q\"", "score": 1.5}""",
      """{"id": 2, "name": "tab\tchar", "note": null, "score": null}"""
    ).mkString("\n").getBytes("UTF-8"))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    Commands.produce(spark, pool, f.toString, "T")
    pool
  }

  test("csv: flattened dotted header, RFC-4180 quoting, null as empty cell") {
    val lines = Commands.consume(fixturePool(), format = "csv")
    assert(lines.head ==
      "kafka.topic,kafka.partition,kafka.offset,key,value.id,value.name,value.note,value.score,_kind")
    assert(lines(1) == "T,0,0,,1,plain,\"a,b \"\"q\"\"\",1.5,record")
    assert(lines(2) == "T,0,1,,2,tab\tchar,,,record")
    assert(lines.size == 3)
  }

  test("tsv: tab separators with backslash escapes for embedded tabs") {
    val lines = Commands.consume(fixturePool(), format = "tsv")
    assert(lines.head.split("\t").toSeq == Seq(
      "kafka.topic", "kafka.partition", "kafka.offset", "key",
      "value.id", "value.name", "value.note", "value.score", "_kind"))
    assert(lines(1) == "T\t0\t0\t\t1\tplain\ta,b \"q\"\t1.5\trecord")
    // the embedded tab is escaped, so the line still splits into 9 cells
    assert(lines(2) == "T\t0\t1\t\t2\ttab\\tchar\t\t\trecord")
    assert(lines(2).split("\t", -1).length == 9)
  }

  test("text: values only, tab-separated, null as -") {
    val lines = Commands.consume(fixturePool(), format = "text")
    assert(lines == Seq(
      "T\t0\t0\t-\t1\tplain\ta,b \"q\"\t1.5\trecord",
      "T\t0\t1\t-\t2\ttab\\tchar\t-\t-\trecord"))
  }

  test("table: header plus width-padded columns") {
    val lines = Commands.consume(fixturePool(), format = "table")
    assert(lines.head.startsWith("kafka.topic kafka.partition kafka.offset"))
    // every row splits on runs of spaces into the same cells as text mode
    assert(lines.size == 3)
    val hdr = lines.head.split("\\s+").toSeq
    assert(hdr.last == "_kind" && hdr.head == "kafka.topic")
    // padded columns: the topic cell is padded to the header's width
    assert(lines(1).startsWith("T           0               0"))
    assert(lines.forall(l => !l.endsWith(" ")))
  }

  test("line: records render as single-line ZSON with nulls present") {
    val lines = Commands.consume(fixturePool(), format = "line")
    assert(lines.head ==
      """{kafka:{topic:"T",partition:0,offset:0},key:null,value:{id:1,name:"plain",note:"a,b \"q\"",score:1.5},_kind:"record"}""")
    assert(lines(1).contains("note:null") && lines(1).contains("score:null"))
  }

  test("line: a lone string column is written raw") {
    val s = spark
    import s.implicits._
    val df = Seq("alpha", "beta").toDF("s")
    assert(Tabular.line(df) == Seq("alpha", "beta"))
  }

  test("table escapes embedded newlines/tabs so each element stays one aligned line") {
    val s = spark
    import s.implicits._
    val df = Seq(("a\nb", 1L), ("c\td", 2L)).toDF("s", "n")
    val lines = Tabular.table(df)
    assert(lines.forall(l => !l.contains("\n") && !l.contains("\t")))
    assert(lines(1).startsWith("a\\nb") && lines(2).startsWith("c\\td"))
  }

  test("line restores the (=name) decorator for stored _type fields, like -f zson") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val st = StructType.fromDDL("_type string, seqno bigint")
    assert(Tabular.zsonText(Row("cursor", 2L), st) == "{seqno:2}(=cursor)")
    // a null _type is a plain field, exactly as Zson.fromJsonLine treats it
    assert(Tabular.zsonText(Row(null, 2L), st) == "{_type:null,seqno:2}")
  }

  test("zsonText spells composites, bytes and timestamps natively") {
    import org.apache.spark.sql.types._
    assert(Tabular.zsonText(Seq(1, 2, 3), ArrayType(IntegerType)) == "[1,2,3]")
    assert(Tabular.zsonText(Array[Byte](0x0a, 0x00, -1), BinaryType) == "0x0a00ff")
    assert(Tabular.zsonText(java.sql.Timestamp.from(
      java.time.Instant.parse("2026-01-02T03:04:05Z")), TimestampType) ==
      "2026-01-02T03:04:05Z")
    assert(Tabular.zsonText(Map("k" -> 1), MapType(StringType, IntegerType)) ==
      """|{"k":1}|""")
  }
}
