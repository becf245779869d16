package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.{Commands, Zson}
import graft.pool.Pool

/** ZSON-lite reader against the shapes the reference's demo fixtures use
  * (demo/consume-1.zson, batch-1.zson, staging-1.zson): multi-line
  * concatenated records, // comments, unquoted field names, trailing commas,
  * and `(=type)` record decorators.
  */
class ZsonSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val fixture =
    """// Invoices
      |// ID customer
      |{
      |  kafka: {
      |    topic: "Invoices",
      |    offset: 1
      |  },
      |  value: {
      |    op:"r",
      |    after:{
      |      ID:100,
      |      customer: "Alice",
      |    }
      |  }
      |}
      |{kafka:{topic:"Invoices",offset:2},value:{op:"u",after:{ID:101,customer:"Bob"}}}
      |{seqno:2}(=cursor)
      |""".stripMargin

  test("transpiles demo-fixture shapes to JSON lines") {
    val lines = Zson.toJsonLines(fixture)
    assert(lines.length == 3)
    assert(lines(0) ==
      """{"kafka":{"topic":"Invoices","offset":1},"value":{"op":"r","after":{"ID":100,"customer":"Alice"}}}""")
    assert(lines(1) ==
      """{"kafka":{"topic":"Invoices","offset":2},"value":{"op":"u","after":{"ID":101,"customer":"Bob"}}}""")
    assert(lines(2) == """{"_type":"cursor","seqno":2}""")
  }

  test("arrays, escapes, bare tokens, primitive decorators") {
    val lines = Zson.toJsonLines(
      """{xs:[1,2.5,-3e2,],s:"q\"uo\\te",flag:true,nil:null,word:pending,n:1(uint32)}""")
    assert(lines == Seq(
      """{"xs":[1,2.5,-3e2],"s":"q\"uo\\te","flag":true,"nil":null,"word":"pending","n":1}"""))
  }

  test("unsupported set literals raise a clear error") {
    val e = intercept[IllegalArgumentException](Zson.toJsonLines("""{m:|["a"]|}"""))
    assert(e.getMessage.contains("not supported"))
  }

  test("edge shapes: glued comments, declared _type vs decorator, bytes literals") {
    // a // comment glued to a bare token ends the token
    assert(Zson.toJsonLines("{n:1//note\n,m:2}") == Seq("""{"n":1,"m":2}"""))
    // a declared top-level _type wins over the decorator (no duplicate keys)
    assert(Zson.toJsonLines("""{_type:"x",a:1}(=y)""") == Seq("""{"_type":"x","a":1}"""))
    // stacked decorators: first wins, still a single _type key
    assert(Zson.toJsonLines("""{a:1}(=y)(=z)""") == Seq("""{"_type":"y","a":1}"""))
    // nested _type does NOT block the decorator
    assert(Zson.toJsonLines("""{a:{_type:"inner"}}(=y)""") ==
      Seq("""{"_type":"y","a":{"_type":"inner"}}"""))
    // bytes literals error instead of decoding as strings
    val e = intercept[IllegalArgumentException](Zson.toJsonLines("{b:0x0102}"))
    assert(e.getMessage.contains("bytes"))
  }

  test("parses every reference demo fixture (when present)") {
    val demo = java.nio.file.Paths.get("/root/reference/demo")
    assume(Files.isDirectory(demo))
    import scala.jdk.CollectionConverters._
    val listing = Files.list(demo)
    val zsons = try listing.iterator().asScala.toSeq
      .filter(_.toString.endsWith(".zson")) finally listing.close()
    assert(zsons.nonEmpty)
    zsons.foreach { p =>
      val lines = Zson.toJsonLines(new String(Files.readAllBytes(p), "UTF-8"))
      assert(lines.nonEmpty, s"$p produced no records")
      // every line must be valid JSON for the Spark reader
      val df = spark.read.json(
        spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING))
      assert(df.count() == lines.length, s"$p: corrupt rows")
      assert(!df.columns.contains("_corrupt_record"), s"$p: invalid JSON emitted")
    }
  }

  test("produce loads a .zson file into a pool") {
    val dir = Files.createTempDirectory("zson")
    val f = dir.resolve("batch.zson")
    Files.write(f, fixture.getBytes("UTF-8"))
    val pool = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val n = Commands.produce(spark, pool, f.toString, "T")
    assert(n == 3)
    val rows = pool.read()
    assert(rows.count() == 3)
    // the decorator of the cursor record landed as the _type discriminator
    assert(rows.filter(col("value._type") === "cursor").count() == 1)
  }

  test("produce loads csv and tsv files with identical pool contents") {
    val dir = Files.createTempDirectory("sv")
    val csv = dir.resolve("d.csv")
    val tsv = dir.resolve("d.tsv")
    Files.write(csv, "a,b\n1,x\n2,y\n".getBytes("UTF-8"))
    Files.write(tsv, "a\tb\n1\tx\n2\ty\n".getBytes("UTF-8"))
    val p1 = Pool.create(spark, dir.resolve("p1").toString)
    val p2 = Pool.create(spark, dir.resolve("p2").toString)
    assert(Commands.produce(spark, p1, csv.toString, "T") == 2)
    assert(Commands.produce(spark, p2, tsv.toString, "T") == 2)
    assert(p1.read().toJSON.collect().sorted.toSeq ==
      p2.read().toJSON.collect().sorted.toSeq)
  }

  test("fromJsonLine serializes the parser's subset back to ZSON") {
    // serialize → parse is the identity on compact JSON
    val jsons = Seq(
      """{"kafka":{"topic":"Invoices","offset":1},"value":{"op":"r","n":-2,"f":2.5}}""",
      """{"_type":"cursor","seqno":2}""",
      """{"xs":[1,2],"s":"q\"uote","flag":true,"nil":null,"weird field":1}""")
    for (j <- jsons) {
      val zson = Zson.fromJsonLine(j)
      assert(Zson.toJsonLines(zson) == Seq(j), s"round trip of $j via $zson")
    }
    // golden forms: unquoted identifier names, (=name) decorator restored
    assert(Zson.fromJsonLine("""{"_type":"cursor","seqno":2}""") == "{seqno:2}(=cursor)")
    assert(Zson.fromJsonLine("""{"a":{"_type":"t","b":"x"}}""") == """{a:{b:"x"}(=t)}""")
    assert(Zson.fromJsonLine("""{"weird field":1}""") == """{"weird field":1}""")
  }

  test("consume -f emits JSON or ZSON lines over the same pool") {
    val dir = Files.createTempDirectory("zson-consume")
    val f = dir.resolve("batch.zson")
    Files.write(f, fixture.getBytes("UTF-8"))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    Commands.produce(spark, pool, f.toString, "T")

    val json = Commands.consume(pool, format = "json")
    val zson = Commands.consume(pool, format = "zson")
    assert(json.size == 3 && zson.size == 3)
    // same records, each line re-parses to its JSON twin
    assert(zson.flatMap(z => Zson.toJsonLines(z)) == json)
    // golden: first record (offset 0; null key omitted by toJSON) in both syntaxes
    assert(json.head ==
      """{"kafka":{"topic":"T","partition":0,"offset":0},"value":{"kafka":{"offset":1,"topic":"Invoices"},"value":{"after":{"ID":100,"customer":"Alice"},"op":"r"}},"_kind":"record"}""")
    assert(zson.head ==
      """{kafka:{topic:"T",partition:0,offset:0},value:{kafka:{offset:1,topic:"Invoices"},value:{after:{ID:100,customer:"Alice"},op:"r"}},_kind:"record"}""")
    intercept[IllegalArgumentException](Commands.consume(pool, format = "vng"))
  }
}
