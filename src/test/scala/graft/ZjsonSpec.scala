package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.{Commands, Zjson}
import graft.pool.Pool

/** ZJSON (Zed's JSON interchange) consume/produce format. The reference
  * repo carries no zjson fixtures (its io layer registers the format but no
  * ztest exercises it), so these are SELF-GOLDEN: the emitted stream shape
  * is pinned against the public spec (type/value lines, type context with
  * ids + refs, record values as arrays, primitives as strings), and both
  * directions round-trip through a pool.
  */
class ZjsonSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("golden stream shape: first line defines the type, repeats ref it") {
    val lines = Seq(
      """{"a":"hello","b":42}""",
      """{"a":"world","b":43}""")
    val z = Zjson.fromJsonLines(lines)
    assert(z == Seq(
      """{"type":{"kind":"record","id":1,"fields":[{"name":"a","type":{"kind":"primitive","name":"string"}},{"name":"b","type":{"kind":"primitive","name":"int64"}}]},"value":["hello","42"]}""",
      """{"type":{"kind":"ref","id":1},"value":["world","43"]}"""))
    assert(Zjson.toJsonLines(z) == lines)
  }

  test("nested records, arrays, floats, bools, nulls round-trip") {
    val lines = Seq(
      """{"kafka":{"topic":"T","offset":0},"value":{"xs":[1,2],"f":2.5,"ok":true,"nil":null}}""",
      """{"kafka":{"topic":"T","offset":1},"value":{"xs":[3],"f":-0.25,"ok":false,"nil":null}}""")
    val z = Zjson.fromJsonLines(lines)
    // nested record types take their own ids; the repeat line is one ref
    assert(z(1).startsWith("""{"type":{"kind":"ref","""))
    assert(Zjson.toJsonLines(z) == lines)
    // an empty array still round-trips (its element type is unknowable from
    // JSON text, so it defines a fresh type rather than ref-ing — the JSON
    // interchange carries no schema, unlike Zed proper)
    val empty = Seq("""{"xs":[]}""")
    assert(Zjson.toJsonLines(Zjson.fromJsonLines(empty)) == empty)
  }

  test("the _type discriminator becomes a named type and is re-injected on decode") {
    val lines = Seq("""{"_type":"done","kafka":{"topic":"T","offset":7}}""")
    val z = Zjson.fromJsonLines(lines)
    assert(z.head.contains(""""kind":"named""""))
    assert(z.head.contains(""""name":"done""""))
    // the _type field itself is NOT part of the record type
    assert(!z.head.contains("_type"))
    assert(Zjson.toJsonLines(z) == lines)
  }

  test("type context: a shape seen nested earlier refs correctly later") {
    val lines = Seq(
      """{"inner":{"n":1}}""",
      """{"n":2}""") // same shape as the earlier NESTED record type
    val z = Zjson.fromJsonLines(lines)
    // the inner record was defined first (children before parents) → id 1
    assert(z(1) == """{"type":{"kind":"ref","id":1},"value":["2"]}""")
    assert(Zjson.toJsonLines(z) == lines)
  }

  test("decoder accepts the wider spec vocabulary; unsupported kinds raise") {
    // a conformant producer may emit any int width / set types
    assert(Zjson.toJsonLines(Seq(
      """{"type":{"kind":"record","id":1,"fields":[{"name":"u","type":{"kind":"primitive","name":"uint32"}},{"name":"t","type":{"kind":"primitive","name":"time"}}]},"value":["7","2021-03-12T10:30:00Z"]}"""))
      == Seq("""{"u":7,"t":"2021-03-12T10:30:00Z"}"""))
    assert(Zjson.toJsonLines(Seq(
      """{"type":{"kind":"record","id":1,"fields":[{"name":"s","type":{"kind":"set","id":2,"type":{"kind":"primitive","name":"int64"}}}]},"value":[["1","2"]]}"""))
      == Seq("""{"s":[1,2]}"""))
    val e = intercept[IllegalArgumentException](Zjson.toJsonLines(Seq(
      """{"type":{"kind":"record","id":1,"fields":[{"name":"u","type":{"kind":"union","id":2,"types":[]}}]},"value":[["0","x"]]}""")))
    assert(e.getMessage.contains("union"))
    val mixed = intercept[IllegalArgumentException](
      Zjson.fromJsonLines(Seq("""{"xs":[1,"a"]}""")))
    assert(mixed.getMessage.contains("mixed array"))
  }

  test("non-finite floats decode as strings; integers beyond int64 raise on encode") {
    // +Inf/-Inf/NaN are legal Zed float text with no JSON number form —
    // they carry as strings rather than corrupting the line
    assert(Zjson.toJsonLines(Seq(
      """{"type":{"kind":"record","id":1,"fields":[{"name":"f","type":{"kind":"primitive","name":"float64"}},{"name":"g","type":{"kind":"primitive","name":"float64"}}]},"value":["+Inf","1.5"]}"""))
      == Seq("""{"f":"+Inf","g":1.5}"""))
    // zjson has no bignum: 2^64 cannot be typed int64 honestly
    val big = intercept[IllegalArgumentException](
      Zjson.fromJsonLines(Seq("""{"n":18446744073709551616}""")))
    assert(big.getMessage.contains("int64"))
    // Zed renders whole floats with a trailing dot ("3.") — normalize to a
    // legal JSON number rather than silently demoting to a string
    assert(Zjson.toJsonLines(Seq(
      """{"type":{"kind":"record","id":1,"fields":[{"name":"f","type":{"kind":"primitive","name":"float64"}}]},"value":["3."]}"""))
      == Seq("""{"f":3.0}"""))
  }

  test("consume -f zjson and produce of a .zjson file round-trip through a pool") {
    val dir = Files.createTempDirectory("zjson-rt")
    val src = dir.resolve("batch.jsonl")
    Files.write(src,
      """{"op":"r","n":1,"tags":["x","y"]}
        |{"op":"u","n":2,"tags":["y"]}
        |{"op":"d","n":3,"tags":["z"]}
        |""".stripMargin.getBytes("UTF-8"))
    val pool = Pool.create(spark, dir.resolve("pool").toString)
    Commands.produce(spark, pool, src.toString, "T")

    val zjson = Commands.consume(pool, format = "zjson")
    assert(zjson.size == 3)
    // every line after the first reuses the stream's type context
    assert(zjson.tail.forall(_.startsWith("""{"type":{"kind":"ref"""")))
    // each zjson line re-decodes to its JSON twin
    assert(Zjson.toJsonLines(zjson) == Commands.consume(pool, format = "json"))

    // produce the .zjson stream into a fresh pool → identical contents
    val zf = dir.resolve("stream.zjson")
    Files.write(zf, zjson.mkString("", "\n", "\n").getBytes("UTF-8"))
    val pool2 = Pool.create(spark, dir.resolve("pool2").toString)
    assert(Commands.produce(spark, pool2, zf.toString, "T2") == 3)
    // the re-produced pool wraps the consumed envelopes; compare the inner values
    assert(pool2.read().select(col("value.value.op"), col("value.value.n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("r", 1L), ("u", 2L), ("d", 3L)))
  }
}
