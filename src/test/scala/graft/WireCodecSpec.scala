package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{ConfluentAvro, InMemoryRegistry, SchemaRegistry, WireCodec}
import graft.etl.{Etl, StatelessRule, Transform}

class WireCodecSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  test("kafka wire -> envelope -> producer shape round-trips through Avro") {
    val registry: SchemaRegistry = new InMemoryRegistry
    val vSchema = StructType.fromDDL("n bigint, s string")
    // produce wire bytes the way a Confluent producer would
    val src = spark.createDataFrame(
      Seq(Row(Row(7L, "x")), Row(Row(8L, "y"))).asJava,
      StructType(Seq(StructField("v", vSchema))))
    val wireBytes = ConfluentAvro.encodeDF(src, "v", "bytes", registry)
      .withColumn("topic", lit("T"))
      .withColumn("partition", lit(0L))
      .withColumn("offset", col("v.n"))
      .withColumn("key", lit(null).cast("binary"))
      .select(col("topic"), col("partition"), col("offset"), col("key"),
        col("bytes").as("value"))

    val env = WireCodec.avroEnvelopeDecoder(registry, vSchema)(wireBytes)
    assert(env.select("value.n", "value.s").orderBy("n").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "x"), (8L, "y")))

    // back out through the producer encoder, decode once more
    val produced = WireCodec.avroProducerEncoder(registry)(env)
    assert(produced.columns.toSeq == Seq("topic", "key", "value"))
    val again = ConfluentAvro.decodeDF(produced, "value", "v", vSchema, registry)
    assert(again.select("v.n").orderBy("n").collect().map(_.getLong(0)).toSeq == Seq(7L, 8L))
  }

  test("switch routing is strict first-match (build.go:92-107 parity)") {
    // both rules match 'c' records; rule order must win
    val schema = StructType(Seq(
      StructField("kafka", StructType(Seq(
        StructField("topic", StringType), StructField("partition", LongType),
        StructField("offset", LongType)))),
      StructField("key", StructType(Seq(StructField("id", LongType)))),
      StructField("value", StructType(Seq(StructField("op", StringType)))),
      StructField("_kind", StringType)))
    val rows = (0 until 10).map(i =>
      Row(Row("A", 0L, i.toLong), Row(i.toLong), Row("c"), "record")).asJava
    val input = spark.createDataFrame(rows, schema)
    val t = Transform(Seq("A"), "Out", Seq(
      StatelessRule("A", Some("in.value.op = 'c'"),
        "named_struct('id', in.key.id)", "named_struct('rule', 'first')"),
      StatelessRule("A", None, // would also match everything
        "named_struct('id', in.key.id)", "named_struct('rule', 'second')")))
    val out = Etl.compile(spark, input, Etl.OutputState(None, Map.empty), t)
      .filter(col("_kind") === "record")
    val rules = out.select("value.rule").distinct().collect().map(_.getString(0)).toSeq
    assert(rules == Seq("first")) // nothing leaked to the later rule
    assert(out.count() == 10)
  }
}
