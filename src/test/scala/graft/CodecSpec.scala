package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{ConfluentAvro, ConnectJson, InMemoryRegistry, SchemaRegistry}

class CodecSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  // --- Connect JSON (golden analog of zavro/schema_test.go style) ---

  test("Connect schema JSON for nested structs, field order preserved") {
    val st = StructType(Seq(
      StructField("a", StructType(Seq(StructField("b", LongType))))))
    assert(ConnectJson.schemaJson(st) ==
      """{"type":"struct","fields":[{"type":"struct","fields":[{"type":"int64","field":"b","optional":true}],"field":"a","optional":true}]}""")
  }

  test("Connect schema → Spark type is inverse of generation") {
    val st = StructType(Seq(
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("i64", LongType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("arr", ArrayType(LongType)),
      StructField("nested", StructType(Seq(StructField("x", StringType))))))
    val back = ConnectJson.sparkTypeOf(ConnectJson.schemaJson(st))
    def nullable(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = nullable(f.dataType), nullable = true)))
      case ArrayType(et, _) => ArrayType(nullable(et), containsNull = true)
      case other => other
    }
    assert(back == nullable(st))
  }

  test("map type is rejected like the reference codec") {
    val st = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    intercept[IllegalArgumentException](ConnectJson.schemaJson(st))
  }

  test("Connect envelope round-trip preserves base64 bytes and nulls") {
    import scala.jdk.CollectionConverters._
    val st = StructType(Seq(
      StructField("s", StringType), StructField("n", LongType),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(Row("hi", 42L, Array[Byte](1, 2, 0, -1))),
      Row(Row(null, null, null))).asJava
    val df = spark.createDataFrame(rows, StructType(Seq(StructField("v", st))))
    val enc = df.select(ConnectJson.encode(col("v"), st).as("env"))
    val dec = enc.select(ConnectJson.decode(col("env"), st).as("v"))
      .select("v.s", "v.n", "v.bin").collect()
    assert(dec(0).getString(0) == "hi" && dec(0).getLong(1) == 42L)
    assert(dec(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 0, -1))
    assert(dec(1).isNullAt(0) && dec(1).isNullAt(1) && dec(1).isNullAt(2))
  }

  test("empty envelope decodes to null (connectjson_test.go:48-54)") {
    val st = StructType(Seq(StructField("x", LongType)))
    val df = spark.range(1).select(lit("").as("env"))
    assert(df.select(ConnectJson.decode(col("env"), st).as("v")).collect()(0).isNullAt(0))
  }

  // --- Confluent Avro ---

  test("Avro schema wraps every field in a nullable union (schema.go:45-51)") {
    val st = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val s = ConfluentAvro.avroSchema(st, "rec")
    st.fields.foreach { f =>
      val fs = s.getField(f.name).schema()
      assert(fs.getType == org.apache.avro.Schema.Type.UNION)
      assert(fs.getTypes.get(0).getType == org.apache.avro.Schema.Type.NULL)
    }
  }

  test("wire round-trip with nulls, nesting, arrays, timestamps") {
    import scala.jdk.CollectionConverters._
    val st = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("nested", StructType(Seq(StructField("x", DoubleType)))),
      StructField("ts", TimestampType)))
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:34:56.123456Z"))
    val rows = Seq(
      Row(1L, "a", Seq("t1", "t2"), Row(1.5), ts),
      Row(2L, null, null, null, null)).asJava
    val df = spark.createDataFrame(rows, st).select(struct(col("*")).as("v"))
    val registry: SchemaRegistry = new InMemoryRegistry
    val wire = ConfluentAvro.encodeDF(df, "v", "bytes", registry).select("bytes")
    val back = ConfluentAvro.decodeDF(wire, "bytes", "v", st, registry).select("v.*").collect()
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "a")
    assert(back(0).getSeq[String](2) == Seq("t1", "t2"))
    assert(back(0).getStruct(3).getDouble(0) == 1.5)
    assert(back(0).getAs[java.sql.Timestamp](4).toInstant ==
      java.time.Instant.parse("2024-06-01T12:34:56.123456Z")) // µs precision kept
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(3))
  }

  test("registry: md5 subject naming and idempotent registration") {
    val r = new InMemoryRegistry
    val id1 = r.register(SchemaRegistry.subjectFor("schema-a"), "schema-a")
    val id2 = r.register(SchemaRegistry.subjectFor("schema-a"), "schema-a")
    val id3 = r.register(SchemaRegistry.subjectFor("schema-b"), "schema-b")
    assert(id1 == id2 && id1 != id3)
    assert(SchemaRegistry.subjectFor("x").matches("zng_[0-9a-f]{32}"))
    assert(r.schemaById(id3) == "schema-b")
  }

  test("one batch, many schema ids: each row resolves its own writer schema") {
    import scala.jdk.CollectionConverters._
    // two record shapes on one "topic" (RecordNameStrategy — SURVEY §7.4.2)
    val stA = StructType(Seq(StructField("id", LongType), StructField("a", StringType)))
    val stB = StructType(Seq(StructField("id", LongType), StructField("b", DoubleType)))
    val registry: SchemaRegistry = new InMemoryRegistry
    val dfA = spark.createDataFrame(Seq(Row(Row(1L, "x"))).asJava,
      StructType(Seq(StructField("v", stA))))
    val dfB = spark.createDataFrame(Seq(Row(Row(2L, 2.5))).asJava,
      StructType(Seq(StructField("v", stB))))
    val wireA = ConfluentAvro.encodeDF(dfA, "v", "bytes", registry).select("bytes")
    val wireB = ConfluentAvro.encodeDF(dfB, "v", "bytes", registry).select("bytes")
    val mixed = wireA.unionByName(wireB)
    // decode the mixed batch to the superset target: absent fields null,
    // matched by field name against each row's own writer schema
    val target = StructType(Seq(StructField("id", LongType),
      StructField("a", StringType), StructField("b", DoubleType)))
    val rows = ConfluentAvro.decodeDF(mixed, "bytes", "v", target, registry)
      .select("v.id", "v.a", "v.b").orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) && rows(1).getDouble(2) == 2.5)
  }

  test("bad wire header is rejected (decoder.go:36-42)") {
    intercept[IllegalArgumentException](ConfluentAvro.schemaIdOf(Array[Byte](1, 2)))
    intercept[IllegalArgumentException](
      ConfluentAvro.schemaIdOf(Array[Byte](9, 0, 0, 0, 1, 5, 5))) // wrong magic
  }
}
