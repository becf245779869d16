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

  // --- schema translation parity (zavro/schema_test.go golden behaviors) ---

  test("record names content-hash to the reference's golden md5s (schema_test.go:12-56)") {
    // {a:{b:{}}} — nested records, each named zng_<md5(canonical type)>
    val st = StructType(Seq(StructField("a",
      StructType(Seq(StructField("b", StructType(Seq())))))))
    val s = ConfluentAvro.avroSchema(st)
    assert(s.getName == "zng_228c5f7a92fa77715f4dabe46739bfa3") // md5("{a:{b:{}}}")
    val aRec = ConfluentAvro.optionalBranch(s.getField("a").schema()).get
    assert(aRec.getName == "zng_eeb636be88d6a4d3387b3820995db8e7") // md5("{b:{}}")
    val bRec = ConfluentAvro.optionalBranch(aRec.getField("b").schema()).get
    assert(bRec.getName == "zng_99914b932bd37a50b983c5e7c90ae93b") // md5("{}")
  }

  test("repeated record type becomes a named reference (schema_test.go:80-117)") {
    // {a:{},b:{}} — the second {} must reference the first, not redefine it
    val empty = StructType(Seq())
    val st = StructType(Seq(StructField("a", empty), StructField("b", empty)))
    val s = ConfluentAvro.avroSchema(st)
    assert(s.getName == "zng_2d7e63a29282715120ae93531a98c9ef") // md5("{a:{},b:{}}")
    val aRec = ConfluentAvro.optionalBranch(s.getField("a").schema()).get
    val bRec = ConfluentAvro.optionalBranch(s.getField("b").schema()).get
    assert(aRec eq bRec) // same Schema instance → rendered once + referenced
    // the rendered JSON must define zng_9991… once and reference it by name,
    // and must re-parse as valid Avro
    val json = s.toString
    assert(json.contains("\"zng_99914b932bd37a50b983c5e7c90ae93b\""))
    assert(json.indexOf("\"fields\":[]", json.indexOf("zng_9991")) > 0)
    val reparsed = new org.apache.avro.Schema.Parser().parse(json)
    assert(reparsed.getFields.size == 2)
  }

  test("null-typed field stays bare null, not a union (schema_test.go:58-78)") {
    val st = StructType(Seq(StructField("a", NullType)))
    val s = ConfluentAvro.avroSchema(st)
    assert(s.getField("a").schema().getType == org.apache.avro.Schema.Type.NULL)
  }

  test("non-optional union decodes as tag struct (schema.go:234-244, decoder.go:141-161)") {
    import scala.jdk.CollectionConverters._
    val writer = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"u","fields":[{"name":"v","type":["int","string"]}]}""")
    val target = ConfluentAvro.sparkType(writer).asInstanceOf[StructType]
    assert(target("v").dataType == StructType(Seq(
      StructField("tag", IntegerType), StructField("b0", IntegerType),
      StructField("b1", StringType))))

    val registry: SchemaRegistry = new InMemoryRegistry
    val id = registry.register("u-subj", writer.toString)
    def wire(set: org.apache.avro.generic.GenericRecord => Unit): Array[Byte] = {
      val rec = new org.apache.avro.generic.GenericData.Record(writer)
      set(rec)
      ConfluentAvro.encodeBytes(rec, writer, id)
    }
    val intBytes = wire(_.put("v", Int.box(7)))
    val strBytes = wire(_.put("v", new org.apache.avro.util.Utf8("hi")))
    val df = spark.createDataFrame(
      Seq(Row(intBytes: Any), Row(strBytes: Any)).asJava,
      StructType(Seq(StructField("bytes", BinaryType))))
    val rows = ConfluentAvro.decodeDF(df, "bytes", "v", target, registry)
      .select("v.v.tag", "v.v.b0", "v.v.b1").orderBy("tag").collect()
    assert(rows(0).getInt(0) == 0 && rows(0).getInt(1) == 7 && rows(0).isNullAt(2))
    assert(rows(1).getInt(0) == 1 && rows(1).isNullAt(1) && rows(1).getString(2) == "hi")
  }

  test("enum symbols decode as strings (connectjson.go:87-89)") {
    import scala.jdk.CollectionConverters._
    val writer = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"e","fields":[
        |  {"name":"c","type":{"type":"enum","name":"color","symbols":["RED","BLUE"]}}]}""".stripMargin)
    val target = ConfluentAvro.sparkType(writer).asInstanceOf[StructType]
    assert(target("c").dataType == StringType)
    val registry: SchemaRegistry = new InMemoryRegistry
    val id = registry.register("e-subj", writer.toString)
    val rec = new org.apache.avro.generic.GenericData.Record(writer)
    rec.put("c", new org.apache.avro.generic.GenericData.EnumSymbol(
      writer.getField("c").schema(), "BLUE"))
    val df = spark.createDataFrame(
      Seq(Row(ConfluentAvro.encodeBytes(rec, writer, id): Any)).asJava,
      StructType(Seq(StructField("bytes", BinaryType))))
    val got = ConfluentAvro.decodeDF(df, "bytes", "v", target, registry)
      .select("v.c").collect()(0).getString(0)
    assert(got == "BLUE")
  }

  test("map columns round-trip through the wire format") {
    import scala.jdk.CollectionConverters._
    val st = StructType(Seq(StructField("id", LongType),
      StructField("m", MapType(StringType, LongType))))
    val df = spark.createDataFrame(
      Seq(Row(1L, Map("x" -> 10L, "y" -> 20L))).asJava, st)
      .select(struct(col("*")).as("v"))
    val registry: SchemaRegistry = new InMemoryRegistry
    val wire = ConfluentAvro.encodeDF(df, "v", "bytes", registry).select("bytes")
    val back = ConfluentAvro.decodeDF(wire, "bytes", "v", st, registry)
      .select("v.*").collect()(0)
    assert(back.getLong(0) == 1L)
    assert(back.getMap[String, Long](1) == Map("x" -> 10L, "y" -> 20L))
  }

  test("genuinely recursive Avro schemas are rejected with a clear error") {
    val rec = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"node","fields":[
        |  {"name":"v","type":"long"},
        |  {"name":"next","type":["null","node"]}]}""".stripMargin)
    val e = intercept[IllegalArgumentException](ConfluentAvro.sparkType(rec))
    assert(e.getMessage.contains("recursive"))
  }

  test("recursive schemas unroll to recursiveFieldMaxDepth like spark-avro") {
    val nodeJson =
      """{"type":"record","name":"Node","fields":[
        |  {"name":"v","type":"long"},
        |  {"name":"next","type":["null","Node"],"default":null}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(nodeJson)

    // depth 2: the type occurs twice, the deeper recursive field is dropped
    val t2 = ConfluentAvro.sparkType(schema, recursiveFieldMaxDepth = 2)
      .asInstanceOf[StructType]
    assert(t2 == StructType(Seq(
      StructField("v", LongType),
      StructField("next", StructType(Seq(StructField("v", LongType)))))))

    // decode a 3-deep datum into the depth-2 type: level 3 is absent, not an error
    import org.apache.avro.generic.GenericData
    def node(v: Long, next: AnyRef): GenericData.Record = {
      val r = new GenericData.Record(schema)
      r.put("v", v); r.put("next", next); r
    }
    val datum = node(1, node(2, node(3, null)))
    val row = ConfluentAvro.recordToInternal(datum, t2)
    assert(row.getLong(0) == 1)
    assert(row.getStruct(1, 1).getLong(0) == 2)

    // default stays the historical clear rejection
    val e = intercept[IllegalArgumentException](ConfluentAvro.sparkType(schema))
    assert(e.getMessage.contains("recursiveFieldMaxDepth"))
  }

  // --- HTTP registry against a stub Confluent REST endpoint ---

  test("HTTP schema registry speaks the Confluent REST API (decoder.go:54-72, encoder.go:37-57)") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val bodies = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val subjectsSeen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val nextId = new java.util.concurrent.atomic.AtomicInteger(41)
    def reply(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b); x.close()
    }
    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      (x.getRequestMethod, path) match {
        case ("POST", p) if p.startsWith("/subjects/") && p.endsWith("/versions") =>
          subjectsSeen.add(p.stripPrefix("/subjects/").stripSuffix("/versions"))
          val id = nextId.getAndIncrement()
          // store the request body verbatim: it is {"schema":"…"} — exactly
          // the shape GET /schemas/ids/{id} returns
          bodies.put(id, new String(x.getRequestBody.readAllBytes(), "UTF-8"))
          reply(x, 200, s"""{"id":$id}""")
        case ("GET", p) if p.startsWith("/schemas/ids/") =>
          val id = p.stripPrefix("/schemas/ids/").toInt
          Option(bodies.get(id)) match {
            case Some(b) => reply(x, 200, b)
            case None => reply(x, 404, """{"error_code":40403,"message":"not found"}""")
          }
        case ("GET", "/subjects") =>
          import scala.jdk.CollectionConverters._
          reply(x, 200, subjectsSeen.asScala.toSeq.sorted.mkString("[\"", "\",\"", "\"]"))
        case ("GET", p) if p.startsWith("/subjects/") && p.endsWith("/versions/latest") =>
          // latest = highest id stored (this stub registers each schema once)
          import scala.jdk.CollectionConverters._
          val id = bodies.keySet.asScala.max
          val schemaField = bodies.get(id).stripPrefix("{").stripSuffix("}")
          reply(x, 200, s"""{"subject":"x","version":1,"id":$id,$schemaField}""")
        case _ => reply(x, 404, "{}")
      }
    })
    server.start()
    try {
      val reg = new graft.codec.HttpSchemaRegistry(
        s"http://localhost:${server.getAddress.getPort}")
      val schemaJson = ConfluentAvro.avroSchema(
        StructType(Seq(StructField("a", LongType), StructField("s", StringType))), "rec").toString
      val subject = SchemaRegistry.subjectFor(schemaJson)
      val id = reg.register(subject, schemaJson)
      assert(id == 41)
      assert(reg.schemaById(id) == schemaJson) // JSON-escape round-trip exact
      assert(reg.subjects() == Seq(subject))
      assert(reg.latest(subject) == ((41, 1, schemaJson)))
      val detail = graft.cli.Commands.lsDetail(reg)
      assert(detail == Seq(s"subject $subject:", "  id 41", "  version 1",
        s"  schema $schemaJson"))
      intercept[java.io.IOException](reg.schemaById(999))
    } finally server.stop(0)
  }
}
