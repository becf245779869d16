package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.pool.Pool
import graft.streaming.{FileTopicSource, StreamSync}

/** End-to-end Structured Streaming through the sync layer with a file-backed
  * topic source — the offline analog of ztests/from-kafka.yaml.
  */
class StreamingSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val wire = StructType.fromDDL(
    "topic string, partition long, offset long, key binary, value binary")

  private def wireRows(topic: String, offsets: Range): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = offsets.map(o =>
      Row(topic, 0L, o.toLong, null, s"""{"n":$o}""".getBytes("UTF-8"))).asJava
    spark.createDataFrame(rows, wire)
  }

  /** decode: wire → envelope (JSON value payload → typed struct). */
  private def decode(batch: DataFrame): DataFrame =
    batch.select(
      struct(col("topic"), col("partition"), col("offset")).as("kafka"),
      lit(null).cast("string").as("key"),
      from_json(col("value").cast("string"), StructType.fromDDL("n long")).as("value"),
      lit("record").as("_kind"))

  test("from-topics streams micro-batches into the pool and resumes from sink state") {
    val inDir = Files.createTempDirectory("wire").toString
    val poolDir = Files.createTempDirectory("pool").toString
    val ckpt1 = Files.createTempDirectory("ckpt").toString
    val pool = Pool.create(spark, poolDir)

    wireRows("T", 0 until 50).write.mode("append").parquet(inDir)
    val q1 = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("T"),
      pool, decode, checkpoint = ckpt1, interval = "1 seconds")
    q1.processAllAvailable()
    q1.stop()
    assert(pool.read().count() == 50)
    assert(pool.nextOffset("T") == 50)

    // restart with a FRESH checkpoint: resume must come from the pool itself
    // (T3 — fifo/lake.go:62-82), not Spark state.
    wireRows("T", 50 until 80).write.mode("append").parquet(inDir)
    val ckpt2 = Files.createTempDirectory("ckpt").toString
    val q2 = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("T"),
      pool, decode, checkpoint = ckpt2, interval = "1 seconds")
    q2.processAllAvailable()
    q2.stop()
    val contents = pool.read()
    assert(contents.count() == 80) // no duplicates of 0..49
    assert(contents.select(countDistinct(col("kafka.offset"))).collect()(0).getLong(0) == 80)
  }

  test("shaper SQL applies per micro-batch") {
    val inDir = Files.createTempDirectory("wire").toString
    val pool = Pool.create(spark, Files.createTempDirectory("pool").toString)
    wireRows("T", 0 until 10).write.mode("append").parquet(inDir)
    val q = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("T"), pool, decode,
      shaper = Some(
        "SELECT kafka, key, named_struct('n', value.n * 10) AS value, _kind FROM this_"),
      checkpoint = Files.createTempDirectory("ckpt").toString, interval = "1 seconds")
    q.processAllAvailable(); q.stop()
    assert(pool.read().agg(sum("value.n")).collect()(0).getLong(0) == (0 until 10).map(_ * 10).sum)
  }

  test("fan-out: one wire stream feeds many pools, each scoped to its topics (T5)") {
    val inDir = Files.createTempDirectory("wire").toString
    val poolA = Pool.create(spark, Files.createTempDirectory("poolA").toString)
    val poolB = Pool.create(spark, Files.createTempDirectory("poolB").toString)
    wireRows("A", 0 until 30).write.mode("append").parquet(inDir)
    wireRows("B", 0 until 20).write.mode("append").parquet(inDir)
    val qa = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("A"), poolA,
      decode, checkpoint = Files.createTempDirectory("ckpt").toString, interval = "1 seconds")
    val qb = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("B"), poolB,
      decode, checkpoint = Files.createTempDirectory("ckpt").toString, interval = "1 seconds")
    qa.processAllAvailable(); qb.processAllAvailable()
    qa.stop(); qb.stop()
    assert(poolA.read().count() == 30)
    assert(poolA.read().select(countDistinct(col("kafka.topic"))).collect()(0).getLong(0) == 1)
    assert(poolB.read().count() == 20)
  }

  test("streaming CDC ETL: micro-batched ingest + transform equals one-shot result") {
    import graft.etl.{Etl, StatelessRule, Transform}
    val t = Transform(Seq("T"), "Out", Seq(
      StatelessRule("T", None,
        "named_struct('id', in.value.n)",
        "named_struct('id', in.value.n, 'doubled', in.value.n * 2)")))
    val inDir = Files.createTempDirectory("wire").toString
    val inPool = Pool.create(spark, Files.createTempDirectory("ip").toString)
    val outPool = Pool.create(spark, Files.createTempDirectory("op").toString)
    // wave 1 available before start; wave 2 lands mid-stream
    wireRows("T", 0 until 40).write.mode("append").parquet(inDir)
    val q = graft.streaming.StreamSync.etlPipeline(spark, new FileTopicSource(inDir),
      Seq("T"), inPool, outPool, t, decode,
      checkpoint = Files.createTempDirectory("ckpt").toString, interval = "1 seconds")
    q.processAllAvailable()
    wireRows("T", 40 until 100).write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()
    val recs = outPool.read().filter(col("_kind") === "record")
    assert(recs.count() == 100)
    assert(recs.select(countDistinct(col("kafka.offset"))).collect()(0).getLong(0) == 100)
    assert(recs.agg(sum("value.doubled")).collect()(0).getLong(0) == (0 until 100).map(_ * 2).sum)
    // second pass over the same input adds nothing (exactly-once)
    assert(Etl.run(spark, inPool, outPool, t) == (0L, 0L))
  }

  /** Force a genuine at-least-once replay: delete the checkpoint's commit
    * marker for the last batch, so on restart Spark re-executes it against a
    * sink that already holds its rows — the exact "crash between pool.append
    * and checkpoint commit" window.
    */
  import scala.jdk.CollectionConverters._
  private def dropLastCommit(ckpt: String): Unit = {
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala.toSeq
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(last)
    // the local ChecksumFs shadows each log file with .N.crc; a real crash
    // leaves neither, so drop it too or the replayed rename trips on it
    Files.deleteIfExists(commits.resolve("." + last.getFileName.toString + ".crc"))
  }

  test("from-topics survives a checkpoint replay without duplicating or crash-looping") {
    val inDir = Files.createTempDirectory("wire").toString
    val pool = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val ckpt = Files.createTempDirectory("ckpt").toString
    wireRows("T", 0 until 50).write.mode("append").parquet(inDir)
    val q1 = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("T"),
      pool, decode, checkpoint = ckpt, interval = "1 seconds")
    q1.processAllAvailable(); q1.stop()
    assert(pool.read().count() == 50)

    dropLastCommit(ckpt) // crash happened after append, before checkpoint commit
    wireRows("T", 50 until 70).write.mode("append").parquet(inDir)
    val q2 = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("T"),
      pool, decode, checkpoint = ckpt, interval = "1 seconds")
    q2.processAllAvailable(); q2.stop() // replayed batch must be filtered, not fail
    val contents = pool.read()
    assert(contents.count() == 70)
    assert(contents.select(countDistinct(col("kafka.offset"))).collect()(0).getLong(0) == 70)
  }

  test("etl pipeline survives a checkpoint replay with exactly-once output") {
    import graft.etl.{Etl, StatelessRule, Transform}
    val t = Transform(Seq("T"), "Out", Seq(
      StatelessRule("T", None,
        "named_struct('id', in.value.n)",
        "named_struct('id', in.value.n, 'doubled', in.value.n * 2)")))
    val inDir = Files.createTempDirectory("wire").toString
    val inPool = Pool.create(spark, Files.createTempDirectory("ip").toString)
    val outPool = Pool.create(spark, Files.createTempDirectory("op").toString)
    val ckpt = Files.createTempDirectory("ckpt").toString
    wireRows("T", 0 until 40).write.mode("append").parquet(inDir)
    val q1 = graft.streaming.StreamSync.etlPipeline(spark, new FileTopicSource(inDir),
      Seq("T"), inPool, outPool, t, decode, checkpoint = ckpt, interval = "1 seconds")
    q1.processAllAvailable(); q1.stop()

    dropLastCommit(ckpt) // replay the ingest batch against an already-updated input pool
    val q2 = graft.streaming.StreamSync.etlPipeline(spark, new FileTopicSource(inDir),
      Seq("T"), inPool, outPool, t, decode, checkpoint = ckpt, interval = "1 seconds")
    q2.processAllAvailable(); q2.stop()

    val inRecs = inPool.read()
    assert(inRecs.count() == 40) // no second unmarked copy in the input pool
    val recs = outPool.read().filter(col("_kind") === "record")
    assert(recs.count() == 40)
    assert(recs.select(countDistinct(col("kafka.offset"))).collect()(0).getLong(0) == 40)
    assert(Etl.run(spark, inPool, outPool, t) == (0L, 0L))
  }

  test("topic admin: create-missing is idempotent, watermarks surface (S7/S8)") {
    val admin = new graft.streaming.InMemoryTopicAdmin
    admin.createMissingTopics(4, 1.toShort, Seq("A", "B"))
    admin.createMissingTopics(8, 1.toShort, Seq("A", "C")) // A exists → untouched
    assert(admin.listTopics() == Seq("A", "B", "C"))
    assert(admin.partitionsOf("A").contains(4))
    admin.setWatermarks("A", 5L, 100L)
    assert(admin.watermarks("A") == (5L, 100L))
    assert(graft.cli.Commands.infoTopics(admin, Seq("A")) == Seq(("A", 5L, 100L)))
    intercept[IllegalArgumentException](admin.watermarks("Z"))
  }

  test("kafka reader options pass TLS/SASL client config through") {
    val src = new graft.streaming.KafkaTopicSource("broker:9093", maxPerTrigger = 1000,
      clientOptions = Map(
        "kafka.security.protocol" -> "SASL_SSL",
        "kafka.sasl.mechanism" -> "PLAIN",
        "kafka.ssl.truststore.location" -> "/etc/tls/trust.jks"))
    val opts = src.readerOptions(Seq("A", "B"), Map("A" -> 7L))
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") == "PLAIN")
    assert(opts("kafka.ssl.truststore.location") == "/etc/tls/trust.jks")
    assert(opts("kafka.bootstrap.servers") == "broker:9093")
    assert(opts("subscribe") == "A,B")
    assert(opts("startingOffsets") == """{"A":{"0":7},"B":{"0":-2}}""")
  }

  test("event-time tumbling window with watermark (beyond-reference T8 extension)") {
    import org.apache.spark.sql.streaming.Trigger
    val inDir = Files.createTempDirectory("win").toString
    val schema = StructType.fromDDL("ts timestamp, k string, v double")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def rows(minOffsetMinutes: Int*) = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        minOffsetMinutes.map(m =>
          Row(new java.sql.Timestamp(base.getTime + m * 60000L), "k1", 1.0)).asJava, schema)
    }
    rows(1, 5, 12, 61, 65).write.mode("append").parquet(inDir)
    val agg = spark.readStream.schema(schema).parquet(inDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("win_agg").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT window.start, cnt FROM win_agg ORDER BY 1").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 2L)) // hour 0: 3 events, hour 1: 2
  }

  test("flatMapGroupsWithState sessionizes with event-time timeout (custom state)") {
    import graft.streaming.StatefulSessions
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("sess").toString
    val schema = StructType.fromDDL("user string, ts timestamp")
    def write(rows: (String, String)*): Unit =
      spark.createDataFrame(
        rows.map { case (u, t) => Row(u, java.sql.Timestamp.valueOf(t)) }.asJava,
        schema).write.mode("append").parquet(dir)
    write(("u1", "2024-01-01 00:00:00"), ("u1", "2024-01-01 00:05:00"),
      ("u2", "2024-01-01 00:00:00"))
    val events = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "10 minutes").as[StatefulSessions.Event]
    val q = StatefulSessions.sessionize(events, gapMs = 30 * 60 * 1000L)
      .writeStream.outputMode("append").format("memory").queryName("sess_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 seconds"))
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table("sess_out").isEmpty) // watermark hasn't passed any gap yet
    // a much later event pushes the watermark past both open sessions' gaps
    write(("u3", "2024-01-01 02:00:00"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT user, count FROM sess_out ORDER BY user").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("u1" -> 2L, "u2" -> 1L)) // u3's session is still open
  }

  test("streaming dedup drops re-arriving content within the watermark horizon") {
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("sdedup").toString
    val schema = StructType.fromDDL("id bigint, text string, ts timestamp")
    def write(rows: (Long, String, String)*): Unit =
      spark.createDataFrame(
        rows.map { case (i, t, s) => Row(i, t, java.sql.Timestamp.valueOf(s)) }.asJava,
        schema).write.mode("append").parquet(dir)
    write((1L, "alpha", "2024-01-01 00:00:00"), (2L, "beta", "2024-01-01 00:00:10"))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDedup.dedupByContent(stream, "ts", "10 minutes", "text")
      .writeStream.outputMode("append").format("memory").queryName("sdedup_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.processAllAvailable()
    // same content re-arrives in a later micro-batch, still inside the horizon
    write((3L, "alpha", "2024-01-01 00:01:00"), (4L, "gamma", "2024-01-01 00:01:30"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdedup_out").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L)) // id 3 = duplicate of id 1's content, dropped
  }

  test("streaming near-dup dedup keys on the per-row minhash signature") {
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("sndedup").toString
    val schema = StructType.fromDDL("id bigint, text string, ts timestamp")
    def write(rows: (Long, String, String)*): Unit =
      spark.createDataFrame(
        rows.map { case (i, t, s) => Row(i, t, java.sql.Timestamp.valueOf(s)) }.asJava,
        schema).write.mode("append").parquet(dir)
    val doc = "the quick brown fox jumps over the lazy dog again today"
    write((1L, doc, "2024-01-01 00:00:00"),
      (2L, "entirely different content about streaming state stores", "2024-01-01 00:00:10"))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDedup.dedupNearContent(stream, "ts", "10 minutes", "text")
      .writeStream.outputMode("append").format("memory").queryName("sndedup_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.processAllAvailable()
    // an exact re-arrival and a fresh doc, inside the horizon
    write((3L, doc, "2024-01-01 00:01:00"),
      (4L, "yet another unrelated page on pool commits", "2024-01-01 00:01:30"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sndedup_out").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L)) // signature-identical id 3 dropped
  }

  test("streaming near-dup dedup: distinct short docs never conflate (content-hash fallback)") {
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("sndshort").toString
    val schema = StructType.fromDDL("id bigint, text string, ts timestamp")
    // all docs are < n tokens: no shingles, no signature — two distinct
    // docs must both survive, an exact re-arrival must drop. The duplicate
    // arrives in a LATER micro-batch: within one batch dropDuplicates
    // keeps an arbitrary member of each key
    def write(rows: (Long, String, String)*): Unit =
      spark.createDataFrame(
        rows.map { case (i, t, s) => Row(i, t, java.sql.Timestamp.valueOf(s)) }.asJava,
        schema).write.mode("append").parquet(dir)
    write((1L, "hello world", "2024-01-01 00:00:00"),
      (2L, "bye now", "2024-01-01 00:00:05"))
    val q = StreamDedup.dedupNearContent(
      spark.readStream.schema(schema).parquet(dir), "ts", "10 minutes", "text")
      .writeStream.outputMode("append").format("memory").queryName("sndshort_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.processAllAvailable()
    write((3L, "hello world", "2024-01-01 00:00:10"),
      (4L, "short", "2024-01-01 00:00:15"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sndshort_out").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L), s"got $got") // only the exact dup (3) drops
  }

  test("Zed-program shaper applies per micro-batch (the README shape.zed flow, offline)") {
    // README.md:74-85: `zync from-kafka … -shaper shape.zed` with the
    // documented one-liner — here through the file twin end to end
    val inDir = Files.createTempDirectory("zshape-wire").toString
    val pool = Pool.create(spark, Files.createTempDirectory("zshape-pool").toString)
    import scala.jdk.CollectionConverters._
    val rows = (0 until 20).map(o =>
      Row("T", 0L, o.toLong, null, s"""{"s":"w$o,x$o"}""".getBytes("UTF-8"))).asJava
    spark.createDataFrame(rows, wire).write.mode("append").parquet(inDir)

    val decodeS = (batch: DataFrame) => batch.select(
      struct(col("topic"), col("partition"), col("offset")).as("kafka"),
      lit(null).cast("string").as("key"),
      from_json(col("value").cast("string"), StructType.fromDDL("s string")).as("value"),
      lit("record").as("_kind"))
    val q = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("T"), pool,
      decodeS,
      checkpoint = Files.createTempDirectory("ckpt").toString, interval = "1 seconds",
      zedShaper = Some("""value:={upper:to_upper(value.s),words:split(value.s, ",")}"""))
    q.processAllAvailable()
    q.stop()

    val got = pool.read()
    assert(got.count() == 20)
    assert(got.filter(col("kafka.offset") === 3)
      .select(col("value.upper"), col("value.words")).collect().map(r =>
        (r.getString(0), r.getAs[scala.collection.Seq[String]](1).toSeq)).toSeq ==
      Seq(("W3,X3", Seq("w3", "x3"))))
  }

  test("ZNG-framed topic values round-trip: fromTopics decode, toTopic encode") {
    import graft.cli.Zng
    import graft.codec.ZngCodec
    import scala.jdk.CollectionConverters._

    // wire rows whose value bytes are ZNG-framed records (the reference's
    // native interchange), one record per message
    val rows = (0 until 40).map { o =>
      Row("Z", 0L, o.toLong, null,
        Zng.write(Seq(s"""{"n":$o,"s":"doc-$o"}""")))
    }.asJava
    val inDir = Files.createTempDirectory("zng-wire").toString
    spark.createDataFrame(rows, wire).write.mode("append").parquet(inDir)

    val pool = Pool.create(spark, Files.createTempDirectory("zng-pool").toString)
    val q = StreamSync.fromTopics(spark, new FileTopicSource(inDir), Seq("Z"), pool,
      ZngCodec.decoder(StructType.fromDDL("n long, s string")),
      checkpoint = Files.createTempDirectory("ckpt").toString, interval = "1 seconds")
    q.processAllAvailable()
    q.stop()

    // decode half: typed values landed in the pool
    val env = pool.read()
    assert(env.count() == 40)
    assert(env.agg(sum(col("value.n"))).collect()(0).getLong(0) == (0 until 40).sum)
    assert(env.filter(col("value.s") === "doc-7").select(col("kafka.offset"))
      .collect().map(_.getLong(0)).toSeq == Seq(7L))

    // encode half: drain back to wire and re-decode the produced ZNG bytes
    val producedJson = scala.collection.mutable.ArrayBuffer[String]()
    val n = StreamSync.toTopic(pool, "Z", highWaterMark = 0,
      encode = ZngCodec.encoder,
      sink = df => producedJson ++= df.select(col("value")).collect()
        .map(r => Zng.readJsonLines(r.getAs[Array[Byte]](0)).mkString))
    assert(n == 40)
    assert(producedJson.size == 40)
    assert(producedJson.head == """{"n":0,"s":"doc-0"}""")
    assert(producedJson.toSeq == (0 until 40).map(o => s"""{"n":$o,"s":"doc-$o"}"""))

    // corrupt values quarantine to a single null row instead of failing;
    // a value framing SEVERAL records explodes to one row per record
    val bad = spark.createDataFrame(Seq(
      Row("Z", 0L, 99L, null, Array[Byte](1, 2, 3)),
      Row("Z", 0L, 100L, null, Zng.write(Seq("""{"n":1}""", """{"n":2}""")))).asJava, wire)
    val decodedBad = ZngCodec.decoder(StructType.fromDDL("n long, s string"))(bad)
    assert(decodedBad.count() == 3)
    assert(decodedBad.filter(col("value").isNull).count() == 1)
    assert(decodedBad.filter(col("kafka.offset") === 100)
      .select(col("value.n")).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("to-topic drains the pool in offset-ordered batches from the high-water mark") {
    val pool = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val env = decode(wireRows("T", 0 until 500))
    pool.append(env)
    val produced = scala.collection.mutable.ArrayBuffer[Long]()
    val n = StreamSync.toTopic(pool, "T", highWaterMark = 100,
      encode = identity,
      sink = df => produced ++= df.select(col("kafka.offset")).collect().map(_.getLong(0)),
      batchSize = 200)
    assert(n == 400) // offsets 100..499
    assert(produced.toSeq == (100L until 500L)) // strict order across batches
  }

  test("distributed to-topic drains as ONE sorted single-partition frame, order intact") {
    val pool = Pool.create(spark, Files.createTempDirectory("pool-dist").toString)
    pool.append(decode(wireRows("T", 0 until 500)))
    pool.append(decode(wireRows("U", 0 until 50))) // other topic must not drain
    val produced = scala.collection.mutable.ArrayBuffer[Long]()
    var sinkCalls = 0
    val n = StreamSync.toTopicDistributed(pool, "T", highWaterMark = 100,
      encode = identity,
      sink = df => {
        sinkCalls += 1
        // the order contract: one partition, one writer task
        assert(df.rdd.getNumPartitions == 1)
        produced ++= df.select(col("kafka.offset")).collect().map(_.getLong(0))
      })
    assert(n == 400)
    assert(sinkCalls == 1) // no per-batch driver round-trip
    assert(produced.toSeq == (100L until 500L))

    // empty drain range: no sink call, zero produced
    val none = StreamSync.toTopicDistributed(pool, "T", highWaterMark = 500,
      identity, _ => fail("sink must not run on an empty drain"))
    assert(none == 0)
  }
}
