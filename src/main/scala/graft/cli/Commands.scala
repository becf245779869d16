package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.codec.SchemaRegistry
import graft.etl.{Etl, EtlYaml}
import graft.pool.Pool

/** Subcommand parity with the reference CLI (cmd/zync/main.go:7-16):
  * consume, produce, etl, info, ls (from-kafka/to-kafka live in
  * graft.streaming). Kept as library functions + a thin main so they are
  * callable programmatically and testable offline.
  */
object Commands {

  /** `consume`: read a pool (optionally from an offset) and print/return as
    * text lines in any of the zed CLI's text output formats (`-f`: json,
    * zson, zjson, csv, tsv, text, table, line, zeek — the reference writes any Zed
    * output format, cmd/zync/consume/command.go:71-107; JSON stays our
    * default since it is the interchange format everywhere else in this
    * port). The tabular family renders from the scan's typed schema
    * ([[Tabular]]) — a pool scan presents one merged superset schema, so the
    * zed csv writer's uniform-records requirement holds by construction.
    * For the binary ZNG format use [[consumeZng]].
    */
  def consume(pool: Pool, topic: Option[String] = None, fromOffset: Long = 0L,
      format: String = "json"): Seq[String] = {
    if (!Set("json", "zson", "zjson", "csv", "tsv", "text", "table", "line", "zeek").contains(format))
      throw new IllegalArgumentException(
        s"unknown consume format '$format' (expected json, zson, zjson, csv, " +
          "tsv, text, table, line or zeek; binary zng is consumeZng)") // before the pool scan
    val base = pool.read()
    val scoped = topic.map(t => base.filter(col("kafka.topic") === t)).getOrElse(base)
    val ordered = scoped.filter(col("kafka.offset") >= fromOffset)
      .orderBy(col("kafka.topic"), col("kafka.offset"))
    format match {
      case "csv"   => Tabular.csv(ordered)
      case "tsv"   => Tabular.tsv(ordered)
      case "text"  => Tabular.text(ordered)
      case "table" => Tabular.table(ordered)
      case "line"  => Tabular.line(ordered)
      case "zeek"  => Zeek.write(ordered)
      case _ =>
        val jsonLines = ordered.toJSON.collect().toSeq
        format match {
          case "zson"  => jsonLines.map(Zson.fromJsonLine)
          case "zjson" => Zjson.fromJsonLines(jsonLines)
          case _       => jsonLines
        }
    }
  }

  /** `consume -f zng`: the same record stream as [[consume]], serialized as
    * one binary ZNG stream (consume/command.go:71-107 writes any Zed format;
    * this closes the binary loop with `produce`'s `.zng` reader — a pool
    * consumed as ZNG re-produces identical pool contents). Values-frame
    * compression on by default, as zed's own writer does.
    */
  def consumeZng(pool: Pool, topic: Option[String] = None,
      fromOffset: Long = 0L, compress: Boolean = true): Array[Byte] =
    Zng.write(consume(pool, topic, fromOffset), compress)

  /** `consume -f arrow`: the same record stream as [[consume]], serialized
    * as one Arrow IPC stream (schema header + record batches + EOS) —
    * readable by pyarrow/arrow-cpp/DuckDB. Uses Spark's own Arrow
    * conversion ([[org.apache.spark.sql.graft.ArrowBridge]]), so the full
    * typed schema (timestamps, nested records, arrays, binary) crosses
    * losslessly — the second binary format next to ZNG.
    */
  def consumeArrow(pool: Pool, topic: Option[String] = None,
      fromOffset: Long = 0L): Array[Byte] = {
    val base = pool.read()
    val scoped = topic.map(t => base.filter(col("kafka.topic") === t)).getOrElse(base)
    val ordered = scoped.filter(col("kafka.offset") >= fromOffset)
      .orderBy(col("kafka.topic"), col("kafka.offset"))
    org.apache.spark.sql.graft.ArrowBridge.toIpcStream(ordered)
  }

  /** `consume -f parquet`: the same record stream as [[consume]], as the
    * bytes of ONE parquet file (the engine's own pool/storage format, so
    * the typed schema round-trips exactly and any parquet reader — Spark,
    * DuckDB, pyarrow — opens the output directly). The single-file coalesce
    * is deliberate: a CLI consume is batch-sized by contract, like the
    * ZNG/Arrow byte-stream siblings.
    */
  def consumeParquet(pool: Pool, topic: Option[String] = None,
      fromOffset: Long = 0L): Array[Byte] = {
    val base = pool.read()
    val scoped = topic.map(t => base.filter(col("kafka.topic") === t)).getOrElse(base)
    val ordered = scoped.filter(col("kafka.offset") >= fromOffset)
      .orderBy(col("kafka.topic"), col("kafka.offset"))
    val dir = graft.TempDirs.create("graft-consume-parquet-")
    ordered.coalesce(1).write.mode("overwrite").parquet(dir)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no parquet part written in $dir"))
    java.nio.file.Files.readAllBytes(part)
  }

  /** `produce`: load a file of records into a pool as enveloped values
    * (cmd/zync/produce/command.go:72-81).
    *
    * Offsets are assigned distributed: range-partition on the file order key,
    * sort within partitions, per-partition prefix sums
    * (graft.etl.Offsets.assignSequential — only P counts touch the driver,
    * the data path stays in Tungsten). The r1 version used a global
    * `Window.orderBy` with no partitioning, which funneled the whole file
    * through one task.
    */
  def produce(spark: SparkSession, pool: Pool, path: String, topic: String): Long = {
    // json/jsonl/csv/tsv/zson/zng/zjson/parquet (the reference reads any Zed
    // format here, produce/command.go:72-81). ZSON goes through the Zson-lite transpiler
    // on the driver — load files are batch-sized, and the reference's
    // produce reads the whole file too (command.go:72-76).
    val df =
      if (path.endsWith(".json") || path.endsWith(".jsonl")) spark.read.json(path)
      else if (path.endsWith(".csv"))
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      else if (path.endsWith(".tsv"))
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("delimiter", "\t").csv(path)
      else if (path.endsWith(".zng")) {
        // binary Zed: decode to the same JSON lines the ZSON branch yields,
        // so a .zng fixture and its .zson twin load identical pool contents
        val lines = spark.sparkContext.binaryFiles(path).collect()
          .sortBy(_._1).toSeq.flatMap { case (_, pds) => Zng.readJsonLines(pds.toArray()) }
        import spark.implicits._
        spark.read.json(spark.createDataset(lines))
      }
      else if (path.endsWith(".arrow")) {
        // Arrow IPC stream: typed schema travels in the stream header, so
        // no JSON-lines inference hop — types land exactly as written
        val bytes = spark.sparkContext.binaryFiles(path).collect()
          .sortBy(_._1).map { case (_, pds) => pds.toArray() }
        bytes.map(b => org.apache.spark.sql.graft.ArrowBridge.fromIpcStream(spark, b))
          .reduce(_ unionByName _)
      }
      else if (path.endsWith(".zeek")) {
        // zeek TSV: headers carry the schema; per-file decode like zson/zjson
        val lines = spark.sparkContext.wholeTextFiles(path).collect()
          .sortBy(_._1).toSeq.flatMap { case (_, text) => Zeek.toJsonLines(text) }
        import spark.implicits._
        spark.read.json(spark.createDataset(lines))
      }
      else if (path.endsWith(".zjson")) {
        // line-framed, but the type context spans the stream → per-file decode
        val lines = spark.sparkContext.wholeTextFiles(path).collect()
          .sortBy(_._1).toSeq.flatMap { case (_, text) => Zjson.toJsonLines(text) }
        import spark.implicits._
        spark.read.json(spark.createDataset(lines))
      }
      else if (path.endsWith(".zson")) {
        // wholeTextFiles resolves Hadoop filesystems and globs like the
        // spark.read branches (records span lines, so per-file content is
        // what the transpiler needs); load files are batch-sized by contract
        val lines = spark.sparkContext.wholeTextFiles(path).collect()
          .sortBy(_._1).toSeq.flatMap { case (_, text) => Zson.toJsonLines(text) }
        import spark.implicits._
        spark.read.json(spark.createDataset(lines))
      }
      else spark.read.parquet(path)
    val off = pool.nextOffset(topic) max 0L
    val sorted = df.withColumn("_row", monotonically_increasing_id())
      .repartitionByRange(col("_row"))
      .sortWithinPartitions("_row")
      .persist() // the offset counts job and the append must see one ordering
    try {
      val env = graft.etl.Offsets.assignSequential(sorted, off, "_off")
        .select(
          struct(lit(topic).as("topic"), lit(0L).as("partition"), col("_off").as("offset")).as("kafka"),
          lit(null).cast("string").as("key"),
          struct(df.columns.toIndexedSeq.map(col): _*).as("value"),
          lit("record").as("_kind"))
      pool.append(env)
      sorted.count()
    } finally sorted.unpersist()
  }

  /** `info`: per-topic low/high watermarks of a pool
    * (cmd/zync/info/command.go:58-63 over Kafka; here over the pool).
    */
  def info(pool: Pool): DataFrame =
    pool.read().groupBy(col("kafka.topic").as("topic"))
      .agg(min(col("kafka.offset")).as("low"), max(col("kafka.offset")).as("high"),
        count(lit(1)).as("records"))

  /** `info` against the broker itself: per-topic (earliest, latest)
    * watermarks through the admin client (cmd/zync/info/command.go:58-63 →
    * fifo/consumer.go:184-227).
    */
  def infoTopics(admin: graft.streaming.TopicAdmin, topics: Seq[String]): Seq[(String, Long, Long)] =
    topics.map { t => val (lo, hi) = admin.watermarks(t); (t, lo, hi) }

  /** `fsck`: render the read-only health report for a pool or a
    * similarity-index layout at `path` — the CLI face of
    * [[graft.pool.Pool.fsck]] / [[graft.ops.SimilarityIndex.fsckIndex]],
    * so the compliance check the purge/takedown story targets is
    * reachable from the operational surface, not just Scala. The layout
    * is auto-detected (an index root carries `centroids`/`codebook`/
    * `encoded` or their crash leftovers; everything else is treated as a
    * pool, whose report is meaningful even pre-first-commit). Returns
    * (report lines, clean) — `main` prints the lines and exits 1 when
    * dirty, the conventional fsck contract.
    */
  def fsck(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[String], Boolean) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val names: Set[String] =
      if (hfs.exists(root))
        hfs.listStatus(root).toSeq.map(_.getPath.getName).toSet
      else Set.empty
    val indexLike = Seq("centroids", "codebook", "encoded").exists(d =>
      names.contains(d) || names.contains(s"_old-$d")) ||
      names.exists(_.startsWith("_rebuild-"))
    if (indexLike) {
      val r = graft.ops.SimilarityIndex.fsckIndex(spark, path)
      val lines = Seq(
        if (r.clean) s"index $path: CLEAN" else s"index $path: DIRTY") ++
        (if (r.staleStaging.nonEmpty)
          Seq(s"  stale staging (crashed rebuild; reclaimed at next rebuild): ${r.staleStaging.mkString(", ")}")
        else Nil) ++
        (if (r.asides.nonEmpty)
          Seq(s"  asides (swap crash; load/rebuild restore them): ${r.asides.mkString(", ")}")
        else Nil) ++
        (if (r.missingSubdirs.nonEmpty)
          Seq(s"  missing subdirs (no aside to restore from): ${r.missingSubdirs.mkString(", ")}")
        else Nil) ++
        (if (r.mixedGeneration)
          Seq("  mixed generations: load will refuse; re-run the rebuild to repair")
        else Nil)
      (lines, r.clean)
    } else {
      // openNoRepair, deliberately: a health CHECK must not mutate the
      // store — Pool.open would complete a proven interrupted purge
      // (deleting dirs, pruning snapshots, consuming the marker) before
      // the report rendered, making the dirty state unreportable. The
      // report says what is OWED; a subsequent normal (writer) open
      // performs it.
      val r = Pool.openNoRepair(spark, path).fsck()
      val lines = Seq(
        if (r.clean) s"pool $path: CLEAN" else s"pool $path: DIRTY") ++
        (if (r.unreferencedDirs.nonEmpty)
          Seq(s"  unreferenced segment dirs (awaiting vacuum): ${r.unreferencedDirs.mkString(", ")}")
        else Nil) ++
        (if (r.missingLiveSegments.nonEmpty)
          Seq(s"  committed segments MISSING on disk: ${r.missingLiveSegments.mkString(", ")}")
        else Nil) ++
        (if (r.purgeReclamationOwed)
          Seq("  purge reclamation OWED: _PURGE proves its swap committed — rows are gone from every live read; a writer open (or vacuum) reclaims the pre-delete dirs")
        else if (r.stalePurgeIntent)
          Seq("  stale purge intent: _PURGE present but its swap never committed — the takedown never applied (re-run the delete or vacuum)")
        else Nil) ++
        (if (r.counterMissing)
          Seq("  version counter missing (re-asserted at next prune)")
        else Nil) ++
        (if (r.brokenSnapshots.nonEmpty)
          Seq(s"  snapshots referencing deleted segments: ${r.brokenSnapshots.map(v => s"v$v").mkString(", ")}")
        else Nil)
      (lines, r.clean)
    }
  }

  /** `ls`: enumerate registry subjects (cmd/zync/ls/command.go:42-64). */
  def ls(registry: SchemaRegistry): Seq[String] = registry.subjects()

  /** `ls -id`: schemas for explicit ids. */
  def ls(registry: SchemaRegistry, ids: Seq[Int]): Seq[(Int, String)] =
    ids.map(id => id -> registry.schemaById(id))

  /** `ls` detail lines: per subject, the latest (id, version, schema) in the
    * reference's print format (ls/command.go:54-62).
    */
  def lsDetail(registry: SchemaRegistry): Seq[String] =
    registry.subjects().flatMap { subject =>
      val (id, version, schema) = registry.latest(subject)
      Seq(s"subject $subject:", s"  id $id", s"  version $version", s"  schema $schema")
    }

  /** `etl`: one-shot YAML-configured transform pass
    * (cmd/zync/etl/command.go:53-91).
    */
  def etl(spark: SparkSession, yamlText: String, poolRoot: String): (Long, Long) = {
    val cfg = EtlYaml.parse(yamlText)
    val in = Pool.open(spark, s"$poolRoot/${cfg.inputPool}")
    val out = Pool.create(spark, s"$poolRoot/${cfg.outputPool}")
    Etl.run(spark, in, out, cfg.transform)
  }

  /** `version` (cmd/zync/version): the library version string. */
  val Version = "graft 0.4.0"

  /** `from-kafka`: stream topics into a pool with sink-derived resume
    * (cmd/zync/from-kafka/command.go). The source is injectable so the same
    * path runs offline (`FileTopicSource` in specs) and live
    * (`KafkaTopicSource` built from `~/.graft/kafka.json` in [[main]]).
    */
  def fromKafka(spark: SparkSession, source: graft.streaming.TopicSource,
      topics: Seq[String], pool: Pool, decode: DataFrame => DataFrame,
      checkpoint: String, shaper: Option[String] = None,
      interval: String = "5 seconds",
      zedShaper: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.StreamSync.fromTopics(
      spark, source, topics, pool, decode, shaper, checkpoint, interval, zedShaper)

  /** `to-kafka`: produce a pool's records to a topic from `highWaterMark`,
    * in offset order (cmd/zync/to-kafka/command.go → fifo/to.go).
    */
  def toKafka(pool: Pool, topic: String, highWaterMark: Long,
      encode: DataFrame => DataFrame, sink: DataFrame => Unit,
      batchSize: Int = 200): Long =
    graft.streaming.StreamSync.toTopic(pool, topic, highWaterMark, encode, sink, batchSize)

  /** `to-kafka` through the Kafka connector: the drain flows executor→Kafka
    * as one sorted single-partition write instead of bouncing through the
    * driver ([[graft.streaming.StreamSync.toTopicDistributed]]); the
    * iterator form above remains the no-connector fallback.
    */
  def toKafkaDistributed(pool: Pool, topic: String, highWaterMark: Long,
      encode: DataFrame => DataFrame, sink: DataFrame => Unit): Long =
    graft.streaming.StreamSync.toTopicDistributed(pool, topic, highWaterMark, encode, sink)

  /** Decoded value type for a registry schema id — the from-kafka target. */
  def schemaTypeOf(registry: SchemaRegistry, id: Int): org.apache.spark.sql.types.StructType =
    graft.codec.ConfluentAvro.sparkType(
      graft.codec.ConfluentAvro.parsedSchema(registry.schemaById(id)))
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  /** The reference's full subcommand table (cmd/zync/main.go:7-16): consume,
    * etl, from-kafka, info, ls, produce, to-kafka, version. Kafka-touching
    * subcommands read `~/.graft/kafka.json` / `~/.graft/schema_registry.json`
    * ([[KafkaClientConfig]]/[[RegistryClientConfig]], the reference's
    * `~/.zync` analogs).
    */
  def main(args: Array[String]): Unit = args.toList match {
    case "consume" :: path :: rest =>
      // [-f json|zson|zjson|csv|tsv|text|table|line|zeek|zng|arrow|parquet]
      // [topic] [fromOffset] — the reference's
      // -f/-offset flags (consume/command.go:57-107)
      val spark = GraftSession.get()
      val (format, positional) = rest match {
        case "-f" :: f :: tail => (f, tail)
        case _                 => ("json", rest)
      }
      val fromOffset = positional.lift(1).map(_.toLong).getOrElse(0L)
      if (format == "zng" || format == "arrow" || format == "parquet") {
        // binary stream → raw stdout, like `zed -f zng` to a pipe
        val bytes = format match {
          case "zng" => consumeZng(Pool.open(spark, path), positional.headOption, fromOffset)
          case "arrow" => consumeArrow(Pool.open(spark, path), positional.headOption, fromOffset)
          case _ => consumeParquet(Pool.open(spark, path), positional.headOption, fromOffset)
        }
        System.out.write(bytes)
        System.out.flush()
      } else
        consume(Pool.open(spark, path), positional.headOption, fromOffset, format)
          .foreach(println)
    case "info" :: path :: Nil =>
      val spark = GraftSession.get()
      info(Pool.open(spark, path)).show(truncate = false)
    case "fsck" :: path :: Nil =>
      val spark = GraftSession.get()
      val (lines, clean) = fsck(spark, path)
      lines.foreach(println)
      if (!clean) sys.exit(1)
    case "produce" :: poolPath :: file :: topic :: Nil =>
      val spark = GraftSession.get()
      println(produce(spark, Pool.create(spark, poolPath), file, topic))
    case "etl" :: "-zed" :: yamlPath :: Nil =>
      // print the generated Zed program(s) instead of running (the
      // reference's -zed flag, pinned by ztests/etl-zed.yaml's stdout)
      graft.etl.ZedEtl.generateProgram(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(yamlPath)))).foreach(print)
    case "etl" :: yamlPath :: poolRoot :: Nil =>
      val spark = GraftSession.get()
      val (r, m) = etl(spark, new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(yamlPath))), poolRoot)
      println(s"records=$r markers=$m")
    case "ls" :: rest =>
      val registry = rest match {
        case url :: _ if url.startsWith("http") => new graft.codec.HttpSchemaRegistry(url)
        case _ => RegistryClientConfig.load().registry()
      }
      lsDetail(registry).foreach(println)
    case "from-kafka" :: poolPath :: checkpoint :: topicsArg :: schemaId :: Nil =>
      val spark = GraftSession.get()
      val kafka = KafkaClientConfig.load()
      val registry = RegistryClientConfig.load().registry()
      val q = fromKafka(spark,
        new graft.streaming.KafkaTopicSource(kafka.bootstrapServers,
          clientOptions = kafka.clientOptions),
        topicsArg.split(",").toSeq,
        Pool.create(spark, poolPath),
        graft.codec.WireCodec.avroEnvelopeDecoder(registry,
          schemaTypeOf(registry, schemaId.toInt)),
        checkpoint)
      q.awaitTermination()
    case "to-kafka" :: poolPath :: topic :: Nil =>
      val spark = GraftSession.get()
      val kafka = KafkaClientConfig.load()
      val registry = RegistryClientConfig.load().registry()
      val admin = new graft.streaming.KafkaTopicAdmin(
        kafka.bootstrapServers, kafka.adminOptions)
      try {
        val (_, hi) = admin.watermarks(topic) // resume at the broker HWM (fifo/to.go:31-38)
        // ordered-produce safety on the connector path: one in-flight
        // request (retries cannot reorder) + idempotent producer
        val sink = new graft.streaming.KafkaTopicSink(
          kafka.bootstrapServers, kafka.clientOptions ++ Map(
            "kafka.max.in.flight.requests.per.connection" -> "1",
            "kafka.enable.idempotence" -> "true"))
        println(toKafkaDistributed(Pool.open(spark, poolPath), topic, hi,
          graft.codec.WireCodec.avroProducerEncoder(registry), sink.write))
      } finally admin.close()
    case "version" :: Nil =>
      println(Version)
    case other =>
      System.err.println(
        s"""unknown command: ${other.mkString(" ")}
           |usage: consume <pool> [-f json|zson|zjson|zng] [topic] [offset] | info <pool> |
           |       fsck <pool|index> | produce <pool> <file> <topic> |
           |       etl [-zed] <yaml> [poolRoot] |
           |       ls [registryUrl] | from-kafka <pool> <checkpoint> <topics> <schemaId> |
           |       to-kafka <pool> <topic> | version""".stripMargin)
      sys.exit(1)
  }
}
