package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pool.Pool
import graft.query.Shaper

/** Structured-Streaming sync layer: the Spark-native `from-kafka` /
  * `to-kafka` (reference: cmd/zync/from-kafka/command.go, fifo/to.go).
  *
  * Topic I/O is abstracted behind [[TopicSource]] / [[TopicSink]]:
  * `KafkaTopicSource/Sink` bind to the standard `kafka` DSv2 format (the
  * connector jar is deployment-provided), `FileTopicSource/MemoryTopicSink`
  * back offline tests with identical semantics. Both speak the wire schema:
  *
  * {{{ topic:string, partition:long, offset:long, key:binary, value:binary }}}
  */
trait TopicSource extends Serializable {
  /** Streaming read starting at `startingOffsets` (topic → first offset). */
  def readStream(spark: SparkSession, topics: Seq[String],
      startingOffsets: Map[String, Long]): DataFrame
}

/** Kafka-backed source (S1). `maxPerTrigger` mirrors `-thresh`
  * (from-kafka/command.go:79): bounds records per micro-batch.
  *
  * @param clientOptions extra reader options passed straight to the Kafka
  *   DSv2 source — TLS/SASL deployments set `kafka.security.protocol`,
  *   `kafka.ssl.truststore.location`, `kafka.sasl.mechanism`,
  *   `kafka.sasl.jaas.config`, … (the `kafka.`-prefixed analogs of the
  *   reference's flags, cli/flags.go:95-139). The structural options
  *   (subscribe, startingOffsets, bootstrap) are applied after and win.
  */
final class KafkaTopicSource(bootstrap: String, maxPerTrigger: Long = 1L << 20,
    clientOptions: Map[String, String] = Map.empty)
    extends TopicSource {

  /** The full option map handed to the DataStreamReader — factored out so
    * offline specs can assert TLS/SASL pass-through without a broker.
    */
  def readerOptions(topics: Seq[String], startingOffsets: Map[String, Long]): Map[String, String] = {
    // per-topic start offsets, partition 0 pinned (fifo/consumer.go:59-63)
    val so = topics.map { t =>
      val off = startingOffsets.getOrElse(t, Pool.KafkaOffsetEarliest)
      s""""$t":{"0":$off}"""
    }.mkString("{", ",", "}")
    clientOptions ++ Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> so,
      "maxOffsetsPerTrigger" -> maxPerTrigger.toString)
  }

  def readStream(spark: SparkSession, topics: Seq[String],
      startingOffsets: Map[String, Long]): DataFrame =
    spark.readStream.format("kafka")
      .options(readerOptions(topics, startingOffsets))
      .load()
      .select(col("topic"), col("partition").cast("long").as("partition"),
        col("offset"), col("key"), col("value"))
}

/** Kafka-backed batch producer (S2's sink half): writes (topic, key, value)
  * rows through the Kafka DSv2 batch writer. Factored like
  * [[KafkaTopicSource]]: `writerOptions` is spec-assertable without a broker
  * (TLS/SASL pass-through from `~/.graft/kafka.json` via
  * [[graft.cli.KafkaClientConfig]]); the `kafka` format string binds only at
  * write time, where the deployment provides the connector jar.
  */
final class KafkaTopicSink(bootstrap: String,
    clientOptions: Map[String, String] = Map.empty) extends Serializable {
  def writerOptions: Map[String, String] =
    clientOptions + ("kafka.bootstrap.servers" -> bootstrap)
  def write(batch: DataFrame): Unit =
    batch.write.format("kafka").options(writerOptions).save()
}

/** File-backed source for offline tests: reads parquet files appearing under
  * `dir` with the wire schema.
  */
final class FileTopicSource(dir: String) extends TopicSource {
  def readStream(spark: SparkSession, topics: Seq[String],
      startingOffsets: Map[String, Long]): DataFrame = {
    val wire = org.apache.spark.sql.types.StructType.fromDDL(
      "topic string, partition long, offset long, key binary, value binary")
    val base = spark.readStream.schema(wire).parquet(dir)
      .filter(col("topic").isin(topics: _*))
    startingOffsets.foldLeft(base) { case (df, (t, off)) =>
      df.filter(!(col("topic") === t) || col("offset") >= off)
    }
  }
}

object StreamSync {

  /** `from-kafka` (3.1): stream topics into a pool with crash-free resume —
    * starting offsets come from the sink pool itself (T3, fifo/lake.go:62-82),
    * no Spark checkpoint state needed for correctness.
    *
    * Replay handling (T4): foreachBatch is at-least-once — after a crash
    * between `pool.append` and the checkpoint commit, Spark replays the same
    * micro-batch (and with an existing checkpoint it ignores the sink-derived
    * `startingOffsets`). Each batch is therefore filtered to offsets strictly
    * above the per-topic high-water mark before appending: the
    * already-committed prefix is skipped, the remainder lands exactly once.
    * The reference's consumer enforces the same monotonic-offset contract by
    * construction (fifo/consumer.go:117-122).
    *
    * @param decode    wire batch → envelope batch (codec layer, C1/C6)
    * @param shaper    optional SQL applied per micro-batch (Q31)
    * @param zedShaper optional Zed program applied per micro-batch — the
    *   reference's native `-shaper shape.zed` form
    *   (from-kafka/command.go:276-282), compiled by
    *   [[graft.query.ZedScript]]; envelope batches are offset-ordered, which
    *   is the stream order a `collect` in the script sees
    */
  def fromTopics(
      spark: SparkSession,
      source: TopicSource,
      topics: Seq[String],
      pool: Pool,
      decode: DataFrame => DataFrame,
      shaper: Option[String] = None,
      checkpoint: String,
      interval: String = "5 seconds",
      zedShaper: Option[String] = None): StreamingQuery = {

    val starts = topics.map(t => t -> pool.nextOffset(t)).toMap
    val lastSeen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    starts.foreach { case (t, o) => if (o >= 0) lastSeen.put(t, o - 1) }

    val wire = source.readStream(spark, topics, starts)
    wire.writeStream
      .trigger(Trigger.ProcessingTime(interval)) // T1 latency bound
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import scala.jdk.CollectionConverters._
        // Drop the already-committed prefix (checkpoint replay after a crash
        // mid-commit) instead of failing — a `require` here would crash-loop
        // on every restart until the checkpoint was deleted by hand.
        val fresh = lastSeen.asScala.foldLeft(batch) { case (df, (t, last)) =>
          df.filter(!(col("topic") === t) || col("offset") > last)
        }.persist()
        try {
          if (!fresh.isEmpty) {
            fresh.groupBy("topic").agg(max("offset").as("hi")).collect()
              .foreach(r => lastSeen.put(r.getString(0), r.getLong(1)))
            val env = decode(fresh)
            val sqlShaped = shaper.map(Shaper.shape(env, _)).getOrElse(env)
            val shaped = zedShaper
              .map(Shaper.shapeZed(sqlShaped, _, order = Seq("kafka.offset")))
              .getOrElse(sqlShaped)
            // single-topic batches arrive offset-ordered (partition 0 pinned)
            // → skip the range shuffle on commit (3× faster for 1M-record
            // micro-batches; see tools/Throughput)
            pool.append(shaped,
              presorted = topics.size == 1 && shaper.isEmpty && zedShaper.isEmpty)
          }
        } finally fresh.unpersist()
        ()
      }
      .start()
  }

  /** Streaming CDC ETL (beyond-reference: the reference's `etl` is a
    * cron-style one-shot, cmd/zync/etl/command.go:82-91): ingest wire
    * batches into the input pool and run the transform per micro-batch.
    * Exactly-once holds across arbitrary batch boundaries because the
    * anti-join + atomic marker commit is the dedup mechanism, not the
    * trigger — a restart or replay changes batching, not results.
    *
    * Replay guard: a crash between `inputPool.append` and the checkpoint
    * commit replays the micro-batch; an unguarded second append would put two
    * unmarked copies of each (topic, offset) in the input pool, and both
    * would pass the done-marker anti-join → duplicate output. Each batch is
    * filtered to offsets at or above the input pool's own per-topic resume
    * point (a segment-tail read, pruned by the pool's (topic, offset) sort)
    * before appending.
    */
  def etlPipeline(
      spark: SparkSession,
      source: TopicSource,
      topics: Seq[String],
      inputPool: Pool,
      outputPool: Pool,
      transform: graft.etl.Transform,
      decode: DataFrame => DataFrame,
      checkpoint: String,
      interval: String = "5 seconds"): StreamingQuery = {
    val starts = topics.map(t => t -> inputPool.nextOffset(t)).toMap
    source.readStream(spark, topics, starts)
      .writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val next = topics.map(t => t -> inputPool.nextOffset(t)).toMap
          val fresh = next.foldLeft(batch) { case (df, (t, off)) =>
            if (off == Pool.KafkaOffsetEarliest) df
            else df.filter(!(col("topic") === t) || col("offset") >= off)
          }
          if (!fresh.isEmpty) {
            inputPool.append(decode(fresh))
            graft.etl.Etl.run(spark, inputPool, outputPool, transform)
          }
          ()
        }
      }
      .start()
  }

  /** `to-kafka` (3.2): pool → topic from the sink's high-water mark, batched
    * produce in offset order (fifo/to.go:31-55). Returns records produced.
    *
    * ONE ordered scan of the pool: `toLocalIterator` streams the sorted
    * result partition-by-partition into the producer loop, preserving the
    * reference's 200-record produce batching (fifo/to.go:29) without the
    * r1 loop's re-read + re-sort of the pool per batch (O(N²/batchSize)
    * scan work on a drain-from-zero).
    */
  def toTopic(
      pool: Pool,
      topic: String,
      highWaterMark: Long,
      encode: DataFrame => DataFrame,
      sink: DataFrame => Unit,
      batchSize: Int = 200): Long = { // fifo/to.go:29 BatchSize
    import scala.jdk.CollectionConverters._
    val spark = pool.spark
    // order BEFORE encoding: encoders may project the kafka meta away,
    // and the row-codec map preserves partition order (README.md:141-152)
    // footer-pruned range scan: only the files that can hold the drain
    // range are listed/scheduled (fifo/lake.go:84-92's query shape)
    val ordered = pool.readRange(topic, highWaterMark)
      .orderBy(col("kafka.offset"))
    val encoded = encode(ordered)
    val schema = encoded.schema
    var produced = 0L
    encoded.toLocalIterator().asScala.grouped(batchSize).foreach { rows =>
      sink(spark.createDataFrame(rows.asJava, schema))
      produced += rows.size
    }
    produced
  }

  /** Distributed ordered drain — the connector-backed form of [[toTopic]].
    *
    * [[toTopic]] streams rows to the driver and re-wraps each batch in a
    * DataFrame, bouncing every record driver→cluster→Kafka — parity with
    * the reference's sync producer loop (fifo/to.go:29-55), but the wrong
    * shape at scale. Here the drain range is sorted into ONE partition
    * (total order by construction: a 1-partition range shuffle + in-
    * partition sort) and handed to the sink as a single DataFrame — the
    * executor task talks straight to Kafka through the deployment's
    * connector, no driver round-trip. Order survives because a single
    * partition is written by a single task = one producer; the CLI pairs
    * this with `max.in.flight.requests.per.connection=1` (+ idempotence)
    * so broker-side retries cannot reorder either. Single-topic ordered
    * produce is inherently one-producer-serial (SCALING.md) — the shuffle
    * to one partition costs nothing the sink wasn't already forcing.
    *
    * `encode` must be a row-wise projection (all the engine's codecs are):
    * anything that re-partitions would break the order contract.
    *
    * @return records produced (a narrow pre-count of the drain range —
    *   the scan reads only the kafka meta columns, then the sink pass
    *   reads the data once).
    */
  def toTopicDistributed(
      pool: Pool,
      topic: String,
      highWaterMark: Long,
      encode: DataFrame => DataFrame,
      sink: DataFrame => Unit): Long = {
    val scoped = pool.readRange(topic, highWaterMark)
    val produced = scoped.count()
    if (produced > 0) {
      val single = scoped
        .repartitionByRange(1, col("kafka.offset"))
        .sortWithinPartitions(col("kafka.offset"))
      sink(encode(single))
    }
    produced
  }
}
