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
  */
final class KafkaTopicSource(bootstrap: String, maxPerTrigger: Long = 1L << 20)
    extends TopicSource {
  def readStream(spark: SparkSession, topics: Seq[String],
      startingOffsets: Map[String, Long]): DataFrame = {
    // per-topic start offsets, partition 0 pinned (fifo/consumer.go:59-63)
    val so = topics.map { t =>
      val off = startingOffsets.getOrElse(t, Pool.KafkaOffsetEarliest)
      s""""$t":{"0":$off}"""
    }.mkString("{", ",", "}")
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", so)
      .option("maxOffsetsPerTrigger", maxPerTrigger)
      .load()
      .select(col("topic"), col("partition").cast("long").as("partition"),
        col("offset"), col("key"), col("value"))
  }
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
    * no Spark checkpoint state needed for correctness (the anti-dup assert +
    * sink-derived offsets make restarts self-healing).
    *
    * @param decode   wire batch → envelope batch (codec layer, C1/C6)
    * @param shaper   optional SQL applied per micro-batch (Q31)
    */
  def fromTopics(
      spark: SparkSession,
      source: TopicSource,
      topics: Seq[String],
      pool: Pool,
      decode: DataFrame => DataFrame,
      shaper: Option[String] = None,
      checkpoint: String,
      interval: String = "5 seconds"): StreamingQuery = {

    val starts = topics.map(t => t -> pool.nextOffset(t)).toMap
    val lastSeen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    starts.foreach { case (t, o) => if (o >= 0) lastSeen.put(t, o - 1) }

    val wire = source.readStream(spark, topics, starts)
    wire.writeStream
      .trigger(Trigger.ProcessingTime(interval)) // T1 latency bound
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // T4: monotonic offset enforcement per topic (fifo/consumer.go:117-122)
          batch.groupBy("topic").agg(min("offset").as("lo"), max("offset").as("hi"))
            .collect().foreach { r =>
              val t = r.getString(0)
              val last = lastSeen.getOrDefault(t, Long.MinValue)
              require(r.getLong(1) > last,
                s"offset went backwards on $t: ${r.getLong(1)} <= $last")
              lastSeen.put(t, r.getLong(2))
            }
          val env = decode(batch)
          val shaped = shaper.map(Shaper.shape(env, _)).getOrElse(env)
          // single-topic batches arrive offset-ordered (partition 0 pinned)
          // → skip the range shuffle on commit (3× faster for 1M-record
          // micro-batches; see tools/Throughput)
          pool.append(shaped, presorted = topics.size == 1 && shaper.isEmpty)
        }
      }
      .start()
  }

  /** Streaming CDC ETL (beyond-reference: the reference's `etl` is a
    * cron-style one-shot, cmd/zync/etl/command.go:82-91): ingest wire
    * batches into the input pool and run the transform per micro-batch.
    * Exactly-once holds across arbitrary batch boundaries because the
    * anti-join + atomic marker commit is the dedup mechanism, not the
    * trigger — a restart or replay changes batching, not results.
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
          inputPool.append(decode(batch))
          graft.etl.Etl.run(spark, inputPool, outputPool, transform)
          ()
        }
      }
      .start()
  }

  /** `to-kafka` (3.2): pool → topic from the sink's high-water mark, batched
    * reads in offset order (fifo/to.go:31-55). Returns records produced.
    */
  def toTopic(
      pool: Pool,
      topic: String,
      highWaterMark: Long,
      encode: DataFrame => DataFrame,
      sink: DataFrame => Unit,
      batchSize: Int = 200): Long = { // fifo/to.go:29 BatchSize
    var produced = 0L
    var hwm = highWaterMark
    var done = false
    while (!done) {
      val batch = pool.read()
        .filter(col("kafka.topic") === topic && col("kafka.offset") >= hwm)
        .orderBy(col("kafka.offset"))
        .limit(batchSize)
        .cache()
      try {
        val n = batch.count()
        if (n == 0) done = true
        else {
          // order BEFORE encoding: encoders may project the kafka meta away,
          // and the row-codec map preserves partition order (README.md:141-152)
          sink(encode(batch.orderBy(col("kafka.offset"))))
          val maxOff = batch.agg(max(col("kafka.offset"))).collect()(0).getLong(0)
          hwm = maxOff + 1
          produced += n
          if (n < batchSize) done = true
        }
      } finally batch.unpersist()
    }
    produced
  }
}
