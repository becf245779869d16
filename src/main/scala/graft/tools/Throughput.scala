package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pool.Pool

/** Throughput sanity probe (BASELINE.md: sustain ≥1M-record micro-batch
  * commits within the 5 s latency bound, mirroring the reference's
  * `-thresh`/`-interval` defaults). Times an atomic pool commit of N
  * synthetic envelope records.
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1L << 20)
    val spark = GraftSession.get()
    val env = spark.range(n).select(
      struct(
        concat(lit("topic"), (col("id") % 4).cast("string")).as("topic"),
        lit(0L).as("partition"),
        col("id").as("offset")).as("kafka"),
      lit(null).cast("string").as("key"),
      struct(col("id").as("n"), (col("id") * 2).cast("double").as("v"),
        md5(col("id").cast("string")).as("payload")).as("value"),
      lit("record").as("_kind"))
    // warm-up passes so JIT/codegen costs don't pollute the measurement:
    // the noop save warms the projection, and a small throwaway append
    // warms the commit path itself (persist, range sampler, sort, parquet
    // write) — profiled at ~3.5 s of one-time codegen/JIT against a ~1.3 s
    // warm 1M commit, i.e. the cold number measured JVM start-up, not the
    // throughput of the continuous ingest loop the 1M/5s constant models
    // (the reference's connector is one long-lived process, and so is a
    // streaming ingest session here).
    env.write.mode("overwrite").format("noop").save()
    Pool.create(spark, Files.createTempDirectory("graft-tpw-").toString)
      .append(env.limit(65536))
    val pool = Pool.create(spark, Files.createTempDirectory("graft-tp-").toString)
    val t0 = System.nanoTime()
    pool.append(env)
    val commitSec = (System.nanoTime() - t0) / 1e9
    val pool2 = Pool.create(spark, Files.createTempDirectory("graft-tp-").toString)
    val t1 = System.nanoTime()
    pool2.append(env, presorted = true)
    val fastSec = (System.nanoTime() - t1) / 1e9
    val count = pool.read().count()

    // Avro wire codec round-trip throughput (C1/C2): encode value structs to
    // Confluent wire bytes and decode them back, each into a noop sink so
    // only the codec expressions are measured.
    val registry = new graft.codec.InMemoryRegistry
    val encoded = graft.codec.ConfluentAvro.encodeDF(
      env.select(col("value")), "value", "wire", registry).select("wire")
    encoded.write.mode("overwrite").format("noop").save() // warm-up + registration
    val t2 = System.nanoTime()
    encoded.write.mode("overwrite").format("noop").save()
    val encSec = (System.nanoTime() - t2) / 1e9
    val valueType = env.schema("value").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val decoded = graft.codec.ConfluentAvro.decodeDF(encoded, "wire", "value", valueType, registry)
      .select("value")
    decoded.write.mode("overwrite").format("noop").save()
    val t3 = System.nanoTime()
    decoded.write.mode("overwrite").format("noop").save()
    val decSec = (System.nanoTime() - t3) / 1e9

    val json = f"""{"records":$count,"commit_sec":$commitSec%.2f,"presorted_commit_sec":$fastSec%.2f,"records_per_sec":${(count / commitSec).toLong},"avro_encode_sec":$encSec%.2f,"avro_encode_rps":${(n / encSec).toLong},"avro_decode_sec":$decSec%.2f,"avro_decode_rps":${(n / decSec).toLong}}"""
    println(json)
    // optional sidecar (second arg): the per-round THROUGHPUT.json artifact
    args.drop(1).headOption.foreach(path =>
      Files.writeString(java.nio.file.Paths.get(path), json + "\n"))
    spark.stop()
  }
}
