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
    // warm-up pass so JIT/codegen costs don't pollute the measurement
    env.write.mode("overwrite").format("noop").save()
    val pool = Pool.create(spark, Files.createTempDirectory("graft-tp-").toString)
    val t0 = System.nanoTime()
    pool.append(env)
    val commitSec = (System.nanoTime() - t0) / 1e9
    val pool2 = Pool.create(spark, Files.createTempDirectory("graft-tp-").toString)
    val t1 = System.nanoTime()
    pool2.append(env, presorted = true)
    val fastSec = (System.nanoTime() - t1) / 1e9
    val count = pool.read().count()
    println(f"""{"records":$count,"commit_sec":$commitSec%.2f,"presorted_commit_sec":$fastSec%.2f,"records_per_sec":${(count / commitSec).toLong}}""")
    spark.stop()
  }
}
