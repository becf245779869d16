package graft.tools

import java.nio.file.Files
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.EtlQueries
import graft.etl.Etl
import graft.pool.Pool

/** Dev-only: per-Spark-job wall breakdown of the etl_exactly_once scenario. */
object ProfileEtl {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true") // experiment knob
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc.take(60)))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          lines.add(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $desc")
        }
      }
    })

    // warmup
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    for (round <- 1 to 2) {
      lines.clear()
      val t0 = System.nanoTime()
      val inPool = Pool.create(spark, Files.createTempDirectory("petl-in-").toString)
      val outPool = Pool.create(spark, Files.createTempDirectory("petl-out-").toString)
      def mark(s: String): Unit = lines.add(f"== ${(System.nanoTime() - t0) / 1e9}%6.2fs $s")
      mark("start")
      inPool.append(EtlQueries.cdcEnvelopes(spark, sfDir))
      mark("inPool.append done")
      Etl.run(spark, inPool, outPool, EtlQueries.transform)
      mark("run 1 done")
      Etl.run(spark, inPool, outPool, EtlQueries.transform)
      mark("run 2 done")
      outPool.read().groupBy("_kind").count().collect()
      mark("final agg done")
      println(f"--- round $round total ${(System.nanoTime() - t0) / 1e9}%.2f ---")
      lines.forEach(println)
    }
    spark.stop()
  }
}
