package graft.tools

import java.nio.file.Files
import graft.{EtlQueries, GraftSession}

/** Phase-timing probe for the ETL bench hotspot (not part of the driver
  * contract) — run: sbt "runMain graft.tools.EtlProfile [sfDir]".
  */
object EtlProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val env = EtlQueries.cdcEnvelopes(spark, sf)
    val inPool = graft.pool.Pool.create(spark, Files.createTempDirectory("p-in").toString)
    val outPool = graft.pool.Pool.create(spark, Files.createTempDirectory("p-out").toString)
    time("input append")(inPool.append(env))
    time("run 1")(graft.etl.Etl.run(spark, inPool, outPool, EtlQueries.transform))
    time("outputState only")(graft.etl.Etl.outputState(outPool))
    time("run 2 (no-op)")(graft.etl.Etl.run(spark, inPool, outPool, EtlQueries.transform))
    spark.stop()
  }
}
