package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, SignatureIndex}

/** Dev-only: stage-labeled wall breakdown of the dedup_incremental_indexed
  * lifecycle (create → rebuild → appendDelta → pruned probe), the exact
  * construction of the bench row, so the 9-10 s floor is attributable to
  * its phases. Round 2+ is the warm signal.
  */
object ProfileSigIndex {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect() // warmup

    def steal(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().next().trim.split("\\s+").drop(1).lift(7)
          .map(_.toLong).getOrElse(-1L)
        finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1L }

    for (round <- 1 to rounds) {
      val t00 = System.nanoTime()
      val st0 = steal()
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"  ${(System.nanoTime() - t0) / 1e9}%6.2fs  $name")
        r
      }
      println(s"--- round $round ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("id"), col("text"))
      val landed = docs.filter(col("id") % 3 =!= 0)
      val idx = time("create") {
        SignatureIndex.create(spark,
          graft.TempDirs.create("graft-sigidx-prof-") + "/idx", n = 3,
          numPerms = 16, bands = 4, idTypeDdl = "BIGINT")
      }
      time("rebuild (even half)") {
        idx.rebuild(Dedup.minhashSignatureFrame(
          landed.filter(col("id") % 2 === 0), "id", "text", 3, 16), Seq.empty)
      }
      time("appendDelta (odd half)") {
        idx.appendDelta(Dedup.minhashSignatureFrame(
          landed.filter(col("id") % 2 =!= 0), "id", "text", 3, 16), Seq.empty)
      }
      val (kept, _, release) = time("probe build (lazy)") {
        Dedup.dedupIncrementalNearIndexed(
          docs.filter(col("id") % 3 === 0), idx, "id", "text",
          threshold = 0.5, manage = false)
      }
      val n = time("probe count")(kept.count())
      release()
      println(f"  ===== wall ${(System.nanoTime() - t00) / 1e9}%6.2fs rows=$n steal=${steal() - st0}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
