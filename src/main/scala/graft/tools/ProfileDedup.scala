package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev-only: stage-by-stage timing of the shingle-dedup family at a given
  * SF dir, to attribute bench cost to plan phases. Not part of the library
  * surface; run with `sbt "runMain graft.tools.ProfileDedup"`.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val corpus = docs
      .unionByName(docs.filter(col("id") % 5 === 0)
        .select((col("id") + 100000).as("id"),
          concat(col("text"), lit(" extra words appended")).as("text")))
      .unionByName(docs.filter(col("id") % 7 === 0)
        .select((col("id") + 200000).as("id"), col("text")))
      .repartition(32)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name%-28s rows=$n")
    }

    // warmup
    corpus.count()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("corpus.count")(corpus.count())
      val raw = Dedup.rawShingles(corpus, "id", "text", 3)
      time("rawShingles.count")(raw.count())
      val hashed = raw.select(col("id"), xxhash64(col("sh")).as("sh")).distinct()
      time("hashed distinct")(hashed.count())
      val rareKeys = hashed.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select("sh")
      val rare = hashed.join(rareKeys, Seq("sh"), "left_semi")
      time("rare semi-join")(rare.count())
      val inter = rare.select(col("id").as("d1"), col("sh"))
        .join(rare.select(col("id").as("d2"), col("sh")), Seq("sh"))
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      time("inter pairs")(inter.count())
      time("jaccardPairs full")(Dedup.jaccardPairs(corpus, "id", "text").count())
      time("lshCandidatePairs full")(Dedup.lshCandidatePairs(corpus, "id", "text").count())
      val sig16 = {
        val mins = (0 until 16).map(p =>
          min(md5(concat(lit(p.toString), lit("|"), col("sh")))).as(s"m$p"))
        raw.groupBy("id").agg(mins.head, mins.tail: _*)
      }
      time("16 md5-min signature")(sig16.count())
      // the production near-dup preset (128 perms / 32 bands, est >= 0.8):
      // end-to-end signatures → banded candidates → signature-estimated
      // verify — the SCALING.md pin for the preset's intrinsic cost
      time("est preset 128/32 @0.8")(
        Dedup.minhashEstimatePairs(corpus, "id", "text",
          n = 3, numPerms = 128, bands = 32, threshold = 0.8).count())
      time("128 md5-min signature")(
        Dedup.minhashSignatureFrame(corpus, "id", "text", 3, 128).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
