package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev-only: stage timing of the end-to-end corpus dedup composition. */
object ProfileCorpusDedup {
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
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name%-34s rows=$n")
    }

    corpus.count() // warmup

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val pairs = Dedup.jaccardPairs(corpus, "id", "text",
        n = 3, threshold = 0.5, maxDf = 100).select("d1", "d2")
      time("jaccardPairs")(pairs.count())
      val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("persist pairs")(p.count())
      val members = p.select(explode(array(col("d1"), col("d2"))).as("id")).distinct()
      time("members")(members.count())
      var canon: org.apache.spark.sql.DataFrame = null
      time("canonicalIds rounds")({ canon = Dedup.canonicalIds(members, "id", p); canon.count() })
      val drops = canon.filter(col("canonical") =!= col("id")).select(col("id"))
      time("drops")(drops.count())
      time("anti-join survivors")(corpus.join(drops, Seq("id"), "left_anti").count())
      time("dedupCorpus end-to-end")(
        Dedup.dedupCorpus(corpus, "id", "text", n = 3, threshold = 0.5).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
