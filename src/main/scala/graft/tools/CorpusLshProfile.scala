package graft.tools
import org.apache.spark.sql.functions._
import graft.{Tables, GraftSession}
object CorpusLshProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, d, "documents").select(col("doc_id").as("id"), col("text"))
    val corpus = docs
      .unionByName(docs.filter(col("id") % 5 === 0)
        .select((col("id") + 100000).as("id"), concat(col("text"), lit(" extra words appended")).as("text")))
      .unionByName(docs.filter(col("id") % 7 === 0).select((col("id") + 200000).as("id"), col("text")))
      .repartition(spark.sparkContext.defaultParallelism)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[clsh] $label%-36s ${(System.nanoTime()-t0)/1e9}%8.2f s  out=$n")
    }
    val cand = graft.ops.Dedup.lshCandidatePairs(corpus, "id", "text", 3, 16, 4).persist()
    time("lsh candidates") { cand.count() }
    val verified = graft.ops.Dedup.jaccardForPairs(corpus, cand, "id", "text", 3)
      .filter(col("jaccard") >= 0.5).select("d1", "d2").persist()
    time("exact verify") { verified.count() }
    val members = verified.select(explode(array(col("d1"), col("d2"))).as("id")).distinct()
    time("canonicalIds rounds") {
      graft.ops.Dedup.canonicalIds(members, "id", verified, 20).count()
    }
    time("full keepCanonical") {
      graft.ops.Dedup.keepCanonical(corpus, "id", verified, 20).count()
    }
    time("full dedupCorpusLsh") {
      graft.ops.Dedup.dedupCorpusLsh(corpus, "id", "text", 3, 16, 4, 0.5).count()
    }
    time("full dedupCorpus (exact)") {
      graft.ops.Dedup.dedupCorpus(corpus, "id", "text").count()
    }
    spark.stop()
  }
}
