package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.GraftSession

/** Long-document probe for the HOF-lambda evaluation trap: Catalyst HOF
  * lambda bodies are interpreted with no common-subexpression elimination,
  * and CollapseProject inlines projection aliases into their use sites —
  * so an array expression referenced inside a per-element lambda (or an
  * alias that a downstream explode folds into the Generate) is RE-EVALUATED
  * per element, turning O(tokens) passes into O(tokens²) per document.
  * Invisible on the short-doc test tables (~54 tokens), catastrophic on
  * production-length documents — this probe runs the gram-building family
  * on 500-token docs where the quadratic form is 20-100× slower.
  * The fix pattern (applied in rawShingles / repetition / spanGrams /
  * winnowFingerprints): bind arrays as lambda variables via
  * `transform(array(x), v => …)`, which the optimizer cannot inline through.
  */
object HofScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import scala.jdk.CollectionConverters._
    val nDocs = 2000
    val nTok = 500
    val rows = (1 to nDocs).map { i =>
      Row(i.toLong, Seq.tabulate(nTok)(j => s"tok${(i * 31 + j) % 997}").mkString(" "))
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("id bigint, text string")).repartition(32).persist()
    df.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[hofscale] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  out=$n")
    }
    // warm-up round then measured round: JIT skews the first pass 2-5x
    for (round <- Seq("warm", "meas")) {
      time(s"$round rawShingles n=3") {
        graft.ops.Dedup.rawShingles(df, "id", "text", 3).count()
      }
      time(s"$round repetition n=3") {
        graft.ops.TextOps.repetition(df, "id", "text", n = 3)
          .agg(sum(col("n_grams"))).collect()(0).getLong(0)
      }
      time(s"$round winnow fps + explode (fused)") {
        graft.ops.TextOps.winnowFingerprints(df, "id", "text", 3, 4)
          .select(col("id"), explode(col("fps")).as("fp")).count()
      }
      time(s"$round duplicatedSpans k=8") {
        graft.ops.Dedup.duplicatedSpans(df, "id", "text", k = 8).count()
      }
      time(s"$round minhashEstimatePairs") {
        graft.ops.Dedup.minhashEstimatePairs(df, "id", "text").count()
      }
      time(s"$round frequentNgrams n=3 top-100") {
        graft.ops.TextOps.frequentNgrams(df, "id", "text", n = 3, k = 100).count()
      }
    }
    spark.stop()
  }
}
