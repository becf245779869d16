package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.GraftSession
import graft.ops.Curate

/** Scale probe for the in-engine classifier: 100k synthetic docs (~50
  * tokens each, two vocabularies mixed by label), timed per phase —
  * token-bucket aggregation, per-epoch GD cost, scoring pass. Run with
  * `sbt "runMain graft.tools.ClassifierScale"`; numbers land in SCALING.md.
  */
object ClassifierScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import scala.jdk.CollectionConverters._
    val nDocs = 100000
    val rnd = new scala.util.Random(7L)
    val rows = (0 until nDocs).map { i =>
      val pos = i % 4 == 0 // 25% positives
      val vocab = if (pos) "sci" else "web"
      val toks = Seq.tabulate(50)(j => s"${vocab}_${rnd.nextInt(2000)}")
      Row(i.toLong, toks.mkString(" "), if (pos) 1.0 else 0.0)
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("id bigint, text string, y double"))
      .repartition(32).persist()
    df.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[clfscale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  out=$n")
    }
    time("train epochs=1") {
      Curate.trainTextClassifier(df, "id", col("y") === 1.0, "text",
        epochs = 1).count()
    }
    var w: org.apache.spark.sql.DataFrame = null
    time("train epochs=3") {
      w = Curate.trainTextClassifier(df, "id", col("y") === 1.0, "text", epochs = 3)
      w.count()
    }
    time("score 100k docs") {
      Curate.scoreTextClassifier(df, "id", "text", w).count()
    }
    // separation sanity at scale
    val s = Curate.scoreTextClassifier(df, "id", "text", w)
      .join(df.select(col("id"), col("y")), Seq("id"))
      .groupBy("y").agg(avg("score").as("mean")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    println(f"[clfscale] mean score pos=${s(1.0)}%.4f neg=${s(0.0)}%.4f")
    spark.stop()
  }
}
