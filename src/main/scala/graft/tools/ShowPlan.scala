package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Curate, Dedup}

/** Dev-only: dump executed plans of the round-6-reshaped operators. */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val corpus = Seq(
      (1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w v u t"),
      (4L, "p q r s t u v"), (5L, "a b c d x y z")).toDF("id", "text")

    val cont = Curate.contamination(corpus, corpus.filter($"id" === 1), "id", "text", 3)
    cont.collect()
    println("=== contamination ===")
    println(cont.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))

    val lsh = Dedup.lshCandidatePairs(corpus, "id", "text")
    lsh.collect()
    println("=== minhash lsh ===")
    println(lsh.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))

    val jac = Dedup.jaccardPairs(corpus, "id", "text")
    jac.collect()
    println("=== jaccard ===")
    println(jac.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
