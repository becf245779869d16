package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Plan-shape guards: the dedup self-joins repeat their expensive subtree
  * (shingle explode+distinct / minhash aggregation) on both sides; AQE must
  * reuse the materialized exchange at runtime rather than recompute it.
  * (That runtime reuse is also why the subtrees are NOT persisted: a cache
  * would force an extra row→columnar materialization the reuse avoids.)
  */
class PlanAuditSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def corpus = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      (1 to 200).map(i => Row(i.toLong, s"tok${i%7} tok${i%11} tok${i%13} tok${i%17} tok${i%19}")).asJava,
      StructType.fromDDL("id bigint, text string"))
  }

  test("filters push down to the parquet scan; projections prune the read schema") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val q = docs.filter(col("lang") === "en").select("doc_id", "n_chars")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"expected lang filter pushed to scan:\n$plan")
    // read schema carries only the referenced columns, not text/source
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("doc_id") && read.contains("n_chars") && !read.contains("text"),
      s"expected pruned ReadSchema:\n$read")
  }

  test("asof join compiles to one shuffle and zero join operators") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val left = spark.createDataFrame(
      (1 to 100).map(i => Row(i.toLong, s"u${i % 5}", i.toLong * 10)).asJava,
      StructType.fromDDL("id bigint, user string, ts bigint"))
    val right = spark.createDataFrame(
      (1 to 50).map(i => Row(s"u${i % 5}", i.toLong * 7, s"t$i")).asJava,
      StructType.fromDDL("user string, ts bigint, tag string"))
    val df = graft.ops.AsOf.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("tag"))
    df.collect()
    // the adaptive plan string repeats the tree under "== Initial Plan ==";
    // audit only the final section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    // one shuffle for the window partitioning (unions/local ops add none)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("jaccard pair join reuses the shingle exchange at runtime") {
    val df = Dedup.jaccardPairs(corpus, "id", "text")
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") || finalPlan.contains("ReusedQueryStage"),
      s"expected runtime exchange reuse in:\n$finalPlan")
  }

  test("LSH candidate join reuses the signature exchange at runtime") {
    val df = Dedup.lshCandidatePairs(corpus, "id", "text")
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") || finalPlan.contains("ReusedQueryStage"),
      s"expected runtime exchange reuse in:\n$finalPlan")
  }
}
