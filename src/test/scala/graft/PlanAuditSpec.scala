package graft

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
