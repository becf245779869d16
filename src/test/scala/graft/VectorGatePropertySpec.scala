package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Randomized cross-check of the gated vector ingest against a
  * brute-force reference: the gate's full rule set — cell assignment
  * (cosine desc, centroid-id-asc tiebreak), the landed gate over probed
  * cells, and the in-batch lower-id-wins rule INCLUDING its transitive
  * form (hi drops when ANY lower near-id shares its cell, whether or not
  * that id itself survives) — re-derived with plain Scala loops that
  * accumulate in the engine's documented left-to-right order (cosines
  * bit-identical by the CosineSimilarity/NearestCentroids contract, so
  * threshold comparisons agree exactly even at the boundary). Grid-valued
  * vectors deliberately produce duplicate and scaled rows across
  * landed/batch, exercising the cosine-1.0 replay edge.
  */
class VectorGatePropertySpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cell(v: Seq[Double], cents: Seq[(Long, Seq[Double])]): Long =
    cents.map { case (cid, cv) => (cos(v, cv), cid) }
      .minBy { case (c, cid) => (-c, cid) }._2

  test("ingestNear matches a brute-force reference on random geometry") {
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    val rnd = new Random(20260815L)
    for (trial <- 0 until 6) {
      val dims = 2 + rnd.nextInt(3)
      val k = 2 + rnd.nextInt(3)
      def vec(): Seq[Double] = {
        val v = Seq.fill(dims)((rnd.nextInt(9) - 4).toDouble)
        if (v.forall(_ == 0.0)) v.updated(0, 1.0) else v
      }
      val cents = (0 until k).map(i => (100L + i, vec()))
      val landed = (0 until 8 + rnd.nextInt(8)).map(i => (i.toLong, vec()))
      val batch = (0 until 6 + rnd.nextInt(8)).map(i => (1000L + i, vec()))
      val threshold = 0.85

      val lc = landed.map { case (id, v) => (id, v, cell(v, cents)) }
      val bc = batch.map { case (id, v) => (id, v, cell(v, cents)) }
      val drops = bc.filter { case (id, v, c) =>
        lc.exists { case (_, lv, lcell) => lcell == c && cos(v, lv) >= threshold } ||
          bc.exists { case (lo, lv, loCell) =>
            loCell == c && lo < id && cos(v, lv) >= threshold }
      }.map(_._1).toSet
      val expect = bc.map(_._1).toSet -- drops

      def df(rows: Seq[(Long, Seq[Double])]) = spark.createDataFrame(
        rows.map { case (i, v) => Row(i, v) }.asJava, sch)
      val path = java.nio.file.Files.createTempDirectory(s"ivf-prop$trial").toString
      graft.ops.SimilarityIndex.buildIvfFromCentroids(
        df(landed), df(cents), "vec_id", "v", path)
      val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
      val n = idx.ingestNear(df(batch), threshold)
      val got = idx.assigned.filter(col("vec_id") >= 1000L)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got == expect,
        s"trial $trial dims=$dims k=$k\n cents=$cents\n landed=$landed\n batch=$batch")
      assert(n == expect.size)
      // replay idempotence on the same random geometry: everything that
      // landed now has an exact twin, everything gated stays gated
      assert(idx.ingestNear(df(batch), threshold) == 0L, s"trial $trial replay")
    }
  }
}
