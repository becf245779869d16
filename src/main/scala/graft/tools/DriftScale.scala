package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.{Similarity, SimilarityIndex}

/** The IVF model-drift claim under test: [[SimilarityIndex.IvfIndex]]
  * holds its coarse quantizer FROZEN through `append`/`ingestNear`
  * (the standard contract), so when the ingest distribution drifts away
  * from what the centroids were trained on, the drifted mass piles into
  * whichever old cells sit nearest — cells bloat (a probe reads whole
  * cells, so per-query probed rows grow toward the whole drifted set)
  * and recall@k at fixed nprobe moves with how the stale Voronoi
  * boundaries happen to cut the new region. `rebuild()` redraws the
  * cells for the data actually in the index.
  *
  * The probe: train on the even-id half of `embeddings`, then stream the
  * odd-id half through `ingestNear` TRANSFORMED into a drifted region
  * (coordinates damped ×0.2 and the first 8 dims shifted +0.6 — a corner
  * of the sphere the base centroids never saw). Before/after `rebuild`,
  * measure for drifted queries: recall@10 vs brute force over the same
  * index contents (nprobe 1 and 2), the max cell fraction (bloat), and
  * the mean rows a 1-probe query reads (cost). Expected: after rebuild
  * the drifted region gets its own cells — max-cell fraction and probed
  * rows drop by O(K/2), recall at fixed nprobe holds or improves — and
  * the id set is EXACTLY preserved (spec-pinned separately).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.DriftScale 4 16"
  */
object DriftScale {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 4
    val k = if (args.length > 1) args(1).toInt else 16
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .persist()
    val base = emb.filter(col("vec_id") % 2 === 0)
    val drifted = emb.filter(col("vec_id") % 2 === 1)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          x * lit(0.2) + when(i < 8, lit(0.6)).otherwise(lit(0.0))).as("v"))
      .persist()
    println(s"[drift] base=${base.count()} drifted=${drifted.count()} k=$k")

    val path = java.nio.file.Files.createTempDirectory("drift-ivf").toString
    SimilarityIndex.buildIvf(base, "vec_id", "v", k, iters = 3, path)
    var idx = SimilarityIndex.loadIvf(spark, path, "vec_id", "v")

    (0 until batches).foreach { i =>
      val b = drifted.filter(floor(col("vec_id") / 2) % batches === i)
      val t0 = System.nanoTime()
      val landed = idx.ingestNear(b, threshold = 0.999)
      println(f"[drift] batch $i: landed $landed in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val queries = drifted.filter(col("vec_id") % 37 === 1)
      .limit(24).persist()
    queries.count()

    def recall(ix: SimilarityIndex.IvfIndex, nprobe: Int): Double = {
      val kk = 10
      val corpus = ix.assigned.drop("centroid_id")
      val truth = Similarity.bruteForceTopK(corpus, queries, "vec_id", "v", kk)
        .select(col("query_id"), col("neighbor_id"))
        .persist()
      try {
        val n = truth.count()
        val hits = ix.topK(queries, kk, nprobe)
          .select(col("query_id"), col("neighbor_id"))
          .join(truth, Seq("query_id", "neighbor_id")).count()
        hits.toDouble / n
      } finally truth.unpersist()
    }
    // bloat + cost: the biggest cell's share of the index, and the mean
    // rows a 1-probe drifted query reads (= size of its nearest cell)
    def cellShape(ix: SimilarityIndex.IvfIndex): (Double, Double) = {
      val sizes = ix.assigned.groupBy("centroid_id").count()
        .select(col("centroid_id"), col("count")).persist()
      try {
        val total = sizes.agg(sum("count")).first().getLong(0).toDouble
        val maxFrac = sizes.agg(max("count")).first().getLong(0) / total
        val probed = Similarity.ivfAssign(queries, ix.centroids, "vec_id", "v")
          .join(sizes, Seq("centroid_id"))
          .agg(avg("count")).first().getDouble(0)
        (maxFrac, probed)
      } finally sizes.unpersist()
    }

    def snap(tag: String, ix: SimilarityIndex.IvfIndex): String = {
      val (maxFrac, probed) = cellShape(ix)
      val rs = Seq(1, 2, 4, 8).map(np => f""""recall10_np$np":${recall(ix, np)}%.3f""")
      f"""{"phase":"$tag",${rs.mkString(",")},"max_cell_frac":$maxFrac%.3f,"mean_probed_rows_np1":$probed%.1f}"""
    }
    val before = snap("before_rebuild", idx)

    val ids0 = idx.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    val t0 = System.nanoTime()
    idx = idx.rebuild(k, iters = 3)
    val rebuildSec = (System.nanoTime() - t0) / 1e9
    val ids1 = idx.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    require(ids0 == ids1, "rebuild changed the id set")

    println(before)
    println(snap("after_rebuild", idx))
    println(f"""{"rebuild_sec":$rebuildSec%.2f,"id_set_preserved":true}""")
    spark.stop()
  }
}
