package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over embedding columns
  * (`Array[Float]` / `Array[Double]`).
  *
  * - `bruteForceTopK`: the correctness baseline — broadcast the (small)
  *   query set against the corpus, fold the dot product inside codegen'd
  *   higher-order functions (`zip_with` + `aggregate`), distributed top-k
  *   per query via window rank. Linear in corpus size, embarrassingly
  *   parallel: this IS the right plan when queries are few.
  * - `ivfAssign` / `ivfTopK`: the scale path — partition the corpus into
  *   Voronoi cells of K centroids (inverted file); a query searches only
  *   its cell (or nprobe cells), cutting scanned vectors by ~K×.
  */
object Similarity {

  /** Elementwise cosine similarity, deterministic left-to-right sums.
    *
    * A native codegen expression (one fused loop over the unsafe array data)
    * rather than `aggregate(zip_with(...))`: higher-order functions are
    * CodegenFallback in Spark, so the HOF form leaves whole-stage codegen,
    * allocates a zipped array, and boxes every lambda application — per
    * candidate pair, in the hot path of every similarity join. Results are
    * bit-identical (same accumulation order).
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumnsBridge.of(
      org.apache.spark.sql.graft.CosineSimilarity(
        org.apache.spark.sql.graft.GraftColumnsBridge.expr(a),
        org.apache.spark.sql.graft.GraftColumnsBridge.expr(b)))

  /** Exact top-k neighbors per query vector (self-match excluded).
    * Output: (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id")) // broadcast(q) chosen by AQE
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF cell assignment: nearest centroid by cosine (ties → lowest centroid
    * id). Centroids must be small (broadcast); at scale they come from a
    * k-means sample. Output: corpus columns + `centroid_id`.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = ivfAssignN(corpus, centroids, idCol, vecCol, 1)

  /** Multi-cell assignment: each row duplicated into its `nprobe` nearest
    * cells (rank 1..nprobe by cosine, centroid-id tiebreak). nprobe > 1 is
    * the standard IVF recall knob for QUERIES — corpus rows stay in exactly
    * one cell, so probing n cells scans n/K of the corpus, never duplicates
    * it.
    */
  def ivfAssignN(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, nprobe: Int): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val c = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("centv"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_cos").desc, col("centroid_id"))
    corpus.join(broadcast(c))
      .withColumn("_cos", cosine(col(vecCol), col("centv")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .drop("_cos", "_rn", "centv")
  }

  /** Train K centroids with Lloyd's algorithm, entirely as DataFrame ops —
    * the in-engine source of `ivfAssign`/`ivfTopK` centroids.
    *
    * Per round: assign every vector to its nearest centroid (centroids
    * broadcast), then recompute each centroid as the elementwise mean via
    * `posexplode` + one partial-aggregating groupBy — shuffle volume is
    * vectors × dims rows per round, the corpus is never collected. Centroids
    * are `localCheckpoint`ed per round so lineage stays constant. Seeds are
    * the K lowest-id vectors (deterministic, engine-portable); a centroid
    * whose cell empties drops out (k shrinks rather than NaN-ing).
    * Output: (centroid_id, `vecCol` as array<double>).
    */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val pts = corpus.select(col(idCol).as("_pid"), col(vecCol).as("_pv"))
    var cents = pts.orderBy(col("_pid")).limit(k)
      .select(col("_pid").as("centroid_id"),
        transform(col("_pv"), x => x.cast("double")).as("cv"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(pts, cents.select(col("centroid_id").as("_pid"),
        col("cv").as("_pv")), "_pid", "_pv")
      cents = assigned
        .select(col("centroid_id"), posexplode(col("_pv")))
        .groupBy("centroid_id", "pos").agg(avg(col("col").cast("double")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
        .localCheckpoint(true)
    }
    cents.select(col("centroid_id"), col("cv").as(vecCol))
  }

  /** IVF search: assign corpus rows to one cell each, queries to their
    * `nprobe` nearest cells, then brute-force only within the probed cells.
    * Output: (query_id, rank, neighbor_id). A corpus row lives in exactly
    * one cell, so no candidate pair appears twice regardless of nprobe.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val ac = ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("centroid_id"))
    val aq = ivfAssignN(queries, centroids, idCol, vecCol, nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("centroid_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    aq.join(ac, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
