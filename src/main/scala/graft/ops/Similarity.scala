package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** Approximate / exact nearest-neighbor search over embedding columns
  * (`Array[Float]` / `Array[Double]`).
  *
  * - `bruteForceTopK`: the correctness baseline — broadcast the (small)
  *   query set against the corpus, score each candidate with the native
  *   codegen `cosine_sim` expression, then rank with a bounded two-phase
  *   top-k aggregate. Linear in corpus size, embarrassingly parallel: this
  *   IS the right plan when queries are few.
  * - `ivfAssign` / `ivfTopK`: the scale path — partition the corpus into
  *   Voronoi cells of K centroids (inverted file); a query searches only
  *   its cell (or nprobe cells), cutting scanned vectors by ~K×.
  *
  * Both scale shapes are deliberate (the round-3 fixes):
  *
  * - Cell assignment is MAP-ONLY: centroids are metadata-scale by contract
  *   (K rows — a k-means product), so they ship to every task as one
  *   broadcast array row and each corpus row picks its cells with a per-row
  *   argmax/top-n over that array. No corpus×K intermediate, no exchange
  *   anywhere on the corpus side. (The previous broadcast-join + window-rank
  *   formulation hash-shuffled corpus×K rows just to rank per row — a
  *   4096×-amplified shuffle of the corpus at production cell counts.)
  * - Per-query ranking is TWO-PHASE: `top_k_by_score` is a
  *   TypedImperativeAggregate, so ObjectHashAggregate keeps at most k
  *   candidates per (query, partition) map-side and the shuffle carries
  *   k × partitions rows per query — not the whole candidate set into one
  *   reducer per query, which is what `Window.partitionBy(query_id)` does.
  */
object Similarity {

  /** Elementwise cosine similarity, deterministic left-to-right sums.
    *
    * A native codegen expression (one fused loop over the unsafe array data)
    * rather than `aggregate(zip_with(...))`: higher-order functions are
    * CodegenFallback in Spark, so the HOF form leaves whole-stage codegen,
    * allocates a zipped array, and boxes every lambda application — per
    * candidate pair, in the hot path of every similarity join. Results are
    * bit-identical (same accumulation order). Accepts any numeric element
    * types (int/long/float/double/decimal), widening to double like the HOF
    * form did.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumnsBridge.of(
      org.apache.spark.sql.graft.CosineSimilarity(
        org.apache.spark.sql.graft.GraftColumnsBridge.expr(a),
        org.apache.spark.sql.graft.GraftColumnsBridge.expr(b)))

  /** Bounded top-k aggregate column: array<struct<score,payload>> ranked by
    * (score desc, payload asc), truncated to k. See
    * [[org.apache.spark.sql.graft.TopKByScore]].
    */
  def topKByScore(score: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.graft.GraftColumnsBridge.of(
      org.apache.spark.sql.graft.TopKByScore(
        org.apache.spark.sql.graft.GraftColumnsBridge.expr(score.cast("double")),
        org.apache.spark.sql.graft.GraftColumnsBridge.expr(payload), k)
        .toAggregateExpression())

  /** (query_id, cos, neighbor_id) candidates → (query_id, rank, neighbor_id),
    * rank 1..k per query by (cos desc, neighbor_id asc) — two-phase: partial
    * top-k per input partition, final merge over k×partitions rows.
    */
  private def rankTopK(candidates: DataFrame, k: Int): DataFrame =
    candidates
      .groupBy("query_id")
      .agg(topKByScore(col("cos"), col("neighbor_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col").getField("payload").as("neighbor_id"))

  /** Scored brute-force candidate frame shared by the topK variants:
    * (query_id, neighbor_id, cos, metaCols*), self-match excluded,
    * broadcast(q) chosen by AQE.
    */
  private def bruteCandidates(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, metaCols: Seq[String]): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id") +: col(vecCol).as("cv") +:
      metaCols.map(col): _*)
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
  }

  /** Exact top-k neighbors per query vector (self-match excluded).
    * Output: (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    rankTopK(bruteCandidates(corpus, queries, idCol, vecCol, Nil), k)

  /** Ranking with a metadata-carrying struct payload: like [[rankTopK]]
    * but each candidate's `metaCols` ride the bounded aggregate, so
    * neighbor attributes arrive WITHOUT a second join against the corpus —
    * at 100 TB that second join is a full corpus shuffle; this is one
    * extra struct per surviving candidate. The tiebreak on equal cosines
    * is the payload struct ASC, which leads with neighbor_id — same order
    * as the bare form. Output: (query_id, rank, neighbor_id, cos, metaCols*).
    */
  private def rankTopKMeta(candidates: DataFrame, k: Int,
      metaCols: Seq[String]): DataFrame = {
    val payload = struct(col("neighbor_id") +: metaCols.map(col): _*)
    val out = candidates
      .groupBy("query_id")
      .agg(topKByScore(col("cos"), payload, k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
    out.select(col("query_id") +: (col("pos") + 1).as("rank") +:
      col("col").getField("payload").getField("neighbor_id").as("neighbor_id") +:
      col("col").getField("score").as("cos") +:
      metaCols.map(m => col("col").getField("payload").getField(m).as(m)): _*)
  }

  /** As [[bruteForceTopK]] with neighbor metadata (see [[rankTopKMeta]]). */
  def bruteForceTopKMeta(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, metaCols: Seq[String]): DataFrame =
    rankTopKMeta(bruteCandidates(corpus, queries, idCol, vecCol, metaCols), k, metaCols)

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
    *
    * Map-only by construction: the centroid set (metadata-scale, K rows) is
    * collected once and re-shipped as a single broadcast array row; each
    * corpus row sorts that K-array by (cos desc, centroid_id asc) in-row and
    * keeps the first nprobe entries. The physical plan is scan →
    * BroadcastNestedLoopJoin(1-row build) → project/generate: ZERO exchanges
    * touch corpus rows (pinned by PlanAuditSpec).
    */
  def ivfAssignN(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, nprobe: Int): DataFrame = {
    val cents = centroids.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    // centroids are metadata-scale by contract — K rows, the k-means output —
    // so collecting them is a driver metadata read, not a data-path collect.
    // NOTE this is EAGER: the centroid pipeline runs here, at plan-build
    // time (cache/localCheckpoint centroid DataFrames you reuse).
    assignCollected(corpus, cents.collect().toSeq, cents.schema, vecCol, nprobe)
  }

  /** Assignment against already-collected centroid rows — shared by
    * [[ivfAssignN]] and [[ivfTopK]] (which collects its centroids ONCE for
    * both the corpus and query sides instead of re-running the centroid
    * pipeline per side).
    */
  private def assignCollected(corpus: DataFrame, centRows: Seq[Row],
      centSchema: StructType, vecCol: String, nprobe: Int): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val spark = corpus.sparkSession
    val oneRow = spark.createDataFrame(
      java.util.List.of(Row(centRows)),
      StructType(Seq(StructField("_cents",
        ArrayType(centSchema, containsNull = false), nullable = false))))

    // per-row fused argmax/top-n over the broadcast array — the native
    // `nearest_centroids` kernel: (cos desc, cid asc) ordering with NaN
    // largest and null cos last, identical to the window ordering this
    // replaces (and to the DuckDB oracle's ORDER BY). One primitive loop per
    // row; the HOF formulation (`array_sort(transform(...))`) would box a
    // lambda frame and allocate a struct per CENTROID per row.
    val bridge = org.apache.spark.sql.graft.GraftColumnsBridge
    val top = bridge.of(org.apache.spark.sql.graft.NearestCentroids(
      bridge.expr(col(vecCol)), bridge.expr(col("_cents")), nprobe))
    val outCols = corpus.columns.toSeq.map(col)
    corpus.crossJoin(broadcast(oneRow))
      .withColumn("_top", top)
      .select(outCols :+ explode(col("_top")).as("_c"): _*)
      .withColumn("centroid_id", col("_c").getField("cid"))
      .drop("_c")
  }

  /** Per-vector linear int8 quantization — the storage-scale path for
    * embedding columns (4× smaller than float32 before parquet encoding; at
    * 100 TB of embeddings that is the difference between one copy and four).
    * Output: (idCol, vmin, scale, codes) with
    * `code_i = floor((x_i - vmin) · 255 / (vmax - vmin))` (so max → 255) and
    * `x_i ≈ vmin + code_i · scale` for dequantization. Zero-range vectors
    * quantize to all-zero codes. Map-only: one projection, no shuffle;
    * `floor` + IEEE double arithmetic make codes bit-identical across
    * engines (no round-half-mode hazard).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), v.as("_v"))
      .select(col(idCol), col("_v"),
        array_min(col("_v")).as("vmin"), array_max(col("_v")).as("vmax"))
      .select(col(idCol), col("vmin"),
        ((col("vmax") - col("vmin")) / 255.0).as("scale"),
        when(col("vmax") === col("vmin"), transform(col("_v"), _ => lit(0)))
          .otherwise(transform(col("_v"), x =>
            floor((x - col("vmin")) * 255.0 / (col("vmax") - col("vmin"))).cast("int")))
          .as("codes"))
  }

  /** The ±1 sign matrix for [[randomProjection]], derived from the md5 of
    * `salt|i|j` (first hex char < '8' → +1): deterministic, engine-portable
    * (any system with md5 reproduces it), and seeded by `salt` so disjoint
    * projections can coexist. Row j is output dimension j over all `dIn`
    * input dimensions.
    */
  def projectionSigns(dIn: Int, dOut: Int, salt: String): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dOut).map { j =>
      (0 until dIn).map { i =>
        val h = md.digest(s"$salt|$i|$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (h.head < '8') 1.0 else -1.0
      }
    }
  }

  /** Johnson–Lindenstrauss random-sign projection: map each `dIn`-dim
    * vector to `dOut` dims via `proj_j = (Σ_i v_i · s_ij) / √dOut` with
    * s_ij ∈ {±1} from [[projectionSigns]]. Pairwise distances and angles
    * are preserved in expectation (JL lemma; sign matrices are the
    * Achlioptas 2003 database-friendly variant) — the standard cheap
    * pre-step before ANN indexing when embeddings arrive wider than the
    * index wants, and a complement to PQ (which compresses storage but
    * keeps dimensionality).
    *
    * Scale shape: MAP-ONLY — the sign matrix is folded into the plan as
    * literals (dIn·dOut flips, trivially small next to any real corpus),
    * each output dim is one codegen'd multiply-add chain over the input
    * array, and the pass is a zero-exchange projection like `pqEncode`.
    * Determinism: products by ±1 are exact, the additions run in one fixed
    * left-to-right order on every engine, and √dOut and the final division
    * are correctly-rounded IEEE ops — the output is bit-identical anywhere.
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      dIn: Int, dOut: Int, salt: String = "rp"): DataFrame =
    df.select(col(idCol),
      projectionColumn(col(vecCol), dIn, dOut, salt).as("proj"))

  /** The projection of [[randomProjection]] as a composable column — the
    * input array rides a lambda binding so the dIn·dOut element lookups
    * can never re-evaluate the source expression (the rawShingles/winnow
    * guard), and callers can project corpus and query frames identically.
    */
  def projectionColumn(vec: Column, dIn: Int, dOut: Int,
      salt: String = "rp"): Column = {
    require(dIn >= 1 && dOut >= 1,
      s"projectionColumn: dims must be >= 1, got dIn=$dIn dOut=$dOut")
    val signs = projectionSigns(dIn, dOut, salt)
    flatten(transform(array(transform(vec, x => x.cast("double"))), vv =>
      // fail fast on a length mismatch: element_at past the end is null
      // (non-ANSI), which would silently null the whole projected dimension
      // — the pqTopK/pqTrain per-row dimensionality contract. Null input
      // still projects to nulls (propagation, not an error).
      when(assert_true(vv.isNull || (size(vv) === dIn),
          lit(s"projectionColumn: input vector length differs from dIn=$dIn")).isNull,
        array(signs.map { row =>
          (0 until dIn).map(i => element_at(vv, i + 1) * lit(row(i)))
            .reduceLeft(_ + _) / sqrt(lit(dOut.toDouble))
        }: _*))))
  }

  /** Two-stage ANN through the projection: stage 1 scores every
    * (query, corpus) pair in the `dProj`-dim projected space and keeps the
    * top `refine` per query (bounded two-phase aggregate, no window);
    * stage 2 re-ranks ONLY those candidates with exact full-dimension
    * cosine and returns the top `k`. The classic coarse-then-exact
    * composition: the quadratic stage-1 scan touches `dProj` doubles per
    * pair instead of `dIn` (8× less compute and IO at 64→8), while
    * correctness-critical ordering comes from the exact stage, whose cost
    * is `refine` candidates per query.
    *
    * Scale shape: stage 1 carries only (id, projected vector) — the wide
    * embedding column is pruned from its scan; candidates (n_queries ×
    * refine rows) broadcast into the stage-2 joins, so the corpus is never
    * shuffled — one narrow scan, one wide candidate-pruned scan. Output:
    * (query_id, rank, neighbor_id), rank 1..k by (exact cos desc, id asc).
    */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dIn: Int, dProj: Int, k: Int, refine: Int,
      salt: String = "rp"): DataFrame = {
    require(refine >= k, s"projectedTopK: refine ($refine) must be >= k ($k)")
    val pc = projectionColumn(col(vecCol), dIn, dProj, salt)
    val cProj = corpus.select(col(idCol).as("neighbor_id"), pc.as("cp"))
    val qProj = queries.select(col(idCol).as("query_id"), pc.as("qp"))
    val cand = qProj.join(cProj, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qp"), col("cp")))
      .groupBy("query_id")
      .agg(topKByScore(col("cos"), col("neighbor_id"), refine).as("_top"))
      .select(col("query_id"), explode(col("_top")).as("_c"))
      .select(col("query_id"), col("_c").getField("payload").as("neighbor_id"))
    val exact = cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    rankTopK(exact, k)
  }

  /** Train K centroids with Lloyd's algorithm, entirely as DataFrame ops —
    * the in-engine source of `ivfAssign`/`ivfTopK` centroids.
    *
    * Per round: assign every vector to its nearest centroid (map-only, see
    * [[ivfAssignN]]), then recompute each centroid as the elementwise mean
    * via `posexplode` + one partial-aggregating groupBy — shuffle volume is
    * vectors × dims rows per round, the corpus is never collected. Centroids
    * are `localCheckpoint`ed per round so lineage stays constant across any
    * number of iterations. Seeds are the K lowest-id vectors by default, or
    * — with `seedByHash` — the K lowest by `md5(id)` (the same portable-hash
    * convention as `Curate.hashSample`): id order correlates with data
    * layout and collection time, so hash order is the statistically safer
    * production seeding; both are deterministic and engine-portable. A
    * centroid whose cell empties drops out (k shrinks rather than NaN-ing).
    * Output: (centroid_id, `vecCol` as array<double>).
    *
    * The mean is computed as an EXACT decimal sum divided by the count
    * (not `avg(double)`): double summation order varies with partitioning,
    * so a float avg would make centroids run-dependent. Decimal sums make
    * the result bit-identical on any engine/partitioning — which is also
    * what lets the driver hash-compare Lloyd rounds against DuckDB.
    * `roundDigits >= 0` additionally rounds each round's means to that many
    * digits before the next assignment — the cross-engine reproducibility
    * mode: the mean's final double rounding is the one step engines may
    * disagree on by one ulp, and snapping to a coarser grid makes the
    * centroids agree unless a mean lands within an ulp of a half-way point
    * at that digit (engines break HALF_UP ties on different
    * representations; ~1e-16 probability per mean, absent on the test
    * data, diagnosable as a single-round centroid diff if ever hit).
    */
  /** Rebuild a DataFrame from COLLECTED rows as a LocalRelation — the
    * driver-side carrier for metadata-scale model state between Lloyd
    * rounds (K centroid rows, m×k codebook rows). Values round-trip as
    * JVM objects (doubles exact, never rendered), so the frame is
    * bit-identical to the plan it was collected from; downstream centroid
    * collects ([[assignCollected]], [[booksOneRow]]) then short-circuit
    * on the local plan instead of scheduling a job, and no checkpoint
    * blocks need managing. Per round this replaces localCheckpoint (one
    * job) + the next round's collect (another job) with ONE collect —
    * the §2.6/§1.2 job-count cut for the iterative trainers.
    */
  private def localFrame(spark: org.apache.spark.sql.SparkSession,
      rows: Array[Row], schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private def collectLocal(df: DataFrame): DataFrame =
    localFrame(df.sparkSession, df.collect(), df.schema)

  private def kmeansSeeds(pts: DataFrame, k: Int, seedByHash: Boolean): DataFrame = {
    val seedOrder =
      if (seedByHash) Seq(md5(col("_pid").cast("string")), col("_pid"))
      else Seq(col("_pid"))
    collectLocal(pts.orderBy(seedOrder: _*).limit(k)
      .select(col("_pid").as("centroid_id"),
        // seeds are raw input vectors — exact on every engine, never rounded
        transform(col("_pv"), x => x.cast("double")).as("cv")))
  }

  private def lloydRound(pts: DataFrame, cents: DataFrame,
      roundDigits: Int): DataFrame = {
    def maybeRound(c: Column): Column =
      if (roundDigits >= 0) transform(c, x => round(x, roundDigits)) else c
    val assigned = ivfAssign(pts, cents.select(col("centroid_id").as("_pid"),
      col("cv").as("_pv")), "_pid", "_pv")
    collectLocal(assigned
      .select(col("centroid_id"), posexplode(col("_pv")))
      .groupBy("centroid_id", "pos")
      .agg((sum(col("col").cast("double").cast("decimal(30,15)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy("centroid_id")
      .agg(maybeRound(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m"))).as("cv")))
  }

  def kmeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seedByHash: Boolean = false,
      roundDigits: Int = -1): DataFrame = {
    val pts = corpus.select(col(idCol).as("_pid"), col(vecCol).as("_pv"))
    var cents = kmeansSeeds(pts, k, seedByHash)
    // rounds carry the K centroids DRIVER-side (collectLocal): one job per
    // round (the mean aggregation), no checkpoint blocks, and the next
    // round's centroid collect short-circuits on the local plan
    for (_ <- 1 to iters)
      cents = lloydRound(pts, cents, roundDigits)
    cents.select(col("centroid_id"), col("cv").as(vecCol))
  }

  /** As [[kmeans]] with a convergence stopping rule: rounds run until the
    * largest centroid movement (L2 between a centroid's old and new vector)
    * drops to `tol` or `maxIters` is hit — the production training loop,
    * where a fixed round count either wastes passes or stops short.
    * Returns (centroids, roundsRun). The shift check is one K-row join +
    * aggregate per round (metadata-scale collect — the corpus is never
    * collected); a centroid whose cell empties drops out and does not
    * count toward the shift.
    */
  def kmeansConverged(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIters: Int, tol: Double, seedByHash: Boolean = false,
      roundDigits: Int = -1): (DataFrame, Int) = {
    require(maxIters >= 1 && tol >= 0.0, "need maxIters >= 1 and tol >= 0")
    val pts = corpus.select(col(idCol).as("_pid"), col(vecCol).as("_pv"))
    var cents = kmeansSeeds(pts, k, seedByHash)
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      val next = lloydRound(pts, cents, roundDigits)
      // both rounds are DRIVER-side local frames (collectLocal) — the
      // shift check is a K-row Scala fold, no join job. Same arithmetic
      // as the former plan: per centroid a left-to-right Σ(a−b)² fold
      // then sqrt (the `aggregate` HOF's order), max across centroids.
      val newByCid = next.collect().map(r => r.get(0) -> r.getSeq[Double](1)).toMap
      val shifts = cents.collect().flatMap { r =>
        newByCid.get(r.get(0)).map { nv =>
          val ov = r.getSeq[Double](1)
          math.sqrt(ov.indices.foldLeft(0.0) { (acc, i) =>
            val d = ov(i) - nv(i); acc + d * d
          })
        }
      }
      cents = next
      rounds += 1
      converged = shifts.nonEmpty && shifts.max <= tol
    }
    (cents.select(col("centroid_id"), col("cv").as(vecCol)), rounds)
  }

  /** IVF search: assign corpus rows to one cell each, queries to their
    * `nprobe` nearest cells, then brute-force only within the probed cells.
    * Output: (query_id, rank, neighbor_id). A corpus row lives in exactly
    * one cell, so no candidate pair appears twice regardless of nprobe.
    */
  /** Scored probed-cell candidate frame shared by the ivfTopK variants:
    * centroids collected ONCE for both sides, corpus rows in exactly one
    * cell (nprobe applies to queries only).
    */
  private def ivfCandidates(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, nprobe: Int,
      metaCols: Seq[String]): DataFrame = {
    val cents = centroids.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val centRows = cents.collect().toSeq // once, for both sides
    val ac = assignCollected(corpus, centRows, cents.schema, vecCol, nprobe = 1)
      .select(col(idCol).as("neighbor_id") +: col(vecCol).as("cv") +:
        col("centroid_id") +: metaCols.map(col): _*)
    val aq = assignCollected(queries, centRows, cents.schema, vecCol, nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("centroid_id"))
    aq.join(ac, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame =
    rankTopK(ivfCandidates(corpus, queries, centroids, idCol, vecCol, nprobe, Nil), k)

  /** IVF search over an ALREADY-ASSIGNED corpus — `assigned` carries a
    * `centroid_id` column (e.g. a [[SimilarityIndex]] read back from
    * storage), so the corpus-side assignment pass is skipped entirely and,
    * when the assigned table is PARTITIONED by `centroid_id`, the probe
    * reads only the probed cells' FILES: the distinct probed cell ids
    * (≤ K, metadata-scale like the centroids themselves) are collected and
    * pushed as a static `isin` partition filter, so a 1-query probe over a
    * K-cell corpus scans ~nprobe/K of it — file skipping, not row
    * filtering (pinned by PlanAuditSpec). Results are identical to
    * [[ivfTopK]] when `assigned` came from [[ivfAssign]] with the same
    * centroids (assignment is deterministic).
    */
  def ivfTopKPreassigned(assigned: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 1): DataFrame = {
    val (aq, prunedStore) = probeCells(assigned, queries, centroids, idCol,
      vecCol, nprobe)
    val ac = prunedStore
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("centroid_id"))
    rankTopK(aq.select(col("query_id"), col("qv"), col("centroid_id"))
      .join(ac, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv"))), k)
  }

  /** The shared probe-side prologue of the preassigned searches: assign
    * the queries to their `nprobe` cells, CAST the query side's cell ids
    * to the stored column's type (partition discovery infers integer-like
    * path values as int while assignment produces the centroid idCol's
    * type — casting the small side keeps the stored partition column
    * untouched, so the probed-cell `isin` stays a partition FILTER; a cast
    * on the stored column would defeat pruning), and collect the ≤ K
    * distinct probed cells (a metadata-scale EAGER pass over the query
    * side, which re-evaluates lazily in the result plan; query batches are
    * small by the build-once/probe-many pattern — cache `queries` upstream
    * otherwise). Returns (assigned queries with query_id/qv/centroid_id,
    * the store pruned to the probed cells).
    */
  private[ops] def probeCells(store: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      nprobe: Int): (DataFrame, DataFrame) = {
    val (aq, pruned, _) = probeCellsCounted(store, queries, centroids,
      idCol, vecCol, nprobe)
    (aq, pruned)
  }

  /** As [[probeCells]], additionally returning the per-cell batch-side row
    * counts from the SAME eager pass (one map-side-combined groupBy collect
    * instead of a bare distinct — the distinct cell set is its key set).
    * [[SimilarityIndex.IvfIndex.ingestNear]]'s quadratic-corner guard reads
    * the counts without a second job over the batch.
    */
  private[ops] def probeCellsCounted(store: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      nprobe: Int): (DataFrame, DataFrame, Map[Any, Long]) = {
    val cents = centroids.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val cidType = store.schema("centroid_id").dataType
    val aq = assignCollected(queries, cents.collect().toSeq, cents.schema,
        vecCol, nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("centroid_id").cast(cidType).as("centroid_id"))
    val counts = aq.groupBy("centroid_id").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val probed = counts.keys.toSeq
    (aq, store.filter(col("centroid_id").isin(probed: _*)), counts)
  }

  /** As [[ivfTopK]] with neighbor metadata (see [[rankTopKMeta]]): the
    * probed-cell search returns `metaCols` per hit without re-joining the
    * corpus.
    */
  def ivfTopKMeta(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 1,
      metaCols: Seq[String] = Nil): DataFrame =
    rankTopKMeta(ivfCandidates(corpus, queries, centroids, idCol, vecCol, nprobe, metaCols),
      k, metaCols)

  // ---------------- product quantization (Jégou et al. 2011) ----------------
  //
  // The embedding COMPRESSION path, complementing IVF's pruning path: each
  // d-dim vector becomes m small integer codes (one per contiguous subspace),
  // and search scans codes + a per-query lookup table instead of floats. At
  // 100 TB of float32 embeddings, m=16 byte codes are a 16× storage/scan-IO
  // cut — the difference between an ANN sweep that reads 100 TB and one that
  // reads 6 TB. Assignment metric is SQUARED L2 per subspace (the PQ
  // formulation: reconstruction error — and hence dot/cosine against the
  // reconstruction — decomposes exactly across subspaces; per-subspace
  // cosine would not). Scale shapes:
  // - training: one joint Lloyd loop over ALL m subspaces at once — per
  //   round one map-only encode pass + one vectors×dims-row aggregation,
  //   exactly the `kmeans` shuffle shape, NOT m separate k-means jobs;
  // - encode: map-only (1-row broadcast codebook + the fused `pq_encode`
  //   kernel) — zero exchanges touch corpus rows;
  // - search: per-query LUTs (m×k dots, built query-side), one broadcast
  //   join against the codes frame, O(m) `pq_adc_score` per candidate,
  //   ranked by the bounded two-phase `top_k_by_score`.

  private def bridge = org.apache.spark.sql.graft.GraftColumnsBridge

  /** `pq_encode(vec, books)` as a Column (books: the 1-row broadcast flat
    * codebook, array<struct<sub,cid,cv>>). See
    * [[org.apache.spark.sql.graft.PqEncode]].
    */
  def pqEncodeCol(vec: Column, books: Column): Column =
    bridge.of(org.apache.spark.sql.graft.PqEncode(bridge.expr(vec), bridge.expr(books)))

  /** ADC cosine as a Column. See [[org.apache.spark.sql.graft.PqAdcScore]]. */
  def pqAdcScoreCol(codes: Column, dots: Column, norms: Column, qnorm: Column): Column =
    bridge.of(org.apache.spark.sql.graft.PqAdcScore(bridge.expr(codes),
      bridge.expr(dots), bridge.expr(norms), bridge.expr(qnorm)))

  /** Normalized flat codebook frame → collected rows + the 1-row broadcast
    * frame PqEncode consumes. Codebooks are metadata-scale by contract
    * (m×k rows, a [[pqTrain]] product) — collecting one is a driver metadata
    * read, EAGER like [[ivfAssignN]]'s centroid collect.
    */
  private def booksOneRow(df: DataFrame, codebook: DataFrame,
      vecCol: String): DataFrame = {
    val b = codebook.select(col("sub").cast("int").as("sub"),
      col("centroid_id").cast("int").as("cid"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val rows = b.collect().toSeq
    df.sparkSession.createDataFrame(
      java.util.List.of(Row(rows)),
      StructType(Seq(StructField("_books",
        ArrayType(b.schema, containsNull = false), nullable = false))))
  }

  /** Map-only codes column: `df` + `codesCol` via a 1-row broadcast of the
    * codebook and the fused `pq_encode` kernel — zero exchanges touch `df`.
    */
  private def withCodes(df: DataFrame, codebook: DataFrame, vecCol: String,
      srcVecCol: String, codesCol: String): DataFrame =
    df.crossJoin(broadcast(booksOneRow(df, codebook, vecCol)))
      .withColumn(codesCol, pqEncodeCol(col(srcVecCol), col("_books")))
      .drop("_books")

  /** Train a product-quantization codebook: `m` contiguous equal subspaces,
    * `k` centroids each, by a JOINT Lloyd loop (all subspaces advance in one
    * pass per round — per round: one map-only [[pqEncode]] + one
    * vectors×dims-row aggregation with exact decimal means, the same
    * shuffle shape and bit-reproducibility contract as [[kmeans]];
    * `roundDigits`/`seedByHash` as there). Seeds: the k lowest rows (by id,
    * or by `md5(id)` with `seedByHash`) sliced per subspace; centroid ids
    * are DENSE 0..k-1 in seed order (the k-row rank window is
    * metadata-scale), so codes index LUT arrays directly. A centroid whose
    * cell empties drops out (codes stay dense-valid; its LUT slot is simply
    * never produced). Every vector must match the corpus dimensionality
    * (taken from the first seed; divisible by `m`) — asserted per-row, so a
    * ragged corpus errors instead of silently shrinking the training set.
    * Output: (sub, centroid_id, `vecCol`).
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      iters: Int, seedByHash: Boolean = false, roundDigits: Int = -1): DataFrame = {
    require(m >= 1 && k >= 1 && iters >= 0,
      "pqTrain needs m >= 1, k >= 1, iters >= 0")
    val pts0 = corpus.select(col(idCol).as("_pid"),
      transform(col(vecCol), x => x.cast("double")).as("_pv"))
    val seedOrder =
      if (seedByHash) Seq(md5(col("_pid").cast("string")), col("_pid"))
      else Seq(col("_pid"))
    // the k seed rows are metadata-scale: slice them driver-side (same
    // contract as the centroid collects) — dense cid = seed rank, no window
    val seedRows = pts0.orderBy(seedOrder: _*).limit(k).collect()
    require(seedRows.nonEmpty, "pqTrain: empty corpus")
    // EVERY row must match the seed dimensionality, not merely be divisible
    // by m — a divisible-but-shorter vector would otherwise encode as null
    // codes and silently vanish from training
    val dim = seedRows.head.getSeq[Double](1).length
    require(dim % m == 0, s"pqTrain: vector length $dim not divisible by m=$m")
    val pts = pts0.filter(assert_true(size(col("_pv")) === dim,
      lit(s"pqTrain: vector length differs from the corpus dimensionality $dim")).isNull)
    val bookSchema = StructType(Seq(
      StructField("sub", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("centroid_id", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("cv", ArrayType(org.apache.spark.sql.types.DoubleType,
        containsNull = false), nullable = false)))
    val bookRows: Seq[Row] = seedRows.toSeq.zipWithIndex.flatMap { case (r, cid) =>
      val v = r.getSeq[Double](1)
      require(v.length == dim,
        s"pqTrain: seed vector length ${v.length} differs from dimensionality $dim")
      val sl = dim / m
      (0 until m).map(s => Row(s, cid, v.slice(s * sl, (s + 1) * sl)))
    }
    var books = corpus.sparkSession.createDataFrame(bookRows.asJava, bookSchema)
    // the per-row assert on pts only evaluates inside Lloyd rounds; with
    // iters=0 validate dimensionality explicitly so a ragged corpus still
    // errors here instead of surfacing later as null codes at encode time
    if (iters == 0)
      require(pts0.filter(size(col("_pv")) =!= dim).limit(1).count() == 0,
        s"pqTrain: vector length differs from the corpus dimensionality $dim")
    // rounds carry the m×k codebook DRIVER-side (collectLocal, the kmeans
    // discipline): one job per round, [[booksOneRow]]'s collect then
    // short-circuits on the local plan
    for (_ <- 1 to iters)
      books = collectLocal(pqLloydRound(pts, books, m, roundDigits))
    books.select(col("sub"), col("centroid_id"), col("cv").as(vecCol))
  }

  private def pqLloydRound(pts: DataFrame, books: DataFrame, m: Int,
      roundDigits: Int): DataFrame = {
    def maybeRound(c: Column): Column =
      if (roundDigits >= 0) transform(c, x => round(x, roundDigits)) else c
    val sl = (size(col("_pv")) / m).cast("int")
    val sub = (col("_pos") / col("_sl")).cast("int")
    withCodes(pts, books.withColumnRenamed("cv", "_bv"), "_bv", "_pv", "_codes")
      .filter(col("_codes").isNotNull)
      .select(col("_codes"), sl.as("_sl"), posexplode(col("_pv")).as(Seq("_pos", "_x")))
      .select(sub.as("sub"), pmod(col("_pos"), col("_sl")).cast("int").as("_within"),
        element_at(col("_codes"), sub + 1).as("centroid_id"), col("_x"))
      .groupBy("sub", "centroid_id", "_within")
      .agg((sum(col("_x").cast("decimal(30,15)")).cast("double") /
        count(lit(1))).as("_m"))
      .groupBy("sub", "centroid_id")
      .agg(maybeRound(transform(array_sort(collect_list(struct(col("_within"), col("_m")))),
        s => s.getField("_m"))).as("cv"))
  }

  /** Encode a corpus against a trained codebook: every row keeps its columns
    * and gains `codes` (array<int>, one dense centroid id per subspace).
    * Map-only — the codebook ships as one broadcast row; no exchange touches
    * corpus rows (pinned by PlanAuditSpec). Rows whose vector length doesn't
    * match the codebook encode as null codes.
    */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    withCodes(corpus, codebook.withColumnRenamed(vecCol, "_bv"), "_bv",
      vecCol, "codes")

  /** Reconstruct approximate vectors from codes (x̂ = concatenated subspace
    * centroids) — the decode side, for inspection/testing; search never
    * materializes this (that is ADC's point). One broadcast join against
    * the codebook + an id-keyed rebuild. Output: (idCol, `vhat`).
    */
  def pqReconstruct(encoded: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    encoded.select(col(idCol), posexplode(col("codes")).as(Seq("sub", "centroid_id")))
      .join(broadcast(codebook.select(col("sub"), col("centroid_id"),
        transform(col(vecCol), x => x.cast("double")).as("_cv"))),
        Seq("sub", "centroid_id"))
      .groupBy(idCol)
      .agg(flatten(transform(array_sort(collect_list(struct(col("sub"), col("_cv")))),
        s => s.getField("_cv"))).as("vhat"))

  /** Per-query LUT columns over `qv`: (`_dots` m×k dot tables, `_qnorm`).
    * Built with HOFs at QUERY cardinality (nq × m × k × d/m work — queries
    * are the small side by contract); the corpus-side scan never touches
    * them except through O(m) `pq_adc_score` reads. Returns the augmented
    * query frame plus the query-independent norms literal.
    */
  private def withQueryLuts(queries: DataFrame, codebook: DataFrame,
      vecCol: String): (DataFrame, Column) = {
    val b = codebook.select(col("sub").cast("int").as("sub"),
      col("centroid_id").cast("int").as("cid"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val rows = b.collect() // metadata-scale by contract (m×k codebook rows)
    require(rows.nonEmpty, "pqTopK: empty codebook")
    val m = rows.map(_.getInt(0)).max + 1
    val subLen = Array.fill(m)(-1)
    val maxCid = Array.fill(m)(0)
    rows.foreach { r =>
      val s = r.getInt(0)
      val cv = r.getSeq[Double](2)
      require(subLen(s) == -1 || subLen(s) == cv.length,
        s"pqTopK: inconsistent centroid lengths in subspace $s")
      subLen(s) = cv.length
      maxCid(s) = math.max(maxCid(s), r.getInt(1) + 1)
    }
    require(subLen.forall(_ >= 0), "pqTopK: a subspace has no centroids")
    // the query slicing below is UNIFORM (size(qv)/m) — a hand-built
    // codebook with unequal subspace lengths would pass the total-length
    // check yet mis-slice every query (silently wrong rankings, since
    // pqEncode itself handles unequal lengths fine); fail loudly instead
    require(subLen.forall(_ == subLen(0)),
      s"pqTopK: subspace lengths differ (${subLen.mkString(",")}) — ADC " +
        "slicing requires a uniform d/m split, as produced by pqTrain")
    // dense [sub][cid] planes; holes (emptied training cells) are zero
    // vectors — their code values are never produced, the slots just keep
    // LUT indexing aligned
    val planes = Array.tabulate(m)(s =>
      Array.fill(maxCid(s))(Seq.fill(subLen(s))(0.0)))
    rows.foreach(r => planes(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2))
    // a mismatched query vector would misslice into null LUT entries and
    // silently VANISH from the ranked output (null scores rank nowhere) —
    // error loudly instead, mirroring pqTrain's per-row dimensionality check
    val totalLen = subLen.sum
    val checked = queries.filter(assert_true(size(col("qv")) === totalLen,
      lit(s"pqTopK: query vector length differs from codebook total $totalLen")).isNull)
    // norms are query-independent: computed once, left-to-right like the
    // oracle's list_sum — shipped as one literal
    val norms = typedlit(planes.toSeq.map(_.toSeq.map(
      _.foldLeft(0.0)((acc, x) => acc + x * x))))
    val planesLit = typedlit(planes.toSeq.map(_.toSeq))
    val sl = (size(col("qv")) / m).cast("int")
    val dots = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(planesLit, s + 1), c =>
        aggregate(zip_with(slice(col("qv"), s * sl + 1, sl), c,
          (a, bb) => a * bb), lit(0.0), (acc, x) => acc + x)))
    val qnorm = sqrt(aggregate(col("qv"), lit(0.0), (acc, x) => acc + x * x))
    (checked.withColumn("_dots", dots).withColumn("_qnorm", qnorm), norms)
  }

  /** Scored ADC candidate frame shared by the pqTopK variants (the
    * bruteCandidates/ivfCandidates pattern): LUT-augmented broadcast
    * queries × the codes frame, self-match excluded, `metaCols` carried.
    */
  private def pqCandidates(encoded: DataFrame, queries: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String,
      metaCols: Seq[String]): DataFrame = {
    val (q0, norms) = withQueryLuts(
      queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("qv")),
      codebook.withColumnRenamed(vecCol, "_bv"), "_bv")
    val q = q0.select(col("query_id"), col("_dots"), col("_qnorm"))
    encoded.select(col(idCol).as("neighbor_id") +: col("codes") +: metaCols.map(col): _*)
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", pqAdcScoreCol(col("codes"), col("_dots"), norms, col("_qnorm")))
  }

  /** ADC top-k search over an ENCODED corpus: rank by the asymmetric cosine
    * `cos(q, x̂)` computed entirely from codes + per-query LUTs (the corpus
    * scan reads m ints per row, never a float vector — PQ's 100 TB move).
    * `encoded` is a [[pqEncode]] product (idCol + `codes`); queries carry
    * real vectors. One broadcast join + two-phase bounded top-k; self-match
    * excluded by id. Output: (query_id, rank, neighbor_id).
    */
  def pqTopK(encoded: DataFrame, queries: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    rankTopK(pqCandidates(encoded, queries, codebook, idCol, vecCol, Nil), k)

  /** As [[pqTopK]] with neighbor metadata riding the top-k payload struct
    * (see [[rankTopKMeta]]): `encoded` keeps its `metaCols`, and each hit
    * returns them without any join back to the corpus — with PQ that
    * matters twice, because the codes frame is the ONLY thing the scan
    * reads. Output: (query_id, rank, neighbor_id, cos, metaCols*).
    */
  def pqTopKMeta(encoded: DataFrame, queries: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, k: Int,
      metaCols: Seq[String] = Nil): DataFrame =
    rankTopKMeta(pqCandidates(encoded, queries, codebook, idCol, vecCol, metaCols),
      k, metaCols)

  /** IVF-PQ search over a STORED encoded corpus — `encoded` carries
    * (idCol, centroid_id, codes), e.g. a [[SimilarityIndex]] IVF-PQ table
    * read back from storage. The [[ivfTopKPreassigned]] move composed with
    * ADC: the probed cell ids push a static partition filter (file
    * skipping when the table is partitioned by `centroid_id`), and what
    * the surviving files yield per row is m int codes, never a float
    * vector — the two 100 TB levers stacked. Results are identical to
    * [[ivfPqTopK]] under the same centroids/codebook.
    */
  def ivfPqTopKPreassigned(encoded: DataFrame, queries: DataFrame,
      centroids: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val (aqAssigned, prunedStore) = probeCells(encoded, queries, centroids,
      idCol, vecCol, nprobe)
    val (aq0, norms) = withQueryLuts(aqAssigned,
      codebook.withColumnRenamed(vecCol, "_bv"), "_bv")
    val aq = aq0.select(col("query_id"), col("centroid_id"), col("_dots"), col("_qnorm"))
    val ac = prunedStore
      .select(col(idCol).as("neighbor_id"), col("centroid_id"), col("codes"))
    rankTopK(ac.join(aq, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        pqAdcScoreCol(col("codes"), col("_dots"), norms, col("_qnorm"))), k)
  }

  /** IVF-PQ: the coarse inverted file prunes cells, PQ codes shrink what a
    * probed cell scans — composed exactly from [[ivfAssignN]] (map-only
    * cell assignment both sides) + [[pqEncode]] (map-only codes) +
    * [[pqTopK]]'s ADC scoring, joined on the probed cell. Codes quantize
    * the RAW vectors (IVFFlat-style, not cell residuals — residual encoding
    * doubles training complexity for recall this corpus scale doesn't need;
    * the hook point is documented here). Output: (query_id, rank,
    * neighbor_id).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 1): DataFrame = {
    val cents = centroids.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val centRows = cents.collect().toSeq // once, for both sides
    val ac = withCodes(
      assignCollected(corpus, centRows, cents.schema, vecCol, nprobe = 1),
      codebook.withColumnRenamed(vecCol, "_bv"), "_bv", vecCol, "codes")
      .select(col(idCol).as("neighbor_id"), col("centroid_id"), col("codes"))
    val (aq0, norms) = withQueryLuts(
      assignCollected(queries, centRows, cents.schema, vecCol, nprobe)
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("centroid_id")),
      codebook.withColumnRenamed(vecCol, "_bv"), "_bv")
    val aq = aq0.select(col("query_id"), col("centroid_id"), col("_dots"), col("_qnorm"))
    val candidates = ac.join(aq, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pqAdcScoreCol(col("codes"), col("_dots"), norms, col("_qnorm")))
    rankTopK(candidates, k)
  }
}
