package graft

import org.apache.spark.sql.functions.{col, length}
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

  test("Zed script stages fuse into one Catalyst plan: filter pushed to scan, schema pruned") {
    // the script compiler emits plain DataFrame ops — its filter/cut stages
    // must reach the parquet scan exactly like hand-written ones
    val q = graft.query.ZedScript.run(spark,
      """from documents
        || n_chars >= 200
        || cut doc_id, n_chars, lang""".stripMargin,
      { case "documents" => (Tables.load(spark, TestSpark.sf, "documents"), Seq("doc_id")) })
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(n_chars,200)"),
      s"expected the script filter pushed to the scan:\n$plan")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"),
      s"expected the cut to prune the ReadSchema:\n$read")
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

  test("minhash signature phase shuffles once, keyed on id only (no shingle distinct)") {
    val df = Dedup.lshCandidatePairs(corpus, "id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // min() is duplicate-insensitive, so the shingle stream must flow
    // straight into the partial-aggregating groupBy(id): any exchange whose
    // key list includes the shingle column means a distinct crept back in
    // and the corpus's full shingle stream is being shuffled again
    val shKeyed = "Exchange hashpartitioning\\([^)]*sh#".r.findAllIn(plan).length
    assert(shKeyed == 0, s"expected no shingle-keyed exchange in:\n$plan")
    // remaining exchanges: the id-keyed signature groupBy and the (d1, d2)
    // candidate-pair distinct — both tiny relative to the shingle stream
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected only signature + pair-distinct exchanges, got $exchanges:\n$plan")
  }

  test("the production 128-perm signature aggregate still shuffles once, keyed on id") {
    // the recall-spec'd preset (numPerms=128, bands=32 — OpsSpec): widening
    // the signature from 16 to 128 min-columns must not change the plan
    // class — one partial-aggregating id-keyed exchange, the shingle stream
    // never shuffled (min() stays duplicate-insensitive at any width)
    val sig = Dedup.minhashSignatureFrame(corpus, "id", "text", 3, 128)
    sig.collect()
    val plan = sig.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shKeyed = "Exchange hashpartitioning\\([^)]*sh#".r.findAllIn(plan).length
    assert(shKeyed == 0, s"expected no shingle-keyed exchange in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly the id-keyed signature exchange, got $exchanges:\n$plan")
    assert("partial_min\\(".r.findAllIn(plan).nonEmpty ||
      plan.contains("Partial") , s"expected a map-side partial aggregate in:\n$plan")
  }

  test("contamination corpus side reaches the broadcast eval join unshuffled") {
    import graft.ops.Curate
    val evalSet = corpus.filter(col("id") % 7 === 0)
    val df = Curate.contamination(corpus, evalSet, "id", "text", n = 3, minOverlap = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the eval set broadcast in:\n$plan")
    // allowed exchanges: eval-side shingle distinct (under the broadcast),
    // the post-join (id, sh) distinct over overlap rows only, and the final
    // groupBy(id) — a 4th means the corpus shingle stream is being deduped
    // BEFORE the join again (the shape this operator exists to avoid)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges:\n$plan")
  }

  test("sequential offset assignment stays in the DataFrame plan (no RDD hop)") {
    val df = spark.range(0, 1000).toDF("id")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id").persist()
    try {
      val out = graft.etl.Offsets.assignSequential(df, 100L, "off")
      // range-partitioned + sorted by id → (partition, local) order IS id
      // order, so offsets must be 100..1099 in id order
      val offs = out.orderBy("id").collect().map(_.getLong(1)).toSeq
      assert(offs == (100L until 1100L), s"bad numbering: ${offs.take(10)}...")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("ExistingRDD"),
        s"expected a pure-DataFrame offset plan, got an RDD hop:\n$plan")
    } finally df.unpersist()
  }

  private def embeddings = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      (0 until 64).map(i => Row(i.toLong,
        Seq(math.cos(i * 0.3), math.sin(i * 0.3), (i % 7).toDouble))).asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
  }

  test("IVF cell assignment is map-only: zero exchanges touch corpus rows") {
    import graft.ops.Similarity
    val df = Similarity.ivfAssignN(embeddings,
      embeddings.filter(col("vec_id") < 4), "vec_id", "v", nprobe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the centroid side was collected at plan time (metadata-scale) and
    // ships as a 1-row BroadcastExchange; the corpus path must be scan →
    // broadcast-NLJ(1-row) → project/generate — no shuffle of any kind
    for (shuffle <- Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition"))
      assert(!plan.contains(shuffle), s"expected shuffle-free assignment plan:\n$plan")
    assert(!plan.contains("Window"), s"expected window-free assignment plan:\n$plan")
  }

  test("hyperplane LSH signatures are a map-only projection (no shuffle before banding)") {
    import graft.ops.Dedup
    val pairs = Dedup.embeddingLshPairs(embeddings, "vec_id", "v", dims = 3, threshold = 0.99)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the only exchanges allowed are the (band, bk) join sides and the
    // distinct — no Window, no range/single-partition shuffle anywhere
    assert(!plan.contains("Window"), s"expected window-free LSH plan:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning") &&
      !plan.contains("Exchange SinglePartition"),
      s"expected only hash exchanges in:\n$plan")
  }

  test("contamination corpus side is shingle-explode + one aggregation") {
    import graft.ops.Curate
    val evalSet = corpus.filter(col("id") % 7 === 0)
    val df = Curate.contamination(corpus, evalSet, "id", "text", n = 3, minOverlap = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"expected window-free plan:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning") &&
      !plan.contains("Exchange SinglePartition"),
      s"expected only hash exchanges in:\n$plan")
  }

  test("document chunking is map-only: no exchange, no window") {
    import graft.ops.Curate
    val df = Curate.chunkDocuments(corpus, "id", "text", chunkTokens = 8, stride = 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"expected a single map-only pass in:\n$plan")
  }

  test("duplicated-span detection: hash-keyed aggs with partial combine, no loop joins") {
    import graft.ops.Dedup
    val df = Dedup.duplicatedSpans(corpus, "id", "text", k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the whole design: never all-pairs, never windowed — one explode, two
    // hash-keyed aggregations (both with a map-side partial), hash joins only
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"expected no loop joins in:\n$plan")
    assert(!plan.contains("Window"), s"expected window-free plan:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial, count"),
      s"expected map-side partial counting in:\n$plan")
  }

  test("span removal keeps the duplicatedSpans shape: window-free, no loop joins, partial aggs") {
    import graft.ops.Dedup
    val df = Dedup.removeDuplicatedSpans(corpus, "id", "text", k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // same contract as detection, plus: the rebuild must stay a map-side HOF
    // over the per-doc starts array, not a per-token join or window
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"expected no loop joins in:\n$plan")
    assert(!plan.contains("Window"), s"expected window-free plan:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial, count"),
      s"expected map-side partial counting in:\n$plan")
    assert(plan.contains("partial_sort_array") || plan.contains("partial, sort_array")
        || plan.contains("collect_list"),
      s"expected the per-doc starts aggregate in:\n$plan")
  }

  test("bounded per-group cap is window-free with a partial top-k below the shuffle") {
    import graft.ops.Curate
    val df = Curate.capPerGroupBounded(corpus, length(col("text")) % 3, length(col("text")), "id", 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the whole point vs capPerGroup: no rank window partitioned by group
    assert(!plan.contains("Window"), s"expected window-free cap plan:\n$plan")
    val partialIdx = plan.indexOf("partial_top_k_by_score")
    assert(partialIdx >= 0, s"expected a partial top-k aggregate in:\n$plan")
  }

  test("per-query top-k aggregates partially before the shuffle (two-phase)") {
    import graft.ops.Similarity
    val df = Similarity.bruteForceTopK(embeddings,
      embeddings.filter(col("vec_id") < 3), "vec_id", "v", k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"expected window-free ranking plan:\n$plan")
    // ObjectHashAggregate(partial top_k...) must run below the query_id
    // exchange, bounding its input to k rows per (query, partition)
    val partialIdx = plan.indexOf("partial_top_k_by_score")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(query_id")
    assert(partialIdx >= 0, s"expected a partial top-k aggregate in:\n$plan")
    assert(exchangeIdx >= 0, s"expected a query_id exchange in:\n$plan")
    // plan text prints parents above children: the exchange (parent of the
    // partial agg) must appear first
    assert(exchangeIdx < partialIdx,
      s"expected partial top-k BELOW the exchange in:\n$plan")
  }

  test("tf-idf ranks with the bounded top-k aggregate — no rank window, partial below the doc exchange") {
    import graft.ops.TextOps
    val df = TextOps.tfidfKeywords(corpus, "id", "text", k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"expected window-free tf-idf plan:\n$plan")
    assert(plan.contains("partial_top_k_by_score"),
      s"expected a partial top-k aggregate in:\n$plan")
    // the 1-row corpus-size frame must broadcast, never cartesian-shuffle
    assert(!plan.contains("CartesianProduct"),
      s"N must ride a broadcast, not a cartesian product:\n$plan")
  }

  test("DSIR doc scoring joins the log-ratio table by broadcast — corpus rows never shuffle for a join") {
    import graft.ops.Curate
    val df = Curate.importanceWeights(corpus, corpus.filter(col("id") % 3 === 0),
      "id", "text", buckets = 256)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the ≤buckets-row log-ratio frame must broadcast to the (id,bucket)
    // counts; a sort-merge join here would shuffle the whole corpus stream
    // on the bucket key
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast doc-score join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"expected no corpus-side sort-merge join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"totals must broadcast, not cartesian:\n$plan")
  }

  test("winnowing fingerprints are map-only: no exchange, no explode, one codegen'd projection") {
    import graft.ops.TextOps
    val df = TextOps.winnowFingerprints(corpus, "id", "text", k = 3, w = 4)
    val plan = df.queryExecution.executedPlan.toString
    // per-document HOFs: the gram hashing and window minima must never
    // shuffle or row-multiply — the whole operator is one projection pass
    assert(!plan.contains("Exchange"), s"winnowing must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"winnowing must not explode grams:\n$plan")
  }

  test("projected top-k: stage 2 joins ride broadcasts — the corpus is never shuffled for a join") {
    import graft.ops.Similarity
    val df = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val q = Similarity.projectedTopK(df, df.filter(col("vec_id") < 3),
      "vec_id", "v", dIn = 64, dProj = 8, k = 3, refine = 10)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the bounded candidate list (queries × refine) must broadcast into the
    // exact re-rank joins; a sort-merge join would shuffle the corpus
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast re-rank joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for stage 2:\n$plan")
  }

  test("frequent n-grams rank via bounded TakeOrdered, never a global sort or window") {
    import graft.ops.TextOps
    val plan = TextOps.frequentNgrams(corpus, "id", "text", n = 3, k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k:\n$plan")
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
  }

  test("group overlap never forms a cartesian or corpus-side sort-merge self-join") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions.{concat, lit}
    val src = corpus.withColumn("src", concat(lit("s"), (col("id") % 4).cast("string")))
    val q = Dedup.groupOverlap(src.select(col("src"), col("text")), "src", "text", n = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // pairs come from each shingle's own group set (explode), sizes join a
    // #groups-sized frame — nothing here may multiply corpus rows
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("Generate"), s"expected the bounded pair explode:\n$plan")
  }

  test("char entropy scans the explode exactly once — no self-join, single Generate") {
    import graft.ops.TextOps
    val q = TextOps.charEntropy(corpus, "id", "text")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // doc length comes from a window over the aggregated counts, so the
    // per-character explode subtree must appear exactly once BY PLAN (the
    // old self-join formulation carried it twice and leaned on
    // ReuseExchange to collapse them)
    val generates = "Generate explode".r.findAllIn(plan).length
    assert(generates == 1, s"expected exactly 1 explode, got $generates:\n$plan")
    assert(!plan.contains("Join"), s"no self-join allowed:\n$plan")
  }

  test("cluster balancing samples in a zero-exchange scan: assignment broadcasts, corpus never shuffles") {
    import graft.ops.{Curate, Similarity}
    import org.apache.spark.sql.functions.transform
    val base = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = Similarity.kmeans(base, "vec_id", "v", k = 4, iters = 1)
      .select(col("centroid_id").as("vec_id"), col("v"))
    val assigned = Similarity.ivfAssign(base, cents, "vec_id", "v")
      .withColumn("cell", col("centroid_id").cast("string"))
    val q = Curate.temperatureMix(assigned, col("cell"), 0.5, col("vec_id"))
    val plan = q.queryExecution.executedPlan.toString
    // centroid training + the G-row rate collect are eager and driver-side;
    // the RESULT plan must be scan → 1-row broadcast assign → filter — the
    // corpus is never exchanged for balancing
    assert(!plan.contains("Exchange hashpartitioning"),
      s"cluster balancing must not shuffle the corpus:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the 1-row centroid broadcast:\n$plan")
  }

  test("oov rate probes membership via broadcast — the token stream never shuffles for the join") {
    import graft.ops.TextOps
    val q = TextOps.oovRate(corpus, "id", "text", vocabSize = 10)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the bounded vocab broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"token stream must not shuffle for the membership probe:\n$plan")
  }

  test("span decontamination probes the eval hash set via broadcast") {
    val eval = corpus.filter(col("id") % 7 === 0)
    val q = Dedup.removeContaminatedSpans(corpus, eval, "id", "text", k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the benchmark-scale eval hash set broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs anywhere:\n$plan")
  }

  test("incremental near-dup: no cartesian, no corpus window — banded equi-joins only") {
    import graft.ops.Dedup
    val landed = corpus.select((col("id") + 1000).as("id"), col("text"))
    val q = Dedup.dedupIncrementalNear(corpus, landed, "id", "text")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
    assert(!plan.contains("Window"), s"no window over either side:\n$plan")
  }

  test("near-dup search: banded equi-joins only — no cartesian, no window") {
    import graft.ops.Dedup
    val landed = corpus.select((col("id") + 1000).as("id"), col("text"))
    val q = Dedup.nearDuplicatesOf(corpus,
      Dedup.minhashSignatureFrame(landed, "id", "text", 3, 16), "id", "text")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
    assert(!plan.contains("Window"), s"no window over either side:\n$plan")
  }

  test("prod-preset 128-perm signature frame: ONE exchange, keyed on id") {
    import graft.ops.Dedup
    // the wide signature aggregate must stay one partial-aggregating
    // groupBy however many permutation columns ride it — 128 parallel min
    // expressions, not 128 passes and not a perms-explode shuffle
    val q = Dedup.minhashSignatureFrame(corpus, "id", "text",
      n = 3, numPerms = Dedup.ProdNumPerms)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges == 1, s"expected exactly one hash exchange:\n$plan")
    assert(plan.contains("hashpartitioning(id"),
      s"the one shuffle must key on the doc id:\n$plan")
  }

  test("deleteWhere's match scan keeps the predicate pushable into parquet") {
    // mirrors Pool.deleteWhere pass 1: a merged-schema multi-segment scan
    // filtered on the BARE predicate (null ⇒ unmatched — same semantics as
    // coalesce(pred, false), which would be untranslatable and turn every
    // targeted delete into a full read of all committed segments)
    import graft.pool.{Envelope, Pool}
    val dir = java.nio.file.Files.createTempDirectory("pool-delpin")
    val p = Pool.create(spark, dir.toString)
    val env = Envelope.wrap(Tables.load(spark, TestSpark.sf, "events"),
      col("event_type"), col("event_id"),
      org.apache.spark.sql.functions.struct(col("user_id")).as("key"),
      Seq("event_id", "user_id", "value"))
    p.append(env.filter(col("kafka.offset") < 500))
    p.append(env.filter(col("kafka.offset") >= 500))
    val segs = p.committedSegments()
    val scan = spark.read.schema(p.read().schema)
      .parquet(segs.map(s => dir.resolve(s).toString): _*)
      .filter(col("kafka.offset") === 123L)
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("EqualTo(kafka.offset,123)"),
      s"expected the offset predicate pushed into the pool scan:\n$plan")
  }

  test("persisted IVF index probe prunes PARTITIONS — file skipping, not row filtering") {
    import graft.ops.SimilarityIndex
    val base = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val path = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    SimilarityIndex.buildIvfFromCentroids(base,
      base.filter(col("vec_id") < 8), "vec_id", "v", path)
    val q = SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
      .topK(base.filter(col("vec_id") === 100), k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the probed-cell isin must reach the scan as a PartitionFilter on the
    // untouched partition column — a cast on the stored side would demote
    // it to a post-scan row filter and the probe would read every cell
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("centroid_id")).getOrElse("")
    assert(scanLine.contains("centroid_id") &&
      !scanLine.contains("PartitionFilters: []"),
      s"expected a non-empty centroid_id partition filter:\n$plan")
  }

  test("persisted IVF-PQ probe: partition-pruned AND the scan reads codes, never vectors") {
    import graft.ops.SimilarityIndex
    val base = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val path = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString
    SimilarityIndex.buildIvfPq(base, "vec_id", "v", k = 8, iters = 1,
      m = 2, codebookK = 4, path = path)
    val q = SimilarityIndex.loadIvfPq(spark, path, "vec_id", "v")
      .topK(base.filter(col("vec_id") === 100), k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val encScan = plan.linesIterator.find(l =>
      l.contains("ivfpq-idx") && l.contains("encoded")).getOrElse("")
    assert(encScan.contains("PartitionFilters") &&
      !encScan.contains("PartitionFilters: []"),
      s"expected a non-empty partition filter on the encoded scan:\n$plan")
    assert(encScan.contains("codes") && !encScan.replaceAll("vec_id", "").contains("v:"),
      s"the encoded scan must read codes, never a float vector column:\n$plan")
  }

  test("keepBestBy: the arg-max is an aggregation, never a window over the corpus") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions.length
    val pairs = corpus.select(col("id").as("d1"), (col("id") + 1).as("d2"))
      .filter(col("d1") % 2 === 0)
    val q = Dedup.keepBestBy(corpus, "id", pairs, length(col("text")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"arg-max must be an aggregation:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
  }

  test("random projection is a zero-exchange codegen'd projection") {
    import graft.ops.Similarity
    val df = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val plan = Similarity.randomProjection(df, "vec_id", "v", dIn = 64, dOut = 8)
      .queryExecution.executedPlan.toString
    // the sign matrix rides the plan as literals: no shuffle, no join, no
    // broadcast — the pass must stay a single projection
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(plan.contains("Project"), s"expected a plain projection:\n$plan")
  }
}
