package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Curate, Dedup}

/** The README "pretraining curation pipeline" example, compiled and executed
  * verbatim (modulo the input path and the seed-source names, substituted
  * for the test tables') on sf0.001 — if the example bit-rots, this fails.
  */
class ReadmeExampleSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("README pipeline example runs end-to-end on sf0.001") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalDocs = docs.filter($"doc_id" % 13 === 0)

    // 1. near-dup removal: LSH candidates -> exact verify -> canonical ids
    val cand = Dedup.lshCandidatePairs(docs, "doc_id", "text").localCheckpoint(true)
    val dups = Dedup.jaccardForPairs(docs, cand, "doc_id", "text").filter($"jaccard" >= 0.8)
    val canon = Dedup.canonicalIds(docs, "doc_id", dups)
    val unique = docs.join(canon.filter($"id" === $"canonical").select($"id".as("doc_id")),
      Seq("doc_id"), "left_semi")

    // 2. decontaminate vs eval benchmarks (winnow containment at k=8, w=6:
    //    any verbatim overlap of >= 13 tokens provably hits, and a false hit
    //    needs a verbatim 8-token match), gate on a classifier TRAINED IN
    //    THE ENGINE, cap per source
    val clean = unique.join(
      Dedup.winnowContainment(unique, evalDocs, "doc_id", "text", k = 8, w = 6)
        .select($"did".as("doc_id")),
      Seq("doc_id"), "left_anti")
    val weights = Curate.trainTextClassifier(clean, "doc_id",
      $"source".isin("src0", "src1", "src2", "src3", "src4"), "text", epochs = 3)
    val scored = clean.join(
      Curate.scoreTextClassifier(clean, "doc_id", "text", weights)
        .withColumnRenamed("score", "quality_score"), Seq("doc_id"))
    val capped = Curate.capPerGroupBounded(scored, $"source", $"quality_score", "doc_id", n = 1000000)

    // 3. mix by quality weight, chunk, pack, shuffle
    val mixed = Curate.weightedSample(capped, $"doc_id", least($"quality_score" * 2.0, lit(1.0)))
    val chunks = Curate.chunkDocuments(mixed, "doc_id", "text", chunkTokens = 2048, stride = 2048)
      .withColumn("chunk_key", concat($"doc_id", lit(":"), $"chunk_idx")) // unique per row
    val packed = Curate.packSequences(chunks, $"source", struct($"doc_id", $"chunk_idx"),
      $"n_tok", budgetTokens = 4096)
    val order = Curate.shuffleRank(packed, $"chunk_key", salt = "epoch-0")

    val out = order.cache()
    try {
      val n = out.count()
      assert(n > 0)
      // shuffle positions are a 0-based permutation
      assert(out.agg(min($"shuffle_pos"), max($"shuffle_pos"), countDistinct($"shuffle_pos"))
        .collect()(0) match { case r => r.getLong(0) == 0 && r.getLong(1) == n - 1 && r.getLong(2) == n })
      // the pipeline actually removed something at every destructive stage
      assert(n < docs.count())
    } finally out.unpersist()
  }

  test("README continuous-ingest + persisted-index example runs on sf0.001") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")

    val corpus = graft.pool.Pool.create(spark,
      java.nio.file.Files.createTempDirectory("readme-corpus").toString)
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", near = true, compactEvery = 64)
    Seq(docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 =!= 0))
      .foreach(session.ingest)
    val takedownDocs = docs.limit(20)
      .select(($"doc_id" + 900000).as("doc_id"), $"text")
    val hits = graft.streaming.CorpusIngest.nearDuplicatesInPool(
      takedownDocs, corpus, "doc_id", "text")
    assert(hits.count() > 0, "verbatim replicas must match the landed corpus")

    // right-to-be-forgotten, both forms from the README: the takedown
    // PURGES (no snapshot or on-disk copy survives), the plain predicate
    // delete keeps history readable until vacuum
    val before = corpus.read().count()
    val (matched, deleted) = graft.streaming.CorpusIngest.takedownNear(
      takedownDocs, corpus, "doc_id", "text", purge = true)
    assert(matched > 0 && deleted == matched)
    val revoked = Seq(1L, 3L)
    val v = corpus.version()
    corpus.deleteWhere($"value.doc_id".isin(revoked: _*))
    assert(corpus.read().count() < before)
    assert(corpus.readAt(v).count() == before - deleted,
      "the pinned snapshot still reads the pre-plain-delete corpus")

    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val path = java.nio.file.Files.createTempDirectory("readme-index").toString
    graft.ops.SimilarityIndex.buildIvfPq(embs, "vec_id", "v", k = 8, iters = 2,
      m = 2, codebookK = 4, path = path)
    val index = graft.ops.SimilarityIndex.loadIvfPq(spark, path, "vec_id", "v")
    val top = index.topK(embs.filter($"vec_id" < 5), k = 3, nprobe = 2)
    assert(top.groupBy("query_id").count().collect().forall(_.getLong(1) == 3))
    val newVecs = embs.filter($"vec_id" >= 200 && $"vec_id" < 210)
      .select(($"vec_id" + 900000).as("vec_id"), $"v")
    index.append(newVecs)                              // O(batch), models frozen
    val revokedVecIds = newVecs.select("vec_id")
    assert(index.delete(revokedVecIds) == 10L)         // rewrites only their cells

    // continuous ANN: near-dup-gated ingest into a raw IVF index
    val rawPath = java.nio.file.Files.createTempDirectory("readme-raw").toString
    graft.ops.SimilarityIndex.buildIvf(embs, "vec_id", "v", k = 8, iters = 2,
      path = rawPath)
    val vSession = new graft.ops.SimilarityIndex.VectorIngestSession(
      graft.ops.SimilarityIndex.loadIvf(spark, rawPath, "vec_id", "v"),
      threshold = 0.98, nprobe = 2, compactEvery = 64)
    val dailyVecBatches = Seq(
      embs.filter($"vec_id" < 10)                      // replays: all drop
        .select(($"vec_id" + 700000).as("vec_id"), $"v"))
    assert(dailyVecBatches.map(vSession.ingest).sum == 0L,
      "verbatim replays must be gated out")

    // re-cluster cycle from the README: rebuild re-trains on the index's
    // current contents and swaps the dirs — the id set is exact
    val raw = graft.ops.SimilarityIndex.loadIvf(spark, rawPath, "vec_id", "v")
    val idsBefore = raw.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    val fresh = raw.rebuild(k = 8, iters = 2)
    assert(fresh.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
      == idsBefore)

    // health checks from the README: both clean after a normal lifecycle
    assert(graft.ops.SimilarityIndex.fsckIndex(spark, rawPath).clean)
  }
}
