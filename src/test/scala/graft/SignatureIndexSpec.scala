package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, SignatureIndex}
import graft.pool.Pool
import graft.streaming.{CorpusIngest, CorpusIngestSession}

/** The persisted landed-signature index: probe-result identity with the
  * scanning path, partition PRUNING (the inputFiles discipline), the LSM
  * fold, and the ingest session's consistency reconciliation (catch-up,
  * compaction remap, rebuild-on-removal).
  */
class SignatureIndexSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def corpusDocs() = Tables.load(spark, TestSpark.sf, "documents")
    .select(col("doc_id").as("id"), col("text"))

  private def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("indexed probe == presigned probe, across base, base+delta, and empty index") {
    val docs = corpusDocs().persist()
    val incoming = docs.filter(col("id") % 3 === 0)
    val landed = docs.filter(col("id") % 3 =!= 0)
    val landedSig = Dedup.minhashSignatureFrame(landed, "id", "text", 3, 16)
    val expected = keptIds(Dedup.dedupIncrementalNearPresigned(
      incoming, landedSig, "id", "text", 3, 16, 4, 0.5))

    // base only
    val p1 = TempDirs.create("sigidx-eq") + "/a"
    val i1 = SignatureIndex.create(spark, p1, 3, 16, 4, "BIGINT")
    i1.rebuild(landedSig, Seq.empty)
    val (k1, _, r1) = Dedup.dedupIncrementalNearIndexed(
      incoming, i1, "id", "text", 0.5)
    assert(keptIds(k1) == expected, "base-only probe must match the scan")
    r1()

    // half base, half delta — both read paths in one probe
    val p2 = TempDirs.create("sigidx-eq") + "/b"
    val i2 = SignatureIndex.create(spark, p2, 3, 16, 4, "BIGINT")
    i2.rebuild(Dedup.minhashSignatureFrame(
      landed.filter(col("id") % 2 === 0), "id", "text", 3, 16), Seq.empty)
    i2.appendDelta(Dedup.minhashSignatureFrame(
      landed.filter(col("id") % 2 =!= 0), "id", "text", 3, 16), Seq.empty)
    assert(i2.deltaCount == 1)
    val (k2, _, r2) = Dedup.dedupIncrementalNearIndexed(
      incoming, i2, "id", "text", 0.5)
    assert(keptIds(k2) == expected, "base+delta probe must match the scan")
    r2()

    // fold: deltas collapse into a fresh generation, results unchanged
    val genBefore = i2.generation
    i2.fold()
    assert(i2.deltaCount == 0 && i2.generation != genBefore)
    assert(!Files.exists(java.nio.file.Paths.get(p2, s"keys-$genBefore")),
      "the superseded generation must be reclaimed after the swap")
    val (k3, _, r3) = Dedup.dedupIncrementalNearIndexed(
      incoming, i2, "id", "text", 0.5)
    assert(keptIds(k3) == expected, "post-fold probe must match the scan")
    r3()

    // empty index = within-batch pass only (the fresh-pool degenerate)
    val p4 = TempDirs.create("sigidx-eq") + "/c"
    val i4 = SignatureIndex.create(spark, p4, 3, 16, 4, "BIGINT")
    val emptyLanded = Dedup.minhashSignatureFrame(
      landed.limit(0), "id", "text", 3, 16)
    val expEmpty = keptIds(Dedup.dedupIncrementalNearPresigned(
      incoming, emptyLanded, "id", "text", 3, 16, 4, 0.5))
    val (k4, _, r4) = Dedup.dedupIncrementalNearIndexed(
      incoming, i4, "id", "text", 0.5)
    assert(keptIds(k4) == expEmpty)
    r4()

    // maxBucket guards the within-batch side identically on both paths
    val pile = incoming.limit(3)
    val salted = incoming
      .unionByName(pile.select((col("id") + 900000).as("id"), col("text")))
      .unionByName(pile.select((col("id") + 950000).as("id"), col("text")))
    val expGuard = keptIds(Dedup.dedupIncrementalNearPresigned(
      salted, landedSig, "id", "text", 3, 16, 4, 0.5, maxBucket = 2))
    val (k5, _, r5) = Dedup.dedupIncrementalNearIndexed(
      salted, i1, "id", "text", 0.5, maxBucket = 2)
    assert(keptIds(k5) == expGuard)
    r5()
    docs.unpersist()
  }

  test("probe reads a PRUNED subset of the base partitions (inputFiles)") {
    val docs = corpusDocs()
    val landed = docs.filter(col("id") % 3 =!= 0)
    val path = TempDirs.create("sigidx-prune") + "/idx"
    val idx = SignatureIndex.create(spark, path, 3, 16, 4, "BIGINT")
    idx.rebuild(Dedup.minhashSignatureFrame(landed, "id", "text", 3, 16), Seq.empty)

    def files(df: org.apache.spark.sql.DataFrame): Set[String] = df.inputFiles.toSet
    val allKeyFiles = files(spark.read.parquet(s"$path/keys-${idx.generation}"))
    assert(allKeyFiles.size > 8,
      s"need a multi-partition base for the pruning claim: ${allKeyFiles.size}")

    // a 2-document batch touches at most 2 x bands (band, pfx) partitions
    val batch = docs.filter(col("id") % 3 === 0).limit(2)
    val sIn = Dedup.minhashSignatureFrame(batch, "id", "text", 3, 16)
    val prefixes = Dedup.bandKeys(sIn, 16, 4)
      .select(col("band"), substring(col("bk"), 1, idx.pfxLen).as("pfx"))
      .distinct().collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(prefixes.size <= 8)
    val pruned = files(idx.prunedKeys(prefixes))
    assert(pruned.subsetOf(allKeyFiles))
    assert(pruned.size < allKeyFiles.size / 2,
      s"a 2-doc probe must skip most of the base: read ${pruned.size} of ${allKeyFiles.size}")
    // every file read lies under one of the batch's partitions — nothing else
    val wanted = prefixes.map { case (b, p) => s"/band=$b/pfx=$p/" }.toSet
    assert(pruned.forall(f => wanted.exists(f.contains)),
      s"probe read outside its partitions: ${pruned.filterNot(f => wanted.exists(f.contains))}")

    // the verification side prunes the sigs table the same way
    val allSigFiles = files(spark.read.parquet(s"$path/sigs-${idx.generation}"))
    val somePrefix = allSigFiles.head.split("/idp=")(1).take(idx.pfxLen)
    val prunedSigs = files(idx.prunedSigs(Seq(somePrefix)))
    assert(prunedSigs.nonEmpty && prunedSigs.subsetOf(allSigFiles) &&
      prunedSigs.size < allSigFiles.size,
      s"sigs probe must prune: ${prunedSigs.size} of ${allSigFiles.size}")
  }

  test("pfxLen scales with the corpus (fixed-size buckets, growing count)") {
    val t = SignatureIndex.TargetRowsPerBucket
    assert(SignatureIndex.pickPfxLen(1000L) == 1)
    assert(SignatureIndex.pickPfxLen(16L * t) == 1)
    assert(SignatureIndex.pickPfxLen(16L * t + 1) == 2)
    assert(SignatureIndex.pickPfxLen(256L * t + 1) == 3)
    assert(SignatureIndex.pickPfxLen(Long.MaxValue / 2) == 4) // capped
  }

  test("session with a signature index lands the same pool as the scanning session") {
    def docsDf(rows: (Long, String)*) =
      spark.createDataFrame(rows.toSeq).toDF("doc_id", "text")
    val b1 = docsDf(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "machine learning models require large curated corpora",
      3L -> "entirely unrelated content about cooking pasta al dente")
    val b2 = docsDf(
      10L -> "the quick brown fox jumps over the lazy dog tonight", // near-dup of 1
      11L -> "machine learning models require large curated corpora", // exact dup of 2
      12L -> "novel astronomy text about distant spiral galaxies")
    val b3 = docsDf(
      20L -> "entirely unrelated content about cooking pasta al dente now", // near-dup of 3
      21L -> "completely fresh legal boilerplate paragraph about liability")

    def runSession(indexed: Boolean): (Seq[(Long, Long)], String, Option[String]) = {
      val dir = Files.createTempDirectory("sigidx-sess").toString
      val idxPath = if (indexed) Some(s"$dir/idx") else None
      val pool = Pool.create(spark, s"$dir/pool")
      val sess = new CorpusIngestSession(pool, "doc_id", "text", near = true,
        sigIndexPath = idxPath)
      Seq(b1, b2, b3).foreach(sess.ingest(_))
      val rows = pool.read()
        .select(col("kafka.offset"), col("value.doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      (rows, s"$dir/pool", idxPath)
    }
    val (plain, _, _) = runSession(indexed = false)
    val res = runSession(indexed = true)
    val (withIdx, poolPath, idxPath) = (res._1, res._2, res._3.get)
    assert(withIdx == plain,
      s"indexed session diverged: $withIdx vs $plain")

    // the index tracked every commit
    val pool = Pool.open(spark, poolPath)
    val idx = SignatureIndex.open(spark, idxPath)
    assert(idx.coveredSegments.toSet == pool.committedSegments().toSet,
      s"covered ${idx.coveredSegments} vs committed ${pool.committedSegments()}")

    // CATCH-UP: a foreign near-writer appends outside the session; a new
    // session must cover the gap with a scan of ONLY the missing segments
    CorpusIngest.ingestBatchNear(
      docsDf(30L -> "a brand new document the index has never seen"),
      pool, "doc_id", "text")
    assert(idx.coveredSegments.size < pool.committedSegments().size)
    val sess2 = new CorpusIngestSession(pool, "doc_id", "text", near = true,
      sigIndexPath = Some(idxPath))
    // a near-dup of the foreign append must drop — provable only if the
    // catch-up really covered it
    assert(sess2.ingest(docsDf(
      31L -> "a brand new document the index has never seen today")) == 0)
    val idx2 = SignatureIndex.open(spark, idxPath)
    assert(idx2.coveredSegments.toSet == Pool.open(spark, poolPath).committedSegments().toSet)
  }

  test("covered-but-gone segments force a rebuild: deleted content re-admits") {
    def docsDf(rows: (Long, String)*) =
      spark.createDataFrame(rows.toSeq).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("sigidx-rm").toString
    val pool = Pool.create(spark, s"$dir/pool")
    val sess = new CorpusIngestSession(pool, "doc_id", "text", near = true,
      sigIndexPath = Some(s"$dir/idx"))
    sess.ingest(docsDf(1L -> "the target document scheduled for takedown removal",
      2L -> "an innocent bystander document that stays put"))
    // takedown rewrites history UNDER the index
    val (_, deleted) = CorpusIngest.takedownNear(
      docsDf(100L -> "the target document scheduled for takedown removal"),
      pool, "doc_id", "text")
    assert(deleted == 1L)
    // a STALE index would still hold the deleted signature and wrongfully
    // drop this near-copy; the new session must detect the removed
    // segment and rebuild from the pool as it now is
    val sess2 = new CorpusIngestSession(pool, "doc_id", "text", near = true,
      sigIndexPath = Some(s"$dir/idx"))
    assert(sess2.ingest(docsDf(
      10L -> "the target document scheduled for takedown removal again")) == 1,
      "deleted content must re-admit after the rebuild")
    val idx = SignatureIndex.open(spark, s"$dir/idx")
    assert(idx.coveredSegments.toSet ==
      Pool.open(spark, s"$dir/pool").committedSegments().toSet)
  }

  test("session compaction remaps the covered list without rebuilding") {
    def docsDf(rows: (Long, String)*) =
      spark.createDataFrame(rows.toSeq).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("sigidx-cmp").toString
    val pool = Pool.create(spark, s"$dir/pool")
    val sess = new CorpusIngestSession(pool, "doc_id", "text", near = true,
      compactEvery = 2, sigIndexPath = Some(s"$dir/idx"))
    sess.ingest(docsDf(1L -> "first unique sentence about tide patterns"))
    sess.ingest(docsDf(2L -> "second unique sentence about mountain trails"))
    // compaction ran (2 appends folded); the index must still cover the
    // pool exactly and keep gating — WITHOUT a seed-time rebuild
    val pool2 = Pool.open(spark, s"$dir/pool")
    val idx = SignatureIndex.open(spark, s"$dir/idx")
    assert(idx.coveredSegments.toSet == pool2.committedSegments().toSet)
    assert(sess.ingest(docsDf(
      3L -> "first unique sentence about tide patterns today")) == 0,
      "near-dup of compacted history must still drop")
  }
}
