package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.pool.Pool
import graft.streaming.CorpusIngest

/** Continuous dedup ingest: within-batch dedup, Bloom+exact dedup against
  * the growing corpus pool, contiguous offsets, and at-least-once replay
  * idempotence — the state-lives-in-the-sink argument, content edition.
  */
class CorpusIngestSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.toSeq).toDF("doc_id", "text")

  test("batches dedup within themselves, against the corpus, and replay idempotently") {
    // other suites may legitimately leave caches in the shared session
    // (e.g. canonicalIds' returned frame) — assert only OUR delta is zero
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus").toString)

    // batch 1: internal dup (2 copies of "alpha") → survivor is the lowest id
    val b1 = docs(1L -> "alpha", 7L -> "alpha", 2L -> "beta")
    assert(CorpusIngest.ingestBatch(b1, corpus, "doc_id", "text") == 2)
    val after1 = corpus.read().select(col("kafka.offset"), col("value.doc_id"), col("value.text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(after1.toSeq == Seq((0L, 1L, "alpha"), (1L, 2L, "beta")))

    // batch 2: one true dup of the corpus, one new → offsets continue
    val b2 = docs(10L -> "beta", 11L -> "gamma")
    assert(CorpusIngest.ingestBatch(b2, corpus, "doc_id", "text") == 1)
    val after2 = corpus.read().select(col("kafka.offset"), col("value.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(after2.toSeq == Seq((0L, 1L), (1L, 2L), (2L, 11L)))

    // replayed batch 2 (at-least-once): the corpus already holds gamma →
    // the exact verify drops everything, append is a no-op
    assert(CorpusIngest.ingestBatch(b2, corpus, "doc_id", "text") == 0)
    assert(corpus.read().count() == 3)

    // a saturated sketch stays exact (fpp only prunes, never decides)
    val b3 = docs(20L -> "alpha", 21L -> "delta")
    assert(CorpusIngest.ingestBatch(b3, corpus, "doc_id", "text",
      expectedItems = 1, fpp = 0.5) == 1)
    assert(corpus.read().filter(col("value.text") === "delta").count() == 1)

    // null-text rows have no content identity: dropped, never appended —
    // a replay would otherwise re-append them forever
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(30L, null), org.apache.spark.sql.Row(31L, "epsilon")),
      StructType.fromDDL("doc_id bigint, text string"))
    assert(CorpusIngest.ingestBatch(withNull, corpus, "doc_id", "text") == 1)
    assert(CorpusIngest.ingestBatch(withNull, corpus, "doc_id", "text") == 0) // replay no-op
    assert(corpus.read().filter(col("value.doc_id") === 30L).count() == 0)

    // no leaked executor storage: every ingest releases its caches
    // set difference, not equality: the async ContextCleaner may shrink the
    // pre-existing set mid-test; only NEW leftovers are our leak
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
      "CorpusIngest leaked persisted RDDs")
  }

  test("near-dup ingest: exact + near gates stack; near-dups of the corpus and the batch drop") {
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-n").toString)
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge at dawn every single morning"

    // first commit: in-batch NEAR dup ("note " + base vs base, band-colliding
    // by construction — see OpsSpec's incremental fixture) drops the higher id
    val b1 = docs(1L -> base, 5L -> ("note " + base), 2L -> "tiny")
    assert(CorpusIngest.ingestBatchNear(b1, corpus, "doc_id", "text") == 2)
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))

    // next batch: a near-dup of the LANDED base drops (bipartite probe),
    // exact copies drop (exact gate — including the short "tiny", which has
    // no signature and only the exact gate can catch), the novel doc keeps
    val b2 = docs(10L -> (base + " ok"), 11L -> base, 12L -> "tiny",
      13L -> "completely different words about some other topic entirely")
    assert(CorpusIngest.ingestBatchNear(b2, corpus, "doc_id", "text") == 1)
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 13L))

    // replay of b2 is a no-op (exact gate catches the landed copy of 13)
    assert(CorpusIngest.ingestBatchNear(b2, corpus, "doc_id", "text") == 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
      "near ingest leaked persisted RDDs")
  }

  test("appended envelopes carry stored fingerprints (and signatures on the near path)") {
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-fp").toString)
    CorpusIngest.ingestBatch(docs(1L -> "one two three four"), corpus, "doc_id", "text")
    val exact = corpus.read()
    assert(exact.columns.contains("fp") && !exact.columns.contains("sig"))
    assert(exact.filter(col("fp") === md5(col("value.text"))).count() == 1)

    val near = Pool.create(spark, Files.createTempDirectory("corpus-fps").toString)
    CorpusIngest.ingestBatchNear(
      docs(1L -> "one two three four five six seven", 2L -> "hi"),
      near, "doc_id", "text")
    val rows = near.read().select(col("value.doc_id"), col("fp"), col("sig")).collect()
      .map(r => r.getLong(0) ->
        (r.isNullAt(1), if (r.isNullAt(2)) -1 else r.getSeq[String](2).size)).toMap
    assert(rows(1L) == (false, 16), "long doc stores fp + full signature")
    // EMPTY, not null: null means "no signature written" (exact-path /
    // foreign append) and triggers the landed-side recompute fallback
    assert(rows(2L) == (false, 0), "shingle-less doc stores fp + EMPTY signature")
  }

  test("mixed provenance: foreign and exact-path rows still gate exact and near dedup") {
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-mix").toString)
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge at dawn every single morning"
    // 1. FOREIGN append (no fp/sig columns at all — a pre-storage segment)
    val foreign = docs(1L -> base, 2L -> "plain old row")
      .select(
        org.apache.spark.sql.functions.struct(
          lit("corpus").as("topic"), lit(0L).as("partition"),
          col("doc_id").as("offset")).as("kafka"),
        lit(null).cast("string").as("key"),
        org.apache.spark.sql.functions.struct(col("doc_id"), col("text")).as("value"),
        lit("record").as("_kind"))
    corpus.append(foreign)
    // 2. EXACT-path append (fp, no sig)
    assert(CorpusIngest.ingestBatch(docs(3L -> "exact era doc with many words here"),
      corpus, "doc_id", "text") == 1)
    // 3. replays of BOTH eras through the near path drop (exact gate must
    //    see text-derived fps for rows that never stored one)
    assert(CorpusIngest.ingestBatchNear(
      docs(10L -> base, 11L -> "plain old row",
        12L -> "exact era doc with many words here"), corpus, "doc_id", "text") == 0)
    // 4. near-dups of foreign-era AND exact-era rows drop (near gate must
    //    recompute signatures for rows that never stored one)
    assert(CorpusIngest.ingestBatchNear(
      docs(20L -> ("note " + base),
        21L -> "exact era doc with many words here today"),
      corpus, "doc_id", "text") == 0)
    // 5. a fresh SESSION over the mixed pool is equally exact
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", near = true)
    assert(session.ingest(docs(30L -> base, 31L -> "genuinely new content entirely")) == 1)
    assert(corpus.read().filter(col("value.doc_id") === 31L).count() == 1)

    // 6. RAW compaction of a mixed pool folds the eras into one segment
    //    whose stored columns carry nulls — the gates must REJECT that
    //    loudly instead of silently re-landing duplicates
    assert(corpus.compact() > 0)
    val ex = intercept[Exception] {
      CorpusIngest.ingestBatchNear(docs(40L -> base), corpus, "doc_id", "text")
    }
    assert(ex.getMessage != null)

    // 7. the BACKFILLING compaction repairs it: every row gains fp + sig
    //    and the gates work again, still exactly
    assert(CorpusIngest.compactPool(corpus, "doc_id", "text",
      sigParams = Some((3, 16))) > 0)
    assert(corpus.read().filter(col("fp").isNull || col("sig").isNull).count() == 0)
    assert(CorpusIngest.ingestBatchNear(
      docs(41L -> base, 42L -> ("note " + base)), corpus, "doc_id", "text") == 0)
    assert(CorpusIngest.ingestBatchNear(
      docs(43L -> "after compaction this brand new doc still lands"),
      corpus, "doc_id", "text") == 1)
  }

  test("session retains the Bloom across batches; results match the stateless path") {
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-sess").toString)
    val session = new graft.streaming.CorpusIngestSession(corpus, "doc_id", "text")

    assert(session.ingest(docs(1L -> "alpha", 7L -> "alpha", 2L -> "beta")) == 2)
    assert(session.ingest(docs(10L -> "beta", 11L -> "gamma")) == 1)
    // replay: the RETAINED filter flags every fp, the verify drops them all
    assert(session.ingest(docs(10L -> "beta", 11L -> "gamma")) == 0)
    assert(corpus.read().count() == 3)

    // a FRESH session (seeded from the pool's stored fp column) agrees —
    // the state genuinely lives in the sink, not in the session object
    val session2 = new graft.streaming.CorpusIngestSession(corpus, "doc_id", "text")
    assert(session2.ingest(docs(11L -> "gamma", 20L -> "delta")) == 1)
    assert(corpus.read().count() == 4)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
      "session ingest leaked persisted RDDs")
  }

  test("near session: stored signatures drive the probe; replay and near-dups drop") {
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-sn").toString)
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge at dawn every single morning"
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", near = true)

    assert(session.ingest(docs(1L -> base, 2L -> "tiny")) == 2)
    // near-dup of the LANDED base drops via the STORED signature probe;
    // exact copy of "tiny" drops via the retained-Bloom exact gate
    assert(session.ingest(docs(
      10L -> ("note " + base), 11L -> "tiny",
      13L -> "completely different words about some other topic entirely")) == 1)
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 13L))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
      "near session leaked persisted RDDs")
  }

  test("production preset (128 perms / 32 bands / 0.8) through the near session") {
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-prod").toString)
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", near = true,
      numPerms = graft.ops.Dedup.ProdNumPerms,
      bands = graft.ops.Dedup.ProdBands,
      threshold = graft.ops.Dedup.ProdThreshold)
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    assert(session.ingest(docs(1L -> base)) == 1)
    // stored signature length matches the preset
    assert(corpus.read().select(org.apache.spark.sql.functions.size(col("sig")))
      .collect()(0).getInt(0) == graft.ops.Dedup.ProdNumPerms)
    // one appended word: J ≈ 38/41 ≈ 0.93 — drops at the 0.8 cut; a doc
    // sharing only the first half: J ≈ 18/58 ≈ 0.31 — far below, keeps
    val nearCopy = base + " tok41"
    val halfNew = (1 to 20).map(i => s"tok$i").mkString(" ") + " " +
      (1 to 20).map(i => s"new$i").mkString(" ")
    assert(session.ingest(docs(10L -> nearCopy, 11L -> halfNew)) == 1)
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 11L))
  }

  test("takedownNear deletes near-copies from the pool; the doc can re-land after") {
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-td").toString)
    // empty pool (fresh, or fully emptied by a prior takedown): clean (0, 0)
    assert(CorpusIngest.takedownNear(
      docs(1L -> "anything"), corpus, "doc_id", "text") == ((0L, 0L)))
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", near = true)
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge at dawn every single morning"
    val other = "completely different words about some other topic entirely " +
      "nothing shared with the licensed material at all"
    assert(session.ingest(docs(1L -> base, 2L -> other)) == 2)

    // takedown list: a near-copy of the landed base (not byte-identical)
    val claim = docs(900L -> ("prefix " + base))
    val (matched, deleted) = CorpusIngest.takedownNear(claim, corpus, "doc_id", "text")
    assert(matched == 1L && deleted == 1L)
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(2L), "only the matched doc is deleted")
    // idempotent: nothing left to match
    assert(CorpusIngest.takedownNear(claim, corpus, "doc_id", "text") == ((0L, 0L)))
    // no-match takedown touches nothing
    assert(CorpusIngest.takedownNear(
      docs(901L -> "unrelated takedown claim text entirely absent"),
      corpus, "doc_id", "text") == ((0L, 0L)))

    // the live session's retained Bloom still contains the deleted fp —
    // but the sketch only prunes: the exact verify consults the POOL, so
    // the document re-lands cleanly after the takedown
    assert(session.ingest(docs(50L -> base)) == 1)
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 50L))
    // and the re-landed copy is findable again
    assert(CorpusIngest.nearDuplicatesInPool(claim, corpus, "doc_id", "text")
      .collect().map(_.getLong(1)).toSeq == Seq(50L))
  }

  test("takedownNear(purge=true): no snapshot and no on-disk file yields the content") {
    val dir = Files.createTempDirectory("corpus-purge")
    val corpus = Pool.create(spark, dir.toString)
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", near = true)
    val base = "the licensed novel excerpt runs through these exact words " +
      "in order telling of the storm that took the harbor wall"
    val other = "completely unrelated content about gardening tips and " +
      "soil acidity for tomatoes in a northern climate"
    assert(session.ingest(docs(1L -> base, 2L -> other)) == 2)
    assert(session.ingest(docs(
      3L -> "more filler words entirely distinct from both earlier texts")) == 1)
    val vPre = corpus.version()
    assert(corpus.readAt(vPre).filter(col("value.text") === base).count() == 1,
      "the pre-takedown snapshot must see the content (or the purge proves nothing)")

    val claim = docs(900L -> ("prefix " + base))
    val (matched, deleted) = CorpusIngest.takedownNear(
      claim, corpus, "doc_id", "text", purge = true)
    assert(matched == 1L && deleted == 1L)
    // the live pool, EVERY surviving snapshot, and EVERY on-disk file are
    // clean — readAt of the pre-takedown state refuses rather than serving
    assert(corpus.read().filter(col("value.text") === base).count() == 0)
    intercept[IllegalArgumentException](corpus.readAt(vPre))
    assert(corpus.versions().nonEmpty)
    corpus.versions().foreach { v =>
      assert(corpus.readAt(v).filter(col("value.text") === base).count() == 0,
        s"snapshot v$v still serves taken-down content")
    }
    val segDirs = {
      val ls = Files.list(dir)
      try ls.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).filter(_ != Pool.VersionsDir).toSeq
      finally ls.close()
    }
    segDirs.foreach { s =>
      assert(spark.read.parquet(dir.resolve(s).toString)
        .filter(col("value.text") === base).count() == 0,
        s"on-disk dir $s retains taken-down content after purge")
    }
    // the unmatched documents survive the purge untouched
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    // and idempotence holds in purge mode too
    assert(CorpusIngest.takedownNear(
      claim, corpus, "doc_id", "text", purge = true) == ((0L, 0L)))
    // the live session's retained Bloom still holds the purged fp, but
    // the sketch only PRUNES — the exact verify consults the pool, so
    // the content re-lands cleanly even after a purge takedown
    assert(session.ingest(docs(50L -> base)) == 1)
    assert(corpus.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 50L))
  }

  test("session offset cache and auto-compaction keep contents and offsets exact") {
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-oc").toString)
    // compactEvery = 2: after batches 1+2 the pool compacts to ONE segment;
    // batch 3 (all dups, no append) must not disturb it; batch 4 adds one
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", compactEvery = 2)
    assert(session.ingest(docs(1L -> "a", 2L -> "b")) == 2)
    assert(session.ingest(docs(3L -> "c")) == 1)
    assert(corpus.committedSegments().size == 1, "two appends then compact -> 1 segment")
    assert(session.ingest(docs(10L -> "a")) == 0) // pure dup: no segment, no compact tick
    assert(corpus.committedSegments().size == 1)
    assert(session.ingest(docs(4L -> "d")) == 1)
    assert(corpus.committedSegments().size == 2)
    // offsets stayed contiguous through the cache + compaction
    val rows = corpus.read().select(col("kafka.offset"), col("value.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)),
      s"got ${rows.toSeq}")
  }

  test("leveled compaction folds small segments; fat history is never rewritten") {
    val root = Files.createTempDirectory("corpus-lvl")
    val corpus = Pool.create(spark, root.toString)
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", compactEvery = 1, compactMaxRows = 3)
    // seed: one 6-row segment — ABOVE maxRows, so it is fat from birth
    assert(session.ingest(docs((1L to 6L).map(i => i -> s"seed doc $i"): _*)) == 6)
    val fatSeg = corpus.committedSegments().head
    assert(corpus.segmentRows(fatSeg) == 6)
    def fatFiles() = {
      val ls = Files.list(root.resolve(fatSeg))
      try ls.iterator().asScala
        .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f)).toMap
      finally ls.close()
    }
    val fatBefore = fatFiles()
    // two small appends: the first has no fold partner, the second folds
    // with it — while the fat segment is never listed as a candidate
    assert(session.ingest(docs(10L -> "a", 11L -> "b")) == 2)
    assert(corpus.committedSegments().length == 2)
    assert(session.ingest(docs(12L -> "c", 13L -> "d")) == 2)
    val segs = corpus.committedSegments()
    assert(segs.length == 2 && segs.contains(fatSeg),
      s"smalls fold, fat survives: $segs")
    assert(segs.exists(_.startsWith("compact-")))
    assert(fatFiles() == fatBefore, "fat history must keep its files byte-identical")
    // contents, offsets, and the gates stay exact through the folds
    val rows = corpus.read().select(col("kafka.offset"), col("value.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 10L) &&
      rows.map(_._2).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 12L, 13L))
    assert(session.ingest(docs(99L -> "a")) == 0, "dup still gated after folds")
  }

  test("leveled compaction backfills a fat legacy segment once, then leaves it alone") {
    val root = Files.createTempDirectory("corpus-lbf")
    val corpus = Pool.create(spark, root.toString)
    // fat FOREIGN history: plain Pool.append, no stored fp column, above
    // the fold bound — without backfill escalation the gates would
    // re-derive from its text on every batch forever
    val foreign = docs((1L to 6L).map(i => i -> s"legacy doc $i"): _*)
    corpus.append(graft.pool.Envelope.wrap(foreign,
      org.apache.spark.sql.functions.lit("corpus"), col("doc_id"),
      org.apache.spark.sql.functions.lit(null).cast("string"),
      Seq("doc_id", "text")))
    val session = new graft.streaming.CorpusIngestSession(
      corpus, "doc_id", "text", compactEvery = 1, compactMaxRows = 3)
    assert(session.ingest(docs(10L -> "novel a")) == 1)
    // the tick folded the fat legacy segment (backfill escalation): every
    // committed segment now carries the stored fp column, values total
    val (withFp, without) = corpus.readPartitionedBySchema(_.fieldNames.contains("fp"))
    assert(without.isEmpty, "no legacy-schema segment may remain after the tick")
    assert(withFp.get.filter(col("fp").isNull).count() == 0)
    // and the backfilled fat segment is not rewritten by later ticks
    val fat = corpus.committedSegments().filter(s => corpus.segmentRows(s) > 3)
    assert(fat.nonEmpty)
    def files(seg: String) = {
      val ls = Files.list(root.resolve(seg))
      try ls.iterator().asScala
        .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f)).toMap
      finally ls.close()
    }
    val before = fat.map(s => s -> files(s)).toMap
    assert(session.ingest(docs(11L -> "novel b")) == 1)
    assert(session.ingest(docs(12L -> "novel c")) == 1)
    fat.foreach(s => assert(files(s) == before(s),
      s"backfilled fat segment $s must not be rewritten again"))
    // duplicates of the legacy docs still gate through the stored columns
    assert(session.ingest(docs(99L -> "legacy doc 3")) == 0)
  }

  test("maxBucket bounds the within-batch near pileup; the bipartite probe stays unguarded") {
    // NEAR-identical (not byte-identical) pileup: a 6-word cycle repeated
    // k >= 2 times has the SAME word-3-gram set for every k (the 6 cyclic
    // trigrams), so the variants carry identical minhash signatures (one
    // bucket per band, est = 16/16) while their byte content differs —
    // they sail through the exact gate that collapses literal copies, the
    // corner the within-batch guard exists for.
    def cyc(words: String, k: Int): String =
      Seq.fill(k)(words).mkString(" ")
    val cycleA = "alpha bravo charlie delta echo foxtrot"
    val cycleB = "golf hotel india juliet kilo lima"
    val crowd = (0 until 30).map(i => i.toLong -> cyc(cycleB, 2 + i))
    val batch = docs(crowd ++ Seq(200L -> cyc(cycleA, 3), 201L -> cyc(cycleA, 4)): _*)

    // unguarded (default 0 = exact LSH): the crowd is one est-1.0 clique —
    // it collapses to its lowest id; the cycleA pair drops BIPARTITE
    // against the landed base
    val plain = Pool.create(spark, Files.createTempDirectory("corpus-mb0").toString)
    assert(CorpusIngest.ingestBatchNear(
      docs(1000L -> cyc(cycleA, 2)), plain, "doc_id", "text") == 1)
    assert(CorpusIngest.ingestBatchNear(batch, plain, "doc_id", "text") == 1)
    assert(plain.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(1000L, 0L))

    // guarded (maxBucket = 10, via the session ctor): the 30-wide crowd
    // bucket is dropped BEFORE the within-batch self-join, so all 30
    // variants land — the cost bound and its documented recall trade —
    // while the bipartite probe (linear, never guarded) still drops both
    // cycleA near-copies of the landed corpus
    val guarded = Pool.create(spark, Files.createTempDirectory("corpus-mb1").toString)
    val session = new graft.streaming.CorpusIngestSession(
      guarded, "doc_id", "text", near = true, maxBucket = 10)
    assert(session.ingest(docs(1000L -> cyc(cycleA, 2))) == 1)
    assert(session.ingest(batch) == 30)
    assert(guarded.read().select(col("value.doc_id")).collect()
      .map(_.getLong(0)).toSet == (0L until 30L).toSet + 1000L)

    // Dedup-level API: same contract through dedupIncrementalNear
    val landed = docs(1000L -> cyc(cycleA, 2))
    val keptPlain = graft.ops.Dedup.dedupIncrementalNear(
      batch, landed, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptPlain == Set(0L))
    val keptGuarded = graft.ops.Dedup.dedupIncrementalNear(
      batch, landed, "doc_id", "text", maxBucket = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptGuarded == (0L until 30L).toSet)
  }

  test("streaming end-to-end: micro-batches of files dedup-ingest into the pool") {
    val inDir = Files.createTempDirectory("docs-stream").toString
    val corpus = Pool.create(spark, Files.createTempDirectory("corpus-s").toString)
    val schema = StructType.fromDDL("doc_id bigint, text string")

    docs(1L -> "one", 2L -> "two", 3L -> "one")
      .write.mode("append").parquet(inDir)
    val q = CorpusIngest.start(
      spark.readStream.schema(schema).parquet(inDir),
      corpus, "doc_id", "text",
      checkpoint = Files.createTempDirectory("ckpt").toString,
      interval = "1 seconds")
    q.processAllAvailable()
    docs(4L -> "two", 5L -> "three").write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()

    val rows = corpus.read()
      .select(col("kafka.offset"), col("value.doc_id"), col("value.text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // unique texts only, survivors by lowest id, offsets contiguous
    assert(rows.map(_._3).toSet == Set("one", "two", "three"))
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    assert(rows.collect { case (_, id, "one") => id }.toSeq == Seq(1L))
  }
}
