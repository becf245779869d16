package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.sketch.BloomFilter
import graft.etl.Offsets
import graft.ops.{ConcurrentJobs, Dedup}
import graft.pool.{Envelope, Pool}

/** Continuous training-data dedup ingest — the streaming composition of the
  * engine's two flagship primitives: Structured Streaming micro-batches and
  * [[graft.ops.Dedup.incrementalNewDocsManaged]]'s Bloom-prune +
  * exact-verify incremental dedup, with the corpus pool itself as the only
  * state (the same state-lives-in-the-sink design as the Kafka sync paths,
  * fifo/lake.go:62-82's resume argument applied to content identity).
  *
  * Per micro-batch:
  *  1. batch-internal exact dedup — one map-side-combinable hash agg
  *     keeping the lowest-id row per content fingerprint (a crawl batch
  *     routinely repeats documents);
  *  2. incremental dedup against the corpus — Bloom-pruned, exact
  *     (the sketch only prunes; an anti-join verifies);
  *  3. envelope + offset-assign the survivors in id order, atomic append.
  *
  * Replay safety: foreachBatch is at-least-once — a replayed batch re-runs
  * step 2 against a corpus that already holds its documents, so the
  * anti-join drops every one and the append is empty. Idempotent with no
  * checkpoint state needed for exactness (T4's argument, content edition).
  *
  * 100 TB shape — the landed side is NEVER re-derived from text:
  *  - every appended row carries its content fingerprint as a top-level
  *    `fp` column (md5 of the text), so the exact gate's sketch build and
  *    verify anti-join scan one narrow ~32-byte column, not the corpus
  *    text;
  *  - the near path additionally stores the minhash signature as a
  *    top-level `sig` column ([[graft.ops.Dedup.storedSignatureColumn]]),
  *    so the bipartite LSH probe reads a narrow (id, sig) table instead of
  *    re-shingling the landed corpus every micro-batch;
  *  - [[CorpusIngestSession]] retains the exact-gate Bloom filter ACROSS
  *    batches (`mergeInPlace` of each appended batch's fingerprints), so
  *    steady-state batches build no corpus-sized sketch at all — and when
  *    a batch has no might-contain rows, AQE's empty-relation propagation
  *    elides even the verify's fp-column scan.
  *
  * Provenance tolerance: the gates are correct for ANY mix of writers.
  * Rows missing a stored `fp`/`sig` (pre-storage segments, exact-path
  * appends probed by the near path, a foreign `Pool.append`) fall back
  * PER ROW to text-derived fingerprints/signatures — the fallback branch
  * carries its own null filter, so parquet row-group stats confine the
  * text read to the segments that actually need it. The single-writer
  * rule remains the pool's (concurrency, not provenance).
  */
object CorpusIngest {

  /** Ingest one batch of documents; returns the number appended.
    * Batch-mode core — the streaming entry point below delegates here, and
    * tests/oracle queries can drive it without a stream. Stateless: the
    * exact-gate Bloom filter is rebuilt from the landed `fp` column each
    * call (one narrow scan); loop callers should prefer
    * [[CorpusIngestSession]], which retains it across batches.
    */
  def ingestBatch(batch: DataFrame, corpus: Pool, idCol: String,
      textCol: String, topic: String = "corpus",
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): Long = {
    val cols = batch.columns.toSeq
    val uniq = uniqPerContent(batch, idCol, textCol, cols)
    // 2. incremental dedup vs the corpus (skipped on first commit)
    val (fresh, release) =
      if (corpus.isEmpty) (uniq, () => ())
      else Dedup.incrementalNewDocsFromFpsManaged(
        landedFps(corpus, textCol), "_fp", uniq, textCol, expectedItems, fpp)
    try appendSorted(fresh, corpus, idCol, textCol, topic, cols, sigParams = None)
    finally release()
  }

  /** As [[ingestBatch]] with a NEAR-dup gate stacked on the exact one: the
    * exact Bloom-pruned pass first (it alone covers short docs, which have
    * no signature, and it is what makes replay idempotent — a re-arriving
    * batch is EXACTLY equal to its landed copy), then the bipartite LSH
    * probe ([[graft.ops.Dedup.dedupIncrementalNearPresigned]]) matches
    * exact survivors against the corpus's STORED signature column at
    * signature-estimated Jaccard ≥ `threshold`. Near-dup state lives in
    * the corpus itself, like everything else on this path — no checkpoint
    * beyond the source's.
    *
    * (n, numPerms) must match across every call that feeds one pool — the
    * stored signatures are only comparable to probe signatures built with
    * the same parameters (`numPerms` drift fails loudly at probe time;
    * `n` drift is undetectable from data).
    *
    * `maxBucket` (default 0 = off) bounds the WITHIN-BATCH candidate side
    * of the near gate: a crawl batch carrying K near-identical (not
    * byte-identical — the exact gate collapses those) variants of one page
    * otherwise self-joins K² candidates in its densest LSH bucket. The
    * bipartite batch-vs-corpus probe is never guarded — dropping landed
    * buckets would re-admit near-copies of the corpus's densest page
    * ([[graft.ops.Dedup.dedupIncrementalNear]]'s argument).
    */
  def ingestBatchNear(batch: DataFrame, corpus: Pool, idCol: String,
      textCol: String, topic: String = "corpus",
      n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      threshold: Double = 0.5,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01,
      maxBucket: Int = 0): Long = {
    val cols = batch.columns.toSeq
    val uniq = uniqPerContent(batch, idCol, textCol, cols)
    val empty = corpus.isEmpty
    // first commit: no landed side — the near pass still dedups the batch
    // against itself (lower-id wins), the exact agg above caught literals
    val (exactFresh, releaseExact) =
      if (empty) (uniq, () => ())
      else Dedup.incrementalNewDocsFromFpsManaged(
        landedFps(corpus, textCol), "_fp", uniq, textCol, expectedItems, fpp)
    val lSig =
      if (empty) Dedup.minhashSignatureFrame(uniq.limit(0), idCol, textCol, n, numPerms)
      else landedSigFrame(corpus, idCol, textCol, n, numPerms)
    // WithSig: the probe's persisted batch-signature frame is reused by the
    // append's stored-sig join — the batch is shingled exactly ONCE
    val (fresh, sIn, releaseNear) = Dedup.dedupIncrementalNearWithSig(
      exactFresh, lSig, idCol, textCol, n, numPerms, bands, threshold,
      maxBucket)
    try appendSorted(fresh, corpus, idCol, textCol, topic, cols,
      sigParams = Some((n, numPerms)), sigFrame = Some(sIn))
    finally { releaseNear(); releaseExact() }
  }

  /** Near-dup SEARCH against the corpus pool's stored signatures: for each
    * query document, the landed documents matching at signature-estimated
    * Jaccard ≥ `threshold` ([[graft.ops.Dedup.nearDuplicatesOf]] over the
    * pool's narrow `sig` column — the landed text is never read). The
    * takedown / contamination / provenance query a signed corpus answers
    * for free. Output: (d1 = query id, d2 = landed doc id, est).
    */
  def nearDuplicatesInPool(queries: DataFrame, corpus: Pool, idCol: String,
      textCol: String, n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    Dedup.nearDuplicatesOf(queries,
      landedSigFrame(corpus, idCol, textCol, n, numPerms),
      idCol, textCol, n, numPerms, bands, threshold)

  /** End-to-end near-dup TAKEDOWN (DMCA list, licensed corpus, opt-out
    * request): find every landed document matching a query document at
    * signature-estimated Jaccard ≥ `threshold`
    * ([[nearDuplicatesInPool]] — the stored-sig probe, landed text never
    * read), then DELETE those documents from the pool via
    * [[graft.pool.Pool.deleteWhere]] — only the segments holding matches
    * are rewritten, per provenance era. The matched id list is collected
    * driver-side: it is bounded by (takedown list × near-copies each),
    * takedown-scale by contract, never corpus-scale.
    *
    * Idempotent (a second run matches nothing) and composes with a live
    * [[CorpusIngestSession]]: the session's retained Bloom may still
    * contain the deleted fingerprints, but the sketch only PRUNES — the
    * exact verify consults the pool itself, so a deleted document
    * re-ingests cleanly afterwards (spec-pinned).
    *
    * @param purge when true the delete is also applied to HISTORY:
    *   [[graft.pool.Pool.deleteWhere]] runs with `purge = true`, so the
    *   pre-delete segment copies leave the disk and the snapshot versions
    *   referencing them are pruned — after the call, NO `readAt` and no
    *   on-disk file yields the matched text. This is the actual
    *   DMCA / right-to-be-forgotten contract; the default (false) keeps
    *   the pre-delete snapshots readable until an operator-scheduled
    *   `vacuum()`, which is an audit convenience but a compliance
    *   footgun — purge forfeits time travel across the delete, and that
    *   is the point.
    * @return (distinct landed documents matched, pool rows deleted) —
    *   equal unless a match was already gone.
    */
  def takedownNear(queries: DataFrame, corpus: Pool, idCol: String,
      textCol: String, n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, purge: Boolean = false): (Long, Long) = {
    // a prior takedown (or delete) may have emptied the pool — nothing
    // to match is a clean (0, 0), not a read error (the idempotency
    // contract above)
    if (corpus.isEmpty) return (0L, 0L)
    val matched = nearDuplicatesInPool(queries, corpus, idCol, textCol,
        n, numPerms, bands, threshold)
      .select(col("d2")).distinct().collect().map(_.get(0)).toSeq
    if (matched.isEmpty) (0L, 0L)
    else (matched.size.toLong,
      corpus.deleteWhere(col(s"value.$idCol").isin(matched: _*), purge = purge))
  }

  /** The landed exact-gate fingerprints, one `_fp` column — EVERY landed
    * row is covered whatever wrote it: segments whose footer schema
    * carries the stored `fp` contribute it directly (narrow scan);
    * segments without one (pre-storage eras, a foreign `Pool.append`)
    * fall back to md5 of their text. Routing is by PER-SEGMENT schema
    * ([[Pool.readPartitionedBySchema]] — a segment is one atomic append,
    * so provenance is exact at segment granularity and neither group
    * lists the other's files): a pool fed exclusively through
    * CorpusIngest never reads landed text here, a mixed pool pays the
    * text derivation only for its legacy segments, and correctness (the
    * replay-idempotence contract) never depends on provenance.
    */
  private[streaming] def landedFps(corpus: Pool, textCol: String): DataFrame = {
    val (withFp, rest) = corpus.readPartitionedBySchema(_.fieldNames.contains("fp"))
    // a null fp INSIDE an fp-bearing segment means a mixed-era pool went
    // through raw Pool.compact() (which merges eras into one superset-
    // schema segment) — fail fast naming the repair; silently trusting it
    // would let duplicates of the null-fp rows re-land
    val stored = withFp.map(_.select(
      when(col("fp").isNotNull, col("fp"))
        .otherwise(raise_error(lit(
          "null stored fingerprint in an fp-bearing segment — a mixed-era " +
            "pool was compacted without backfill; run CorpusIngest.compactPool")))
        .as("_fp")))
    val derived = rest.map(_.select(md5(col(s"value.$textCol")).as("_fp")))
    (stored ++ derived).reduce(_ unionByName _)
  }

  /** The landed signature frame (id, m0..m{numPerms-1}), covering EVERY
    * landed row with shingles whatever wrote it: sig-bearing segments
    * read narrow; segments written WITHOUT signatures (exact-path
    * appends, pre-storage eras, foreign writers) recompute from their
    * text — the same per-segment schema routing as [[landedFps]].
    * Genuinely shingle-less docs are stored as EMPTY arrays by the near
    * writer — distinguishable from "no signature written" — and correctly
    * excluded, matching [[Dedup.minhashSignatureFrame]]'s row set.
    */
  private[streaming] def landedSigFrame(corpus: Pool, idCol: String,
      textCol: String, n: Int, numPerms: Int,
      only: Option[Seq[String]] = None): DataFrame = {
    val (withSig, rest) = only match {
      case Some(segs) =>
        // the signature-index catch-up scan: cover exactly the listed
        // commits, never re-reading the segments the index already holds
        corpus.readSegmentsPartitionedBySchema(segs, _.fieldNames.contains("sig"))
      case None => corpus.readPartitionedBySchema(_.fieldNames.contains("sig"))
    }
    // null sig inside a sig-bearing segment = un-backfilled raw compaction
    // of a mixed-era pool (the landedFps guard's argument) — fail fast
    val stored = withSig.map(env => Dedup.signatureFrameFromStored(
      env.select(col(s"value.$idCol").as("id"),
        when(col("sig").isNotNull, col("sig"))
          .otherwise(raise_error(lit(
            "null stored signature in a sig-bearing segment — a mixed-era " +
              "pool was compacted without backfill; run CorpusIngest.compactPool")))
          .as("sig")),
      "id", "sig", numPerms))
    val derived = rest.map(env => Dedup.minhashSignatureFrame(
      env.select(col("value.*")), idCol, textCol, n, numPerms))
    (stored ++ derived).reduce(_ unionByName _)
  }

  /** Compact the pool with STORED-COLUMN BACKFILL: every row of the single
    * rewritten segment carries its content fingerprint, and (when
    * `sigParams` is set) its minhash signature — so a pool of any mixed
    * provenance (pre-storage eras, exact-path appends, foreign rows)
    * comes out fully stored and the gates' narrow scans cover everything.
    * This is what the session's `compactEvery` runs; raw [[Pool.compact]]
    * on a MIXED pool instead produces nulls inside stored columns, which
    * the gates reject loudly. Returns the number of segments compacted.
    */
  def compactPool(corpus: Pool, idCol: String, textCol: String,
      sigParams: Option[(Int, Int)] = None): Int =
    corpus.compactWith(backfillStored(_, textCol, sigParams))

  /** The stored-column backfill applied during a compaction rewrite. */
  private def backfillStored(env: DataFrame, textCol: String,
      sigParams: Option[(Int, Int)]): DataFrame = {
    val withFp = env.withColumn("fp",
      if (env.columns.contains("fp"))
        coalesce(col("fp"), md5(col(s"value.$textCol")))
      else md5(col(s"value.$textCol")))
    sigParams match {
      case None => withFp
      case Some((n, p)) =>
        val sigExpr = Dedup.storedSignatureColumn(col(s"value.$textCol"), n, p)
        val filled = coalesce(
          if (env.columns.contains("sig")) coalesce(col("sig"), sigExpr) else sigExpr,
          array().cast("array<string>"))
        withFp.withColumn("sig", filled)
    }
  }

  /** LEVELED compaction for the ingest loop: fold only the segments at or
    * under `maxRows` (parquet-footer metadata — no job to size them),
    * grouped by footer schema so provenance eras never merge raw (each
    * group folds through the stored-column backfill, so a legacy-era fold
    * comes out fully stored). A full [[compactPool]] rewrites O(corpus)
    * every cycle — at 100 TB the session would spend its time rewriting
    * fat history it already compacted; folding O(small segments) bounds
    * the listing churn the micro-batches cause while fat segments age out
    * of the candidate set and are never touched again. Groups of one
    * segment are left alone (folding a lone segment is churn, not
    * compaction). Returns segments folded.
    */
  def compactSmallPool(corpus: Pool, idCol: String, textCol: String,
      sigParams: Option[(Int, Int)] = None,
      maxRows: Long = 1L << 22): Int = {
    // a segment WITHOUT the stored columns is a fold candidate at ANY
    // size: without this, a fat legacy segment (foreign append,
    // pre-storage era) would never age into the stored era and every
    // micro-batch's gates would re-derive from its text forever — the
    // O(corpus)-per-batch term the stored columns exist to remove. The
    // backfill makes the fold a one-time migration (its output carries
    // fp/sig, so it never qualifies again).
    def needsBackfill(sch: org.apache.spark.sql.types.StructType): Boolean =
      !sch.fieldNames.contains("fp") ||
        (sigParams.isDefined && !sch.fieldNames.contains("sig"))
    val smalls = corpus.smallSegments(maxRows).toSet
    corpus.committedSegments()
      .filter(s => smalls.contains(s) || needsBackfill(corpus.segmentSchema(s)))
      .groupBy(corpus.segmentSchema).toSeq
      // stored-era smalls fold only with a partner (a lone fold is
      // churn); a legacy-era group folds even alone (backfill IS the
      // point, like compactWith's single-segment contract)
      .filter { case (sch, group) => group.length >= 2 || needsBackfill(sch) }
      .map { case (_, group) => corpus.compactSegmentsWith(group,
        backfillStored(_, textCol, sigParams)) }
      .sum
  }

  /** Step 1 of both ingest paths: within-batch exact dedup, deterministic
    * survivor (lowest id per content fingerprint). Null-text documents have
    * no content identity: md5(null) is null, so they would bypass both the
    * sketch and the exact verify and re-append on every replay, breaking
    * idempotence — dropped up front.
    */
  private[streaming] def uniqPerContent(batch: DataFrame, idCol: String,
      textCol: String, cols: Seq[String]): DataFrame =
    batch.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select("_row.*")

  /** Step 3 of the ingest paths: envelope the survivors in id order with
    * offsets continuing from the pool, atomic append; returns the count.
    * Every envelope carries the content fingerprint `fp`; near-path
    * envelopes (`sigParams = Some((n, numPerms))`) also carry the stored
    * minhash signature `sig` — both map-only projections over the batch.
    * `onSurvivors` runs against the persisted survivor frame CONCURRENTLY
    * with the pool write (guide §2.6 — both only read the `sorted` cache,
    * and the hook's product is consumed no earlier than the next batch):
    * the [[CorpusIngestSession]] Bloom-merge hook, whose failure handling
    * must therefore not assume the append was skipped — the session
    * invalidates its retained filter on a failed merge so the
    * bloom-superset-of-landed invariant re-seeds from the pool.
    */
  private[streaming] def appendSorted(fresh: DataFrame, corpus: Pool,
      idCol: String, textCol: String, topic: String, cols: Seq[String],
      sigParams: Option[(Int, Int)],
      onSurvivors: DataFrame => Unit = _ => (),
      knownBase: Option[Long] = None,
      sigFrame: Option[DataFrame] = None,
      onAppended: (DataFrame, String) => Unit = (_, _) => ()): Long = {
    val sorted = fresh
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val appended = sorted.count()
      if (appended > 0) {
        val base = knownBase.getOrElse(corpus.nextOffset(topic) max 0L)
        val envCols = Seq(
          struct(lit(topic).as("topic"), lit(0L).as("partition"),
            col("_off").as("offset")).as("kafka"),
          lit(null).cast("string").as("key"),
          struct(cols.map(col): _*).as("value"),
          lit(Envelope.KindRecord).as(Envelope.KindCol),
          md5(col(textCol)).as("fp"))
        val assigned = Offsets.assignSequential(sorted, base, "_off")
        val env = sigParams match {
          case None => assigned.select(envCols: _*)
          case Some((n, p)) =>
            // signature via the AGGREGATION form, joined on: the per-row
            // HOF column ([[Dedup.minhashSignatureColumn]]) is interpreted
            // (lambda dispatch + boxing per slot×shingle) and measured 5×
            // slower than this codegen'd groupBy at append volume; values
            // are bit-identical (OpsSpec column≡frame pin) and shingle-less
            // docs come back null through the left join, matching the
            // stored-column contract. `sorted` is persisted, so the
            // signature pass reads the cache, not the gate plan — and when
            // the caller hands over the near gate's own persisted frame
            // (`sigFrame`, a superset covering the pre-gate batch), the
            // batch is not re-shingled at all.
            val sigF = sigFrame
              .getOrElse(Dedup.minhashSignatureFrame(sorted, idCol, textCol, n, p))
              .select(col("id").as("_sig_id"),
                array((0 until p).map(i => col(s"m$i")): _*).as("_sig"))
            // shingle-less docs store an EMPTY array, not null: null on a
            // near pool means "no signature was written" (exact-path or
            // foreign append) and tells landedSigFrame to recompute — the
            // two cases must stay distinguishable
            assigned.join(sigF, col(idCol) === col("_sig_id"), "left")
              .select(envCols :+
                coalesce(col("_sig"), array().cast("array<string>")).as("sig"): _*)
        }
        // the survivor hook (Bloom build over the `sorted` cache) and the
        // pool append (range-sample + write of `env`, also reading the
        // cache) are independent actions — overlap them (§2.6). Await-all
        // publication (ConcurrentJobs) makes `seg` visible below.
        var seg: String = null
        ConcurrentJobs.run(
          () => onSurvivors(sorted),
          () => seg = corpus.append(env, knownRows = Some(appended)))
        // AFTER the pool commit (the index must never cover rows the pool
        // refused), with the survivors still persisted — the session's
        // signature-index delta hook
        onAppended(sorted, seg)
      }
      appended
    } finally sorted.unpersist()
  }

  /** Streaming entry point: each micro-batch of `docs` (a streaming
    * DataFrame of documents) dedup-ingests into `corpus` through one
    * [[CorpusIngestSession]], so the exact-gate Bloom filter carries
    * across micro-batches.
    */
  def start(docs: DataFrame, corpus: Pool, idCol: String, textCol: String,
      checkpoint: String, topic: String = "corpus",
      interval: String = "5 seconds",
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): StreamingQuery = {
    val session = new CorpusIngestSession(corpus, idCol, textCol, topic,
      near = false, expectedItems = expectedItems, fpp = fpp)
    docs.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        session.ingest(batch)
        ()
      }
      .start()
  }

  /** Streaming entry for the near-dup ingest: one [[CorpusIngestSession]]
    * with the near gate per micro-batch.
    */
  def startNear(docs: DataFrame, corpus: Pool, idCol: String, textCol: String,
      checkpoint: String, topic: String = "corpus",
      interval: String = "5 seconds", n: Int = 3, numPerms: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01,
      maxBucket: Int = 0, sigIndexPath: Option[String] = None): StreamingQuery = {
    val session = new CorpusIngestSession(corpus, idCol, textCol, topic,
      near = true, n, numPerms, bands, threshold, expectedItems, fpp,
      maxBucket = maxBucket, sigIndexPath = sigIndexPath)
    docs.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        session.ingest(batch)
        ()
      }
      .start()
  }
}

/** A stateful ingest loop over one corpus pool: the exact-gate Bloom
  * filter is held on the driver ACROSS batches — seeded once from the
  * landed `fp` column (or empty for a new pool) and grown by
  * `mergeInPlace` of each appended batch's fingerprints — so steady-state
  * batches never rebuild a corpus-sized sketch (SCALING.md's prescription;
  * the per-batch sketch cost drops from O(corpus) to O(batch)). The
  * filter decides ONE thing: rows it has never seen skip the verify.
  * That shortcut is sound iff the filter is a SUPERSET of the landed
  * fingerprints — guaranteed by the seed (which covers every landed row,
  * stored fp or text-derived) plus the per-append merges. A concurrent
  * writer appending MID-SESSION breaks the superset (its rows' dups
  * would skip the verify) — the one-ingestor-per-pool rule is therefore
  * load-bearing here, not just a concurrency convention; a fresh session
  * re-seeds from the pool and is correct against anything already landed.
  *
  * The session also caches the pool's NEXT OFFSET (seeded once via
  * `nextOffset`, advanced locally per append) — exact under the same
  * single-ingestor contract — which removes the remaining per-batch
  * O(corpus) term, the full-pool kafka-column max scan. And it can
  * amortize the small-segments accretion of a long loop:
  * `compactEvery = N` runs a LEVELED compaction after every N non-empty
  * appends ([[CorpusIngest.compactSmallPool]]): only segments at or
  * under `compactMaxRows` fold (per schema era, through the
  * stored-column backfill), so the per-cycle cost is O(small segments)
  * — fat folded history ages out of the candidate set instead of being
  * rewritten every cycle, the LSM trade done properly. Readers are
  * never disturbed; the manifest swap is the commit point.
  *
  * Not thread-safe: one session drives one pool from one loop.
  */
final class CorpusIngestSession(corpus: Pool, idCol: String, textCol: String,
    topic: String = "corpus", near: Boolean = false, n: Int = 3,
    numPerms: Int = 16, bands: Int = 4, threshold: Double = 0.5,
    expectedItems: Long = 1L << 20, fpp: Double = 0.01,
    compactEvery: Int = 0, compactMaxRows: Long = 1L << 22,
    maxBucket: Int = 0,
    sigIndexPath: Option[String] = None, indexFoldEvery: Int = 16) {
  import CorpusIngest._

  private var bloom: Option[BloomFilter] = None
  private var nextOff: Option[Long] = None
  private var appendsSinceCompact = 0
  private var sigIdx: Option[graft.ops.SignatureIndex] = None

  /** The landed-signature index, opened-or-created lazily and RECONCILED
    * with the pool before first use: pool segments the index has not
    * covered yet (a previous session's appends, a foreign CorpusIngest
    * writer) are caught up with one narrow scan OF THOSE SEGMENTS ONLY;
    * covered-but-gone segments (a takedown / out-of-band rewrite changed
    * history) force a full REBUILD — a stale landed signature would
    * wrongfully drop new documents that match deleted content, the one
    * failure mode an ingest gate must not have. The session's own leveled
    * compaction is content-preserving and merely remaps the covered list.
    */
  private def indexFor(batch: DataFrame): graft.ops.SignatureIndex =
    sigIdx.getOrElse {
      val idTypeDdl = batch.schema(batch.schema.fieldIndex(idCol)).dataType.sql
      val idx = graft.ops.SignatureIndex.openChecked(corpus.spark,
        sigIndexPath.get, n, numPerms, bands, idTypeDdl)
      val committed = corpus.committedSegments()
      val covered = idx.coveredSegments
      val removed = covered.filterNot(committed.toSet)
      val missing = committed.filterNot(covered.toSet)
      if (removed.nonEmpty)
        idx.rebuild(
          if (committed.isEmpty)
            Dedup.minhashSignatureFrame(batch.limit(0), idCol, textCol, n, numPerms)
          else landedSigFrame(corpus, idCol, textCol, n, numPerms),
          committed)
      else if (missing.nonEmpty)
        idx.appendDelta(
          landedSigFrame(corpus, idCol, textCol, n, numPerms, Some(missing)),
          missing)
      sigIdx = Some(idx)
      idx
    }

  /** The retained filter — seeded lazily: empty for a new pool, else one
    * narrow scan of the landed fp column (the ONLY corpus-sized sketch
    * build in the session's lifetime).
    */
  private def retainedBloom(): BloomFilter = bloom.getOrElse {
    val bf =
      if (corpus.isEmpty) BloomFilter.create(expectedItems, fpp)
      else landedFps(corpus, textCol).stat.bloomFilter("_fp", expectedItems, fpp)
    bloom = Some(bf)
    bf
  }

  /** Ingest one batch; returns the number appended. Same semantics as the
    * stateless [[CorpusIngest.ingestBatch]]/[[CorpusIngest.ingestBatchNear]]
    * (exact gate, then the near gate when configured), with the sketch
    * retained instead of rebuilt.
    */
  def ingest(batch: DataFrame): Long = {
    val cols = batch.columns.toSeq
    val uniq = uniqPerContent(batch, idCol, textCol, cols)
    val empty = corpus.isEmpty
    val bf = retainedBloom()
    val (exactFresh, releaseExact) =
      if (empty) (uniq, () => ())
      else Dedup.incrementalNewDocsWithBloomManaged(
        landedFps(corpus, textCol), "_fp", uniq, textCol, bf)
    val (fresh, sigReuse, releaseNear) =
      if (!near) (exactFresh, None, () => ())
      else sigIndexPath match {
        case Some(_) =>
          // the partition-pruned probe: landed cost is O(batch buckets),
          // not a full landed-signature scan — an empty index (fresh pool)
          // degenerates to the within-batch pass, exactly the empty branch
          // below
          val (f, sIn, r) = Dedup.dedupIncrementalNearIndexed(
            exactFresh, indexFor(batch), idCol, textCol, threshold, maxBucket)
          (f, Some(sIn), r)
        case None =>
          val lSig =
            if (empty) Dedup.minhashSignatureFrame(
              exactFresh.limit(0), idCol, textCol, n, numPerms)
            else landedSigFrame(corpus, idCol, textCol, n, numPerms)
          val (f, sIn, r) = Dedup.dedupIncrementalNearWithSig(
            exactFresh, lSig, idCol, textCol, n, numPerms, bands, threshold,
            maxBucket)
          (f, Some(sIn), r)
      }
    val base = nextOff.getOrElse(corpus.nextOffset(topic) max 0L)
    val appended =
      try appendSorted(fresh, corpus, idCol, textCol, topic, cols,
        sigParams = if (near) Some((n, numPerms)) else None,
        // the merge runs CONCURRENTLY with the pool append (appendSorted):
        // a failed merge can no longer assume the append was skipped, so
        // the retained filter is INVALIDATED on failure — the next batch
        // re-seeds from the pool, restoring the superset-of-landed
        // invariant whether or not the append committed
        onSurvivors = s =>
          try bf.mergeInPlace(
            s.select(md5(col(textCol)).as("_fp")).stat.bloomFilter("_fp", expectedItems, fpp))
          catch { case t: Throwable => bloom = None; throw t },
        knownBase = Some(base), sigFrame = sigReuse,
        onAppended = (survivors, seg) => sigIdx.foreach { idx =>
          // delta = the probe's own persisted signature frame (a pre-gate
          // superset — the batch is never re-shingled) narrowed to the
          // rows the pool just committed; written AFTER the pool commit,
          // so the index can lag the pool (caught up at next seed) but
          // never lead it
          idx.appendDelta(
            sigReuse.get.join(survivors.select(col(idCol).as("id")),
              Seq("id"), "left_semi"),
            Seq(seg))
        })
      finally { releaseNear(); releaseExact() }
    nextOff = Some(base + appended)
    if (compactEvery > 0 && appended > 0) {
      appendsSinceCompact += 1
      if (appendsSinceCompact >= compactEvery) {
        // leveled backfilling compaction: small segments fold per era,
        // stored columns stay total, fat history is never rewritten
        CorpusIngest.compactSmallPool(corpus, idCol, textCol,
          if (near) Some((n, numPerms)) else None, compactMaxRows)
        appendsSinceCompact = 0
        // the fold is content-preserving (same rows, new segment names):
        // the index rows still describe the pool exactly — remap, don't
        // rebuild
        sigIdx.foreach(_.remapCovered(corpus.committedSegments()))
      }
    }
    // LSM cadence for the index itself: fold deltas into a fresh pruned
    // base before their count can make the probe's delta term material
    sigIdx.foreach(idx => if (idx.deltaCount >= indexFoldEvery) idx.fold())
    appended
  }
}
