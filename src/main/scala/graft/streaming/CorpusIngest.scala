package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.etl.Offsets
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
  * 100 TB shape: steps 1 and 3 touch only the micro-batch; step 2 scans
  * the corpus fingerprint column once per batch to build the sketch. At
  * real scale, hold the Bloom filter across batches and `mergeInPlace`
  * each batch's fingerprints instead of rebuilding — the exact verify
  * keeps the result exact either way, so the sketch's staleness policy is
  * purely a cost knob. That evolution needs no change to this commit path.
  */
object CorpusIngest {

  /** Ingest one batch of documents; returns the number appended.
    * Batch-mode core — the streaming entry point below delegates here, and
    * tests/oracle queries can drive it without a stream.
    */
  def ingestBatch(batch: DataFrame, corpus: Pool, idCol: String,
      textCol: String, topic: String = "corpus",
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): Long = {
    val cols = batch.columns.toSeq
    val uniq = uniqPerContent(batch, idCol, textCol, cols)
    // 2. incremental dedup vs the corpus (skipped on first commit)
    val (fresh, release) =
      if (corpus.isEmpty) (uniq, () => ())
      else graft.ops.Dedup.incrementalNewDocsManaged(
        corpus.read().select(col("value.*")), uniq, textCol, expectedItems, fpp)
    try appendSorted(fresh, corpus, idCol, topic, cols)
    finally release()
  }

  /** As [[ingestBatch]] with a NEAR-dup gate stacked on the exact one: the
    * exact Bloom-pruned pass first (it alone covers short docs, which have
    * no signature, and it is what makes replay idempotent — a re-arriving
    * batch is EXACTLY equal to its landed copy), then
    * [[graft.ops.Dedup.dedupIncrementalNear]] probes the corpus bipartite
    * for near-duplicate survivors at signature-estimated Jaccard ≥
    * `threshold`. Near-dup state lives in the corpus itself, like
    * everything else on this path — no checkpoint beyond the source's.
    */
  def ingestBatchNear(batch: DataFrame, corpus: Pool, idCol: String,
      textCol: String, topic: String = "corpus",
      n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      threshold: Double = 0.5,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): Long = {
    val cols = batch.columns.toSeq
    val uniq = uniqPerContent(batch, idCol, textCol, cols)
    if (corpus.isEmpty) {
      // first commit: no landed side — the near pass still dedups the batch
      // against itself (lower-id wins), the exact agg above caught literals
      val (fresh, release) = graft.ops.Dedup.dedupIncrementalNearManaged(
        uniq, uniq.limit(0), idCol, textCol, n, numPerms, bands, threshold)
      try appendSorted(fresh, corpus, idCol, topic, cols)
      finally release()
    } else {
      val landed = corpus.read().select(col("value.*"))
      val (exactFresh, releaseExact) = graft.ops.Dedup.incrementalNewDocsManaged(
        landed, uniq, textCol, expectedItems, fpp)
      val (fresh, releaseNear) = graft.ops.Dedup.dedupIncrementalNearManaged(
        exactFresh, landed, idCol, textCol, n, numPerms, bands, threshold)
      try appendSorted(fresh, corpus, idCol, topic, cols)
      finally { releaseNear(); releaseExact() }
    }
  }

  /** Step 1 of both ingest paths: within-batch exact dedup, deterministic
    * survivor (lowest id per content fingerprint). Null-text documents have
    * no content identity: md5(null) is null, so they would bypass both the
    * sketch and the exact verify and re-append on every replay, breaking
    * idempotence — dropped up front.
    */
  private def uniqPerContent(batch: DataFrame, idCol: String, textCol: String,
      cols: Seq[String]): DataFrame =
    batch.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select("_row.*")

  /** Step 3 of the ingest paths: envelope the survivors in id order with
    * offsets continuing from the pool, atomic append; returns the count.
    */
  private def appendSorted(fresh: DataFrame, corpus: Pool, idCol: String,
      topic: String, cols: Seq[String]): Long = {
    val sorted = fresh
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val appended = sorted.count()
      if (appended > 0) {
        val base = corpus.nextOffset(topic) max 0L
        val env = Offsets.assignSequential(sorted, base, "_off")
          .select(
            struct(lit(topic).as("topic"), lit(0L).as("partition"),
              col("_off").as("offset")).as("kafka"),
            lit(null).cast("string").as("key"),
            struct(cols.map(col): _*).as("value"),
            lit(Envelope.KindRecord).as(Envelope.KindCol))
        corpus.append(env, knownRows = Some(appended))
      }
      appended
    } finally sorted.unpersist()
  }

  /** Streaming entry point: each micro-batch of `docs` (a streaming
    * DataFrame of documents) dedup-ingests into `corpus`.
    */
  def start(docs: DataFrame, corpus: Pool, idCol: String, textCol: String,
      checkpoint: String, topic: String = "corpus",
      interval: String = "5 seconds",
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, corpus, idCol, textCol, topic, expectedItems, fpp)
        ()
      }
      .start()

  /** Streaming entry for the near-dup ingest: [[ingestBatchNear]] per
    * micro-batch.
    */
  def startNear(docs: DataFrame, corpus: Pool, idCol: String, textCol: String,
      checkpoint: String, topic: String = "corpus",
      interval: String = "5 seconds", n: Int = 3, numPerms: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatchNear(batch, corpus, idCol, textCol, topic,
          n, numPerms, bands, threshold, expectedItems, fpp)
        ()
      }
      .start()
}
