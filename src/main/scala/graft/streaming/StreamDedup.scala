package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication with watermark-bounded state — the incremental
  * twin of `graft.ops.Dedup.exactGroups` for ingest pipelines that must not
  * re-emit documents they have already shipped.
  *
  * Uses `dropDuplicatesWithinWatermark`: the seen-fingerprint state is
  * evicted once the event-time watermark passes a fingerprint's last
  * occurrence plus the delay, so state size is bounded by the duplicate
  * arrival horizon — NOT by corpus size. At 100 TB/day ingest, an unbounded
  * `dropDuplicates` would accrete every fingerprint ever seen into the state
  * store; the watermarked form holds only the recent horizon (cross-horizon
  * dedup belongs to the batch operators over the landed corpus).
  */
object StreamDedup {

  /** Drop re-arrivals of the same key columns within the watermark horizon.
    * `df` must be a streaming DataFrame with event-time column `tsCol`.
    */
  def dedupByKey(df: DataFrame, tsCol: String, delay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** Drop re-arrivals of identical CONTENT: fingerprint = md5(text), state
    * keyed by the 32-byte fingerprint rather than the document body.
    */
  def dedupByContent(df: DataFrame, tsCol: String, delay: String,
      textCol: String): DataFrame =
    df.withColumn("_fp", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Near-duplicate streaming dedup: the state key is the md5 of the full
    * minhash signature ([[graft.ops.Dedup.minhashSignatureColumn]] — a
    * stateless per-row projection, which is what lets it compose with the
    * watermarked dedup; the batch form's groupBy could not). Two documents
    * collide exactly when ALL `numPerms` permutation minima agree —
    * probability J^numPerms at Jaccard J — so this drops exact dups and
    * high-similarity near-dups (trailing whitespace, duplicated boilerplate
    * tails) within the horizon while borderline pairs pass through to the
    * batch LSH over the landed corpus, which remains the authority.
    * Documents with fewer than `n` tokens have no shingles and therefore
    * no signature — they fall back to the EXACT content hash, so two
    * distinct short docs never conflate (only identical ones dedup,
    * [[dedupByContent]] semantics). Null text coalesces to '' BEFORE
    * hashing: md5(null) is null, and `dropDuplicatesWithinWatermark`
    * treats null keys as equal — without the coalesce every null-text row
    * after the first inside the horizon would silently vanish. With it,
    * null and empty text share one exact-hash key (both carry zero
    * content), the same conflation class as [[dedupByContent]].
    */
  def dedupNearContent(df: DataFrame, tsCol: String, delay: String,
      textCol: String, n: Int = 3, numPerms: Int = 16): DataFrame =
    df.withColumn("_sig", nearContentKey(col(textCol), n, numPerms))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_sig")
      .drop("_sig")

  /** The state-key derivation of [[dedupNearContent]] as a standalone
    * column — a stateless projection, so the batch oracle can hash-check
    * the exact expression the streaming state store keys on (the streaming
    * half itself is spec-tested; this pins the key math driver-side).
    */
  def nearContentKey(textCol: org.apache.spark.sql.Column, n: Int = 3,
      numPerms: Int = 16): org.apache.spark.sql.Column =
    when(size(split(textCol, " ")) >= n,
      md5(array_join(
        graft.ops.Dedup.minhashSignatureColumn(textCol, n, numPerms), ",")))
      .otherwise(md5(coalesce(textCol, lit(""))))
}
