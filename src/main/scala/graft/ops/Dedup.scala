package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame transforms — shuffle-conscious,
  * collect-free, and deterministic (hash functions are md5-based so results
  * are engine-independent and reproducible across runs/engines):
  *
  *  - exact: one hash-aggregation, fully map-side-combinable.
  *  - MinHash+LSH: the 100 TB near-dup path — signatures are a narrow
  *    (id, perm, minhash) aggregation; candidate generation is a self-join
  *    on (band, bandKey) buckets, i.e. shuffle keyed on tiny hashes, never
  *    an all-pairs product.
  *  - n-gram Jaccard: exact pairwise similarity via an inverted shingle
  *    index join; `maxDf` caps hot shingles (stop-shingles) which otherwise
  *    create quadratic skew — the classic scale hazard of this operator.
  *  - SimHash: 16-bit signature per doc in a single aggregation.
  *  - Embedding cosine: blocked pairwise (by a partition column, e.g. a
  *    cluster/label id) so the join never goes all-pairs global.
  */
object Dedup {

  /** Exact duplicate groups: md5 fingerprint → (fp, cnt, canonical id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("canonical"))
      .filter(col("cnt") > 1)

  /** Incremental exact dedup of a new batch against a (much larger) history
    * corpus — the continuous-ingest primitive: "which of today's documents
    * has the corpus never seen?". Bloom-prune then exact-verify:
    *
    *  1. one pass over history builds a Bloom filter of content
    *     fingerprints (Spark's sketch aggregate — partial per partition,
    *     merged bitwise);
    *  2. incoming rows the filter definitely hasn't seen pass with NO join
    *     at all — at typical dup rates that is most of the batch;
    *  3. only the might-contain remainder (true dups + the fpp sliver)
    *     joins history exactly, so false positives are removed and the
    *     RESULT IS EXACT — the sketch only prunes work, it never decides.
    *
    * 100 TB story: the anti-join's incoming side shrinks from |batch| to
    * |dups| + fpp·|new|, and with that side small AQE broadcasts it, turning
    * the history scan into a map-side semi-prune of just the fingerprint
    * column. The sketch itself is the scale knob: ~1.2 GB of driver/broadcast
    * memory per 10⁹ history fingerprints at 1% fpp — beyond that, raise fpp
    * (the exact verify absorbs it) or skip the sketch and let the plain
    * anti-join path carry the batch (it remains correct, just unpruned).
    *
    * @return incoming rows whose `textCol` content never appears in history.
    */
  def incrementalNewDocs(history: DataFrame, incoming: DataFrame,
      textCol: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame =
    incrementalImpl(history.select(md5(col(textCol)).as("_fp")), incoming,
      textCol, expectedItems, fpp, manage = false)._1

  /** As [[incrementalNewDocs]], plus an explicit `release()` for
    * long-running ingest loops: each side is scanned ONCE (the history
    * fingerprints and the flagged incoming batch are persisted — the
    * might-contain flag is computed a single time per row and the
    * definitely-new / needs-verify split reads the cache), and `release()`
    * unpersists both and releases the Bloom broadcast so per-micro-batch
    * use doesn't accumulate executor storage or broadcasts until the
    * ContextCleaner happens to run. Call `release()` only after the
    * returned frame is fully consumed — the output cannot be recomputed
    * afterwards. The UNmanaged [[incrementalNewDocs]] deliberately persists
    * NOTHING (its only per-call state is the Bloom broadcast, collected by
    * the ContextCleaner once unreferenced): a convenience API must not pin
    * executor storage it gives the caller no way to release.
    */
  def incrementalNewDocsManaged(history: DataFrame, incoming: DataFrame,
      textCol: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): (DataFrame, () => Unit) =
    incrementalImpl(history.select(md5(col(textCol)).as("_fp")), incoming,
      textCol, expectedItems, fpp, manage = true)

  /** As [[incrementalNewDocsManaged]] but against a STORED fingerprint
    * column instead of the history documents themselves: `historyFps` is a
    * one-column frame of md5 content fingerprints (e.g. the corpus pool's
    * persisted `fp` column). The gate then scans one narrow ~32-byte
    * column per batch instead of re-hashing the full landed TEXT — the
    * 100 TB form of the continuous-ingest exact gate. Semantics are
    * identical to the text-derived path whenever `historyFps` really is
    * `md5(text)` of every history row (the writer's contract).
    */
  def incrementalNewDocsFromFpsManaged(historyFps: DataFrame, fpCol: String,
      incoming: DataFrame, textCol: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): (DataFrame, () => Unit) =
    incrementalImpl(historyFps.select(col(fpCol).as("_fp")), incoming,
      textCol, expectedItems, fpp, manage = true)

  /** As [[incrementalNewDocsFromFpsManaged]] with the Bloom filter supplied
    * by the CALLER (retained across micro-batches and `mergeInPlace`-grown
    * with each appended batch's fingerprints — the
    * [[graft.streaming.CorpusIngestSession]] loop): no per-batch sketch
    * build at all, so the only history work left is the exact verify's
    * narrow fp-column anti-join — and when the batch has no might-contain
    * rows, AQE's empty-relation propagation elides even that scan. A stale
    * or saturated filter only admits more rows into the verify (the sketch
    * prunes, the anti-join decides), so retention is a pure cost knob.
    */
  def incrementalNewDocsWithBloomManaged(historyFps: DataFrame, fpCol: String,
      incoming: DataFrame, textCol: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): (DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    val bfBc = incoming.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bfBc.value.mightContainString(s))
    val flagged = incoming.withColumn("_fp", md5(col(textCol)))
      .withColumn("_mc", mightContain(col("_fp")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val definitelyNew = flagged.filter(!col("_mc"))
    val confirmedNew = flagged.filter(col("_mc"))
      .join(historyFps.select(col(fpCol).as("_fp")), Seq("_fp"), "left_anti")
    val out = definitelyNew.unionByName(confirmedNew).drop("_fp", "_mc")
    // unpersist, not destroy: if a consumer's cached partition of `out` is
    // recomputed after release (executor loss evicting the persist), the
    // mightContain UDF re-runs against the broadcast — destroy() would
    // fail that lineage re-execution; unpersist lets the driver re-deliver.
    // Driver retention: unpersist drops executor copies only — the
    // broadcast wrapper stays on the driver until the `bfBc` reference is
    // GC'd (ContextCleaner). Here the wrapped VALUE is the caller's own
    // retained filter (one object per session, re-broadcast per batch), so
    // a long ingest loop accumulates only small wrapper metadata between
    // cleaner passes, never a filter copy per batch.
    (out, () => { flagged.unpersist(blocking = false); bfBc.unpersist(blocking = false) })
  }

  private def incrementalImpl(historyFps: DataFrame, incoming: DataFrame,
      textCol: String, expectedItems: Long, fpp: Double,
      manage: Boolean): (DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    def cached(df: DataFrame): DataFrame =
      if (manage) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    val hFp = cached(historyFps)
    val bf = hFp.stat.bloomFilter("_fp", expectedItems, fpp) // action (caches hFp when managed)
    val bfBc = incoming.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => s != null && bfBc.value.mightContainString(s))
    val flagged = cached(incoming.withColumn("_fp", md5(col(textCol)))
      .withColumn("_mc", mightContain(col("_fp"))))
    val definitelyNew = flagged.filter(!col("_mc"))
    val confirmedNew = flagged.filter(col("_mc"))
      .join(hFp, Seq("_fp"), "left_anti")
    val out = definitelyNew.unionByName(confirmedNew).drop("_fp", "_mc")
    val release = () => {
      if (manage) {
        flagged.unpersist(blocking = false)
        hFp.unpersist(blocking = false)
      }
      // unpersist, not destroy — the lineage-re-execution argument of
      // [[incrementalNewDocsWithBloomManaged]]'s release. Driver
      // retention: THIS path builds a fresh filter per call, and the
      // driver copy lives until the broadcast is GC'd — a tight loop at
      // large expectedItems should prefer the caller-retained-Bloom entry
      // point (one shared filter) over re-deriving here, or destroy()
      // explicitly once the output is durably materialized and no cached
      // consumer partition can need re-derivation.
      bfBc.unpersist(blocking = false)
    }
    (out, release)
  }

  /** Distinct word n-gram shingles: (id, sh). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    rawShingles(df, idCol, textCol, n).distinct()

  /** As [[shingles]] but WITHOUT the distinct — no shuffle, map-only.
    * Correct whenever the consumer is insensitive to within-doc duplicate
    * shingles (e.g. a `min`-based minhash: min over duplicates == min over
    * distinct), or dedups later on a much smaller row set. The distinct in
    * [[shingles]] is a full shuffle of the corpus's shingle stream — the
    * single most expensive step of the text-dedup family at scale — so
    * every consumer that can skip it should.
    */
  def rawShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // The token array is bound as a HOF lambda variable (`transform(array(x),
    // w => …)`), NOT written inline in the per-shingle lambda: an inline
    // `split` would be re-evaluated for EVERY shingle element (HOF lambda
    // bodies are interpreted — no common-subexpression elimination), turning
    // the O(tokens) pass into O(tokens²) per document. Measured 20× on
    // 500-token documents; the lambda binding evaluates the split once per
    // row regardless of what the optimizer collapses around it.
    val grams = flatten(transform(array(split(col(textCol), " ")), w =>
      gramsExpr(w, n)))
    df.select(col(idCol).as("id"), explode(grams).as("sh"))
  }

  /** Word n-grams of a LAMBDA-BOUND token array — the one shared gram
    * construction (rawShingles and minhashSignatureColumn must stay
    * byte-for-byte equivalent: the per-row/aggregation signature identity
    * pinned by OpsSpec depends on it).
    */
  private def gramsExpr(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signatures over md5-string permutations: (id, p, mv).
    * Permutation p's hash of shingle s is md5(p || '|' || s); the signature
    * entry is the lexicographic min — a total order identical in any engine,
    * no numeric hash needed.
    */
  def minhashSignatures(sh: DataFrame, numPerms: Int): DataFrame =
    sh.withColumn("p", explode(sequence(lit(0), lit(numPerms - 1))))
      .groupBy("id", "p")
      .agg(min(md5(concat(col("p"), lit("|"), col("sh")))).as("mv"))

  /** The whole minhash signature as ONE per-row column — bit-identical to
    * [[minhashSignatures]] (same md5(p|shingle) permutation hashes, same
    * lexicographic minima; `array_min` over within-doc duplicate shingles
    * equals the min over distinct ones) but computed entirely inside a
    * projection: no explode, no aggregation, no shuffle. This is the form
    * STREAMING pipelines need (stateless projections compose with
    * watermarked dedup, a groupBy would not) and a per-row alternative
    * wherever the wide-form signature frame is overkill. Cost is
    * O(perms · shingles) per row, the same work the aggregation form does.
    * Arrays are lambda-bound (the rawShingles guard). Returns
    * `array<string>` of length `numPerms`; empty-shingle docs get nulls.
    */
  def minhashSignatureColumn(textCol: Column, n: Int = 3,
      numPerms: Int = 16): Column =
    flatten(transform(array(split(textCol, " ")), w =>
      flatten(transform(array(gramsExpr(w, n)), g =>
        transform(sequence(lit(0), lit(numPerms - 1)),
          p => array_min(transform(g,
            s => md5(concat(p.cast("string"), lit("|"), s)))))))))

  /** 64-bit shingle key for join/count purposes: xxhash64 of the shingle
    * string. Shuffling 8-byte longs instead of ~n·word-length strings
    * roughly halves-to-quarters the exchange volume of the inverted-index
    * family. Collision odds over S distinct shingles are ≈ S²/2⁶⁵
    * (~3e-8 at a billion shingles) — negligible against a 64-bit space,
    * and a collision only merges two shingles' postings (slight overcount),
    * it cannot drop a true pair.
    */
  private def shKey(c: Column): Column = xxhash64(c)

  /** Wide-form minhash signature frame: (id, m0..m{numPerms-1}) — all
    * `numPerms` minhashes as parallel aggregate expressions over the
    * (id, shingle) rows, no permutation explode, so the aggregated row
    * count is the shingle count, not shingles × perms (identical results
    * to the narrow [[minhashSignatures]] form). Built from the RAW shingle
    * stream — min() is insensitive to duplicate shingles, so the usual
    * distinct-shuffle is skipped and the whole signature phase collapses
    * to one partial-aggregating groupBy (shuffle volume = ids × numPerms
    * mins, not the corpus's shingle stream).
    */
  def minhashSignatureFrame(df: DataFrame, idCol: String, textCol: String,
      n: Int, numPerms: Int): DataFrame = {
    val sh = rawShingles(df, idCol, textCol, n)
    val mins = (0 until numPerms).map(p =>
      min(md5(concat(lit(p.toString), lit("|"), col("sh")))).as(s"m$p"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** The signature as a STORABLE column — [[minhashSignatureColumn]] nulled
    * out whole when the document has no shingles (fewer than `n` tokens),
    * so a stored-signature table can filter `sig IS NOT NULL` and recover
    * exactly the row set [[minhashSignatureFrame]] would produce (the frame
    * form emits no row for shingle-less docs; the raw column form would
    * emit an all-null array whose band keys spuriously collide). This is
    * the map-only writer for persisting landed signatures at ingest — the
    * 100 TB evolution where incremental near-dup probes a narrow stored
    * (id, sig) table instead of re-shingling the landed text every batch.
    */
  def storedSignatureColumn(textCol: Column, n: Int = 3,
      numPerms: Int = 16): Column =
    when(size(split(textCol, " ")) >= n,
      minhashSignatureColumn(textCol, n, numPerms))

  /** Wide (id, m0..m{numPerms-1}) signature frame from a STORED array
    * signature column (written by [[storedSignatureColumn]]): null and
    * EMPTY signatures drop — null is [[storedSignatureColumn]]'s
    * shingle-less marker, and the ingest envelope additionally uses empty
    * for shingle-less while reserving null for "no signature written";
    * both mean "not in [[minhashSignatureFrame]]'s row set". A stored
    * array of any OTHER length than `numPerms` fails loudly (it means the
    * probe's `numPerms` disagrees with the writer's, which would
    * otherwise silently null every slot). Bit-identical to recomputing
    * the frame from text (the column/frame signature identity OpsSpec
    * pins), at the cost of one narrow scan.
    */
  def signatureFrameFromStored(df: DataFrame, idCol: String, sigCol: String,
      numPerms: Int): DataFrame = {
    val checked = when(size(col(sigCol)) === numPerms, col(sigCol))
      .otherwise(raise_error(concat(
        lit(s"stored signature length != numPerms=$numPerms: "),
        size(col(sigCol)).cast("string"))))
    df.filter(col(sigCol).isNotNull && size(col(sigCol)) =!= 0)
      .select(col(idCol).as("id") +:
        (0 until numPerms).map(p => element_at(checked, p + 1).as(s"m$p")): _*)
  }

  /** Banded bucket keys of a signature frame: (id, band, bk). Shared with
    * [[SignatureIndex]] (its persisted key tables must be byte-identical to
    * the probe's construction). */
  private[graft] def bandKeys(sig: DataFrame, numPerms: Int, bands: Int): DataFrame = {
    val rows = numPerms / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (b * rows until (b + 1) * rows).map(p => col(s"m$p")): _*)).as("bk"))
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("id"), col("x.band").as("band"), col("x.bk").as("bk"))
  }

  /** Distinct candidate pairs (d1 < d2) of a banded key frame. With
    * `maxBucket` > 0, buckets holding more than that many docs are
    * dropped BEFORE the self-join — the candidate volume is governed by
    * the densest bucket's square (a corpus with K byte-identical copies
    * of one page puts all K in one bucket of every band → K² candidates),
    * and an oversized bucket is exactly the degenerate case exact
    * dedup should have collapsed first: dropping it bounds the join
    * while genuinely-near pairs keep their other bands. The oversized
    * census is one map-side-combined count, ≤ rows/maxBucket rows; the
    * anti-join is left to AQE (broadcast when tiny, as it virtually
    * always is). 0 = exact LSH semantics (the oracle-checked default).
    */
  private def candidatePairs(banded: DataFrame, maxBucket: Int = 0): DataFrame = {
    val kept =
      if (maxBucket <= 0) banded
      else {
        val oversized = banded.groupBy(col("band"), col("bk")).count()
          .filter(col("count") > maxBucket).select("band", "bk")
        banded.join(oversized, Seq("band", "bk"), "left_anti")
      }
    val a = kept.select(col("id").as("d1"), col("band"), col("bk"))
    val b = kept.select(col("id").as("d2"), col("band"), col("bk"))
    a.join(b, Seq("band", "bk")).filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      maxBucket: Int = 0): DataFrame =
    candidatePairs(bandKeys(minhashSignatureFrame(df, idCol, textCol, n, numPerms),
      numPerms, bands), maxBucket)

  /** Incremental NEAR-dup dedup: keep the incoming rows that are not
    * near-duplicates of the landed corpus or of a lower-id row in their own
    * batch — the daily-increment form of [[minhashEstimatePairs]], and the
    * near-dup analog of the Bloom-guarded exact incremental dedup. A new
    * doc drops when a BIPARTITE LSH candidate (new banded keys × landed
    * banded keys — never landed × landed, which is the whole point: the
    * history is probed, not re-paired) or a within-batch candidate against
    * a lower id verifies at signature-estimated Jaccard ≥ `threshold`.
    * Within-batch matching is against all lower-id rows (not only kept
    * ones) — the deterministic one-pass contract shared with the exact
    * incremental path, where transitivity makes it equivalent; for
    * near-dups it is the standard superset-drop approximation.
    *
    * Scale shape: each side collapses to its signature frame (one
    * partial-aggregating groupBy per side; at 100 TB the landed signatures
    * are a stored table — [[minhashSignatureColumn]] is the map-only
    * writer for that — and this function's landed scan is then just that
    * narrow frame); candidates ride banded equi-joins keyed (band, bk);
    * verification joins the tiny candidate list against the two narrow
    * signature frames. The incoming corpus never all-pairs against
    * anything. For ingest loops use [[dedupIncrementalNearManaged]],
    * which caches the twice-referenced signature frames and hands back
    * their release.
    *
    * `maxBucket` guards the WITHIN-BATCH candidate side exactly as the
    * batch family's [[minhashEstimatePairs]] guard does ([[candidatePairs]]):
    * a batch of K near-identical (not byte-identical — those the exact
    * gate collapses) variants of one page lands all K in one bucket of
    * every band and the within-batch self-join goes K². The bipartite
    * (incoming × landed) side is NOT guarded: it is linear in the landed
    * bucket, not quadratic, and dropping landed buckets would silently
    * re-admit near-copies of the corpus's densest page — the one failure
    * mode an ingest gate must not have. 0 (default) = exact LSH semantics.
    */
  def dedupIncrementalNear(incoming: DataFrame, landed: DataFrame,
      idCol: String, textCol: String, n: Int = 3, numPerms: Int = 16,
      bands: Int = 4, threshold: Double = 0.5, maxBucket: Int = 0): DataFrame =
    dedupIncrementalNearImpl(incoming,
      minhashSignatureFrame(landed, idCol, textCol, n, numPerms),
      idCol, textCol, n, numPerms, bands, threshold, manage = false,
      maxBucket)._1

  /** As [[dedupIncrementalNear]] with MANAGED signature caches: both
    * signature frames (each feeds banding AND verification) are persisted,
    * and the returned thunk releases them once the result is consumed —
    * the [[incrementalNewDocsManaged]] contract, for ingest loops that
    * must not leak executor storage batch over batch. The unmanaged form
    * leaves the frames unpersisted (recompute + ReuseExchange — the
    * measured winner for one-shot queries, SCALING.md winnow-reuse pin).
    */
  def dedupIncrementalNearManaged(incoming: DataFrame, landed: DataFrame,
      idCol: String, textCol: String, n: Int = 3, numPerms: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      maxBucket: Int = 0): (DataFrame, () => Unit) =
    dedupIncrementalNearImpl(incoming,
      minhashSignatureFrame(landed, idCol, textCol, n, numPerms),
      idCol, textCol, n, numPerms, bands, threshold, manage = true, maxBucket)

  /** As [[dedupIncrementalNear]] against a PRE-BUILT landed signature frame
    * (id, m0..m{numPerms-1}) — typically [[signatureFrameFromStored]] over
    * the corpus pool's persisted `sig` column. The landed-side cost then
    * collapses from a full text re-shingling (O(landed tokens · perms)
    * every batch) to one narrow column scan — the stored-signature
    * evolution SCALING.md names as the 100 TB ingest form. Results are
    * bit-identical to [[dedupIncrementalNear]] when the stored signatures
    * were written with the same (n, numPerms) (the writer's contract;
    * `numPerms` mismatches fail loudly in [[signatureFrameFromStored]],
    * `n` is unrecoverable from data and must match by construction).
    */
  def dedupIncrementalNearPresigned(incoming: DataFrame, landedSig: DataFrame,
      idCol: String, textCol: String, n: Int = 3, numPerms: Int = 16,
      bands: Int = 4, threshold: Double = 0.5, maxBucket: Int = 0): DataFrame =
    dedupIncrementalNearImpl(incoming, landedSig, idCol, textCol, n, numPerms,
      bands, threshold, manage = false, maxBucket)._1

  /** [[dedupIncrementalNearPresigned]] with managed caches (the
    * [[dedupIncrementalNearManaged]] contract, for ingest loops). */
  def dedupIncrementalNearPresignedManaged(incoming: DataFrame,
      landedSig: DataFrame, idCol: String, textCol: String, n: Int = 3,
      numPerms: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      maxBucket: Int = 0): (DataFrame, () => Unit) =
    dedupIncrementalNearImpl(incoming, landedSig, idCol, textCol, n, numPerms,
      bands, threshold, manage = true, maxBucket)

  /** Production near-dup preset: 128 permutations / 32 bands (4 rows per
    * band). The 16-perm default's estimator granularity is 1/16 — unusable
    * at the ~0.8 thresholds production dedup runs (0.8 sits between 12/16
    * and 13/16); 128 perms give a ~±0.035 standard error at J = 0.8, and
    * 32 bands of 4 rows center the candidate S-curve at (1/32)^(1/4) ≈ 0.42
    * so true 0.8-pairs are caught with near-certainty and the estimator
    * does the cutting. The same preset SCALING.md's recall experiment pins.
    */
  val ProdNumPerms = 128
  val ProdBands = 32
  val ProdThreshold = 0.8

  /** [[dedupIncrementalNear]] at the production preset (128/32/0.8). */
  def dedupIncrementalNearProd(incoming: DataFrame, landed: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame =
    dedupIncrementalNear(incoming, landed, idCol, textCol, n,
      ProdNumPerms, ProdBands, ProdThreshold)

  /** Bipartite near-dup SEARCH: for every query document, the landed
    * documents whose signature-estimated Jaccard is ≥ `threshold` — the
    * reporting twin of [[dedupIncrementalNearPresigned]] (which drops;
    * this one answers "WHICH landed docs does each query match?" — the
    * takedown / contamination / provenance primitive over a signed
    * corpus). `landedSig` is a wide (id, m0..m{numPerms-1}) frame —
    * [[signatureFrameFromStored]] over a corpus pool's `sig` column (a
    * narrow scan; the landed text is never touched) or
    * [[minhashSignatureFrame]] for ad-hoc frames.
    *
    * Scale shape: identical to the incremental probe — the query side
    * collapses to its signature frame, candidates ride the banded
    * equi-join (query bands × landed bands, never landed × landed), and
    * the estimate joins the candidate list against the two narrow frames.
    * A query with no over-threshold match is absent from the output.
    * Output: (d1 = query id, d2 = landed id, est).
    */
  def nearDuplicatesOf(queries: DataFrame, landedSig: DataFrame,
      idCol: String, textCol: String, n: Int = 3, numPerms: Int = 16,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val sIn = minhashSignatureFrame(queries, idCol, textCol, n, numPerms)
    val candLanded = bandKeys(sIn, numPerms, bands)
      .select(col("id").as("d1"), col("band"), col("bk"))
      .join(bandKeys(landedSig, numPerms, bands)
        .select(col("id").as("d2"), col("band"), col("bk")), Seq("band", "bk"))
      .select("d1", "d2").distinct()
    signatureEstimate(candLanded, sIn, landedSig, numPerms, threshold)
  }

  /** The managed probe, additionally handing back the PERSISTED incoming
    * signature frame (id, m0..m{numPerms-1}) so loop callers can reuse it —
    * the ingest session joins it onto the append instead of re-shingling
    * the batch a second time for the stored `sig` column. Valid until the
    * release thunk runs.
    */
  private[graft] def dedupIncrementalNearWithSig(incoming: DataFrame,
      landedSig: DataFrame, idCol: String, textCol: String, n: Int,
      numPerms: Int, bands: Int, threshold: Double,
      maxBucket: Int = 0): (DataFrame, DataFrame, () => Unit) =
    dedupIncrementalNearFull(incoming, landedSig, idCol, textCol, n, numPerms,
      bands, threshold, manage = true, maxBucket)

  /** The incremental near-dup probe against a PERSISTED
    * [[SignatureIndex]] — result-identical to
    * [[dedupIncrementalNearPresigned]] over the same landed rows (the
    * index stores exactly the banded keys and wide signatures that path
    * derives), but the landed side is PARTITION-PRUNED instead of scanned:
    *
    *  1. the batch's band keys yield its distinct (band, pfx) pairs — a
    *     driver collect bounded by `bands * 16^pfxLen` (partition keyspace,
    *     never data) — and the landed KEY read opens only those partitions;
    *  2. the bipartite candidates' distinct id-prefixes (same bound) prune
    *     the landed SIGNATURE read for verification.
    *
    * Per-batch landed cost drops from O(landed signatures) scanned +
    * band-shuffled every batch to O(batch buckets x bucket size) — flat in
    * corpus size at fixed batch size, the last O(corpus)-per-batch term in
    * the ingest loop (SCALING.md signature-index pin). The within-batch
    * side (and its `maxBucket` guard) is unchanged.
    *
    * Returns (kept rows, the persisted incoming signature frame for the
    * caller's append reuse, release thunk) — the
    * [[dedupIncrementalNearWithSig]] contract.
    */
  private[graft] def dedupIncrementalNearIndexed(incoming: DataFrame,
      index: SignatureIndex, idCol: String, textCol: String,
      threshold: Double, maxBucket: Int = 0,
      manage: Boolean = true): (DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    val numPerms = index.numPerms; val bands = index.bands
    def cached(df: DataFrame): DataFrame =
      if (manage) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    val sIn = cached(minhashSignatureFrame(incoming, idCol, textCol, index.n, numPerms))
    val bIn = cached(bandKeys(sIn, numPerms, bands)) // prefixes + probe join + in-batch pairs
    // the two driver collects below are PARTITION-KEYSPACE-bounded (each
    // <= bands * 16^pfxLen distinct rows — metadata, never data) — they
    // are what turns the landed read into explicit pruned subdirectories
    val prefixes = bIn
      .select(col("band"), substring(col("bk"), 1, index.pfxLen).as("pfx"))
      .distinct().collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    val candLanded = cached(
      bIn.select(col("id").as("d1"), col("band"), col("bk"))
        .join(index.prunedKeys(prefixes)
          .select(col("id").as("d2"), col("band"), col("bk")), Seq("band", "bk"))
        .select("d1", "d2").distinct()) // idp collect + verify join
    val idps = candLanded
      .select(SignatureIndex.idPrefix(col("d2"), index.pfxLen).as("idp"))
      .distinct().collect().map(_.getString(0)).toSeq
    val drops = signatureEstimate(candLanded, sIn, index.prunedSigs(idps),
        numPerms, threshold)
      .select(col("d1").as(idCol))
      .unionByName(signatureEstimate(candidatePairs(bIn, maxBucket), sIn, sIn,
          numPerms, threshold)
        .select(col("d2").as(idCol)))
      .distinct()
    val out = incoming.join(drops, Seq(idCol), "left_anti")
    (out, sIn, () => {
      if (manage) {
        candLanded.unpersist(false); bIn.unpersist(false); sIn.unpersist(false)
      }
      ()
    })
  }

  private def dedupIncrementalNearImpl(incoming: DataFrame, landedSig: DataFrame,
      idCol: String, textCol: String, n: Int, numPerms: Int,
      bands: Int, threshold: Double, manage: Boolean,
      maxBucket: Int = 0): (DataFrame, () => Unit) = {
    val (out, _, release) = dedupIncrementalNearFull(incoming, landedSig,
      idCol, textCol, n, numPerms, bands, threshold, manage, maxBucket)
    (out, release)
  }

  private def dedupIncrementalNearFull(incoming: DataFrame, landedSig: DataFrame,
      idCol: String, textCol: String, n: Int, numPerms: Int,
      bands: Int, threshold: Double, manage: Boolean,
      maxBucket: Int = 0): (DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    def cached(df: DataFrame): DataFrame =
      if (manage) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    val sIn = cached(minhashSignatureFrame(incoming, idCol, textCol, n, numPerms))
    val sLd = cached(landedSig)
    val bIn = bandKeys(sIn, numPerms, bands)
    val bLd = bandKeys(sLd, numPerms, bands)
    val candLanded = bIn.select(col("id").as("d1"), col("band"), col("bk"))
      .join(bLd.select(col("id").as("d2"), col("band"), col("bk")), Seq("band", "bk"))
      .select("d1", "d2").distinct()
    val candBatch = candidatePairs(bIn, maxBucket) // d1 < d2: d2 is the later arrival
    val drops = signatureEstimate(candLanded, sIn, sLd, numPerms, threshold)
      .select(col("d1").as(idCol))
      .unionByName(signatureEstimate(candBatch, sIn, sIn, numPerms, threshold)
        .select(col("d2").as(idCol)))
      .distinct()
    val out = incoming.join(drops, Seq(idCol), "left_anti")
    (out, sIn, () => {
      if (manage) { sIn.unpersist(false); sLd.unpersist(false) }
      ()
    })
  }

  /** End-to-end minhash near-dup WITHOUT touching the documents again:
    * LSH candidates are verified by the signature-estimated Jaccard — the
    * fraction of agreeing minhash slots, an unbiased estimator of the true
    * Jaccard (Broder's theorem: P[min agrees] = J). Output: (d1, d2, est)
    * for pairs with est >= threshold.
    *
    * This is the 100 TB shape for similarity-thresholded near-dup: the
    * texts are read ONCE (signature pass); candidate verification joins the
    * candidate pairs (tiny) against the signature frame (one narrow row per
    * doc) twice, instead of re-joining the inverted shingle index the exact
    * [[jaccardPairs]] needs. With numPerms=16 the estimate is coarse
    * (multiples of 1/16 — exactly representable doubles, so results are
    * hash-stable across engines); production near-dup at ~0.8 thresholds
    * typically runs 128 perms for a ~±0.035 std error.
    */
  def minhashEstimatePairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxBucket: Int = 0): DataFrame =
    minhashEstimateImpl(df, idCol, textCol, n, numPerms, bands, threshold,
      manage = false, maxBucket)._1

  /** As [[minhashEstimatePairs]] with a release thunk for loop callers —
    * the signature frame is persisted (it feeds band keys AND both verify
    * sides) and the thunk unpersists it once the result is consumed. The
    * UNMANAGED form persists NOTHING (the [[incrementalNewDocs]] rule: a
    * convenience API must not pin executor storage it gives the caller no
    * way to release) — its three signature references collapse onto one
    * shuffle via ReuseExchange, the same measured-at-floor shape as the
    * winnow family (SCALING.md winnow-reuse pin: the recompute above a
    * reused exchange is cheaper than a cache materialization pass).
    */
  def minhashEstimatePairsManaged(df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxBucket: Int = 0): (DataFrame, () => Unit) =
    minhashEstimateImpl(df, idCol, textCol, n, numPerms, bands, threshold,
      manage = true, maxBucket)

  private def minhashEstimateImpl(df: DataFrame, idCol: String,
      textCol: String, n: Int, numPerms: Int, bands: Int, threshold: Double,
      manage: Boolean, maxBucket: Int = 0): (DataFrame, () => Unit) = {
    val sig0 = minhashSignatureFrame(df, idCol, textCol, n, numPerms)
    val sig = if (manage)
      sig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sig0
    val cand = candidatePairs(bandKeys(sig, numPerms, bands), maxBucket)
    (signatureEstimate(cand, sig, sig, numPerms, threshold),
      () => { if (manage) sig.unpersist(blocking = false); () })
  }

  /** Shared verification of candidate pairs by signature slot agreement —
    * est = agreeing slots / numPerms, Broder's unbiased Jaccard estimator;
    * keeps pairs with est >= threshold. One definition serves the batch
    * ([[minhashEstimatePairs]]) and incremental ([[dedupIncrementalNear]])
    * paths so the estimator and its inclusive cut cannot desynchronize.
    * Output: (d1, d2, est).
    */
  private def signatureEstimate(cand: DataFrame, s1: DataFrame, s2: DataFrame,
      numPerms: Int, threshold: Double): DataFrame = {
    val a = s1.select(col("id").as("d1") +:
      (0 until numPerms).map(p => col(s"m$p").as(s"a$p")): _*)
    val b = s2.select(col("id").as("d2") +:
      (0 until numPerms).map(p => col(s"m$p").as(s"b$p")): _*)
    val agree = (0 until numPerms)
      .map(p => when(col(s"a$p") === col(s"b$p"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(a, Seq("d1")).join(b, Seq("d2"))
      .select(col("d1"), col("d2"), (agree / lit(numPerms.toDouble)).as("est"))
      .filter(col("est") >= threshold)
  }

  /** Deterministic ±1 random-hyperplane matrix for [[embeddingLshPairs]]:
    * component (j, i) is +1 iff the high bit of md5("hp:j:i")'s first byte
    * is 0. Seeded by content, so any engine (and the DuckDB oracle)
    * reproduces the same planes.
    */
  def hyperplanes(bits: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(bits) { j =>
      Array.tabulate(dims) { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hp:$j:$i".getBytes("UTF-8"))
        if ((h(0) & 0x80) == 0) 1.0 else -1.0
      }
    }

  /** Embedding near-dup WITHOUT a blocking column: random-hyperplane LSH
    * (sign-random-projection — the SimHash construction lifted to dense
    * vectors). Each vector gets a `bits`-bit signature (bit j = sign of the
    * dot with hyperplane j); signatures band like the text LSH, candidates
    * sharing a (band, key) bucket are verified with the exact native cosine.
    *
    * This is the label-free scale path `embeddingCosinePairs` can't offer:
    * candidate generation is a map-only signature pass (the `bits` dots run
    * inside the codegen'd `cosine_sim` against literal plane vectors —
    * sign(cos) = sign(dot)) + one equi-join on bucket keys; collision
    * probability per bit is 1 − θ/π, so near-duplicates (θ≈0) collide in
    * every band while unrelated vectors rarely share all `bits/bands` bits
    * of any band. Never all-pairs BY STRUCTURE — but the candidate VOLUME
    * is governed by bucket occupancy: a band has 2^(bits/bands) possible
    * keys, so at corpus size N the densest buckets hold ≳ N·p(key) vectors
    * and the self-join pays the square of that. SIZE THE KEYS TO THE
    * CORPUS: pick bits/bands ≥ log2(N/targetBucket) (the default 16/4 = 16
    * keys per band is a small-corpus/demo setting; a billion-vector corpus
    * wants e.g. bits = 128, bands = 8 → 65k keys per band), and/or set
    * `maxBucket`: buckets holding more than that many vectors are DROPPED
    * from candidate generation before the self-join — the [[jaccardPairs]]
    * `maxDf` discipline for hyperplane buckets. An oversized bucket is
    * low-information by construction (a key shared by a large fraction of
    * the corpus separates nothing); dropping it bounds the join
    * quadratically while near-dup pairs keep `bands` − 1 other chances to
    * collide somewhere selective. 0 = unlimited (exact LSH semantics, the
    * oracle-checked default).
    * Output: (d1, d2, cos) — verified pairs with cosine ≥ threshold.
    */
  def embeddingLshPairs(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, bits: Int = 16, bands: Int = 4,
      threshold: Double = 0.9, maxBucket: Int = 0): DataFrame = {
    require(bits % bands == 0, "bits must divide evenly into bands")
    val rows = bits / bands
    val hp = hyperplanes(bits, dims)
    // bit stays NULL (not 0) when the cosine is null — i.e. when a vector's
    // length doesn't match `dims`. A null bit nulls the whole band key and
    // the row is dropped from banding below: a dims mismatch must NOT
    // default every signature to 0, which would put the entire corpus into
    // one bucket and silently degrade the join to all-pairs.
    val bitCols = (0 until bits).map { j =>
      val plane = typedLit(hp(j).toSeq)
      val c = Similarity.cosine(col(vecCol), plane)
      when(c >= 0, 1).when(c < 0, 0)
    }
    val bandStructs = (0 until bands).map { b =>
      val key = (0 until rows).map(k => bitCols(b * rows + k) * lit(1 << k)).reduce(_ + _)
      struct(lit(b).as("band"), key.as("bk"))
    }
    val allBanded = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        explode(array(bandStructs: _*)).as("x"))
      .select(col("id"), col("v"), col("x.band").as("band"), col("x.bk").as("bk"))
      .filter(col("bk").isNotNull)
    val banded =
      if (maxBucket <= 0) allBanded
      else {
        // the oversized-bucket census is bounded by the KEY SPACE
        // (bands · 2^(bits/bands) rows at most), not the corpus —
        // broadcast-anti-joining it costs one map-side-combined count
        // pass and removes the quadratic corner before it exists
        val oversized = allBanded.groupBy(col("band"), col("bk")).count()
          .filter(col("count") > maxBucket).select("band", "bk")
        allBanded.join(broadcast(oversized), Seq("band", "bk"), "left_anti")
      }
    val a = banded.select(col("id").as("d1"), col("v").as("v1"), col("band"), col("bk"))
    val b = banded.select(col("id").as("d2"), col("v").as("v2"), col("band"), col("bk"))
    a.join(b, Seq("band", "bk")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), Similarity.cosine(col("v1"), col("v2")).as("cos"))
      .distinct() // same pair can collide in several bands
      .filter(col("cos") >= threshold)
  }

  /** Exact n-gram Jaccard pairs via inverted shingle index.
    * `maxDf` drops shingles appearing in more than that many docs — both a
    * skew guard and a noise filter (mirrors stopword removal).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 100): DataFrame = {
    // Every step downstream only joins/counts shingles, never reads them
    // back as text — so hash each to a 64-bit key right after the explode
    // ([[shKey]]) and dedup (id, long) pairs instead of (id, string).
    val sh = rawShingles(df, idCol, textCol, n)
      .select(col("id"), shKey(col("sh")).as("sh")).distinct()
    // doc frequency via partial-aggregating groupBy + semi-join of rare
    // shingles — NOT a window over partitionBy(sh), which would route every
    // occurrence of a hot shingle to one partition (the exact skew maxDf
    // exists to guard against) before the filter could drop it
    val rareKeys = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val rare = sh.join(rareKeys, Seq("sh"), "left_semi")
    val sizes = rare.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = rare.select(col("id").as("d1"), col("sh"))
      .join(rare.select(col("id").as("d2"), col("sh")), Seq("sh"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), Seq("d1"))
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), Seq("d2"))
      .withColumn("jaccard",
        col("inter") * lit(1.0) / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "inter", "jaccard")
  }

  /** Exact Jaccard for GIVEN pairs — the verification half of the
    * recommended 100 TB shape `jaccardForPairs(df, lshCandidatePairs(df))`:
    * candidate generation is sub-quadratic LSH, exactness comes from this
    * pass, whose cost is Σ_pairs |shingles(d1)| — linear in the candidate
    * list, never the inverted index's Σ_shingles df². The shingle sets are
    * first pruned to docs that appear in some pair (semi-join), so the
    * corpus-wide shingle stream is filtered map-side against a (typically
    * broadcastable) id set. Output: (d1, d2, inter, jaccard) for every
    * input pair, including jaccard = 0 when nothing is shared.
    *
    * `pairs` is referenced three times (id pruning, intersection, output
    * join) — pass it MATERIALIZED (`localCheckpoint(true)` / persisted /
    * read back from storage) when it is itself an expensive plan like LSH
    * candidate generation, or that plan executes three times. Candidate
    * lists are small by construction, so materializing them is the cheap
    * side of that trade at any scale.
    */
  def jaccardForPairs(df: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val ids = pairs.select(col("d1").as("id"))
      .unionByName(pairs.select(col("d2").as("id"))).distinct()
    val sh = rawShingles(df, idCol, textCol, n)
      .join(ids, Seq("id"), "left_semi")
      .select(col("id"), shKey(col("sh")).as("sh")).distinct()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.select(col("id").as("d1"), col("sh")), Seq("d1"))
      .join(sh.select(col("id").as("d2"), col("sh")), Seq("d2", "sh"), "left_semi")
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    // sizes joins are LEFT (size 0 when a doc has no shingles — shorter than
    // n tokens or null text) so every input pair really is reported; two
    // empty sets score 0.0 by convention rather than dividing by zero
    pairs
      .join(inter, Seq("d1", "d2"), "left")
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), Seq("d1"), "left")
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), Seq("d2"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("_union",
        coalesce(col("sz1"), lit(0L)) + coalesce(col("sz2"), lit(0L)) - col("inter"))
      .select(col("d1"), col("d2"), col("inter"),
        when(col("_union") > 0, col("inter") * lit(1.0) / col("_union"))
          .otherwise(lit(0.0)).as("jaccard"))
  }

  /** Near-duplicate candidates from shared winnowing fingerprints
    * ([[TextOps.winnowFingerprints]] — SIGMOD 2003 §3): two documents pair
    * when they share ≥ `minShared` selected gram hashes; `overlap` is the
    * containment ratio shared / min(|fps₁|, |fps₂|) (a single integer
    * division — bit-deterministic). Winnowing's guarantee makes this a
    * LOCAL near-dup detector: any common run of ≥ `w + k − 1` tokens
    * forces a shared fingerprint, so long verbatim overlaps can't hide,
    * unlike MinHash whose global sampling can miss a contained passage.
    *
    * Scale shape — the same inverted-index discipline as [[jaccardPairs]],
    * but over the ~1/w-winnowed fingerprint stream (w× less data into the
    * index than shingle-level joins):
    *  1. map-only fingerprint selection (no explode until after winnowing);
    *  2. document frequency by partial-aggregating groupBy, then a
    *     semi-join keeps fingerprints with df ≤ `maxDf` — the skew guard
    *     that drops boilerplate before any hot key can concentrate;
    *  3. the self-join emits Σ df² pairs over RARE fingerprints only,
    *     never all-pairs.
    */
  def winnowCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, maxDf: Int = 100, minShared: Int = 2): DataFrame = {
    // the winnowed stream feeds four subtrees (df counts, sizes, both join
    // sides) UNPERSISTED: AQE's ReuseExchange collapses them at runtime, and
    // a persist here measures SLOWER (SCALING.md r10 winnow-reuse pin: the
    // cache materialization costs more than the re-collapsed compute).
    // The SELECTED fingerprints (md5 hex — the selection hash is the
    // oracle contract) are narrowed to 64-bit keys right after the
    // explode ([[shKey]], the jaccardPairs discipline): everything
    // downstream only groups/joins/counts them, never reads them back, so
    // an 8-byte long replaces a 32-char string in every exchange of the
    // inverted index — same §2.3 narrower-types move, same collision
    // argument (a collision merges two fingerprints' postings; ~S²/2⁶⁵).
    val fps = graft.ops.TextOps.winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), explode(col("fps")).as("_fp"))
      .select(col("id"), shKey(col("_fp")).as("fp"))
    val rareKeys = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val rare = fps.join(rareKeys, Seq("fp"), "left_semi")
    val sizes = rare.groupBy("id").agg(count(lit(1)).as("sz"))
    rare.select(col("id").as("d1"), col("fp"))
      .join(rare.select(col("id").as("d2"), col("fp")), Seq("fp"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), Seq("d1"))
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("shared"),
        (col("shared") * lit(1.0) / least(col("sz1"), col("sz2"))).as("overlap"))
  }

  /** Passage containment via winnowing fingerprints: for every document in
    * `queries` (an eval benchmark, a licensed corpus, a takedown list),
    * find the `corpus` documents sharing ≥ `minShared` selected gram
    * hashes, with `containment` = shared / |query fingerprints|. The
    * winnowing guarantee makes this the LOCAL form of benchmark
    * decontamination ([[graft.ops.Curate.contamination]] is the n-gram
    * variant): any verbatim overlap of ≥ `w + k − 1` tokens between a
    * query doc and a corpus doc forces at least one shared fingerprint, so
    * a contained passage cannot hide even when the surrounding document
    * differs entirely.
    *
    * Scale shape: both fingerprint streams are map-only ([[TextOps.
    * winnowFingerprints]]); the corpus stream hash-joins directly against
    * the query stream — which is benchmark-sized, so AQE broadcasts it and
    * the corpus side never shuffles (non-matching corpus fingerprints die
    * map-side in the broadcast probe). Cost is one winnowed pass over the
    * corpus, ~1/w of the gram stream; join output is exactly the true
    * matches. A fingerprint contaminated into millions of corpus docs
    * produces that many match rows — which IS the answer — and AQE's skew
    * handling spreads the hot key. `maxDf` (default unlimited) is an
    * explicit opt-out for query sets that themselves contain web
    * boilerplate: capping drops corpus fingerprints above that document
    * frequency and with them the hit guarantee for passages more
    * widespread than the cap — leave it unlimited for decontamination,
    * where the most-duplicated passage is precisely the one that matters.
    */
  def winnowContainment(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int = 3, w: Int = 4, maxDf: Int = Int.MaxValue,
      minShared: Int = 1): DataFrame = {
    // fingerprints narrowed to 64-bit keys after selection (the
    // winnowCandidatePairs note): the corpus↔query match is pure key
    // equality, and the corpus-side stream is the big one at scale
    val cfp = graft.ops.TextOps.winnowFingerprints(corpus, idCol, textCol, k, w)
      .select(col(idCol).as("did"), explode(col("fps")).as("_fp"))
      .select(col("did"), shKey(col("_fp")).as("fp"))
    val qf = graft.ops.TextOps.winnowFingerprints(queries, idCol, textCol, k, w)
    val qfp = qf.select(col(idCol).as("qid"), explode(col("fps")).as("_fp"))
      .select(col("qid"), shKey(col("_fp")).as("fp"))
    val qsizes = qf.select(col(idCol).as("qid"), size(col("fps")).as("qsz"))
    val capped =
      if (maxDf == Int.MaxValue) cfp
      else cfp.join(
        cfp.groupBy("fp").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("fp"),
        Seq("fp"), "left_semi")
    capped
      .join(qfp, Seq("fp"))
      .groupBy("qid", "did").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(qsizes, Seq("qid"))
      .select(col("qid"), col("did"), col("shared"),
        (col("shared") * lit(1.0) / col("qsz")).as("containment"))
  }

  /** 16-bit SimHash per document over distinct word tokens. Bit b of a
    * token's hash comes from the first 4 hex chars of its md5; the simhash
    * bit is the sign of the ±1 token votes — all integer arithmetic, so
    * engine-portable.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .distinct()
      .withColumn("h", substring(md5(col("tok")), 1, 4))
    val votes: Seq[Column] = (0 until 16).map { b =>
      val hexChar = s"substr(h, ${1 + b / 4}, 1)"
      val bit = s"(shiftright(instr('0123456789abcdef', $hexChar) - 1, ${3 - b % 4}) & 1)"
      sum(expr(s"2 * $bit - 1")).as(s"s$b")
    }
    val sums = toks.groupBy("id").agg(votes.head, votes.tail: _*)
    val value = (0 until 16)
      .map(b => when(col(s"s$b") > 0, lit(1 << b)).otherwise(lit(0)))
      .reduce(_ + _)
    sums.select(col("id"), value.as("simhash"))
  }

  /** Canonical-id assignment from candidate pairs: every doc in a connected
    * duplicate component maps to the component's minimum id (the kept copy).
    *
    * Min-label propagation with pointer jumping, iterated to fixpoint: each
    * round every node takes the min of its own label and its neighbors'
    * labels (one hop), then follows its label to that node's label
    * (`canonical ← canonical(canonical)`, the pointer-jump), which doubles
    * the distance already covered — so convergence is O(log diameter), not
    * O(diameter). Cliques (what LSH/exact emit) converge in one round;
    * maxRounds=20 covers any component a real corpus can produce
    * (diameter ≈ 2^20 after jumps). Convergence is a cheap fixpoint PROBE
    * (does any edge still join two different labels?) run before each
    * round after the first — so reaching fixpoint costs the rounds that do
    * work plus one probe, not a full extra round whose only purpose is to
    * observe zero change; labels stay distributed, and each round's result
    * is `localCheckpoint`ed eagerly — and the PREVIOUS round's blocks
    * released — so executor storage stays one label frame deep no matter
    * the round count. The checkpoint (not a plain persist) is load-bearing:
    * each round references the previous labels twice and the hop result
    * twice, so the LOGICAL plan would QUADRUPLE per round, and Catalyst
    * re-analyzes the whole tree before cache substitution kicks in —
    * measured 4 s → 25 s per round by round 1 at sf0.1 under persist, pure
    * driver-side planning (the kmeans loop hit the same wall and made the
    * same call; an executor loss now recomputes from the checkpointed
    * blocks' RDD lineage within the run, or the caller reruns — the price
    * of constant-size plans). The returned frame stays checkpointed
    * (callers running in a loop may `unpersist()` it once consumed).
    * Docs in no pair keep their own id. If the round budget is exhausted
    * before fixpoint (pathological topology), this THROWS rather than
    * silently returning partially-propagated labels.
    */
  def canonicalIds(df: DataFrame, idCol: String, pairs: DataFrame,
      maxRounds: Int = 20): DataFrame = {
    // symmetrize with a map-side explode, NOT a self-union: a union would
    // evaluate the pair-generator subtree (often an expensive Jaccard /
    // LSH plan) twice when this cache materializes
    // localCheckpoint, not persist: the base lineage (often a full LSH /
    // Jaccard candidate plan) would otherwise be re-analyzed inside every
    // round's exponentially-growing tree (see scaladoc)
    val edges = pairs.select(explode(array(
        struct(col("d1").as("id"), col("d2").as("nb")),
        struct(col("d2").as("id"), col("d1").as("nb")))).as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"))
      .localCheckpoint(true)
    // initial labels are checkpointed too: round 0 references them three
    // times (probe is skipped but hop joins + union), which would otherwise
    // re-analyze the caller's member-derivation plan (often the same LSH /
    // Jaccard tree as the edges) that many more times
    var labels = df.select(col(idCol).as("id"), col(idCol).as("canonical"))
      .localCheckpoint(true)
    // seed prevRound with the initial labels so round 0's swap releases them
    var prevRound: Option[DataFrame] = Some(labels)
    var round = 0
    var converged = false
    // Fixpoint probe: labels are final iff no edge joins two DIFFERENT
    // labels (uniform labels are their own roots — propagation only carries
    // member ids, so the uniform label is the component min whose own label
    // is itself). Two cache-read joins and a short-circuit take(1) — far
    // cheaper than materializing a full extra round just to observe zero
    // change, which is what a change-count convergence test costs.
    def atFixpoint(): Boolean = edges
      .join(labels.select(col("id"), col("canonical").as("ca")), Seq("id"))
      .join(labels.select(col("id").as("nb"), col("canonical").as("cb")), Seq("nb"))
      .filter(col("ca") =!= col("cb")).isEmpty
    while (round < maxRounds && !converged) {
      converged = round > 0 && atFixpoint()
      if (!converged) {
        // One-hop min: each node's own label and its neighbors' labels flow
        // into a single min aggregate (a union of two cache reads — cheaper
        // than the groupBy + left-join-back formulation by one join per round)
        val hopped = edges
          .join(labels.select(col("id").as("nb"), col("canonical").as("nbc")), Seq("nb"))
          .select(col("id"), col("nbc").as("canonical"))
          .unionByName(labels)
          .groupBy("id").agg(min("canonical").as("canonical"))
        // Pointer jump: labels always point at real node ids (mins of ids),
        // so re-join the label set onto itself to skip to the label's own
        // label. Invariant canonical(x) <= x makes this monotone — it can
        // only lower. The round is persisted and FULLY materialized before
        // the previous round's cache is released, keeping executor storage
        // one frame deep.
        // eager localCheckpoint: materializes every partition AND truncates
        // the plan to a leaf before the next round builds on it
        val next = hopped
          .join(hopped.select(col("id").as("canonical"), col("canonical").as("cc")),
            Seq("canonical"), "left")
          .select(col("id"),
            least(col("canonical"), coalesce(col("cc"), col("canonical"))).as("canonical"))
          .localCheckpoint(true)
        // Dataset.unpersist is a no-op on checkpointed frames (blocks live
        // outside the CacheManager) — release the underlying RDD instead
        prevRound.foreach(
          org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint)
        prevRound = Some(next)
        labels = next
        round += 1
      }
    }
    // budget exhausted without an in-loop probe hit — one last probe decides
    if (!converged) converged = atFixpoint()
    org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(edges)
    if (!converged)
      throw new IllegalStateException(
        s"canonicalIds did not converge within $maxRounds rounds; " +
          "raise maxRounds (components of diameter > 2^rounds are pathological)")
    labels
  }

  /** Embedding near-dup pairs: cosine >= threshold, blocked by `blockCol`
    * so the pairwise join is bounded per block (use a cluster/LSH bucket id
    * at scale — never all-pairs).
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("d1"), col(blockCol).as("blk"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("d2"), col(blockCol).as("blk"), col(vecCol).as("vb"))
    a.join(b, Seq("blk")).filter(col("d1") < col("d2"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= threshold)
      .select("d1", "d2")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic near-dup removal
    * by k-means clustering + within-cluster cosine pruning. Cells bound the
    * pairwise work exactly like LSH buckets do — K cells turn the O(n²)
    * cosine matrix into K·(n/K)², so K scales with the corpus (cells of
    * ~1k vectors at production scale; kmeans itself is fully distributed
    * and the centroid set is metadata-scale).
    *
    * Prune rule: drop every vector with an over-threshold neighbor of
    * SMALLER id in its cell. One parallel pass, deterministic on any
    * engine. (The paper's sequential keep-set scan is order-dependent; the
    * transitive-closure alternative is [[canonicalIds]] over
    * [[embeddingCosinePairs]].) Returns the surviving corpus rows.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double,
      seedByHash: Boolean = true, roundDigits: Int = 9): DataFrame = {
    val cents = Similarity.kmeans(corpus, idCol, vecCol, k, iters,
      seedByHash, roundDigits)
      .select(col("centroid_id").as(idCol), col(vecCol))
    val assigned = Similarity.ivfAssign(corpus, cents, idCol, vecCol)
    val dropIds = embeddingCosinePairs(assigned, idCol, vecCol,
      "centroid_id", threshold)
      .select(col("d2").as(idCol)).distinct()
    corpus.join(dropIds, Seq(idCol), "left_anti")
  }

  /** Exact duplicated-span coverage — the corpus-wide "this exact run of
    * text is repeated" signal of exact-substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"),
    * re-expressed for a shared-nothing engine: the paper's suffix array is
    * inherently sequential, but hashing every k-token window (stride 1 in
    * token space, so alignment never matters) finds exactly the duplicated
    * runs of >= k tokens with one map-side explode and one hash-keyed
    * count — both embarrassingly parallel, no all-pairs anywhere.
    *
    * Per document: `windows` (number of k-token windows), `dup_windows`
    * (windows whose span occurs more than once corpus-wide — including a
    * second time inside the same document: self-repetition is duplication
    * for training-data purposes). Coverage ratio = dup_windows/windows is
    * left to the caller (integer outputs keep oracle comparison exact).
    *
    * Scale shape: the exploded frame is one 8-byte xxhash64 per token —
    * O(corpus tokens) rows, never materialized wider than (id, hash); the
    * occurrence count is a map-combinable agg on the hash; the join back is
    * hash-keyed. Hash collisions (~#windows^2 / 2^64) can overcount one
    * window — the same trade the minhash family already makes.
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, "window length k must be >= 1")
    val base = spanBase(df, idCol, textCol, k)
    val grams = spanGrams(base, k).drop("i")
    val dupSpans = grams.groupBy("h").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
    val dupPerDoc = grams.join(dupSpans.select("h"), Seq("h"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("dup_windows"))
    base.select(col("id"), col("nw").as("windows"))
      .join(dupPerDoc, Seq("id"), "left")
      .select(col("id"), col("windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
  }

  // (id, t: tokens, nw: window count) — tokenization matches TextOps
  // (single-space split, the corpus contract)
  private def spanBase(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
      .withColumn("nw", greatest(size(col("t")) - (k - 1), lit(0)).cast("long"))

  // one row per k-token window: (id, i: 1-based start, h: xxhash64 of the
  // space-joined window). sequence(0, n) runs DESCENDING when n < 0 —
  // guard short docs to an empty window list instead
  private def spanGrams(base: DataFrame, k: Int): DataFrame =
    // `t` rides in as a lambda binding (same guard as rawShingles): if the
    // optimizer ever collapses base's split-projection into this Generate,
    // an inline alias would re-split the text once per window
    base.select(col("id"), explode(flatten(transform(array(col("t")), t =>
        when(col("nw") > 0,
          transform(sequence(lit(1), col("nw")),
            i => struct(i.as("i"),
              xxhash64(concat_ws(" ", slice(t, i, lit(k)))).as("h"))))
          .otherwise(array().cast("array<struct<i:long,h:bigint>>"))))).as("w"))
      .select(col("id"), col("w.i").as("i"), col("w.h").as("h"))

  /** The cut step of exact-substring dedup (Lee et al. 2022 §"we remove all
    * but one of the occurrences"): rewrite each document with every token
    * covered by a corpus-duplicated >= k-token run removed, keeping the
    * globally first occurrence (minimum (id, position)) of each span when
    * `keepFirst` — set it false to cut every copy including the first.
    *
    * Same scale shape as [[duplicatedSpans]] — explode, one hash-keyed
    * aggregate (count + min-(id,pos), both map-combinable), hash join back,
    * then a per-doc `collect_list` of flagged starts (bounded by the doc's
    * own token count) and a map-side HOF rebuild (`filter`/`exists` over
    * the starts array). No windows, no all-pairs; documents whose spans are
    * all unique pass through untouched via the left join's null arm.
    *
    * Output: (id, text_clean).
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, keepFirst: Boolean = true): DataFrame = {
    require(k >= 1, "window length k must be >= 1")
    val base = spanBase(df, idCol, textCol, k)
    val grams = spanGrams(base, k)
    val dup = grams.groupBy("h")
      .agg(count(lit(1)).as("occ"),
        min(struct(col("id"), col("i"))).as("first"))
      .filter(col("occ") > 1)
    val flagged = grams.join(dup.select("h", "first"), Seq("h"))
      .filter(if (keepFirst) struct(col("id"), col("i")) =!= col("first")
              else lit(true))
    val starts = flagged.groupBy("id")
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    cutSpans(base, starts, k)
  }

  // rebuild each doc from its token array with every position covered by a
  // flagged k-window start removed — the shared cut step of the span
  // removers (map-side HOF over the per-doc starts array, no explode)
  private def cutSpans(base: DataFrame, starts: DataFrame, k: Int): DataFrame =
    base.join(starts, Seq("id"), "left")
      .select(col("id"),
        when(col("starts").isNull, concat_ws(" ", col("t")))
          .otherwise(concat_ws(" ",
            transform(
              filter(sequence(lit(1), size(col("t")).cast("long")),
                j => !exists(col("starts"), s => s <= j && j < s + k)),
              j => element_at(col("t"), j.cast("int")))))
          .as("text_clean"))

  /** Span-level DECONTAMINATION — the surgical sibling of the document
    * contamination GATE: rewrite each corpus document with every token
    * covered by a k-token window appearing VERBATIM in `queries` (an eval
    * benchmark, a canary set) removed. The document survives; the leaked
    * passage does not — at pretraining scale dropping every doc that
    * quotes a benchmark question forfeits real data, while this cuts
    * exactly the overlap ([[removeDuplicatedSpans]]' machinery pointed at
    * a bipartite probe).
    *
    * Scale: the probe side is the eval set's k-gram hash SET —
    * benchmark-scale by contract — broadcast into the corpus gram stream,
    * so the corpus never shuffles for the probe; the only corpus-keyed
    * aggregation is the per-doc flagged-starts collect (bounded by doc
    * window count), and the rebuild is map-side. Same xxhash64 2^-64
    * collision convention as [[duplicatedSpans]].
    */
  def removeContaminatedSpans(df: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int = 8): DataFrame = {
    require(k >= 1, "window length k must be >= 1")
    val base = spanBase(df, idCol, textCol, k)
    val evalHashes = spanGrams(spanBase(queries, idCol, textCol, k), k)
      .select("h").distinct()
    val flagged = spanGrams(base, k).join(broadcast(evalHashes), Seq("h"))
    val starts = flagged.groupBy("id")
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    cutSpans(base, starts, k)
  }

  /** Collapse duplicate clusters to one representative: given duplicate
    * pairs (d1, d2), connected components via [[canonicalIds]], keep each
    * cluster's minimum-id row. Returns the surviving rows of `df` with ALL
    * original columns; singletons pass through untouched.
    *
    * Scale: the components run is the pointer-jumped O(log diameter) loop;
    * the keep step is one id-keyed semi-join (survivor ids are the same
    * cardinality class as `df`, so it shuffles — correctly — on the id).
    */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame,
      maxRounds: Int = 20): DataFrame = {
    // Components run over PAIR MEMBERS only — at real duplication rates the
    // member set is a small fraction of the corpus, so the label rounds
    // never carry singleton rows. Survivors = corpus minus non-minimum
    // members, one anti-join. `pairs` is persisted across its two uses
    // (member list + edges) and released once the eager components run has
    // consumed it; the returned frame reads the persisted final labels,
    // falling back to full lineage on eviction.
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // materialize BEFORE the rounds: the first round job reads p from two
      // subtrees (member list + edges) — on a cold cache both would race to
      // evaluate the pair-generator plan; this count pins exactly one run
      p.count()
      val members = p.select(explode(array(col("d1"), col("d2"))).as("id")).distinct()
      val canon = canonicalIds(members, "id", p, maxRounds)
      val drops = canon.filter(col("canonical") =!= col("id"))
        .select(col("id").as(idCol))
      df.join(drops, Seq(idCol), "left_anti")
    } finally p.unpersist(blocking = false)
  }

  /** As [[keepCanonical]] but with a CHOSEN representative: per connected
    * component, keep the member with the highest `scoreCol` (ties → lowest
    * id; null scores sort last) — the keep-longest / keep-highest-quality
    * dedup policy, where the cluster's best document survives instead of
    * its arbitrary lowest id. Singletons pass through untouched.
    *
    * Scale: identical to [[keepCanonical]] — components over pair members
    * only, plus ONE extra member-cardinality aggregation (the per-cluster
    * arg-max via a struct-min, no window over the corpus) and the same
    * id-keyed anti-join.
    */
  def keepBestBy(df: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: Column, maxRounds: Int = 20): DataFrame = {
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      p.count() // pin one evaluation of the pair-generator plan (see keepCanonical)
      val members = p.select(explode(array(col("d1"), col("d2"))).as("id")).distinct()
      val canon = canonicalIds(members, "id", p, maxRounds)
      val scored = canon.join(
        df.select(col(idCol).as("id"),
          coalesce(scoreCol.cast("double"), lit(Double.MinValue)).as("_s")),
        Seq("id"))
      // arg-max by (score desc, id asc) as a struct-min over (−score, id):
      // one map-combinable aggregation, never a window over the corpus
      val winners = scored.groupBy("canonical")
        .agg(min(struct((-col("_s")).as("ns"), col("id").as("id"))).as("w"))
        .select(col("w.id").as(idCol))
      val drops = canon.select(col("id").as(idCol))
        .join(winners, Seq(idCol), "left_anti")
      df.join(drops, Seq(idCol), "left_anti")
    } finally p.unpersist(blocking = false)
  }

  /** End-to-end exact-verified near-dup corpus dedup in one call:
    * inverted-index n-gram Jaccard pairs ([[jaccardPairs]], maxDf skew
    * guard) → connected components → minimum-id representative per cluster
    * ([[keepCanonical]]). Output: the cleaned corpus, all original columns.
    *
    * This is the moderate-scale shape (the inverted index pays Σ df² per
    * shingle under maxDf). At 100 TB use [[dedupCorpusLsh]], which swaps
    * the pair generator for LSH candidates + exact verification.
    */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 100,
      maxRounds: Int = 20): DataFrame =
    keepCanonical(df, idCol,
      jaccardPairs(df, idCol, textCol, n, threshold, maxDf).select("d1", "d2"),
      maxRounds)

  /** The 100 TB-scale end-to-end corpus dedup: LSH candidate generation
    * (sub-quadratic, [[lshCandidatePairs]]) + exact-Jaccard verification
    * ([[jaccardForPairs]], linear in candidates) + connected components +
    * keep-minimum-id ([[keepCanonical]]). Exactness caveat vs
    * [[dedupCorpus]]: only pairs LSH surfaces are verified, so recall is
    * governed by the (numPerms, bands) S-curve; scores and survivors are
    * exact w.r.t. the candidate set.
    *
    * Candidates are persisted for the duration of the components run
    * (they are referenced three times by the verifier and twice by the
    * edge build) and released before returning; the returned frame reads
    * the (persisted) final label round, falling back to full lineage on
    * eviction.
    */
  def dedupCorpusLsh(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxRounds: Int = 20,
      maxBucket: Int = 0): DataFrame = {
    // localCheckpoint (eager), not persist: the verifier references the
    // candidate frame three times and the component loop again — with a
    // plain persist each reference re-ANALYZES the full LSH plan even
    // though execution reads the cache; the checkpoint makes every
    // downstream plan see a leaf
    val cand = lshCandidatePairs(df, idCol, textCol, n, numPerms, bands, maxBucket)
      .localCheckpoint(true)
    try {
      val verified = jaccardForPairs(df, cand, idCol, textCol, n)
        .filter(col("jaccard") >= threshold).select("d1", "d2")
      // keepCanonical materializes the components eagerly (per-round
      // count()s), so the candidate cache is fully consumed on return
      keepCanonical(df, idCol, verified, maxRounds)
    } finally org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(cand)
  }

  /** Pairwise shingle-Jaccard overlap between corpus strata (sources,
    * crawls, snapshots): for every pair of `groupCol` values, the Jaccard
    * similarity of their distinct word-n-gram sets — the corpus-analytics
    * view behind mixing decisions ("is this new crawl mostly a re-crawl?")
    * and cross-source dedup prioritization.
    *
    * Scale shape: one distinct over (group, shingle), then ONE aggregation
    * per shingle collecting its (small, ≤ #groups) group set; pairs explode
    * from each shingle's own group set — bounded by #groups² per shingle,
    * never a corpus×corpus join. Sizes and intersections are map-side
    * combinable counts; with G groups the output is AT MOST G·(G−1)/2 rows
    * however large the corpus — pairs sharing no shingle are absent (treat
    * a missing pair as jaccard 0 when pivoting to a full matrix).
    * Output: (g1, g2, inter, jaccard), g1 < g2, inter ≥ 1.
    */
  def groupOverlap(df: DataFrame, groupCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = rawShingles(df, groupCol, textCol, n)
      .select(col("id").as("g"), shKey(col("sh")).as("sh")).distinct()
    val sizes = sh.groupBy("g").agg(count(lit(1)).as("sz"))
    val pairs = sh.groupBy("sh")
      .agg(array_sort(collect_set(col("g"))).as("gs"))
      .select(explode(flatten(transform(col("gs"), a =>
        transform(filter(col("gs"), b => b > a),
          b => struct(a.as("g1"), b.as("g2")))))).as("p"))
      .select(col("p.g1").as("g1"), col("p.g2").as("g2"))
      .groupBy("g1", "g2").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("g").as("g1"), col("sz").as("sz1")), Seq("g1"))
      .join(sizes.select(col("g").as("g2"), col("sz").as("sz2")), Seq("g2"))
      .select(col("g1"), col("g2"), col("inter"),
        (col("inter") * lit(1.0) / (col("sz1") + col("sz2") - col("inter")))
          .as("jaccard"))
  }

  /** Paragraph-level boilerplate removal — [[removeRepeatedLines]] at the
    * CCNet working unit: drop every paragraph (blank-line-run separated,
    * trimmed, per [[TextOps.paragraphs]]) occurring ≥ `minCount` times
    * corpus-wide and rebuild each document from its surviving paragraphs
    * in order, joined by a blank line. Lines catch single-line template
    * chrome; paragraphs catch multi-line blocks (cookie banners, footers,
    * license headers) that line counting fragments.
    *
    * Same scale shape as the line form: one segmentation explode, one
    * map-combinable paragraph count, a hash join back, one id-keyed
    * ordered rebuild bounded by the doc's own paragraph count. Every input
    * doc appears in the output (left join; all-boilerplate docs come back
    * empty). Output: (idCol, text_clean, n_kept, n_dropped).
    */
  def removeRepeatedParagraphs(df: DataFrame, idCol: String, textCol: String,
      minCount: Int): DataFrame = {
    val paras = graft.ops.TextOps.paragraphs(df, idCol, textCol)
    val counts = paras.groupBy("paragraph").agg(count(lit(1)).as("_n"))
    val rebuilt = paras.join(counts, Seq("paragraph"))
      .withColumn("_keep", col("_n") < minCount)
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("_keep"),
              struct(col("par_idx"), col("paragraph"))))),
            x => x.getField("paragraph")),
          "\n\n").as("text_clean"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_dropped"))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Line-level boilerplate removal (the CCNet/C4 move: "Subscribe to our
    * newsletter", cookie banners, nav menus repeat verbatim across a crawl):
    * drop every line that occurs at least `minCount` times corpus-wide and
    * rebuild each document from its surviving lines in order. The line-level
    * sibling of [[removeDuplicatedSpans]] — spans catch long shared
    * passages, this catches short template lines whole documents share.
    *
    * Scale shape: one line explode, one line-keyed count (map-side
    * combinable — the shuffle carries one row per distinct line per
    * partition), a hash join back (hot boilerplate lines are one row on the
    * counts side, so no skew amplification), and one id-keyed rebuild whose
    * `collect_list` is bounded by the doc's own line count. No windows, no
    * all-pairs. The join keys on the raw line text so results are exact;
    * pre-hashing lines (md5/xxhash) is the exchange-volume knob at 100 TB,
    * at the price of cross-line hash-collision conflation.
    *
    * Output: (id, text_clean, n_kept, n_dropped) — every input doc appears,
    * even when all of its lines were boilerplate (empty text_clean).
    */
  def removeRepeatedLines(df: DataFrame, idCol: String, textCol: String,
      minCount: Int, sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
    val counts = lines.groupBy("line").agg(count(lit(1)).as("_n"))
    lines.join(counts, Seq("line"))
      .withColumn("_keep", col("_n") < minCount)
      .groupBy("id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("_keep"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          sep).as("text_clean"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_dropped"))
  }
}
