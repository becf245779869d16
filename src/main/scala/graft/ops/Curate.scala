package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling, per-stratum rates, per-group caps, and sequence packing.
  *
  * Everything here is a narrow, shuffle-conscious DataFrame transform:
  *
  *  - Sampling is HASH-based, not `df.sample`: `md5(key)` compared against a
  *    hex threshold. Deterministic across runs, engines, partitionings, and
  *    cluster sizes (a re-run of a 100 TB job selects the same rows), and it
  *    pushes down as a plain filter — no RNG state per partition.
  *  - Stratified sampling is the same filter with a per-stratum threshold
  *    looked up via a CASE expression — one scan, no per-stratum jobs.
  *  - Per-group caps use a rank window; groups are the parallelism unit.
  *  - Packing (grouping documents into ~budget-token training sequences)
  *    fills contiguously in key order WITHIN a shard, so shards pack in
  *    parallel — the global-greedy alternative is inherently sequential and
  *    no better for training purposes.
  */
object Curate {

  /** Hex comparison threshold selecting ~`fraction` of uniform md5 space:
    * the first 8 hex chars of fraction × 16^8 (md5 strings below it are
    * "selected"). 32-bit resolution ≈ 2.3e-10 granularity.
    */
  def sampleThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val scaled = math.min((fraction * 4294967296.0).toLong, 4294967295L)
    f"$scaled%08x"
  }

  /** The family's shared selector: `md5(salt || key)` as a lowercase hex
    * string, compared against 8-hex-char thresholds.
    */
  private def md5Key(keyCol: Column, salt: String): Column =
    md5(concat(lit(salt), keyCol.cast("string")))

  /** Uniform deterministic sample: keep rows whose `md5(salt || key)` falls
    * below the fraction threshold. Same (key, salt, fraction) → same rows,
    * on any engine and at any scale; changing `salt` draws an independent
    * sample (e.g. for held-out splits).
    */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(md5Key(keyCol, salt) < lit(sampleThreshold(fraction)))

  /** Weighted deterministic sample: each row's keep-probability is its own
    * `weightCol` (clamped to [0,1]) — the data-mixing primitive behind
    * quality-weighted corpus construction ("keep high-quality docs with
    * p≈1, boilerplate with p≈0.1"). Same md5-space trick as [[hashSample]]
    * with a per-row threshold: deterministic on any engine/cluster/rerun,
    * one scan, no shuffle, no RNG state. Weights >= 1.0 short-circuit to
    * always-keep (the 32-bit threshold caps at 'ffffffff', so the strict-<
    * compare alone would drop ~2^-32 of nominally-certain rows).
    */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
      salt: String = ""): DataFrame = {
    val scaled = least(
      floor(greatest(weightCol.cast("double"), lit(0.0)) * 4294967296.0),
      lit(4294967295.0)).cast("bigint")
    // hex() is uppercase in Spark, md5() is lowercase — normalize
    val thr = lower(lpad(hex(scaled), 8, "0"))
    df.filter(weightCol.cast("double") >= 1.0 || md5Key(keyCol, salt) < thr)
  }

  /** Stratified deterministic sample: per-stratum fractions (e.g. keep 50%
    * of English, 12.5% of everything else). One scan — the stratum's
    * threshold is a CASE lookup, then the same md5 filter as `hashSample`.
    */
  def stratifiedSample(df: DataFrame, strataCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      keyCol: Column, salt: String = ""): DataFrame = {
    // compare on the CAST-to-string stratum: the rate map's keys are
    // strings, and a string-to-string equality round-trips for non-string
    // strata (timestamp/decimal/float) where an implicit-cast comparison
    // against Spark's rendering may not
    val sCol = strataCol.cast("string")
    val thr = rates.foldLeft(lit(sampleThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(sCol === stratum, lit(sampleThreshold(rate))).otherwise(acc)
    }
    df.filter(md5Key(keyCol, salt) < thr)
  }

  /** Rebalance a corpus to a target group mix by downsampling only (the
    * "data mixing" step of corpus construction: e.g. make the output 50%
    * en / 20% fr / ... regardless of the crawl's skew). Solves for the
    * largest output consistent with the mix without duplication:
    * `T = min_g(n_g / f_g)` rows total, per-group keep-rate
    * `f_g * T / n_g`, then samples through [[weightedSample]] — whose
    * `>= 1.0` short-circuit keeps the binding group truly whole (a strict
    * threshold compare would drop ~2^-32 of its rows). Groups absent from
    * `targetMix` drop; a mix group with no rows makes the mix unsatisfiable
    * and empties the result. Only the G per-group counts touch the driver
    * (metadata-scale by contract, like the IVF centroid reads); the data
    * path stays one count-aggregate plus one sampling scan — no shuffle of
    * kept rows.
    */
  def rebalanceToMix(df: DataFrame, strataCol: Column,
      targetMix: Map[String, Double], keyCol: Column,
      salt: String = ""): DataFrame = {
    require(targetMix.nonEmpty, "targetMix must name at least one group")
    require(targetMix.values.forall(f => f > 0.0 && f <= 1.0),
      s"target fractions must be in (0,1]: $targetMix")
    val total = targetMix.values.sum
    require(math.abs(total - 1.0) < 1e-9, s"target fractions sum to $total, expected 1")
    // group AND compare on the CAST-to-string stratum, so the driver-side
    // group keys and the executor-side rate lookup see the identical
    // rendering by construction — a non-string stratum (timestamp,
    // decimal, float) compared against its collected toString may not
    // round-trip through an implicit-cast equality, silently zeroing a
    // group's rate
    val sCol = strataCol.cast("string")
    val counts = df.groupBy(sCol.as("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)).orNull -> r.getLong(1)).toMap
    val t = targetMix.map { case (g, f) => counts.getOrElse(g, 0L) / f }.min
    val rates = targetMix.map { case (g, f) =>
      val n = counts.getOrElse(g, 0L)
      g -> (if (n == 0L) 0.0 else math.min(f * t / n, 1.0))
    }
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (g, r)) =>
      when(sCol === g, lit(r)).otherwise(acc)
    }
    weightedSample(df, keyCol, rateCol, salt)
  }

  /** Temperature-flattened mixture sampling (the mC4/XLM-R α-sampling
    * step): the target mix is derived FROM the corpus — group `g` with
    * natural share `p_g = n_g/N` gets target share `q_g ∝ p_g^α` — then the
    * same downsample-only solver as [[rebalanceToMix]] (largest output
    * consistent with the mix, binding group kept whole). `α = 1` keeps the
    * natural distribution; `α → 0` approaches uniform — the standard knob
    * for keeping low-resource languages/sources visible without duplicating
    * them. Rows with a null stratum drop (they have no place in the mix).
    *
    * Scale shape: identical to [[rebalanceToMix]] — one count-aggregate
    * (G rows to the driver, metadata-scale by contract) plus one sampling
    * scan; no shuffle of kept rows. Determinism: each `p^α` is rounded to
    * 12 decimals (libm `pow` agrees across engines to ~1 ulp, far inside
    * the round window — the DSIR discipline) and the normalizer is an
    * EXACT decimal sum of those rounded values, so every downstream double
    * (q, T, per-group rate) is bit-identical on any engine and the md5
    * thresholds cannot flip a row. Known 1-ulp caveat: a libm `pow`
    * divergence landing exactly on a 12-decimal rounding boundary could
    * still flip the rounded value between engines (never observed; DSIR
    * shares the discipline) — if such a flake ever appears, round both
    * engines from the same decimal STRING rendering of `p^α` instead of
    * the double.
    */
  def temperatureMix(df: DataFrame, strataCol: Column, alpha: Double,
      keyCol: Column, salt: String = ""): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureMix: alpha must be in (0,1], got $alpha")
    // cast-to-string stratum on BOTH sides (the rebalanceToMix round-trip
    // guarantee): numeric cell ids — this API's likeliest stratum — would
    // otherwise compare their toString against an implicitly-cast column
    val sCol = strataCol.cast("string")
    val counts = df.groupBy(sCol.as("g")).agg(count(lit(1)).as("n"))
      .collect().flatMap(r => Option(r.getString(0)).map(g => g -> r.getLong(1)))
      .toMap
    require(counts.nonEmpty, "temperatureMix: no non-null strata")
    val total = counts.values.sum.toDouble
    val pw = counts.map { case (g, c) =>
      g -> java.math.BigDecimal.valueOf(math.pow(c / total, alpha))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    }
    val z = pw.values.reduce(_.add(_)).doubleValue
    val qn = counts.map { case (g, c) => g -> (pw(g).doubleValue / z, c) }
    val t = qn.values.map { case (q, c) => c / q }.min
    val rateCol = qn.foldLeft(lit(0.0)) { case (acc, (g, (q, c))) =>
      when(sCol === g, lit(math.min((q * t) / c, 1.0))).otherwise(acc)
    }
    weightedSample(df, keyCol, rateCol, salt)
  }

  /** UniMax budget allocation (Chung et al. 2023): distribute a total token
    * `budget` across strata as UNIFORMLY as possible subject to a per-group
    * repeat cap — no group is allocated more than `maxEpochs` passes over
    * its own tokens. The water-filling pass visits groups smallest-first:
    * each takes `min(remaining/groups_left, maxEpochs · n_g)`, so small
    * groups cap out at their epoch ceiling and the freed budget spreads
    * over the rest — the principled successor to temperature sampling for
    * highly skewed multilingual corpora (no α to tune, bounded repetition).
    *
    * Returns the PLANNING TABLE (one row per stratum): (g, n_tokens,
    * alloc_tokens, epochs) — the loader consumes it; nothing is sampled
    * here (allocations above 1 epoch mean repetition, which is the
    * loader's business, not a filter's). Group token totals are exact
    * integer sums; the fold runs driver-side over the G-row collect
    * (metadata-scale by contract) in (n, g) order with plain double
    * arithmetic — deterministic on any engine because the visit order and
    * operation order are fixed.
    */
  def unimaxAllocation(df: DataFrame, strataCol: Column, tokenCol: Column,
      budget: Double, maxEpochs: Double): DataFrame = {
    require(budget > 0.0 && maxEpochs > 0.0,
      s"unimaxAllocation: budget and maxEpochs must be positive, got $budget / $maxEpochs")
    val spark = df.sparkSession
    // guard the collected totals: a null sum (all-null token column for a
    // stratum) would NPE, and a zero or negative total (e.g. a caller's
    // size(split(null)) = -1 under non-ANSI) would emit NaN epochs or
    // NEGATIVE allocations that inflate the remaining budget for every
    // later group — reject loudly instead of poisoning the plan
    val counts = df.groupBy(strataCol.as("g"))
      .agg(sum(tokenCol.cast("long")).as("n"))
      .collect().flatMap { r =>
        Option(r.get(0)).map { g =>
          require(!r.isNullAt(1),
            s"unimaxAllocation: stratum '$g' has a null token total " +
              "(every row's tokenCol is null)")
          g.toString -> r.getLong(1)
        }
      }
      .toSeq.sortBy { case (g, n) => (n, g) }
    require(counts.nonEmpty, "unimaxAllocation: no non-null strata")
    counts.foreach { case (g, n) =>
      require(n > 0L, s"unimaxAllocation: stratum '$g' has non-positive " +
        s"token total $n — filter empty strata (or null-text rows) first")
    }
    var rem = budget
    val rows = counts.zipWithIndex.map { case ((g, n), i) =>
      val fair = rem / (counts.size - i)
      val alloc = math.min(fair, maxEpochs * n)
      rem -= alloc
      org.apache.spark.sql.Row(g, n, alloc, alloc / n)
    }
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
      org.apache.spark.sql.types.StructType.fromDDL(
        "g string, n_tokens bigint, alloc_tokens double, epochs double"))
  }

  /** Deterministic train/val/test split assignment: one `split` column from
    * cumulative md5 thresholds — same row → same split on any engine, any
    * cluster size, any run; changing `salt` redraws. One scan, no shuffle.
    * Fractions must sum to ≤ 1; rows past the last cumulative threshold get
    * the final split name (so 0.98/0.01/0.01 covers the full space).
    */
  def assignSplits(df: DataFrame, keyCol: Column,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val h = md5Key(keyCol, salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), upper), els) =>
        when(h < lit(sampleThreshold(upper)), lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic global training-order shuffle: every row gets a
    * `shuffle_pos` (0-based) equal to its rank under `md5(salt || key)`
    * order — the standard "shuffle the corpus before training" step, made
    * reproducible (same salt → same order on any engine/cluster/rerun;
    * new salt → an independent permutation).
    *
    * Contract: `keyCol` must be UNIQUE per row — rows sharing a key share a
    * sort key, and their relative order is then shuffle-fetch order, which
    * varies between runs. For derived rows (chunks, packs) build a unique
    * key first, e.g. `concat(doc_id, ':', chunk_idx)`.
    *
    * Distributed by construction: rows are RANGE-partitioned on the hash
    * (so the order is globally correct across partitions), sorted within
    * partitions, and numbered by the prefix-sum machinery of
    * [[graft.etl.Offsets.assignSequential]] — only P per-partition counts
    * touch the driver. A `row_number()` over a global ORDER BY would pull
    * every row through ONE partition; this never does.
    */
  def shuffleRank(df: DataFrame, keyCol: Column, salt: String = ""): DataFrame = {
    val h = md5Key(keyCol, salt)
    val sorted = df
      .withColumn("_h", h)
      .repartitionByRange(col("_h"), keyCol)
      .sortWithinPartitions(col("_h"), keyCol)
      .persist() // assignSequential's counts job + output must see one order
    try graft.etl.Offsets.assignSequential(sorted, 0L, "shuffle_pos")
      .drop("_h")
      .localCheckpoint(true) // materialize before unpersisting the input
    finally sorted.unpersist()
  }

  /** Keep at most `n` rows per group, best-first by `orderBy` (ties broken
    * by `tieBreak` for determinism). The shuffle is one hash exchange on
    * `groupCol`; a pathologically hot group serializes through one task —
    * at 100 TB, cap groups are domains/sources (many, moderate size), which
    * is exactly the workload this window shape handles well.
    */
  def capPerGroup(df: DataFrame, groupCol: Column, orderBy: Column,
      tieBreak: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderBy, tieBreak)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= n).drop("_rk")
  }

  /** Sequence packing: assign each document a `pack_id` such that documents
    * sharing a pack total ≈ `budgetTokens` (contiguous fill in `orderBy`
    * order within each `shardCol` partition — a doc whose tokens straddle a
    * boundary starts in the pack where its first token lands).
    *
    * pack_id = floor((running_total - own_tokens) / budget), i.e. the pack
    * containing the document's first token. Shards pack independently and
    * in parallel; at scale `shardCol` is a file/domain/date shard — the same
    * unit real pretraining pipelines pack within.
    */
  def packSequences(df: DataFrame, shardCol: Column, orderBy: Column,
      tokenCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "token budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(orderBy)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(tokenCol).over(w))
      .withColumn("pack_id",
        floor((col("_cum") - tokenCol) / lit(budgetTokens.toDouble)).cast("long"))
      .drop("_cum")
  }

  /** Document chunking: split each document into word-token windows of
    * `chunkTokens` advancing by `stride` (stride < chunkTokens gives the
    * standard overlapping pretraining windows; stride == chunkTokens is
    * disjoint chunking). The last window may be shorter; every token is
    * covered. Null-text documents produce no chunks. Output: input columns
    * minus `textCol`, plus (chunk_idx, chunk, n_tok).
    *
    * Entirely map-only — the window starts are a per-row `sequence` and the
    * chunks are `slice`s of the one split: no shuffle, no state; chunking
    * 100 TB is exactly one pass over the scan.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val w = split(col(textCol), " ")
    val lastStart = greatest(lit(0),
      ceil((size(w) - lit(chunkTokens)) / lit(stride.toDouble))).cast("int")
    val carried = df.columns.filter(_ != textCol).map(col).toSeq
    df.filter(col(textCol).isNotNull) // null text → no chunks (size() = -1 otherwise)
      .withColumn("_w", w)
      .withColumn("chunk_idx", explode(sequence(lit(0), lastStart)))
      .select(carried ++ Seq(
        col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_w"), col("chunk_idx") * stride + 1, lit(chunkTokens))).as("chunk"),
        least(lit(chunkTokens), size(col("_w")) - col("chunk_idx") * stride).cast("long").as("n_tok")): _*)
  }

  /** Skew-proof per-group cap: keep the top `n` rows per group by
    * (`score` DESC, `idCol` ASC), like [[capPerGroup]] with a descending
    * order — but WITHOUT the rank window. A window over
    * `partitionBy(group)` routes every row of a hot group through one
    * partition; group sizes in training corpora are power-law (domains,
    * sources), so the biggest group IS the bottleneck at 100 TB. Here the
    * per-group top-n ids are collected by the bounded `top_k_by_score`
    * aggregate — ≤n ids per (group, partition) survive map-side, the
    * shuffle carries n×partitions ids per group no matter how hot the
    * group — and the kept-id set then prunes the corpus with a semi-join
    * (AQE broadcasts it while groups×n stays small, shuffles when not).
    *
    * Contract: `idCol` must be unique non-null (the deterministic
    * tiebreak + join key) and `score` non-null (null-score rows are
    * excluded, unlike a rank window which sorts them last); score must be
    * exactly representable as double (longs beyond 2^53 lose ties).
    */
  def capPerGroupBounded(df: DataFrame, groupCol: Column, score: Column,
      idCol: String, n: Int): DataFrame = {
    val kept = df.groupBy(groupCol.as("_g"))
      .agg(Similarity.topKByScore(score.cast("double"), col(idCol), n).as("_top"))
      .select(explode(col("_top")).as("_t"))
      .select(col("_t.payload").as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Benchmark-contamination gate: corpus documents sharing at least
    * `minOverlap` distinct word n-gram shingles with an evaluation set —
    * the decontamination step every pretraining pipeline runs before
    * training (n-gram overlap against held-out benchmarks).
    *
    * Output: (id, n_overlap) for contaminated documents only.
    *
    * Scale shape: the corpus side is a map-only shingle explode; the eval
    * side (benchmarks — thousands of documents, not billions) collapses to a
    * distinct-shingle set that AQE broadcasts. Crucially the broadcast join
    * runs BEFORE any corpus-side dedup: it discards every non-overlapping
    * shingle map-side, so the only corpus shuffle is the count-distinct
    * aggregation over the (tiny) overlap stream — deduping the corpus's
    * full shingle stream first, as the naive formulation does, would
    * shuffle the whole corpus to drop 99.9% of it right after. Same
    * tokenization as the dedup family ([[Dedup.rawShingles]]).
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, minOverlap: Int = 1): DataFrame = {
    val c = Dedup.rawShingles(corpus, idCol, textCol, n)
    val e = Dedup.rawShingles(evalSet, idCol, textCol, n).select(col("sh")).distinct()
    c.join(e, Seq("sh"))
      .groupBy("id")
      // countDistinct, not count: c is the raw (duplicate-bearing) shingle
      // stream; a doc repeating one contaminated shingle k times still
      // overlaps the eval set in exactly one distinct shingle
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus
    * document by how much more likely its hashed-unigram bag is under a
    * TARGET distribution (e.g. Wikipedia + books) than under the raw corpus
    * distribution:
    *
    *   log w(doc) = Σ_tok [ ln p_target(b(tok)) − ln p_raw(b(tok)) ]
    *
    * with `b(tok)` = a `buckets`-way hashed feature (first 3 hex chars of
    * md5 — deterministic on any engine) and add-k smoothed bucket
    * probabilities. Downstream, resampling ≈ keep the top fraction by
    * `log_weight` (compose with [[capPerGroupBounded]] or a threshold from
    * one profiling pass).
    *
    * Output: (id, n_tokens, log_weight) — log_weight rounded to 1e-4.
    * Reproducibility: the per-bucket log-ratio is rounded to 12 decimals
    * (double `ln` agrees across libms to ~1 ulp ≈ 1e-15, far inside the
    * 0.5e-12 rounding window) and then carried as DECIMAL so the per-doc
    * sum is EXACT and associative — partial-aggregation order, libm build,
    * and engine can't flip the 4-decimal final rounding (the same
    * exact-decimal trick as the k-means "exact decimal means").
    *
    * Scale shape: both "model fits" ARE aggregations — one bucket-count agg
    * per corpus (map-side combinable, ≤ `buckets` rows out); the per-doc
    * score is one (id,bucket) count agg + a broadcast join against the
    * ≤4096-row log-ratio table + one id-keyed sum. The (id,bucket) exchange
    * appears twice in the plan (doc scores + raw-corpus fit) and Spark's
    * ReuseExchange collapses it — the corpus text is read once, nothing is
    * collected.
    */
  /** The ONE feature-hash pipeline every token-bucket consumer shares
    * (DSIR fits, classifier train/score): lowercase whitespace tokens →
    * bucket = first 3 md5 hex chars as an int (0..4095). The DuckDB
    * oracles mirror this exact formula (strpos-based hex decode) — keep
    * them in lockstep.
    */
  private def bucketedTokens(df: DataFrame, keep: Seq[Column],
      textCol: String): DataFrame =
    df.select(keep :+ explode(split(lower(col(textCol)), " ")).as("tok"): _*)
      .withColumn("bucket", conv(substring(md5(col("tok")), 1, 3), 16, 10).cast("int"))
      .drop("tok")

  def importanceWeights(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096, smoothing: Double = 1.0): DataFrame = {
    def toks(df: DataFrame, cols: Column*) =
      bucketedTokens(df, cols, textCol)
    val kB = lit(smoothing * buckets)
    val k = lit(smoothing)
    val docBuckets = toks(corpus, col(idCol).as("id"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("c"))
    val rawFit = docBuckets.groupBy("bucket").agg(sum("c").as("cr"))
    val targetFit = toks(target).groupBy("bucket").agg(count(lit(1)).as("ct"))
    val totals = rawFit.agg(sum("cr").as("totr"))
      .crossJoin(targetFit.agg(sum("ct").as("tott")))
    val logRatio = rawFit
      .join(targetFit, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        // round → cast: the rounded double sits within 1 ulp of a 12-decimal
        // value, so the decimal cast is an exact conversion on any engine
        // regardless of its cast rounding mode. |lr| < 50 fits DECIMAL(18,12).
        round(log((coalesce(col("ct"), lit(0L)) + k) / (col("tott") + kB))
          - log((col("cr") + k) / (col("totr") + kB)), 12)
          .cast("decimal(18,12)").as("lr"))
    docBuckets.join(broadcast(logRatio), Seq("bucket"))
      .groupBy("id")
      .agg(sum("c").as("n_tokens"),
        // DECIMAL(10,0) * DECIMAL(18,12) → DECIMAL(29,12): exact product,
        // exact (associative) sum; the 4-decimal round is then deterministic.
        round(sum(col("c").cast("decimal(10,0)") * col("lr")), 4)
          .cast("double").as("log_weight"))
  }

  /** Train a hashed bag-of-words text classifier ENTIRELY in the engine —
    * the quality-classifier step (FineWeb-edu style "does this look like
    * the seed set") as distributed aggregations, the same discipline as
    * [[importanceWeights]]'s two fits but with an iterative optimizer:
    * each epoch of gradient descent is ONE margin aggregation (docs ×
    * their buckets, map-side combinable, weights ride a ≤4096-row
    * broadcast) plus ONE gradient aggregation back over the bucket key.
    * Nothing is collected; the corpus token stream is read once into a
    * cached (id, y, bucket, count) frame that every epoch reuses.
    *
    * The link is the RATIONAL fast sigmoid p = ½ + m / (2·(1+|m|)) —
    * chosen over exp() deliberately: the entire training loop is then
    * +,−,×,÷,|·| on exact-decimal margins, so every weight is
    * bit-identical on any engine, partitioning, or libm (exp's 1-ulp
    * variance would otherwise compound across epochs). Same monotone
    * S-curve family; swap in the exp form when cross-engine exactness
    * doesn't matter. Margins stay exact DECIMAL (weights rounded to 12
    * decimals each epoch, counts × weights summed associatively), the
    * kmeans/DSIR reproducibility pattern.
    *
    * Epoch rounds carry the weight vector DRIVER-side between epochs
    * (collected LocalRelations — constant-size plans, the same reason the
    * former form checkpointed; see [[trainOnBucketCounts]]). Output:
    * (bucket, w) — feed to [[scoreTextClassifier]], or score from the
    * shared bucket-count frame via [[scoreFromBucketCounts]].
    */
  def trainTextClassifier(df: DataFrame, idCol: String, labelCol: Column,
      textCol: String, epochs: Int = 2, rate: Double = 1.0): DataFrame = {
    val db = classifierBucketCounts(df, idCol, labelCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the returned weights are a driver-local frame (trainOnBucketCounts
    // collects per epoch), fully materialized — releasing db here can
    // never force a recompute
    try trainOnBucketCounts(db, epochs, rate)
    finally db.unpersist(blocking = false)
  }

  /** The classifier's shared (id, y, bucket, c) bucket-count frame — built
    * once, consumed by every training epoch AND (fused pipelines) the
    * scoring pass, so the corpus token stream is read exactly once
    * (guide §1.2). Callers that train and score should persist it and run
    * [[trainOnBucketCounts]] + [[scoreFromBucketCounts]] over the same
    * frame. Null labels coerce to 0.0 (the oracle's CASE WHEN ... ELSE 0.0
    * semantics) — a null y would otherwise vanish from the gradient sum
    * while still counting toward the learning-rate divisor.
    */
  def classifierBucketCounts(df: DataFrame, idCol: String, labelCol: Column,
      textCol: String): DataFrame =
    bucketedTokens(
        df.select(col(idCol).as("id"),
          coalesce(labelCol.cast("double"), lit(0.0)).as("y"), col(textCol)),
        Seq(col("id"), col("y")), textCol)
      .groupBy("id", "y", "bucket").agg(count(lit(1)).as("c"))

  /** The GD epoch loop over a (typically persisted)
    * [[classifierBucketCounts]] frame. The ≤4096-row weight vector rides
    * DRIVER-side between epochs (collected into a LocalRelation — the
    * kmeans discipline): per epoch exactly ONE job (the margin + gradient
    * + update aggregation, collected), where the former checkpointed form
    * paid the checkpoint job plus a broadcast-build and a doc-count job
    * per epoch. Values are bit-identical (decimals round-trip as objects;
    * the learning-rate divisor n is exact in a double at any real corpus
    * count). Output: (bucket, w).
    */
  def trainOnBucketCounts(db: DataFrame, epochs: Int = 2,
      rate: Double = 1.0): DataFrame = {
    require(epochs >= 1, s"trainOnBucketCounts: epochs must be >= 1, got $epochs")
    val spark = db.sparkSession
    def localW(frame: DataFrame): DataFrame = spark.createDataFrame(
      java.util.Arrays.asList(frame.collect(): _*), frame.schema)
    val zeroW = lit(0).cast("decimal(18,12)")
    // the learning-rate divisor, once, driver-side (was re-broadcast —
    // i.e. re-aggregated — every epoch)
    val n = db.select(countDistinct("id")).collect()(0).getLong(0)
    var w = localW(db.select(col("bucket")).distinct().withColumn("w", zeroW))
    for (_ <- 1 to epochs) {
      val margins = db.join(broadcast(w), Seq("bucket"), "left")
        .groupBy("id", "y")
        .agg(sum(col("c").cast("decimal(10,0)") * coalesce(col("w"), zeroW))
          .as("m"))
        .withColumn("md", col("m").cast("double"))
        // rational fast sigmoid: no libm anywhere in the loop
        .withColumn("p", lit(0.5) + col("md") / (lit(2.0) * (lit(1.0) + abs(col("md")))))
      val grad = db.join(margins.select("id", "p"), Seq("id"))
        .groupBy("bucket")
        // |p−y| < 1, so DECIMAL(13,12) holds it exactly and the product
        // with the count stays inside 38 digits of precision (a wider
        // operand would hit Spark's 38-digit cap and silently round)
        .agg(sum(round(col("p") - col("y"), 12).cast("decimal(13,12)")
          * col("c").cast("decimal(10,0)")).as("g"))
      w = localW(w.join(grad, Seq("bucket"), "left")
        .select(col("bucket"),
          round(col("w").cast("double")
            - lit(rate) * coalesce(col("g").cast("double"), lit(0.0)) / lit(n.toDouble), 12)
            .cast("decimal(18,12)").as("w")))
    }
    w
  }

  /** Score from an ALREADY-BUILT [[classifierBucketCounts]] frame — the
    * fused train+score form: the margin needs only (id, bucket, c), which
    * the training frame already holds, so a pipeline that trains and
    * scores the same corpus skips the second token explode entirely.
    * Bit-identical to [[scoreTextClassifier]] over the same documents
    * (same (id, bucket, c) multiset, exact-decimal associative margin).
    * Output: (idCol, score).
    */
  def scoreFromBucketCounts(db: DataFrame, weights: DataFrame,
      idCol: String): DataFrame = {
    val zeroW = lit(0).cast("decimal(18,12)")
    db.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("c").cast("decimal(10,0)") * coalesce(col("w"), zeroW)).as("m"))
      .withColumn("md", col("m").cast("double"))
      .select(col("id").as(idCol),
        round(lit(0.5) + col("md") / (lit(2.0) * (lit(1.0) + abs(col("md")))), 4)
          .as("score"))
  }

  /** Score documents with [[trainTextClassifier]] weights: the fast-sigmoid
    * of the exact-decimal margin, rounded to 1e-4. One token explode +
    * one id-keyed margin aggregation, weights on a broadcast — the same
    * map-combinable shape as scoring with DSIR log-ratios.
    * Output: (idCol, score).
    */
  def scoreTextClassifier(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame): DataFrame = {
    val zeroW = lit(0).cast("decimal(18,12)")
    bucketedTokens(df.select(col(idCol).as("id"), col(textCol)),
        Seq(col("id")), textCol)
      .groupBy("id", "bucket").agg(count(lit(1)).as("c"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("c").cast("decimal(10,0)") * coalesce(col("w"), zeroW)).as("m"))
      .withColumn("md", col("m").cast("double"))
      .select(col("id").as(idCol),
        round(lit(0.5) + col("md") / (lit(2.0) * (lit(1.0) + abs(col("md")))), 4)
          .as("score"))
  }

  /** Deterministic training-shard assignment + export — the hand-off step
    * after dedup/filter/mix/pack: every row lands in
    * `shard = md5(key‖salt) mod numShards` (the same portable-hash space as
    * [[hashSample]]/[[assignSplits]], so a re-run, a different cluster, or
    * a different engine produces byte-identical shard membership), rows
    * sort by their hash within each shard (reproducible file order), and
    * each shard writes as exactly one parquet file under
    * `outDir/shard=N/`. One hash-partitioned shuffle + a within-partition
    * sort — no global sort, no driver collection. Write parallelism is AT
    * MOST `numShards` concurrent writers: the repartition hashes the shard
    * value, so distinct shards can share a task (one-file-per-shard still
    * holds — `partitionBy` splits by value). In practice set numShards a
    * few × the cluster's cores and the scheduler balances the collisions
    * out; exact one-task-per-shard would need a custom partitioner for no
    * change in total write work.
    */
  def writeShards(df: DataFrame, keyCol: Column, outDir: String,
      numShards: Int, salt: String = ""): Unit = {
    require(numShards >= 1, s"writeShards: numShards must be >= 1, got $numShards")
    val hash = md5Key(keyCol, salt)
    df.withColumn("_h", hash)
      .withColumn("shard", pmod(conv(substring(col("_h"), 1, 8), 16, 10)
        .cast("long"), lit(numShards.toLong)).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "_h")
      .drop("_h")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  private def gateAbove(df: DataFrame, scoreCol: Column, name: String,
      keepFraction: Double, threshold: Column): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"$name: keepFraction must be in (0, 1], got $keepFraction")
    df.crossJoin(broadcast(df.agg(threshold.as("_thr"))))
      .filter(scoreCol >= col("_thr"))
      .drop("_thr")
  }

  /** Keep the top `keepFraction` of rows by `scoreCol` — the standard
    * "filter to the best X% by quality/DSIR/perplexity score" gate. The
    * threshold is the exact interpolated (1−keepFraction) percentile (the
    * same estimator as [[graft.ops.TextOps.corpusProfile]], so it
    * hash-matches `quantile_cont` on any engine); rows scoring exactly AT
    * the threshold are kept, so ties never drop nondeterministically.
    *
    * One aggregation to a 1-row threshold frame (broadcast) + one filtering
    * scan. NOTE the exact percentile buffers the score column per
    * aggregation buffer — fine into the billions of rows (8 bytes/score),
    * but for 100 TB-scale row counts use [[qualityGateApprox]], which
    * trades the reproducible threshold for bounded memory.
    */
  def qualityGate(df: DataFrame, scoreCol: Column,
      keepFraction: Double): DataFrame =
    gateAbove(df, scoreCol, "qualityGate", keepFraction,
      percentile(scoreCol, lit(1.0 - keepFraction)))

  /** As [[qualityGate]] with a bounded-memory approximate threshold
    * (`approx_percentile`, `accuracy` controls the error bound) — the
    * 100 TB form. The kept fraction is then approximate too; the result is
    * deterministic for a fixed input but not bit-portable across engines,
    * so this variant is spec-checked rather than oracle-hashed.
    */
  def qualityGateApprox(df: DataFrame, scoreCol: Column, keepFraction: Double,
      accuracy: Int = 10000): DataFrame =
    gateAbove(df, scoreCol, "qualityGateApprox", keepFraction,
      approx_percentile(scoreCol, lit(1.0 - keepFraction), lit(accuracy)))

  /** Per-row length-bucket assignment: `bucket` is the smallest boundary
    * ≥ `lengthCol`, or −1 for rows past the last boundary (the overflow
    * bin a packing step must split or truncate). Training loaders batch by
    * length so padding waste stays bounded; assigning the bucket is the
    * map-only pre-step to [[packSequences]]-style batching. Boundaries must
    * be strictly increasing.
    */
  def assignLengthBuckets(df: DataFrame, lengthCol: Column,
      boundaries: Seq[Long]): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted.distinct,
      s"assignLengthBuckets: boundaries must be strictly increasing, got $boundaries")
    val bucket = boundaries.foldRight(lit(-1L): Column) { (b, els) =>
      when(lengthCol <= b, lit(b)).otherwise(els)
    }
    df.withColumn("bucket", bucket)
  }

  /** Length-bucket histogram over the corpus: per bucket, row count, total
    * and min/max length, plus the padded-token cost of batching the bucket
    * to its boundary (`pad_waste` = Σ(boundary − length); overflow rows
    * count 0 — they don't batch as-is). The knob-tuning companion to
    * [[assignLengthBuckets]]: pick boundaries until Σ pad_waste is an
    * acceptable fraction of Σ total.
    *
    * Scale shape: one map-side-combinable aggregation over the map-only
    * bucket assignment — ≤ |boundaries|+1 rows out of a 100 TB scan, the
    * same single-agg profile as `TextOps.corpusProfile`.
    */
  def lengthBucketStats(df: DataFrame, lengthCol: Column,
      boundaries: Seq[Long]): DataFrame =
    assignLengthBuckets(df, lengthCol, boundaries)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(lengthCol).as("total_len"),
        min(lengthCol).as("min_len"),
        max(lengthCol).as("max_len"),
        sum(when(col("bucket") >= 0, col("bucket") - lengthCol)
          .otherwise(lit(0L))).as("pad_waste"))
}
