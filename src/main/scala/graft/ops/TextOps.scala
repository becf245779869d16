package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language ID, quality scoring,
  * token counting, document fingerprinting. All codegen'd column
  * expressions — no UDFs, no shuffles beyond the caller's.
  */
object TextOps {

  /** Tiny stopword profiles for the n-gram/stopword language heuristic.
    * (Real pipelines plug fastText-style models in via the same shape.)
    */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "a", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"))

  private def toks(textCol: Column): Column = split(lower(textCol), " ")

  /** Per-language stopword hit count. */
  def langScore(textCol: Column, stopwords: Seq[String]): Column =
    size(filter(toks(textCol), t => t.isInCollection(stopwords)))

  /** Predicted language: highest stopword count, preference order on ties,
    * `und` (undetermined) when nothing matches.
    */
  def langId(textCol: Column): Column = {
    val scores = profiles.map { case (l, words) => l -> langScore(textCol, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s === best && s > 0, lit(l)).otherwise(els)
    }
  }

  /** Unicode scripts the profiler counts, in dominance-tiebreak order.
    * Java regex spells a script class `\p{IsLatin}`; RE2 (DuckDB, the
    * oracle side) spells the same class `\p{Latin}` — both count single
    * code points with that Script property (digits/punct/space are
    * Script=Common and belong to none).
    */
  val scriptClasses: Seq[String] = Seq("latin", "cyrillic", "greek",
    "arabic", "hebrew", "devanagari", "han", "hiragana", "katakana",
    "hangul")

  /** Per-document Unicode-script profile: one per-script code-point count
    * column (`n_latin`, `n_cyrillic`, …) plus `dominant_script` (highest
    * count; [[scriptClasses]] order on ties — the [[langId]] discipline;
    * `unknown` when no script char occurs, e.g. digits-only docs). The
    * mixed-script complement to stopword language ID: script mixing flags
    * spam/encoding damage that language ID alone misses, and script
    * routing picks the tokenizer/normalizer family. One map-only
    * projection of `regexp_count` expressions — no explode, no shuffle.
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = scriptClasses.map { n =>
      val cls = n.capitalize
      n -> regexp_count(col(textCol), lit(s"\\p{Is$cls}"))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val dominant = counts.foldRight(lit("unknown"): Column) {
      case ((n, c), els) => when(c === best && c > 0, lit(n)).otherwise(els)
    }
    df.select(col(idCol) +: counts.map { case (n, c) => c.as(s"n_$n") }
      :+ dominant.as("dominant_script"): _*)
  }

  /** Quality signals: token count, mean token length, stopword ratio,
    * unique-token ratio, and a blended score. Ratios are single divisions
    * of integers — bit-deterministic across engines.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t)
    val nUniq = size(array_distinct(t))
    val stops = langScore(col(textCol), profiles.head._2)
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      (length(col(textCol)) * lit(1.0) / nTok).as("mean_tok_len"),
      (stops * lit(1.0) / nTok).as("stopword_ratio"),
      (nUniq * lit(1.0) / nTok).as("uniq_ratio"))
      .withColumn("quality_score",
        col("stopword_ratio") * lit(0.5) + col("uniq_ratio") * lit(0.5))
  }

  /** Token counts: whitespace tokens + BPE-ish word/number/punct pieces. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " ")).as("ws_tokens"),
      size(expr(s"regexp_extract_all(lower($textCol), '[a-z]+|[0-9]+', 0)")).as("re_tokens"))

  /** Content fingerprint: md5 of the sorted distinct token set — catches
    * word-order-shuffled duplicates that exact hashing misses.
    */
  def fingerprint(textCol: Column): Column =
    md5(array_join(array_sort(array_distinct(toks(textCol))), " "))

  /** Corpus vocabulary: token → (document frequency, total count), top-k by
    * count. One explode + one aggregation — map-side combinable, the shape
    * that survives 100 TB (the shuffle carries one row per distinct token
    * per partition, not per occurrence).
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(countDistinct("id").as("doc_freq"), count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("tok"))
      .limit(k)

  /** Per-document out-of-vocabulary rate against the corpus's own top
    * `vocabSize` tokens — the tokenizer-coverage signal run before
    * committing to a vocabulary: docs whose tokens mostly fall outside the
    * planned vocab (code, foreign scripts, encoding damage) will fragment
    * into long byte-level token sequences and waste sequence budget.
    * Output: (idCol, n_tok, n_oov, oov_rate), rate rounded to 1e-6.
    *
    * Scale shape: the vocabulary is bounded (`vocabSize` rows after the
    * corpus-frequency aggregation) and BROADCASTS into the token stream —
    * the corpus is never shuffled for the membership probe; the per-doc
    * roll-up is one map-combinable aggregation keyed by id.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize >= 1, s"oovRate: vocabSize must be >= 1, got $vocabSize")
    val vocab = vocabulary(df, idCol, textCol, vocabSize)
      .select(col("tok"), lit(1).as("_in"))
    df.select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") * lit(1.0) / col("n_tok"), 6))
      .withColumnRenamed("id", idCol)
  }

  /** Corpus profile per stratum (language/source/...): doc counts, exact
    * interpolated length percentiles, min/max. The percentile aggregate
    * shuffles one row per (stratum, partition) after partial aggregation —
    * a profiling pass over 100 TB is one aggregation, no second scan.
    * (Interpolated exact percentiles are deterministic — two order
    * statistics, no float summation order — so they oracle-compare exactly;
    * swap in approx_percentile when a t-digest sketch is acceptable.)
    */
  def corpusProfile(df: DataFrame, strataCol: String, valueCol: String): DataFrame =
    df.groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile(col(valueCol), lit(0.5)).as("p50"),
        percentile(col(valueCol), lit(0.9)).as("p90"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))

  /** Per-document perplexity under a corpus-trained add-k bigram language
    * model — the classic "does this document look like the corpus" quality
    * signal (low = typical, high = anomalous/noisy).
    *
    *   P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)     V = vocab size
    *   ppl(doc) = exp(−mean ln P over the doc's bigrams)
    *
    * Shape at scale: two count aggregations (bigram + unigram — both
    * map-side combinable), one broadcast scalar (V), and two joins keyed on
    * the bigram/unigram — the same inverted-index join pattern as dedup.
    * Nothing is collected; the model "training" IS the aggregation.
    * The perplexity is rounded (1e-4) so the float summation order inside
    * `avg` never shows in results.
    */
  def bigramPerplexity(df: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): DataFrame = {
    val t = df.select(col(idCol).as("id"), toks(col(textCol)).as("t"))
    // token array lambda-bound (the rawShingles/winnow guard): an inlined
    // `t` alias would re-split the text once per bigram element if the
    // optimizer collapses this projection into the Generate
    val bigrams = t.filter(size(col("t")) >= 2)
      .select(col("id"),
        explode(flatten(transform(array(col("t")), tt =>
          transform(sequence(lit(0), size(tt) - 2),
            i => struct(element_at(tt, i + 1).as("w1"),
              element_at(tt, i + 2).as("w2")))))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = t.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cw"))
    val vocabSize = uni.agg(count(lit(1)).as("vsz"))
    val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    bigrams
      .join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocabSize))
      .select(col("id"),
        log((col("cb") + lit(k)) / (col("cw") + lit(k) * col("vsz"))).as("logp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("logp"))), 4).as("ppl"))
  }

  /** Within-document n-gram repetition ratio — the Gopher-style
    * repetitive-content signal: `(total − distinct) / total` word n-grams
    * (0 = no repetition; boilerplate/spam scores high). Documents shorter
    * than n words score 0.
    *
    * Entirely map-only: the gram list, its distinct, and the ratio are one
    * projection per row — no explode, no shuffle; scales with the scan.
    * Output: (idCol, n_grams, rep_ratio).
    */
  def repetition(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // Token and gram arrays are lambda-bound (see rawShingles/winnow): an
    // inline split would re-run once per gram element (O(tokens²) per doc,
    // measured 100× on 500-token docs), and the `_g` alias would be inlined
    // into each of its reference sites by CollapseProject.
    // Both output columns come from ONE evaluation: the (n_grams, ratio)
    // pair is built as a 1-element struct array inside the bound lambdas
    // and emitted through `inline` — projecting two scalar columns through
    // a struct alias instead would let CollapseProject duplicate the whole
    // gram build per extracted field
    val stat = transform(array(split(col(textCol), " ")), w => {
      val grams = when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
      element_at(transform(array(grams), g => struct(
        size(g).cast("long").as("n_grams"),
        when(size(g) === 0, lit(0.0))
          .otherwise((size(g) - size(array_distinct(g))) * lit(1.0) / size(g))
          .as("rep_ratio"))), 1)
    })
    df.select(col(idCol), inline(stat))
  }

  /** The Gopher rule stopword list (Rae et al. 2021, appendix A1.1): a doc
    * must contain at least `minStopwords` DISTINCT words from this list.
    */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a")

  /** Gopher-style heuristic document filter (Rae et al. 2021, A1.1) plus the
    * C4 line-shape signals — the standard pre-training quality gate a corpus
    * passes before dedup:
    *
    *   - word count within [minWords, maxWords]
    *   - mean word length within [minMeanWordLen, maxMeanWordLen]
    *   - ≥ minAlphaFrac of words contain an alphabetic character
    *   - ≥ minStopwords distinct stopwords present
    *   - < maxBulletFrac of lines start with a bullet ('-', '*', '•')
    *   - < maxEllipsisFrac of lines end with an ellipsis ("..." or "…")
    *
    * Output: (idCol, n_words, mean_word_len, alpha_frac, n_stopwords,
    * bullet_frac, ellipsis_frac, pass) — the signals are kept so callers can
    * tune thresholds from one profiling pass instead of re-scanning.
    *
    * Shape at scale: one map-only projection per row — every signal is an
    * array fold over the row's own tokens/lines, no explode, no shuffle; the
    * gate runs at scan speed on 100 TB. All ratios are single divisions of
    * integers, so results are bit-deterministic across engines.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopwords: Int = 2,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3): DataFrame = {
    val w = split(col(textCol), " ")
    val lines = split(col(textCol), "\n")
    val nWords = size(w)
    val nLines = size(lines)
    val charSum = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    val nAlpha = size(filter(w, x => x.rlike("[A-Za-z]")))
    val nStops = size(array_intersect(array_distinct(split(lower(col(textCol)), " ")),
      lit(gopherStops.toArray)))
    val nBullet = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") || ltrim(l).startsWith("•")))
    val nEllipsis = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…")))
    df.select(col(idCol),
        nWords.cast("long").as("n_words"),
        (charSum * lit(1.0) / nWords).as("mean_word_len"),
        (nAlpha * lit(1.0) / nWords).as("alpha_frac"),
        nStops.cast("long").as("n_stopwords"),
        (nBullet * lit(1.0) / nLines).as("bullet_frac"),
        (nEllipsis * lit(1.0) / nLines).as("ellipsis_frac"))
      .withColumn("pass",
        col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
        col("alpha_frac") >= minAlphaFrac &&
        col("n_stopwords") >= minStopwords &&
        col("bullet_frac") < maxBulletFrac &&
        col("ellipsis_frac") < maxEllipsisFrac)
  }

  /** Learn a byte-pair-encoding merge table from the corpus (Sennrich et
    * al. 2016): starting from characters, repeatedly merge the most
    * frequent adjacent token pair until `numMerges` merges are learned or
    * no pair reaches `minPairCount`. Ties break lexicographically, so the
    * learned table is deterministic on any cluster layout.
    *
    * Scale shape: the only corpus-scale step is ONE word-count aggregation
    * (map-side combinable — the shuffle carries distinct words, not
    * occurrences). The merge loop then runs driver-side over the
    * top-`maxVocab` word-frequency dictionary — the textbook algorithm's
    * own working set, bounded like [[Similarity.kmeans]]'s K centroids.
    * Capping the vocab is the standard BPE-training move (the rare tail
    * carries negligible pair mass); a first distributed-rounds version
    * spent ~0.7 s of pure job overhead per merge on a vocabulary-sized
    * table, so the driver fit is both the faster AND the standard shape.
    */
  def bpeLearn(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    val vocab = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (toks, f) =>
        var i = 0
        while (i < toks.length - 1) {
          counts.updateWith((toks(i), toks(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, kv @ (pair, n)) =>
          if (acc.forall { case (p0, n0) =>
            n > n0 || (n == n0 && Ordering[(String, String)].lt(pair, p0))
          }) Some(kv) else acc
      }
      best match {
        case Some((pair @ (a, b), n)) if n >= minPairCount =>
          merges += pair
          val mergedTok = a + b
          var w = 0
          while (w < vocab.length) {
            val toks = vocab(w)._1
            var hit = false
            var i = 0
            while (!hit && i < toks.length - 1) {
              hit = toks(i) == a && toks(i + 1) == b; i += 1
            }
            if (hit) {
              // greedy left-to-right single-pair rewrite, leftmost first,
              // no re-merge into the freshly made token
              val out = Array.newBuilder[String]
              var j = 0
              while (j < toks.length) {
                if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
                  out += mergedTok; j += 2
                } else { out += toks(j); j += 1 }
              }
              vocab(w) = (out.result(), vocab(w)._2)
            }
            w += 1
          }
          round += 1
        case _ => done = true
      }
    }
    merges.result()
  }

  /** Tokenize with a learned BPE merge table: per word, repeatedly merge
    * the LOWEST-RANK adjacent pair present (the standard priority-order
    * apply — sequential rank-order passes would miss pairs that earlier
    * merges re-create). The merge table broadcasts (it is `numMerges`
    * entries); encoding is a map-only scan with a per-partition word cache,
    * since natural text repeats words heavily. One of the few justified
    * UDFs in the engine: the unbounded merge loop has no HOF expression
    * form.
    *
    * Output: (idCol, bpe_tokens array<string>, n_bpe_tokens).
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(ranks)
    val enc = udf { text: String =>
      if (text == null) Array.empty[String]
      else {
        val r = bc.value
        val cache = scala.collection.mutable.HashMap.empty[String, Array[String]]
        text.toLowerCase.split("\\s+").filter(_.nonEmpty).flatMap { word =>
          cache.getOrElseUpdate(word, encodeWord(word, r))
        }
      }
    }
    df.select(col(idCol), enc(col(textCol)).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }

  private def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var toks = word.map(_.toString).toArray
    var continue = toks.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < toks.length - 1) {
        val rk = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bestPair = (toks(i), toks(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == bestPair._1 && toks(j + 1) == bestPair._2) {
            out += toks(j) + toks(j + 1); j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
        continue = toks.length >= 2
      }
    }
    toks
  }

  /** Email regex shared with the oracle: a pragmatic RFC-lite pattern using
    * only syntax Java regex and RE2 agree on.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (no range validation — scrubbing favors recall). */
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII scrub: mask emails and IPv4 addresses in `textCol`, reporting how
    * many of each were found — the redaction gate training pipelines run
    * before text leaves the curation boundary.
    * Output: (idCol, text_clean, n_emails, n_ips).
    *
    * Pure per-row regex projection — codegen'd `regexp_replace` /
    * `regexp_extract_all`, zero shuffle, scales with the scan. Patterns
    * stick to the Java-regex ∩ RE2 common subset so the same semantics hold
    * on any engine.
    */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_replace(
        regexp_replace(col(textCol), lit(EmailPattern), lit("<EMAIL>")),
        lit(Ipv4Pattern), lit("<IP>")).as("text_clean"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0)))
        .cast("long").as("n_ips"))

  /** `unicode_normalize(str, form)` as a Column (native codegen; see
    * [[org.apache.spark.sql.graft.UnicodeNormalize]]).
    */
  def unicodeNormalize(c: Column, form: String): Column =
    org.apache.spark.sql.graft.GraftColumnsBridge.of(
      org.apache.spark.sql.graft.UnicodeNormalize(
        org.apache.spark.sql.graft.GraftColumnsBridge.expr(c), form))

  /** Canonical text normalization — the step BEFORE any exact/fuzzy dedup or
    * tokenization, because byte-different renderings of the same text (NFC
    * vs decomposed accents, stray control chars, whitespace runs, case) are
    * the classic silent near-duplicate source:
    * Unicode-normalize (`form`: NFC default; NFKC folds ligatures/widths
    * too) → strip control characters → optional lowercase → collapse
    * whitespace runs to one space → trim. Output: `idCol`, `text_norm`.
    *
    * Pure per-row projection (native normalize kernel + codegen'd
    * `regexp_replace`), zero shuffle, scales with the scan. Both regexes
    * use EXPLICIT character classes (not `\p{Cc}` / `\s`, whose ASCII-range
    * membership differs between regex engines — tab/newline ARE category Cc,
    * and Java's `\s` includes U+000B where RE2's doesn't): the strip class
    * is the non-whitespace C0/C1 controls, the collapse class is the five
    * ASCII whitespace controls + space — identical on any engine, the same
    * Java∩RE2 discipline as [[scrubPii]].
    */
  def normalizeText(df: DataFrame, idCol: String, textCol: String,
      form: String = "NFC", lowercase: Boolean = true): DataFrame = {
    val normed = unicodeNormalize(col(textCol), form)
    // C0/C1 controls minus the whitespace ones (U+0009–U+000D)
    val stripped = regexp_replace(normed,
      lit("[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F]"), lit(""))
    val cased = if (lowercase) lower(stripped) else stripped
    df.select(col(idCol),
      trim(regexp_replace(cased, lit("[ \\t\\n\\x0B\\f\\r]+"), lit(" ")))
        .as("text_norm"))
  }

  /** Sentence segmentation: one row per sentence, a sentence being a
    * maximal run of non-terminator characters plus its `[.!?]+` terminator
    * run (a trailing fragment without a terminator is a sentence too).
    * Whitespace-only fragments are dropped; `sent_idx` keeps the
    * pre-filter position so downstream windows stay aligned with the
    * source. Output: (idCol, sent_idx, sentence).
    *
    * Map-only (one `regexp_extract_all` + posexplode per row). The pattern
    * uses `\z`, not `$`: Java's `$` also matches before a FINAL newline
    * where RE2's does not — the one Java∩RE2 divergence a trailing-newline
    * document would hit.
    */
  private val SentencePattern = "[^.!?]+(?:[.!?]+|\\z)"

  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(regexp_extract_all(col(textCol), lit(SentencePattern), lit(0))))
      .select(col(idCol), col("pos").cast("long").as("sent_idx"),
        trim(col("col")).as("sentence"))
      .filter(col("sentence") =!= "")

  /** Paragraph segmentation: split on blank-line runs (one-or-more newlines
    * separated by optional horizontal whitespace — the CCNet-style unit for
    * per-paragraph dedup/quality scoring before chunking). Whitespace-only
    * paragraphs are dropped; `par_idx` keeps the pre-filter position.
    * Output: (idCol, par_idx, paragraph). Map-only, one split + posexplode
    * per row; the pattern stays in the Java∩RE2 subset.
    */
  def paragraphs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(split(col(textCol), "\\n[ \\t]*\\n+")))
      .select(col(idCol), col("pos").cast("long").as("par_idx"),
        trim(col("col")).as("paragraph"))
      .filter(col("paragraph") =!= "")

  /** Sentence-window chunking: consecutive groups of `sentsPerChunk`
    * sentences per document, rebuilt in order — the long-document →
    * training-sequence step at sentence granularity (vs
    * [[graft.ops.Curate.chunkDocuments]]'s token windows, which can split
    * mid-sentence). One segmentation pass + one id-keyed aggregation; the
    * ordered rebuild is a sorted in-group array, never a window. Output:
    * (idCol, chunk_idx, chunk, n_sents).
    */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
      sentsPerChunk: Int): DataFrame = {
    require(sentsPerChunk > 0, "need sentsPerChunk > 0")
    // rank sentences AFTER the empty-fragment filter so chunks fill fully
    sentences(df, idCol, textCol)
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("sent_idx"), col("sentence"))))
        .as("_ordered"))
      .select(col(idCol), posexplode(col("_ordered")))
      .select(col(idCol), (col("pos") / sentsPerChunk).cast("long").as("chunk_idx"),
        col("col").getField("sentence").as("sentence"), col("pos"))
      .groupBy(idCol, "chunk_idx")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("sentence")))),
          s => s.getField("sentence")), " ").as("chunk"),
        count(lit(1)).as("n_sents"))
  }

  /** TF-IDF keyword extraction: top-`k` terms per document by
    * `tf · ln(N/df)` (raw term frequency × inverse document frequency),
    * ties → lexicographically first term. Output: (idCol, rank, term).
    *
    * Scale shape: one token explode → one partial-aggregating (id, term)
    * count → one term-keyed doc-frequency aggregation joined back on the
    * term key (vocabulary-scale, bounded by distinct terms — never a
    * corpus-row shuffle) → the corpus size N rides a 1-row broadcast →
    * per-doc ranking via the bounded two-phase `top_k_by_score` aggregate
    * (≤k rows per (doc, partition) cross the shuffle; no rank window).
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val terms = df.select(col(idCol), explode(toks(col(textCol))).as("term"))
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("weight", col("tf") * log(col("n_docs") / col("df")))
      .groupBy(idCol)
      .agg(Similarity.topKByScore(col("weight"), col("term"), k).as("_top"))
      .select(col(idCol), posexplode(col("_top")))
      .select(col(idCol), (col("pos") + 1).as("rank"),
        col("col").getField("payload").as("term"))
  }

  /** Per-document character-level Shannon entropy (nats) — the
    * model-free noise/boilerplate signal the heuristic filter families
    * (Gopher, RefinedWeb) approximate with compression ratio: low entropy
    * = repetitive template content, implausibly high = binary junk or
    * encoding damage. Output: (idCol, n_chars, entropy), entropy rounded
    * to 1e-4.
    *
    * Scale shape: one character explode into a map-side-combinable
    * (id, char) count, then the doc length as a window sum over that
    * ALREADY-AGGREGATED frame — the explode subtree appears exactly once
    * in the plan BY CONSTRUCTION (a self-join formulation would carry it
    * twice and lean on ReuseExchange to collapse them — the fragility
    * minhashEstimatePairs/keepCanonical cache away), and the window's
    * id-partitioning is reused by the final id-keyed aggregation.
    * Alphabet-bounded after partial aggregation.
    * Reproducibility: each p·ln(p) term is rounded to 12 decimals and
    * carried as DECIMAL so the per-doc sum is exact and associative —
    * aggregation order, libm build, and engine cannot flip the 4-decimal
    * rounding (the DSIR/kmeans exact-decimal discipline).
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = df.select(col(idCol).as("id"),
      explode(split(col(textCol), "")).as("c"))
    val counts = chars.groupBy("id", "c").agg(count(lit(1)).as("cnt"))
    val p = col("cnt") * lit(1.0) / col("len")
    counts
      .withColumn("len", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")))
      .withColumn("term", round(p * log(p), 12).cast("decimal(28,12)"))
      .groupBy("id")
      .agg(max("len").as("n_chars"),
        round((-sum(col("term"))).cast("double"), 4).as("entropy"))
      .withColumnRenamed("id", idCol)
  }

  /** Corpus-frequent word n-grams — the boilerplate-mining pass whose
    * output seeds template-removal filters (`Dedup.removeRepeatedLines` /
    * `removeDuplicatedSpans`): top-`k` n-grams by total occurrences (ties →
    * lexicographically first), with document frequency alongside so
    * "every doc says it once" (navigation chrome) separates from "one doc
    * repeats it" (spam).
    *
    * Scale shape: per-doc n-gram construction is a HOF (no row growth until
    * the single explode), the count aggregation is map-side combinable —
    * the shuffle carries one row per distinct gram per partition, not per
    * occurrence — and `minCount` prunes the long singleton tail BEFORE the
    * bounded top-k (`TakeOrderedAndProject`: k rows per partition, never a
    * global sort). For corpora whose distinct-gram count itself explodes,
    * the same two-pass shape drops in a `count_min_sketch` first pass; the
    * exact aggregation here IS the verify half of that composition.
    */
  def frequentNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 100, minCount: Long = 2): DataFrame =
    heavyGrams(gramStream(df, idCol, textCol, n), k, minCount)

  /** As [[frequentNgrams]] with a count-min-sketch pre-pass — the form for
    * corpora whose DISTINCT gram count is itself huge (the common case: on
    * web text most grams are singletons). Pass 1 folds every gram into a
    * fixed-size sketch (one distributed aggregation, ~MBs of driver state
    * at any corpus size); the sketch then rides a broadcast and a
    * might-be-heavy probe drops sub-`minCount` grams BEFORE the count
    * shuffle, which shrinks from "one row per distinct gram per partition"
    * to just the candidates. CMS only ever overestimates, so the candidate
    * set is a superset of the truly heavy grams and the exact second-pass
    * aggregation returns EXACTLY [[frequentNgrams]]'s answer — the sketch
    * prunes work, it never decides (the repo-wide sketch discipline, same
    * as the dedup Bloom). `eps`/`confidence` size the sketch: width 2/eps
    * counters × depth ln(1/(1−confidence)) — overestimation beyond
    * eps·(total grams) has probability 1−confidence, and any overestimate
    * only costs verify work, never correctness.
    */
  def frequentNgramsSketched(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 100, minCount: Long = 2,
      eps: Double = 1e-5, confidence: Double = 0.999): DataFrame = {
    val grams = gramStream(df, idCol, textCol, n)
    val cms = grams.stat.countMinSketch("gram", eps, confidence, seed = 42)
    val bc = df.sparkSession.sparkContext.broadcast(cms)
    val mightBeHeavy = udf((g: String) =>
      g != null && bc.value.estimateCount(g) >= minCount)
    heavyGrams(grams.filter(mightBeHeavy(col("gram"))), k, minCount)
  }

  /** (_id, gram) word-n-gram stream: HOF construction, one explode. The
    * token array is lambda-bound (the rawShingles/winnow guard) so the
    * split can never be re-evaluated per gram element when the explode
    * folds this projection into the Generate.
    */
  private def gramStream(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"gramStream: n must be >= 1, got n=$n")
    val grams = flatten(transform(array(toks(col(textCol))), t => {
      val m = size(t) - n + 1
      when(m >= 1, transform(sequence(lit(1), greatest(m, lit(1))),
        i => array_join(slice(t, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }))
    df.select(col(idCol).as("_id"), explode(grams).as("gram"))
  }

  private def heavyGrams(grams: DataFrame, k: Int, minCount: Long): DataFrame = {
    require(k >= 1, s"frequentNgrams: k must be >= 1, got k=$k")
    grams.groupBy("gram")
      .agg(count(lit(1)).as("total"), countDistinct("_id").as("doc_freq"))
      .filter(col("total") >= minCount)
      .orderBy(col("total").desc, col("gram"))
      .limit(k)
  }

  /** Winnowing fingerprint selection (the MOSS scheme: Schleimer, Wilkerson
    * & Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): hash every `k`-token gram, slide a window of `w`
    * consecutive gram hashes, and keep the minimum hash of each window.
    * The selected set is position-independent but LOCAL — any shared
    * substring of ≥ `w + k − 1` tokens between two documents is guaranteed
    * to contribute at least one common fingerprint, the guarantee plain
    * min-hashing (global minimum) lacks. Documents with at least one gram
    * but fewer than `w` windows keep the minimum of what they have, so no
    * non-empty document fingerprints to the empty set.
    *
    * Output: (idCol, n_grams, fps) where `fps` is the sorted distinct
    * selected gram hashes (md5 hex — string order is byte order in every
    * engine, so window minima are engine-portable).
    *
    * Scale shape: winnowing is per-document, so this is MAP-ONLY — the
    * gram hashing and window minima run inside one codegen'd projection
    * (higher-order functions over the token array), no explode, no
    * shuffle, no state. At 100 TB it is a streaming pass over the corpus
    * bounded by CPU, the ideal operator shape; the downstream join over
    * selected fingerprints (see `Dedup.winnowCandidatePairs`) touches only
    * the ~1/w-sampled fingerprint stream instead of every gram.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowFingerprints: k and w must be >= 1, got k=$k w=$w")
    val emptyS = array().cast("array<string>")
    // The token and hash arrays are bound as HOF LAMBDA VARIABLES
    // (`transform(array(x), v => ...)`), not projection aliases:
    // CollapseProject inlines aliases into every use site, and a downstream
    // `explode` folds this whole projection into the Generate — an aliased
    // hash array would then be RECOMPUTED inside each per-window lambda
    // element, turning the O(m·w) winnow into O(m²) md5 calls per document
    // (measured 36× slower at sf0.1). Lambda bindings are opaque to the
    // optimizer, so each array is evaluated exactly once per row no matter
    // what collapses around it.
    val winnowed = flatten(transform(array(toks(col(textCol))), t => {
      val m = size(t) - k + 1 // gram count (may be <= 0 for short docs)
      // sequence(1, m) flips direction when m < 1 — greatest-guard it; the
      // when() below never evaluates the gram branch for short docs anyway
      val grams = transform(sequence(lit(1), greatest(m, lit(1))),
        i => md5(array_join(slice(t, i, lit(k)), " ")))
      flatten(transform(array(when(m >= 1, grams).otherwise(emptyS)), h =>
        when(size(h) >= 1,
          array_sort(array_distinct(transform(
            sequence(lit(1), greatest(size(h) - w + 1, lit(1))),
            s => array_min(slice(h, s, lit(w)))))))
          .otherwise(emptyS)))
    }))
    df.select(col(idCol),
      greatest(size(toks(col(textCol))) - k + 1, lit(0)).as("n_grams"),
      winnowed.as("fps"))
  }
}
