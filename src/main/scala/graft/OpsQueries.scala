package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curate, Dedup, Multimodal, Similarity, TextOps}
import graft.Queries.Q

/** LLM-data-pipeline operators, driver-checked. Dedup/text corpora are
  * salted with synthetic duplicates (exact copies at id+200000, near-copies
  * with appended words at id+100000; embedding near-copies scaled ×1.01) so
  * every detector provably *finds* something — the oracle mirrors the same
  * salting in SQL.
  */
object OpsQueries {

  // --- shared corpora (Spark side) -----------------------------------------

  // Both corpora are spread round-robin across the cluster before the
  // CPU-heavy operators (shingle explode, signature hashing): the small test
  // parquet is a single split, which would otherwise serialize the map side
  // onto 1-3 cores — unrepresentative of production, where the input arrives
  // in thousands of splits. The repartition shuffles only the (tiny) doc
  // rows and is what a real pipeline does when its source is under-split.
  private def textCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents").select(col("doc_id").as("id"), col("text"))
    docs
      .unionByName(docs.filter(col("id") % 5 === 0)
        .select((col("id") + 100000).as("id"),
          concat(col("text"), lit(" extra words appended")).as("text")))
      .unionByName(docs.filter(col("id") % 7 === 0)
        .select((col("id") + 200000).as("id"), col("text")))
      .repartition(s.sparkContext.defaultParallelism)
  }

  // The same under-split-source discipline as textCorpus, for queries that
  // consume the documents table directly: the test-SF parquet arrives as
  // ONE split, so a CPU-heavy map side (shingle explode + 16-128 md5 mins
  // per shingle) would otherwise serialize onto 1-3 cores — precisely what
  // a 1000-executor cluster never does (SCALING.md pin). The shuffle moves
  // only the tiny doc table; every downstream result is
  // partitioning-independent.
  private def docsPar(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents").repartition(s.sparkContext.defaultParallelism)

  // NOT repartitioned like docsPar (r15 A/B, pinned negative): the vector
  // rows are small enough at bench SF that the added exchange costs more
  // than the map-side parallelism buys on every sub-second sim row
  // (0.11→0.22 s on clean runs); embCorpus repartitions where the salted
  // union makes the compute heavy enough to pay
  private def embBase(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings").select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  private def embCorpus(s: SparkSession, d: String): DataFrame = {
    val base = embBase(s, d)
    base.unionByName(base.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("label"),
        transform(col("v"), x => x * 1.01).as("v")))
      .repartition(s.sparkContext.defaultParallelism)
  }

  // --- shared corpora (oracle side) ----------------------------------------

  private val textCorpusSql =
    """WITH corpus AS (
      |  SELECT doc_id AS id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text || ' extra words appended'
      |    FROM documents WHERE doc_id % 5 = 0
      |  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0)
      |""".stripMargin

  private val embBaseSql =
    """WITH base AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings)
      |""".stripMargin

  private val embCorpusSql = embBaseSql +
    """, corpus AS (
      |  SELECT * FROM base
      |  UNION ALL SELECT vec_id + 100000, label, list_transform(v, x -> x * 1.01)
      |    FROM base WHERE vec_id % 5 = 0)
      |""".stripMargin

  private val cosSql =
    "list_sum(list_transform(list_zip(%A, %B), p -> p[1]*p[2])) / " +
      "(sqrt(list_sum(list_transform(%A, x -> x*x))) * sqrt(list_sum(list_transform(%B, x -> x*x))))"
  private def cos(a: String, b: String): String =
    cosSql.replace("%A", a).replace("%B", b)

  /** DuckDB mirror of `Similarity.projectionColumn(64, 8, "rp")`: the same
    * md5-seeded ±1 matrix unrolled as explicit left-associated arithmetic,
    * so both engines run the identical double-op sequence bit-for-bit.
    */
  private def projSqlExpr(v: String): String =
    Similarity.projectionSigns(64, 8, "rp").map { row =>
      "(" + row.zipWithIndex.map { case (sgn, i) =>
        s"$v[${i + 1}] * ${if (sgn > 0) "1.0" else "-1.0"}"
      }.mkString(" + ") + ") / sqrt(CAST(8 AS DOUBLE))"
    }.mkString("[", ", ", "]")

  /** The in-engine classifier train+score chain mirrored in DuckDB SQL —
    * shared by `curate_classifier_score` and the gated variant.
    */
  private lazy val classifierScoreSql: String = {
        def bucket(h: String) = (0 until 3).map { i =>
          val w = 1 << (4 * (2 - i))
          s"(strpos('0123456789abcdef', substr(md5($h), ${i + 1}, 1)) - 1) * $w"
        }.mkString(" + ")
        val sig = (m: String) =>
          s"0.5 + CAST($m AS DOUBLE) / (2.0 * (1.0 + abs(CAST($m AS DOUBLE))))"
        s"""WITH ct0 AS (SELECT doc_id AS id,
           |  CASE WHEN source IN ('src0','src1','src2','src3','src4')
           |       THEN 1.0 ELSE 0.0 END AS y,
           |  unnest(string_split(lower(text), ' ')) AS tok FROM documents),
           |db AS (SELECT id, y, ${bucket("tok")} AS bucket, count(*) AS c
           |  FROM ct0 GROUP BY 1, 2, 3),
           |nn AS (SELECT count(DISTINCT id) AS n FROM db),
           |w0 AS (SELECT DISTINCT bucket, CAST(0 AS DECIMAL(18,12)) AS w FROM db),
           |m1 AS (SELECT id, y, sum(CAST(c AS DECIMAL(10,0))
           |         * coalesce(w, CAST(0 AS DECIMAL(18,12)))) AS m
           |  FROM db LEFT JOIN w0 USING (bucket) GROUP BY 1, 2),
           |p1 AS (SELECT id, ${sig("m")} AS p FROM m1),
           |g1 AS (SELECT bucket, sum(CAST(round(p - y, 12) AS DECIMAL(13,12))
           |         * CAST(c AS DECIMAL(10,0))) AS g
           |  FROM db JOIN p1 USING (id) GROUP BY bucket),
           |w1 AS (SELECT w0.bucket, CAST(round(CAST(w0.w AS DOUBLE)
           |         - 1.0 * coalesce(CAST(g AS DOUBLE), 0.0) / n, 12) AS DECIMAL(18,12)) AS w
           |  FROM w0 LEFT JOIN g1 USING (bucket) CROSS JOIN nn),
           |m2 AS (SELECT id, y, sum(CAST(c AS DECIMAL(10,0))
           |         * coalesce(w, CAST(0 AS DECIMAL(18,12)))) AS m
           |  FROM db LEFT JOIN w1 USING (bucket) GROUP BY 1, 2),
           |p2 AS (SELECT id, ${sig("m")} AS p FROM m2),
           |g2 AS (SELECT bucket, sum(CAST(round(p - y, 12) AS DECIMAL(13,12))
           |         * CAST(c AS DECIMAL(10,0))) AS g
           |  FROM db JOIN p2 USING (id) GROUP BY bucket),
           |w2 AS (SELECT w1.bucket, CAST(round(CAST(w1.w AS DOUBLE)
           |         - 1.0 * coalesce(CAST(g AS DOUBLE), 0.0) / n, 12) AS DECIMAL(18,12)) AS w
           |  FROM w1 LEFT JOIN g2 USING (bucket) CROSS JOIN nn),
           |sb AS (SELECT id, bucket, sum(c) AS c FROM db GROUP BY 1, 2),
           |sm AS (SELECT id, sum(CAST(c AS DECIMAL(10,0))
           |         * coalesce(w, CAST(0 AS DECIMAL(18,12)))) AS m
           |  FROM sb LEFT JOIN w2 USING (bucket) GROUP BY 1)
           |SELECT id AS doc_id, round(${sig("m")}, 4) AS score FROM sm""".stripMargin
  }

  /** Unrolled DuckDB CTE chain for a product-quantization codebook over
    * `from` (64-dim vectors): m=2 subspaces of 32 dims, `k` seeds (lowest
    * vec_ids — or lowest `md5(vec_id)` with `seedByHash`, the portable
    * hash-seeded discipline — dense cid = seed rank), ONE joint-L2 Lloyd
    * round with exact decimal means rounded to 9 digits — mirrors
    * `Similarity.pqTrain(m=2, k, iters=1, roundDigits=9)`. Ends with
    * `pcents(sub, cid, cv)`; also leaves `sliced(vec_id, sub, sv)` for
    * downstream encode CTEs. Distances accumulate left-to-right like the
    * fused `pq_encode` loop, so ties are exact on both engines or neither.
    */
  private def pqTrainSql(k: Int, from: String = "base",
      seedByHash: Boolean = false): String = {
    val ord = if (seedByHash) "md5(CAST(vec_id AS VARCHAR)), vec_id" else "vec_id"
    s"""subs AS (SELECT unnest(range(2)) AS sub),
       |pseeds AS (
       |  SELECT s.sub, r.cid, list_slice(r.v, s.sub*32+1, (s.sub+1)*32) AS cv
       |  FROM (SELECT vec_id, v, row_number() OVER (ORDER BY $ord) - 1 AS cid
       |        FROM (SELECT * FROM $from ORDER BY $ord LIMIT $k)) r
       |  CROSS JOIN subs s),
       |sliced AS (
       |  SELECT b.vec_id, s.sub, list_slice(b.v, s.sub*32+1, (s.sub+1)*32) AS sv
       |  FROM $from b CROSS JOIN subs s),
       |pscored AS (
       |  SELECT l.vec_id, l.sub, c.cid,
       |         row_number() OVER (PARTITION BY l.vec_id, l.sub
       |           ORDER BY list_sum(list_transform(list_zip(l.sv, c.cv),
       |                    p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.cid) AS rn
       |  FROM sliced l JOIN pseeds c ON l.sub = c.sub),
       |passigned AS (SELECT vec_id, sub, cid FROM pscored WHERE rn = 1),
       |pex AS (SELECT a.sub, a.cid, unnest(l.sv) AS x, unnest(range(len(l.sv))) AS i
       |        FROM passigned a JOIN sliced l ON a.vec_id = l.vec_id AND a.sub = l.sub),
       |pdims AS (SELECT sub, cid, i,
       |            round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 9) AS mv
       |          FROM pex GROUP BY 1, 2, 3),
       |pcents AS (SELECT sub, cid, list(mv ORDER BY i) AS cv FROM pdims GROUP BY sub, cid)"""
      .stripMargin
  }

  /** Encode CTE against `pcents`: per-(vec, sub) L2 argmin, tie → lowest
    * cid. Ends with `ecodes(vec_id, sub, cid)`.
    */
  private val pqEncodeSql =
    """escored AS (
      |  SELECT l.vec_id, l.sub, c.cid,
      |         row_number() OVER (PARTITION BY l.vec_id, l.sub
      |           ORDER BY list_sum(list_transform(list_zip(l.sv, c.cv),
      |                    p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.cid) AS rn
      |  FROM sliced l JOIN pcents c ON l.sub = c.sub),
      |ecodes AS (SELECT vec_id, sub, cid FROM escored WHERE rn = 1)""".stripMargin

  /** Unrolled DuckDB CTE chain for `iters` Lloyd rounds over `base`
    * (mirrors Similarity.kmeans with seedByHash=true, roundDigits=9):
    * md5-ordered seeds, then per round cosine assignment (tie → lowest
    * centroid) and exact-decimal means rounded to 9 digits. Ends with a
    * `cents$iters(centroid_id, cv)` CTE.
    */
  private def kmeansRoundsSql(iters: Int, k: Int, from: String = "base"): String = {
    val sb = new StringBuilder(
      s"""seeds AS (SELECT vec_id AS centroid_id, v AS cv FROM $from
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k)""".stripMargin)
    var prev = "seeds"
    for (r <- 1 to iters) {
      sb.append(
        s"""
           |,scored$r AS (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.cv")} DESC, c.centroid_id) AS rn
           |  FROM $from b CROSS JOIN $prev c),
           |assigned$r AS (SELECT vec_id, v, centroid_id FROM scored$r WHERE rn = 1),
           |ex$r AS (SELECT centroid_id, unnest(v) AS x, unnest(range(len(v))) AS i FROM assigned$r),
           |dims$r AS (SELECT centroid_id, i,
           |             round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 9) AS m
           |           FROM ex$r GROUP BY 1, 2),
           |cents$r AS (SELECT centroid_id, list(m ORDER BY i) AS cv FROM dims$r GROUP BY centroid_id)""".stripMargin)
      prev = s"cents$r"
    }
    sb.toString
  }

  /** Unrolled DuckDB CTE chain for `rounds` BPE learn rounds (mirrors
    * TextOps.bpeLearn with minPairCount=2): expects a `v(w, f)` CTE (the
    * distinct lowercase word-frequency vocabulary) and ends with CTEs
    * `m1..m$rounds` (each round's merged pair, EMPTY once the best pair
    * count falls under 2 — the Scala loop's stop) and `s$rounds` (the
    * final per-word state). State encoding: each word's tokenization is
    * ONE string with every token WRAPPED in chr(31) (sep||tok||sep,
    * concatenated), so DuckDB's left-to-right non-overlapping replace()
    * of sep||a||sep||sep||b||sep with sep||a·b||sep is EXACTLY the learn
    * rewrite (greedy leftmost, no re-merge into the fresh token), with
    * the DOUBLED separator keeping matches token-aligned (a pair inside
    * a longer token never matches) and adjacent occurrences from sharing
    * a boundary character (["a","b","a","b"] merges to ["ab","ab"], not
    * ["ab","a","b"]). Argmax tiebreak (count DESC, a, b) matches the
    * Scala loop; the comparison space is ASCII on this corpus, so
    * UTF-16-vs-UTF-8 collation cannot diverge (the text_bpe_first_merge
    * caveat). An argmax-less round leaves the state unchanged, so all
    * later rounds no-op too — equivalent to the loop's early stop.
    *
    * TWO MORE ORACLE-VALIDITY BOUNDS (r14 ADVICE), both comfortably
    * satisfied by the test corpus and asserted where cheap:
    *  - VOCAB CAP: this SQL learns over the FULL distinct vocabulary while
    *    [[graft.ops.TextOps.bpeLearn]] caps at `maxVocab` = 2^20 by
    *    frequency — on a corpus whose distinct lowercase word count
    *    exceeds 2^20 the two sides diverge even when the engine is
    *    correct (the sfX documents tables are ~10^3-10^5 words; the
    *    text_bpe_learn query asserts the margin at run time);
    *  - SEPARATOR-FREE TEXT: the chr(31) state encoding requires that no
    *    corpus word CONTAINS chr(31) (US unit-separator) — a word carrying
    *    it would split into phantom tokens on the SQL side only. True for
    *    the test corpus by construction (space-tokenized printable text).
    */
  private def bpeLearnRoundsSql(rounds: Int): String = {
    val sep = "chr(31)"
    val sb = new StringBuilder(
      s"""s0 AS (SELECT w, f, array_to_string(list_transform(range(1, len(w) + 1),
         |         i -> $sep || substr(w, CAST(i AS INT), 1) || $sep), '') AS s
         |       FROM v)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(
        s"""
           |,t$r AS (SELECT f, list_filter(string_split(s, $sep), x -> len(x) > 0) AS t
           |        FROM s${r - 1}),
           |p$r AS (SELECT t[CAST(i AS INT)] AS a, t[CAST(i AS INT) + 1] AS b, f
           |        FROM (SELECT t, f, unnest(range(1, len(t))) AS i FROM t$r
           |              WHERE len(t) >= 2)),
           |m$r AS (SELECT a, b FROM (SELECT a, b, sum(f) AS cnt FROM p$r
           |                          GROUP BY a, b HAVING sum(f) >= 2)
           |        ORDER BY cnt DESC, a, b LIMIT 1),
           |s$r AS (SELECT x.w, x.f, CASE WHEN m.a IS NULL THEN x.s ELSE
           |          replace(x.s, $sep || m.a || $sep || $sep || m.b || $sep,
           |                  $sep || m.a || m.b || $sep) END AS s
           |        FROM s${r - 1} x LEFT JOIN m$r m ON TRUE)""".stripMargin)
    }
    sb.toString
  }

  // DuckDB shingle expansion of corpus → (id, sh) distinct 3-grams
  private val shinglesSql =
    """words AS (SELECT id, string_split(text, ' ') AS w FROM corpus),
      |sh0 AS (SELECT DISTINCT id,
      |          unnest(list_transform(range(len(w)-2), i -> array_to_string(w[i+1:i+3], ' '))) AS sh
      |        FROM words)
      |""".stripMargin

  // DuckDB 16-bit simhash mirror of Dedup.simhash
  private val simhashOracle: String = {
    val value = (0 until 16).map { b =>
      val bit = s"((strpos('0123456789abcdef', substr(h, ${1 + b / 4}, 1)) - 1) >> ${3 - b % 4} & 1)"
      s"CASE WHEN sum(2 * $bit - 1) > 0 THEN ${1 << b} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (SELECT DISTINCT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hx AS (SELECT id, substr(md5(tok), 1, 4) AS h FROM toks)
       |SELECT id, ($value) AS simhash FROM hx GROUP BY id""".stripMargin
  }

  private val langCase: String = {
    val scores = TextOps.profiles.map { case (l, ws) =>
      l -> s"len(list_filter(string_split(lower(text), ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val whens = scores.map { case (l, e) => s"WHEN $e = $best AND $e > 0 THEN '$l'" }.mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  /** sim_ivf_pq_e2e's full oracle - shared verbatim with the persisted
    * index row (persistence must not change a single neighbor). */
  private lazy val ivfPqE2eOracle: Option[String] = Some(embBaseSql +
        s""", seeds AS (SELECT vec_id AS centroid_id, v AS cv FROM base ORDER BY vec_id LIMIT 8),
           |kscored AS (
           |  SELECT b.vec_id, b.v, s.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "s.cv")} DESC, s.centroid_id) AS rn
           |  FROM base b CROSS JOIN seeds s),
           |kassigned AS (SELECT vec_id, v, centroid_id FROM kscored WHERE rn = 1),
           |kex AS (SELECT centroid_id, unnest(v) AS x, unnest(range(len(v))) AS i FROM kassigned),
           |kdims AS (SELECT centroid_id, i,
           |            round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 9) AS m
           |          FROM kex GROUP BY 1, 2),
           |cents AS (SELECT centroid_id, list(m ORDER BY i) AS centv FROM kdims GROUP BY centroid_id),
           |cellranked AS (
           |  SELECT b.vec_id, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cents c),
           |cells AS (SELECT vec_id, centroid_id FROM cellranked WHERE rn = 1),
           |""".stripMargin + pqTrainSql(k = 4) + ", " + pqEncodeSql +
        s""", recon AS (
           |  SELECT e.vec_id, flatten(list(c.cv ORDER BY c.sub)) AS vhat
           |  FROM ecodes e JOIN pcents c ON c.sub = e.sub AND c.cid = e.cid
           |  GROUP BY e.vec_id),
           |q AS (SELECT b.vec_id AS query_id, b.v AS qv, g.centroid_id
           |      FROM base b JOIN cells g USING (vec_id)
           |      WHERE b.vec_id >= 100 AND b.vec_id < 110),
           |ppairs AS (
           |  SELECT q.query_id, r.vec_id AS neighbor_id,
           |    list_sum(list_transform(range(2), s ->
           |      list_sum(list_transform(list_zip(list_slice(q.qv, s*32+1, (s+1)*32),
           |                                       list_slice(r.vhat, s*32+1, (s+1)*32)),
           |               p -> p[1]*p[2]))))
           |    / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
           |       * sqrt(list_sum(list_transform(range(2), s ->
           |           list_sum(list_transform(list_slice(r.vhat, s*32+1, (s+1)*32),
           |                    x -> x*x))))))
           |    AS cos
           |  FROM q JOIN cells n ON n.centroid_id = q.centroid_id
           |  JOIN recon r ON r.vec_id = n.vec_id
           |  WHERE n.vec_id <> q.query_id)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM ppairs)
           |WHERE rank <= 3""".stripMargin)

  val all: Map[String, Q] = Map(

    // ---------------- dedup ----------------

    "dedup_exact" -> Q(
      (s, d) => Dedup.exactGroups(textCorpus(s, d), "id", "text"),
      Some(textCorpusSql +
        """SELECT md5(text) AS fp, count(*) AS cnt, min(id) AS canonical
          |FROM corpus GROUP BY md5(text) HAVING count(*) > 1""".stripMargin)),

    // normalize → dedup composition: byte-different renderings of the same
    // text (decomposed accents, case, whitespace runs) are invisible to
    // byte-level exact dedup but collapse after canonicalization — the
    // id+300000 salt re-encodes each %9 doc decomposed/uppercased/padded,
    // detectable ONLY through the normalize step (both engines mirror it)
    "dedup_normalized" -> Q(
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select(col("doc_id").as("id"), col("text"))
        val salted = docs.unionByName(docs.filter(col("id") % 9 === 0)
          .select((col("id") + 300000).as("id"),
            concat(lit("  "), upper(col("text")), lit("\t")).as("text")))
        Dedup.exactGroups(
          TextOps.normalizeText(salted, "id", "text")
            .withColumnRenamed("text_norm", "text"), "id", "text")
      },
      Some("""WITH salted AS (
             |  SELECT doc_id AS id, text FROM documents
             |  UNION ALL SELECT doc_id + 300000, '  ' || upper(text) || chr(9)
             |    FROM documents WHERE doc_id % 9 = 0),
             |normed AS (
             |  SELECT id,
             |    trim(regexp_replace(lower(regexp_replace(nfc_normalize(text),
             |      '[\x00-\x08\x0E-\x1F\x7F-\x9F]', '', 'g')),
             |      '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text
             |  FROM salted)
             |SELECT md5(text) AS fp, count(*) AS cnt, min(id) AS canonical
             |FROM normed GROUP BY md5(text) HAVING count(*) > 1""".stripMargin)),

    // the NEAR-dup incremental twin: new batch (doc_id % 3 = 0) LSH-probed
    // against the landed rest — bipartite banded join, signature-estimate
    // verify at est >= 0.5 (= >= 8 of 16 agreeing slots, an exact integer
    // cut both sides), plus the within-batch lower-id pass. The oracle
    // mirrors the md5-minhash/banded construction of dedup_corpus_clean_lsh
    // so the candidate sets are structurally equal.
    "dedup_incremental_near" -> Q(
      (s, d) => {
        val docs = docsPar(s, d).select(col("doc_id").as("id"), col("text"))
        Dedup.dedupIncrementalNear(
          docs.filter(col("id") % 3 === 0), docs.filter(col("id") % 3 =!= 0),
          "id", "text", n = 3, numPerms = 16, bands = 4, threshold = 0.5)
          .select(col("id").as("doc_id"), md5(col("text")).as("fp"))
      },
      Some("""WITH t AS (SELECT doc_id AS id, CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS inc,
             |                 string_split(text, ' ') AS w FROM documents),
             |g AS (SELECT id, inc, unnest(list_transform(range(len(w)-2),
             |        i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM t),
             |perms AS (SELECT id, inc, sh, unnest(range(16)) AS p FROM g),
             |mh AS (SELECT id, inc, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2, 3),
             |bnd AS (SELECT id, inc, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2, 3),
             |candL AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |          ON a.band = b.band AND a.bk = b.bk AND a.inc = 1 AND b.inc = 0),
             |candI AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |          ON a.band = b.band AND a.bk = b.bk AND a.inc = 1 AND b.inc = 1
             |          AND a.id < b.id),
             |agL AS (SELECT c.d1, c.d2 FROM candL c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY 1, 2 HAVING count(*) >= 8),
             |agI AS (SELECT c.d1, c.d2 FROM candI c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY 1, 2 HAVING count(*) >= 8)
             |SELECT d.doc_id, md5(d.text) AS fp FROM documents d
             |WHERE d.doc_id % 3 = 0 AND d.doc_id NOT IN
             |  (SELECT d1 FROM agL UNION SELECT d2 FROM agI)""".stripMargin)),

    // the r15 PARTITION-PRUNED incremental probe: same semantics as
    // dedup_incremental_near (identical oracle), but the landed side is a
    // persisted SignatureIndex — half rebuilt into the partitioned base,
    // half appended as a delta, so BOTH probe paths (pruned base
    // subdirectories + delta union) are under the hash check. Kept-set
    // equality to the scanning path is the index's whole contract.
    "dedup_incremental_indexed" -> Q(
      (s, d) => {
        val docs = docsPar(s, d).select(col("doc_id").as("id"), col("text"))
        val landed = docs.filter(col("id") % 3 =!= 0)
        val idx = graft.ops.SignatureIndex.create(s,
          TempDirs.create("graft-sigidx-") + "/idx", n = 3, numPerms = 16,
          bands = 4, idTypeDdl = "BIGINT")
        idx.rebuild(Dedup.minhashSignatureFrame(
          landed.filter(col("id") % 2 === 0), "id", "text", 3, 16), Seq.empty)
        idx.appendDelta(Dedup.minhashSignatureFrame(
          landed.filter(col("id") % 2 =!= 0), "id", "text", 3, 16), Seq.empty)
        val (kept, _, _) = Dedup.dedupIncrementalNearIndexed(
          docs.filter(col("id") % 3 === 0), idx, "id", "text",
          threshold = 0.5, manage = false)
        kept.select(col("id").as("doc_id"), md5(col("text")).as("fp"))
      },
      Some("""WITH t AS (SELECT doc_id AS id, CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS inc,
             |                 string_split(text, ' ') AS w FROM documents),
             |g AS (SELECT id, inc, unnest(list_transform(range(len(w)-2),
             |        i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM t),
             |perms AS (SELECT id, inc, sh, unnest(range(16)) AS p FROM g),
             |mh AS (SELECT id, inc, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2, 3),
             |bnd AS (SELECT id, inc, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2, 3),
             |candL AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |          ON a.band = b.band AND a.bk = b.bk AND a.inc = 1 AND b.inc = 0),
             |candI AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |          ON a.band = b.band AND a.bk = b.bk AND a.inc = 1 AND b.inc = 1
             |          AND a.id < b.id),
             |agL AS (SELECT c.d1, c.d2 FROM candL c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY 1, 2 HAVING count(*) >= 8),
             |agI AS (SELECT c.d1, c.d2 FROM candI c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY 1, 2 HAVING count(*) >= 8)
             |SELECT d.doc_id, md5(d.text) AS fp FROM documents d
             |WHERE d.doc_id % 3 = 0 AND d.doc_id NOT IN
             |  (SELECT d1 FROM agL UNION SELECT d2 FROM agI)""".stripMargin)),

    // the r14 incremental bucket guard, hash-checked cross-engine: the
    // incoming batch (%3 docs) is salted with two extra copies of every
    // %11 member, so their WITHIN-BATCH band buckets hold >= 3 — with
    // maxBucket = 2 the guard must drop exactly those buckets (and any
    // natural >2 incoming bucket) BEFORE the in-batch self-join, while
    // the BIPARTITE probe against the landed rest stays unguarded (its
    // drops are identical with or without the knob). The oracle rebuilds
    // the census over the incoming banded keys only, the kept-bucket
    // in-batch join, and the unguarded bipartite side.
    "dedup_incremental_bucket_guard" -> Q(
      (s, d) => {
        // persisted for the same exchange-reuse-hardening reason as
        // dedup_incremental_near_prod: this plan references the doc
        // subtree 81× (salted union legs × signature references)
        val docs = docsPar(s, d).select(col("doc_id").as("id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val incoming = docs.filter(col("id") % 3 === 0)
        val pile = incoming.filter(col("id") % 11 === 0 && col("id") < 100000)
        val salted = incoming
          .unionByName(pile.select((col("id") + 300000).as("id"), col("text")))
          .unionByName(pile.select((col("id") + 600000).as("id"), col("text")))
        Dedup.dedupIncrementalNear(salted, docs.filter(col("id") % 3 =!= 0),
          "id", "text", n = 3, numPerms = 16, bands = 4, threshold = 0.5,
          maxBucket = 2)
          .select(col("id").as("doc_id"), md5(col("text")).as("fp"))
      },
      Some("""WITH base AS (SELECT doc_id AS id,
             |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS inc, text FROM documents),
             |salted AS (
             |  SELECT id, inc, text FROM base
             |  UNION ALL SELECT id + 300000, 1, text FROM base
             |    WHERE inc = 1 AND id % 11 = 0 AND id < 100000
             |  UNION ALL SELECT id + 600000, 1, text FROM base
             |    WHERE inc = 1 AND id % 11 = 0 AND id < 100000),
             |t AS (SELECT id, inc, string_split(text, ' ') AS w FROM salted),
             |g AS (SELECT id, inc, unnest(list_transform(range(len(w)-2),
             |        i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM t),
             |perms AS (SELECT id, inc, sh, unnest(range(16)) AS p FROM g),
             |mh AS (SELECT id, inc, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2, 3),
             |bnd AS (SELECT id, inc, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2, 3),
             |candL AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |          ON a.band = b.band AND a.bk = b.bk AND a.inc = 1 AND b.inc = 0),
             |bszI AS (SELECT band, bk, count(*) AS c FROM bnd WHERE inc = 1 GROUP BY 1, 2),
             |keptI AS (SELECT b.id, b.band, b.bk FROM bnd b
             |          JOIN bszI USING (band, bk) WHERE b.inc = 1 AND c <= 2),
             |candI AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM keptI a JOIN keptI b
             |          ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
             |agL AS (SELECT c.d1, c.d2 FROM candL c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY 1, 2 HAVING count(*) >= 8),
             |agI AS (SELECT c.d1, c.d2 FROM candI c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY 1, 2 HAVING count(*) >= 8)
             |SELECT s.id AS doc_id, md5(s.text) AS fp FROM salted s
             |WHERE s.inc = 1 AND s.id NOT IN
             |  (SELECT d1 FROM agL UNION SELECT d2 FROM agI)""".stripMargin)),

    // near-dup SEARCH (the reporting twin of the incremental drop path):
    // which landed docs does each query doc match at est >= 0.5? Queries
    // are planted near-copies (' extra words appended') and verbatim
    // replicas of corpus docs; the oracle rebuilds the bipartite banded
    // candidates + slot-agreement estimate, est = agree/16.0 exact doubles
    "dedup_near_query" -> Q(
      (s, d) => {
        val docs = docsPar(s, d).select(col("doc_id").as("id"), col("text"))
        val queries = docs.filter(col("id") % 9 === 0)
          .select((col("id") + 700000).as("id"),
            concat(col("text"), lit(" extra words appended")).as("text"))
          .unionByName(docs.filter(col("id") % 9 === 4)
            .select((col("id") + 800000).as("id"), col("text")))
        Dedup.nearDuplicatesOf(queries,
          Dedup.minhashSignatureFrame(docs, "id", "text", 3, 16),
          "id", "text", n = 3, numPerms = 16, bands = 4, threshold = 0.5)
          .select(col("d1"), col("d2"), col("est"))
      },
      Some("""WITH allr AS (
             |  SELECT doc_id + 700000 AS id, text || ' extra words appended' AS text, 1 AS inc
             |    FROM documents WHERE doc_id % 9 = 0
             |  UNION ALL SELECT doc_id + 800000, text, 1 FROM documents WHERE doc_id % 9 = 4
             |  UNION ALL SELECT doc_id, text, 0 FROM documents),
             |tw AS (SELECT id, inc, string_split(text, ' ') AS w FROM allr),
             |g AS (SELECT id, inc, unnest(list_transform(range(len(w)-2),
             |        i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM tw),
             |perms AS (SELECT id, inc, sh, unnest(range(16)) AS p FROM g),
             |mh AS (SELECT id, inc, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2, 3),
             |bnd AS (SELECT id, inc, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2, 3),
             |cand AS (SELECT DISTINCT a.id AS d1, c.id AS d2 FROM bnd a JOIN bnd c
             |         ON a.band = c.band AND a.bk = c.bk AND a.inc = 1 AND c.inc = 0)
             |SELECT d1, d2, est FROM (
             |  SELECT c.d1, c.d2,
             |         sum(CASE WHEN y.mv = x.mv THEN 1 ELSE 0 END) / 16.0 AS est
             |  FROM cand c JOIN mh x ON x.id = c.d1
             |              JOIN mh y ON y.id = c.d2 AND y.p = x.p
             |  GROUP BY 1, 2)
             |WHERE est >= 0.5""".stripMargin)),

    // near-dup TAKEDOWN end-to-end: a claim list (near-copies + verbatim
    // replicas of landed docs) is probed against the pool's signatures,
    // and every matched landed doc is DELETED via the targeted segment
    // rewrite; the surviving pool contents must equal the corpus minus
    // the independently-recomputed banded-probe match set. The pool here
    // is a LEGACY one (plain Pool.append, no stored sig column) so the
    // probe's text-derivation fallback is what gets exercised.
    // NOT docsPar: the heavy side here is the probe over the POOL's text,
    // not the input batch — repartitioning the input only inflates the
    // appended segment to one file per partition (small-files hazard) and
    // measured +0.2 s (r15 A/B), so the single-split append stays
    "dedup_takedown_pool" -> Q(
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
          .filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
        val corpus = graft.pool.Pool.create(s, TempDirs.create("graft-takedown-"))
        corpus.append(graft.pool.Envelope.wrap(docs,
          topic = lit("corpus"), offset = col("doc_id"),
          key = lit(null).cast("string"), valueCols = Seq("doc_id", "text")))
        val claims = docs.filter(col("doc_id") % 18 === 0)
          .select((col("doc_id") + 700000).as("doc_id"),
            concat(col("text"), lit(" extra words appended")).as("text"))
          .unionByName(docs.filter(col("doc_id") % 18 === 4)
            .select((col("doc_id") + 800000).as("doc_id"), col("text")))
        graft.streaming.CorpusIngest.takedownNear(claims, corpus, "doc_id", "text")
        corpus.read().select(col("value.doc_id").as("doc_id"),
          md5(col("value.text")).as("fp"))
      },
      Some("""WITH allr AS (
             |  SELECT doc_id + 700000 AS id, text || ' extra words appended' AS text, 1 AS inc
             |    FROM documents WHERE doc_id % 18 = 0
             |  UNION ALL SELECT doc_id + 800000, text, 1 FROM documents WHERE doc_id % 18 = 4
             |  UNION ALL SELECT doc_id, text, 0 FROM documents WHERE doc_id % 2 = 0),
             |tw AS (SELECT id, inc, string_split(text, ' ') AS w FROM allr),
             |g AS (SELECT id, inc, unnest(list_transform(range(len(w)-2),
             |        i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM tw),
             |perms AS (SELECT id, inc, sh, unnest(range(16)) AS p FROM g),
             |mh AS (SELECT id, inc, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2, 3),
             |bnd AS (SELECT id, inc, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2, 3),
             |cand AS (SELECT DISTINCT a.id AS d1, c.id AS d2 FROM bnd a JOIN bnd c
             |         ON a.band = c.band AND a.bk = c.bk AND a.inc = 1 AND c.inc = 0),
             |matched AS (SELECT DISTINCT d2 FROM (
             |  SELECT c.d1, c.d2,
             |         sum(CASE WHEN y.mv = x.mv THEN 1 ELSE 0 END) / 16.0 AS est
             |  FROM cand c JOIN mh x ON x.id = c.d1
             |              JOIN mh y ON y.id = c.d2 AND y.p = x.p
             |  GROUP BY 1, 2) WHERE est >= 0.5)
             |SELECT doc_id, md5(text) AS fp FROM documents
             |WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT d2 FROM matched)""".stripMargin)),

    // the PRODUCTION preset of the incremental near-dup path: 128 perms /
    // 32 bands / threshold 0.8 (the 16-perm default's 1/16 estimator
    // granularity cannot express a 0.8 cut; 128 perms give ~±0.035 std
    // error and 4-row bands center the candidate S-curve at ~0.42, so the
    // estimator does the cutting). Planted near-copies (landed docs with
    // ' extra words appended') drop for long docs (J≈0.9) and survive for
    // short ones (J<0.8) — the oracle recomputes the full 128-slot
    // construction, so the S-curve's verdicts match slot for slot.
    // est = agree/128.0 is an exact double (power-of-two denominator) and
    // the 0.8 literal compares identically in both engines.
    "dedup_incremental_near_prod" -> Q(
      (s, d) => {
        // PERSISTED, not just repartitioned (r16): this query's plan
        // references the doc subtree 30× (one per signature reference) and
        // the r15 form relied on AQE ReuseExchange collapsing 30 identical
        // round-robin exchanges at runtime — fragile (VERDICT what's-wrong
        // #3). The cache makes the one-materialization guarantee
        // structural; the leaked persist is reclaimed by the harnesses.
        val docs = docsPar(s, d).select(col("doc_id").as("id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val landed = docs.filter(col("id") % 10 === 1 || col("id") % 10 === 2)
        val incoming = docs.filter(col("id") % 10 === 0)
          .unionByName(landed.filter(col("id") % 20 === 1)
            .select((col("id") + 500000).as("id"),
              concat(col("text"), lit(" extra words appended")).as("text")))
        Dedup.dedupIncrementalNearProd(incoming, landed, "id", "text")
          .select(col("id").as("doc_id"), md5(col("text")).as("fp"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id AS id, 1 AS inc, text FROM documents WHERE doc_id % 10 = 0
             |  UNION ALL SELECT doc_id + 500000, 1, text || ' extra words appended'
             |    FROM documents WHERE doc_id % 20 = 1
             |  UNION ALL SELECT doc_id, 0, text FROM documents WHERE doc_id % 10 IN (1, 2)),
             |tw AS (SELECT id, inc, text, string_split(text, ' ') AS w FROM t),
             |g AS (SELECT id, inc, unnest(list_transform(range(len(w)-2),
             |        i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM tw),
             |perms AS (SELECT id, inc, sh, unnest(range(128)) AS p FROM g),
             |mh AS (SELECT id, inc, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2, 3),
             |bnd AS (SELECT id, inc, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2, 3),
             |candL AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |          ON a.band = b.band AND a.bk = b.bk AND a.inc = 1 AND b.inc = 0),
             |candI AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |          ON a.band = b.band AND a.bk = b.bk AND a.inc = 1 AND b.inc = 1
             |          AND a.id < b.id),
             |agL AS (SELECT d1, d2 FROM (
             |          SELECT c.d1, c.d2,
             |                 sum(CASE WHEN y.mv = x.mv THEN 1 ELSE 0 END) / 128.0 AS est
             |          FROM candL c JOIN mh x ON x.id = c.d1
             |                       JOIN mh y ON y.id = c.d2 AND y.p = x.p
             |          GROUP BY 1, 2) WHERE est >= 0.8),
             |agI AS (SELECT d1, d2 FROM (
             |          SELECT c.d1, c.d2,
             |                 sum(CASE WHEN y.mv = x.mv THEN 1 ELSE 0 END) / 128.0 AS est
             |          FROM candI c JOIN mh x ON x.id = c.d1
             |                       JOIN mh y ON y.id = c.d2 AND y.p = x.p
             |          GROUP BY 1, 2) WHERE est >= 0.8)
             |SELECT id AS doc_id, md5(text) AS fp FROM t
             |WHERE inc = 1 AND id NOT IN
             |  (SELECT d1 FROM agL UNION SELECT d2 FROM agI)""".stripMargin)),

    // continuous-ingest dedup: which of the odd-id docs has the even-id
    // history never seen? Bloom-pruned, exactly verified — the sketch only
    // prunes, so the result hash-matches a plain anti-join oracle
    "dedup_incremental_bloom" -> Q(
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        Dedup.incrementalNewDocs(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 =!= 0),
          "text")
          .select("doc_id", "lang")
      },
      Some("""SELECT i.doc_id, i.lang FROM documents i
             |WHERE i.doc_id % 2 <> 0
             |  AND NOT EXISTS (SELECT 1 FROM documents h
             |                  WHERE h.doc_id % 2 = 0 AND h.text = i.text)""".stripMargin)),

    // the continuous-ingest loop end-to-end (streaming/CorpusIngest batch
    // core): two batches dedup within themselves, then against the growing
    // corpus pool; survivors are lowest-id per text, offsets contiguous
    "dedup_ingest_pool" -> Q(
      (s, d) => {
        val docs = docsPar(s, d).select("doc_id", "text")
        val corpus = graft.pool.Pool.create(s, TempDirs.create("graft-ingest-"))
        graft.streaming.CorpusIngest.ingestBatch(
          docs.filter(col("doc_id") % 2 === 0), corpus, "doc_id", "text")
        graft.streaming.CorpusIngest.ingestBatch(
          docs.filter(col("doc_id") % 2 =!= 0), corpus, "doc_id", "text")
        corpus.read().groupBy()
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("kafka.offset")).as("distinct_offsets"),
            sum(col("value.doc_id")).as("sum_id"))
      },
      Some("""WITH evens AS (SELECT min(doc_id) AS id, text FROM documents
             |               WHERE doc_id % 2 = 0 GROUP BY text),
             |odds AS (SELECT min(doc_id) AS id, text FROM documents
             |         WHERE doc_id % 2 = 1 GROUP BY text),
             |kept AS (SELECT id FROM evens UNION ALL
             |         SELECT o.id FROM odds o
             |         WHERE NOT EXISTS (SELECT 1 FROM evens e WHERE e.text = o.text))
             |SELECT CAST(count(*) AS BIGINT) AS cnt,
             |       CAST(count(*) AS BIGINT) AS distinct_offsets,
             |       CAST(sum(id) AS BIGINT) AS sum_id FROM kept""".stripMargin)),

    // the NEAR-dup ingest loop end-to-end, driven through a
    // CorpusIngestSession (retained Bloom + stored fp/sig columns +
    // bipartite presigned probe): batch 1 lands the evens (self near-dedup
    // on first commit); batch 2 pushes the odds plus planted near-copies
    // of landed docs (' extra words appended') and exact replays through
    // the stacked exact→near gates. The oracle recomputes every gate from
    // scratch — batch-internal uniq, exact text anti-join, the full
    // 16-perm/4-band LSH candidate + >=8-slot agreement verify for both
    // the first commit's self pass and the second batch's bipartite +
    // within-batch passes — so the pool's final contents are pinned
    // against an independent derivation, stored signatures included.
    "dedup_ingest_pool_near" -> Q(
      (s, d) => {
        val docs = docsPar(s, d).select("doc_id", "text")
        val corpus = graft.pool.Pool.create(s, TempDirs.create("graft-ingest-near-"))
        val sess = new graft.streaming.CorpusIngestSession(
          corpus, "doc_id", "text", near = true)
        sess.ingest(docs.filter(col("doc_id") % 2 === 0))
        sess.ingest(docs.filter(col("doc_id") % 2 =!= 0)
          .unionByName(docs.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 500000).as("doc_id"),
              concat(col("text"), lit(" extra words appended")).as("text")))
          .unionByName(docs.filter(col("doc_id") % 14 === 0)
            .select((col("doc_id") + 600000).as("doc_id"), col("text"))))
        corpus.read().groupBy()
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("kafka.offset")).as("distinct_offsets"),
            sum(col("value.doc_id")).as("sum_id"))
      },
      Some("""WITH b1 AS (SELECT min(doc_id) AS id, text FROM documents
             |            WHERE doc_id % 2 = 0 AND text IS NOT NULL GROUP BY text),
             |b2raw AS (
             |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 1
             |  UNION ALL SELECT doc_id + 500000, text || ' extra words appended'
             |    FROM documents WHERE doc_id % 10 = 0
             |  UNION ALL SELECT doc_id + 600000, text FROM documents WHERE doc_id % 14 = 0),
             |u2 AS (SELECT min(id) AS id, text FROM b2raw
             |       WHERE text IS NOT NULL GROUP BY text),
             |allr AS (SELECT id, text, 1 AS b FROM b1
             |         UNION ALL SELECT id, text, 2 FROM u2),
             |tw AS (SELECT id, b, string_split(text, ' ') AS w FROM allr),
             |g AS (SELECT id, b, unnest(list_transform(range(len(w)-2),
             |        i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM tw),
             |perms AS (SELECT id, b, sh, unnest(range(16)) AS p FROM g),
             |mh AS (SELECT id, b, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2, 3),
             |bnd AS (SELECT id, b, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2, 3),
             |cand1 AS (SELECT DISTINCT a.id AS d1, c.id AS d2 FROM bnd a JOIN bnd c
             |          ON a.band = c.band AND a.bk = c.bk AND a.b = 1 AND c.b = 1
             |          AND a.id < c.id),
             |drop1 AS (SELECT c.d2 FROM cand1 c
             |          JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |            AND y.p = x.p AND y.mv = x.mv
             |          GROUP BY c.d1, c.d2 HAVING count(*) >= 8),
             |landed1 AS (SELECT id, text FROM b1
             |            WHERE id NOT IN (SELECT d2 FROM drop1)),
             |e2 AS (SELECT id, text FROM u2
             |       WHERE text NOT IN (SELECT text FROM landed1)),
             |candL AS (SELECT DISTINCT a.id AS d1, c.id AS d2 FROM bnd a JOIN bnd c
             |          ON a.band = c.band AND a.bk = c.bk AND a.b = 2 AND c.b = 1
             |          WHERE a.id IN (SELECT id FROM e2)
             |            AND c.id IN (SELECT id FROM landed1)),
             |candB AS (SELECT DISTINCT a.id AS d1, c.id AS d2 FROM bnd a JOIN bnd c
             |          ON a.band = c.band AND a.bk = c.bk AND a.b = 2 AND c.b = 2
             |          AND a.id < c.id
             |          WHERE a.id IN (SELECT id FROM e2)
             |            AND c.id IN (SELECT id FROM e2)),
             |agL AS (SELECT c.d1 FROM candL c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY c.d1, c.d2 HAVING count(*) >= 8),
             |agB AS (SELECT c.d2 FROM candB c
             |        JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |          AND y.p = x.p AND y.mv = x.mv
             |        GROUP BY c.d1, c.d2 HAVING count(*) >= 8),
             |kept2 AS (SELECT id FROM e2 WHERE id NOT IN
             |          (SELECT d1 FROM agL UNION SELECT d2 FROM agB)),
             |final AS (SELECT id FROM landed1 UNION ALL SELECT id FROM kept2)
             |SELECT CAST(count(*) AS BIGINT) AS cnt,
             |       CAST(count(*) AS BIGINT) AS distinct_offsets,
             |       CAST(sum(id) AS BIGINT) AS sum_id FROM final""".stripMargin)),

    "dedup_minhash_lsh" -> Q(
      (s, d) => Dedup.lshCandidatePairs(textCorpus(s, d), "id", "text",
        n = 3, numPerms = 16, bands = 4),
      Some(textCorpusSql + "," + shinglesSql +
        """, perms AS (SELECT id, sh, unnest(range(16)) AS p FROM sh0),
          |mh AS (SELECT id, p, min(md5(concat(p, '|', sh))) AS mv FROM perms GROUP BY 1, 2),
          |bands AS (SELECT id, p // 4 AS band, md5(string_agg(mv, ',' ORDER BY p)) AS bk
          |          FROM mh GROUP BY 1, 2)
          |SELECT DISTINCT a.id AS d1, b.id AS d2
          |FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id""".stripMargin),
      headline = true),

    // the r13 bucket-occupancy guard, hash-checked cross-engine: %11 docs
    // are salted with TWO extra byte-identical copies, so their band
    // buckets hold >= 3 members — maxBucket = 2 must drop exactly those
    // buckets (and any natural >2 bucket) BEFORE the candidate self-join.
    // The oracle recomputes the census and the kept-bucket join in SQL
    "dedup_lsh_bucket_guard" -> Q(
      (s, d) => {
        val base = textCorpus(s, d)
        val pile = base.filter(col("id") % 11 === 0 && col("id") < 100000)
        val salted = base
          .unionByName(pile.select((col("id") + 300000).as("id"), col("text")))
          .unionByName(pile.select((col("id") + 400000).as("id"), col("text")))
        Dedup.lshCandidatePairs(salted, "id", "text", n = 3, numPerms = 16,
          bands = 4, maxBucket = 2)
      },
      Some(textCorpusSql +
        """, salted AS (
          |  SELECT id, text FROM corpus
          |  UNION ALL SELECT id + 300000, text FROM corpus WHERE id % 11 = 0 AND id < 100000
          |  UNION ALL SELECT id + 400000, text FROM corpus WHERE id % 11 = 0 AND id < 100000),
          |words AS (SELECT id, string_split(text, ' ') AS w FROM salted),
          |sh0 AS (SELECT DISTINCT id,
          |          unnest(list_transform(range(len(w)-2), i -> array_to_string(w[i+1:i+3], ' '))) AS sh
          |        FROM words),
          |perms AS (SELECT id, sh, unnest(range(16)) AS p FROM sh0),
          |mh AS (SELECT id, p, min(md5(concat(p, '|', sh))) AS mv FROM perms GROUP BY 1, 2),
          |bands AS (SELECT id, p // 4 AS band, md5(string_agg(mv, ',' ORDER BY p)) AS bk
          |          FROM mh GROUP BY 1, 2),
          |bsz AS (SELECT band, bk, count(*) AS c FROM bands GROUP BY 1, 2),
          |kept AS (SELECT b.id, b.band, b.bk FROM bands b JOIN bsz USING (band, bk) WHERE c <= 2)
          |SELECT DISTINCT a.id AS d1, b.id AS d2
          |FROM kept a JOIN kept b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id""".stripMargin)),

    // LSH candidates verified by signature-estimated Jaccard (fraction of
    // agreeing minhash slots) — near-dup end-to-end without re-reading the
    // texts; estimates are multiples of 1/16, exact doubles on any engine
    "dedup_minhash_est" -> Q(
      (s, d) => Dedup.minhashEstimatePairs(textCorpus(s, d), "id", "text",
        n = 3, numPerms = 16, bands = 4, threshold = 0.5),
      Some(textCorpusSql + "," + shinglesSql +
        """, perms AS (SELECT id, sh, unnest(range(16)) AS p FROM sh0),
          |mh AS (SELECT id, p, min(md5(concat(p, '|', sh))) AS mv FROM perms GROUP BY 1, 2),
          |bands AS (SELECT id, p // 4 AS band, md5(string_agg(mv, ',' ORDER BY p)) AS bk
          |          FROM mh GROUP BY 1, 2),
          |cand AS (SELECT DISTINCT a.id AS d1, b.id AS d2
          |         FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id)
          |SELECT d1, d2, est FROM (
          |  SELECT c.d1, c.d2, sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) / 16.0 AS est
          |  FROM cand c JOIN mh a ON a.id = c.d1 JOIN mh b ON b.id = c.d2 AND b.p = a.p
          |  GROUP BY 1, 2)
          |WHERE est >= 0.5""".stripMargin)),

    // the recommended 100 TB composition end-to-end: LSH candidates +
    // exact-Jaccard verification restricted to those pairs (cost linear in
    // the candidate list, never the inverted index's df-squared)
    "dedup_lsh_jaccard" -> Q(
      (s, d) => {
        val corpus = textCorpus(s, d)
        // candidates materialized once: jaccardForPairs references them 3×
        // and the LSH subtree would otherwise execute three times
        val cand = Dedup.lshCandidatePairs(corpus, "id", "text").localCheckpoint(true)
        Dedup.jaccardForPairs(corpus, cand, "id", "text")
          .filter(col("jaccard") >= 0.5)
      },
      Some(textCorpusSql + "," + shinglesSql +
        """, perms AS (SELECT id, sh, unnest(range(16)) AS p FROM sh0),
          |mh AS (SELECT id, p, min(md5(concat(p, '|', sh))) AS mv FROM perms GROUP BY 1, 2),
          |bands AS (SELECT id, p // 4 AS band, md5(string_agg(mv, ',' ORDER BY p)) AS bk
          |          FROM mh GROUP BY 1, 2),
          |cand AS (SELECT DISTINCT a.id AS d1, b.id AS d2
          |         FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
          |sizes AS (SELECT id, count(*) AS sz FROM sh0 GROUP BY id),
          |inters AS (SELECT c.d1, c.d2, count(*) AS inter
          |           FROM cand c JOIN sh0 a ON a.id = c.d1
          |                       JOIN sh0 b ON b.id = c.d2 AND b.sh = a.sh
          |           GROUP BY 1, 2)
          |SELECT d1, d2, inter, jaccard FROM (
          |  SELECT d1, d2, coalesce(inter, 0) AS inter,
          |         coalesce(inter, 0) * 1.0 / (s1.sz + s2.sz - coalesce(inter, 0)) AS jaccard
          |  FROM cand LEFT JOIN inters USING (d1, d2)
          |  JOIN sizes s1 ON d1 = s1.id JOIN sizes s2 ON d2 = s2.id)
          |WHERE jaccard >= 0.5""".stripMargin)),

    "dedup_simhash" -> Q(
      (s, d) => Dedup.simhash(
        Tables.load(s, d, "documents").select(col("doc_id").as("id"), col("text")),
        "id", "text"),
      Some(simhashOracle)),

    "dedup_ngram_jaccard" -> Q(
      (s, d) => Dedup.jaccardPairs(textCorpus(s, d), "id", "text",
        n = 3, threshold = 0.5, maxDf = 100),
      Some(textCorpusSql + "," + shinglesSql +
        """, freq AS (SELECT sh, count(*) AS c FROM sh0 GROUP BY sh),
          |sh AS (SELECT s.id, s.sh FROM sh0 s JOIN freq f ON s.sh = f.sh WHERE f.c <= 100),
          |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
          |inters AS (SELECT a.id AS d1, b.id AS d2, count(*) AS inter
          |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2)
          |SELECT d1, d2, inter, jaccard FROM (
          |  SELECT d1, d2, inter,
          |         inter * 1.0 / (s1.sz + s2.sz - inter) AS jaccard
          |  FROM inters JOIN sizes s1 ON d1 = s1.id JOIN sizes s2 ON d2 = s2.id)
          |WHERE jaccard >= 0.5""".stripMargin)),

    // exact duplicated-span coverage (suffix-array dedup's signal, stride-1
    // token windows): per doc, how many of its 8-token windows repeat
    // anywhere in the corpus. Spark groups by xxhash64 of the window, the
    // oracle by the window text — identical modulo 2^-64 collisions.
    "dedup_substring" -> Q(
      (s, d) => Dedup.duplicatedSpans(textCorpus(s, d), "id", "text", k = 8),
      Some(textCorpusSql +
        """, toks AS (SELECT id, string_split(text, ' ') AS t FROM corpus),
          |wins AS (SELECT id, t, len(t) - 7 AS nw FROM toks),
          |grams AS (SELECT id, array_to_string(t[i:i+7], ' ') AS g FROM (
          |  SELECT id, t, unnest(range(1, nw + 1)) AS i FROM wins WHERE nw > 0)),
          |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
          |dpd AS (SELECT id, count(*) AS dup_windows FROM grams
          |        WHERE g IN (SELECT g FROM dup) GROUP BY id)
          |SELECT w.id, CAST(greatest(w.nw, 0) AS BIGINT) AS windows,
          |       CAST(coalesce(d.dup_windows, 0) AS BIGINT) AS dup_windows
          |FROM wins w LEFT JOIN dpd d ON w.id = d.id""".stripMargin)),

    // the cut step: every token covered by a corpus-duplicated 8-token run
    // is removed, keeping the globally-first occurrence (min (id, pos)).
    // The oracle's row_number/window formulation is its luxury — the Spark
    // side uses a map-combinable min-(id,pos) aggregate instead
    "dedup_substring_strip" -> Q(
      (s, d) => Dedup.removeDuplicatedSpans(textCorpus(s, d), "id", "text", k = 8),
      Some(textCorpusSql +
        """, toks AS (SELECT id, string_split(text, ' ') AS t FROM corpus),
          |wins AS (SELECT id, t, len(t) - 7 AS nw FROM toks),
          |grams AS (SELECT id, i, array_to_string(t[i:i+7], ' ') AS g FROM (
          |  SELECT id, t, unnest(range(1, nw + 1)) AS i FROM wins WHERE nw > 0)),
          |st AS (SELECT id, i,
          |         row_number() OVER (PARTITION BY g ORDER BY id, i) AS rn,
          |         count(*) OVER (PARTITION BY g) AS c
          |       FROM grams),
          |flagged AS (SELECT id, i FROM st WHERE c > 1 AND rn > 1),
          |starts AS (SELECT id, list_sort(list(i)) AS s FROM flagged GROUP BY id)
          |-- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
          |-- concat_ws is '' -- fully-covered docs strip to the empty string
          |SELECT w.id, coalesce(array_to_string(
          |  list_transform(
          |    list_filter(range(1, len(w.t) + 1),
          |      j -> len(list_filter(coalesce(sx.s, CAST([] AS BIGINT[])),
          |                           x -> x <= j AND j < x + 8)) = 0),
          |    j -> w.t[j]), ' '), '') AS text_clean
          |FROM wins w LEFT JOIN starts sx ON w.id = sx.id""".stripMargin)),

    // span-level decontamination: eval docs (%13) appear verbatim in the
    // corpus — their copies strip to empty while docs merely SHARING an
    // 8-gram window lose exactly that span; everything else unchanged.
    // Oracle mirrors with text grams (the 2^-64 hash-collision convention)
    "dedup_decontam_strip" -> Q(
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id").as("id"), col("text"))
        Dedup.removeContaminatedSpans(docs,
          docs.filter(col("id") % 13 === 0), "id", "text", k = 8)
      },
      Some("""WITH corpus AS (SELECT doc_id AS id, text FROM documents),
             |toks AS (SELECT id, string_split(text, ' ') AS t FROM corpus),
             |wins AS (SELECT id, t, len(t) - 7 AS nw FROM toks),
             |grams AS (SELECT id, i, array_to_string(t[i:i+7], ' ') AS g FROM (
             |  SELECT id, t, unnest(range(1, nw + 1)) AS i FROM wins WHERE nw > 0)),
             |evalg AS (SELECT DISTINCT g FROM grams WHERE id % 13 = 0),
             |flagged AS (SELECT id, i FROM grams JOIN evalg USING (g)),
             |starts AS (SELECT id, list_sort(list(i)) AS s FROM flagged GROUP BY id)
             |SELECT w.id, coalesce(array_to_string(
             |  list_transform(
             |    list_filter(range(1, len(w.t) + 1),
             |      j -> len(list_filter(coalesce(sx.s, CAST([] AS BIGINT[])),
             |                           x -> x <= j AND j < x + 8)) = 0),
             |    j -> w.t[j]), ' '), '') AS text_clean
             |FROM wins w LEFT JOIN starts sx ON w.id = sx.id""".stripMargin)),

    "dedup_embedding_cosine" -> Q(
      (s, d) => Dedup.embeddingCosinePairs(embCorpus(s, d), "vec_id", "v", "label", 0.9),
      Some(embCorpusSql +
        s"""SELECT a.vec_id AS d1, b.vec_id AS d2
           |FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
           |WHERE ${cos("a.v", "b.v")} >= 0.9""".stripMargin)),

    // label-free embedding near-dup: random-hyperplane LSH candidates
    // verified by exact cosine — the scale path when no blocking column
    // exists. The ±1 planes are md5-seeded so the oracle reproduces them
    // as an inlined VALUES matrix.
    "dedup_embedding_lsh" -> Q(
      (s, d) => Dedup.embeddingLshPairs(embCorpus(s, d), "vec_id", "v",
        dims = 64).select("d1", "d2"),
      Some {
        val hpValues = Dedup.hyperplanes(16, 64).zipWithIndex.map { case (row, j) =>
          s"($j, [${row.map(x => if (x > 0) "1.0" else "-1.0").mkString(",")}])"
        }.mkString(",\n")
        embCorpusSql +
          s""", hp(j, h) AS (VALUES
             |$hpValues),
             |bits AS (
             |  SELECT c.vec_id, hp.j,
             |         CASE WHEN list_sum(list_transform(list_zip(c.v, hp.h), p -> p[1] * p[2])) >= 0
             |              THEN 1 ELSE 0 END AS bit
             |  FROM corpus c CROSS JOIN hp),
             |keys AS (SELECT vec_id, j // 4 AS band, sum(bit * (1 << (j % 4))) AS bk
             |         FROM bits GROUP BY 1, 2),
             |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
             |         FROM keys a JOIN keys b ON a.band = b.band AND a.bk = b.bk
             |                                AND a.vec_id < b.vec_id)
             |SELECT d1, d2 FROM cand
             |JOIN corpus ca ON cand.d1 = ca.vec_id
             |JOIN corpus cb ON cand.d2 = cb.vec_id
             |WHERE ${cos("ca.v", "cb.v")} >= 0.9""".stripMargin
      }),

    // SemDeDup: k-means cells bound the pairwise cosine (the kmeans rounds
    // and cell assignment reuse the sim_kmeans oracle scaffolding — 9-digit
    // rounded centroids keep cell membership engine-identical); prune drops
    // any vector with an over-threshold smaller-id neighbor in its cell
    "dedup_semantic" -> Q(
      (s, d) => Dedup.semanticDedup(embCorpus(s, d), "vec_id", "v",
        k = 64, iters = 1, threshold = 0.95)
        .select("vec_id", "label"),
      Some(
        """WITH base0 AS (
          |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |  FROM embeddings),
          |base AS (
          |  SELECT * FROM base0
          |  UNION ALL SELECT vec_id + 100000, label, list_transform(v, x -> x * 1.01)
          |    FROM base0 WHERE vec_id % 5 = 0),
          |""".stripMargin + kmeansRoundsSql(iters = 1, k = 64) +
        s"""
           |,fin AS (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.cv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cents1 c),
           |cells AS (SELECT vec_id, v, centroid_id FROM fin WHERE rn = 1),
           |drops AS (SELECT DISTINCT b.vec_id
           |          FROM cells a JOIN cells b
           |            ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
           |          WHERE ${cos("a.v", "b.v")} >= 0.95)
           |SELECT vec_id, label FROM base
           |WHERE vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin)),

    "dedup_canonical" -> Q(
      (s, d) => {
        val corpus = textCorpus(s, d)
        val withFp = corpus.select(col("id"), md5(col("text")).as("fp"))
        val pairs = withFp.select(col("id").as("d1"), col("fp"))
          .join(withFp.select(col("id").as("d2"), col("fp")), Seq("fp"))
          .filter(col("d1") < col("d2"))
          .select("d1", "d2")
        Dedup.canonicalIds(corpus, "id", pairs)
      },
      Some(textCorpusSql +
        """, pairs AS (
          |  SELECT a.id AS d1, b.id AS d2 FROM corpus a JOIN corpus b
          |  ON md5(a.text) = md5(b.text) AND a.id < b.id),
          |nb AS (SELECT id, min(nb) AS nbmin FROM (
          |  SELECT d1 AS id, d2 AS nb FROM pairs
          |  UNION ALL SELECT d2, d1 FROM pairs) GROUP BY id)
          |SELECT c.id, least(c.id, coalesce(nb.nbmin, c.id)) AS canonical
          |FROM corpus c LEFT JOIN nb ON c.id = nb.id""".stripMargin)),

    // end-to-end corpus dedup in one call: exact n-gram Jaccard pairs →
    // connected components → keep each cluster's min-id row. The oracle
    // reuses the dedup_ngram_jaccard pair SQL and computes TRUE components
    // via a recursive closure (not the one-hop min of dedup_canonical), so
    // transitive chains are covered.
    "dedup_corpus_clean" -> Q(
      (s, d) => Dedup.dedupCorpus(textCorpus(s, d), "id", "text",
        n = 3, threshold = 0.5, maxDf = 100),
      Some("WITH RECURSIVE " + textCorpusSql.stripPrefix("WITH ") + "," + shinglesSql +
        """, freq AS (SELECT sh, count(*) AS c FROM sh0 GROUP BY sh),
          |sh AS (SELECT s.id, s.sh FROM sh0 s JOIN freq f ON s.sh = f.sh WHERE f.c <= 100),
          |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
          |inters AS (SELECT a.id AS d1, b.id AS d2, count(*) AS inter
          |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2),
          |pairsj AS (SELECT d1, d2 FROM (
          |  SELECT d1, d2, inter * 1.0 / (s1.sz + s2.sz - inter) AS jaccard
          |  FROM inters JOIN sizes s1 ON d1 = s1.id JOIN sizes s2 ON d2 = s2.id)
          |  WHERE jaccard >= 0.5),
          |sym AS (SELECT d1 AS a, d2 AS b FROM pairsj
          |        UNION ALL SELECT d2 AS a, d1 AS b FROM pairsj),
          |reach AS (
          |  SELECT id, id AS r FROM corpus
          |  UNION
          |  SELECT s.b AS id, reach.r AS r FROM reach JOIN sym s ON s.a = reach.id),
          |canon AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
          |SELECT c.id, c.text FROM corpus c JOIN canon ON c.id = canon.id
          |WHERE canon.canonical = c.id""".stripMargin)),

    // keep-longest dedup policy: same Jaccard pairs + components as
    // dedup_corpus_clean, but each cluster's LONGEST member survives
    // (ties → lowest id) — the planted "+extra words appended" variants
    // win over their shorter originals, so the policy is exercised, not
    // just the tie path
    "dedup_keep_longest" -> Q(
      (s, d) => {
        val corpus = textCorpus(s, d)
        val pairs = Dedup.jaccardPairs(corpus, "id", "text",
          n = 3, threshold = 0.5, maxDf = 100).select("d1", "d2")
        Dedup.keepBestBy(corpus, "id", pairs, length(col("text")))
      },
      Some("WITH RECURSIVE " + textCorpusSql.stripPrefix("WITH ") + "," + shinglesSql +
        """, freq AS (SELECT sh, count(*) AS c FROM sh0 GROUP BY sh),
          |sh AS (SELECT s.id, s.sh FROM sh0 s JOIN freq f ON s.sh = f.sh WHERE f.c <= 100),
          |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
          |inters AS (SELECT a.id AS d1, b.id AS d2, count(*) AS inter
          |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2),
          |pairsj AS (SELECT d1, d2 FROM (
          |  SELECT d1, d2, inter * 1.0 / (s1.sz + s2.sz - inter) AS jaccard
          |  FROM inters JOIN sizes s1 ON d1 = s1.id JOIN sizes s2 ON d2 = s2.id)
          |  WHERE jaccard >= 0.5),
          |sym AS (SELECT d1 AS a, d2 AS b FROM pairsj
          |        UNION ALL SELECT d2 AS a, d1 AS b FROM pairsj),
          |reach AS (
          |  SELECT id, id AS r FROM corpus
          |  UNION
          |  SELECT s.b AS id, reach.r AS r FROM reach JOIN sym s ON s.a = reach.id),
          |canon AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id),
          |win AS (SELECT id FROM (
          |  SELECT canon.id, row_number() OVER (PARTITION BY canon.canonical
          |           ORDER BY length(c.text) DESC, canon.id) AS rn
          |  FROM canon JOIN corpus c ON c.id = canon.id) WHERE rn = 1)
          |SELECT c.id, c.text FROM corpus c JOIN win USING (id)""".stripMargin)),

    // the 100 TB corpus-dedup composition end-to-end (dedupCorpusLsh): LSH
    // candidate generation → exact-Jaccard verify on candidates only →
    // connected components (recursive closure) → keep min-id per cluster.
    // The oracle mirrors the md5-minhash/banded candidate generation
    // EXACTLY (same CTEs as the green dedup_lsh_jaccard), so candidate-set
    // equality is structural — recall needs no probabilistic argument and
    // the row survives testdata regeneration.
    "dedup_corpus_clean_lsh" -> Q(
      (s, d) => Dedup.dedupCorpusLsh(textCorpus(s, d), "id", "text",
        n = 3, numPerms = 16, bands = 4, threshold = 0.5),
      Some("WITH RECURSIVE " + textCorpusSql.stripPrefix("WITH ") + "," + shinglesSql +
        """, perms AS (SELECT id, sh, unnest(range(16)) AS p FROM sh0),
          |mh AS (SELECT id, p, min(md5(concat(p, '|', sh))) AS mv FROM perms GROUP BY 1, 2),
          |bands AS (SELECT id, p // 4 AS band, md5(string_agg(mv, ',' ORDER BY p)) AS bk
          |          FROM mh GROUP BY 1, 2),
          |cand AS (SELECT DISTINCT a.id AS d1, b.id AS d2
          |         FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
          |sizes AS (SELECT id, count(*) AS sz FROM sh0 GROUP BY id),
          |inters AS (SELECT c.d1, c.d2, count(*) AS inter
          |           FROM cand c JOIN sh0 a ON a.id = c.d1
          |                       JOIN sh0 b ON b.id = c.d2 AND b.sh = a.sh
          |           GROUP BY 1, 2),
          |pairsj AS (SELECT d1, d2 FROM (
          |  SELECT cand.d1 AS d1, cand.d2 AS d2,
          |         coalesce(inter, 0) * 1.0 / (s1.sz + s2.sz - coalesce(inter, 0)) AS jaccard
          |  FROM cand LEFT JOIN inters USING (d1, d2)
          |  JOIN sizes s1 ON cand.d1 = s1.id JOIN sizes s2 ON cand.d2 = s2.id)
          |  WHERE jaccard >= 0.5),
          |sym AS (SELECT d1 AS a, d2 AS b FROM pairsj
          |        UNION ALL SELECT d2 AS a, d1 AS b FROM pairsj),
          |reach AS (
          |  SELECT id, id AS r FROM corpus
          |  UNION
          |  SELECT s.b AS id, reach.r AS r FROM reach JOIN sym s ON s.a = reach.id),
          |canon AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
          |SELECT c.id, c.text FROM corpus c JOIN canon ON c.id = canon.id
          |WHERE canon.canonical = c.id""".stripMargin)),

    // ---------------- similarity search ----------------

    "sim_topk_brute" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        Similarity.bruteForceTopK(base, base.filter(col("vec_id") < 5), "vec_id", "v", k = 3)
      },
      Some(embBaseSql +
        s""", q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
           |pairs AS (
           |  SELECT query_id, vec_id AS neighbor_id, ${cos("qv", "v")} AS cos
           |  FROM q JOIN base ON vec_id <> query_id)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin),
      headline = true),

    // top-k with neighbor metadata riding the bounded aggregate as a struct
    // payload — no second corpus join to fetch the label (cos itself stays
    // out of the oracle output: float-sum hashing across engines is the
    // one check this family deliberately avoids)
    "sim_topk_meta" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        Similarity.bruteForceTopKMeta(base, base.filter(col("vec_id") < 5),
          "vec_id", "v", k = 3, metaCols = Seq("label"))
          .select("query_id", "rank", "neighbor_id", "label")
      },
      Some(embBaseSql +
        s""", q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
           |pairs AS (
           |  SELECT query_id, vec_id AS neighbor_id, label, ${cos("qv", "v")} AS cos
           |  FROM q JOIN base ON vec_id <> query_id)
           |SELECT query_id, rank, neighbor_id, label FROM (
           |  SELECT query_id, neighbor_id, label,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    "sim_ivf_assign" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        Similarity.ivfAssign(base, base.filter(col("vec_id") < 8), "vec_id", "v")
          .groupBy("centroid_id")
          .agg(count(lit(1)).as("cnt"), sum("vec_id").as("sum_id"))
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |scored AS (
           |  SELECT b.vec_id, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cent c)
           |SELECT centroid_id, count(*) AS cnt, CAST(sum(vec_id) AS BIGINT) AS sum_id
           |FROM scored WHERE rn = 1 GROUP BY centroid_id""".stripMargin)),

    "sim_ivf_topk" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        Similarity.ivfTopK(base, base.filter(col("vec_id") >= 100 && col("vec_id") < 110),
          base.filter(col("vec_id") < 8), "vec_id", "v", k = 3)
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |assigned AS (
           |  SELECT vec_id, v, centroid_id FROM (
           |    SELECT b.vec_id, b.v, c.centroid_id,
           |           row_number() OVER (PARTITION BY b.vec_id
           |                              ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |    FROM base b CROSS JOIN cent c) WHERE rn = 1),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |         ${cos("q.v", "n.v")} AS cos
           |  FROM assigned q JOIN assigned n
           |    ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
           |  WHERE q.vec_id >= 100 AND q.vec_id < 110)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    // the PERSISTED index path: same semantics as sim_ivf_topk, but the
    // corpus is assigned once, written partitionBy(centroid_id), read back
    // and probed via the static partition filter (build-once/probe-many —
    // the production ANN shape; file skipping pinned by PlanAuditSpec).
    // The oracle is sim_ivf_topk's, verbatim: persistence must not change
    // a single neighbor.
    "sim_ivf_index_topk" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val path = TempDirs.create("graft-ivf-index-")
        graft.ops.SimilarityIndex.buildIvfFromCentroids(
          base, base.filter(col("vec_id") < 8), "vec_id", "v", path)
        graft.ops.SimilarityIndex.loadIvf(s, path, "vec_id", "v")
          .topK(base.filter(col("vec_id") >= 100 && col("vec_id") < 110), k = 3)
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |assigned AS (
           |  SELECT vec_id, v, centroid_id FROM (
           |    SELECT b.vec_id, b.v, c.centroid_id,
           |           row_number() OVER (PARTITION BY b.vec_id
           |                              ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |    FROM base b CROSS JOIN cent c) WHERE rn = 1),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |         ${cos("q.v", "n.v")} AS cos
           |  FROM assigned q JOIN assigned n
           |    ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
           |  WHERE q.vec_id >= 100 AND q.vec_id < 110)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    // targeted index delete (ANN takedown): vectors leave the persisted
    // index by rewriting only the cells that hold them; the survivors
    // must answer exactly like an index built without them — the oracle
    // is sim_ivf_index_topk's with the deleted ids excluded from the
    // neighbor side
    "sim_ivf_index_delete" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val path = TempDirs.create("graft-ivf-del-")
        graft.ops.SimilarityIndex.buildIvfFromCentroids(
          base, base.filter(col("vec_id") < 8), "vec_id", "v", path)
        val idx = graft.ops.SimilarityIndex.loadIvf(s, path, "vec_id", "v")
        idx.delete(base.filter(col("vec_id") % 17 === 3).select("vec_id"))
        idx.topK(base.filter(col("vec_id") >= 100 && col("vec_id") < 110), k = 3)
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |assigned AS (
           |  SELECT vec_id, v, centroid_id FROM (
           |    SELECT b.vec_id, b.v, c.centroid_id,
           |           row_number() OVER (PARTITION BY b.vec_id
           |                              ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |    FROM base b CROSS JOIN cent c) WHERE rn = 1),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |         ${cos("q.v", "n.v")} AS cos
           |  FROM assigned q JOIN assigned n
           |    ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
           |  WHERE q.vec_id >= 100 AND q.vec_id < 110 AND n.vec_id % 17 <> 3)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    // the RE-CLUSTER cycle end-to-end: build under given centroids,
    // takedown-delete a slice, then rebuild() — re-train k-means on the
    // index's SURVIVING rows (2 hash-seeded Lloyd rounds, the engine's
    // deterministic discipline), re-assign, atomic dir swap — and probe
    // the rebuilt index. The oracle recomputes the same 2 rounds over
    // the survivors as chained CTEs, so BOTH halves of the contract are
    // hash-checked: deletes stay deleted through the retrain, and the
    // redrawn cells are bit-identical to an independent SQL k-means
    "sim_ivf_rebuild_topk" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val path = TempDirs.create("graft-ivf-rb-")
        graft.ops.SimilarityIndex.buildIvfFromCentroids(
          base, base.filter(col("vec_id") < 8), "vec_id", "v", path)
        val idx = graft.ops.SimilarityIndex.loadIvf(s, path, "vec_id", "v")
        idx.delete(base.filter(col("vec_id") % 17 === 3).select("vec_id"))
        val rebuilt = idx.rebuild(k = 8, iters = 2,
          seedByHash = true, roundDigits = 9)
        rebuilt.topK(base.filter(col("vec_id") >= 100 && col("vec_id") < 110), k = 3)
      },
      Some(embBaseSql +
        s""", surv AS (SELECT vec_id, v FROM base WHERE vec_id % 17 <> 3),
           |${kmeansRoundsSql(iters = 2, k = 8, from = "surv")},
           |cents AS (SELECT centroid_id, cv AS centv FROM cents2),
           |corpus_cells AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM surv b CROSS JOIN cents c) WHERE rn = 1),
           |query_cells AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cents c)
           |  WHERE rn = 1 AND vec_id >= 100 AND vec_id < 110),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |         ${cos("q.v", "n.v")} AS cos
           |  FROM query_cells q JOIN corpus_cells n
           |    ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    // near-dup-GATED vector ingest: the index's stored vectors are the
    // landed state; a batch vector drops when a landed vector in its
    // probed cell scores cosine >= threshold (planted 1.01-scaled copies
    // score exactly 1.0) or a lower-id batch mate in the same cell does.
    // The oracle replays both gates from scratch
    "sim_index_ingest_near" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val landed = base.filter(col("vec_id") < 300)
        val path = TempDirs.create("graft-ivf-ing-")
        graft.ops.SimilarityIndex.buildIvfFromCentroids(
          landed, base.filter(col("vec_id") < 8), "vec_id", "v", path)
        val idx = graft.ops.SimilarityIndex.loadIvf(s, path, "vec_id", "v")
        val batch = base.filter(col("vec_id") >= 300 && col("vec_id") < 340)
          .unionByName(landed.filter(col("vec_id") % 50 === 0)
            .select((col("vec_id") + 900000).as("vec_id"), col("label"),
              transform(col("v"), x => x * lit(1.01)).as("v")))
        idx.ingestNear(batch, threshold = 0.95)
        idx.assigned.filter(col("vec_id") >= 300)
          .select(col("vec_id"), col("centroid_id").cast("long").as("cell"))
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |landed AS (SELECT vec_id, v FROM base WHERE vec_id < 300),
           |batch AS (SELECT vec_id, v FROM base WHERE vec_id >= 300 AND vec_id < 340
           |          UNION ALL
           |          SELECT vec_id + 900000, list_transform(v, x -> x * 1.01)
           |          FROM base WHERE vec_id < 300 AND vec_id % 50 = 0),
           |la AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT l.vec_id, l.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY l.vec_id
           |                            ORDER BY ${cos("l.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM landed l CROSS JOIN cent c) WHERE rn = 1),
           |ba AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM batch b CROSS JOIN cent c) WHERE rn = 1),
           |dropsL AS (SELECT DISTINCT b.vec_id FROM ba b
           |           JOIN la l ON b.centroid_id = l.centroid_id
           |           WHERE ${cos("b.v", "l.v")} >= 0.95),
           |dropsB AS (SELECT DISTINCT hi.vec_id FROM ba hi
           |           JOIN ba lo ON hi.centroid_id = lo.centroid_id
           |                     AND lo.vec_id < hi.vec_id
           |           WHERE ${cos("hi.v", "lo.v")} >= 0.95)
           |SELECT vec_id, centroid_id AS cell FROM ba
           |WHERE vec_id NOT IN (SELECT vec_id FROM dropsL
           |                     UNION SELECT vec_id FROM dropsB)""".stripMargin)),

    // the CONTINUOUS vector-ingest loop: two micro-batch-equivalent
    // VectorIngestSession calls against one persisted index — gate +
    // append + the compactEvery=1 cell fold BETWEEN the batches (the
    // fold must not change a single gate answer), with batch 2 replaying
    // batch 1 in full (at-least-once upstream) alongside novel vectors
    // and a fresh planted near-copy set. The oracle replays both gates
    // sequentially against the evolving landed state: batch-1 survivors
    // join the landed side before batch 2 is judged
    "sim_index_ingest_session" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val landed = base.filter(col("vec_id") < 300)
        val path = TempDirs.create("graft-ivf-sess-")
        graft.ops.SimilarityIndex.buildIvfFromCentroids(
          landed, base.filter(col("vec_id") < 8), "vec_id", "v", path)
        val idx = graft.ops.SimilarityIndex.loadIvf(s, path, "vec_id", "v")
        val session = new graft.ops.SimilarityIndex.VectorIngestSession(
          idx, threshold = 0.95, nprobe = 1, compactEvery = 1, compactMaxFiles = 1)
        val b1 = base.filter(col("vec_id") >= 300 && col("vec_id") < 320)
          .unionByName(landed.filter(col("vec_id") % 50 === 0)
            .select((col("vec_id") + 900000).as("vec_id"), col("label"),
              transform(col("v"), x => x * lit(1.01)).as("v")))
        session.ingest(b1)
        session.ingest(b1 // the full batch-1 replay...
          .unionByName(base.filter(col("vec_id") >= 320 && col("vec_id") < 340))
          .unionByName(landed.filter(col("vec_id") % 70 === 0)
            .select((col("vec_id") + 800000).as("vec_id"), col("label"),
              transform(col("v"), x => x * lit(1.01)).as("v"))))
        idx.assigned.filter(col("vec_id") >= 300)
          .select(col("vec_id"), col("centroid_id").cast("long").as("cell"))
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |landed AS (SELECT vec_id, v FROM base WHERE vec_id < 300),
           |la AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT l.vec_id, l.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY l.vec_id
           |                            ORDER BY ${cos("l.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM landed l CROSS JOIN cent c) WHERE rn = 1),
           |b1 AS (SELECT vec_id, v FROM base WHERE vec_id >= 300 AND vec_id < 320
           |       UNION ALL
           |       SELECT vec_id + 900000, list_transform(v, x -> x * 1.01)
           |       FROM base WHERE vec_id < 300 AND vec_id % 50 = 0),
           |b1a AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM b1 b CROSS JOIN cent c) WHERE rn = 1),
           |d1 AS (SELECT DISTINCT b.vec_id FROM b1a b JOIN la l ON b.centroid_id = l.centroid_id
           |       WHERE ${cos("b.v", "l.v")} >= 0.95
           |       UNION
           |       SELECT DISTINCT hi.vec_id FROM b1a hi JOIN b1a lo
           |         ON hi.centroid_id = lo.centroid_id AND lo.vec_id < hi.vec_id
           |       WHERE ${cos("hi.v", "lo.v")} >= 0.95),
           |s1 AS (SELECT vec_id, v, centroid_id FROM b1a
           |       WHERE vec_id NOT IN (SELECT vec_id FROM d1)),
           |la2 AS (SELECT vec_id, v, centroid_id FROM la
           |        UNION ALL SELECT vec_id, v, centroid_id FROM s1),
           |b2 AS (SELECT vec_id, v FROM b1
           |       UNION ALL
           |       SELECT vec_id, v FROM base WHERE vec_id >= 320 AND vec_id < 340
           |       UNION ALL
           |       SELECT vec_id + 800000, list_transform(v, x -> x * 1.01)
           |       FROM base WHERE vec_id < 300 AND vec_id % 70 = 0),
           |b2a AS (SELECT vec_id, v, centroid_id FROM (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM b2 b CROSS JOIN cent c) WHERE rn = 1),
           |d2 AS (SELECT DISTINCT b.vec_id FROM b2a b JOIN la2 l ON b.centroid_id = l.centroid_id
           |       WHERE ${cos("b.v", "l.v")} >= 0.95
           |       UNION
           |       SELECT DISTINCT hi.vec_id FROM b2a hi JOIN b2a lo
           |         ON hi.centroid_id = lo.centroid_id AND lo.vec_id < hi.vec_id
           |       WHERE ${cos("hi.v", "lo.v")} >= 0.95)
           |SELECT vec_id, centroid_id AS cell FROM s1
           |UNION ALL
           |SELECT vec_id, centroid_id AS cell FROM b2a
           |WHERE vec_id NOT IN (SELECT vec_id FROM d2)""".stripMargin)),

    // IVF search with label metadata riding the top-k payload struct
    "sim_ivf_topk_meta" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        Similarity.ivfTopKMeta(base, base.filter(col("vec_id") >= 100 && col("vec_id") < 110),
          base.filter(col("vec_id") < 8), "vec_id", "v", k = 3, metaCols = Seq("label"))
          .select("query_id", "rank", "neighbor_id", "label")
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |assigned AS (
           |  SELECT vec_id, v, label, centroid_id FROM (
           |    SELECT b.vec_id, b.v, b.label, c.centroid_id,
           |           row_number() OVER (PARTITION BY b.vec_id
           |                              ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |    FROM base b CROSS JOIN cent c) WHERE rn = 1),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.label,
           |         ${cos("q.v", "n.v")} AS cos
           |  FROM assigned q JOIN assigned n
           |    ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
           |  WHERE q.vec_id >= 100 AND q.vec_id < 110)
           |SELECT query_id, rank, neighbor_id, label FROM (
           |  SELECT query_id, neighbor_id, label,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    // nprobe=2: queries probe their two nearest cells (the IVF recall knob);
    // corpus rows stay in exactly one cell so no pair is generated twice
    "sim_ivf_topk_probe2" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        Similarity.ivfTopK(base, base.filter(col("vec_id") >= 100 && col("vec_id") < 110),
          base.filter(col("vec_id") < 8), "vec_id", "v", k = 3, nprobe = 2)
      },
      Some(embBaseSql +
        s""", cent AS (SELECT vec_id AS centroid_id, v AS centv FROM base WHERE vec_id < 8),
           |ranked AS (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cent c),
           |corpus_cells AS (SELECT vec_id, v, centroid_id FROM ranked WHERE rn = 1),
           |query_cells AS (SELECT vec_id, v, centroid_id FROM ranked
           |                WHERE rn <= 2 AND vec_id >= 100 AND vec_id < 110),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |         ${cos("q.v", "n.v")} AS cos
           |  FROM query_cells q JOIN corpus_cells n
           |    ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    // one Lloyd round of in-engine kmeans vs an independent SQL formulation:
    // seeds = 8 lowest ids, cosine assignment (tie → lowest centroid), then
    // elementwise means via exact decimal sums (partitioning-independent —
    // a float avg would be run-dependent). Output rounded to 9 digits: the
    // two engines' double→decimal(30,15) casts round the LAST ulp
    // differently, so the exact means can differ by ~1e-16.
    "sim_kmeans_1iter" -> Q(
      (s, d) => Similarity.kmeans(embBase(s, d), "vec_id", "v", k = 8, iters = 1)
        .select(col("centroid_id"),
          // flattened to one canonical string: the driver's pandas oracle
          // sorts every output column and cannot factorize ndarray cells, so
          // an array<double> column is unhashable for it (r4 verdict). %.9f
          // after round(·,9) renders identically in both engines; the +0.0
          // folds round's -0.0 (tiny negative means) onto +0.0 — DuckDB and
          // Java disagree on formatting the sign of negative zero.
          array_join(transform(col("v"),
            x => format_string("%.9f", round(x, 9) + lit(0.0))), ",").as("v")),
      Some(embBaseSql +
        s""", seeds AS (SELECT vec_id AS centroid_id, v AS cv FROM base ORDER BY vec_id LIMIT 8),
           |scored AS (
           |  SELECT b.vec_id, b.v, s.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "s.cv")} DESC, s.centroid_id) AS rn
           |  FROM base b CROSS JOIN seeds s),
           |assigned AS (SELECT vec_id, v, centroid_id FROM scored WHERE rn = 1),
           |ex AS (SELECT centroid_id, unnest(v) AS x, unnest(range(len(v))) AS i FROM assigned),
           |dims AS (SELECT centroid_id, i,
           |           round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 9) AS m
           |         FROM ex GROUP BY 1, 2)
           |SELECT centroid_id,
           |       array_to_string(list_transform(list(m ORDER BY i),
           |                                      x -> printf('%.9f', x + 0)), ',') AS v
           |FROM dims GROUP BY centroid_id""".stripMargin)),

    // three Lloyd rounds, hash-sampled seeding — the production shape:
    // iterated convergence with constant lineage (localCheckpoint per
    // round), md5-ordered seeds (id order correlates with data layout; hash
    // order doesn't), per-round means rounded to 9 digits on BOTH sides so
    // every round starts from bit-identical centroids (see kmeans scaladoc).
    // The oracle unrolls the same three rounds as chained CTEs.
    "sim_kmeans_3iter" -> Q(
      (s, d) => Similarity.kmeans(embBase(s, d), "vec_id", "v", k = 8, iters = 3,
        seedByHash = true, roundDigits = 9)
        .select(col("centroid_id"),
          // already rounded per-round; flatten for the oracle like sim_kmeans_1iter
          array_join(transform(col("v"),
            x => format_string("%.9f", x + lit(0.0))), ",").as("v")),
      Some(embBaseSql + ", " + kmeansRoundsSql(iters = 3, k = 8) +
        s"""
           |SELECT centroid_id,
           |       array_to_string(list_transform(cv,
           |                                      x -> printf('%.9f', x + 0)), ',') AS v
           |FROM cents3""".stripMargin)),

    // end-to-end ANN: train centroids in-engine (one Lloyd round), then IVF
    // search with them — the full "train + search" pipeline against one
    // independent SQL formulation. Centroids are rounded to 9 digits on BOTH
    // sides before assignment (see sim_kmeans_1iter) so cell membership is
    // engine-identical.
    "sim_ivf_kmeans_e2e" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val cents = Similarity.kmeans(base, "vec_id", "v", k = 8, iters = 1)
          .select(col("centroid_id").as("vec_id"),
            transform(col("v"), x => round(x, 9)).as("v"))
        Similarity.ivfTopK(base,
          base.filter(col("vec_id") >= 100 && col("vec_id") < 110),
          cents, "vec_id", "v", k = 3)
      },
      Some(embBaseSql +
        s""", seeds AS (SELECT vec_id AS centroid_id, v AS cv FROM base ORDER BY vec_id LIMIT 8),
           |kscored AS (
           |  SELECT b.vec_id, b.v, s.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "s.cv")} DESC, s.centroid_id) AS rn
           |  FROM base b CROSS JOIN seeds s),
           |kassigned AS (SELECT vec_id, v, centroid_id FROM kscored WHERE rn = 1),
           |kex AS (SELECT centroid_id, unnest(v) AS x, unnest(range(len(v))) AS i FROM kassigned),
           |kdims AS (SELECT centroid_id, i,
           |            round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 9) AS m
           |          FROM kex GROUP BY 1, 2),
           |cents AS (SELECT centroid_id, list(m ORDER BY i) AS centv FROM kdims GROUP BY centroid_id),
           |ranked AS (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cents c),
           |corpus_cells AS (SELECT vec_id, v, centroid_id FROM ranked WHERE rn = 1),
           |query_cells AS (SELECT vec_id, v, centroid_id FROM ranked
           |                WHERE rn = 1 AND vec_id >= 100 AND vec_id < 110),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |         ${cos("q.v", "n.v")} AS cos
           |  FROM query_cells q JOIN corpus_cells n
           |    ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM pairs)
           |WHERE rank <= 3""".stripMargin)),

    // int8 quantization: the embedding storage-scale path (4× smaller than
    // float32); floor + IEEE doubles → codes bit-identical across engines
    // Johnson–Lindenstrauss random-sign projection 64→8 dims: the oracle
    // unrolls the SAME md5-seeded ±1 matrix (Similarity.projectionSigns)
    // as explicit left-associated arithmetic, so results are bit-identical
    // proj flattened to one %.9f comma-joined string (the sim_pq_train
    // convention): raw array cells crash the driver's pandas sort. The
    // oracle compare is therefore 9-decimal, NOT bit-exact — full-precision
    // rendering is impossible here because Java's Formatter pads zeros past
    // the shortest double representation instead of computing exact digits
    // (measured: %.16e renders ...8600 where DuckDB's exact ...8596), so
    // the renderings diverge on ~half the values even for identical bits.
    // Bit-identity of the projection arithmetic is enforced by OpsSpec's
    // exact-double comparison against an independent in-test computation.
    "sim_random_projection" -> Q(
      (s, d) => Similarity.randomProjection(embBase(s, d), "vec_id", "v",
        dIn = 64, dOut = 8, salt = "rp")
        .withColumn("proj",
          array_join(transform(col("proj"),
            x => format_string("%.9f", x + lit(0.0))), ",")),
      Some(embBaseSql +
        s"""SELECT vec_id,
           |  array_to_string(list_transform(${projSqlExpr("v")},
           |                                 x -> printf('%.9f', x + 0)), ',') AS proj
           |FROM base""".stripMargin)),

    // two-stage ANN: top-`refine` in the 8-dim projected space (bounded
    // aggregate), exact 64-dim cosine re-rank of just those candidates
    "sim_projected_topk" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        Similarity.projectedTopK(base, base.filter(col("vec_id") < 5),
          "vec_id", "v", dIn = 64, dProj = 8, k = 3, refine = 10)
      },
      Some(embBaseSql +
        s""", cp AS (SELECT vec_id AS neighbor_id, v AS cv, ${projSqlExpr("v")} AS cpv FROM base),
           |qp AS (SELECT vec_id AS query_id, v AS qv, ${projSqlExpr("v")} AS qpv
           |       FROM base WHERE vec_id < 5),
           |s1 AS (SELECT query_id, neighbor_id, qv, cv,
           |         row_number() OVER (PARTITION BY query_id
           |           ORDER BY ${cos("qpv", "cpv")} DESC, neighbor_id) AS prank
           |       FROM qp JOIN cp ON neighbor_id <> query_id),
           |ex AS (SELECT query_id, neighbor_id, ${cos("qv", "cv")} AS cos
           |       FROM s1 WHERE prank <= 10)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM ex)
           |WHERE rank <= 3""".stripMargin)),

    "sim_quantize_int8" -> Q(
      (s, d) => Similarity.quantizeInt8(embBase(s, d), "vec_id", "v")
        // codes flattened to one canonical string (see sim_kmeans_1iter: the
        // driver's oracle cannot sort array cells); ints render identically
        .withColumn("codes",
          array_join(transform(col("codes"), _.cast("string")), ",")),
      Some(embBaseSql +
        """, mm AS (SELECT vec_id, v, list_aggregate(v, 'min') AS vmin,
          |                           list_aggregate(v, 'max') AS vmax FROM base)
          |SELECT vec_id, vmin, (vmax - vmin) / 255.0 AS scale,
          |       array_to_string(
          |         CASE WHEN vmax = vmin THEN list_transform(v, x -> 0)
          |              ELSE list_transform(v, x ->
          |                CAST(floor((x - vmin) * 255.0 / (vmax - vmin)) AS INT)) END,
          |         ',') AS codes
          |FROM mm""".stripMargin)),

    // product quantization: codebook after one joint-L2 Lloyd round vs an
    // independent SQL unroll — seeds are the 4 lowest ids sliced into m=2
    // subspaces (dense cids in seed order), assignment is per-subspace
    // squared L2 (tie → lowest cid), means are exact decimal sums rounded
    // to 9 digits on both sides (the kmeans reproducibility contract)
    "sim_pq_train" -> Q(
      (s, d) => Similarity.pqTrain(embBase(s, d), "vec_id", "v",
        m = 2, k = 4, iters = 1, roundDigits = 9)
        .select(col("sub").cast("long").as("sub"),
          col("centroid_id").cast("long").as("centroid_id"),
          array_join(transform(col("v"),
            x => format_string("%.9f", x + lit(0.0))), ",").as("v")),
      Some(embBaseSql + ", " + pqTrainSql(k = 4) +
        s"""
           |SELECT sub, cid AS centroid_id,
           |       array_to_string(list_transform(cv,
           |                                      x -> printf('%.9f', x + 0)), ',') AS v
           |FROM pcents""".stripMargin)),

    // encode against the round-1 codebook: one dense centroid id per
    // subspace, map-only on the corpus (the 16×-compression storage path)
    "sim_pq_encode" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val book = Similarity.pqTrain(base, "vec_id", "v",
          m = 2, k = 4, iters = 1, roundDigits = 9)
        Similarity.pqEncode(base, book, "vec_id", "v")
          .select(col("vec_id"),
            array_join(transform(col("codes"), _.cast("string")), ",").as("codes"))
      },
      Some(embBaseSql + ", " + pqTrainSql(k = 4) + ", " + pqEncodeSql +
        s"""
           |SELECT vec_id,
           |       array_to_string(list(CAST(cid AS VARCHAR) ORDER BY sub), ',') AS codes
           |FROM ecodes GROUP BY vec_id""".stripMargin)),

    // end-to-end ADC search: train → encode → asymmetric-cosine top-k read
    // entirely from codes + per-query LUTs. The oracle reconstructs x̂ and
    // scores cos(q, x̂) with the SAME per-subspace grouping (inner dot per
    // subspace, outer sum over subspaces) so floats match bit-for-bit.
    "sim_pq_topk" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val book = Similarity.pqTrain(base, "vec_id", "v",
          m = 2, k = 4, iters = 1, roundDigits = 9)
        val enc = Similarity.pqEncode(base, book, "vec_id", "v")
        Similarity.pqTopK(enc, base.filter(col("vec_id") < 5), book,
          "vec_id", "v", k = 3)
      },
      Some(embBaseSql + ", " + pqTrainSql(k = 4) + ", " + pqEncodeSql +
        s""", recon AS (
           |  SELECT e.vec_id, flatten(list(c.cv ORDER BY c.sub)) AS vhat
           |  FROM ecodes e JOIN pcents c ON c.sub = e.sub AND c.cid = e.cid
           |  GROUP BY e.vec_id),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
           |ppairs AS (
           |  SELECT q.query_id, r.vec_id AS neighbor_id,
           |    list_sum(list_transform(range(2), s ->
           |      list_sum(list_transform(list_zip(list_slice(q.qv, s*32+1, (s+1)*32),
           |                                       list_slice(r.vhat, s*32+1, (s+1)*32)),
           |               p -> p[1]*p[2]))))
           |    / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
           |       * sqrt(list_sum(list_transform(range(2), s ->
           |           list_sum(list_transform(list_slice(r.vhat, s*32+1, (s+1)*32),
           |                    x -> x*x))))))
           |    AS cos
           |  FROM q JOIN recon r ON r.vec_id <> q.query_id)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM ppairs)
           |WHERE rank <= 3""".stripMargin)),

    // ADC top-k with label metadata riding the payload struct — with PQ
    // the no-corpus-re-join property matters twice, since the codes frame
    // is the only thing the scan reads
    "sim_pq_topk_meta" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val book = Similarity.pqTrain(base, "vec_id", "v",
          m = 2, k = 4, iters = 1, roundDigits = 9)
        val enc = Similarity.pqEncode(base, book, "vec_id", "v")
        Similarity.pqTopKMeta(enc, base.filter(col("vec_id") < 5), book,
          "vec_id", "v", k = 3, metaCols = Seq("label"))
          .select("query_id", "rank", "neighbor_id", "label")
      },
      Some(embBaseSql + ", " + pqTrainSql(k = 4) + ", " + pqEncodeSql +
        s""", recon AS (
           |  SELECT e.vec_id, flatten(list(c.cv ORDER BY c.sub)) AS vhat
           |  FROM ecodes e JOIN pcents c ON c.sub = e.sub AND c.cid = e.cid
           |  GROUP BY e.vec_id),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
           |ppairs AS (
           |  SELECT q.query_id, r.vec_id AS neighbor_id, b.label,
           |    list_sum(list_transform(range(2), s ->
           |      list_sum(list_transform(list_zip(list_slice(q.qv, s*32+1, (s+1)*32),
           |                                       list_slice(r.vhat, s*32+1, (s+1)*32)),
           |               p -> p[1]*p[2]))))
           |    / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
           |       * sqrt(list_sum(list_transform(range(2), s ->
           |           list_sum(list_transform(list_slice(r.vhat, s*32+1, (s+1)*32),
           |                    x -> x*x))))))
           |    AS cos
           |  FROM q JOIN recon r ON r.vec_id <> q.query_id
           |  JOIN base b ON b.vec_id = r.vec_id)
           |SELECT query_id, rank, neighbor_id, label FROM (
           |  SELECT query_id, neighbor_id, label,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM ppairs)
           |WHERE rank <= 3""".stripMargin)),

    // IVF-PQ end-to-end: coarse cells from one in-engine Lloyd round
    // (cosine assignment, as sim_ivf_kmeans_e2e), PQ codes from one
    // joint-L2 round, queries scored by ADC cosine WITHIN their probed
    // cell only. The oracle composes the same two training unrolls, then
    // reconstructs and scores with the per-subspace float grouping.
    "sim_ivf_pq_e2e" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        // kmeans outputs centroid_id; rename to the idCol/vecCol convention
        val cents = Similarity.kmeans(base, "vec_id", "v", k = 8, iters = 1)
          .select(col("centroid_id").as("vec_id"),
            transform(col("v"), x => round(x, 9)).as("v"))
        val book = Similarity.pqTrain(base, "vec_id", "v",
          m = 2, k = 4, iters = 1, roundDigits = 9)
        Similarity.ivfPqTopK(base,
          base.filter(col("vec_id") >= 100 && col("vec_id") < 110),
          cents, book, "vec_id", "v", k = 3)
      },
      ivfPqE2eOracle),

    // the PERSISTED IVF-PQ index: the same trained models and corpus, but
    // assigned+encoded ONCE, written partitionBy(centroid_id) as (id,
    // codes), read back and probed — cell file-skipping stacked on the
    // 190x-narrower codes scan. The oracle is sim_ivf_pq_e2e's verbatim:
    // persistence must not change a single neighbor.
    "sim_ivf_pq_index_topk" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val cents = Similarity.kmeans(base, "vec_id", "v", k = 8, iters = 1)
          .select(col("centroid_id").as("vec_id"),
            transform(col("v"), x => round(x, 9)).as("v"))
        val book = Similarity.pqTrain(base, "vec_id", "v",
          m = 2, k = 4, iters = 1, roundDigits = 9)
        val path = TempDirs.create("graft-ivfpq-index-")
        graft.ops.SimilarityIndex.buildIvfPqFromModels(
          base, cents, book, "vec_id", "v", path)
        graft.ops.SimilarityIndex.loadIvfPq(s, path, "vec_id", "v")
          .topK(base.filter(col("vec_id") >= 100 && col("vec_id") < 110), k = 3)
      },
      ivfPqE2eOracle),

    // the IVF-PQ re-cluster cycle end-to-end: build, takedown-delete a
    // slice, then rebuild() — which must re-train BOTH models on the
    // corpus SEMI-JOINED to the index's surviving id set (codes are
    // lossy, so the caller hands the source corpus; the corpus STILL
    // CARRIES the deleted rows here, and the index's id set — not the
    // corpus — is the membership authority: a stale-corpus resurrection
    // bug fails this hash). The oracle recomputes the hash-seeded
    // k-means round, the hash-seeded PQ round, the encode, and the ADC
    // probe over the survivors as independent CTEs.
    "sim_ivfpq_rebuild_topk" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        // the initial models are throwaways (rebuild replaces both) —
        // seed-only codebook + given centroids; only the id set they
        // index matters, which the delete then shrinks
        val book0 = Similarity.pqTrain(base, "vec_id", "v", m = 2, k = 4, iters = 0)
        val path = TempDirs.create("graft-ivfpq-rb-")
        graft.ops.SimilarityIndex.buildIvfPqFromModels(
          base, base.filter(col("vec_id") < 8), book0, "vec_id", "v", path)
        val idx = graft.ops.SimilarityIndex.loadIvfPq(s, path, "vec_id", "v")
        idx.delete(base.filter(col("vec_id") % 17 === 3).select("vec_id"))
        val rebuilt = idx.rebuild(base, k = 8, iters = 1, m = 2, codebookK = 4)
        rebuilt.topK(base.filter(col("vec_id") >= 100 && col("vec_id") < 110), k = 3)
      },
      Some(embBaseSql +
        s""", surv AS (SELECT vec_id, v FROM base WHERE vec_id % 17 <> 3),
           |${kmeansRoundsSql(iters = 1, k = 8, from = "surv")},
           |cents AS (SELECT centroid_id, cv AS centv FROM cents1),
           |corpus_cells AS (SELECT vec_id, centroid_id FROM (
           |  SELECT b.vec_id, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM surv b CROSS JOIN cents c) WHERE rn = 1),
           |${pqTrainSql(k = 4, from = "surv", seedByHash = true)},
           |$pqEncodeSql,
           |recon AS (
           |  SELECT e.vec_id, flatten(list(c.cv ORDER BY c.sub)) AS vhat
           |  FROM ecodes e JOIN pcents c ON c.sub = e.sub AND c.cid = e.cid
           |  GROUP BY e.vec_id),
           |q AS (SELECT vec_id AS query_id, v AS qv, centroid_id FROM (
           |  SELECT b.vec_id, b.v, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cents c)
           |  WHERE rn = 1 AND vec_id >= 100 AND vec_id < 110),
           |ppairs AS (
           |  SELECT q.query_id, n.vec_id AS neighbor_id,
           |    list_sum(list_transform(range(2), s ->
           |      list_sum(list_transform(list_zip(list_slice(q.qv, s*32+1, (s+1)*32),
           |                                       list_slice(r.vhat, s*32+1, (s+1)*32)),
           |               p -> p[1]*p[2]))))
           |    / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
           |       * sqrt(list_sum(list_transform(range(2), s ->
           |           list_sum(list_transform(list_slice(r.vhat, s*32+1, (s+1)*32),
           |                    x -> x*x))))))
           |    AS cos
           |  FROM q JOIN corpus_cells n ON n.centroid_id = q.centroid_id
           |  JOIN recon r ON r.vec_id = n.vec_id
           |  WHERE n.vec_id <> q.query_id)
           |SELECT query_id, rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM ppairs)
           |WHERE rank <= 3""".stripMargin)),

    // ---------------- text analysis ----------------

    "text_langid" -> Q(
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred")),
      Some(s"""SELECT doc_id, $langCase AS lang_pred FROM documents""")),

    // Unicode-script profile: per-script code-point counts + dominant
    // script (tiebreak = scriptClasses order, zero → unknown). Salted
    // docs replace their text with fixed non-Latin samples so every
    // branch fires both ways: Cyrillic/Han/Hiragana/Hangul/Arabic/Greek
    // dominants, a digits-only unknown, and a latin-cyrillic TIE that
    // must resolve to latin in both engines. Java spells a script class
    // \p{IsX}, RE2 \p{X} — the class tables agree on these samples.
    "text_scripts" -> Q(
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val salted = docs.select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit("Привет мир совсем другой текст здесь"))
            .when(col("doc_id") % 11 === 1, lit("中文文本处理系统测试"))
            .when(col("doc_id") % 11 === 2, lit("こんにちは せかい ひらがな"))
            .when(col("doc_id") % 11 === 3, lit("한국어 텍스트 처리"))
            .when(col("doc_id") % 11 === 4, lit("مرحبا بالعالم النص العربي"))
            .when(col("doc_id") % 11 === 5, lit("αβγ δεζ ελληνικά κείμενο"))
            .when(col("doc_id") % 11 === 6, lit("1234 5678 --- !!!"))
            .when(col("doc_id") % 11 === 7, lit("abc где"))
            .otherwise(col("text")).as("text"))
        TextOps.scriptProfile(salted, "doc_id", "text")
      },
      Some {
        val cnt = TextOps.scriptClasses.map { n =>
          s"len(regexp_extract_all(text, '\\p{${n.capitalize}}')) AS n_$n"
        }.mkString(",\n           |  ")
        val mx = "greatest(" + TextOps.scriptClasses.map(n => s"n_$n").mkString(", ") + ")"
        val dom = TextOps.scriptClasses
          .map(n => s"WHEN n_$n = $mx THEN '$n'").mkString(" ")
        s"""WITH salted AS (
           |  SELECT doc_id, CASE
           |    WHEN doc_id % 11 = 0 THEN 'Привет мир совсем другой текст здесь'
           |    WHEN doc_id % 11 = 1 THEN '中文文本处理系统测试'
           |    WHEN doc_id % 11 = 2 THEN 'こんにちは せかい ひらがな'
           |    WHEN doc_id % 11 = 3 THEN '한국어 텍스트 처리'
           |    WHEN doc_id % 11 = 4 THEN 'مرحبا بالعالم النص العربي'
           |    WHEN doc_id % 11 = 5 THEN 'αβγ δεζ ελληνικά κείμενο'
           |    WHEN doc_id % 11 = 6 THEN '1234 5678 --- !!!'
           |    WHEN doc_id % 11 = 7 THEN 'abc где'
           |    ELSE text END AS text
           |  FROM documents),
           |counted AS (
           |  SELECT doc_id,
           |  $cnt
           |  FROM salted)
           |SELECT *, CASE WHEN $mx = 0 THEN 'unknown' $dom
           |  ELSE 'unknown' END AS dominant_script
           |FROM counted""".stripMargin
      }),

    "text_quality" -> Q(
      (s, d) => TextOps.quality(
        Tables.load(s, d, "documents"), "doc_id", "text"),
      Some {
        val stops = TextOps.profiles.head._2.map(w => s"'$w'").mkString(",")
        s"""SELECT doc_id,
           |  len(string_split(lower(text), ' ')) AS n_tokens,
           |  length(text) * 1.0 / len(string_split(lower(text), ' ')) AS mean_tok_len,
           |  len(list_filter(string_split(lower(text), ' '), x -> x IN ($stops))) * 1.0
           |    / len(string_split(lower(text), ' ')) AS stopword_ratio,
           |  len(list_distinct(string_split(lower(text), ' '))) * 1.0
           |    / len(string_split(lower(text), ' ')) AS uniq_ratio,
           |  (len(list_filter(string_split(lower(text), ' '), x -> x IN ($stops))) * 1.0
           |    / len(string_split(lower(text), ' '))) * 0.5
           |  + (len(list_distinct(string_split(lower(text), ' '))) * 1.0
           |    / len(string_split(lower(text), ' '))) * 0.5 AS quality_score
           |FROM documents""".stripMargin
      }),

    // character-entropy noise/boilerplate signal; p·ln(p) terms rounded to
    // 12 decimals then decimal-summed (the DSIR exact-sum discipline)
    "text_entropy" -> Q(
      (s, d) => TextOps.charEntropy(
        Tables.load(s, d, "documents"), "doc_id", "text"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
             |cnt AS (SELECT doc_id, c, count(*) AS cnt FROM t GROUP BY 1, 2),
             |lens AS (SELECT doc_id, sum(cnt) AS len FROM cnt GROUP BY 1)
             |SELECT doc_id, CAST(max(len) AS BIGINT) AS n_chars,
             |  round(CAST(-sum(CAST(round((cnt * 1.0 / len) * ln(cnt * 1.0 / len), 12)
             |    AS DECIMAL(28,12))) AS DOUBLE), 4) AS entropy
             |FROM cnt JOIN lens USING (doc_id) GROUP BY doc_id""".stripMargin)),

    "text_tokens" -> Q(
      (s, d) => TextOps.tokenCounts(Tables.load(s, d, "documents"), "doc_id", "text"),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS ws_tokens,
             |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS re_tokens
             |FROM documents""".stripMargin)),

    "text_fingerprint" -> Q(
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
             |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
             |FROM documents""".stripMargin)),

    // corpus-frequent trigram mining (boilerplate detection): HOF gram
    // construction + map-combinable counts + bounded top-k; run over the
    // salted corpus so repeated content provably surfaces
    "text_heavy_ngrams" -> Q(
      (s, d) => TextOps.frequentNgrams(textCorpus(s, d), "id", "text",
        n = 3, k = 100, minCount = 2),
      Some(textCorpusSql +
        """, t AS (SELECT id, string_split(lower(text), ' ') AS t FROM corpus),
          |g AS (SELECT id, unnest(list_transform(range(1, len(t) - 1),
          |  i -> array_to_string(t[i:i+2], ' '))) AS gram FROM t WHERE len(t) >= 3)
          |SELECT gram, count(*) AS total, count(DISTINCT id) AS doc_freq
          |FROM g GROUP BY gram HAVING count(*) >= 2
          |ORDER BY total DESC, gram LIMIT 100""".stripMargin)),

    // the full winnow composition (the dedup_lsh_jaccard analog): winnow
    // candidates -> exact Jaccard verify, threshold 0.5 — candidate
    // generation rides the ~1/w fingerprint stream, exactness comes from
    // the verify pass, linear in the candidate list
    "dedup_winnow_jaccard" -> Q(
      (s, d) => {
        // corpus deliberately UNPERSISTED across the two stages: caching it
        // (or the fingerprint stream inside candidate gen) measures SLOWER
        // than recompute-from-parquet + ReuseExchange — SCALING.md r10
        // winnow-reuse pin. The streams themselves cannot share: winnowing
        // hashes lowercased k-grams, the verify shingles raw text.
        val corpus = textCorpus(s, d)
        val cand = Dedup.winnowCandidatePairs(corpus, "id", "text",
          k = 3, w = 4, maxDf = 100, minShared = 2)
          .select("d1", "d2").localCheckpoint(true)
        Dedup.jaccardForPairs(corpus, cand, "id", "text")
          .filter(col("jaccard") >= 0.5)
      },
      Some(textCorpusSql +
        """, t AS (SELECT id, string_split(lower(text), ' ') AS t FROM corpus),
          |g AS (SELECT id, len(t) - 2 AS m, t FROM t),
          |hh AS (SELECT id, CASE WHEN m >= 1 THEN list_transform(range(1, m + 1),
          |  i -> md5(array_to_string(t[i:i+2], ' '))) ELSE [] END AS h FROM g),
          |fp0 AS (SELECT id, unnest(CASE WHEN len(h) = 0 THEN [] ELSE
          |  list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
          |    s -> list_min(h[s:s+3]))) END) AS fp FROM hh),
          |freq AS (SELECT fp, count(*) AS c FROM fp0 GROUP BY fp),
          |fps AS (SELECT f.id, f.fp FROM fp0 f JOIN freq q ON f.fp = q.fp WHERE q.c <= 100),
          |cand AS (SELECT a.id AS d1, b.id AS d2
          |         FROM fps a JOIN fps b ON a.fp = b.fp AND a.id < b.id
          |         GROUP BY 1, 2 HAVING count(*) >= 2),
          |words AS (SELECT id, string_split(text, ' ') AS w FROM corpus),
          |sh0 AS (SELECT DISTINCT id,
          |          unnest(list_transform(range(len(w)-2), i -> array_to_string(w[i+1:i+3], ' '))) AS sh
          |        FROM words),
          |sizes AS (SELECT id, count(*) AS sz FROM sh0 GROUP BY id),
          |inters AS (SELECT c.d1, c.d2, count(*) AS inter
          |           FROM cand c JOIN sh0 a ON a.id = c.d1
          |                       JOIN sh0 b ON b.id = c.d2 AND b.sh = a.sh
          |           GROUP BY 1, 2)
          |SELECT d1, d2, inter, jaccard FROM (
          |  SELECT d1, d2, coalesce(inter, 0) AS inter,
          |         coalesce(inter, 0) * 1.0 / (s1.sz + s2.sz - coalesce(inter, 0)) AS jaccard
          |  FROM cand LEFT JOIN inters USING (d1, d2)
          |  JOIN sizes s1 ON d1 = s1.id JOIN sizes s2 ON d2 = s2.id)
          |WHERE jaccard >= 0.5""".stripMargin)),

    // the sketch-pruned form: CMS pre-pass + broadcast probe + exact verify
    // — result is EXACTLY the exact version's (sketch prunes, never
    // decides), so it shares that oracle
    "text_heavy_ngrams_sketched" -> Q(
      (s, d) => TextOps.frequentNgramsSketched(textCorpus(s, d), "id", "text",
        n = 3, k = 100, minCount = 2, eps = 1e-4, confidence = 0.99),
      Some(textCorpusSql +
        """, t AS (SELECT id, string_split(lower(text), ' ') AS t FROM corpus),
          |g AS (SELECT id, unnest(list_transform(range(1, len(t) - 1),
          |  i -> array_to_string(t[i:i+2], ' '))) AS gram FROM t WHERE len(t) >= 3)
          |SELECT gram, count(*) AS total, count(DISTINCT id) AS doc_freq
          |FROM g GROUP BY gram HAVING count(*) >= 2
          |ORDER BY total DESC, gram LIMIT 100""".stripMargin)),

    // winnowing fingerprint selection (MOSS, SIGMOD 2003): min-hash of each
    // w-window of k-gram md5s, map-only per document — any shared run of
    // >= w+k-1 tokens forces a shared fingerprint
    // fps flattened to one comma-joined string (the sim_pq_encode
    // convention): raw array cells crash the driver's pandas sort
    "text_winnow" -> Q(
      (s, d) => TextOps.winnowFingerprints(
        Tables.load(s, d, "documents"), "doc_id", "text", k = 3, w = 4)
        .withColumn("n_grams", col("n_grams").cast("long"))
        .withColumn("fps", array_join(col("fps"), ",")),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
             |g AS (SELECT doc_id, len(t) - 2 AS m, t FROM t),
             |h AS (SELECT doc_id, greatest(m, 0) AS n_grams,
             |  CASE WHEN m >= 1 THEN list_transform(range(1, m + 1),
             |    i -> md5(array_to_string(t[i:i+2], ' '))) ELSE [] END AS h FROM g)
             |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
             |  array_to_string(CASE WHEN len(h) = 0 THEN [] ELSE
             |    list_sort(list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
             |      s -> list_min(h[s:s+3])))) END, ',') AS fps
             |FROM h""".stripMargin)),

    // winnow-fingerprint near-dup candidates: inverted-index join over the
    // ~1/w-sampled fingerprint stream, df <= 100 skew guard, containment
    // overlap = shared / min(|fps|) — the local-guarantee complement to
    // minhash-LSH candidate generation
    "dedup_winnow_pairs" -> Q(
      (s, d) => Dedup.winnowCandidatePairs(textCorpus(s, d), "id", "text",
        k = 3, w = 4, maxDf = 100, minShared = 2),
      Some(textCorpusSql +
        """, t AS (SELECT id, string_split(lower(text), ' ') AS t FROM corpus),
          |g AS (SELECT id, len(t) - 2 AS m, t FROM t),
          |hh AS (SELECT id, CASE WHEN m >= 1 THEN list_transform(range(1, m + 1),
          |  i -> md5(array_to_string(t[i:i+2], ' '))) ELSE [] END AS h FROM g),
          |fp0 AS (SELECT id, unnest(CASE WHEN len(h) = 0 THEN [] ELSE
          |  list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
          |    s -> list_min(h[s:s+3]))) END) AS fp FROM hh),
          |freq AS (SELECT fp, count(*) AS c FROM fp0 GROUP BY fp),
          |fps AS (SELECT f.id, f.fp FROM fp0 f JOIN freq q ON f.fp = q.fp WHERE q.c <= 100),
          |sizes AS (SELECT id, count(*) AS sz FROM fps GROUP BY id),
          |pairs AS (SELECT a.id AS d1, b.id AS d2, count(*) AS shared
          |          FROM fps a JOIN fps b ON a.fp = b.fp AND a.id < b.id GROUP BY 1, 2)
          |SELECT d1, d2, shared, shared * 1.0 / least(s1.sz, s2.sz) AS overlap
          |FROM pairs JOIN sizes s1 ON d1 = s1.id JOIN sizes s2 ON d2 = s2.id
          |WHERE shared >= 2""".stripMargin)),

    // passage containment (local decontamination): eval docs = doc_id%13
    // slice; the salted corpus provably contains their exact copies, so
    // every query doc hits. Default (uncapped) path: the guarantee holds
    // however widespread the contamination
    "dedup_winnow_containment" -> Q(
      (s, d) => Dedup.winnowContainment(
        textCorpus(s, d),
        Tables.load(s, d, "documents").filter(col("doc_id") % 13 === 0)
          .select(col("doc_id").as("id"), col("text")),
        "id", "text", k = 3, w = 4, minShared = 1),
      Some(textCorpusSql +
        """, t AS (SELECT id, string_split(lower(text), ' ') AS t FROM corpus),
          |g AS (SELECT id, len(t) - 2 AS m, t FROM t),
          |hh AS (SELECT id, CASE WHEN m >= 1 THEN list_transform(range(1, m + 1),
          |  i -> md5(array_to_string(t[i:i+2], ' '))) ELSE [] END AS h FROM g),
          |cfp AS (SELECT id AS did, unnest(CASE WHEN len(h) = 0 THEN [] ELSE
          |  list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
          |    s -> list_min(h[s:s+3]))) END) AS fp FROM hh),
          |qt AS (SELECT doc_id AS qid, string_split(lower(text), ' ') AS t
          |       FROM documents WHERE doc_id % 13 = 0),
          |qg AS (SELECT qid, len(t) - 2 AS m, t FROM qt),
          |qh AS (SELECT qid, CASE WHEN m >= 1 THEN list_transform(range(1, m + 1),
          |  i -> md5(array_to_string(t[i:i+2], ' '))) ELSE [] END AS h FROM qg),
          |qfps AS (SELECT qid, CASE WHEN len(h) = 0 THEN [] ELSE
          |  list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
          |    s -> list_min(h[s:s+3]))) END AS fps FROM qh),
          |qfp AS (SELECT qid, unnest(fps) AS fp FROM qfps),
          |qsz AS (SELECT qid, len(fps) AS qsz FROM qfps),
          |hits AS (SELECT qid, did, count(*) AS shared
          |         FROM cfp JOIN qfp USING (fp) GROUP BY 1, 2)
          |SELECT qid, did, shared, shared * 1.0 / qsz AS containment
          |FROM hits JOIN qsz USING (qid) WHERE shared >= 1""".stripMargin)),

    "text_vocab" -> Q(
      (s, d) => TextOps.vocabulary(Tables.load(s, d, "documents"), "doc_id", "text", k = 100),
      Some("""SELECT tok, count(DISTINCT doc_id) AS doc_freq, count(*) AS total
             |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
             |GROUP BY tok ORDER BY total DESC, tok LIMIT 100""".stripMargin)),

    // tokenizer-coverage gate: per-doc OOV rate against the corpus's own
    // top-100 vocabulary (bounded, broadcast into the token stream — the
    // membership probe never shuffles the corpus)
    "text_oov_rate" -> Q(
      (s, d) => TextOps.oovRate(
        Tables.load(s, d, "documents"), "doc_id", "text", vocabSize = 100),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
             |          FROM documents),
             |v AS (SELECT tok FROM (SELECT tok, count(*) AS total FROM t
             |                       GROUP BY tok ORDER BY total DESC, tok LIMIT 100)),
             |j AS (SELECT t.doc_id, t.tok, v.tok AS vt FROM t LEFT JOIN v USING (tok))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             |  round(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             |    AS oov_rate
             |FROM j GROUP BY doc_id""".stripMargin)),

    // one-aggregation corpus profile: per-language doc counts + exact
    // interpolated length percentiles (deterministic — no float summation)
    "text_profile" -> Q(
      (s, d) => TextOps.corpusProfile(
        Tables.load(s, d, "documents"), "lang", "n_chars"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  quantile_cont(n_chars, 0.5) AS p50,
             |  quantile_cont(n_chars, 0.9) AS p90,
             |  min(n_chars) AS lo, max(n_chars) AS hi
             |FROM documents GROUP BY lang""".stripMargin)),

    // corpus-trained add-1 bigram LM perplexity per document; ppl rounded to
    // 1e-4 so avg()'s float summation order can't surface in the hash
    "text_perplexity" -> Q(
      (s, d) => TextOps.bigramPerplexity(
        Tables.load(s, d, "documents"), "doc_id", "text").withColumnRenamed("id", "doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
             |tok AS (SELECT unnest(t) AS w1 FROM t),
             |uni AS (SELECT w1, count(*) AS cw FROM tok GROUP BY w1),
             |v AS (SELECT count(*) AS vsz FROM uni),
             |bg AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
             |    i -> {'w1': t[i], 'w2': t[i+1]}), recursive := true)
             |  FROM t WHERE len(t) >= 2),
             |bigc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2)
             |SELECT bg.doc_id AS doc_id, count(*) AS n_bigrams,
             |  round(exp(-avg(ln((cb + 1.0) / (cw + 1.0 * vsz)))), 4) AS ppl
             |FROM bg JOIN bigc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
             |GROUP BY bg.doc_id""".stripMargin)),

    // repetition ratio (Gopher-style repetitive-content gate); docs with
    // doc_id % 9 get a repeated phrase appended so nonzero ratios provably
    // appear, mirrored in the oracle
    "text_repetition" -> Q(
      (s, d) => {
        val salted = Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("text"), when(col("doc_id") % 9 === 0,
            lit(" spam spam spam spam spam spam")).otherwise(lit(""))).as("text"))
        TextOps.repetition(salted, "doc_id", "text")
      },
      Some("""WITH corpus AS (SELECT doc_id, text || CASE WHEN doc_id % 9 = 0
             |    THEN ' spam spam spam spam spam spam' ELSE '' END AS text FROM documents),
             |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
             |g AS (SELECT doc_id,
             |        list_transform(range(len(w)-2), i -> array_to_string(w[i+1:i+3], ' ')) AS grams
             |      FROM w)
             |SELECT doc_id, len(grams) AS n_grams,
             |       CASE WHEN len(grams) = 0 THEN 0.0
             |            ELSE (len(grams) - len(list_distinct(grams))) * 1.0 / len(grams)
             |       END AS rep_ratio
             |FROM g""".stripMargin)),

    // Line-level boilerplate removal: doc_id % 6 docs get a shared template
    // line appended (~83 occurrences at sf0.01, over the minCount=10 bar)
    // so corpus-wide repeated lines provably get cut while unique lines
    // survive; multi-line docs rebuild in original order.
    "dedup_repeated_lines" -> Q(
      (s, d) => {
        val salted = Tables.load(s, d, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 6 === 0, lit("Subscribe to our newsletter today\n"))
              .otherwise(lit("")),
            col("text")).as("text"))
        Dedup.removeRepeatedLines(salted, "doc_id", "text", minCount = 10)
          .withColumnRenamed("id", "doc_id")
      },
      // oracle idiom note: deliberately plain list functions (list_filter
      // preserves input order, so no positions / recursive unnest / ordered
      // string_agg are needed) — the r8 driver flap pointed at the
      // DuckDB-version-sensitive recursive-unnest formulation
      Some("""WITH corpus AS (SELECT doc_id,
             |  CASE WHEN doc_id % 6 = 0 THEN 'Subscribe to our newsletter today' || chr(10)
             |       ELSE '' END || text AS text FROM documents),
             |w AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus),
             |c AS (SELECT line FROM (SELECT unnest(ls) AS line FROM w)
             |      GROUP BY line HAVING count(*) >= 10),
             |freq AS (SELECT CAST(coalesce(list(line), []) AS VARCHAR[]) AS fl FROM c),
             |k AS (SELECT doc_id, ls, list_filter(ls, x -> NOT list_contains(fl, x)) AS kept
             |      FROM w CROSS JOIN freq)
             |SELECT doc_id, array_to_string(kept, chr(10)) AS text_clean,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  CAST(len(ls) - len(kept) AS BIGINT) AS n_dropped
             |FROM k""".stripMargin)),

    // the per-row (map-only, stream-safe) minhash signature — bit-identical
    // to the aggregation form by spec; hash-checked directly here. The
    // signature is flattened to one comma-joined string (the sim_pq_encode
    // convention): raw array cells crash the driver's pandas sort.
    "dedup_minhash_signature_row" -> Q(
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          array_join(Dedup.minhashSignatureColumn(col("text"), n = 3, numPerms = 8),
            ",").as("sig")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |g AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
             |  list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
             |  ELSE [] END AS grams FROM t)
             |SELECT doc_id, array_to_string(list_transform(range(0, 8),
             |  p -> list_min(list_transform(grams, s -> md5(p || '|' || s)))), ',') AS sig
             |FROM g""".stripMargin)),

    // the streaming near-dup dedup's state key (StreamDedup.dedupNearContent)
    // over the landed corpus: exactly the production expression — minhash
    // signature md5 for docs with >= n tokens, exact content hash (null
    // coalesced to '') below that — so the watermarked state keying is
    // driver-checked even though the streaming half itself is spec-only
    "dedup_stream_key" -> Q(
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          graft.streaming.StreamDedup.nearContentKey(col("text"), n = 3, numPerms = 16)
            .as("stream_key")),
      Some("""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
             |g AS (SELECT doc_id, text, len(t) AS ntok, CASE WHEN len(t) >= 3 THEN
             |  list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
             |  ELSE [] END AS grams FROM t)
             |SELECT doc_id, CASE WHEN ntok >= 3 THEN
             |  md5(array_to_string(list_transform(range(0, 16),
             |    p -> list_min(list_transform(grams, s -> md5(p || '|' || s)))), ','))
             |  ELSE md5(coalesce(text, '')) END AS stream_key
             |FROM g""".stripMargin)),

    // pairwise source-overlap matrix: per-shingle source sets -> bounded
    // pair explode; output is #sources^2-bounded however large the corpus.
    // Spark dedups shingles on 64-bit keys, the oracle on gram text —
    // identical modulo 2^-64 collisions (the dedup_substring convention)
    "dedup_source_overlap" -> Q(
      (s, d) => Dedup.groupOverlap(
        Tables.load(s, d, "documents").select(col("source"), col("text")),
        "source", "text", n = 3)
        .withColumnRenamed("g1", "s1").withColumnRenamed("g2", "s2"),
      Some("""WITH t AS (SELECT source, string_split(text, ' ') AS t FROM documents),
             |g0 AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
             |  i -> array_to_string(t[i:i+2], ' '))) AS gram FROM t WHERE len(t) >= 3),
             |sh AS (SELECT DISTINCT source AS g, gram FROM g0),
             |sizes AS (SELECT g, count(*) AS sz FROM sh GROUP BY g),
             |inter AS (SELECT a.g AS s1, b.g AS s2, count(*) AS inter
             |          FROM sh a JOIN sh b ON a.gram = b.gram AND a.g < b.g GROUP BY 1, 2)
             |SELECT s1, s2, inter,
             |  inter * 1.0 / (z1.sz + z2.sz - inter) AS jaccard
             |FROM inter JOIN sizes z1 ON s1 = z1.g JOIN sizes z2 ON s2 = z2.g""".stripMargin)),

    // paragraph-level boilerplate cut (the CCNet unit): salted multi-line
    // banner provably removed; plain list-function oracle idiom
    "dedup_repeated_paragraphs" -> Q(
      (s, d) => {
        val salted = Tables.load(s, d, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 6 === 0,
              lit("We use cookies on this site\nAccept all to continue\n\n"))
              .otherwise(lit("")),
            col("text")).as("text"))
        Dedup.removeRepeatedParagraphs(salted, "doc_id", "text", minCount = 10)
      },
      Some("""WITH corpus AS (SELECT doc_id,
             |  CASE WHEN doc_id % 6 = 0 THEN 'We use cookies on this site' || chr(10) ||
             |       'Accept all to continue' || chr(10) || chr(10)
             |       ELSE '' END || text AS text FROM documents),
             |w AS (SELECT doc_id, list_filter(list_transform(
             |        string_split_regex(text, '\n[ \t]*\n+'), x -> trim(x)),
             |        x -> x <> '') AS ps FROM corpus),
             |c AS (SELECT p FROM (SELECT unnest(ps) AS p FROM w)
             |      GROUP BY p HAVING count(*) >= 10),
             |freq AS (SELECT CAST(coalesce(list(p), []) AS VARCHAR[]) AS fp FROM c),
             |k AS (SELECT doc_id, ps, list_filter(ps, x -> NOT list_contains(fp, x)) AS kept
             |      FROM w CROSS JOIN freq)
             |SELECT doc_id, array_to_string(kept, chr(10) || chr(10)) AS text_clean,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  CAST(len(ps) - len(kept) AS BIGINT) AS n_dropped
             |FROM k""".stripMargin)),

    // Real BPE tokenization: learn 12 merges from the corpus (deterministic
    // — lexicographic tiebreaks), encode every doc by rank priority. The
    // learn loop is iterative and data-dependent, so there is no SQL oracle
    // (the one deliberate rows-only entry); exactness is pinned by OpsSpec's
    // textbook merge-sequence test instead.
    // End-to-end BPE: learn 12 merges on the corpus, encode the corpus
    // with them. The oracle recomputes the LEARN as 12 unrolled SQL
    // rounds ([[bpeLearnRoundsSql]]) and derives each document's token
    // count from the final per-word learn STATE (the words' training
    // tokenization): priority-order encode with a table learned from
    // this same corpus reproduces the training segmentation — each
    // merge re-applies in rank order exactly as it did in training
    // (hash-verified end to end; the r14 upgrade from the former
    // no-oracle-by-design status).
    "text_bpe_tokens" -> Q(
      (s, d) => {
        val corpus = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
        val merges = TextOps.bpeLearn(corpus, "text", numMerges = 12)
        TextOps.bpeEncode(corpus, "doc_id", "text", merges)
          .select(col("doc_id"), col("n_bpe_tokens"))
      },
      Some("""WITH w0 AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
             |  FROM documents),
             |v AS (SELECT w, count(*) AS f FROM w0 WHERE len(w) > 0 GROUP BY w),
             |""".stripMargin + bpeLearnRoundsSql(12) + """,
             |wc AS (SELECT w, len(list_filter(string_split(s, chr(31)),
             |         x -> len(x) > 0)) AS n FROM s12),
             |dw AS (SELECT doc_id, unnest(list_filter(
             |         regexp_split_to_array(lower(text), '\s+'),
             |         x -> len(x) > 0)) AS w FROM documents),
             |dn AS (SELECT doc_id, sum(n) AS n FROM dw JOIN wc USING (w) GROUP BY doc_id)
             |SELECT d.doc_id, CAST(coalesce(dn.n, 0) AS BIGINT) AS n_bpe_tokens
             |FROM documents d LEFT JOIN dn USING (doc_id)""".stripMargin)),

    // the learn LOOP's merge table at small N, oracled round by round —
    // each SQL round is one pair count + the (count DESC, a, b) argmax +
    // one greedy rewrite, the same state machine the Scala loop runs
    "text_bpe_learn" -> Q(
      (s, d) => {
        val corpus = Tables.load(s, d, "documents").select(col("text"))
        // oracle-validity guard (r14 ADVICE, bpeLearnRoundsSql's bounds):
        // the SQL twin learns over the FULL vocabulary and encodes state
        // with chr(31) — assert this corpus sits inside both assumptions
        // rather than silently hash-mismatching past them
        val vocabProbe = corpus
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
          .agg(countDistinct(col("w")).as("n"),
            max(col("w").contains("\u001f")).as("hasSep"))
          .collect()(0)
        require(vocabProbe.getLong(0) <= (1 << 20) && !vocabProbe.getBoolean(1),
          s"BPE oracle assumptions violated: vocab=${vocabProbe.getLong(0)} " +
            s"(cap 2^20), chr(31)-in-text=${vocabProbe.getBoolean(1)}")
        val merges = TextOps.bpeLearn(corpus, "text", numMerges = 3)
        import s.implicits._
        merges.zipWithIndex.map { case ((a, b), r) => (r.toLong, a, b) }
          .toDF("merge_rank", "a", "b")
      },
      Some("""WITH w0 AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
             |  FROM documents),
             |v AS (SELECT w, count(*) AS f FROM w0 WHERE len(w) > 0 GROUP BY w),
             |""".stripMargin + bpeLearnRoundsSql(3) + """
             |SELECT CAST(0 AS BIGINT) AS merge_rank, a, b FROM m1
             |UNION ALL SELECT CAST(1 AS BIGINT), a, b FROM m2
             |UNION ALL SELECT CAST(2 AS BIGINT), a, b FROM m3""".stripMargin)),

    // BPE encode against a FIXED literal merge table (th < er < in by
    // rank). The pairs are single characters and their merged tokens never
    // appear in another table pair, so the greedy lowest-rank-first loop
    // reduces EXACTLY to sequential leftmost-nonoverlapping replacement in
    // rank order (later merges can destroy but never create single-char
    // adjacencies) — which gives the UDF encode path a hash-checked oracle
    // INDEPENDENT of any learned table (text_bpe_tokens' oracle covers the
    // learned-table path; OpsSpec pins the textbook merge sequence).
    "text_bpe_encode_fixed" -> Q(
      (s, d) => TextOps.bpeEncode(
        Tables.load(s, d, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", Seq(("t", "h"), ("e", "r"), ("i", "n")))
        .select(col("doc_id"), col("n_bpe_tokens")),
      Some("""WITH w AS (SELECT doc_id,
             |  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                     x -> len(x) > 0)) AS w FROM documents),
             |m AS (SELECT doc_id,
             |  len(replace(replace(replace(w, 'th', chr(1)), 'er', chr(2)),
             |      'in', chr(3))) AS n FROM w),
             |t AS (SELECT doc_id, sum(n) AS n FROM m GROUP BY doc_id)
             |SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS n_bpe_tokens
             |FROM documents d LEFT JOIN t USING (doc_id)""".stripMargin)),

    // the learn loop's first iteration end-to-end (distributed word-count
    // aggregation + driver pair count + argmax with lexicographic
    // tiebreak): hash-checked against a full SQL recomputation. Top-count
    // ties among non-ASCII pairs could in principle order differently
    // (UTF-16 vs UTF-8 collation) — the argmax pair of a natural corpus is
    // ASCII, so the tiebreak comparison space is collation-identical.
    "text_bpe_first_merge" -> Q(
      (s, d) => {
        val merges = TextOps.bpeLearn(
          Tables.load(s, d, "documents").select(col("text")), "text", numMerges = 1)
        import s.implicits._
        merges.toDF("a", "b")
      },
      Some("""WITH w0 AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
             |  FROM documents),
             |v AS (SELECT w, count(*) AS f FROM w0 WHERE len(w) > 0 GROUP BY w),
             |p AS (SELECT substr(w, CAST(i AS INT), 1) AS a,
             |             substr(w, CAST(i AS INT) + 1, 1) AS b, f
             |      FROM (SELECT w, f, unnest(range(1, len(w))) AS i FROM v
             |            WHERE len(w) >= 2)),
             |c AS (SELECT a, b, sum(f) AS cnt FROM p GROUP BY a, b)
             |SELECT a, b FROM c ORDER BY cnt DESC, a, b LIMIT 1""".stripMargin)),

    // Gopher heuristic filter (Rae et al. 2021 A1.1 + C4 line rules). Docs
    // with doc_id % 7 get bullet/ellipsis lines appended so the line-shape
    // rules provably fire; short docs (< 30 words) fail the word-count
    // floor, so `pass` has both values at sf0.01.
    "text_gopher" -> Q(
      (s, d) => {
        val salted = Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("text"), when(col("doc_id") % 7 === 0,
            lit("\n- bullet point\ntrailing line...")).otherwise(lit(""))).as("text"))
        TextOps.gopherRules(salted, "doc_id", "text", minWords = 30)
      },
      Some("""WITH corpus AS (SELECT doc_id, text || CASE WHEN doc_id % 7 = 0
             |    THEN chr(10) || '- bullet point' || chr(10) || 'trailing line...'
             |    ELSE '' END AS text FROM documents),
             |t AS (SELECT doc_id, string_split(text, ' ') AS w,
             |        string_split(lower(text), ' ') AS wl,
             |        string_split(text, chr(10)) AS ls FROM corpus),
             |s AS (SELECT doc_id,
             |  len(w) AS n_words,
             |  list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) AS mean_word_len,
             |  len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / len(w) AS alpha_frac,
             |  len(list_distinct(list_intersect(list_distinct(wl),
             |    ['the','be','to','of','and','that','have','with','a']))) AS n_stopwords,
             |  len(list_filter(ls, l -> starts_with(ltrim(l), '-')
             |    OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•')))
             |    * 1.0 / len(ls) AS bullet_frac,
             |  len(list_filter(ls, l -> ends_with(l, '...') OR ends_with(l, '…')))
             |    * 1.0 / len(ls) AS ellipsis_frac
             | FROM t)
             |SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stopwords,
             |  bullet_frac, ellipsis_frac,
             |  (n_words BETWEEN 30 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
             |  AND alpha_frac >= 0.8 AND n_stopwords >= 2
             |  AND bullet_frac < 0.9 AND ellipsis_frac < 0.3 AS pass
             |FROM s""".stripMargin)),

    // PII scrub: emails/IPv4 masked, occurrences counted. The corpus is
    // salted with synthetic PII (doc_id % 11) so the scrubber provably
    // finds and masks things; the oracle mirrors the salting.
    "text_scrub_pii" -> Q(
      (s, d) => {
        val salted = Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("text"), when(col("doc_id") % 11 === 0,
            lit(" contact bob@example.com or admin@test.org from 10.1.2.3"))
            .otherwise(lit(""))).as("text"))
        TextOps.scrubPii(salted, "doc_id", "text")
      },
      Some("""WITH corpus AS (SELECT doc_id, text || CASE WHEN doc_id % 11 = 0
             |    THEN ' contact bob@example.com or admin@test.org from 10.1.2.3'
             |    ELSE '' END AS text FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS text_clean,
             |  len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             |  len(regexp_extract_all(text,
             |    '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips
             |FROM corpus""".stripMargin)),

    // canonical text normalization (NFC + control strip + lowercase +
    // whitespace collapse) — docs salted with a decomposed accent
    // (e + U+0301 composes to é under NFC), a control char, and whitespace
    // runs so every step provably fires; the ﬁ ligature stays (NFC
    // preserves compatibility chars — the NFKC fold is spec-checked)
    "text_normalize" -> Q(
      (s, d) => {
        val salted = Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            lit("  Café   du  ﬁn\tXY  ")).as("text"))
        TextOps.normalizeText(salted, "doc_id", "text")
      },
      Some("""WITH corpus AS (SELECT doc_id,
             |    text || '  Cafe' || chr(769) || '   du  ' || chr(64257) ||
             |    'n' || chr(9) || 'X' || chr(7) || 'Y  ' AS text
             |  FROM documents)
             |SELECT doc_id,
             |  trim(regexp_replace(lower(regexp_replace(nfc_normalize(text),
             |    '[\x00-\x08\x0E-\x1F\x7F-\x9F]', '', 'g')),
             |    '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text_norm
             |FROM corpus""".stripMargin)),

    // paragraph segmentation — the salt appends a blank-line-separated
    // tail (incl. a whitespace-bearing blank line and a trailing
    // whitespace-only paragraph, which must drop) to every doc
    "text_paragraphs" -> Q(
      (s, d) => TextOps.paragraphs(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("text"), lit("\n\nSecond para\n \nThird para\n\n  "))
            .as("text")),
        "doc_id", "text"),
      Some("""WITH corpus AS (SELECT doc_id,
             |    text || chr(10) || chr(10) || 'Second para' || chr(10) || ' ' ||
             |    chr(10) || 'Third para' || chr(10) || chr(10) || '  ' AS text
             |  FROM documents)
             |SELECT doc_id, par_idx, paragraph FROM (
             |  SELECT doc_id,
             |    unnest(range(len(string_split_regex(text, '\n[ \t]*\n+')))) AS par_idx,
             |    trim(unnest(string_split_regex(text, '\n[ \t]*\n+'))) AS paragraph
             |  FROM corpus)
             |WHERE paragraph <> ''""".stripMargin)),

    // sentence segmentation — the salt guarantees every doc carries a
    // terminator run, an exclamation, a question mark, and an unterminated
    // trailing fragment, so all four regex branches fire
    "text_sentences" -> Q(
      (s, d) => TextOps.sentences(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("text"), lit(". Extra one!! Second? trailing tail"))
            .as("text")),
        "doc_id", "text"),
      Some("""WITH corpus AS (SELECT doc_id,
             |    text || '. Extra one!! Second? trailing tail' AS text FROM documents)
             |SELECT doc_id, sent_idx, sentence FROM (
             |  SELECT doc_id,
             |    unnest(range(len(regexp_extract_all(text, '[^.!?]+(?:[.!?]+|\z)')))) AS sent_idx,
             |    trim(unnest(regexp_extract_all(text, '[^.!?]+(?:[.!?]+|\z)'))) AS sentence
             |  FROM corpus)
             |WHERE sentence <> ''""".stripMargin)),

    // sentence-window chunking: groups of 3 consecutive sentences per doc,
    // rebuilt in order via sorted in-group arrays (never a window on the
    // engine side; the oracle states the same grouping with row_number)
    "text_sentence_chunks" -> Q(
      (s, d) => TextOps.chunkBySentences(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("text"), lit(". Extra one!! Second? trailing tail"))
            .as("text")),
        "doc_id", "text", sentsPerChunk = 3),
      Some("""WITH corpus AS (SELECT doc_id,
             |    text || '. Extra one!! Second? trailing tail' AS text FROM documents),
             |sents AS (
             |  SELECT doc_id, sent_idx, sentence FROM (
             |    SELECT doc_id,
             |      unnest(range(len(regexp_extract_all(text, '[^.!?]+(?:[.!?]+|\z)')))) AS sent_idx,
             |      trim(unnest(regexp_extract_all(text, '[^.!?]+(?:[.!?]+|\z)'))) AS sentence
             |    FROM corpus)
             |  WHERE sentence <> ''),
             |ranked AS (SELECT doc_id, sentence,
             |             row_number() OVER (PARTITION BY doc_id ORDER BY sent_idx) - 1 AS rnk
             |           FROM sents)
             |SELECT doc_id, rnk // 3 AS chunk_idx,
             |       string_agg(sentence, ' ' ORDER BY rnk) AS chunk,
             |       count(*) AS n_sents
             |FROM ranked GROUP BY doc_id, rnk // 3""".stripMargin)),

    // TF-IDF keyword extraction: top-5 terms per doc by tf·ln(N/df), ranked
    // by the bounded two-phase top-k aggregate (no rank window)
    "text_tfidf" -> Q(
      (s, d) => TextOps.tfidfKeywords(textCorpus(s, d), "id", "text", k = 5),
      Some(textCorpusSql +
        """, tk AS (SELECT id, unnest(string_split(lower(text), ' ')) AS term FROM corpus),
          |tf AS (SELECT id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
          |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          |n AS (SELECT count(*) AS n_docs FROM corpus),
          |w AS (SELECT tf.id, tf.term,
          |        tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df) AS weight
          |      FROM tf JOIN dfq USING (term) CROSS JOIN n)
          |SELECT id, rank, term FROM (
          |  SELECT id, term,
          |         row_number() OVER (PARTITION BY id ORDER BY weight DESC, term) AS rank
          |  FROM w)
          |WHERE rank <= 5""".stripMargin)),

    // ---------------- multimodal ----------------

    "mm_decode_stub" -> Q(
      (s, d) => {
        val media = Multimodal.attachPayload(
          Tables.load(s, d, "documents"), "doc_id", "text")
        Multimodal.decodeFeatures(media, "payload")
          .select(col("doc_id"), col("n_bytes"),
            col("meta.mime").as("mime"), col("meta.n_chars").as("n_chars"))
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             |       'text/plain' AS mime, length(text) AS n_chars
             |FROM documents""".stripMargin)),

    // resize stub: binary→binary with metadata rewrite; the oracle recomputes
    // the expected downsampled size (+ first byte) from the text itself.
    // first_byte is emitted as hex TEXT, not BINARY: the driver's comparison
    // sorts values with pandas, which cannot sort/hash bytearray cells.
    "mm_resize_stub" -> Q(
      (s, d) => {
        val media = Multimodal.attachPayload(
          Tables.load(s, d, "documents"), "doc_id", "text")
        Multimodal.resize(media, "payload", factor = 4)
          .select(col("doc_id"),
            octet_length(col("payload")).cast("long").as("n_before"),
            col("n_resized"),
            hex(expr("substring(payload_resized, 1, 1)")).as("first_byte"))
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_before,
             |       CAST((octet_length(encode(text)) + 3) // 4 AS BIGINT) AS n_resized,
             |       hex(encode(substring(text, 1, 1))) AS first_byte
             |FROM documents""".stripMargin)),

    // frame sampling: every 7th payload byte as a frame row (the video
    // frame-extraction shape; frames emitted as hex TEXT — the driver's
    // pandas compare cannot sort bytearray cells)
    "mm_frames_stub" -> Q(
      (s, d) => {
        val media = Multimodal.attachPayload(
          Tables.load(s, d, "documents"), "doc_id", "text")
        Multimodal.sampleFrames(media, "payload", every = 7)
          .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
            hex(col("frame_byte")).as("frame_hex"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, hex(encode(text)) AS h,
             |         unnest(range(((octet_length(encode(text)) - 1) // 7) + 1)) AS frame_idx
             |  FROM documents)
             |SELECT doc_id, frame_idx,
             |       substring(h, CAST(frame_idx * 14 + 1 AS BIGINT), 2) AS frame_hex
             |FROM f""".stripMargin)),

    // real image decode: deterministic grayscale PNGs generated in-engine
    // from doc_id (see Multimodal.imageFixture), decoded back with JDK
    // javax.imageio; the oracle recomputes dimensions and the order-
    // sensitive pixel hash from the closed-form pixel function — PNG is
    // lossless, so any decoder defect breaks the hash
    "mm_image_decode" -> Q(
      (s, d) => Multimodal.decodeImages(
        Multimodal.imageFixture(Tables.load(s, d, "documents"), "doc_id"), "png")
        .select(col("doc_id"), col("width"), col("height"),
          col("channels"), col("pix_hash")),
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 13 AS width,
             |                         8 + doc_id % 7 AS height FROM documents),
             |px AS (SELECT doc_id, width, height,
             |              unnest(range(width * height)) AS i FROM d)
             |SELECT doc_id, width, height, 1 AS channels,
             |       CAST(sum((i + 1) * ((doc_id * 31 + i) % 256)) AS BIGINT) AS pix_hash
             |FROM px GROUP BY doc_id, width, height""".stripMargin)),

    // real image resize: decode → nearest-neighbor ÷2 on the pixel grid →
    // re-encode PNG → decode AGAIN; the oracle mirrors the sampling
    // arithmetic (out(x,y) = in(2x, 2y)), so the hash proves the full
    // decode→transform→encode→decode loop is lossless
    "mm_image_resize" -> Q(
      (s, d) => {
        val imgs = Multimodal.imageFixture(Tables.load(s, d, "documents"), "doc_id")
        Multimodal.decodeImages(
          Multimodal.resizeImages(imgs, "png", factor = 2)
            .select(col("doc_id"), col("png_resized").as("png")), "png")
          .select(col("doc_id"), col("width"), col("height"), col("pix_hash"))
      },
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 13 AS w,
             |                         8 + doc_id % 7 AS h FROM documents),
             |d2 AS (SELECT doc_id, w, (w + 1) // 2 AS width,
             |                         (h + 1) // 2 AS height FROM d),
             |px AS (SELECT doc_id, w, width, height,
             |              unnest(range(width * height)) AS i FROM d2)
             |SELECT doc_id, width, height,
             |       CAST(sum((i + 1) *
             |            ((doc_id * 31 + (i // width) * 2 * w + (i % width) * 2) % 256))
             |         AS BIGINT) AS pix_hash
             |FROM px GROUP BY doc_id, width, height""".stripMargin)),

    // real audio decode: deterministic 16-bit PCM WAVs generated in-engine
    // from doc_id (Multimodal.audioFixture), decoded back with JDK
    // javax.sound.sampled; the oracle recomputes rate/length and the order-
    // sensitive sample hash from the closed-form sample function — PCM is
    // lossless, so any decoder defect breaks the hash
    "mm_audio_decode" -> Q(
      (s, d) => Multimodal.decodeAudio(
        Multimodal.audioFixture(Tables.load(s, d, "documents"), "doc_id"), "wav")
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("pcm_hash"), col("peak")),
      Some("""WITH d AS (SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS sample_rate,
             |                         64 + doc_id % 50 AS n FROM documents),
             |s AS (SELECT doc_id, sample_rate, n, unnest(range(n)) AS i FROM d),
             |v AS (SELECT doc_id, sample_rate, n, i,
             |             ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS smp FROM s)
             |SELECT doc_id, sample_rate, 1 AS channels, n AS n_samples,
             |       CAST(sum((i + 1) * smp) AS BIGINT) AS pcm_hash,
             |       CAST(max(abs(smp)) AS BIGINT) AS peak
             |FROM v GROUP BY doc_id, sample_rate, n""".stripMargin)),

    // real audio resample: decode → keep every 2nd sample → re-encode WAV
    // at rate/2 → decode AGAIN; the oracle mirrors the decimation
    // arithmetic (out(i) = in(2i)), proving the full audio
    // decode→transform→encode→decode loop is lossless
    "mm_audio_resample" -> Q(
      (s, d) => {
        val wavs = Multimodal.audioFixture(Tables.load(s, d, "documents"), "doc_id")
        Multimodal.decodeAudio(
          Multimodal.resampleAudio(wavs, "wav", factor = 2)
            .select(col("doc_id"), col("wav_resampled").as("wav")), "wav")
          .select(col("doc_id"), col("sample_rate"), col("n_samples"), col("pcm_hash"))
      },
      Some("""WITH d AS (SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS rate,
             |                         64 + doc_id % 50 AS n FROM documents),
             |d2 AS (SELECT doc_id, rate // 2 AS sample_rate,
             |                      (n + 1) // 2 AS n2 FROM d),
             |s AS (SELECT doc_id, sample_rate, n2, unnest(range(n2)) AS i FROM d2),
             |v AS (SELECT doc_id, sample_rate, n2, i,
             |             ((doc_id * 7919 + (i * 2) * 104729) % 65536) - 32768 AS smp FROM s)
             |SELECT doc_id, sample_rate, n2 AS n_samples,
             |       CAST(sum((i + 1) * smp) AS BIGINT) AS pcm_hash
             |FROM v GROUP BY doc_id, sample_rate, n2""".stripMargin)),

    // ---------------- curation ----------------

    // deterministic 25% sample: md5(doc_id) below the 0.25 hex threshold —
    // same rows on any engine / cluster size / run
    "curate_hash_sample" -> Q(
      (s, d) => Curate.hashSample(
        Tables.load(s, d, "documents"), col("doc_id"), 0.25)
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE md5(CAST(doc_id AS VARCHAR)) < '40000000'""".stripMargin)),

    // quantile quality gate: keep the top 30% by score — the exact
    // interpolated percentile threshold (same estimator as text_profile's
    // quantile_cont parity), at-threshold ties kept
    "curate_quality_gate" -> Q(
      (s, d) => Curate.qualityGate(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), col("n_chars").cast("double").as("score")),
        col("score"), keepFraction = 0.3),
      Some("""WITH scored AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS score
             |                FROM documents),
             |thr AS (SELECT quantile_cont(score, 0.7) AS t FROM scored)
             |SELECT doc_id, score FROM scored, thr WHERE score >= t""".stripMargin)),

    // bounded-memory approximate variant (the 100 TB form): threshold from
    // approx_percentile — deterministic for a fixed input but not
    // bit-portable across engines, so rows-only here; exactness of the
    // kept-fraction mechanics is OpsSpec's job
    "curate_quality_gate_approx" -> Q(
      (s, d) => Curate.qualityGateApprox(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), col("n_chars").cast("double").as("score")),
        col("score"), keepFraction = 0.3),
      None),

    // deterministic global shuffle: rank under md5 order, assigned by
    // range-partition + prefix sums — never a single-partition window
    "curate_shuffle_rank" -> Q(
      (s, d) => Curate.shuffleRank(
        Tables.load(s, d, "documents").select(col("doc_id"), col("lang")),
        col("doc_id"))
        .select("doc_id", "lang", "shuffle_pos"),
      Some("""SELECT doc_id, lang,
             |       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
             |         AS shuffle_pos
             |FROM documents""".stripMargin)),

    // weighted: per-row keep-probability n_chars/400 (clamped) — the
    // quality-weighted mixing primitive, same md5 space, per-row threshold
    "curate_weighted_sample" -> Q(
      (s, d) => Curate.weightedSample(
        Tables.load(s, d, "documents"), col("doc_id"),
        least(col("n_chars") / 400.0, lit(1.0)))
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE least(n_chars / 400.0, 1.0) >= 1.0
             |   OR md5(CAST(doc_id AS VARCHAR)) <
             |      printf('%08x', CAST(least(floor(least(n_chars / 400.0, 1.0) * 4294967296.0),
             |                                4294967295.0) AS BIGINT))""".stripMargin)),

    // stratified: keep 50% of English, 12.5% of everything else, one scan
    "curate_stratified_sample" -> Q(
      (s, d) => Curate.stratifiedSample(
        Tables.load(s, d, "documents"), col("lang"),
        Map("en" -> 0.5), defaultRate = 0.125, keyCol = col("doc_id"))
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE md5(CAST(doc_id AS VARCHAR)) <
             |  CASE WHEN lang = 'en' THEN '80000000' ELSE '20000000' END""".stripMargin)),

    // in-engine trained quality classifier: 2 GD epochs as aggregations,
    // rational fast-sigmoid link (no libm in the loop — bit-exact), exact
    // decimal margins/gradients; label = the src0-4 "seed" sources
    "curate_classifier_score" -> Q(
      (s, d) => {
        // FUSED train+score (r15's bit-equality-proven experiment, shipped
        // r16): the persisted (id,y,bucket,c) frame feeds the GD epochs AND
        // the scoring margin, so the corpus token stream is read once
        // (§1.2) instead of twice. The leaked persist is reclaimed by the
        // bench/Verify harnesses, like etl_incremental's.
        val docs = Tables.load(s, d, "documents")
        val db = Curate.classifierBucketCounts(docs, "doc_id",
          col("source").isin("src0", "src1", "src2", "src3", "src4"), "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val w = Curate.trainOnBucketCounts(db, epochs = 2, rate = 1.0)
        Curate.scoreFromBucketCounts(db, w, "doc_id")
      },
      Some(classifierScoreSql)),

    // the classifier made actionable: keep the top 25% of docs by trained
    // score (exact-percentile gate over the scored corpus)
    "curate_classifier_gate" -> Q(
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val db = Curate.classifierBucketCounts(docs, "doc_id",
          col("source").isin("src0", "src1", "src2", "src3", "src4"), "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val w = Curate.trainOnBucketCounts(db, epochs = 2, rate = 1.0)
        Curate.qualityGate(
          Curate.scoreFromBucketCounts(db, w, "doc_id"),
          col("score"), keepFraction = 0.25)
      },
      Some(s"""WITH scored AS ($classifierScoreSql),
              |thr AS (SELECT quantile_cont(score, 0.75) AS t FROM scored)
              |SELECT doc_id, score FROM scored, thr WHERE score >= t""".stripMargin)),

    // DSIR importance weights: every-5th doc is the "target distribution";
    // each doc scored by hashed-unigram log-likelihood ratio between the
    // target fit and the raw-corpus fit (add-1 smoothing, 4096 buckets).
    "curate_dsir_weights" -> Q(
      (s, d) => {
        val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
        Curate.importanceWeights(
          docs.withColumnRenamed("doc_id", "id"),
          docs.filter(col("doc_id") % 5 === 0), "id", "text")
          .withColumnRenamed("id", "doc_id")
      },
      Some {
        def bucket(h: String) = (0 until 3).map { i =>
          val w = 1 << (4 * (2 - i))
          s"(strpos('0123456789abcdef', substr(md5($h), ${i + 1}, 1)) - 1) * $w"
        }.mkString(" + ")
        s"""WITH ct0 AS (SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS tok
           |  FROM documents),
           |db AS (SELECT id, ${bucket("tok")} AS bucket, count(*) AS c
           |  FROM ct0 GROUP BY 1, 2),
           |rf AS (SELECT bucket, sum(c) AS cr FROM db GROUP BY bucket),
           |tt0 AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
           |  FROM documents WHERE doc_id % 5 = 0),
           |tf AS (SELECT ${bucket("tok")} AS bucket, count(*) AS ct FROM tt0 GROUP BY 1),
           |tot AS (SELECT (SELECT sum(cr) FROM rf) AS totr, (SELECT sum(ct) FROM tf) AS tott),
           |-- round to 12 decimals THEN cast to DECIMAL: ln() agrees across
           |-- libms to ~1 ulp (1e-15), far inside the 0.5e-12 round window,
           |-- and the exact-decimal product/sum is associative, so neither
           |-- partial-agg order nor libm build can flip the final rounding
           |lr AS (SELECT rf.bucket,
           |  CAST(round(
           |    ln((coalesce(tf.ct, 0) + 1.0) / (tott + 1.0 * 4096))
           |  - ln((rf.cr + 1.0) / (totr + 1.0 * 4096)), 12) AS DECIMAL(18,12)) AS lr
           |  FROM rf LEFT JOIN tf ON rf.bucket = tf.bucket CROSS JOIN tot)
           |-- CAST: DuckDB sum(INTEGER) yields HUGEINT, which the driver's
           |-- pandas path renders as float64 ("137.0" vs Spark's "137")
           |SELECT db.id AS doc_id, CAST(sum(db.c) AS BIGINT) AS n_tokens,
           |  CAST(round(sum(CAST(db.c AS DECIMAL(10,0)) * lr.lr), 4) AS DOUBLE) AS log_weight
           |FROM db JOIN lr ON db.bucket = lr.bucket GROUP BY db.id""".stripMargin
      }),

    // data mixing: rebalance the skewed lang distribution to a target mix
    // by downsampling only. T = min_g(n_g/f_g); the binding group (en at
    // sf0.001/0.01) keeps ~everything, the rest downsample to match. The
    // oracle recomputes the same rates with the same double arithmetic
    // (n/f, min, (f*t)/n, trunc to 2^32 hex) so thresholds agree bit-exactly.
    "curate_mix_rebalance" -> Q(
      (s, d) => Curate.rebalanceToMix(
        Tables.load(s, d, "documents"), col("lang"),
        Map("en" -> 0.5, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.05, "de" -> 0.05),
        keyCol = col("doc_id"))
        .select("doc_id", "lang"),
      Some("""WITH mix(g, f) AS (VALUES
             |  ('en', CAST(0.5 AS DOUBLE)), ('fr', CAST(0.2 AS DOUBLE)),
             |  ('es', CAST(0.2 AS DOUBLE)), ('zh', CAST(0.05 AS DOUBLE)),
             |  ('de', CAST(0.05 AS DOUBLE))),
             |cnt AS (SELECT lang AS g, count(*) AS n FROM documents GROUP BY 1),
             |-- LEFT JOIN: a mix group with no rows contributes n/f = 0 to the
             |-- min, emptying the result -- same as the Scala getOrElse(0)
             |tv AS (SELECT min(coalesce(n, 0) / f) AS t
             |       FROM mix LEFT JOIN cnt USING (g)),
             |rates AS (SELECT g,
             |  CASE WHEN coalesce(n, 0) = 0 THEN CAST(0.0 AS DOUBLE)
             |       ELSE least((f * (SELECT t FROM tv)) / n, CAST(1.0 AS DOUBLE))
             |  END AS r
             |  FROM mix LEFT JOIN cnt USING (g))
             |SELECT d.doc_id, d.lang FROM documents d
             |JOIN rates ON d.lang = rates.g
             |WHERE r >= 1.0 OR md5(CAST(d.doc_id AS VARCHAR)) <
             |  lpad(lower(to_hex(CAST(least(floor(r * 4294967296.0),
             |    CAST(4294967295.0 AS DOUBLE)) AS BIGINT))), 8, '0')""".stripMargin)),

    // temperature-flattened mixing (mC4/XLM-R α-sampling, α=0.3): target
    // shares q_g ∝ (n_g/N)^α derived from the corpus itself, downsample-only
    // solve. The oracle recomputes the identical arithmetic: pow rounded to
    // 12 decimals (libm-portable), normalizer as an EXACT decimal sum of
    // the rounded values, then the shared (q·t)/n + md5-threshold path.
    "curate_temperature_mix" -> Q(
      (s, d) => Curate.temperatureMix(
        Tables.load(s, d, "documents"), col("lang"), alpha = 0.3,
        keyCol = col("doc_id"))
        .select("doc_id", "lang"),
      Some("""WITH cnt AS (SELECT lang AS g, count(*) AS n FROM documents
             |             WHERE lang IS NOT NULL GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tt FROM cnt),
             |pw AS (SELECT g, n, round(pow(n / tt, 0.3), 12) AS pw
             |       FROM cnt CROSS JOIN tot),
             |zz AS (SELECT CAST(sum(CAST(pw AS DECIMAL(14,12))) AS DOUBLE) AS z FROM pw),
             |q AS (SELECT g, n, pw / z AS q FROM pw CROSS JOIN zz),
             |tv AS (SELECT min(n / q) AS t FROM q),
             |rates AS (SELECT g, least((q * t) / n, CAST(1.0 AS DOUBLE)) AS r
             |          FROM q CROSS JOIN tv)
             |SELECT d.doc_id, d.lang FROM documents d
             |JOIN rates ON d.lang = rates.g
             |WHERE r >= 1.0 OR md5(CAST(d.doc_id AS VARCHAR)) <
             |  lpad(lower(to_hex(CAST(least(floor(r * 4294967296.0),
             |    CAST(4294967295.0 AS DOUBLE)) AS BIGINT))), 8, '0')""".stripMargin)),

    // semantic cluster balancing — the unsupervised topic-rebalance
    // composition: k-means cells over the embeddings (1 Lloyd round,
    // 9-digit rounded centroids so membership is engine-identical), then
    // temperature sampling (α=0.5) over CELL ids. The 100 TB shape is the
    // sum of its parts: map-only assignment + G-row collect + one sampling
    // scan — the corpus is never shuffled.
    "curate_cluster_balance" -> Q(
      (s, d) => {
        val base = embBase(s, d)
        val cents = Similarity.kmeans(base, "vec_id", "v", k = 8, iters = 1)
          .select(col("centroid_id").as("vec_id"),
            transform(col("v"), x => round(x, 9)).as("v"))
        val assigned = Similarity.ivfAssign(base.select("vec_id", "v"), cents,
          "vec_id", "v")
          .withColumn("cell", col("centroid_id").cast("string"))
        Curate.temperatureMix(assigned, col("cell"), alpha = 0.5,
          keyCol = col("vec_id"))
          .select(col("vec_id"), col("centroid_id").cast("long").as("centroid_id"))
      },
      Some(embBaseSql +
        s""", seeds AS (SELECT vec_id AS centroid_id, v AS cv FROM base ORDER BY vec_id LIMIT 8),
           |kscored AS (
           |  SELECT b.vec_id, b.v, s.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "s.cv")} DESC, s.centroid_id) AS rn
           |  FROM base b CROSS JOIN seeds s),
           |kassigned AS (SELECT vec_id, v, centroid_id FROM kscored WHERE rn = 1),
           |kex AS (SELECT centroid_id, unnest(v) AS x, unnest(range(len(v))) AS i FROM kassigned),
           |kdims AS (SELECT centroid_id, i,
           |            round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 9) AS m
           |          FROM kex GROUP BY 1, 2),
           |cents AS (SELECT centroid_id, list(m ORDER BY i) AS centv FROM kdims GROUP BY centroid_id),
           |ranked AS (
           |  SELECT b.vec_id, c.centroid_id,
           |         row_number() OVER (PARTITION BY b.vec_id
           |                            ORDER BY ${cos("b.v", "c.centv")} DESC, c.centroid_id) AS rn
           |  FROM base b CROSS JOIN cents c),
           |cells AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
           |ccnt AS (SELECT centroid_id AS g, count(*) AS n FROM cells GROUP BY 1),
           |ctot AS (SELECT CAST(sum(n) AS DOUBLE) AS tt FROM ccnt),
           |cpw AS (SELECT g, n, round(pow(n / tt, 0.5), 12) AS pw FROM ccnt CROSS JOIN ctot),
           |czz AS (SELECT CAST(sum(CAST(pw AS DECIMAL(14,12))) AS DOUBLE) AS z FROM cpw),
           |cq AS (SELECT g, n, pw / z AS q FROM cpw CROSS JOIN czz),
           |ctv AS (SELECT min(n / q) AS t FROM cq),
           |crates AS (SELECT g, least((q * t) / n, CAST(1.0 AS DOUBLE)) AS r
           |           FROM cq CROSS JOIN ctv)
           |SELECT c.vec_id, CAST(c.centroid_id AS BIGINT) AS centroid_id
           |FROM cells c JOIN crates ON c.centroid_id = crates.g
           |WHERE r >= 1.0 OR md5(CAST(c.vec_id AS VARCHAR)) <
           |  lpad(lower(to_hex(CAST(least(floor(r * 4294967296.0),
           |    CAST(4294967295.0 AS DOUBLE)) AS BIGINT))), 8, '0')""".stripMargin)),

    // UniMax epoch-capped budget allocation: the planning table for a
    // 150k-token budget at <= 2 epochs per language. The oracle replays the
    // smallest-first water-filling fold as a linear recursive CTE with the
    // same operation order, so every double matches bit-for-bit.
    "curate_unimax" -> Q(
      (s, d) => Curate.unimaxAllocation(
        Tables.load(s, d, "documents"), col("lang"),
        // null text must contribute NULL (skipped by sum), not the -1 that
        // size(split(null)) returns under non-ANSI — mirroring the oracle's
        // len(string_split(NULL, ' ')) = NULL
        when(col("text").isNotNull, size(split(col("text"), " "))),
        budget = 150000.0, maxEpochs = 2.0),
      Some("""WITH RECURSIVE cnt AS (
             |  SELECT lang AS g, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
             |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
             |ord AS (SELECT g, n, row_number() OVER (ORDER BY n, g) AS rn,
             |               (SELECT count(*) FROM cnt) AS ng FROM cnt),
             |walk AS (
             |  SELECT CAST(0 AS BIGINT) AS rn, CAST(NULL AS VARCHAR) AS g,
             |         CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS alloc,
             |         CAST(150000.0 AS DOUBLE) AS rem
             |  UNION ALL
             |  SELECT o.rn, o.g, o.n,
             |         least(w.rem / (o.ng - w.rn), 2.0 * o.n),
             |         w.rem - least(w.rem / (o.ng - w.rn), 2.0 * o.n)
             |  FROM walk w JOIN ord o ON o.rn = w.rn + 1)
             |SELECT g, n AS n_tokens, alloc AS alloc_tokens, alloc / n AS epochs
             |FROM walk WHERE rn > 0""".stripMargin)),

    // decontamination gate: corpus docs sharing ≥5 distinct 3-gram shingles
    // with an "eval set" (docs with doc_id % 13 = 0 stand in for a held-out
    // benchmark — their corpus copies are guaranteed hits)
    "curate_contamination" -> Q(
      (s, d) => {
        val evalSet = Tables.load(s, d, "documents")
          .filter(col("doc_id") % 13 === 0)
          .select(col("doc_id").as("id"), col("text"))
        Curate.contamination(textCorpus(s, d), evalSet, "id", "text",
          n = 3, minOverlap = 5)
      },
      Some(textCorpusSql + "," + shinglesSql +
        """, ew AS (SELECT doc_id AS id, string_split(text, ' ') AS w
          |         FROM documents WHERE doc_id % 13 = 0),
          |esh AS (SELECT DISTINCT
          |          unnest(list_transform(range(len(w)-2), i -> array_to_string(w[i+1:i+3], ' '))) AS sh
          |        FROM ew)
          |SELECT c.id, count(*) AS n_overlap FROM sh0 c JOIN esh e ON c.sh = e.sh
          |GROUP BY c.id HAVING count(*) >= 5""".stripMargin)),

    // the 100 TB curation recipe end-to-end, from this round's pieces:
    // length gate → exact dedup (lowest id per hash) → minhash-LSH near-dup
    // with keep-LONGEST representatives → temperature (α=0.5) language mix
    // → token counts. Every stage is individually oracle-verified; this row
    // pins their composition.
    "curate_pipeline_near" -> Q(
      (s, d) => {
        val docs = docsPar(s, d).filter(col("n_chars") >= 100)
        val keepIds = docs.groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("doc_id"))
        val uniq = docs.join(keepIds.select("doc_id"), Seq("doc_id"), "left_semi")
        val pairs = Dedup.minhashEstimatePairs(
          uniq.select(col("doc_id").as("id"), col("text")), "id", "text",
          n = 3, numPerms = 16, bands = 4, threshold = 0.5)
          .select("d1", "d2")
        val deduped = Dedup.keepBestBy(uniq, "doc_id", pairs, length(col("text")))
        Curate.temperatureMix(deduped, col("lang"), alpha = 0.5, keyCol = col("doc_id"))
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id, text, lang FROM documents WHERE n_chars >= 100),
             |keep AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
             |uniq AS (SELECT b.* FROM base b JOIN keep USING (doc_id)),
             |words AS (SELECT doc_id AS id, string_split(text, ' ') AS w FROM uniq),
             |sh0 AS (SELECT DISTINCT id, unnest(list_transform(range(len(w)-2),
             |          i -> array_to_string(w[i+1:i+3], ' '))) AS sh FROM words),
             |perms AS (SELECT id, sh, unnest(range(16)) AS p FROM sh0),
             |mh AS (SELECT id, p, min(md5(concat(p, '|', sh))) AS mv
             |       FROM perms GROUP BY 1, 2),
             |bnd AS (SELECT id, p // 4 AS band,
             |               md5(string_agg(mv, ',' ORDER BY p)) AS bk
             |        FROM mh GROUP BY 1, 2),
             |cand AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bnd a JOIN bnd b
             |         ON a.band = b.band AND a.bk = b.bk AND a.id < b.id),
             |agree AS (SELECT c.d1, c.d2 FROM cand c
             |          JOIN mh x ON x.id = c.d1 JOIN mh y ON y.id = c.d2
             |            AND y.p = x.p AND y.mv = x.mv
             |          GROUP BY 1, 2 HAVING count(*) >= 8),
             |sym AS (SELECT d1 AS a, d2 AS b FROM agree
             |        UNION ALL SELECT d2 AS a, d1 AS b FROM agree),
             |reach AS (
             |  SELECT doc_id AS id, doc_id AS r FROM uniq
             |  UNION
             |  SELECT s.b AS id, reach.r AS r FROM reach JOIN sym s ON s.a = reach.id),
             |canon AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id),
             |win AS (SELECT id FROM (
             |  SELECT canon.id, row_number() OVER (PARTITION BY canon.canonical
             |           ORDER BY length(u.text) DESC, canon.id) AS rn
             |  FROM canon JOIN uniq u ON u.doc_id = canon.id) WHERE rn = 1),
             |ded AS (SELECT u.* FROM uniq u JOIN win ON win.id = u.doc_id),
             |cnt AS (SELECT lang AS g, count(*) AS n FROM ded
             |        WHERE lang IS NOT NULL GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tt FROM cnt),
             |pw AS (SELECT g, n, round(pow(n / tt, 0.5), 12) AS pw
             |       FROM cnt CROSS JOIN tot),
             |zz AS (SELECT CAST(sum(CAST(pw AS DECIMAL(14,12))) AS DOUBLE) AS z FROM pw),
             |q AS (SELECT g, n, pw / z AS q FROM pw CROSS JOIN zz),
             |tv AS (SELECT min(n / q) AS t FROM q),
             |rates AS (SELECT g, least((q * t) / n, CAST(1.0 AS DOUBLE)) AS r
             |          FROM q CROSS JOIN tv)
             |SELECT d.doc_id, d.lang,
             |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
             |FROM ded d JOIN rates ON d.lang = rates.g
             |WHERE r >= 1.0 OR md5(CAST(d.doc_id AS VARCHAR)) <
             |  lpad(lower(to_hex(CAST(least(floor(r * 4294967296.0),
             |    CAST(4294967295.0 AS DOUBLE)) AS BIGINT))), 8, '0')""".stripMargin)),

    // end-to-end curation pipeline — the composition story: language gate →
    // length gate → exact dedup (keep lowest doc_id per content hash) →
    // deterministic 50% sample → token counts. One DataFrame plan; Catalyst
    // fuses the gates into the scan and the dedup is one hash aggregation.
    "curate_pipeline" -> Q(
      (s, d) => {
        val en = Tables.load(s, d, "documents")
          .filter(TextOps.langId(col("text")) === "en")
          .filter(col("n_chars") >= 100)
        val keep = en.groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("doc_id"))
        val kept = en.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
        Curate.hashSample(kept, col("doc_id"), 0.5)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
      },
      Some(s"""WITH en AS (
              |  SELECT * FROM documents
              |  WHERE $langCase = 'en' AND n_chars >= 100),
              |keep AS (SELECT min(doc_id) AS doc_id FROM en GROUP BY md5(text))
              |SELECT doc_id,
              |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              |FROM en JOIN keep USING (doc_id)
              |WHERE md5(CAST(doc_id AS VARCHAR)) < '80000000'""".stripMargin)),

    // deterministic 90/5/5 train/val/test assignment from cumulative
    // md5 thresholds (0.9·2^32 = 0xe6666666, 0.95·2^32 = 0xf3333333)
    "curate_split_assign" -> Q(
      (s, d) => Curate.assignSplits(
        Tables.load(s, d, "documents"), col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split"),
      Some("""SELECT doc_id,
             |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6666666' THEN 'train'
             |       WHEN md5(CAST(doc_id AS VARCHAR)) < 'f3333333' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents""".stripMargin)),

    // per-source cap: longest 50 docs per source, doc_id tiebreak
    "curate_cap_per_source" -> Q(
      (s, d) => Curate.capPerGroup(
        Tables.load(s, d, "documents"),
        col("source"), col("n_chars").desc, col("doc_id"), n = 50)
        .select("doc_id", "source", "n_chars"),
      Some("""SELECT doc_id, source, n_chars FROM documents
             |QUALIFY row_number() OVER
             |  (PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 50""".stripMargin)),

    // same cap, skew-proof shape: bounded top-n-ids aggregate + semi-join
    // instead of a rank window — identical output (same order, same
    // tiebreak), no hot-group partition; the oracle is the SAME window SQL
    "curate_cap_bounded" -> Q(
      (s, d) => Curate.capPerGroupBounded(
        Tables.load(s, d, "documents"),
        col("source"), col("n_chars"), "doc_id", n = 50)
        .select("doc_id", "source", "n_chars"),
      Some("""SELECT doc_id, source, n_chars FROM documents
             |QUALIFY row_number() OVER
             |  (PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 50""".stripMargin)),

    // sliding-window chunking: 64-token windows advancing by 32 — the
    // long-doc → training-sequence step; map-only, one pass over the scan
    "curate_chunks" -> Q(
      (s, d) => Curate.chunkDocuments(
        Tables.load(s, d, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", chunkTokens = 64, stride = 32)
        .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"), col("n_tok")),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |d AS (SELECT doc_id, w, len(w) AS n FROM w),
             |c AS (SELECT doc_id, w, n,
             |             unnest(range(CAST(greatest(0, ceil((n - 64) / 32.0)) AS BIGINT) + 1)) AS j
             |      FROM d)
             |SELECT doc_id, j AS chunk_idx,
             |       md5(array_to_string(w[j*32+1 : j*32+64], ' ')) AS chunk_md5,
             |       least(64, n - j*32) AS n_tok
             |FROM c""".stripMargin)),

    // sequence packing: ~1000-token packs filled in doc_id order per source
    // length-bucket histogram (batch-by-length loader tuning): map-only
    // bucket assignment + one map-combinable agg; pad_waste = the padding
    // cost of batching each bucket to its boundary
    "curate_length_buckets" -> Q(
      (s, d) => Curate.lengthBucketStats(
        Tables.load(s, d, "documents"), col("n_chars"),
        Seq(256L, 512L, 1024L, 2048L, 4096L)),
      Some("""WITH b AS (SELECT n_chars,
             |  CASE WHEN n_chars <= 256 THEN 256 WHEN n_chars <= 512 THEN 512
             |       WHEN n_chars <= 1024 THEN 1024 WHEN n_chars <= 2048 THEN 2048
             |       WHEN n_chars <= 4096 THEN 4096 ELSE -1 END AS bucket
             |  FROM documents)
             |-- CASTs: DuckDB sum(BIGINT) yields HUGEINT -> pandas float64
             |SELECT bucket, count(*) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS total_len,
             |  min(n_chars) AS min_len, max(n_chars) AS max_len,
             |  CAST(sum(CASE WHEN bucket >= 0 THEN bucket - n_chars ELSE 0 END)
             |       AS BIGINT) AS pad_waste
             |FROM b GROUP BY bucket""".stripMargin)),

    "curate_pack_sequences" -> Q(
      (s, d) => Curate.packSequences(
        Tables.load(s, d, "documents")
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long")),
        col("source"), col("doc_id"), col("n_tok"), budgetTokens = 1000)
        .select("doc_id", "source", "n_tok", "pack_id"),
      Some("""SELECT doc_id, source,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |  CAST(floor(
             |    (sum(len(string_split(text, ' '))) OVER
             |       (PARTITION BY source ORDER BY doc_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |     - len(string_split(text, ' '))) / 1000.0) AS BIGINT) AS pack_id
             |FROM documents""".stripMargin)),

    // the composed loader shape: length-bucket first (padding bound), then
    // pack WITHIN each bucket — packSequences' shard column is the bucket,
    // so batches are both length-homogeneous and budget-bounded
    "curate_bucketed_packing" -> Q(
      (s, d) => Curate.packSequences(
        Curate.assignLengthBuckets(
          Tables.load(s, d, "documents")
            .withColumn("n_tok", size(split(col("text"), " ")).cast("long")),
          col("n_tok"), Seq(32L, 64L, 128L)),
        col("bucket"), col("doc_id"), col("n_tok"), budgetTokens = 1000)
        .select("doc_id", "bucket", "n_tok", "pack_id"),
      Some("""WITH b AS (SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |  CASE WHEN len(string_split(text, ' ')) <= 32 THEN 32
             |       WHEN len(string_split(text, ' ')) <= 64 THEN 64
             |       WHEN len(string_split(text, ' ')) <= 128 THEN 128
             |       ELSE -1 END AS bucket
             |  FROM documents)
             |SELECT doc_id, bucket, n_tok,
             |  CAST(floor(
             |    (sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |     - n_tok) / 1000.0) AS BIGINT) AS pack_id
             |FROM b""".stripMargin)),

    // packing emitted end-to-end: each pack's documents concatenated in
    // doc order into one training sequence (md5'd for the compare); one
    // groupBy per (source, pack) — packs are the parallelism unit
    "curate_pack_emit" -> Q(
      (s, d) => Curate.packSequences(
        Tables.load(s, d, "documents")
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long")),
        col("source"), col("doc_id"), col("n_tok"), budgetTokens = 1000)
        .groupBy(col("source"), col("pack_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("pack_tokens"),
          md5(concat_ws(" ",
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              s => s.getField("text")))).as("seq_md5")),
      Some("""WITH packed AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(floor(
             |      (sum(len(string_split(text, ' '))) OVER
             |         (PARTITION BY source ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |       - len(string_split(text, ' '))) / 1000.0) AS BIGINT) AS pack_id
             |  FROM documents)
             |SELECT source, pack_id, count(*) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
             |       md5(string_agg(text, ' ' ORDER BY doc_id)) AS seq_md5
             |FROM packed GROUP BY source, pack_id""".stripMargin))
  )
}
