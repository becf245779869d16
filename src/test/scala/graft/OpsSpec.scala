package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Curate, Dedup, Multimodal, Similarity, TextOps}

class OpsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava,
      StructType.fromDDL("id bigint, text string"))

  test("minhash LSH surfaces exact and near duplicates, not unrelated docs") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again today",
      2L -> "the quick brown fox jumps over the lazy dog again and again today",      // exact dup of 1
      3L -> "the quick brown fox jumps over the lazy dog again and again yesterday", // near dup
      4L -> "completely different content about spark query engines and columnar io")
    val pairs = Dedup.lshCandidatePairs(df, "id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("duplicated spans: shared 8-token runs are counted, short docs get zero windows") {
    val shared = "one two three four five six seven eight" // exactly 8 tokens
    val df = docs(
      1L -> s"prefix $shared tail words here",
      2L -> s"$shared different ending entirely",
      3L -> "a b c",                          // < 8 tokens: 0 windows
      4L -> "x x x x x x x x x x x x x x x")  // self-repetition: every window equals every other
    val out = Dedup.duplicatedSpans(df, "id", "text", k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 12 tokens -> 5 windows; the one starting at "one" is shared with doc2
    assert(out(1L) == (5L, 1L))
    // doc2: 11 tokens -> 4 windows; the first is the shared run
    assert(out(2L) == (4L, 1L))
    assert(out(3L) == (0L, 0L))
    // doc4: 15 identical tokens -> 8 windows, all equal to each other
    assert(out(4L) == (8L, 8L))
  }

  test("span removal cuts all-but-first occurrence, including self-repeats") {
    val df = docs(
      1L -> "p q one two three a b",  // first occurrence (pos 3): kept
      2L -> "one two three x y",      // copy: cut
      3L -> "r r r r")                // self-repeat: windows 1,2 share a hash
    val out = Dedup.removeDuplicatedSpans(df, "id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "p q one two three a b")
    assert(out(2L) == "x y")
    // window at pos 2 is flagged -> tokens 2..4 cut, the lone leading r stays
    assert(out(3L) == "r")
    val all = Dedup.removeDuplicatedSpans(df, "id", "text", k = 3, keepFirst = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "p q a b")
    assert(all(2L) == "x y")
    assert(all(3L) == "")
  }

  test("simhash: identical docs equal, unrelated docs differ") {
    val df = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "totally unrelated words about something else entirely different here")
    val m = Dedup.simhash(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("jaccard pairs: exact dup scores 1.0") {
    val df = docs(
      1L -> "one two three four five six seven eight nine ten eleven twelve",
      2L -> "one two three four five six seven eight nine ten eleven twelve",
      3L -> "unrelated garbage text with no overlap at all whatsoever in shingles")
    val rows = Dedup.jaccardPairs(df, "id", "text").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 2L)
    assert(rows(0).getDouble(3) == 1.0)
  }

  test("bounded cap returns exactly the window cap's rows on skewed groups") {
    // skewed: group 0 holds ~70% of rows — the shape the bounded form exists for
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("g", when(col("id") < 700, 0).otherwise(col("id") % 7 + 1))
      .withColumn("score", (col("id") * 37 % 101).cast("double"))
    val window = Curate.capPerGroup(df, col("g"), col("score").desc, col("id"), n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val bounded = Curate.capPerGroupBounded(df, col("g"), col("score"), "id", n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bounded == window)
  }

  test("weighted sample: weight 1 keeps (nearly) all, 0 keeps none, deterministic") {
    val df = spark.range(0, 2000).toDF("id")
    def kept(w: Double): Long =
      Curate.weightedSample(df, col("id"), lit(w)).count()
    assert(kept(0.0) == 0)
    assert(kept(1.0) >= 1999) // only an exact 'ffffffff' md5 prefix is excluded
    val half = kept(0.5)
    assert(half > 800 && half < 1200)
    // same weight, same rows — and a per-row weight mixes independently
    assert(Curate.weightedSample(df, col("id"), lit(0.5)).collect().toSeq ==
      Curate.weightedSample(df, col("id"), lit(0.5)).collect().toSeq)
    val mixed = Curate.weightedSample(df, col("id"),
      when(col("id") < 1000, 1.0).otherwise(0.0)).collect().map(_.getLong(0))
    assert(mixed.forall(_ < 1000) && mixed.length >= 999)
  }

  test("chunking: sliding windows cover every token, short docs get one chunk") {
    val df = docs(
      1L -> (1 to 10).map(i => s"w$i").mkString(" "), // 10 words
      2L -> "a b c") // shorter than one chunk
    val chunks = Curate.chunkDocuments(df, "id", "text", chunkTokens = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // doc 1: starts 0,2,4,6 → last window (w7..w10) reaches the end
    assert(chunks((1L, 0L)) == ("w1 w2 w3 w4", 4L))
    assert(chunks((1L, 1L)) == ("w3 w4 w5 w6", 4L))
    assert(chunks((1L, 3L)) == ("w7 w8 w9 w10", 4L))
    assert(!chunks.contains((1L, 4L)))
    // doc 2: one short chunk
    assert(chunks((2L, 0L)) == ("a b c", 3L))
    assert(!chunks.contains((2L, 1L)))
    // disjoint mode: stride == chunkTokens partitions the tokens
    val disjoint = Curate.chunkDocuments(df.filter(col("id") === 1), "id", "text", 4, 4)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(disjoint == Map(0L -> "w1 w2 w3 w4", 1L -> "w5 w6 w7 w8", 2L -> "w9 w10"))
  }

  test("jaccardForPairs scores exactly, including 0 for shingle-disjoint pairs") {
    val df = docs(
      1L -> "one two three four five six seven eight nine ten eleven twelve",
      2L -> "one two three four five six seven eight nine ten eleven twelve",
      3L -> "unrelated garbage text with no overlap at all whatsoever in shingles")
    val pairs = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, 2L), org.apache.spark.sql.Row(1L, 3L)),
      org.apache.spark.sql.types.StructType.fromDDL("d1 bigint, d2 bigint"))
    val m = Dedup.jaccardForPairs(df, pairs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(m((1L, 2L)) == (10L, 1.0)) // 12 words → 10 identical 3-gram shingles
    assert(m((1L, 3L)) == (0L, 0.0)) // disjoint pair still reported, at 0

    // a pair member shorter than n tokens has NO shingles — the pair must
    // still come back (at 0), not be silently dropped by the size join
    val short = docs(1L -> "one two three four five six", 2L -> "one two")
    val sp = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, 2L)),
      org.apache.spark.sql.types.StructType.fromDDL("d1 bigint, d2 bigint"))
    val sm = Dedup.jaccardForPairs(short, sp, "id", "text").collect()
    assert(sm.length == 1 && sm(0).getLong(2) == 0L && sm(0).getDouble(3) == 0.0)
  }

  test("minhash estimate: exact dup scores 1.0, disjoint docs produce no pair") {
    val df = docs(
      1L -> "one two three four five six seven eight nine ten eleven twelve",
      2L -> "one two three four five six seven eight nine ten eleven twelve",
      3L -> "unrelated garbage text with no overlap at all whatsoever in shingles")
    val rows = Dedup.minhashEstimatePairs(df, "id", "text").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 2L)
    // identical shingle sets agree in every minhash slot
    assert(rows(0).getDouble(2) == 1.0)
  }

  test("canonical ids collapse dup groups to the minimum, singletons keep their id") {
    val df = docs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val pairs = spark.createDataFrame(
      Seq(Row(1L, 3L), Row(1L, 4L), Row(3L, 4L)).asJava, // clique {1,3,4}
      StructType.fromDDL("d1 bigint, d2 bigint"))
    val m = Dedup.canonicalIds(df, "id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("canonical ids converge on chain topologies (a-b, b-c, c-d all map to a)") {
    val df = docs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e")
    val pairs = spark.createDataFrame(
      Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 4L)).asJava, // chain, NOT a clique
      StructType.fromDDL("d1 bigint, d2 bigint"))
    val m = Dedup.canonicalIds(df, "id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
  }

  test("canonical ids match a union-find oracle on seeded random graphs") {
    // the pointer-jumped min-propagation must agree with a sequential
    // union-find on ARBITRARY topology (random graphs mix cliques, chains,
    // stars, and singletons — the shapes real pair generators emit at
    // once). Seeded java.util.Random → failures replay deterministically.
    val rnd = new java.util.Random(4711L)
    (1 to 3).foreach { trial =>
      val n = 120
      val nodes = (0L until n.toLong)
      val edges = (1 to 150).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // driver-side union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = nodes.map(i => i -> {
        // component minimum = the min node reachable via union-find root
        var r = find(i.toInt)
        r.toLong
      }).toMap
      // union-by-min keeps the root as the component min by construction
      val df = spark.createDataFrame(
        nodes.map(i => Row(i)).asJava, StructType.fromDDL("id bigint"))
      val pairs = spark.createDataFrame(
        edges.map { case (a, b) => Row(a, b) }.asJava,
        StructType.fromDDL("d1 bigint, d2 bigint"))
      val got = Dedup.canonicalIds(df, "id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect,
        s"trial $trial: diverged at ${got.toSet.diff(expect.toSet).take(5)}")
    }
  }

  test("canonical ids pointer-jump: a 60-node chain converges in <= 8 rounds") {
    // One-hop-per-round propagation would need 59 rounds; pointer jumping
    // doubles covered distance each round, so 8 rounds reach 2^8 = 256.
    val n = 60
    val df = docs((1 to n).map(i => i.toLong -> s"doc$i"): _*)
    val pairs = spark.createDataFrame(
      (1 until n).map(i => Row(i.toLong, (i + 1).toLong)).asJava,
      StructType.fromDDL("d1 bigint, d2 bigint"))
    val m = Dedup.canonicalIds(df, "id", pairs, maxRounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == (1 to n).map(i => i.toLong -> 1L).toMap)
  }

  test("keepCanonical keeps the min-id row of each cluster with all columns, singletons intact") {
    val df = docs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val pairs = spark.createDataFrame(
      Seq(Row(2L, 3L), Row(3L, 4L)).asJava, // transitive chain {2,3,4}
      StructType.fromDDL("d1 bigint, d2 bigint"))
    val out = Dedup.keepCanonical(df, "id", pairs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b"))
  }

  test("dedupCorpus and dedupCorpusLsh collapse planted near-dups end-to-end") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today", // exact copy of 1
      3L -> "the quick brown fox jumps over the lazy dog tomorrow maybe", // near-dup of 1
      4L -> "completely different words about distributed query engines here")
    val exact = Dedup.dedupCorpus(df, "id", "text", n = 3, threshold = 0.5)
      .collect().map(_.getLong(0)).sorted
    assert(exact.sameElements(Array(1L, 4L)))
    // 1↔2 agree in every minhash slot, so they always share every band —
    // the LSH path must surface the exact copy deterministically; the
    // near-dup 3 may or may not be caught (recall is the S-curve), so only
    // assert the guaranteed collapses
    val lsh = Dedup.dedupCorpusLsh(df, "id", "text",
      n = 3, numPerms = 16, bands = 4, threshold = 0.5)
      .collect().map(_.getLong(0)).sorted
    assert(lsh.contains(1L) && !lsh.contains(2L) && lsh.contains(4L))
  }

  test("brute-force topk finds the planted nearest neighbor first") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.99, 0.1, 0.0)), // closest to 0
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0)))
    val df = spark.createDataFrame(
      vecs.map(v => Row(v._1, v._2)).asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    val top = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 0), "vec_id", "v", 2)
      .orderBy("rank").collect()
    assert(top(0).getLong(2) == 1L)
  }

  test("semantic dedup prunes in-cell near-dups, keeps the distinct directions") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(1.0, 0.0001)),   // near-dup of 1
      (3L, Seq(0.0, 1.0)),
      (4L, Seq(0.0001, 1.0)),   // near-dup of 3
      (5L, Seq(0.7, 0.7))       // cos ~.707 to both axes: survives
    ).toDF("vec_id", "v")
    val kept = Dedup.semanticDedup(df, "vec_id", "v", k = 2, iters = 1,
      threshold = 0.95, seedByHash = false)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("hyperplane LSH finds scaled near-duplicates without a blocking column") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 40L).map(i => i -> Seq.fill(16)(rnd.nextGaussian()))
    // planted near-dups: scaled copies (same direction → cosine 1.0)
    val dups = base.filter(_._1 % 5 == 0).map { case (i, v) => (i + 1000L, v.map(_ * 1.01)) }
    val df = spark.createDataFrame(
      (base ++ dups).map { case (i, v) => Row(i, v) }.asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    val pairs = Dedup.embeddingLshPairs(df, "vec_id", "v", dims = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair shares identical signatures → must be found
    val planted = base.filter(_._1 % 5 == 0).map { case (i, _) => (i, i + 1000L) }.toSet
    assert(planted.subsetOf(pairs), s"missed: ${planted -- pairs}")
  }

  test("contaminated spans are cut, not the whole document") {
    val corpus = docs(
      1L -> "a b c d e f g h i j", // embeds the eval passage at position 3
      2L -> "totally unrelated words that never match anything at all here",
      3L -> "c d e f g h i j")     // verbatim eval doc → strips to empty
    val eval = docs(100L -> "c d e f g h i j")
    val out = Dedup.removeContaminatedSpans(corpus, eval, "id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "a b",
      2L -> "totally unrelated words that never match anything at all here",
      3L -> ""))
  }

  test("language id picks the profile language") {
    val df = docs(
      1L -> "the cat is in the house and the dog is of the yard",
      2L -> "der hund ist das tier und die katze ist ein tier",
      3L -> "xyzzy plugh qwerty")
    val m = df.select(col("id"), TextOps.langId(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("script profile counts code points per script with deterministic ties") {
    val df = docs(
      1L -> "abc где",        // latin 3 vs cyrillic 3: tie → class order
      2L -> "1234 --- !!!",   // Script=Common only → unknown
      3L -> "中文 かな",       // han 2 vs hiragana 2: han listed first
      4L -> "Привет мир",
      5L -> null)
    val out = TextOps.scriptProfile(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(out == Map(1L -> "latin", 2L -> "unknown", 3L -> "han",
      4L -> "cyrillic", 5L -> "unknown"))
    val counts = TextOps.scriptProfile(df, "id", "text")
      .filter(col("id") === 3L).select("n_han", "n_hiragana").collect()(0)
    assert((counts.getInt(0), counts.getInt(1)) == ((2, 2)))
  }

  test("kmeans separates obvious clusters and feeds ivfAssign") {
    // cluster A: even ids near (1,0); cluster B: odd ids near (0,1) — the
    // two lowest-id seeds (0, 1) start one in each cluster
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (4L, Seq(1.1, -0.1)),
      (1L, Seq(0.0, 1.0)), (3L, Seq(0.1, 0.9)), (5L, Seq(-0.1, 1.1)))
    val df = spark.createDataFrame(
      vecs.map(v => Row(v._1, v._2)).asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    val cents = Similarity.kmeans(df, "vec_id", "v", k = 2, iters = 3)
    assert(cents.count() == 2)
    // convergence-stopped variant: well-separated clusters settle in
    // round 2 (round 1 moves seeds to means, round 2 confirms no shift)
    // and the result equals the fixed-iteration run
    val (cc, rounds) = Similarity.kmeansConverged(df, "vec_id", "v",
      k = 2, maxIters = 10, tol = 1e-12)
    assert(rounds < 10)
    assert(cc.collect().map(_.toString).sorted.toSeq ==
      Similarity.kmeans(df, "vec_id", "v", k = 2, iters = rounds)
        .collect().map(_.toString).sorted.toSeq)
    val m = Similarity.ivfAssign(df,
        cents.select(col("centroid_id").as("vec_id"), col("v")), "vec_id", "v")
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(m(0L), m(2L), m(4L)).size == 1) // cluster A together
    assert(Set(m(1L), m(3L), m(5L)).size == 1) // cluster B together
    assert(m(0L) != m(1L))                     // and apart
  }

  test("multimodal decode: batched features are deterministic and correct") {
    val df = docs(1L -> "hello", 2L -> "world!!")
    val media = Multimodal.attachPayload(df, "id", "text")
    val feats = Multimodal.decodeFeatures(media, "payload")
      .select("id", "n_bytes", "checksum", "features").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getLong(1) == 5L)
    assert(feats(2L).getLong(1) == 7L)
    // checksum matches a direct computation
    val expected = "hello".getBytes("UTF-8").foldLeft(0L)((c, b) => (c * 31 + (b & 0xff)) & 0xffffffffL)
    assert(feats(1L).getLong(2) == expected)
    // histogram features sum to byte count
    assert(feats(2L).getSeq[Float](3).sum == 7f)
  }

  test("resize stub downsamples the payload and rewrites the size metadata") {
    val df = docs(1L -> "abcdefghij") // 10 bytes, factor 4 → bytes 0,4,8
    val media = Multimodal.attachPayload(df, "id", "text")
    val r = Multimodal.resize(media, "payload", factor = 4)
      .select("n_resized", "payload_resized").collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getAs[Array[Byte]](1).toSeq == Seq('a'.toByte, 'e'.toByte, 'i'.toByte))
  }

  test("imageio: PNG fixture decodes to its generating pixel function; resize samples the grid") {
    val df = docs(3L -> "x", 10L -> "y").select(col("id").as("doc_id"))
    val imgs = Multimodal.imageFixture(df, "doc_id")
    val dec = Multimodal.decodeImages(imgs, "png")
      .select("doc_id", "width", "height", "channels", "pix_hash").collect()
      .map(r => r.getLong(0) -> r).toMap
    def expected(id: Long): (Long, Long, Long) = {
      val w = 8 + id % 13; val h = 8 + id % 7
      val hash = (0L until w * h).map(i => (i + 1) * ((id * 31 + i) % 256)).sum
      (w, h, hash)
    }
    Seq(3L, 10L).foreach { id =>
      val (w, h, hash) = expected(id)
      val r = dec(id)
      assert((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)) == (w, h, 1, hash))
    }
    // resize ÷2 keeps exactly the even-coordinate samples, re-encoded losslessly
    val rs = Multimodal.decodeImages(
      Multimodal.resizeImages(imgs, "png", factor = 2)
        .select(col("doc_id"), col("png_resized").as("png")), "png")
      .select("doc_id", "width", "height", "pix_hash").collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(3L, 10L).foreach { id =>
      val w = 8 + id % 13; val h = 8 + id % 7
      val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
      val hash = (0L until w2 * h2).map(i =>
        (i + 1) * ((id * 31 + (i / w2) * 2 * w + (i % w2) * 2) % 256)).sum
      val r = rs(id)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (w2, h2, hash))
    }
    // unreadable bytes → null features, not a batch failure
    val junk = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, Array[Byte](1, 2, 3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("png", org.apache.spark.sql.types.BinaryType))))
    val jr = Multimodal.decodeImages(junk, "png").select("width", "pix_hash").collect()(0)
    assert(jr.isNullAt(0) && jr.isNullAt(1))
  }

  test("javax.sound: WAV fixture decodes to its generating sample function") {
    val df = docs(3L -> "x", 11L -> "y").select(col("id").as("doc_id"))
    val dec = Multimodal.decodeAudio(Multimodal.audioFixture(df, "doc_id"), "wav")
      .select("doc_id", "sample_rate", "channels", "n_samples", "pcm_hash", "peak")
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(3L, 11L).foreach { id =>
      val n = 64 + id % 50
      val samples = (0L until n).map(i => ((id * 7919 + i * 104729) % 65536) - 32768)
      val r = dec(id)
      assert(r.getLong(1) == 8000 + (id % 3) * 4000)
      assert(r.getInt(2) == 1 && r.getLong(3) == n)
      assert(r.getLong(4) == samples.zipWithIndex.map { case (s, i) => (i + 1) * s }.sum)
      assert(r.getLong(5) == samples.map(math.abs).max)
    }
    // resample ÷2 keeps exactly the even-index samples at half the rate
    val fixture = Multimodal.audioFixture(df, "doc_id")
    val rs = Multimodal.decodeAudio(
      Multimodal.resampleAudio(fixture, "wav", factor = 2)
        .select(col("doc_id"), col("wav_resampled").as("wav")), "wav")
      .select("doc_id", "sample_rate", "n_samples", "pcm_hash")
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(3L, 11L).foreach { id =>
      val n = 64 + id % 50
      val n2 = (n + 1) / 2
      val hash = (0L until n2).map(i =>
        (i + 1) * (((id * 7919 + (i * 2) * 104729) % 65536) - 32768)).sum
      val r = rs(id)
      assert(r.getLong(1) == (8000 + (id % 3) * 4000) / 2)
      assert(r.getLong(2) == n2 && r.getLong(3) == hash)
    }
    // unreadable bytes → null features, not a batch failure
    val junk = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, Array[Byte](9, 9, 9))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("wav", org.apache.spark.sql.types.BinaryType))))
    val jr = Multimodal.decodeAudio(junk, "wav").select("sample_rate", "pcm_hash").collect()(0)
    assert(jr.isNullAt(0) && jr.isNullAt(1))
    assert(Multimodal.resampleAudio(junk, "wav", 2)
      .select("wav_resampled").collect()(0).isNullAt(0))
  }

  test("frame sampling emits every k-th byte") {
    val df = docs(1L -> "abcdefghij")
    val media = Multimodal.attachPayload(df, "id", "text")
    val frames = Multimodal.sampleFrames(media, "payload", every = 3)
      .select("frame_idx", "frame_byte").orderBy("frame_idx").collect()
    assert(frames.length == 4) // bytes 0,3,6,9
    assert(frames.map(_.getAs[Array[Byte]](1)(0)).toSeq ==
      Seq('a'.toByte, 'd'.toByte, 'g'.toByte, 'j'.toByte))
  }

  test("kmeans: multi-iteration converges, shrinks empty cells, and is partition-invariant") {
    import org.apache.spark.sql.types._
    def emb(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))

    // two clean angular clusters, one seed in each (ids 1,2 are the seeds)
    val two = emb(
      1L -> Seq(1.0, 0.0), 3L -> Seq(0.9, 0.1), 5L -> Seq(0.8, 0.2),
      2L -> Seq(0.0, 1.0), 4L -> Seq(0.1, 0.9), 6L -> Seq(0.2, 0.8))
    val cents = Similarity.kmeans(two, "vec_id", "v", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cents.keySet == Set(1L, 2L))
    def close(a: Seq[Double], b: Seq[Double]) =
      a.lazyZip(b).forall((x, y) => math.abs(x - y) < 1e-12)
    assert(close(cents(1L), Seq(0.9, 0.1)))       // mean of cluster A
    assert(close(cents(2L), Seq(0.1, 0.9)))       // mean of cluster B

    // identical directions: round-1 cosine ties all break to centroid 1, so
    // centroid 2's cell empties and k shrinks instead of NaN-ing — and the
    // later iterations keep running on the shrunken set
    val collinear = emb(1L -> Seq(1.0, 0.0), 2L -> Seq(2.0, 0.0), 3L -> Seq(3.0, 0.0))
    val shrunk = Similarity.kmeans(collinear, "vec_id", "v", k = 2, iters = 2).collect()
    assert(shrunk.map(_.getLong(0)).toSeq == Seq(1L))
    assert(close(shrunk(0).getSeq[Double](1), Seq(2.0, 0.0)))

    // partitioning must not change a single bit (exact decimal means)
    val base = emb((1L to 40L).map(i =>
      i -> Seq(math.sin(i.toDouble), math.cos(i.toDouble), i / 40.0)): _*)
    def run(parts: Int) = Similarity.kmeans(base.repartition(parts), "vec_id", "v",
      k = 4, iters = 3, seedByHash = true)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("ivf nprobe=2 recovers a neighbor hiding in the query's second cell") {
    import org.apache.spark.sql.types._
    val rows = Seq(
      (100L, Seq(1.0, 0.0)),   // centroid A
      (101L, Seq(0.0, 1.0)),   // centroid B
      (1L, Seq(0.95, 0.31)),   // corpus, cell A
      (2L, Seq(0.70, 0.7141)), // corpus, cell B — the query's true nearest
      (9L, Seq(0.80, 0.60)))   // query → cell A, but 2 is closer than 1
    val df = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    val cents = df.filter(col("vec_id") >= 100L)
    val corpus = df.filter(col("vec_id") < 9L)
    val q = df.filter(col("vec_id") === 9L)
    def top1(nprobe: Int) = Similarity
      .ivfTopK(corpus, q, cents, "vec_id", "v", k = 1, nprobe = nprobe)
      .collect().map(_.getLong(2)).toSeq
    assert(top1(1) == Seq(1L)) // only its own cell → misses the true nearest
    assert(top1(2) == Seq(2L)) // probing the 2nd cell finds it

    // persisted index: identical answers, and append indexes new vectors
    // against the FROZEN stored centroids (O(batch), no rebuild)
    val path = java.nio.file.Files.createTempDirectory("ivf-ix").toString
    graft.ops.SimilarityIndex.buildIvfFromCentroids(corpus, cents, "vec_id", "v", path)
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    def idxTop1(nprobe: Int) =
      idx.topK(q, k = 1, nprobe = nprobe).collect().map(_.getLong(2)).toSeq
    assert(idxTop1(1) == Seq(1L) && idxTop1(2) == Seq(2L),
      "the persisted index must answer exactly like the direct path")
    val extra = spark.createDataFrame(
      Seq(Row(3L, Seq(0.81, 0.59))).asJava, // near the query, lands in cell A
      StructType.fromDDL("vec_id bigint, v array<double>"))
    idx.append(extra)
    assert(idxTop1(1) == Seq(3L), "appended vector must be probed")

    // targeted delete: only the cells holding the ids are rewritten; the
    // deleted vector stops being a neighbor, the rest still answer
    def listDir[A](dir: java.nio.file.Path)(f: Iterator[java.nio.file.Path] => A): A = {
      val ls = java.nio.file.Files.list(dir)
      try f(ls.iterator().asScala) finally ls.close()
    }
    val cellBDir = java.nio.file.Paths.get(path, "assigned")
    val untouched = listDir(cellBDir)(_
      .filter(p => p.getFileName.toString.startsWith("centroid_id="))
      .map(p => p.getFileName.toString -> listDir(p)(_
        .map(f => f.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap))
      .toMap)
    val delIds = spark.createDataFrame(Seq(Row(3L)).asJava,
      StructType.fromDDL("vec_id bigint"))
    assert(idx.delete(delIds) == 1L)
    assert(idxTop1(1) == Seq(1L), "deleted vector must not be retrieved")
    assert(idxTop1(2) == Seq(2L))
    // vec 3 lived in cell A (centroid 100); cell B (101) must be untouched
    val afterB = listDir(
        java.nio.file.Paths.get(path, "assigned", "centroid_id=101"))(_
      .map(f => f.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(f))
      .toMap)
    assert(afterB == untouched("centroid_id=101"),
      "cells not holding a deleted id must keep their files byte-identical")
    assert(idx.delete(delIds) == 0L, "delete is idempotent")
    // deleting every row of a cell removes its partition directory
    val delCellB = spark.createDataFrame(Seq(Row(2L)).asJava,
      StructType.fromDDL("vec_id bigint"))
    assert(idx.delete(delCellB) == 1L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "assigned", "centroid_id=101")),
      "a fully-deleted cell's partition dir must be removed")
    assert(idxTop1(2) == Seq(1L))
  }

  test("index cell compaction folds fragmented cells, leaves the rest byte-identical") {
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(Seq(
      Row(100L, Seq(1.0, 0.0)), Row(101L, Seq(0.0, 1.0)), // centroids
      Row(1L, Seq(0.9, 0.1)), Row(2L, Seq(0.1, 0.9))).asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    val path = java.nio.file.Files.createTempDirectory("ivf-cc").toString
    graft.ops.SimilarityIndex.buildIvfFromCentroids(
      df.filter(col("vec_id") < 100L), df.filter(col("vec_id") >= 100L),
      "vec_id", "v", path)
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    // six appends into cell A only → A fragments, B untouched
    (0 until 6).foreach { i =>
      idx.append(spark.createDataFrame(
        Seq(Row(10L + i, Seq(0.95, 0.05 + i * 0.001))).asJava,
        StructType.fromDDL("vec_id bigint, v array<double>")))
    }
    def files(cell: String) = {
      val ls = java.nio.file.Files.list(
        java.nio.file.Paths.get(path, "assigned", cell))
      try ls.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap
      finally ls.close()
    }
    assert(files("centroid_id=100").size > 4)
    val bBefore = files("centroid_id=101")
    val q = df.filter(col("vec_id") === 1L)
    val before = idx.topK(q, k = 5).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(idx.compactCells(maxFiles = 4) == 1)
    assert(files("centroid_id=100").size == 1, "fragmented cell folds to one file")
    assert(files("centroid_id=101") == bBefore, "quiet cell keeps its files")
    val after = idx.topK(q, k = 5).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(after == before, "compaction changes no answer")
    assert(idx.compactCells(maxFiles = 4) == 0, "nothing left to fold")
  }

  test("gated vector ingest drops landed near-dups and in-batch pairs; replay no-ops") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    def vecs(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava, sch)
    val cents = vecs(100L -> Seq(1.0, 0.0), 101L -> Seq(0.0, 1.0))
    val landed = vecs(1L -> Seq(0.95, 0.31))
    val path = java.nio.file.Files.createTempDirectory("ivf-ing").toString
    graft.ops.SimilarityIndex.buildIvfFromCentroids(landed, cents, "vec_id", "v", path)
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    val batch = vecs(
      10L -> Seq(1.90, 0.62),  // 2 x landed 1: cosine 1.0 -> drops
      11L -> Seq(0.31, 0.95),  // cell B, novel -> lands
      12L -> Seq(0.62, 1.90),  // 2 x batch 11, same cell, higher id -> drops
      13L -> Seq(0.99, 0.14))  // cell A, cos vs landed ~0.984 < cut -> lands
    assert(idx.ingestNear(batch, threshold = 0.995) == 2L)
    def ids() = idx.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids() == Set(1L, 11L, 13L))
    // replay: every batch member now scores 1.0 against itself or its twin
    assert(idx.ingestNear(batch, threshold = 0.995) == 0L)
    assert(ids() == Set(1L, 11L, 13L))

    // nprobe recall knob: a near-dup hiding in the query's SECOND cell
    // slips past nprobe=1 and is caught by nprobe=2
    def fresh() = {
      val p2 = java.nio.file.Files.createTempDirectory("ivf-ing2").toString
      graft.ops.SimilarityIndex.buildIvfFromCentroids(
        vecs(2L -> Seq(0.70, 0.7141)), cents, "vec_id", "v", p2) // cell B
      (graft.ops.SimilarityIndex.loadIvf(spark, p2, "vec_id", "v"), p2)
    }
    val inc = vecs(20L -> Seq(0.75, 0.66)) // assigns to cell A; cos vs 2 ~ 0.997
    assert(fresh()._1.ingestNear(inc, threshold = 0.995, nprobe = 1) == 1L)
    assert(fresh()._1.ingestNear(inc, threshold = 0.995, nprobe = 2) == 0L)

    // a row REPEATED under the same id inside one batch (at-least-once
    // upstream) collapses to one appended copy, not two
    val dup = vecs(40L -> Seq(0.6, 0.8), 40L -> Seq(0.6, 0.8))
    val (dIdx, _) = fresh()
    assert(dIdx.ingestNear(dup, threshold = 0.995) == 1L)
    assert(dIdx.assigned.filter(col("vec_id") === 40L).count() == 1L)

    // the session wrapper: gate + periodic cell compaction in one loop
    val (sIdx, sPath) = fresh()
    val session = new graft.ops.SimilarityIndex.VectorIngestSession(
      sIdx, threshold = 0.995, compactEvery = 2, compactMaxFiles = 1)
    assert(session.ingest(vecs(30L -> Seq(0.0, 1.0))) == 1L)   // cell B
    assert(session.ingest(vecs(31L -> Seq(0.45, 0.9))) == 1L)  // cell B, cos vs 30 ~0.89
    val bFiles = {
      val ls = java.nio.file.Files.list(
        java.nio.file.Paths.get(sPath, "assigned", "centroid_id=101"))
      try ls.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally ls.close()
    }
    assert(bFiles == 1, s"the compaction tick must fold cell B, got $bFiles files")
    assert(session.ingest(vecs(32L -> Seq(0.46, 0.9))) == 0L,  // ~dup of 31
      "gate still exact after the fold")
  }

  test("IVF rebuild re-trains on surviving rows: id set exact, deletes stay deleted") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    def vecs(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava, sch)
    val path = java.nio.file.Files.createTempDirectory("ivf-rb").toString
    // initial distribution hugs the x-axis; both trained cells land there
    graft.ops.SimilarityIndex.buildIvf(
      vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.1), 3L -> Seq(0.95, 0.05),
        4L -> Seq(1.0, 0.1)),
      "vec_id", "v", k = 2, iters = 3, path = path)
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    // the ingest drifts to the y-axis (frozen centroids: all pile into
    // the nearest old cell); one doc is taken down
    idx.append(vecs(10L -> Seq(0.0, 1.0), 11L -> Seq(0.1, 0.95),
      12L -> Seq(0.05, 1.0)))
    assert(idx.delete(vecs(2L -> Seq(0.0, 0.0)).select("vec_id")) == 1L)
    def ids(i: graft.ops.SimilarityIndex.IvfIndex) =
      i.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    val before = ids(idx)
    assert(before == Set(1L, 3L, 4L, 10L, 11L, 12L))

    val rebuilt = idx.rebuild(k = 2, iters = 3)
    // THE contract: exactly the surviving rows, nothing resurrected
    assert(ids(rebuilt) == before, "rebuild must preserve the id set exactly")
    assert(rebuilt.centroids.count() == 2)
    // the redrawn cells separate the two true clusters: a 1-probe query
    // on each axis finds its own cluster's nearest
    val qx = vecs(500L -> Seq(1.0, 0.02))
    val qy = vecs(501L -> Seq(0.02, 1.0))
    assert(rebuilt.topK(qx, k = 1).collect()(0).getLong(2) == 1L)
    assert(Set(10L, 12L).contains(
      rebuilt.topK(qy, k = 1).collect()(0).getLong(2)))
    // staging is cleaned up; the layout holds exactly the two live dirs
    val left = {
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      try ls.iterator().asScala.map(_.getFileName.toString).toSet
      finally ls.close()
    }
    assert(left == Set("centroids", "assigned"), s"got $left")
    // and the gate still works against the rebuilt layout
    assert(rebuilt.ingestNear(vecs(20L -> Seq(0.0, 2.0)), 0.995) == 0L,
      "a scaled copy of a landed vector must still gate out after rebuild")
    // a CRASHED rebuild's staging dir (underscore-prefixed: invisible to
    // readers) is reclaimed by the next rebuild, and answers are unchanged
    val stale = java.nio.file.Paths.get(path, "_rebuild-deadbeef")
    java.nio.file.Files.createDirectories(stale.resolve("assigned"))
    java.nio.file.Files.writeString(stale.resolve("assigned").resolve("junk.txt"), "x")
    assert(rebuilt.topK(qx, k = 1).collect()(0).getLong(2) == 1L,
      "stale staging must be invisible to probes")
    val again = rebuilt.rebuild(k = 2, iters = 3)
    assert(!java.nio.file.Files.exists(stale), "next rebuild reclaims crashed staging")
    assert(ids(again) == before)

    // a deleted-out index refuses to rebuild with a clear message
    again.delete(again.assigned.select("vec_id"))
    val err = intercept[IllegalArgumentException](again.rebuild(k = 2, iters = 1))
    assert(err.getMessage.contains("no rows"))
  }

  test("IVF-PQ rebuild from the source corpus keeps the index's id set authoritative") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    val rows = (0 until 16).map { i =>
      val v = if (i % 2 == 0) Seq(1.0 + i * 0.01, 0.1, 1.0, 0.1)
              else Seq(0.1, 1.0 + i * 0.01, 0.1, 1.0)
      Row(i.toLong, v)
    }
    val corpus = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    val path = java.nio.file.Files.createTempDirectory("ivfpq-rb").toString
    graft.ops.SimilarityIndex.buildIvfPq(corpus, "vec_id", "v",
      k = 2, iters = 2, m = 2, codebookK = 4, path = path)
    val idx = graft.ops.SimilarityIndex.loadIvfPq(spark, path, "vec_id", "v")
    val del = spark.createDataFrame(Seq(Row(6L), Row(7L)).asJava,
      StructType.fromDDL("vec_id bigint"))
    assert(idx.delete(del) == 2L)
    def ids(i: graft.ops.SimilarityIndex.IvfPqIndex) =
      i.encoded.select("vec_id").collect().map(_.getLong(0)).toSet
    val before = ids(idx)
    assert(!before.contains(6L) && !before.contains(7L))
    // the corpus STILL contains the deleted rows — the index id set, not
    // the corpus, decides membership through the rebuild
    val rebuilt = idx.rebuild(corpus, k = 2, iters = 2, m = 2, codebookK = 4)
    assert(ids(rebuilt) == before, "deletes must stay deleted through rebuild")
    assert(rebuilt.centroids.count() == 2 && rebuilt.codebook.count() > 0)
    val q = spark.createDataFrame(Seq(Row(500L, Seq(1.0, 0.1, 1.0, 0.1))).asJava, sch)
    val hits = rebuilt.topK(q, k = 3).collect().map(_.getLong(2)).toSet
    assert(hits.nonEmpty && hits.forall(before.contains))
  }

  test("rebuild swap crash leaves every subdir recoverable: load restores from the aside") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    def vecs(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava, sch)
    val path = java.nio.file.Files.createTempDirectory("ivf-swapcrash").toString
    graft.ops.SimilarityIndex.buildIvf(
      vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0), 3L -> Seq(0.9, 0.1)),
      "vec_id", "v", k = 2, iters = 2, path = path)
    // simulate the swap's one destructive-looking window: the live
    // `assigned` (the ONLY full-vector copy) renamed aside, crash before
    // the staged install — the old protocol (delete live, then rename)
    // would have left no recovery path at all
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.move(p.resolve("assigned"), p.resolve("_old-assigned"))
    val staging = p.resolve("_rebuild-cafe")
    java.nio.file.Files.createDirectories(staging)
    // fsck sees the crash leftovers and — evaluating generations over the
    // POST-restore layout (the aside stands in for its missing subdir) —
    // correctly predicts that a load will succeed here (same generation
    // both sides), unlike a cross-generation transplant
    val sick = graft.ops.SimilarityIndex.fsckIndex(spark, path)
    assert(sick.asides == Seq("_old-assigned") &&
      sick.staleStaging == Seq("_rebuild-cafe") &&
      !sick.mixedGeneration && !sick.clean, s"got $sick")
    // load must restore the aside and reclaim nothing it shouldn't
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    assert(java.nio.file.Files.exists(p.resolve("assigned")))
    assert(!java.nio.file.Files.exists(p.resolve("_old-assigned")))
    assert(idx.assigned.count() == 3)
    assert(idx.topK(vecs(500L -> Seq(1.0, 0.05)), k = 1)
      .collect()(0).getLong(2) == 1L)
    // and a re-run rebuild completes from the recovered state, clearing
    // the crashed staging
    val again = idx.rebuild(k = 2, iters = 2)
    assert(!java.nio.file.Files.exists(staging))
    assert(again.assigned.count() == 3)
    // completed swaps leave no asides behind
    val left = {
      val ls = java.nio.file.Files.list(p)
      try ls.iterator().asScala.map(_.getFileName.toString).toSet
      finally ls.close()
    }
    assert(left == Set("centroids", "assigned"), s"got $left")
  }

  test("index rebuild and aside restore refuse delete+copy-rename stores") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    def vecs(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava, sch)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.objstore.impl", classOf[ObjStoreFileSystem].getName)
    hc.set("fs.AbstractFileSystem.objstore.impl", classOf[ObjStoreAbstractFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("ivf-objstore")
    val path = s"objstore://$dir"
    graft.ops.SimilarityIndex.buildIvf(
      vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0), 3L -> Seq(0.9, 0.1)),
      "vec_id", "v", k = 2, iters = 2, path = path)
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    // build + load + query are object-store-fine; only the IN-PLACE swap
    // protocol needs all-or-nothing rename
    assert(idx.topK(vecs(500L -> Seq(1.0, 0.05)), k = 1).collect().nonEmpty)
    // refused BEFORE the retrain burn, naming the contract and the outs
    val e = intercept[IllegalArgumentException](idx.rebuild(k = 2, iters = 2))
    assert(e.getMessage.contains("atomic-rename store"), e.getMessage)
    assert(java.nio.file.Files.exists(dir.resolve("assigned")), "refusal must not touch the index")
    // a crash aside on such a store may be a PARTIAL copy (even one
    // carrying the generation stamp) — restoring it would install a
    // silently truncated table, so the recovery refuses too
    java.nio.file.Files.move(dir.resolve("assigned"), dir.resolve("_old-assigned"))
    val e2 = intercept[IllegalArgumentException](
      graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v"))
    assert(e2.getMessage.contains("atomic-rename store"), e2.getMessage)
    // the same tree through file:// (real atomic rename) recovers normally
    val rec = graft.ops.SimilarityIndex.loadIvf(spark, dir.toString, "vec_id", "v")
    assert(rec.assigned.count() == 3)
  }

  test("text LSH maxBucket drops a degenerate copy bucket, keeps selective pairs") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("id bigint, text string")
    // 30 byte-identical copies of one page: identical signatures, one
    // bucket per band, 435 quadratic candidates — exactly what exact
    // dedup should have collapsed first. Plus one selective near pair.
    val copies = (0 until 30).map(i =>
      Row(i.toLong, "the same boilerplate page body text repeated here"))
    val base = (1 to 30).map(i => s"w$i").mkString(" ") // J = 28/30 with +1 word
    val nearA = Row(100L, base)
    val nearB = Row(101L, s"$base extra")
    val df = spark.createDataFrame((copies :+ nearA :+ nearB).asJava, sch)
    val unlimited = graft.ops.Dedup.lshCandidatePairs(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unlimited.contains((100L, 101L)) && unlimited.size == 435 + 1)
    val guarded = graft.ops.Dedup.lshCandidatePairs(df, "id", "text",
      maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((100L, 101L)), s"got $guarded")
    // and through the estimate/clean entry points with the knob threaded
    val est = graft.ops.Dedup.minhashEstimatePairs(df, "id", "text",
      maxBucket = 10)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(est == Set((100L, 101L)))
    val cleaned = graft.ops.Dedup.dedupCorpusLsh(df, "id", "text",
      maxBucket = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    // the guard sacrifices the degenerate bucket's pairs (all 30 copies
    // survive — exact dedup's job), the near pair still collapses
    assert(cleaned == (0L until 30L).toSet + 100L)
  }

  test("embeddingLshPairs maxBucket drops oversized buckets, keeps selective ones") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    // 20 vectors crowded into one orthant: every hyperplane bit agrees, so
    // ALL of them share one bucket in every band — the degenerate occupancy
    // that makes the candidate self-join quadratic. Two more vectors in the
    // opposite orthant form a selective near pair (tiny bucket).
    // exact copies under distinct ids: identical signatures on EVERY
    // plane (scaled copies flip sign on zero-sum planes via the float
    // residue and split into sub-buckets), so all 20 share one bucket
    val crowd = (0 until 20).map(i => Row(i.toLong, Seq.fill(64)(1.0)))
    val pairA = Row(100L, Seq.fill(64)(-1.0))
    val pairB = Row(101L, Seq.tabulate(64)(j => if (j == 0) -1.02 else -1.0))
    val df = spark.createDataFrame((crowd :+ pairA :+ pairB).asJava, sch)
    val unlimited = graft.ops.Dedup.embeddingLshPairs(df, "vec_id", "v",
      dims = 64, threshold = 0.99)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unlimited.contains((100L, 101L)))
    assert(unlimited.exists { case (a, b) => a < 20 && b < 20 },
      "the crowded orthant's near pairs verify when unguarded")
    val guarded = graft.ops.Dedup.embeddingLshPairs(df, "vec_id", "v",
      dims = 64, threshold = 0.99, maxBucket = 10)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((100L, 101L)),
      s"only the selective bucket's pair should survive the guard, got $guarded")
    // maxBucket larger than any bucket = exact LSH semantics
    val loose = graft.ops.Dedup.embeddingLshPairs(df, "vec_id", "v",
      dims = 64, threshold = 0.99, maxBucket = 1000)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == unlimited)
  }

  test("mixed-generation index (cross-subdir swap crash) is refused at load, repaired by rebuild") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    def vecs(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava, sch)
    val data = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0), 3L -> Seq(0.9, 0.1))
    val pathA = java.nio.file.Files.createTempDirectory("ivf-genA").toString
    val pathB = java.nio.file.Files.createTempDirectory("ivf-genB").toString
    graft.ops.SimilarityIndex.buildIvf(data, "vec_id", "v", k = 2, iters = 2, pathA)
    graft.ops.SimilarityIndex.buildIvf(data, "vec_id", "v", k = 2, iters = 2, pathB)
    // simulate a swap that crashed after installing only `centroids`:
    // A's centroids come from a DIFFERENT build generation than its
    // assigned data — probing would return wrong cells with no error
    val a = java.nio.file.Paths.get(pathA)
    def rmTree(p: java.nio.file.Path): Unit =
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    rmTree(a.resolve("centroids"))
    java.nio.file.Files.move(java.nio.file.Paths.get(pathB).resolve("centroids"),
      a.resolve("centroids"))
    val err = intercept[IllegalArgumentException](
      graft.ops.SimilarityIndex.loadIvf(spark, pathA, "vec_id", "v"))
    assert(err.getMessage.contains("generations"))
    val sick = graft.ops.SimilarityIndex.fsckIndex(spark, pathA)
    assert(sick.mixedGeneration && !sick.clean)
    // the documented repair bypasses the gate and re-clusters
    val repaired = graft.ops.SimilarityIndex.rebuildIvf(spark, pathA,
      "vec_id", "v", k = 2, iters = 2)
    assert(repaired.assigned.count() == 3)
    assert(graft.ops.SimilarityIndex.fsckIndex(spark, pathA).clean)
    assert(graft.ops.SimilarityIndex.loadIvf(spark, pathA, "vec_id", "v")
      .topK(vecs(500L -> Seq(1.0, 0.05)), k = 1).collect()(0).getLong(2) == 1L)
    // a pre-stamp (legacy) index — no markers at all — still loads
    val pathC = java.nio.file.Files.createTempDirectory("ivf-genC").toString
    graft.ops.SimilarityIndex.buildIvf(data, "vec_id", "v", k = 2, iters = 2, pathC)
    val c = java.nio.file.Paths.get(pathC)
    Seq("centroids", "assigned").foreach(d => java.nio.file.Files.delete(
      c.resolve(d).resolve(graft.ops.SimilarityIndex.GenerationMarker)))
    assert(graft.ops.SimilarityIndex.loadIvf(spark, pathC, "vec_id", "v")
      .assigned.count() == 3)
  }

  test("ingestNear refuses a batch that concentrates quadratically in one cell") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    def vecs(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava, sch)
    val cents = vecs(100L -> Seq(1.0, 0.0), 101L -> Seq(0.0, 1.0))
    val path = java.nio.file.Files.createTempDirectory("ivf-guard").toString
    graft.ops.SimilarityIndex.buildIvfFromCentroids(
      vecs(1L -> Seq(0.9, 0.1)), cents, "vec_id", "v", path)
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    // 12 distinct vectors, all hugging the x-axis: every one probes cell A
    val pathological = vecs((0 until 12).map(i =>
      (10L + i, Seq(1.0, 0.001 * i))): _*)
    val err = intercept[IllegalArgumentException](
      idx.ingestNear(pathological, threshold = 0.999, maxBatchPerCell = 10))
    assert(err.getMessage.contains("maxBatchPerCell"))
    // nothing landed: the refusal happened before any append
    assert(idx.assigned.count() == 1L)
    // the same batch under the default knob proceeds normally
    assert(idx.ingestNear(pathological, threshold = 0.9999999) > 0L)
  }

  test("streaming gated vector ingest: micro-batches of files index through one session") {
    import org.apache.spark.sql.types._
    val sch = StructType.fromDDL("vec_id bigint, v array<double>")
    def vecs(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava, sch)
    val path = java.nio.file.Files.createTempDirectory("ivf-stream").toString
    graft.ops.SimilarityIndex.buildIvfFromCentroids(
      vecs(1L -> Seq(0.9, 0.1)),
      vecs(100L -> Seq(1.0, 0.0), 101L -> Seq(0.0, 1.0)), "vec_id", "v", path)
    val idx = graft.ops.SimilarityIndex.loadIvf(spark, path, "vec_id", "v")
    val inDir = java.nio.file.Files.createTempDirectory("vec-stream").toString
    vecs(10L -> Seq(1.8, 0.2), 11L -> Seq(0.1, 0.9)) // 10 = 2x landed 1 → drops
      .write.mode("append").parquet(inDir)
    val q = graft.ops.SimilarityIndex.startIngest(
      spark.readStream.schema(sch).parquet(inDir), idx, threshold = 0.995,
      checkpoint = java.nio.file.Files.createTempDirectory("vckpt").toString,
      interval = "1 seconds")
    q.processAllAvailable()
    vecs(12L -> Seq(0.2, 1.8), // 2x landed 11 → drops
      13L -> Seq(0.7, 0.7)).write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()
    val ids = idx.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 11L, 13L), s"got $ids")
  }

  test("persisted IVF-PQ index appends new codes against the frozen models") {
    import org.apache.spark.sql.types._
    // two obvious clusters in 4-d; m=2 subspaces of 2 dims each
    val rows = (0 until 16).map { i =>
      val v = if (i % 2 == 0) Seq(1.0 + i * 0.01, 0.1, 1.0, 0.1)
              else Seq(0.1, 1.0 + i * 0.01, 0.1, 1.0)
      Row(i.toLong, v)
    }
    val corpus = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    val path = java.nio.file.Files.createTempDirectory("ivfpq-app").toString
    graft.ops.SimilarityIndex.buildIvfPq(corpus, "vec_id", "v",
      k = 2, iters = 2, m = 2, codebookK = 4, path = path)
    val idx = graft.ops.SimilarityIndex.loadIvfPq(spark, path, "vec_id", "v")
    val q = spark.createDataFrame(Seq(Row(500L, Seq(1.0, 0.1, 1.0, 0.1))).asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    def ids(k: Int) = idx.topK(q, k).collect().map(_.getLong(2)).toSet
    val before = ids(3)
    // append a copy of corpus vector 0 under a new id: same cell, same
    // codes by construction → must surface among the query's neighbors
    val extra = spark.createDataFrame(
      Seq(Row(999L, Seq(1.0, 0.1, 1.0, 0.1))).asJava,
      StructType.fromDDL("vec_id bigint, v array<double>"))
    idx.append(extra)
    // ADC ties across the cluster's identical codes break by id — ask for
    // the whole cell to make the appended high-id member visible
    assert(ids(9).contains(999L), "appended vector must be ADC-retrievable")
    // and the delete path takes it back out
    assert(idx.delete(extra.select("vec_id")) == 1L)
    assert(ids(3) == before, "after delete the index answers as before")
  }

  test("asof join picks the latest right row at-or-before each left ts") {
    import graft.ops.AsOf
    val left = spark.createDataFrame(Seq(
      Row(1L, "u1", 100L), Row(2L, "u1", 250L), Row(3L, "u1", 50L),
      Row(4L, "u2", 500L)).asJava,
      StructType.fromDDL("id bigint, user string, ts bigint"))
    val right = spark.createDataFrame(Seq(
      Row("u1", 100L, "a"), Row("u1", 200L, "b"), Row("u2", 600L, "c")).asJava,
      StructType.fromDDL("user string, ts bigint, tag string"))
    val out = AsOf.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("tag"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getStruct(3).getString(0))).toMap
    assert(out == Map(
      1L -> "a",  // tie at ts=100 is inclusive
      2L -> "b",  // latest of {100, 200} <= 250
      3L -> null, // nothing at-or-before 50 (left join keeps the row)
      4L -> null)) // u2's only right row is later
    val inner = AsOf.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("tag"),
      joinType = "inner").collect().map(_.getLong(0)).toSet
    assert(inner == Set(1L, 2L))
  }

  test("range join matches points in [lo,hi) across bin boundaries, once each") {
    import graft.ops.RangeJoin
    val intervals = spark.createDataFrame(Seq(
      Row("k1", 1L, 10L, 30L),   // spans bins 1..2 (width 10)
      Row("k1", 2L, 25L, 26L),   // sub-bin interval
      Row("k2", 3L, 0L, 100L)).asJava, // spans many bins
      StructType.fromDDL("key string, iid bigint, lo bigint, hi bigint"))
    val points = spark.createDataFrame(Seq(
      Row("k1", 10L, 10L),  // lo-inclusive edge of interval 1
      Row("k1", 11L, 30L),  // hi-exclusive edge → no match
      Row("k1", 12L, 25L),  // inside 1 AND 2
      Row("k2", 13L, 99L),  // inside 3
      Row("k3", 14L, 5L)).asJava, // wrong key
      StructType.fromDDL("key string, pid bigint, pt bigint"))
    val got = RangeJoin.pointInInterval(intervals, points,
      Seq("key"), "lo", "hi", "pt", binWidth = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(4))).toSet // (iid, pid)
    assert(got == Set((1L, 10L), (1L, 12L), (2L, 12L), (3L, 13L)))
  }

  test("bigram perplexity matches hand computation on a tiny corpus") {
    // tokens: a b a | a b → uni a=3 b=2, V=2; bigrams (a,b)=2 (b,a)=1
    // P(b|a) = 3/5, P(a|b) = 2/4
    val df = docs(1L -> "a b a", 2L -> "a b")
    val got = TextOps.bigramPerplexity(df, "id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 2L && math.abs(got(1L)._2 - 1.8257) < 1e-9) // 1/sqrt(0.3)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - 1.6667) < 1e-9) // 1/0.6
  }

  test("hash sample is deterministic, salt-sensitive, and near the target rate") {
    val df = spark.range(0, 4000).toDF("id")
    val a = Curate.hashSample(df, col("id"), 0.25).collect().map(_.getLong(0)).toSet
    val b = Curate.hashSample(df, col("id"), 0.25).collect().map(_.getLong(0)).toSet
    assert(a == b) // same key+salt+fraction → identical rows
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.05)
    val salted = Curate.hashSample(df, col("id"), 0.25, salt = "v2")
      .collect().map(_.getLong(0)).toSet
    assert(salted != a) // independent draw
    // a narrower fraction is a strict subset: thresholds nest
    val narrow = Curate.hashSample(df, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    assert(narrow.subsetOf(a))
  }

  test("split assignment is exhaustive, deterministic, and near the fractions") {
    val df = spark.range(0, 4000).toDF("id")
    val got = Curate.assignSplits(df, col("id"),
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val byS = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.values.sum == 4000) // every row gets exactly one split
    assert(math.abs(byS("train") / 4000.0 - 0.9) < 0.03)
    assert(math.abs(byS("val") / 4000.0 - 0.05) < 0.02)
    assert(math.abs(byS("test") / 4000.0 - 0.05) < 0.02)
    // splits are a partition of the hashSample nesting: train ∪ val = 95% sample
    val s95 = Curate.hashSample(df, col("id"), 0.95).collect().map(_.getLong(0)).toSet
    val tv = got.filter(col("split") =!= "test").collect().map(_.getLong(0)).toSet
    assert(tv == s95)
  }

  test("mix rebalance downsamples to the target distribution's binding group") {
    val s = spark
    import s.implicits._
    val df = ((1L to 80L).map(i => (i, "a")) ++ (81L to 100L).map(i => (i, "b")) ++
      Seq((101L, "c"))).toDF("id", "grp")
    // T = min(80/0.5, 20/0.5) = 40 -> rate_a = 0.25, rate_b = 1.0; c drops
    val out = Curate.rebalanceToMix(df, col("grp"), Map("a" -> 0.5, "b" -> 0.5), col("id"))
    val byGrp = out.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byGrp.contains("c"), "groups outside the mix must drop")
    assert(byGrp.getOrElse("b", 0L) == 20L, "binding group keeps everything")
    assert(byGrp.getOrElse("a", 0L) < 80L, "oversized group must downsample")
    // deterministic: the exact same rows on a rerun
    val rerun = Curate.rebalanceToMix(df, col("grp"), Map("a" -> 0.5, "b" -> 0.5), col("id"))
    assert(out.collect().toSet == rerun.collect().toSet)
    // a missing mix group forces an empty result (the mix is unsatisfiable)
    assert(Curate.rebalanceToMix(df, col("grp"),
      Map("a" -> 0.5, "zz" -> 0.5), col("id")).count() == 0L)
  }

  test("temperature mix flattens toward uniform as alpha drops; alpha=1 changes nothing") {
    val s = spark
    import s.implicits._
    val df = ((1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small")) ++
      Seq((1001L, null.asInstanceOf[String]))).toDF("id", "grp")
    // alpha = 1: q = p, so T = N on the natural distribution — every
    // non-null row survives (the >= 1.0 short-circuit keeps both groups whole)
    assert(Curate.temperatureMix(df, col("grp"), 1.0, col("id")).count() == 1000L,
      "alpha=1 must keep the natural distribution intact")
    // alpha -> 0 flattens: the minority group binds (kept whole) and the
    // majority downsamples toward parity
    val out = Curate.temperatureMix(df, col("grp"), 0.01, col("id"))
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => Option(r.getString(0)).orNull -> r.getLong(1)).toMap
    assert(!byGrp.contains(null), "null-stratum rows have no place in the mix")
    assert(byGrp("small") == 100L, "minority group binds and keeps everything")
    assert(byGrp("big") < 200L,
      s"majority must flatten toward parity, kept ${byGrp("big")}")
    // deterministic rerun
    assert(out.collect().toSet ==
      Curate.temperatureMix(df, col("grp"), 0.01, col("id")).collect().toSet)
  }

  test("temperature/rebalance mix accept NON-STRING strata (numeric cell ids round-trip)") {
    val s = spark
    import s.implicits._
    // integer strata — the likeliest input for cluster-balance callers; a
    // toString-vs-implicit-cast comparison mismatch would zero every rate
    val df = ((1L to 900L).map(i => (i, 7)) ++ (901L to 1000L).map(i => (i, 42)))
      .toDF("id", "cell")
    assert(Curate.temperatureMix(df, col("cell"), 1.0, col("id")).count() == 1000L,
      "alpha=1 over an int stratum must keep everything — rates must not zero")
    val flat = Curate.temperatureMix(df, col("cell"), 0.01, col("id"))
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(flat(42) == 100L && flat(7) < 200L,
      s"int strata must flatten like string strata, got $flat")
    // rebalance with DOUBLE strata: keys match Spark's string rendering
    val dd = ((1L to 80L).map(i => (i, 1.5)) ++ (81L to 100L).map(i => (i, 2.5)))
      .toDF("id", "cell")
    val out = Curate.rebalanceToMix(dd, col("cell"),
      Map("1.5" -> 0.5, "2.5" -> 0.5), col("id"))
      .groupBy("cell").count().collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out.getOrElse(2.5, 0L) == 20L && out.getOrElse(1.5, 0L) > 0L,
      s"double strata must rebalance, got $out")
  }

  test("unimax allocation: small groups cap at maxEpochs, freed budget spreads uniformly") {
    val s = spark
    import s.implicits._
    // tokens per group: small=100, mid=10000, big=100000
    val df = (Seq.fill(1)(("small", 100L)) ++ Seq.fill(2)(("mid", 5000L)) ++
      Seq.fill(4)(("big", 25000L))).toDF("grp", "tok")
    val out = Curate.unimaxAllocation(df, col("grp"), col("tok"),
      budget = 60000.0, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // smallest-first: small takes min(60000/3, 200) = 200 (capped at 2 epochs);
    // mid takes min(29900, 20000) = 20000 (capped); big takes the rest 39800
    assert(out("small") == ((100L, 200.0, 2.0)))
    assert(out("mid") == ((10000L, 20000.0, 2.0)))
    assert(out("big")._2 == 39800.0 && out("big")._3 < 2.0)
    // allocations exhaust the budget exactly when no group binds it
    assert(out.values.map(_._2).sum == 60000.0)
    // epoch cap is a hard ceiling everywhere
    assert(out.values.forall(_._3 <= 2.0))
  }

  test("oov rate: full-coverage docs score 0, out-of-vocab tokens count exactly") {
    val s = spark
    import s.implicits._
    // "common" appears in every doc so it always makes the top-2 vocab;
    // "filler" pads doc 1. Doc 2's rare tokens are out of a 2-word vocab.
    val df = Seq(
      (1L, "common filler common filler common filler"),
      (2L, "common rare1 rare2 rare3")).toDF("doc_id", "text")
    val out = TextOps.oovRate(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((6L, 0L, 0.0)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 3L, 0.75)), s"got ${out(2L)}")
  }

  test("stratified sample applies per-stratum rates") {
    val df = spark.range(0, 4000)
      .select(col("id"), when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val got = Curate.stratifiedSample(df, col("lang"),
      Map("en" -> 0.5), defaultRate = 0.05, keyCol = col("id"))
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") / 2000.0 - 0.5) < 0.08)
    assert(math.abs(byLang.getOrElse("de", 0L) / 2000.0 - 0.05) < 0.04)
  }

  test("cap per group keeps the n best rows with deterministic tiebreak") {
    val rows = Seq(
      Row("a", 1L, 10L), Row("a", 2L, 30L), Row("a", 3L, 30L), Row("a", 4L, 20L),
      Row("b", 5L, 1L))
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("src string, id bigint, score bigint"))
    val kept = Curate.capPerGroup(df, col("src"), col("score").desc, col("id"), n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: scores 30(id2),30(id3) win — id2 before id3; b: only row kept
    assert(kept == Set(("a", 2L), ("a", 3L), ("b", 5L)))
  }

  test("sequence packing fills packs contiguously per shard") {
    val rows = Seq(
      Row("s1", 1L, 400L), Row("s1", 2L, 400L), Row("s1", 3L, 400L), // 3rd straddles → pack 0
      Row("s1", 4L, 900L),                                           // starts at 1200 → pack 1
      Row("s2", 9L, 50L))                                            // own shard → pack 0
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("src string, id bigint, tok bigint"))
    val packs = Curate.packSequences(df, col("src"), col("id"), col("tok"), 1000)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(packs == Map(
      ("s1", 1L) -> 0L, ("s1", 2L) -> 0L, ("s1", 3L) -> 0L,
      ("s1", 4L) -> 1L, ("s2", 9L) -> 0L))
  }

  test("incremental bloom dedup stays exact even when the sketch saturates") {
    val history = spark.createDataFrame(
      (0 until 200).map(i => (i.toLong, s"hist doc $i"))).toDF("doc_id", "text")
    val incoming = spark.createDataFrame(
      // 50 true dups of history + 150 genuinely new
      ((0 until 50).map(i => (1000L + i, s"hist doc $i")) ++
        (0 until 150).map(i => (2000L + i, s"new doc $i")))).toDF("doc_id", "text")
    val expected = (0 until 150).map(2000L + _).toSet

    // healthy sketch: most new docs skip the join entirely
    val healthy = graft.ops.Dedup.incrementalNewDocs(history, incoming, "text",
      expectedItems = 1000, fpp = 0.001)
    assert(healthy.collect().map(_.getAs[Long]("doc_id")).toSet == expected)

    // saturated sketch (sized for 2 items, fed 200): nearly everything
    // might-contain, the exact verify still removes every false positive —
    // same answer
    val saturated = graft.ops.Dedup.incrementalNewDocs(history, incoming, "text",
      expectedItems = 2, fpp = 0.5)
    assert(saturated.collect().map(_.getAs[Long]("doc_id")).toSet == expected)

    // the UNmanaged API must not pin executor storage it can't release;
    // the managed variant persists, and release() drops it all again
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.ops.Dedup.incrementalNewDocs(history, incoming, "text").collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "plain incrementalNewDocs leaked persisted RDDs")
    val (managed, release) = graft.ops.Dedup.incrementalNewDocsManaged(
      history, incoming, "text")
    assert(managed.collect().map(_.getAs[Long]("doc_id")).toSet == expected)
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "managed release() left persisted RDDs behind")
  }

  test("minhash production preset (128 perms, 32 bands): recall and precision on planted near-dups") {
    // The oracle queries run the coarse 16-perm preset; production near-dup
    // at ~0.8 thresholds runs 128 perms / 32 bands (4-row bands: catch
    // probability 1-(1-J⁴)³² ≈ 1-2e-8 at J≈0.8). This pins that knob with a
    // measured point: 60 planted near-dup pairs at true Jaccard 25/31≈0.81
    // (30-word docs, last 3 words replaced → 3 of 28 trigram shingles
    // changed), disjoint vocabularies otherwise so any cross pair is a
    // false positive. The md5 permutations are deterministic, so this is a
    // fixed measurement, not a flaky sample.
    val base = (0 until 60).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
    val dups = (0 until 60).map(i =>
      (1000L + i,
        ((0 until 27).map(j => s"w${i}_$j") ++ (0 until 3).map(j => s"x${i}_$j")).mkString(" ")))
    val df = spark.createDataFrame(base ++ dups).toDF("doc_id", "text")

    val pairs = Dedup.minhashEstimatePairs(df, "doc_id", "text",
      n = 3, numPerms = 128, bands = 32, threshold = 0.5).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = (0 until 60).map(i => (i.toLong, 1000L + i)).toSet

    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall over ${truth.size} planted pairs")
    assert(found.subsetOf(truth), s"false positives: ${found.diff(truth)}")
    // 128-perm estimates concentrate near the true Jaccard (std err ≈0.035)
    pairs.foreach { r =>
      val est = r.getDouble(2)
      assert(est > 0.65 && est < 0.95, s"estimate $est far from true 0.81")
    }
  }

  test("gopher rules: line-shape and word-shape signals gate as specified") {
    val good = ("the data and pipeline have a job to do with care " * 5).trim // 55 words, stopwords present
    val df = docs(
      1L -> good,
      2L -> "the and of short",                                  // fails word-count floor
      3L -> ("- item one\n- item two\n- item three\nthe and of " +
        good),                                                    // 3/4 bullet lines: < 0.9 still passes
      4L -> (good + "\nso it trails off...\nand again…\nplain"), // 2/4 ellipsis lines ≥ 0.3: fails
      5L -> (("0 1 2 3 4 " * 11).trim + " the and"))             // alpha_frac < 0.8: fails
    val r = TextOps.gopherRules(df, "id", "text", minWords = 30)
      .collect().map(x => x.getAs[Long]("id") -> x).toMap
    assert(r(1L).getAs[Boolean]("pass"))
    assert(!r(2L).getAs[Boolean]("pass") && r(2L).getAs[Long]("n_words") === 4L)
    assert(r(3L).getAs[Double]("bullet_frac") === 0.75 && r(3L).getAs[Boolean]("pass"))
    assert(r(4L).getAs[Double]("ellipsis_frac") === 0.5 && !r(4L).getAs[Boolean]("pass"))
    assert(r(5L).getAs[Double]("alpha_frac") < 0.8 && !r(5L).getAs[Boolean]("pass"))
  }

  test("repeated-line removal cuts corpus-wide boilerplate, keeps order, empties all-boilerplate docs") {
    val boiler = "subscribe now"
    val df = docs(
      1L -> s"keep one\n$boiler\nkeep two",
      2L -> s"$boiler\nunique middle\n$boiler",
      3L -> boiler,                        // nothing survives
      4L -> "solo line stands alone")
    val r = Dedup.removeRepeatedLines(df, "id", "text", minCount = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    assert(r(1L).getString(1) == "keep one\nkeep two" && r(1L).getLong(3) == 1L)
    assert(r(2L).getString(1) == "unique middle" && r(2L).getLong(3) == 2L)
    assert(r(3L).getString(1) == "" && r(3L).getLong(2) == 0L && r(3L).getLong(3) == 1L)
    assert(r(4L).getString(1) == "solo line stands alone" && r(4L).getLong(3) == 0L)
  }

  test("BPE learns the textbook merge sequence and encodes by rank priority") {
    // the classic word-frequency example: {hug:10, pug:5, pun:12, bun:4,
    // hugs:5} learns ug, un, hug in that order
    val corpus = docs(
      1L -> ("hug " * 10).trim, 2L -> ("pug " * 5).trim, 3L -> ("pun " * 12).trim,
      4L -> ("bun " * 4).trim, 5L -> ("hugs " * 5).trim)
    val merges = TextOps.bpeLearn(corpus, "text", numMerges = 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    val enc = TextOps.bpeEncode(docs(
      10L -> "hugs bug pun", 11L -> null.asInstanceOf[String]), "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(10L) == Seq("hug", "s", "b", "ug", "p", "un"))
    assert(enc(11L).isEmpty)
  }

  test("BPE learn stops early when no pair reaches minPairCount") {
    val merges = TextOps.bpeLearn(docs(1L -> "ab cd ef"), "text",
      numMerges = 10, minPairCount = 2)
    assert(merges.isEmpty)
  }

  test("DSIR weights rank target-like documents above off-distribution ones") {
    val corpus = docs(
      1L -> "alpha beta gamma delta alpha beta",
      2L -> "alpha beta gamma epsilon beta alpha",
      3L -> "xx yy zz ww xx yy",
      4L -> "alpha beta gamma delta epsilon beta")
    val target = docs(
      10L -> "alpha beta gamma delta epsilon",
      11L -> "beta alpha gamma gamma delta")
    val w = Curate.importanceWeights(corpus, target, "id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L))
    // every target-like doc outranks the off-distribution doc
    Seq(1L, 2L, 4L).foreach(i => assert(w(i) > w(3L),
      s"doc $i (${w(i)}) should outrank noise doc 3 (${w(3L)})"))
  }

  test("text normalization: NFC composes accents, controls stripped, case+whitespace folded") {
    // decomposed e + U+0301, a BEL control, tabs, runs of spaces
    val df = docs(1L -> "  Café   DU\t\tMondeX  ")
    val out = TextOps.normalizeText(df, "id", "text").collect()(0).getString(1)
    assert(out == "café du mondex", s"got '$out'")
    // NFC preserves the ﬁ ligature; NFKC folds it to "fi"
    val lig = docs(2L -> "the ﬁnal word")
    assert(TextOps.normalizeText(lig, "id", "text").collect()(0).getString(1)
      == "the ﬁnal word")
    assert(TextOps.normalizeText(lig, "id", "text", form = "NFKC")
      .collect()(0).getString(1) == "the final word")
    // idempotent: normalizing a normalized text is identity
    val once = TextOps.normalizeText(df, "id", "text")
      .select(col("id"), col("text_norm").as("text"))
    assert(TextOps.normalizeText(once, "id", "text").collect()(0).getString(1)
      == "café du mondex")
  }

  test("tf-idf keywords: corpus-wide terms weigh zero, doc-specific terms rank first") {
    val df = docs(
      1L -> "the the the zebra quark",
      2L -> "the the photon photon muon",
      3L -> "the gluon")
    val top = TextOps.tfidfKeywords(df, "id", "text", k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // "the" appears in every doc → ln(3/3)=0, never outranks specific terms
    // doc2: photon tf=2 beats muon tf=1
    assert(top((2L, 1)) == "photon" && top((2L, 2)) == "muon")
    assert(top((3L, 1)) == "gluon")
    // doc1: quark/zebra tie at tf=1·ln(3) → lexicographic order
    assert(top((1L, 1)) == "quark" && top((1L, 2)) == "zebra")
  }

  test("sentence segmentation and sentence-window chunking keep order and boundaries") {
    val df = docs(1L -> "First one. Second!! Third? Fourth. tail bit")
    val sents = TextOps.sentences(df, "id", "text").collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(sents == Map(0L -> "First one.", 1L -> "Second!!", 2L -> "Third?",
      3L -> "Fourth.", 4L -> "tail bit"))
    val chunks = TextOps.chunkBySentences(df, "id", "text", sentsPerChunk = 2)
      .collect().map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(chunks == Map(
      0L -> (("First one. Second!!", 2L)),
      1L -> (("Third? Fourth.", 2L)),
      2L -> (("tail bit", 1L))))
    // terminator-only text yields nothing ("...!!" has no non-terminator
    // char to anchor a match); whitespace-only fragments are dropped
    assert(TextOps.sentences(docs(2L -> "...!!"), "id", "text").count() == 0)
    assert(TextOps.sentences(docs(3L -> "   "), "id", "text").count() == 0)
  }

  test("paragraph segmentation: blank-line runs split, single newlines stay inside") {
    val df = docs(1L -> "First para line a\nline b\n\nSecond\n \t\nThird\n\n   ")
    val out = TextOps.paragraphs(df, "id", "text").collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    // single \n stays inside a paragraph; blank lines (even with horizontal
    // whitespace) split; the trailing whitespace-only paragraph drops
    assert(out == Map(0L -> "First para line a\nline b", 1L -> "Second", 2L -> "Third"))
  }

  test("training-shard export: deterministic membership, exhaustive, one file per shard") {
    val df = spark.createDataFrame(
      (1 to 300).map(i => Row(i.toLong, s"doc $i")).asJava,
      StructType.fromDDL("id bigint, text string"))
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Curate.writeShards(df, col("id"), out, numShards = 4)
    val back = spark.read.parquet(out)
    // exhaustive and disjoint: every input row comes back exactly once
    assert(back.count() == 300)
    assert(back.select("id").distinct().count() == 300)
    // membership matches the portable-hash formula (re-run = same shards)
    val expected = df.select(col("id"),
      pmod(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(4L)).cast("int").as("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    back.select("id", "shard").collect()
      .foreach(r => assert(r.getInt(1) == expected(r.getLong(0))))
    // exactly one parquet file per shard directory
    for (s <- 0 until 4) {
      val files = new java.io.File(s"$out/shard=$s").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s has ${files.length} files")
    }
  }

  test("quality gate keeps exactly the top fraction; at-threshold ties survive") {
    val df = spark.createDataFrame(
      (1 to 100).map(i => Row(i.toLong, i.toDouble)).asJava,
      StructType.fromDDL("id bigint, score double"))
    val kept = Curate.qualityGate(df, col("score"), keepFraction = 0.25)
      .collect().map(_.getLong(0)).toSet
    // exact p75 of 1..100 = 75.25 → keep 76..100
    assert(kept == (76 to 100).map(_.toLong).toSet)
    // ties at the threshold are all kept: constant scores keep everything
    val flat = spark.createDataFrame(
      (1 to 10).map(i => Row(i.toLong, 5.0)).asJava,
      StructType.fromDDL("id bigint, score double"))
    assert(Curate.qualityGate(flat, col("score"), 0.5).count() == 10)
    // approx variant agrees on well-separated scores
    val keptApprox = Curate.qualityGateApprox(df, col("score"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(keptApprox.size >= 24 && keptApprox.size <= 26 &&
      keptApprox.forall(_ >= 74L), s"approx gate kept $keptApprox")
  }

  test("qualityGateApprox is within the sketch's documented rank error of the exact gate") {
    // the curate_quality_gate_approx oracle row is rows-only by design
    // (approx_percentile is not bit-portable across engines) — this is its
    // QUANTIFIED backstop: on the real corpus, the approx kept set differs
    // from the oracled exact twin by at most the sketch's rank error
    // (n/accuracy rows) plus one score TIE GROUP at the approx threshold
    // (the gate keeps >= threshold, so a whole tie group moves together
    // when the sketch lands inside it; the exact gate's interpolated
    // quantile_cont threshold can split the same group)
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("n_chars").cast("double").as("score"))
      .persist()
    val n = docs.count()
    val accuracy = 10000
    val rankErr = math.ceil(n.toDouble / accuracy).toLong
    val exact = Curate.qualityGate(docs, col("score"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approxKept = Curate.qualityGateApprox(docs, col("score"), 0.3, accuracy)
      .select(col("doc_id"), col("score")).collect()
    val approx = approxKept.map(_.getLong(0)).toSet
    // the approx threshold IS the minimum kept score (it is a corpus
    // element, so it keeps itself); its tie group bounds the split
    val thrA = approxKept.map(_.getDouble(1)).min
    val tieGroup = docs.filter(col("score") === thrA).count()
    val diff = (exact -- approx) ++ (approx -- exact)
    assert(diff.size <= rankErr + tieGroup,
      s"approx gate drifted past its error budget: |diff|=${diff.size}, " +
        s"rank error=$rankErr, tie group at $thrA=$tieGroup (n=$n)")
    // structural half: the gates disagree ONLY inside the threshold gap —
    // every differing row's score lies between the two kept minima
    if (diff.nonEmpty) {
      val minKeptE = Tables.load(spark, TestSpark.sf, "documents")
        .filter(col("doc_id").isin(exact.toSeq: _*))
        .agg(min(col("n_chars").cast("double"))).collect()(0).getDouble(0)
      val lo = math.min(minKeptE, thrA)
      val hi = math.max(minKeptE, thrA)
      val diffScores = docs.filter(col("doc_id").isin(diff.toSeq: _*))
        .select("score").collect().map(_.getDouble(0))
      assert(diffScores.forall(s => s >= lo && s < hi),
        s"a differing row sits outside the threshold gap [$lo, $hi)")
    }
    docs.unpersist()
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("winnowing selects window minima; short docs keep their minimum; empty docs none") {
    val df = docs(
      1L -> "a b c d e f", // 4 grams (k=3), one full window (w=4)
      2L -> "a b c",       // 1 gram < w: keep its minimum anyway
      3L -> "a b")         // 0 grams: no fingerprints
    val out = TextOps.winnowFingerprints(df, "id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[String](2)))).toMap
    val grams1 = Seq("a b c", "b c d", "c d e", "d e f").map(md5hex)
    assert(out(1L) == (4, Seq(grams1.min)))
    assert(out(2L) == (1, Seq(md5hex("a b c"))))
    assert(out(3L) == (0, Seq.empty))
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens forces a shared fingerprint") {
    // k=3, w=4: any common substring of >= 6 tokens contains one full
    // window of grams, whose minimum both documents must select
    val run = "golden shared run of six tokens"
    val df = docs(
      1L -> s"alpha beta $run gamma delta epsilon",
      2L -> s"zeta $run eta theta iota kappa lambda mu")
    val fps = TextOps.winnowFingerprints(df, "id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      s"expected a shared fingerprint, got ${fps(1L)} vs ${fps(2L)}")
  }

  test("in-engine classifier separates classes and generalizes to held-out docs") {
    val pos = Seq.tabulate(20)(i => s"theorem proof lemma corollary axiom derivation v$i")
    val neg = Seq.tabulate(20)(i => s"click here subscribe buy now free offer w$i")
    val rows = (pos.zipWithIndex.map { case (t, i) => Row(i.toLong, t, 1.0) } ++
      neg.zipWithIndex.map { case (t, i) => Row(100L + i, t, 0.0) })
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("id bigint, text string, y double"))
    val w = Curate.trainTextClassifier(df, "id", col("y") === 1.0, "text",
      epochs = 3, rate = 4.0)
    val heldOut = docs(
      500L -> "new theorem with a proof and a lemma",
      501L -> "buy now and subscribe for a free offer")
    val scores = Curate.scoreTextClassifier(heldOut, "id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(500L) > 0.6 && scores(501L) < 0.4,
      s"classifier failed to separate held-out docs: $scores")
    val train = Curate.scoreTextClassifier(
      df.select(col("id"), col("text")), "id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val (pMean, nMean) = (train.filter(_._1 < 100).map(_._2).sum / 20,
      train.filter(_._1 >= 100).map(_._2).sum / 20)
    assert(pMean > nMean + 0.3, s"train separation too weak: $pMean vs $nMean")
  }

  test("char entropy: uniform alphabet = ln(k), repetition scores near zero") {
    val df = docs(
      1L -> "abcd".toSeq.mkString(""), // 4 distinct chars, uniform
      2L -> "aaaaaaaa",                // zero entropy
      3L -> "aabb")                    // ln 2
    val out = TextOps.charEntropy(df, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == (4L, BigDecimal(math.log(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(out(2L) == (8L, 0.0))
    assert(out(3L) == (4L, BigDecimal(math.log(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("per-row minhash signature column is bit-identical to the aggregation form") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog again today",
      2L -> "completely different content about spark query engines",
      3L -> "a b") // < n tokens: empty shingles
    val perRow = df.select(col("id"),
      Dedup.minhashSignatureColumn(col("text"), n = 3, numPerms = 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val agg = Dedup.minhashSignatures(
      Dedup.rawShingles(df, "id", "text", 3), numPerms = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      }
    assert(perRow(1L) == agg(1L) && perRow(2L) == agg(2L))
    assert(perRow(3L).forall(_ == null) && !agg.contains(3L)) // no shingles
  }

  test("winnowing guarantee holds on 40 randomized shared-run cases (one Spark pass)") {
    val rnd = new scala.util.Random(20260814L)
    val k = 3; val w = 4
    // per case: two docs sharing a unique >= w+k-1-token run, embedded in
    // unrelated random prefixes/suffixes of random lengths
    val rows = (0 until 40).flatMap { j =>
      val run = Seq.tabulate(w + k - 1 + rnd.nextInt(4))(i => s"s${j}_$i")
      def noise(tag: String) = Seq.fill(rnd.nextInt(8))(s"${tag}_${rnd.nextInt(50)}")
      Seq(
        Row(j * 2L, (noise(s"a$j") ++ run ++ noise(s"b$j")).mkString(" ")),
        Row(j * 2L + 1, (noise(s"c$j") ++ run ++ noise(s"d$j")).mkString(" ")))
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("id bigint, text string"))
    val fps = TextOps.winnowFingerprints(df, "id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
    for (j <- 0 until 40) {
      val shared = fps(j * 2L) & fps(j * 2L + 1)
      assert(shared.nonEmpty, s"case $j: no shared fingerprint")
    }
  }

  test("winnow candidate pairs surface duplicates, not unrelated docs; boilerplate df-capped") {
    val boiler = "subscribe to our newsletter for more updates daily" // in every doc
    val body = "the quick brown fox jumps over the lazy dog again and again today"
    val df = docs(
      1L -> s"$body $boiler",
      2L -> s"$body $boiler",
      3L -> s"totally different content about columnar engines and shuffles $boiler",
      4L -> s"yet another unrelated page on streaming watermarks and state $boiler")
    // maxDf=2 drops the boilerplate fingerprints (df=4) before the join, so
    // only the true dup pair (sharing body fingerprints with df=2) survives
    val pairs = Dedup.winnowCandidatePairs(df, "id", "text",
      k = 3, w = 4, maxDf = 2, minShared = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"got $pairs")
    assert(pairs((1L, 2L)) == 1.0) // identical docs: full containment
  }

  test("frequent n-grams: totals vs doc frequency separate repetition from boilerplate") {
    val df = docs(
      1L -> "click here to subscribe now",
      2L -> "click here to unsubscribe",
      3L -> "spam spam spam spam spam",
      4L -> "one ordinary sentence")
    val out = TextOps.frequentNgrams(df, "id", "text", n = 3, k = 10, minCount = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("click here to") == (2L, 2L))   // boilerplate: 2 docs, once each
    assert(out("spam spam spam") == (3L, 1L))  // repetition: 1 doc, 3 windows
    assert(!out.contains("one ordinary sentence")) // minCount=2 prunes singletons
  }

  test("sketched frequent n-grams return exactly the exact version's answer") {
    val df = docs(
      1L -> "click here to subscribe now please do it today friend",
      2L -> "click here to unsubscribe whenever you like best regards",
      3L -> "spam spam spam spam spam and then some more spam spam",
      4L -> "one entirely ordinary sentence with no repetition at all")
    // tight sketch (few collisions) and a deliberately sloppy one
    // (eps=0.5 → 4 counters, heavy collisions): both must agree with the
    // exact aggregation — overestimates only widen the verify set
    for (eps <- Seq(1e-3, 0.5)) {
      val exact = TextOps.frequentNgrams(df, "id", "text", n = 3, k = 20)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val sketched = TextOps.frequentNgramsSketched(df, "id", "text", n = 3,
        k = 20, minCount = 2, eps = eps, confidence = 0.9)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(sketched == exact, s"eps=$eps: $sketched != $exact")
    }
  }

  test("winnow containment: an embedded passage is found, unrelated corpus docs are not") {
    val passage = "the forgotten valley lay silent under a blanket of ash"
    val corpus = docs(
      1L -> s"chapter seven began slowly $passage and the march continued east",
      2L -> "a completely unrelated treatise about distributed query planning")
    val queries = docs(10L -> passage)
    val out = Dedup.winnowContainment(corpus, queries, "id", "text",
      k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out.keySet == Set((10L, 1L)), s"got $out")
    assert(out((10L, 1L)) > 0.0 && out((10L, 1L)) <= 1.0)
  }

  test("projection sign matrix is pinned: a refactor cannot silently reshuffle it") {
    // frozen golden of the md5 sign derivation (dIn=8, dOut=2, salt "rp"):
    // the matrix is part of the oracle contract — if this row drifts, every
    // projection persisted in the field silently changes with it
    val h = Similarity.projectionSigns(8, 2, "rp")
      .flatten.map(s => if (s > 0) "+" else "-").mkString
    assert(h == "---+--+-++-+----", s"sign matrix drifted: $h")
  }

  test("random projection matches the sign-matrix arithmetic exactly and scales linearly") {
    val df = spark.createDataFrame(Seq(
      Row(1L, Seq(1.0, 2.0, 3.0)),
      Row(2L, Seq(2.0, 4.0, 6.0)), // 2 × vector 1
      Row(3L, Seq(0.0, 0.0, 0.0))
    ).asJava, StructType.fromDDL("id bigint, v array<double>"))
    val signs = Similarity.projectionSigns(3, 2, "rp")
    val out = Similarity.randomProjection(df, "id", "v", dIn = 3, dOut = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val expect1 = signs.map(row =>
      ((1.0 * row(0) + 2.0 * row(1)) + 3.0 * row(2)) / math.sqrt(2.0))
    assert(out(1L) == expect1, s"got ${out(1L)}, want $expect1")
    // linearity: a scaled vector projects to the scaled projection
    assert(out(2L).zip(out(1L)).forall { case (a, b) => a == 2.0 * b })
    assert(out(3L).forall(_ == 0.0))
    // the matrix really mixes signs (not all +1 / all −1)
    assert(signs.flatten.toSet == Set(1.0, -1.0))
  }

  test("random projection fails fast on a length mismatch; null vectors still project to nulls") {
    val df = spark.createDataFrame(Seq(
      Row(1L, Seq(1.0, 2.0)), // shorter than dIn=3
      Row(2L, null)
    ).asJava, StructType.fromDDL("id bigint, v array<double>"))
    // short vector: element_at past the end would silently null the whole
    // projected dimension — must raise instead
    val e = intercept[Exception] {
      Similarity.randomProjection(df.filter(col("id") === 1L), "id", "v",
        dIn = 3, dOut = 2).collect()
    }
    assert(e.getMessage.contains("differs from dIn=3")
      || e.getCause != null && e.getCause.getMessage.contains("differs from dIn=3"),
      s"unexpected error: ${e.getMessage}")
    // null vector: propagation, not an error
    val out = Similarity.randomProjection(df.filter(col("id") === 2L), "id", "v",
      dIn = 3, dOut = 2).collect()
    assert(out.length == 1 && out(0).getSeq[Any](1).forall(_ == null))
  }

  test("component rounds release superseded checkpoints: storage stays one frame deep") {
    val sc = spark.sparkContext
    val pairs = spark.createDataFrame(Seq(
      Row(1L, 2L), Row(2L, 3L), Row(3L, 4L), Row(10L, 11L)).asJava,
      StructType.fromDDL("d1 bigint, d2 bigint"))
    val members = pairs.select(explode(array(col("d1"), col("d2"))).as("id")).distinct()
    val before = sc.getPersistentRDDs.keySet
    val labels = Dedup.canonicalIds(members, "id", pairs, 20)
    labels.count()
    val added = sc.getPersistentRDDs.keySet -- before
    // Dataset.unpersist is a no-op on checkpointed frames, so the loop must
    // release superseded rounds through the RDD: only the RETURNED labels
    // frame may remain pinned
    assert(added.size <= 1, s"leaked ${added.size} checkpointed frames")
    org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(labels)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "releaseCheckpoint must free the returned frame too")
  }

  test("releaseCheckpoint is root-only: a derived frame never releases a shared checkpoint") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val base = spark.range(100).toDF("id").localCheckpoint(true)
    val derived = base.filter(col("id") % 2 === 0)
      .join(base.select(col("id").as("id2")), col("id") === col("id2"))
    org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(derived)
    // the checkpoint is referenced by `base` (and twice by `derived`'s
    // plan); releasing through a derived frame would truncate-lineage-orphan
    // `base`, so it must be a no-op
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty,
      "derived-frame release must be a no-op")
    assert(derived.count() == 50 && base.count() == 100)
    org.apache.spark.sql.graft.GraftColumnsBridge.releaseCheckpoint(base)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "pure checkpoint frame must release its blocks")
  }

  test("incremental near-dup: landed matches and lower-id batch matches drop; novel and short docs keep") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge at dawn every single morning"
    val landed = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, base)).toDF("id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy of landed 1
      // near-dup of landed 2: verified off-line to agree on 15/16 slots AND
      // collide in 3 of 4 bands, so candidacy is deterministic, not lucky
      (11L, "note " + base),
      (12L, "completely different text about something else ok"),  // novel
      (13L, "completely different text about something else ok"),  // in-batch dup of 12
      (14L, "hi")                                                  // < n tokens: no signature
    ).toDF("id", "text")
    val kept = Dedup.dedupIncrementalNear(incoming, landed, "id", "text",
      n = 3, numPerms = 16, bands = 4, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 14L), s"got $kept")

    // the PRESIGNED path over a stored signature column is bit-identical:
    // same survivors from the narrow (id, sig) probe as from re-shingling
    val stored = landed.select(col("id"),
      Dedup.storedSignatureColumn(col("text"), n = 3, numPerms = 16).as("sig"))
    val keptPre = Dedup.dedupIncrementalNearPresigned(incoming,
      Dedup.signatureFrameFromStored(stored, "id", "sig", numPerms = 16),
      "id", "text", n = 3, numPerms = 16, bands = 4, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(keptPre == kept, s"presigned diverged: $keptPre vs $kept")
  }

  test("near-dup search reports landed matches per query; stored-sig pool path agrees") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge at dawn every single morning"
    val landed = Seq((1L, base),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("id", "text")
    val queries = Seq(
      (10L, "note " + base),                                       // near-dup of 1
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),      // exact copy of 2
      (12L, "completely different words about some other topic")   // no match
    ).toDF("id", "text")
    val out = Dedup.nearDuplicatesOf(queries,
      Dedup.minhashSignatureFrame(landed, "id", "text", 3, 16), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(10L -> 1L, 11L -> 2L), s"got $out")
    assert(out(11L -> 2L) == 1.0, "exact copy estimates 1.0")
    assert(out(10L -> 1L) >= 0.5 && out(10L -> 1L) < 1.0)

    // pool path: same matches through the STORED sig column
    val pool = graft.pool.Pool.create(s,
      java.nio.file.Files.createTempDirectory("ndq").toString)
    graft.streaming.CorpusIngest.ingestBatchNear(
      landed.withColumnRenamed("id", "doc_id"), pool, "doc_id", "text")
    val viaPool = graft.streaming.CorpusIngest.nearDuplicatesInPool(
      queries.withColumnRenamed("id", "doc_id"), pool, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaPool == out, s"pool path diverged: $viaPool vs $out")
  }

  test("stored signature column: null for shingle-less docs, frame round-trip, loud numPerms drift") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "one two three four five"), (2L, "hi"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val stored = df.select(col("id"),
      Dedup.storedSignatureColumn(col("text"), n = 3, numPerms = 16).as("sig"))
    val sigs = stored.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!sigs(1L) && sigs(2L) && sigs(3L),
      "short/null docs must store a null signature")

    // stored frame == recomputed frame, slot for slot
    val fromStored = Dedup.signatureFrameFromStored(stored, "id", "sig", 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val recomputed = Dedup.minhashSignatureFrame(df, "id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(fromStored == recomputed,
      "stored signature frame must be bit-identical to recomputation")

    // probing with the wrong numPerms fails loudly, never silently nulls
    val ex = intercept[Exception] {
      Dedup.signatureFrameFromStored(stored, "id", "sig", 32).collect()
    }
    assert(ex.getMessage != null)
  }

  test("keepBestBy keeps each cluster's best scorer, breaks ties low, passes singletons") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "short", 5L), (2L, "longer text", 11L),   // cluster {1,2}: 2 wins on score
      (3L, "tie a", 7L), (4L, "tie b", 7L),          // cluster {3,4}: tie -> 3 (lowest id)
      (5L, "alone", 5L)                              // singleton: untouched
    ).toDF("id", "text", "sc")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("d1", "d2")
    val kept = Dedup.keepBestBy(df, "id", pairs, col("sc"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 5L), s"got $kept")
    // null scores sort last: 6 (null) loses to 7 (scored)
    val df2 = Seq((6L, null.asInstanceOf[java.lang.Long]), (7L, java.lang.Long.valueOf(1L)))
      .toDF("id", "sc")
    val kept2 = Dedup.keepBestBy(df2, "id", Seq((6L, 7L)).toDF("d1", "d2"), col("sc"))
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(7L), s"got $kept2")
  }

  test("group overlap: identical strata score 1.0, disjoint strata are absent") {
    val rows = Seq(
      Row("crawl_a", "one two three four five"),
      Row("crawl_b", "one two three four five"),        // identical to a
      Row("crawl_c", "six seven eight nine ten"),       // disjoint
      Row("crawl_d", "one two three nine ten eleven"))  // partial overlap with a
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("src string, text string"))
    val out = Dedup.groupOverlap(df, "src", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("crawl_a", "crawl_b")) == 1.0)
    assert(!out.contains(("crawl_a", "crawl_c")) && !out.contains(("crawl_b", "crawl_c")))
    // a: {one two three, two three four, three four five}; d shares exactly
    // "one two three" of its own 4 shingles -> 1 / (3 + 4 - 1)
    assert(out(("crawl_a", "crawl_d")) == 1.0 / 6.0)
  }

  test("repeated-paragraph cut: banner dropped, order kept, all-boilerplate docs come back empty") {
    val banner = "We use cookies\nAccept to continue"
    val df = docs(
      1L -> s"$banner\n\nfirst real paragraph\n\nsecond real paragraph",
      2L -> s"opening thoughts\n\n$banner\n\nclosing thoughts",
      3L -> banner, // all boilerplate
      4L -> "entirely unrelated content")
    val out = Dedup.removeRepeatedParagraphs(df, "id", "text", minCount = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ("first real paragraph\n\nsecond real paragraph", 2L, 1L))
    assert(out(2L) == ("opening thoughts\n\nclosing thoughts", 2L, 1L))
    assert(out(3L) == ("", 0L, 1L))
    assert(out(4L) == ("entirely unrelated content", 1L, 0L))
  }

  test("projected top-k retrieves a planted near-duplicate first") {
    val vecs = (1 to 40).map { i =>
      Row(i.toLong, Seq.tabulate(16)(d => math.sin(i * 17.0 + d).abs + 0.1))
    } :+ Row(100L, Seq.tabulate(16)(d => (math.sin(3 * 17.0 + d).abs + 0.1) * 1.01))
    val df = spark.createDataFrame(vecs.asJava,
      StructType.fromDDL("id bigint, v array<double>"))
    val out = Similarity.projectedTopK(df, df.filter(col("id") === 3),
      "id", "v", dIn = 16, dProj = 4, k = 3, refine = 8)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    // the scaled copy of vector 3 is cosine-identical: exact re-rank puts
    // it at rank 1 regardless of where the coarse stage ranked it
    assert(out(1) == 100L, s"got $out")
  }

  test("length buckets: smallest boundary >= length, overflow to -1, pad waste exact") {
    val df = spark.createDataFrame(
      Seq(Row(1L, 10L), Row(2L, 64L), Row(3L, 65L), Row(4L, 500L)).asJava,
      StructType.fromDDL("id bigint, n bigint"))
    val assigned = Curate.assignLengthBuckets(df, col("n"), Seq(64L, 128L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(assigned == Map(1L -> 64L, 2L -> 64L, 3L -> 128L, 4L -> -1L))
    val stats = Curate.lengthBucketStats(df, col("n"), Seq(64L, 128L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(stats(64L) == (2L, 74L, 10L, 64L, 54L))   // pad: (64-10)+(64-64)
    assert(stats(128L) == (1L, 65L, 65L, 65L, 63L))
    assert(stats(-1L) == (1L, 500L, 500L, 500L, 0L)) // overflow: no padding cost
  }
}
