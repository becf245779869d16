package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Product quantization: codebook training, encode, ADC search, IVF-PQ. */
class PqSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def vecs(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava,
      StructType.fromDDL("id bigint, v array<double>"))

  /** Seed-only codebook (iters=0): sub-slices of the k lowest-id rows,
    * dense cids in id order — fully hand-checkable.
    */
  private def seedBook(corpus: org.apache.spark.sql.DataFrame, m: Int, k: Int) =
    Similarity.pqTrain(corpus, "id", "v", m = m, k = k, iters = 0)

  test("pq encode: per-subspace L2 argmin against a hand-built codebook, ties to lowest cid") {
    val corpus = vecs(
      0L -> Seq(0.0, 0.0, 10.0, 10.0), // seed → sub0 cid0 = (0,0), sub1 cid0 = (10,10)
      1L -> Seq(5.0, 5.0, 0.0, 0.0),   // seed → sub0 cid1 = (5,5),  sub1 cid1 = (0,0)
      2L -> Seq(4.0, 4.0, 1.0, 1.0),   // sub0: 32 vs 2 → 1; sub1: 162 vs 2 → 1
      3L -> Seq(1.0, 0.0, 9.0, 9.0))   // sub0: 1 vs 41 → 0; sub1: 2 vs 162 → 0
    val book = seedBook(corpus, m = 2, k = 2)
    val codes = Similarity.pqEncode(corpus, book, "id", "v")
      .select(col("id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(1, 1))
    assert(codes(2L) == Seq(1, 1))
    assert(codes(3L) == Seq(0, 0))

    // exact tie: (2.5, 2.5) is equidistant from (0,0) and (5,5) → cid 0
    val tie = Similarity.pqEncode(
      vecs(9L -> Seq(2.5, 2.5, 0.0, 0.0)), book, "id", "v")
      .select("codes").collect()(0).getSeq[Int](0)
    assert(tie.head == 0, s"tie must keep the lowest cid, got $tie")
  }

  test("pq encode: length-mismatched vectors yield null codes, not wrong ones") {
    val corpus = vecs(0L -> Seq(0.0, 0.0, 0.0, 0.0), 1L -> Seq(1.0, 1.0, 1.0, 1.0))
    val book = seedBook(corpus, m = 2, k = 2)
    val out = Similarity.pqEncode(vecs(7L -> Seq(1.0, 2.0)), book, "id", "v")
      .select("codes").collect()(0)
    assert(out.isNullAt(0), "mismatched vector length must encode as null")
  }

  test("pq train: one Lloyd round moves each centroid to the mean of its assigned subvectors") {
    val corpus = vecs(
      0L -> Seq(0.0, 0.0, 8.0, 8.0),
      1L -> Seq(10.0, 10.0, 0.0, 0.0),
      2L -> Seq(1.0, 1.0, 9.0, 7.0),   // sub0 → cid0 cluster, sub1 → cid0 cluster
      3L -> Seq(9.0, 11.0, 1.0, -1.0)) // sub0 → cid1 cluster, sub1 → cid1 cluster
    val book = Similarity.pqTrain(corpus, "id", "v", m = 2, k = 2, iters = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    // sub0: cid0 ← mean{(0,0),(1,1)} = (0.5,0.5); cid1 ← mean{(10,10),(9,11)} = (9.5,10.5)
    assert(book((0, 0)) == Seq(0.5, 0.5) && book((0, 1)) == Seq(9.5, 10.5))
    // sub1: cid0 ← mean{(8,8),(9,7)} = (8.5,7.5); cid1 ← mean{(0,0),(1,-1)} = (0.5,-0.5)
    assert(book((1, 0)) == Seq(8.5, 7.5) && book((1, 1)) == Seq(0.5, -0.5))
  }

  test("pq reconstruct: codes decode to concatenated subspace centroids; seeds round-trip") {
    val corpus = vecs(
      0L -> Seq(0.0, 1.0, 2.0, 3.0),
      1L -> Seq(9.0, 8.0, 7.0, 6.0),
      2L -> Seq(0.1, 1.1, 6.9, 6.1))
    val book = seedBook(corpus, m = 2, k = 2)
    val enc = Similarity.pqEncode(corpus, book, "id", "v")
    val rec = Similarity.pqReconstruct(enc, book, "id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // seed vectors reconstruct exactly (their own codes)
    assert(rec(0L) == Seq(0.0, 1.0, 2.0, 3.0))
    assert(rec(1L) == Seq(9.0, 8.0, 7.0, 6.0))
    // doc2 snaps to (seed0 sub0, seed1 sub1)
    assert(rec(2L) == Seq(0.0, 1.0, 7.0, 6.0))
  }

  test("pq ADC ranking equals cosine-vs-reconstruction ranking (the ADC identity)") {
    // 40 corpus vectors in 4 loose clusters, dim 8, m=4/k=4
    val corpus = vecs((0 until 40).map { i =>
      val c = i % 4
      i.toLong -> (0 until 8).map(j =>
        math.cos(c * 1.7 + j) * 5 + math.sin(i * 0.9 + j) * 0.4)
    }: _*)
    val queries = corpus.filter(col("id") < 4)
    val book = Similarity.pqTrain(corpus, "id", "v", m = 4, k = 4, iters = 2)
    val enc = Similarity.pqEncode(corpus, book, "id", "v")
    val got = Similarity.pqTopK(enc, queries, book, "id", "v", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    // independent expectation: cosine(q, reconstruct(x)) ranked per query
    val rec = Similarity.pqReconstruct(enc, book, "id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qv = queries.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((qid, q) <- qv) {
      val expect = rec.keys.filter(_ != qid).toSeq
        .map(n => (n, cos(q, rec(n))))
        .sortBy { case (n, c) => (-c, n) }.take(5).map(_._1)
      val gotRanks = (1 to 5).map(r => got((qid, r)))
      assert(gotRanks == expect, s"query $qid: ADC ranks $gotRanks vs expected $expect")
    }
  }

  test("pq top-k meta: neighbor metadata rides the payload struct, ranks unchanged") {
    val corpus = vecs((0 until 30).map(i =>
      i.toLong -> (0 until 8).map(j => math.cos((i % 3) * 2.0 + j) * 3 + i * 0.01)): _*)
      .withColumn("label", (col("id") % 3).cast("int"))
    val book = Similarity.pqTrain(corpus, "id", "v", m = 4, k = 4, iters = 1)
    val enc = Similarity.pqEncode(corpus, book, "id", "v")
    val queries = corpus.filter(col("id") < 2)
    val bare = Similarity.pqTopK(enc, queries, book, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val meta = Similarity.pqTopKMeta(enc, queries, book, "id", "v", k = 3,
      metaCols = Seq("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getInt(4)))).toMap
    assert(meta.keySet == bare.keySet)
    for ((k, nid) <- bare) {
      val (mid, lbl) = meta(k)
      assert(mid == nid, s"$k: meta neighbor $mid vs bare $nid")
      assert(lbl == (nid % 3).toInt, s"$k: label $lbl for neighbor $nid")
    }
  }

  test("ivf-pq: probed-cell ADC search finds same-cell neighbors, never self, nprobe expands") {
    val corpus = vecs((0 until 60).map { i =>
      val c = i % 3
      i.toLong -> (0 until 8).map(j =>
        math.cos(c * 2.1 + j) * 4 + math.sin(i * 1.3 + j) * 0.3)
    }: _*)
    val cents = Similarity.kmeans(corpus, "id", "v", k = 3, iters = 2)
      .select(col("centroid_id").as("id"), col("v"))
    val book = Similarity.pqTrain(corpus, "id", "v", m = 4, k = 8, iters = 2)
    val queries = corpus.filter(col("id") < 3)
    val r1 = Similarity.ivfPqTopK(corpus, queries, cents, book, "id", "v", k = 4)
      .collect()
    assert(r1.nonEmpty)
    assert(!r1.exists(r => r.getLong(0) == r.getLong(2)), "self-matches must be excluded")
    // nprobe=2 can only add candidates: every nprobe=1 neighbor set is a
    // subset of the nprobe=2 candidate pool's top-k frontier in count terms
    val r2 = Similarity.ivfPqTopK(corpus, queries, cents, book, "id", "v", k = 4, nprobe = 2)
      .collect()
    assert(r2.length >= r1.length)
  }

  test("pq quality on real embeddings: planted near-dups retrieved, recall floor vs brute force") {
    import org.apache.spark.sql.functions.transform
    val base = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // plant exact scaled duplicates (cosine 1.0) — the retrieval case PQ
    // must never miss
    val dups = base.filter(col("id") % 50 === 0)
      .select((col("id") + 100000).as("id"),
        transform(col("v"), x => x * 1.01).as("v"))
    val corpus = base.unionByName(dups)
    val book = Similarity.pqTrain(corpus, "id", "v", m = 16, k = 64, iters = 3)
    val enc = Similarity.pqEncode(corpus, book, "id", "v")
    val originals = base.filter(col("id") % 50 === 0)
    val top = Similarity.pqTopK(enc, originals, book, "id", "v", k = 3)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    for ((qid, neighbors) <- top)
      assert(neighbors.contains(qid + 100000),
        s"query $qid: ADC top-3 $neighbors misses its planted duplicate")

    // recall floor vs exact brute force on the UNSALTED corpus: these
    // embeddings are random (no cluster structure — PQ's adversarial
    // case); m=16/k=64 measures mean recall@10 ≈ 0.65 deterministically,
    // pinned here with slack. Real clustered embeddings recall far higher.
    val queries = base.filter(col("id") < 20)
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = sets(Similarity.bruteForceTopK(base, queries, "id", "v", k = 10))
    val bookU = Similarity.pqTrain(base, "id", "v", m = 16, k = 64, iters = 3)
    val pq = sets(Similarity.pqTopK(
      Similarity.pqEncode(base, bookU, "id", "v"), queries, bookU, "id", "v", k = 10))
    val recall = brute.keys.toSeq
      .map(q => pq.getOrElse(q, Set.empty).intersect(brute(q)).size / 10.0)
    val mean = recall.sum / recall.size
    assert(mean >= 0.55, f"mean recall@10 $mean%.3f below the 0.55 floor")
  }

  test("pq encode plan is map-only: zero exchanges touch corpus rows") {
    val corpus = vecs((0 until 64).map(i =>
      i.toLong -> (0 until 8).map(j => math.cos(i * 0.3 + j))): _*)
    val book = seedBook(corpus, m = 4, k = 4)
    val df = Similarity.pqEncode(corpus, book, "id", "v")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    for (shuffle <- Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition"))
      assert(!plan.contains(shuffle), s"expected shuffle-free encode plan:\n$plan")
    assert(!plan.contains("Window"), s"expected window-free encode plan:\n$plan")
  }

  test("pq ADC top-k aggregates partially below the query_id exchange (two-phase)") {
    val corpus = vecs((0 until 64).map(i =>
      i.toLong -> (0 until 8).map(j => math.cos(i * 0.3 + j))): _*)
    val book = seedBook(corpus, m = 4, k = 4)
    val enc = Similarity.pqEncode(corpus, book, "id", "v")
    val df = Similarity.pqTopK(enc, corpus.filter(col("id") < 3), book, "id", "v", k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"expected window-free ranking plan:\n$plan")
    val partialIdx = plan.indexOf("partial_top_k_by_score")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(query_id")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"expected partial top-k BELOW the query_id exchange in:\n$plan")
  }

  test("pq train with iters=0 still rejects a ragged corpus") {
    val corpus = vecs(
      0L -> Seq(0.0, 0.0, 1.0, 1.0),
      1L -> Seq(2.0, 2.0, 3.0, 3.0),
      2L -> Seq(5.0, 5.0)) // divisible by m=2 but shorter than the corpus dim
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTrain(corpus, "id", "v", m = 2, k = 2, iters = 0)
    }
    assert(e.getMessage.contains("vector length differs"), e.getMessage)
  }

  test("pq ADC search rejects a codebook with unequal subspace lengths") {
    // hand-built book: sub0 centroids are length 2, sub1 length 4 (total 6)
    // — passes a total-length check but would mis-slice every query
    val book = spark.createDataFrame(Seq(
      Row(0, 0, Seq(0.0, 0.0)), Row(0, 1, Seq(1.0, 1.0)),
      Row(1, 0, Seq(0.0, 0.0, 0.0, 0.0)), Row(1, 1, Seq(1.0, 1.0, 1.0, 1.0))
    ).asJava, StructType.fromDDL(
      "sub int, centroid_id int, v array<double>"))
    val six = vecs(0L -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      1L -> Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    val enc = Similarity.pqEncode(six, book, "id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(enc, six, book, "id", "v", k = 1)
    }
    assert(e.getMessage.contains("subspace lengths differ"), e.getMessage)
  }
}
