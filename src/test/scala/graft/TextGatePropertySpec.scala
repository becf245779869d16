package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Randomized cross-check of the incremental NEAR-dup text gate
  * ([[graft.ops.Dedup.dedupIncrementalNear]]) against a brute-force
  * reference that re-derives the whole chain with plain Scala: word
  * 3-gram shingles, md5-string minhash permutations (lexicographic min —
  * ASCII hex, so Scala String ordering equals Spark's UTF8String byte
  * ordering), banded bucket keys, the bipartite landed probe, the
  * within-batch lower-id rule over ALL lower ids (the documented
  * superset-drop form), and the agree/numPerms >= threshold estimate
  * (multiples of 1/16 — exactly representable, so both sides compare the
  * same doubles). Small-vocabulary random docs force shared shingles,
  * exact duplicates, and boundary estimates.
  */
class TextGatePropertySpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val N = 3
  private val Perms = 16
  private val Bands = 4
  private val Threshold = 0.5

  private def shingles(text: String): Seq[String] = {
    val w = text.split(" ", -1).toSeq
    if (w.length >= N) (0 to w.length - N).map(i => w.slice(i, i + N).mkString(" "))
    else Seq.empty
  }

  private def signature(text: String): Option[Seq[String]] = {
    val sh = shingles(text)
    if (sh.isEmpty) None
    else Some((0 until Perms).map(p => sh.map(s => md5hex(s"$p|$s")).min))
  }

  private def bandKeys(sig: Seq[String]): Seq[(Int, String)] = {
    val rows = Perms / Bands
    (0 until Bands).map(b =>
      b -> md5hex(sig.slice(b * rows, (b + 1) * rows).mkString(",")))
  }

  private def est(a: Seq[String], b: Seq[String]): Double =
    a.zip(b).count { case (x, y) => x == y } / Perms.toDouble

  test("dedupIncrementalNear matches a brute-force reference on random corpora") {
    val sch = StructType.fromDDL("id bigint, text string")
    val rnd = new Random(13L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (trial <- 0 until 6) {
      def doc(): String = {
        val len = rnd.nextInt(11) // 0..10 words (sub-n docs have no shingles)
        Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val landedDocs = (0 until 10 + rnd.nextInt(10)).map(i => (i.toLong, doc()))
      // batch: fresh randoms + verbatim copies of landed + near-copies
      // (landed text with one word appended) + within-batch duplicates
      val fresh = (0 until 6).map(i => (1000L + i, doc()))
      val copies = landedDocs.take(2).zipWithIndex.map { case ((_, t), i) => (1100L + i, t) }
      val nears = landedDocs.slice(2, 4).zipWithIndex.map { case ((_, t), i) =>
        (1200L + i, s"$t ${vocab(rnd.nextInt(vocab.length))}") }
      val inBatchDup = fresh.headOption.map { case (_, t) => (1300L, t) }.toSeq
      val batch = fresh ++ copies ++ nears ++ inBatchDup

      // brute-force reference
      val lSig = landedDocs.flatMap { case (id, t) => signature(t).map(s => (id, s)) }
      val bSig = batch.flatMap { case (id, t) => signature(t).map(s => (id, s)) }
      val lBands = lSig.flatMap { case (id, s) => bandKeys(s).map(k => (k, id, s)) }
      val bBands = bSig.flatMap { case (id, s) => bandKeys(s).map(k => (k, id, s)) }
      val dropLanded = (for {
        (bk, bid, bs) <- bBands
        (lk, _, ls) <- lBands
        if bk == lk && est(bs, ls) >= Threshold
      } yield bid).toSet
      val dropBatch = (for {
        (hk, hi, hs) <- bBands
        (lk, lo, ls) <- bBands
        if hk == lk && lo < hi && est(hs, ls) >= Threshold
      } yield hi).toSet
      val expect = batch.map(_._1).toSet -- dropLanded -- dropBatch

      def df(rows: Seq[(Long, String)]) = spark.createDataFrame(
        rows.map { case (i, t) => Row(i, t) }.asJava, sch)
      val got = graft.ops.Dedup.dedupIncrementalNear(
        df(batch), df(landedDocs), "id", "text",
        n = N, numPerms = Perms, bands = Bands, threshold = Threshold)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == expect,
        s"trial $trial\n landed=$landedDocs\n batch=$batch\n " +
          s"dropLanded=$dropLanded dropBatch=$dropBatch")
    }
  }
}
