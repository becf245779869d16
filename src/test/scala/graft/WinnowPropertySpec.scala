package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Property fuzz for the winnowing fingerprint selection
  * (TextOps.winnowFingerprints, MOSS SIGMOD 2003): the LOCAL guarantee the
  * whole decontamination/near-dup family leans on — ANY shared token run of
  * length >= w + k − 1 forces at least one shared fingerprint — must hold
  * for arbitrary surroundings, run placement, and vocabulary collisions,
  * not just the fixture cases in TextOpsSpec. Generated pairs plant a
  * shared run at a random offset of each document; the property is exact
  * math, so random seeds cannot flake unless the implementation is wrong.
  */
class WinnowPropertySpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  // PINNED seed: the properties are exact, so any failure is a real bug —
  // and with a fixed seed it replays deterministically run after run
  // (unseeded Gen.sample drew a fresh seed per run, so a red run could
  // never be reproduced, and sample's Option could abort spuriously).
  // Bump the seed deliberately to explore a different case set.
  private def draw[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val k = 3
  private val w = 4

  // ~50-token vocab: small enough that accidental extra overlaps are
  // common (stressing distinct/min selection), large enough that the
  // planted run is usually the only GUARANTEED overlap
  private val tok: Gen[String] = Gen.choose(0, 49).map(i => s"t$i")

  private case class Planted(prefixA: List[String], suffixA: List[String],
      prefixB: List[String], suffixB: List[String], run: List[String])

  private def caseGenFrom(minRun: Int): Gen[Planted] = for {
    nr <- Gen.choose(minRun, w + k + 5)
    run <- Gen.listOfN(nr, tok)
    pa <- Gen.choose(0, 12).flatMap(Gen.listOfN(_, tok))
    sa <- Gen.choose(0, 12).flatMap(Gen.listOfN(_, tok))
    pb <- Gen.choose(0, 12).flatMap(Gen.listOfN(_, tok))
    sb <- Gen.choose(0, 12).flatMap(Gen.listOfN(_, tok))
  } yield Planted(pa, sa, pb, sb, run)

  // the guarantee's threshold and up
  private val caseGen: Gen[Planted] = caseGenFrom(w + k - 1)

  test("any shared run of >= w+k-1 tokens forces a shared fingerprint; per-doc invariants hold") {
    val cases = draw(Gen.listOfN(80, caseGen), seed = 11L)
    val rows = cases.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        Row(2L * i, (c.prefixA ++ c.run ++ c.suffixA).mkString(" ")),
        Row(2L * i + 1, (c.prefixB ++ c.run ++ c.suffixB).mkString(" ")))
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("id bigint, text string"))
    val got = graft.ops.TextOps.winnowFingerprints(df, "id", "text", k, w)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Number](1).longValue, r.getSeq[String](2).toSet))
      .toMap
    cases.zipWithIndex.foreach { case (c, i) =>
      val (na, fpsA) = got(2L * i)
      val (nb, fpsB) = got(2L * i + 1)
      // the winnowing guarantee: the planted run is >= w+k-1 tokens, so at
      // least one full window of w k-grams lies inside it in BOTH docs and
      // its minimum hash is selected in both
      assert((fpsA intersect fpsB).nonEmpty,
        s"case $i: no shared fingerprint despite a ${c.run.length}-token " +
          s"shared run (A=${c.prefixA.length}+run+${c.suffixA.length}, " +
          s"B=${c.prefixB.length}+run+${c.suffixB.length})")
      // per-doc invariants: gram count is tokens-k+1; fingerprints are
      // distinct, non-empty for any doc with >= 1 gram, and never more
      // numerous than the window count max(n_grams - w + 1, 1)
      val tokensA = c.prefixA.length + c.run.length + c.suffixA.length
      assert(na == tokensA - k + 1, s"case $i: n_grams $na != ${tokensA - k + 1}")
      assert(fpsA.nonEmpty && fpsA.size <= math.max(na - w + 1, 1).toInt,
        s"case $i: ${fpsA.size} fingerprints from $na grams")
      assert(nb == c.prefixB.length + c.run.length + c.suffixB.length - k + 1)
    }
  }

  test("winnow candidate pairs surface every planted high-overlap pair (guarantee end-to-end)") {
    // minShared = 1: the winnowing guarantee promises AT LEAST ONE shared
    // fingerprint — even a 2-window run may select the same minimum twice,
    // so the production default of 2 cannot be asserted for arbitrary runs
    // and is exercised by the oracle queries instead. maxDf high enough
    // that the small vocab's hot fingerprints are not dropped.
    val cases = draw(Gen.listOfN(30, caseGenFrom(w + k + 1)), seed = 12L)
    val rows = cases.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        Row(2L * i, (c.prefixA ++ c.run ++ c.suffixA).mkString(" ")),
        Row(2L * i + 1, (c.prefixB ++ c.run ++ c.suffixB).mkString(" ")))
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType.fromDDL("id bigint, text string"))
    val pairs = graft.ops.Dedup.winnowCandidatePairs(df, "id", "text",
      k, w, maxDf = 1000, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cases.indices.foreach { i =>
      assert(pairs.contains((2L * i, 2L * i + 1)),
        s"case $i: planted pair missing from candidates")
    }
  }
}
