package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Dedup

/** Incremental near-dup at scale: the claim under test is that probing a
  * GROWING landed corpus with a FIXED-SIZE daily batch costs ~O(batch) +
  * one landed signature scan — never a landed×landed re-pairing. The
  * landed side is the documents table blown up `copies`× with per-copy
  * word salts (disjoint shingles across copies — the DedupScale trick);
  * the incoming batch is a fixed slice of copy 0 (half near-dups of landed
  * docs, half novel salted variants), so drops genuinely happen at every
  * landed size. Prints one JSON line per landed size with wall-clock and
  * landed rows/s.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.IncrementalNearScale 4 16"
  */
object IncrementalNearScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 16)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def salted(copies: Int) = base.crossJoin(spark.range(copies).toDF("c"))
      .select((col("doc_id") + col("c") * 100000000L).as("id"),
        expr("array_join(transform(split(text, ' '), w -> concat(w, '_', CAST(c AS STRING))), ' ')").as("text"))
      .repartition(spark.sparkContext.defaultParallelism)

    // fixed incoming batch: near-dups of copy-0 docs (one appended token —
    // most bands still collide) + novel docs (copy salt no landed copy has)
    val nearIn = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 900000000L).as("id"),
        expr("concat(array_join(transform(split(text, ' '), w -> concat(w, '_0')), ' '), ' extra_0')").as("text"))
    val novelIn = base.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 910000000L).as("id"),
        expr("array_join(transform(split(text, ' '), w -> concat(w, '_x')), ' ')").as("text"))
    val incoming = nearIn.unionByName(novelIn)
      .repartition(spark.sparkContext.defaultParallelism).persist()
    val nIn = incoming.count()

    sizes.foreach { copies =>
      val landed = salted(copies).persist()
      val nLd = landed.count()

      // recompute path: landed signatures re-derived from text per call
      val t0 = System.nanoTime()
      val (kept, release) = Dedup.dedupIncrementalNearManaged(
        incoming, landed, "id", "text")
      val nKept = kept.count()
      val sec = (System.nanoTime() - t0) / 1e9
      release()

      // presigned path: landed signatures read from a STORED narrow table
      // (written once at ingest time — the write cost is charged to the
      // append, not the probe, so it is excluded here by design)
      val sigDir = java.nio.file.Files.createTempDirectory("inc-sig").toString
      landed.select(col("id"),
          Dedup.storedSignatureColumn(col("text")).as("sig"))
        .write.mode("overwrite").parquet(sigDir)
      val storedSig = Dedup.signatureFrameFromStored(
        spark.read.parquet(sigDir), "id", "sig", numPerms = 16)
      val t1 = System.nanoTime()
      val (keptP, releaseP) = Dedup.dedupIncrementalNearPresignedManaged(
        incoming, storedSig, "id", "text")
      val nKeptP = keptP.count()
      val secP = (System.nanoTime() - t1) / 1e9
      releaseP()

      landed.unpersist()
      require(nKeptP == nKept, s"presigned diverged: $nKeptP vs $nKept")
      println(s"""{"landed":$nLd,"incoming":$nIn,"kept":$nKept,"dropped":${nIn - nKept},"recompute_sec":${f"$sec%.2f"},"presigned_sec":${f"$secP%.2f"},"landed_rows_per_sec":${(nLd / sec).toLong},"presigned_landed_rows_per_sec":${(nLd / secP).toLong}}""")
    }
    incoming.unpersist()
    spark.stop()
  }
}
