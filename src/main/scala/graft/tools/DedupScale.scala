package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.{Curate, Dedup}

/** Text-dedup-at-scale probe, the shingle-family counterpart of
  * [[SimScale]]: blow the documents table up `copies`× with per-copy word
  * salts (docs genuinely differ across copies — no free dedup), then time
  * the three production shingle paths on the enlarged corpus: minhash+LSH
  * candidates, signature-estimated near-dup (candidates verified from the
  * signatures alone), and the contamination gate. Prints one JSON line
  * with rows/s per stage.
  *
  * The claims under test are the round-6 plan shapes: the signature phase
  * must stay a single id-keyed partial-agg shuffle (no shingle distinct),
  * and contamination's corpus side must die map-side at the broadcast
  * join — wall-clock must scale with the scan, not with the shingle
  * stream's dedup.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.DedupScale 20"
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // every WORD carries the copy index, so shingle sets are disjoint
    // across copies (a trailing salt would leave copies near-identical and
    // the candidate set would grow with copies², swamping the scan-side
    // signal this probe is after); near-dups inside each copy remain
    val corpus = base.crossJoin(spark.range(copies).toDF("c"))
      .select((col("doc_id") + col("c") * 100000000L).as("id"),
        expr("array_join(transform(split(text, ' '), w -> concat(w, '_', CAST(c AS STRING))), ' ')").as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val n = corpus.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val (nCand, tLsh) = timed {
      Dedup.lshCandidatePairs(corpus, "id", "text").count()
    }
    val (nEst, tEst) = timed {
      Dedup.minhashEstimatePairs(corpus, "id", "text").count()
    }
    // eval set = copy 0's salted docs, so corpus overlap actually exists
    val evalSet = corpus.filter(col("id") < 100000000L && col("id") % 13 === 0)
    val (nCont, tCont) = timed {
      Curate.contamination(corpus, evalSet, "id", "text", n = 3, minOverlap = 5).count()
    }

    def rps(t: Double): Long = (n / t).toLong
    println(
      s"""{"docs":$n,"copies":$copies,"lsh_candidates":$nCand,"lsh_sec":${f"$tLsh%.2f"},"lsh_rows_per_sec":${rps(tLsh)},"est_pairs":$nEst,"est_sec":${f"$tEst%.2f"},"est_rows_per_sec":${rps(tEst)},"contaminated":$nCont,"cont_sec":${f"$tCont%.2f"},"cont_rows_per_sec":${rps(tCont)}}""")
    spark.stop()
  }
}
