package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Similarity

/** PQ-at-scale probe, the compression-path sibling of [[SimScale]]: blow the
  * embeddings table up `copies`× with deterministic orthant masks, then time
  * the three PQ stages — joint-Lloyd codebook training on a bounded sample
  * (the training contract at scale), map-only corpus encode (the stage whose
  * throughput bounds a 100 TB compression pass), and ADC top-k over the
  * encoded corpus. Prints one JSON line with rows/s per stage.
  *
  * With a 4th argument K > 0 the probe also runs the full IVF-PQ
  * composition at that coarse-cell count: `kmeansConverged` coarse training
  * on a bounded sample (tol-stopped — the production loop) + `ivfPqTopK`
  * (assign + encode + per-cell ADC), so the LUT-broadcast and
  * codebook-decode costs at production presets (m=16, k=256, K=4096) are
  * measured rather than extrapolated from the suite's small pins.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.PqScale 64"
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PqScale 64 16 256 4096 8"
  */
object PqScale {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(64)
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val k = args.lift(2).map(_.toInt).getOrElse(16)
    val bigK = args.lift(3).map(_.toInt).getOrElse(0)
    val nprobe = args.lift(4).map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val corpus = base.crossJoin(spark.range(copies).toDF("c"))
      .select((col("vec_id") + col("c") * 100000000L).as("vec_id"),
        expr("transform(v, (x, i) -> x * (1 - 2 * ((CAST(c AS INT) >> (i % 20)) & 1)))").as("v"))
      .persist()
    val n = corpus.count() // materialize outside the timings

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // codebook from a bounded sample — the training contract at scale
    val (book, tTrain) = timed {
      Similarity.pqTrain(corpus.limit(4000), "vec_id", "v", m = m, k = k,
        iters = 2).localCheckpoint(true)
    }
    val bookRows = book.count()

    // one encode pass: the timed materialization doubles as the search
    // stage's cached input (timing includes the persist write — the honest
    // cost of producing a reusable codes frame)
    val encoded = Similarity.pqEncode(corpus, book, "vec_id", "v")
      .select("vec_id", "codes").persist()
    val (_, tEncode) = timed { encoded.count() }
    val queries = base.filter(col("vec_id") < 16)
    val (hits, tSearch) = timed {
      Similarity.pqTopK(encoded, queries, book, "vec_id", "v", k = 10).count()
    }
    encoded.unpersist()

    // optional IVF-PQ composition at a production coarse-cell count
    val ivfJson = if (bigK > 0) {
      val ((coarse, rounds), tCoarse) = timed {
        val (c, r) = Similarity.kmeansConverged(
          corpus.limit(math.max(4000, 3 * bigK)), "vec_id", "v",
          k = bigK, maxIters = 5, tol = 1e-3, seedByHash = true)
        (c.localCheckpoint(true), r)
      }
      val (ivfHits, tIvfPq) = timed {
        Similarity.ivfPqTopK(corpus, queries, coarse, book, "vec_id", "v",
          k = 10, nprobe = nprobe).count()
      }
      f""","coarse_k":$bigK,"coarse_rounds":$rounds,"coarse_train_sec":$tCoarse%.2f,"nprobe":$nprobe,"ivfpq_search_sec":$tIvfPq%.2f,"ivfpq_results":$ivfHits"""
    } else ""
    corpus.unpersist()

    println(f"""{"corpus":$n,"m":$m,"k":$k,"book_rows":$bookRows,"train_sec":$tTrain%.2f,"encode_sec":$tEncode%.2f,"encode_rows_per_sec":${(n / tEncode).toLong},"adc_search_sec":$tSearch%.2f,"search_results":$hits$ivfJson}""")
    spark.stop()
  }
}
