package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Similarity

/** Similarity-at-scale probe: blow the embeddings table up `copies`× with
  * deterministic per-copy ±1 orthant masks (directions genuinely differ, no
  * RNG), then time the three stages of the ANN pipeline on the enlarged
  * corpus — in-engine kmeans, map-only IVF cell assignment (native
  * `nearest_centroids` against K broadcast centroids), and two-phase
  * per-query top-k. Prints one JSON line with rows/s per stage.
  *
  * This is the 100×-scale-up rehearsal for the shapes PlanAuditSpec pins:
  * assignment must stay shuffle-free and top-k must stay bounded regardless
  * of corpus size — wall-clock here scales with the scan, not with K or the
  * candidate set.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.SimScale 64"
  */
object SimScale {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(64)
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    // per-copy mask reads bit (i % 20) of the copy index: distinct orthant
    // patterns for up to 2^20 copies (not just 64); the id offset keeps
    // vec_ids collision-free for base tables under 100M rows
    val corpus = base.crossJoin(spark.range(copies).toDF("c"))
      .select((col("vec_id") + col("c") * 100000000L).as("vec_id"),
        expr("transform(v, (x, i) -> x * (1 - 2 * ((CAST(c AS INT) >> (i % 20)) & 1)))").as("v"))
      .persist()
    val n = corpus.count() // materialize outside the timings

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // kmeans over a bounded sample (the centroid-training contract at scale)
    val (cents, tTrain) = timed {
      Similarity.kmeans(corpus.limit(4000), "vec_id", "v", k, iters = 2)
        .localCheckpoint(true)
    }
    val kEff = cents.count()

    val (_, tAssign) = timed {
      Similarity.ivfAssign(corpus, cents.select(col("centroid_id").as("vec_id"),
        col("v")), "vec_id", "v").write.mode("overwrite").format("noop").save()
    }

    val queries = base.filter(col("vec_id") < 16)
    val (topN, tSearch) = timed {
      Similarity.ivfTopK(corpus, queries, cents.select(col("centroid_id").as("vec_id"),
        col("v")), "vec_id", "v", k = 10, nprobe = 2).count()
    }

    println(f"""{"corpus":$n,"k":$kEff,"train_sec":$tTrain%.2f,"assign_sec":$tAssign%.2f,"assign_rows_per_sec":${(n / tAssign).toLong},"search_sec":$tSearch%.2f,"search_results":$topN}""")
    spark.stop()
  }
}
