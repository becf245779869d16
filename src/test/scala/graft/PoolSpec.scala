package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.pool.{Envelope, Pool}

class PoolSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def envelopes() = {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    Envelope.wrap(ev, col("event_type"), col("event_id"),
      struct(col("user_id")).as("key"), Seq("event_id", "user_id", "value"))
  }

  test("append + read round-trips all rows") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val env = envelopes()
    p.append(env)
    assert(p.read().count() == env.count())
  }

  test("compact folds all segments into one, preserving contents and resume state") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") % 3 === 0))
    p.append(env.filter(col("kafka.offset") % 3 === 1))
    p.append(env.filter(col("kafka.offset") % 3 === 2))
    val before = p.read().select("kafka.topic", "kafka.offset").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val offsets = p.maxOffsetsByTopic().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p.compact() == 3)
    assert(p.committedSegments().length == 1)
    val after = p.read().select("kafka.topic", "kafka.offset").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before)
    assert(p.maxOffsetsByTopic().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == offsets)
    assert(p.compact() == 0) // single segment: nothing to do
    env.unpersist()
  }

  test("compactSegmentsWith folds only the listed segments, leaving the rest untouched") {
    val dir = Files.createTempDirectory("pool")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") % 3 === 0))
    p.append(env.filter(col("kafka.offset") % 3 === 1))
    p.append(env.filter(col("kafka.offset") % 3 === 2))
    val Seq(s0, s1, s2) = p.committedSegments()
    val rows01 = p.segmentRows(s0) + p.segmentRows(s1)
    def files(seg: String) = {
      val ls = Files.list(dir.resolve(seg))
      try ls.iterator().asScala
        .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f)).toMap
      finally ls.close()
    }
    val untouched = files(s2)
    assert(p.compactSegmentsWith(Seq(s0, s1)) == 2)
    val segs = p.committedSegments()
    assert(segs.length == 2 && segs.contains(s2))
    val folded = segs.filter(_.startsWith("compact-")).head
    assert(p.segmentRows(folded) == rows01, "footer rows survive the fold")
    assert(files(s2) == untouched, "unlisted segments keep their files byte-identical")
    assert(p.read().count() == env.count())
    intercept[IllegalArgumentException](p.compactSegmentsWith(Seq("seg-bogus")))
    env.unpersist()
  }

  test("vacuum removes unreferenced segment dirs, keeps committed ones") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") % 2 === 0))
    p.append(env.filter(col("kafka.offset") % 2 === 1))
    val n = env.count()
    assert(p.compact() == 2)
    assert(p.vacuum() == 2) // the two pre-compaction segments
    assert(p.vacuum() == 0)
    assert(p.read().count() == n)
    env.unpersist()
  }

  test("deleteWhere removes only matching rows and never rewrites clean segments") {
    val dir = Files.createTempDirectory("pool")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val total = env.count()
    val segsBefore = p.committedSegments()
    def files(seg: String) = {
      val ls = Files.list(dir.resolve(seg))
      try ls.iterator().asScala
        .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f)).toMap
      finally ls.close()
    }
    val cleanSegFiles = files(segsBefore(1)) // only segment 1 holds matches
    val pred = col("kafka.offset") < 600 && col("value.user_id") % 5 === 0
    val expected = env.filter(
      col("kafka.offset") < 600 && col("value.user_id") % 5 === 0).count()
    assert(expected > 0)
    assert(p.deleteWhere(pred) == expected)
    assert(p.read().count() == total - expected)
    assert(p.read().filter(pred).count() == 0)
    val segsAfter = p.committedSegments()
    assert(segsAfter.contains(segsBefore(1)), "clean segment stays committed")
    assert(!segsAfter.contains(segsBefore(0)), "affected segment is replaced")
    assert(segsAfter.exists(_.startsWith("delete-")))
    assert(files(segsBefore(1)) == cleanSegFiles,
      "a segment without matches must keep its files byte-identical")
    // zero-match delete is a no-op: same manifest, nothing rewritten
    assert(p.deleteWhere(col("kafka.offset") === -99L) == 0L)
    assert(p.committedSegments() == segsAfter)
    // old segment dir is vacuum's business, not deleteWhere's
    assert(Files.exists(dir.resolve(segsBefore(0))))
    assert(p.vacuum() >= 1)
    assert(!Files.exists(dir.resolve(segsBefore(0))))
    assert(p.read().count() == total - expected)
    env.unpersist()
  }

  test("deleteWhere keeps rows where the predicate is null (SQL DELETE semantics)") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val env = envelopes()
      .withColumn("flag", when(col("kafka.offset") % 2 === 0, lit(1)))
      .persist()
    p.append(env)
    val evens = env.filter(col("kafka.offset") % 2 === 0).count()
    val odds = env.count() - evens
    // flag is 1 on evens, NULL on odds: `flag = 1` is null on odds → kept
    assert(p.deleteWhere(col("flag") === 1) == evens)
    assert(p.read().count() == odds)
    env.unpersist()
  }

  test("deleteWhere drops a segment whose rows are all deleted") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 100))
    p.append(env.filter(col("kafka.offset") >= 100))
    val low = env.filter(col("kafka.offset") < 100).count()
    assert(p.deleteWhere(col("kafka.offset") < 100) == low)
    val segs = p.committedSegments()
    assert(segs.length == 1 && !segs.head.startsWith("delete-"),
      "a fully-deleted segment vanishes instead of leaving an empty rewrite")
    assert(p.read().count() == env.count() - low)
    env.unpersist()
  }

  test("deleteWhere(purge=true): no snapshot and no on-disk file retains a deleted row") {
    val dir = Files.createTempDirectory("pool")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val pred = col("value.user_id") % 5 === 0
    val vPre = p.version()
    assert(p.readAt(vPre).filter(pred).count() > 0,
      "the pre-delete snapshot must be able to see the rows (or the purge proves nothing)")
    val expected = env.filter(pred).count()
    val total = env.count()
    assert(p.deleteWhere(pred, purge = true) == expected)
    assert(p.read().count() == total - expected)
    assert(p.read().filter(pred).count() == 0)
    // TIME TRAVEL across the delete is forfeited (that is the point):
    // the pre-delete snapshots are pruned, and every surviving snapshot
    // is clean of the deleted rows
    intercept[IllegalArgumentException](p.readAt(vPre))
    assert(p.versions().nonEmpty, "the post-delete state is still snapshotted")
    p.versions().foreach { v =>
      assert(p.readAt(v).filter(pred).count() == 0, s"snapshot v$v retains deleted rows")
    }
    // and NO parquet file anywhere under the pool root — committed or
    // not — still holds a bit-identical copy of the deleted content
    val dirs = {
      val ls = Files.list(dir)
      try ls.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).filter(_ != Pool.VersionsDir).toSeq
      finally ls.close()
    }
    dirs.foreach { s =>
      assert(spark.read.parquet(dir.resolve(s).toString).filter(pred).count() == 0,
        s"on-disk dir $s retains deleted rows after purge")
    }
    // non-matching rows and resume state survive the purge untouched
    assert(p.read().count() == total - expected)
    assert(p.nextOffset("purchase") > 0)
    env.unpersist()
  }

  test("deleteWhere rewrites provenance eras separately, keeping footer schemas") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val env = envelopes().persist()
    // era 1: legacy shape; era 2: carries a stored top-level fp column
    p.append(env.filter(col("kafka.offset") < 500))
    p.append(env.filter(col("kafka.offset") >= 500)
      .withColumn("fp", md5(col("value.user_id").cast("string"))))
    val hits = env.filter(col("value.user_id") % 3 === 0).count()
    assert(p.deleteWhere(col("value.user_id") % 3 === 0) == hits)
    // both eras had matches → both rewritten, each keeping its own shape
    val (withFp, without) = p.readPartitionedBySchema(_.fieldNames.contains("fp"))
    assert(withFp.isDefined && without.isDefined,
      "era routing must survive the rewrite — eras are never merged")
    assert(!without.get.columns.contains("fp"),
      "the legacy era's rewritten footer must not grow a null fp column")
    assert(withFp.get.filter(col("fp").isNull).count() == 0)
    assert(p.read().count() == env.count() - hits)
    // a predicate on the era-specific column: null on the legacy era by
    // extension, so `fp IS NULL` deletes exactly the legacy rows
    val legacyLeft = without.get.count()
    assert(p.deleteWhere(col("fp").isNull) == legacyLeft)
    val (w2, wo2) = p.readPartitionedBySchema(_.fieldNames.contains("fp"))
    assert(wo2.isEmpty, "legacy era fully deleted")
    assert(w2.get.count() == env.count() - hits - legacyLeft)
    env.unpersist()
  }

  test("purge across provenance eras: era schemas survive, originals leave the disk") {
    val dir = Files.createTempDirectory("pool-purge-era")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    // era 1: legacy shape; era 2: stored top-level fp (the mixed-pool case)
    p.append(env.filter(col("kafka.offset") < 500))
    p.append(env.filter(col("kafka.offset") >= 500)
      .withColumn("fp", md5(col("value.user_id").cast("string"))))
    val pred = col("value.user_id") % 3 === 0
    val hits = env.filter(pred).count()
    assert(p.deleteWhere(pred, purge = true) == hits)
    // era routing survives the purge rewrite, exactly as in audit mode
    val (withFp, without) = p.readPartitionedBySchema(_.fieldNames.contains("fp"))
    assert(withFp.isDefined && without.isDefined)
    assert(!without.get.columns.contains("fp"))
    assert(p.read().count() == env.count() - hits)
    // and the disk holds ONLY the rewrites: every dir clean of the purged rows
    val dirs = {
      val ls = Files.list(dir)
      try ls.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).filter(_ != Pool.VersionsDir).toSeq
      finally ls.close()
    }
    dirs.foreach { s =>
      assert(spark.read.parquet(dir.resolve(s).toString).filter(pred).count() == 0,
        s"on-disk dir $s retains purged rows")
    }
    p.versions().foreach(v => assert(p.readAt(v).filter(pred).count() == 0))
    env.unpersist()
  }

  test("deleteWhere equals a NOT-filter of the source across randomized predicates") {
    val rnd = new scala.util.Random(20260814L) // pinned seed, replayable
    val env = envelopes().persist()
    val maxOff = env.agg(max(col("kafka.offset"))).collect()(0).getLong(0)
    (1 to 4).foreach { _ =>
      val p = Pool.create(spark, Files.createTempDirectory("pool-rand").toString)
      // random segmentation: 1-4 segments split by offset mod
      val k = 1 + rnd.nextInt(4)
      (0 until k).foreach(i => p.append(env.filter(col("kafka.offset") % k === i)))
      // random predicate: offset range ∧/∨ user mod ∨ value threshold
      val lo = rnd.nextLong(maxOff + 1)
      val m = 2 + rnd.nextInt(7)
      val cut = rnd.nextDouble() * 100
      val pred = (col("kafka.offset") >= lo && col("value.user_id") % m === 0) ||
        col("value.value") < cut
      val expectKeep = env.filter(!pred).count()
      val expectDel = env.count() - expectKeep
      assert(p.deleteWhere(pred) == expectDel)
      assert(p.read().count() == expectKeep)
      assert(p.read().filter(pred).count() == 0)
    }
    env.unpersist()
  }

  test("snapshot versions time-travel across appends, deletes, and compaction") {
    val p = Pool.create(spark, Files.createTempDirectory("pool-tt").toString)
    val env = envelopes().persist()
    val evens = env.filter(col("kafka.offset") % 2 === 0)
    p.append(evens)
    val v1 = p.version()
    p.append(env.filter(col("kafka.offset") % 2 === 1))
    val v2 = p.version()
    p.deleteWhere(col("value.user_id") % 3 === 0)
    val v3 = p.version()
    assert(Seq(v1, v2, v3) == Seq(1L, 2L, 3L))
    // a training run pinned at v1/v2 still sees its exact corpus
    assert(p.readAt(v1).count() == evens.count())
    assert(p.readAt(v2).count() == env.count())
    assert(p.readAt(v3).count() == p.read().count())
    // value columns travel too, not just counts
    assert(p.readAt(v2).filter(col("value.user_id") % 3 === 0).count() > 0)
    p.compact()
    val v4 = p.version()
    assert(p.readAt(v2).count() == env.count(),
      "pre-compaction snapshots stay readable until vacuum")
    // vacuum reclaims old segment dirs AND prunes the versions it broke
    assert(p.vacuum() >= 1)
    assert(p.versions() == Seq(v4),
      s"only the current-manifest version survives vacuum: ${p.versions()}")
    val ex = intercept[IllegalArgumentException](p.readAt(v2))
    assert(ex.getMessage.contains("vacuumed"))
    assert(p.readAt(v4).count() == p.read().count())
    env.unpersist()
  }

  test("version numbers are never reused, even after history is fully pruned") {
    val dir = Files.createTempDirectory("pool-vc")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 300))  // v1
    p.append(env.filter(col("kafka.offset") >= 300)) // v2
    assert(p.version() == 2)
    // simulate the crash-then-vacuum worst case: every snapshot gone
    p.versions().foreach(v =>
      Files.delete(dir.resolve(Pool.VersionsDir).resolve(f"v$v%012d")))
    assert(p.versions().isEmpty)
    // the NEXT counter spent 1 and 2 forever — the next commit must NOT
    // restart numbering, or a consumer's pinned "v2" would later resolve
    // to an unrelated corpus state
    assert(p.compact() == 2) // v3
    assert(p.versions() == Seq(3L), s"got ${p.versions()}")
    intercept[IllegalArgumentException](p.readAt(2))
    // a numbering gap (crash between the counter and snapshot moves —
    // the counter is spent FIRST) is tolerated: numbering just jumps.
    // Edited through the Hadoop FS (how an operator on any store would) —
    // the local FS is checksummed, so a raw byte write would corrupt the
    // sidecar and the pool would rightly refuse the counter
    val counter = new org.apache.hadoop.fs.Path(
      dir.resolve(Pool.VersionsDir).resolve(Pool.VersionCounterFile).toString)
    val hfs = counter.getFileSystem(spark.sessionState.newHadoopConf())
    val out = hfs.create(counter, true)
    out.write("10".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    p.append(env.filter(col("kafka.offset") < 100))
    assert(p.version() == 10L, s"got ${p.version()}")
    env.unpersist()
  }

  test("randomized lifecycle: every surviving snapshot reads its exact recorded state") {
    val rnd = new scala.util.Random(20260815L) // pinned seed, replayable
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val single = Envelope.wrap(ev, lit("corpus"), col("event_id"),
      struct(col("user_id")).as("key"), Seq("event_id", "user_id")).persist()
    val userOf = ev.select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allOffsets = userOf.keySet
    val p = Pool.create(spark, Files.createTempDirectory("pool-life").toString)

    var current = Set.empty[Long] // model: offsets present in the pool
    var nextLo = 0L               // appends take disjoint offset ranges
    val recorded = scala.collection.mutable.Map.empty[Long, Set[Long]]
    (1 to 10).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 => // append the next random-width disjoint offset range
          val hi = nextLo + 50 + rnd.nextInt(200)
          val slice = allOffsets.filter(o => o >= nextLo && o < hi)
          if (slice.nonEmpty) {
            p.append(single.filter(
              col("kafka.offset") >= nextLo && col("kafka.offset") < hi))
            current ++= slice
          }
          nextLo = hi
        case 1 if current.nonEmpty => // delete by a random predicate
          val m = 2 + rnd.nextInt(9)
          p.deleteWhere(col("value.user_id") % m === 0)
          current = current.filterNot(o => userOf(o) % m == 0)
        case _ =>
          p.compact()
      }
      if (p.version() > 0) recorded(p.version()) = current
    }
    // every surviving snapshot must reproduce its recorded state exactly
    assert(p.versions().nonEmpty)
    p.versions().filter(recorded.contains).foreach { v =>
      val got = p.readAt(v).select("kafka.offset").collect()
        .map(_.getLong(0)).toSet
      assert(got == recorded(v), s"version $v")
    }
    // vacuum prunes only, never corrupts: the survivors still agree
    p.vacuum()
    assert(p.versions().toSet.subsetOf(recorded.keySet))
    p.versions().foreach { v =>
      val got = p.readAt(v).select("kafka.offset").collect()
        .map(_.getLong(0)).toSet
      assert(got == recorded(v), s"post-vacuum version $v")
    }
    single.unpersist()
  }

  test("a pool at an explicit file:-scheme Hadoop URI runs the full lifecycle") {
    // the storage-reach contract: Pool paths resolve through the Hadoop
    // FileSystem, so any scheme the classpath carries works — file:// is
    // the one this box can prove; HDFS/object stores differ only in the
    // connector behind the same calls (rename semantics noted in
    // SCALING.md "Pool storage reach")
    val dir = Files.createTempDirectory("pool-uri")
    val p = Pool.create(spark, dir.toUri.toString) // file:///…
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val total = env.count()
    assert(p.read().count() == total)
    assert(p.versions().size == 2)
    val v = p.version()
    val pred = col("value.user_id") % 7 === 0
    val hits = env.filter(pred).count()
    assert(p.deleteWhere(pred) == hits)
    assert(p.read().count() == total - hits)
    assert(p.readAt(v).count() == total, "time travel through the URI scheme")
    // both segments share one schema era, so the delete folded them into
    // a single rewrite — compact has nothing to do, vacuum reclaims the
    // two replaced originals
    assert(p.committedSegments().size == 1)
    assert(p.compact() == 0)
    assert(p.vacuum() == 2)
    assert(p.read().count() == total - hits)
    // reopen by URI and resume state
    val p2 = Pool.open(spark, dir.toUri.toString)
    assert(p2.read().count() == total - hits)
    assert(p2.nextOffset("purchase") > 0)
    env.unpersist()
  }

  test("pool on object-store semantics (rename = copy+delete) runs the full lifecycle") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.objstore.impl", classOf[ObjStoreFileSystem].getName)
    hc.set("fs.AbstractFileSystem.objstore.impl", classOf[ObjStoreAbstractFs].getName)
    val dir = Files.createTempDirectory("pool-objstore")
    val p = Pool.create(spark, s"objstore://$dir")
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val total = env.count()
    assert(p.read().count() == total)
    val v = p.version()
    assert(v == 2L)
    // purge-mode takedown under copy+delete rename: history gone, disk clean
    val pred = col("value.user_id") % 5 === 0
    val hits = env.filter(pred).count()
    assert(p.deleteWhere(pred, purge = true) == hits)
    assert(p.read().count() == total - hits)
    assert(p.read().filter(pred).count() == 0)
    intercept[IllegalArgumentException](p.readAt(v))
    p.versions().foreach(sv => assert(p.readAt(sv).filter(pred).count() == 0))
    // compact + vacuum + reopen all through the degraded-rename store
    if (p.committedSegments().size > 1) p.compact()
    assert(p.vacuum() >= 0)
    val p2 = Pool.open(spark, s"objstore://$dir")
    assert(p2.read().count() == total - hits)
    assert(p2.nextOffset("purchase") > 0)
    env.unpersist()
  }

  test("rejects batches without the kafka.offset pool key") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    val bad = Tables.load(spark, TestSpark.sf, "events")
    val e = intercept[IllegalArgumentException](p.append(bad))
    assert(e.getMessage.contains("pool key"))
  }

  test("uncommitted segment directories are invisible to readers") {
    val dir = Files.createTempDirectory("pool")
    val p = Pool.create(spark, dir.toString)
    p.append(envelopes().filter(col("kafka.offset") < 100))
    val before = p.read().count()
    // simulate a crashed writer: parquet data present, no manifest entry
    envelopes().filter(col("kafka.offset") >= 100)
      .write.parquet(dir.resolve("seg-zombie").toString)
    assert(p.read().count() == before)
  }

  test("nextOffset resumes at per-topic max+1, earliest when unseen") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    assert(p.nextOffset("purchase") == Pool.KafkaOffsetEarliest)
    p.append(envelopes())
    val expected = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(max("event_id")).collect()(0).getLong(0) + 1
    assert(p.nextOffset("purchase") == expected)
    assert(p.nextOffset("no-such-topic") == Pool.KafkaOffsetEarliest)
  }

  test("nextOffset answers from parquet footers — zero jobs on a single-topic pool") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val single = Envelope.wrap(ev, lit("corpus"), col("event_id"),
      struct(col("user_id")).as("key"), Seq("event_id", "user_id"))
    val p = Pool.create(spark, Files.createTempDirectory("pool-meta").toString)
    p.append(single.filter(col("kafka.offset") % 2 === 0))
    p.append(single.filter(col("kafka.offset") % 2 =!= 0))
    val expect = ev.agg(max(col("event_id"))).collect()(0).getLong(0) + 1
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    org.apache.spark.sql.graft.GraftColumnsBridge.drainListenerBus(spark)
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(p.nextOffset("corpus") == expect)
      assert(p.nextOffset("absent-topic") == Pool.KafkaOffsetEarliest)
      org.apache.spark.sql.graft.GraftColumnsBridge.drainListenerBus(spark)
      assert(jobs.get() == 0,
        "single-topic resume offsets must be pure footer metadata — no Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)

    // a file spanning topics (small multi-topic append → one coalesced
    // file) is ambiguous — the job fallback must still answer exactly
    val multi = Pool.create(spark, Files.createTempDirectory("pool-multi").toString)
    multi.append(envelopes())
    val byTopic = envelopes().groupBy(col("kafka.topic"))
      .agg(max(col("kafka.offset"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byTopic.foreach { case (t, m) => assert(multi.nextOffset(t) == m + 1) }
  }

  test("readRange prunes files by footer stats and stays exact") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val single = Envelope.wrap(ev, lit("corpus"), col("event_id"),
      struct(col("user_id")).as("key"), Seq("event_id", "user_id"))
    val dir = Files.createTempDirectory("pool-rr")
    val p = Pool.create(spark, dir.toString)
    p.append(single.filter(col("kafka.offset") < 300))
    p.append(single.filter(col("kafka.offset") >= 300 && col("kafka.offset") < 600))
    p.append(single.filter(col("kafka.offset") >= 600))
    val Seq(s0, s1, s2) = p.committedSegments()
    def expect(lo: Long, hi: Long) = p.read()
      .filter(col("kafka.offset") >= lo && col("kafka.offset") <= hi)
      .select("kafka.offset").collect().map(_.getLong(0)).toSet
    Seq((0L, 250L), (250L, 650L), (600L, Long.MaxValue), (0L, Long.MaxValue))
      .foreach { case (lo, hi) =>
        val got = p.readRange("corpus", lo, hi)
          .select("kafka.offset").collect().map(_.getLong(0)).toSet
        assert(got == expect(lo, hi), s"range [$lo, $hi]")
      }
    // file pruning: a range inside segment 3 must not list the others
    val files = p.readRange("corpus", 700L).inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s2)),
      s"only segment $s2's files may be scanned: ${files.toSeq}")
    assert(p.readRange("absent", 0L).count() == 0)
    // multi-topic pool: the spanning boundary file is kept, results exact
    val multi = Pool.create(spark, Files.createTempDirectory("pool-rrm").toString)
    multi.append(envelopes())
    val topics = envelopes().select(col("kafka.topic")).distinct()
      .collect().map(_.getString(0))
    topics.foreach { t =>
      val got = multi.readRange(t, 100L, 800L)
        .select("kafka.offset").collect().map(_.getLong(0)).toSet
      val want = multi.read()
        .filter(col("kafka.topic") === t &&
          col("kafka.offset") >= 100L && col("kafka.offset") <= 800L)
        .select("kafka.offset").collect().map(_.getLong(0)).toSet
      assert(got == want, s"topic $t")
    }
  }

  test("maxOffsetsByTopic matches a direct aggregation") {
    val p = Pool.create(spark, Files.createTempDirectory("pool").toString)
    p.append(envelopes())
    val got = p.maxOffsetsByTopic().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.load(spark, TestSpark.sf, "events")
      .groupBy("event_type").agg(max("event_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("objstore: pool metadata is installed by direct PUT, never by rename") {
    // this store's rename is delete+copy — a rename-installed manifest
    // would have a reader-visible MISSING/half-copied window, so on
    // non-atomic-rename schemes writeAtomic must go straight to the
    // final object (one PUT, last-writer-wins, never absent)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.objstore.impl", classOf[ObjStoreFileSystem].getName)
    hc.set("fs.AbstractFileSystem.objstore.impl", classOf[ObjStoreAbstractFs].getName)
    ObjStoreFileSystem.renamedTo.clear()
    val dir = Files.createTempDirectory("pool-objstore-put")
    val p = Pool.create(spark, s"objstore://$dir")
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    assert(p.deleteWhere(col("value.user_id") % 5 === 0, purge = true) > 0)
    val meta = "^(MANIFEST|NEXT|_PURGE|_EPOCH|v\\d{12})$".r
    val hit = ObjStoreFileSystem.renamedTo.asScala
      .filter(n => meta.findFirstIn(n).isDefined)
    assert(hit.isEmpty,
      s"pool metadata installed by rename on an object store: $hit")
    assert(p.read().count() == env.filter(col("value.user_id") % 5 =!= 0).count())
    env.unpersist()
  }

  test("manifest absent with surviving snapshots: read-repair serves the last commit") {
    val dir = Files.createTempDirectory("pool-repair")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val total = env.count()
    val segs = p.committedSegments()
    // a torn store (or an old-code crash mid-rename) loses the manifest
    Files.delete(dir.resolve(Pool.ManifestFile))
    assert(p.committedSegments() == segs,
      "read-repair must serve the latest snapshot, not an empty pool")
    assert(!p.isEmpty)
    assert(p.read().count() == total)
    env.unpersist()
  }

  test("writer-epoch fence: a superseded writer's commit refuses loudly") {
    val dir = Files.createTempDirectory("pool-fence")
    val p1 = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p1.append(env.filter(col("kafka.offset") < 600)) // p1 claims the epoch
    // serial writer handoff is a non-event: a NEW instance claims over p1
    val p2 = Pool.open(spark, dir.toString)
    p2.append(env.filter(col("kafka.offset") >= 600))
    assert(p2.deleteWhere(col("value.user_id") % 5 === 0) > 0)
    // p1 is now fenced: its commit refuses BEFORE touching the manifest —
    // the silent last-writer-wins lost-update this fence exists to stop
    val before = p2.committedSegments()
    val e = intercept[IllegalStateException](
      p1.append(env.filter(col("value.user_id") % 5 === 0)))
    assert(e.getMessage.contains("fenced"), e.getMessage)
    assert(p2.committedSegments() == before,
      "a fenced commit must not move the manifest")
    // sticky: the stale instance's cached state cannot be trusted again
    intercept[IllegalStateException](p1.append(env.limit(5)))
    // readers are never fenced (open claims nothing)
    assert(Pool.open(spark, dir.toString).read().count() == p2.read().count())
    env.unpersist()
  }

  test("writer-epoch CAS: two same-window claims on file:// resolve to one winner") {
    val dir = Files.createTempDirectory("pool-cas")
    val a = Pool.create(spark, dir.toString)
    val b = Pool.open(spark, dir.toString)
    val env = envelopes().persist()
    // the race window is read-current-then-create: both instances computed
    // target epoch 1 from the same (empty) state; a wins the exclusive
    // create, b's claim of the SAME epoch must refuse — deterministically
    // reproduced through the claim seam rather than a flaky thread race
    a.claimEpochAt(1L)
    val e = intercept[IllegalStateException](b.claimEpochAt(1L))
    assert(e.getMessage.contains("fenced at claim"), e.getMessage)
    // the winner's commit path works; the loser touched nothing
    a.append(env.filter(col("kafka.offset") < 600))
    assert(Files.exists(dir.resolve(s"${Pool.WriterEpochFile}.1")))
    // the loser holds no token, so a retry claims a FRESH epoch over the
    // winner (serial-handoff semantics: newest claimant owns the pool)
    b.append(env.filter(col("kafka.offset") >= 600))
    assert(Files.exists(dir.resolve(s"${Pool.WriterEpochFile}.2")))
    assert(!Files.exists(dir.resolve(s"${Pool.WriterEpochFile}.1")),
      "superseded claim files are pruned at the next claim")
    val before = b.committedSegments()
    intercept[IllegalStateException](a.append(env.limit(5)))
    assert(b.committedSegments() == before,
      "the fenced ex-winner must not move the manifest")
    // a true same-window thread race also yields exactly one winner: the
    // kernel's O_EXCL decides, whatever the interleaving
    val c1 = Pool.open(spark, dir.toString)
    val c2 = Pool.open(spark, dir.toString)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val ts = Seq(c1, c2).map { p =>
      new Thread(() => {
        barrier.await()
        try { p.claimEpochAt(3L); results.add(true) }
        catch { case _: IllegalStateException => results.add(false) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(results.asScala.toSeq.sorted == Seq(false, true),
      s"exactly one of two simultaneous epoch-3 claims may win: ${results.asScala}")
    env.unpersist()
  }

  test("a fenced writer's purge touches nothing — not even the intent marker") {
    val dir = Files.createTempDirectory("pool-fencepurge")
    val a = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    a.append(env) // a claims the epoch
    val b = Pool.open(spark, dir.toString)
    b.append(env.limit(5))
    val total = b.read().count()
    // b is now the claimant; a's purge must refuse BEFORE writing the
    // _PURGE intent — clobbering the live owner's in-flight intent
    // evidence is exactly what the pre-marker fence exists to stop
    val e = intercept[IllegalStateException](
      a.deleteWhere(col("value.user_id") % 5 === 0, purge = true))
    assert(e.getMessage.contains("fenced"), e.getMessage)
    assert(!Files.exists(dir.resolve(Pool.PurgeMarkerFile)),
      "a fenced purge must not write the intent marker")
    assert(b.read().count() == total, "no rows may have been deleted")
    env.unpersist()
  }

  test("openNoRepair + fsck witness a crashed purge; a normal open still repairs") {
    val dir = Files.createTempDirectory("pool-fsckro")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val before = p.committedSegments()
    val pred = col("value.user_id") % 5 === 0
    // reconstruct the crash-between-swap-and-flip window exactly as the
    // completePurge spec does: non-purge delete = swapped manifest with
    // pre-delete dirs still on disk, then the intent marker as the purge
    // would have left it (replacements live, listed gone)
    assert(p.deleteWhere(pred) > 0)
    val after = p.committedSegments()
    val replaced = before.filterNot(after.contains)
    val replacements = after.filterNot(before.contains)
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile),
      Pool.renderPurgeMarker(replaced, replacements, committed = false))
    // the OBSERVATION path: openNoRepair must not run completePurge —
    // the dirty state is witnessable and the report says what is OWED
    val ro = Pool.openNoRepair(spark, dir.toString)
    val f = ro.fsck()
    assert(!f.clean && f.stalePurgeIntent && f.purgeReclamationOwed,
      s"a proven-swap marker is owed reclamation: $f")
    assert(Files.exists(dir.resolve(Pool.PurgeMarkerFile)),
      "fsck must not consume the marker")
    replaced.foreach(s => assert(Files.exists(dir.resolve(s)),
      "fsck must not reclaim the pre-delete dirs"))
    // the CLI verb routes through the same non-repairing open
    val (lines, clean) = graft.cli.Commands.fsck(spark, dir.toString)
    assert(!clean && lines.exists(_.contains("reclamation OWED")), lines.mkString("\n"))
    assert(Files.exists(dir.resolve(Pool.PurgeMarkerFile)) &&
      replaced.forall(s => Files.exists(dir.resolve(s))),
      "the CLI health check must not mutate the store")
    // a PRE-swap intent reads as evidence, not owed work
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile),
      Pool.renderPurgeMarker(after, Seq("delete-cafebabe"), committed = false))
    val f2 = Pool.openNoRepair(spark, dir.toString).fsck()
    assert(f2.stalePurgeIntent && !f2.purgeReclamationOwed,
      s"an unproven swap is not owed reclamation: $f2")
    val (lines2, _) = graft.cli.Commands.fsck(spark, dir.toString)
    assert(lines2.exists(_.contains("never applied")), lines2.mkString("\n"))
    // restore the owed state: a subsequent NORMAL open performs the repair
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile),
      Pool.renderPurgeMarker(replaced, replacements, committed = false))
    val repaired = Pool.open(spark, dir.toString)
    assert(!Files.exists(dir.resolve(Pool.PurgeMarkerFile)))
    replaced.foreach(s => assert(!Files.exists(dir.resolve(s)),
      "the writer open owes and performs the reclamation"))
    assert(repaired.read().filter(pred).count() == 0)
    env.unpersist()
  }

  test("interrupted purge (crash after the swap) is completed at open time") {
    val dir = Files.createTempDirectory("pool-purgecrash")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val vPre = p.version()
    val before = p.committedSegments()
    val pred = col("value.user_id") % 5 === 0
    // a NON-purge delete produces exactly the crashed-purge disk state:
    // manifest swapped, pre-delete segment dirs still on disk, snapshots
    // still referencing them — then the intent marker is planted as a
    // purge crashing between its swap and its phase flip would have left
    // it (intent phase, replacements live, listed gone from the
    // manifest), and reopen must finish the job
    assert(p.deleteWhere(pred) > 0)
    val after = p.committedSegments()
    val replaced = before.filterNot(after.contains)
    val replacements = after.filterNot(before.contains)
    assert(replaced.nonEmpty && replacements.nonEmpty)
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile),
      Pool.renderPurgeMarker(replaced, replacements, committed = false))
    val p2 = Pool.open(spark, dir.toString)
    replaced.foreach(s => assert(!Files.exists(dir.resolve(s)),
      s"pre-delete copy $s survived the purge repair"))
    assert(!Files.exists(dir.resolve(Pool.PurgeMarkerFile)))
    intercept[IllegalArgumentException](p2.readAt(vPre))
    assert(p2.read().filter(pred).count() == 0)
    assert(p2.read().count() == env.filter(!pred).count())
    env.unpersist()
  }

  test("stale purge intent (crash before the swap) is preserved as evidence, data untouched") {
    val dir = Files.createTempDirectory("pool-purgestale")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env)
    val total = env.count()
    val seg = p.committedSegments().head
    // crash between the marker write and the manifest swap: the listed
    // segment is still committed — the delete never happened. Open must
    // NOT consume the intent (it may be another writer's LIVE pre-swap
    // window, and silently discarding it would let an operator believe
    // the takedown applied) — fsck carries the evidence instead
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile),
      Pool.renderPurgeMarker(Seq(seg), Seq("delete-cafebabe"), committed = false))
    val p2 = Pool.open(spark, dir.toString)
    assert(Files.exists(dir.resolve(seg)), "live segment must survive a stale intent")
    assert(Files.exists(dir.resolve(Pool.PurgeMarkerFile)),
      "a pre-swap intent is evidence the delete never ran — open must not eat it")
    assert(p2.fsck().stalePurgeIntent)
    assert(p2.read().count() == total)
    // a re-run purge (the documented repair) rewrites and then retires it
    assert(p2.deleteWhere(col("value.user_id") % 3 === 0, purge = true) > 0)
    assert(!Files.exists(dir.resolve(Pool.PurgeMarkerFile)))
    env.unpersist()
  }

  test("stale purge intent + later compact: repair must not destroy the compacted history") {
    // THE misfire corner: a purge crashes PRE-swap (its rows all survive),
    // then a non-purge compact() replaces the listed segments — listed
    // minus live is now nonempty even though the purge never committed.
    // The marker's replacement binding must keep the repair from deleting
    // the old segment dirs and pruning the time-travel snapshots that
    // non-purge operations deliberately preserve.
    val dir = Files.createTempDirectory("pool-purgecompact")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    val total = env.count()
    val listed = p.committedSegments()
    val vPre = p.version()
    // pre-swap crash artifact: intent phase, replacements never committed
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile),
      Pool.renderPurgeMarker(listed, Seq("delete-feedface"), committed = false))
    p.compact()
    val p2 = Pool.open(spark, dir.toString)
    listed.foreach(s => assert(Files.exists(dir.resolve(s)),
      s"compacted-away $s is time-travel history, not the crashed purge's target"))
    assert(Files.exists(dir.resolve(Pool.PurgeMarkerFile)),
      "the unapplied takedown's evidence must survive the reopen")
    assert(p2.fsck().stalePurgeIntent)
    assert(p2.readAt(vPre).count() == total,
      "pre-compact snapshots must stay readable — the purge never committed")
    // legacy/garbled markers are equally refused (never auto-consumed)
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile), listed.mkString("\n"))
    val p3 = Pool.open(spark, dir.toString)
    listed.foreach(s => assert(Files.exists(dir.resolve(s))))
    assert(Files.exists(dir.resolve(Pool.PurgeMarkerFile)))
    // vacuum is the documented retirement: unreferenced dirs go, marker too
    assert(p3.vacuum() == listed.size)
    assert(!Files.exists(dir.resolve(Pool.PurgeMarkerFile)))
    assert(p3.read().count() == total)
    env.unpersist()
  }

  test("fsck reports exactly the dirty states and stays clean through normal life") {
    val dir = Files.createTempDirectory("pool-fsck")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600))
    p.append(env.filter(col("kafka.offset") >= 600))
    assert(p.fsck().clean, s"fresh 2-commit pool must be clean: ${p.fsck()}")
    // compaction leftovers = unreferenced dirs awaiting vacuum
    val old = p.committedSegments()
    p.compact()
    val f1 = p.fsck()
    assert(f1.unreferencedDirs.toSet == old.toSet && !f1.clean)
    assert(p.vacuum() == old.size)
    assert(p.fsck().clean)
    // a stale purge intent and a missing counter are both flagged
    Files.writeString(dir.resolve(Pool.PurgeMarkerFile), old.head)
    Files.delete(dir.resolve(Pool.VersionsDir).resolve(Pool.VersionCounterFile))
    val f2 = p.fsck()
    assert(f2.stalePurgeIntent && f2.counterMissing)
    Files.delete(dir.resolve(Pool.PurgeMarkerFile))
    // out-of-band segment deletion breaks the snapshots that list it
    val seg = p.committedSegments().head
    val segDir = dir.resolve(seg)
    java.nio.file.Files.walk(segDir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    val f3 = p.fsck()
    assert(f3.missingLiveSegments == Seq(seg),
      s"the gone-but-committed $seg must be flagged: $f3")
    assert(f3.brokenSnapshots.nonEmpty,
      s"snapshots listing the deleted $seg must be flagged: $f3")
    env.unpersist()
  }

  test("version numbers stay monotonic when a prune meets a missing counter") {
    val dir = Files.createTempDirectory("pool-vnum")
    val p = Pool.create(spark, dir.toString)
    val env = envelopes().persist()
    p.append(env.filter(col("kafka.offset") < 600)) // v1
    p.append(env.filter(col("kafka.offset") >= 600)) // v2
    p.compact() // v3
    // sabotage: the counter AND the latest snapshot vanish before the
    // prune (the one state where the old fallback re-spent numbers)
    Files.delete(dir.resolve(Pool.VersionsDir).resolve(Pool.VersionCounterFile))
    Files.delete(dir.resolve(Pool.VersionsDir).resolve(f"v${3L}%012d"))
    assert(p.vacuum() == 2) // prunes v1+v2 (they reference the folded segments)
    p.append(env.limit(5)) // must NOT re-spend v1/v2
    assert(p.version() >= 3,
      s"version ${p.version()} re-spends a number a consumer may have pinned")
    env.unpersist()
  }
}
