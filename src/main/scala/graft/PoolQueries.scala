package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pool.{Envelope, Pool}
import graft.Queries.Q

/** Pool-layer operators as driver-checkable queries: S3 pool scan, S4 atomic
  * commit, Q16 max-offsets, T3 resume — exercised by round-tripping the
  * `events` table through a real on-disk pool and aggregating the result.
  * The DuckDB oracle computes the same aggregate straight from the source
  * table, so any loss/duplication/reorder in the pool write+read path breaks
  * the hash match.
  */
object PoolQueries {

  /** events → envelopes (topic = event_type, offset = event_id). */
  private[graft] def envelopes(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
    Envelope.wrap(ev,
      topic = col("event_type"),
      offset = col("event_id"),
      key = struct(col("user_id")).as("key"),
      valueCols = Seq("event_id", "user_id", "value"))
  }

  val all: Map[String, Q] = Map(

    // S3+S4: commit the batch to a pool (atomic manifest protocol), read it
    // back, aggregate per topic.
    "pool_roundtrip" -> Q(
      (s, d) => {
        val dir = TempDirs.create("graft-pool-")
        val p = Pool.create(s, dir)
        p.append(envelopes(s, d))
        p.read()
          .groupBy(col("kafka.topic").as("topic"))
          .agg(count(lit(1)).as("cnt"),
            max(col("kafka.offset")).as("max_offset"),
            sum(col("value.user_id")).as("sum_user"))
      },
      Some("""SELECT event_type AS topic, count(*) AS cnt, max(event_id) AS max_offset,
             |       CAST(sum(user_id) AS BIGINT) AS sum_user
             |FROM events GROUP BY event_type""".stripMargin)),

    // Q16/T3: per-topic max offset + derived resume offset (max+1)
    "pool_resume_offsets" -> Q(
      (s, d) => {
        val dir = TempDirs.create("graft-pool-")
        val p = Pool.create(s, dir)
        p.append(envelopes(s, d))
        p.maxOffsetsByTopic()
          .select(col("topic"), col("offset"), (col("offset") + 1).as("next_offset"))
      },
      Some("""SELECT event_type AS topic, max(event_id) AS offset,
             |       max(event_id) + 1 AS next_offset
             |FROM events GROUP BY event_type""".stripMargin)),

    // targeted delete (takedown / right-to-be-forgotten): two committed
    // segments, then deleteWhere rewrites ONLY the segments holding
    // matches — the remaining contents must equal a plain NOT-predicate
    // filter of the source, per topic
    "pool_delete_where" -> Q(
      (s, d) => {
        val dir = TempDirs.create("graft-pool-")
        val p = Pool.create(s, dir)
        val env = envelopes(s, d)
        p.append(env.filter(col("kafka.offset") < 600))
        p.append(env.filter(col("kafka.offset") >= 600))
        p.deleteWhere(col("value.user_id") % 5 === 0)
        p.read()
          .groupBy(col("kafka.topic").as("topic"))
          .agg(count(lit(1)).as("cnt"),
            max(col("kafka.offset")).as("max_offset"),
            sum(col("value.user_id")).as("sum_user"))
      },
      Some("""SELECT event_type AS topic, count(*) AS cnt, max(event_id) AS max_offset,
             |       CAST(sum(user_id) AS BIGINT) AS sum_user
             |FROM events WHERE NOT (user_id % 5 = 0) GROUP BY event_type""".stripMargin)),

    // purge-mode delete (the DMCA/right-to-be-forgotten contract): after
    // deleteWhere(purge = true) the pre-delete snapshot REFUSES to read,
    // and the DISK ITSELF — every parquet file under the pool root,
    // committed or not — holds exactly the surviving rows. The aggregate
    // here reads the raw segment directories, not the manifest, so a
    // purge that left a stale copy on disk (the retention footgun this
    // mode exists to close) breaks the hash match
    "pool_purge_delete" -> Q(
      (s, d) => {
        val dir = TempDirs.create("graft-pool-")
        val p = Pool.create(s, dir)
        val env = envelopes(s, d)
        p.append(env.filter(col("kafka.offset") < 600))
        p.append(env.filter(col("kafka.offset") >= 600))
        val vPre = p.version()
        p.deleteWhere(col("value.user_id") % 5 === 0, purge = true)
        val refused = // time travel across the purge must be gone
          try { p.readAt(vPre); 0L }
          catch { case _: IllegalArgumentException => 1L }
        val segDirs = {
          val ls = Files.list(java.nio.file.Paths.get(dir))
          try {
            val it = ls.iterator()
            val b = Seq.newBuilder[String]
            while (it.hasNext) {
              val q = it.next()
              if (Files.isDirectory(q) &&
                  q.getFileName.toString != Pool.VersionsDir)
                b += q.toString
            }
            b.result()
          } finally ls.close()
        }
        s.read.parquet(segDirs: _*)
          .groupBy(col("kafka.topic").as("topic"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value.user_id")).as("sum_user"))
          .withColumn("pre_snapshot_refused", lit(refused))
      },
      Some("""SELECT event_type AS topic, count(*) AS cnt,
             |       CAST(sum(user_id) AS BIGINT) AS sum_user,
             |       CAST(1 AS BIGINT) AS pre_snapshot_refused
             |FROM events WHERE NOT (user_id % 5 = 0) GROUP BY event_type""".stripMargin)),

    // footer-pruned range read (the reference's to-kafka resume scan
    // shape, fifo/lake.go:84-92): only files whose stats admit the range
    // are scanned, the residual filter keeps it exact
    "pool_read_range" -> Q(
      (s, d) => {
        val dir = TempDirs.create("graft-pool-")
        val p = Pool.create(s, dir)
        val ev = Tables.load(s, d, "events")
        val single = Envelope.wrap(ev, lit("events"), col("event_id"),
          struct(col("user_id")).as("key"), Seq("event_id", "user_id", "value"))
        p.append(single.filter(col("kafka.offset") < 500))
        p.append(single.filter(col("kafka.offset") >= 500))
        p.readRange("events", 200L, 700L)
          .groupBy()
          .agg(count(lit(1)).as("cnt"),
            min(col("kafka.offset")).as("min_offset"),
            max(col("kafka.offset")).as("max_offset"),
            sum(col("value.user_id")).as("sum_user"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS cnt, min(event_id) AS min_offset,
             |       max(event_id) AS max_offset, CAST(sum(user_id) AS BIGINT) AS sum_user
             |FROM events WHERE event_id BETWEEN 200 AND 700""".stripMargin)),

    // snapshot time travel: a training run pinned at version v still reads
    // its exact corpus after a later targeted delete — v2 (pre-delete)
    // must aggregate like the full source, the current manifest like the
    // NOT-predicate filter, in one tagged union
    "pool_time_travel" -> Q(
      (s, d) => {
        val dir = TempDirs.create("graft-pool-")
        val p = Pool.create(s, dir)
        val env = envelopes(s, d)
        p.append(env.filter(col("kafka.offset") % 2 === 0))
        p.append(env.filter(col("kafka.offset") % 2 =!= 0))
        val v2 = p.version()
        p.deleteWhere(col("value.user_id") % 5 === 0)
        def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
          df.groupBy(col("kafka.topic").as("topic"))
            .agg(count(lit(1)).as("cnt"), sum(col("value.user_id")).as("sum_user"))
            .withColumn("snap", lit(tag))
        agg(p.readAt(v2), "v2").unionByName(agg(p.read(), "cur"))
      },
      Some("""SELECT event_type AS topic, count(*) AS cnt,
             |       CAST(sum(user_id) AS BIGINT) AS sum_user, 'v2' AS snap
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT event_type AS topic, count(*) AS cnt,
             |       CAST(sum(user_id) AS BIGINT) AS sum_user, 'cur' AS snap
             |FROM events WHERE NOT (user_id % 5 = 0) GROUP BY event_type""".stripMargin)),

    // S4 exactly-once backstop: two appends of overlapping batches, then the
    // T7 anti-join dedup on (topic, offset) — duplicates from the second
    // commit are filtered, matching the reference's reprocess-nothing golden
    // (ztests/etl-demo.yaml:37-48).
    "pool_dedup_commit" -> Q(
      (s, d) => {
        val dir = TempDirs.create("graft-pool-")
        val p = Pool.create(s, dir)
        val env = envelopes(s, d)
        p.append(env.filter(col("kafka.offset") < 600))
        p.append(env.filter(col("kafka.offset") >= 400)) // overlap [400,600)
        val all = p.read()
        all.groupBy(col("kafka.topic").as("topic"), col("kafka.offset").as("offset"))
          .agg(count(lit(1)).as("copies"))
          .groupBy("topic")
          .agg(count(lit(1)).as("distinct_offsets"), sum("copies").as("total_rows"))
      },
      Some("""SELECT event_type AS topic, count(*) AS distinct_offsets,
             |       CAST(count(*) + sum(CASE WHEN event_id >= 400 AND event_id < 600 THEN 1 ELSE 0 END) AS BIGINT) AS total_rows
             |FROM events GROUP BY event_type""".stripMargin))
  )
}
