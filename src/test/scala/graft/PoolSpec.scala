package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
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
}
