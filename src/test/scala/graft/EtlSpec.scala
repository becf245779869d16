package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Etl, StatelessRule, Transform}
import graft.pool.Pool

class EtlSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def envelopes(topic: String, offsets: Range): DataFrame = {
    val schema = StructType(Seq(
      StructField("kafka", StructType(Seq(
        StructField("topic", StringType), StructField("partition", LongType),
        StructField("offset", LongType)))),
      StructField("key", StructType(Seq(StructField("id", LongType)))),
      StructField("value", StructType(Seq(
        StructField("op", StringType), StructField("n", LongType)))),
      StructField("_kind", StringType)))
    val rows = offsets.map(o =>
      Row(Row(topic, 0L, o.toLong), Row(o.toLong), Row("c", o.toLong * 2), "record")).asJava
    spark.createDataFrame(rows, schema)
  }

  private val t = Transform(Seq("A"), "Out", Seq(
    StatelessRule("A", None,
      "named_struct('id', in.key.id)",
      "named_struct('id', in.key.id, 'n', in.value.n)")))

  test("cursor forms on a contiguous done prefix and bounds the rescan") {
    val in = Pool.create(spark, Files.createTempDirectory("etl-in").toString)
    val out = Pool.create(spark, Files.createTempDirectory("etl-out").toString)
    in.append(envelopes("A", 0 until 100))
    assert(Etl.run(spark, in, out, t) == (100L, 100L))

    // all 100 inputs done, offsets 0..99 contiguous → cursor = 100
    val st = Etl.outputState(out)
    assert(st.cursors == Map("A" -> 100L))

    // incremental batch; cursor prunes the rescan but results stay exact
    in.append(envelopes("A", 100 until 150))
    assert(Etl.run(spark, in, out, t) == (50L, 50L))
    assert(Etl.outputState(out).cursors == Map("A" -> 150L))
    val recs = out.read().filter(col("_kind") === "record")
    assert(recs.count() == 150)
    assert(recs.select(countDistinct(col("kafka.offset"))).collect()(0).getLong(0) == 150)
    assert(recs.agg(sum(col("value.n"))).collect()(0).getLong(0) == (0L until 150L).map(_ * 2).sum)
  }

  test("no cursor on gappy done offsets (conservative, stays correct)") {
    val in = Pool.create(spark, Files.createTempDirectory("etl-in").toString)
    val out = Pool.create(spark, Files.createTempDirectory("etl-out").toString)
    // offsets start at 10 → prefix [0,10) never done → no cursor
    in.append(envelopes("A", 10 until 50))
    Etl.run(spark, in, out, t)
    assert(Etl.outputState(out).cursors.isEmpty)
    // re-run still a no-op via the anti-join alone
    assert(Etl.run(spark, in, out, t) == (0L, 0L))
  }

  test("duplicate (topic, offset) inputs commit ONE marker; cursor invariant survives") {
    // a decoder may emit several records per wire message (ZNG multi-record
    // values explode, sharing the message's kafka coordinates) — the
    // stateless branch must still mark each offset once, or the output
    // pool's "markers are distinct" cursor invariant breaks permanently
    val in = Pool.create(spark, Files.createTempDirectory("etl-in").toString)
    val out = Pool.create(spark, Files.createTempDirectory("etl-out").toString)
    val dup = envelopes("A", 0 until 20)
      .unionByName(envelopes("A", 5 until 10)) // offsets 5..9 doubled
    in.append(dup)
    val (records, markers) = Etl.run(spark, in, out, t)
    assert(records == 25) // every input row transforms
    assert(markers == 20) // but each offset is marked once
    assert(Etl.outputState(out).cursors == Map("A" -> 20L)) // invariant holds
    assert(Etl.run(spark, in, out, t) == (0L, 0L)) // reprocess nothing
  }
}
