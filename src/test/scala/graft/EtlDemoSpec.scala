package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Zson
import graft.etl.{DenormRule, Etl, StatelessRule, ZedEtl}
import graft.pool.Pool

/** The reference's demo corpus, executed VERBATIM (ztests/etl-demo.yaml):
  * `demo/batch-1..4.zson` loaded into a Raw pool one batch at a time, the
  * actual `demo/invoices.yaml` config (Zed rule surface translated by
  * [[ZedEtl]]) run after each load, and the full Staging contents asserted
  * against the four golden states in `ztests/etl-demo.yaml:26-88` — records,
  * output offsets, AND done markers, including the incremental-join
  * behavior the demo exists to show (Invoices/4 stays unmarked through
  * batch 2 until its InvoiceStatus partner lands in batch 3).
  *
  * Golden comparison is on (kind, topic, offset, key.ID, value fields): the
  * reference keeps per-record Zed types so its update records carry only
  * {ID, invoice_status}, while our pools widen to the nullable superset
  * (SchemaUnion) — absent golden fields compare as null, which is the same
  * statement the reference's goldens make.
  */
class EtlDemoSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val refDir = Paths.get("/root/reference")
  private def ref(p: String): String = Files.readString(refDir.resolve(p))

  test("ZedEtl translates the invoices.yaml rule surface into the SQL rule model") {
    assume(Files.isDirectory(refDir))
    val cfg = ZedEtl.parse(ref("demo/invoices.yaml"))
    assert(cfg.inputPool == "Raw" && cfg.outputPool == "Staging")
    assert(cfg.transform.inputTopics == Seq("Invoices", "InvoiceStatus"))
    assert(cfg.transform.outputTopic == "NewInvoices")
    assert(cfg.transform.rules.length == 4)

    val denorm = cfg.transform.rules.head.asInstanceOf[DenormRule]
    assert(denorm.leftTopic == "Invoices" && denorm.rightTopic == "InvoiceStatus")
    assert(denorm.where.get.contains("IN ('c', 'r')"))
    assert(denorm.joinOn.replace("`", "") == "(left.value.after.ID = right.value.after.InvoiceID)")
    assert(denorm.outKey.replace("`", "") == "left.key")
    assert(denorm.outValue.startsWith("named_struct('ID'"))

    val statusU = cfg.transform.rules(1).asInstanceOf[StatelessRule]
    assert(statusU.inTopic == "InvoiceStatus")
    assert(statusU.where.get.replace("`", "") == "(in.value.op = 'u')")

    // the delete-tombstone rule: cast(null, typeof(…)) → untyped NULL
    val del = cfg.transform.rules(3).asInstanceOf[StatelessRule]
    assert(del.outValue == "NULL")
  }

  test("demo batches 1..4 through invoices.yaml reproduce the etl-demo.yaml goldens") {
    assume(Files.isDirectory(refDir))
    val cfg = ZedEtl.parse(ref("demo/invoices.yaml"))
    val goldens = goldenBlocks(ref("ztests/etl-demo.yaml"))
    assert(goldens.keySet == Set(1, 2, 3, 4))

    val raw = Pool.create(spark, Files.createTempDirectory("demo-raw").toString)
    val staging = Pool.create(spark, Files.createTempDirectory("demo-staging").toString)

    // (records, markers) per run: pinned by the goldens' per-batch deltas
    val expectedCounts = Map(1 -> (2L, 4L), 2 -> (1L, 2L), 3 -> (2L, 3L), 4 -> (3L, 3L))

    for (i <- 1 to 4) {
      raw.append(loadZson(ref(s"demo/batch-$i.zson")))
      val counts = Etl.run(spark, raw, staging, cfg.transform)
      assert(counts == expectedCounts(i), s"batch $i (records, markers)")
      val actual = normalize(staging.read(), col("_kind"))
      val expected = normalize(loadZson(goldens(i).mkString("\n")),
        coalesce(col("_type"), lit("record")))
      assert(actual == expected, s"Staging contents after batch $i")
    }
  }

  test("the COMPILED etl-zed program, finalized, commits the batch-2 golden state") {
    assume(Files.isDirectory(refDir))
    // batch 1 processed natively; batch 2 loaded — then the GENERATED Zed
    // program (ztests/etl-zed.yaml golden stdout) computes the batch-2
    // delta, ZedEtl.finalizeProgramOutput makes it pool-committable (flat
    // markers, assigned offsets — the Go layer's pipeline.go:93-164 role),
    // and committing it reproduces ztests/etl-demo.yaml's `=== 2` Staging
    // state exactly
    val cfg = ZedEtl.parse(ref("demo/invoices.yaml"))
    val goldens = goldenBlocks(ref("ztests/etl-demo.yaml"))
    val program = {
      import scala.jdk.CollectionConverters._
      val root = new org.yaml.snakeyaml.Yaml()
        .load[java.util.Map[String, Object]](ref("ztests/etl-zed.yaml")).asScala
      root("outputs").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.map(_.asScala).find(_.get("name").map(_.toString.trim).contains("stdout")).get
        .apply("data").toString
    }

    val raw = Pool.create(spark, Files.createTempDirectory("zedc-raw").toString)
    val staging = Pool.create(spark, Files.createTempDirectory("zedc-staging").toString)
    raw.append(loadZson(ref("demo/batch-1.zson")))
    Etl.run(spark, raw, staging, cfg.transform)
    raw.append(loadZson(ref("demo/batch-2.zson")))

    val delta = graft.query.ZedScript.run(spark, program,
      {
        case "Raw" => (raw.read(), Seq("kafka.offset"))
        case "Staging" => (staging.read(), Seq("kafka.offset"))
        case other => fail(s"program asked for unknown pool $other")
      },
      kindCol = "_kind")
    val (batch, persisted) = ZedEtl.finalizeProgramOutputPlan(delta,
      cfg.transform.outputTopic, Etl.outputState(staging).baseOffsets)
    try staging.append(batch)
    finally persisted.foreach(_.unpersist())

    val actual = normalize(staging.read(), col("_kind"))
    val expected = normalize(loadZson(goldens(2).mkString("\n")),
      coalesce(col("_type"), lit("record")))
    assert(actual == expected, "Staging contents after program-driven batch 2")
  }

  test("generateProgram reproduces the etl-zed.yaml golden program text") {
    assume(Files.isDirectory(refDir))
    // `zync etl -zed invoices.yaml` parity: the generated Zed program must
    // BE the reference's golden stdout (ztests/etl-zed.yaml) — which the
    // ZedScript run-equivalence tests then execute, closing the loop:
    // generate → run → finalize → commit all match the native compiler
    val golden = {
      import scala.jdk.CollectionConverters._
      val root = new org.yaml.snakeyaml.Yaml()
        .load[java.util.Map[String, Object]](ref("ztests/etl-zed.yaml")).asScala
      root("outputs").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.map(_.asScala).find(_.get("name").map(_.toString.trim).contains("stdout")).get
        .apply("data").toString
    }
    val generated = ZedEtl.generateProgram(ref("demo/invoices.yaml"))
    assert(generated.size == 1)
    val got = generated.head
    // the ztest block scalar keeps one extra final newline; the program
    // text itself must match byte-for-byte
    if (got != golden && got + "\n" != golden) {
      // byte-diff aid: first differing line
      val (gl, dl) = (got.linesIterator.toSeq, golden.linesIterator.toSeq)
      val i = gl.zipAll(dl, "<EOF>", "<EOF>").indexWhere { case (a, b) => a != b }
      fail(s"first diff at line ${i + 1}:\n  generated: ${gl.lift(i)}\n  golden:    ${dl.lift(i)}")
    }
  }

  test("finalizeProgramOutput is deterministic when source offsets collide across topics") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    // the program's record rows keep only the source OFFSET (topic was
    // overwritten by the program), so two topics' records can collide on
    // offset; assignment must still be run-to-run deterministic
    val schema = StructType.fromDDL(
      "kafka struct<topic:string,offset:bigint>, " +
        "key struct<id:bigint>, value struct<v:string>, _kind string")
    val rows = Seq(
      Row(Row("NewT", 4L), Row(1L), Row("from-topic-A"), null),
      Row(Row("NewT", 4L), Row(2L), Row("from-topic-B"), null),
      Row(Row("NewT", 5L), Row(3L), Row("later"), null),
      Row(Row("SrcA", 4L), null, null, "done")).asJava
    def assignment(): Map[String, Long] = {
      val (batch, persisted) = ZedEtl.finalizeProgramOutputPlan(
        spark.createDataFrame(rows, schema), "NewT", Map("NewT" -> 9L))
      try batch.filter(col("_kind") === "record")
        .select(col("value.v"), col("kafka.offset"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      finally persisted.foreach(_.unpersist())
    }
    val first = assignment()
    assert(first.keySet == Set("from-topic-A", "from-topic-B", "later"))
    assert(first.values.toSet == Set(10L, 11L, 12L)) // continue from base 9
    assert(first("later") == 12L) // offset 5 sorts after both collisions
    assert(assignment() == first) // the tie-break pins the colliding pair
  }

  /** ZSON text → envelope DataFrame via the engine's own reader (the
    * `produce` path): ZSON-lite transpile to JSON lines, Spark JSON read.
    */
  private def loadZson(zson: String): DataFrame = {
    val lines = Zson.toJsonLines(zson)
    val ds = spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)
    val df = spark.read.json(ds)
    // golden lines: the (=done) decorator became _type
    if (lines.exists(_.contains("\"_type\"")))
      df.withColumn("_kind", expr("coalesce(_type, 'record')"))
    else df.withColumn("_kind", lit("record"))
  }

  /** Project both sides to the comparable envelope surface. Fields the
    * DataFrame's schema lacks (golden done lines have no key/value; golden
    * update records have no customer/item) read as null — the superset
    * semantics of the pool itself.
    */
  private def normalize(df: DataFrame, kind: Column): Seq[String] = {
    def has(path: Seq[String], t: StructType = df.schema): Boolean = path match {
      case Seq(only) => t.fieldNames.contains(only)
      case head +: tail => t.fields.find(_.name == head).map(_.dataType) match {
        case Some(s: StructType) => has(tail, s)
        case _ => false
      }
    }
    def c(path: String): Column =
      if (has(path.split('.').toSeq)) col(path).cast("string") else lit(null).cast("string")
    df.select(
      kind.cast("string"),
      c("kafka.topic"), c("kafka.offset"),
      c("key.ID"), c("value.ID"), c("value.customer"), c("value.item"),
      c("value.invoice_status"))
      .collect()
      .map(r => (0 until r.length).map(j => if (r.isNullAt(j)) "∅" else r.getString(j)).mkString("|"))
      .toSeq.sorted
  }

  /** The ztest's stdout golden, split into the per-batch `=== i` blocks,
    * keeping only the ZSON record lines.
    */
  private def goldenBlocks(ztestYaml: String): Map[Int, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](ztestYaml).asScala
    val stdout = root("outputs").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.map(_.asScala).find(_.get("name").map(_.toString).contains("stdout")).get
      .apply("data").toString
    val blocks = scala.collection.mutable.Map[Int, Vector[String]]()
    var current = -1
    stdout.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("===")) { current = line.stripPrefix("===").trim.toInt; blocks(current) = Vector() }
      else if (line.startsWith("{") && current > 0) blocks(current) :+= line
    }
    blocks.toMap.map { case (k, v) => k -> v.toSeq }
  }
}
