package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Zson
import graft.etl.{Etl, ZedEtl}
import graft.pool.Pool
import graft.query.ZedScript

/** The reference's demo Zed scripts, executed VERBATIM through the
  * [[ZedScript]] compiler against the reference's own fixtures, asserted
  * against the outputs its design doc documents:
  *
  *  - `demo/etl.zed` over `demo/consume-1.zson` → design.md:292-294:
  *    `{customerID:1,menuID:200,qty:2,total:3.98}`
  *  - `demo/update.zed` over consume-1+2 and `demo/staging-1.zson` →
  *    design.md:355-358: exactly the two records of pending txn 10001
  *  - `demo/update-etl.zed` over the same → design.md:362-363:
  *    `{customerID:2,menuID:100,qty:1,total:5.99}`
  *  - `demo/pending.zed` over the invoices Raw/Staging pools mid-demo →
  *    exactly the unprocessed record (Invoices/4, "Dan") that
  *    ztests/etl-demo.yaml shows held back after batch 2
  */
class ZedScriptSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val refDir = Paths.get("/root/reference")
  private def ref(p: String): String = Files.readString(refDir.resolve(p))

  private def loadZson(zson: String): DataFrame = {
    val lines = Zson.toJsonLines(zson)
    spark.read.json(spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING))
  }

  /** The design-doc pools: raw/staging ordered by seqno, ZSON `_type`
    * discriminator.
    */
  private def designPools(raw: DataFrame, staging: Option[DataFrame])
      : String => (DataFrame, Seq[String]) = {
    case "raw" => (raw, Seq("seqno"))
    case "staging" => (staging.getOrElse(fail("script asked for staging")), Seq("seqno"))
    case other => fail(s"script asked for unknown pool $other")
  }

  test("demo/etl.zed verbatim over consume-1: the documented aggregate-and-yield result") {
    assume(Files.isDirectory(refDir))
    val raw = loadZson(ref("demo/consume-1.zson"))
    val out = ZedScript.run(spark, ref("demo/etl.zed"),
      designPools(raw, None), kindCol = "_type")
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Int]("customerID") == 1)
    assert(r.getAs[Int]("menuID") == 200)
    assert(r.getAs[Long]("qty") == 2L)
    assert(r.getAs[Double]("total") == 2 * 1.99) // design.md: total:3.98
  }

  test("demo/update.zed verbatim: anti join isolates the pending transaction's records") {
    assume(Files.isDirectory(refDir))
    val raw = loadZson(ref("demo/consume-1.zson") + "\n" + ref("demo/consume-2.zson"))
    val staging = loadZson(ref("demo/staging-1.zson"))
    val out = ZedScript.run(spark, ref("demo/update.zed"),
      designPools(raw, Some(staging)), kindCol = "_type")
    val rows = out.orderBy(col("seqno")).collect()
    // design.md:355-358: seqno 3 already processed; 2 and 4 remain
    assert(rows.map(_.getAs[Long]("seqno")).toSeq == Seq(2L, 4L))
    assert(rows(0).getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("row").getAs[String]("customer") == "bob")
    assert(rows(1).getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("row").getAs[String]("product") == "burrito")
  }

  test("demo/update-etl.zed verbatim: anti join + ETL yields the documented update") {
    assume(Files.isDirectory(refDir))
    val raw = loadZson(ref("demo/consume-1.zson") + "\n" + ref("demo/consume-2.zson"))
    val staging = loadZson(ref("demo/staging-1.zson"))
    val out = ZedScript.run(spark, ref("demo/update-etl.zed"),
      designPools(raw, Some(staging)), kindCol = "_type")
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Int]("customerID") == 2)
    assert(r.getAs[Int]("menuID") == 100)
    assert(r.getAs[Long]("qty") == 1L)
    assert(r.getAs[Double]("total") == 1 * 5.99) // design.md: total:5.99
  }

  test("Zed-program shaper: source-less pipeline shapes a bound batch") {
    import graft.query.Shaper
    val df = spark.createDataFrame(Seq(
      (1L, "a", 10L), (2L, "b", 4L), (3L, "a", 7L), (4L, "c", 99L)))
      .toDF("offset", "k", "v")
    val shaped = Shaper.shapeZed(df,
      """v >= 5
        || total:=sum(v),n:=count() by k
        || yield { k: k, avg: total / n }""".stripMargin,
      order = Seq("offset"))
    val got = shaped.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(got.keySet == Set("a", "c"))
    assert(got("a") == 8.5 || got("a") == 8L) // sum/count division semantics
    // a script with a `from` must be rejected as a shaper
    val e = intercept[IllegalArgumentException](
      Shaper.shapeZed(df, "from documents | v >= 5"))
    assert(e.getMessage.contains("cannot open"))
  }

  test("README shape.zed verbatim: put with scalar functions shapes the record") {
    import graft.query.Shaper
    // the reference's documented shaper one-liner (README.md:77-79)
    val shapeZed = """value:={upper:to_upper(value.s),words:split(value.s, ",")}"""
    val df = spark.createDataFrame(Seq((0L, "a,b"), (1L, "hi,there,x")))
      .toDF("offset", "s")
      .select(col("offset"), struct(col("s")).as("value"))
    val shaped = Shaper.shapeZed(df, shapeZed, order = Seq("offset"))
    val rows = shaped.orderBy("offset").collect()
    assert(rows(0).getAs[org.apache.spark.sql.Row]("value").getAs[String]("upper") == "A,B")
    assert(rows(1).getAs[org.apache.spark.sql.Row]("value")
      .getAs[scala.collection.Seq[String]]("words") .toSeq == Seq("hi", "there", "x"))
    // split quotes literal separators: '.' must not act as a regex wildcard
    val dots = Shaper.shapeZed(
      spark.createDataFrame(Seq((0L, "a.b"))).toDF("offset", "s")
        .select(col("offset"), struct(col("s")).as("value")),
      """value:={words:split(value.s, ".")}""", order = Seq("offset"))
    assert(dots.collect()(0).getAs[org.apache.spark.sql.Row]("value")
      .getAs[scala.collection.Seq[String]]("words") .toSeq == Seq("a", "b"))
  }

  test("switch routes first-match; put sets nested fields; head/tail bound; join pairs legs") {
    import graft.query.{Shaper, ZedScript}
    val df = spark.createDataFrame(Seq(
      (1L, "c", 10L), (2L, "u", 20L), (3L, "c", 30L), (4L, "x", 40L), (5L, "c", 50L)))
      .toDF("offset", "op", "v")

    // switch: first-match exclusivity + default; nested put via withField
    val routed = Shaper.shapeZed(df,
      """switch (
        |  case op=="c" => kind:="create" | w:=v*2
        |  case v >= 40 => kind:="big" | w:=v
        |  default => kind:="other" | w:=0
        |)""".stripMargin, order = Seq("offset"))
    val byOffset = routed.collect().map(r =>
      r.getAs[Long]("offset") -> (r.getAs[String]("kind"), r.getAs[Long]("w"))).toMap
    assert(byOffset == Map(
      1L -> ("create", 20L), 3L -> ("create", 60L), 5L -> ("create", 100L),
      4L -> ("big", 40L), 2L -> ("other", 0L)))

    // head/tail respect stream order
    val h = Shaper.shapeZed(df, "head 2", order = Seq("offset"))
    assert(h.count() == 2)
    val t = Shaper.shapeZed(df, "tail 2", order = Seq("offset"))
    assert(t.collect().map(_.getAs[Long]("offset")).toSet == Set(4L, 5L))

    // inner join over fork legs with the canonical right:=right assignment
    val joined = ZedScript.run(spark,
      """fork (
        |  => from p | op=="c" | yield {left:this}
        |  => from p | op=="u" | yield {right:this}
        |)
        || join on left.v=right.v right:=right""".stripMargin,
      { case "p" => (df.withColumn("v", col("offset") % 2), Seq("offset")) })
    // left leg: offsets 1,3,5 (v=1,1,1); right leg: offset 2 (v=0) → no pairs
    assert(joined.count() == 0)
    val joined2 = ZedScript.run(spark,
      """fork (
        |  => from p | op=="c" | yield {left:this}
        |  => from p | op=="x" | yield {right:this}
        |)
        || join on left.v=right.v right:=right""".stripMargin,
      { case "p" => (df, Seq("offset")) })
    // left: v 10,30,50; right: offset 4 v 40 → still no pairs; relax to equality that hits
    assert(joined2.count() == 0)
    val joined3 = ZedScript.run(spark,
      """fork (
        |  => from p | yield {left:this}
        |  => from p | yield {right:this}
        |)
        || join on left.offset=right.offset right:=right""".stripMargin,
      { case "p" => (df, Seq("offset")) })
    assert(joined3.count() == 5)
    val r0 = joined3.orderBy(col("left.offset")).collect()(0)
    assert(r0.getAs[org.apache.spark.sql.Row]("left").getAs[Long]("offset") == 1L)
    assert(r0.getAs[org.apache.spark.sql.Row]("right").getAs[Long]("v") == 10L)
  }

  test("review regressions: backslash literals, default after bare filter, ordered head, cut rename drops order") {
    import graft.query.{Shaper, ZedScript}
    val df = spark.createDataFrame(Seq(
      (1L, """C:\temp""", 10L), (2L, "other", 20L), (3L, """dir\""", 30L)))
      .toDF("offset", "s", "v")

    // backslashes in Zed string literals survive into SQL comparisons
    val bs = Shaper.shapeZed(df, """s == "C:\\temp"""", order = Seq("offset"))
    assert(bs.collect().map(_.getAs[Long]("offset")).toSeq == Seq(1L))
    val trailing = Shaper.shapeZed(df, """s == "dir\\"""", order = Seq("offset"))
    assert(trailing.collect().map(_.getAs[Long]("offset")).toSeq == Seq(3L))

    // `default` is a structural keyword, not a juxtaposed filter term
    val sw = Shaper.shapeZed(df.withColumn("flag", col("offset") === 1),
      """switch (
        |  case flag => kind:="one"
        |  default => kind:="rest"
        |)""".stripMargin, order = Seq("offset"))
    assert(sw.collect().map(r => r.getAs[Long]("offset") -> r.getAs[String]("kind")).toMap ==
      Map(1L -> "one", 2L -> "rest", 3L -> "rest"))

    // head takes the FIRST n in stream order, not n arbitrary rows
    val h = Shaper.shapeZed(df.repartition(8), "head 2", order = Seq("offset"))
    assert(h.collect().map(_.getAs[Long]("offset")).toSet == Set(1L, 2L))
    val noOrder = intercept[IllegalArgumentException](
      ZedScript.transform(df, "head 2").collect())
    assert(noOrder.getMessage.contains("stream order"))

    // a nested cut field renamed onto the order column's name must DROP the
    // order (different data), so a following collect errors instead of
    // silently sorting groups by the wrong values
    val renamed = intercept[IllegalArgumentException](
      ZedScript.run(spark,
        """from p
          || cut value.offset, k
          || docs:=collect(this) by k""".stripMargin,
        { case "p" => (df.select(struct(col("v").as("offset")).as("value"))
            .withColumn("k", lit("g")), Seq("offset")) }))
    assert(renamed.getMessage.contains("collect() needs a defined stream order"))
  }

  test("put is simultaneous, invalidates overwritten order; join replaces; misc review fixes") {
    import graft.query.{Shaper, ZedScript}
    val df = spark.createDataFrame(Seq((1L, 10L, 20L))).toDF("offset", "a", "b")

    // Zed put evaluates all RHS against the INPUT record: a:=b, b:=a swaps
    val swapped = Shaper.shapeZed(df, "a:=b, b:=a", order = Seq("offset")).collect()(0)
    assert(swapped.getAs[Long]("a") == 20L && swapped.getAs[Long]("b") == 10L)

    // overwriting the order column drops the order → head errors, not wrong rows
    val e = intercept[IllegalArgumentException](
      Shaper.shapeZed(df, "offset:=0 | head 1", order = Seq("offset")).collect())
    assert(e.getMessage.contains("stream order"))

    // join assignment REPLACES a same-named left column (no ambiguous dup)
    val joined = ZedScript.run(spark,
      """fork (
        |  => from p | yield {k:offset, v:a}
        |  => from p | yield {k:offset, v:b}
        |)
        || join on k=k v:=100""".stripMargin,
      { case "p" => (df, Seq("offset")) })
    val jr = joined.collect()(0)
    assert(jr.schema.fieldNames.count(_ == "v") == 1 && jr.getAs[Int]("v") == 100)

    // quoted record field names with quotes/backslashes are not double-escaped
    val named = Shaper.shapeZed(df, """yield {"it's": a}""", order = Seq("offset"))
    assert(named.schema.fieldNames.toSeq == Seq("it's"))

    // scientific notation with signed exponent
    val sci = Shaper.shapeZed(df, "yield {x: 1e-5, y: 2E+3}", order = Seq("offset")).collect()(0)
    assert(sci.getAs[Double]("x") == 1e-5 && sci.getAs[Double]("y") == 2e3)

    // type bodies may use full Zed type syntax (arrays etc.) — only the name matters
    val typed = ZedScript.run(spark,
      """type t = {ids: [string], m: |{string: int64}|}
        |from p
        || yield cast({offset:offset}, t)""".stripMargin,
      { case "p" => (df, Seq("offset")) })
    assert(typed.collect()(0).getAs[String]("_kind") == "t")

    // fork/switch inside a from leg is rejected at parse time with a clear error
    val legErr = intercept[IllegalArgumentException](
      ZedScript.parse("from ( pool p => fork ( => a == 1 ) ) | head 1"))
    assert(legErr.getMessage.contains("from leg"))

    // cut of a whole struct keeps a nested order key alive
    val env = df.select(struct(col("offset").as("offset")).as("kafka"), col("a"))
    val kept = ZedScript.transform(env, "cut kafka | head 1", order = Seq("kafka.offset"))
    assert(kept.collect().length == 1)
  }

  test("declared named types: yield cast({…}, t) tags the discriminator; is(<t>) finds it") {
    import graft.query.ZedScript
    val df = spark.createDataFrame(Seq((1L, "a"), (2L, "b"))).toDF("offset", "s")
    val out = ZedScript.run(spark,
      """type marker = {offset:int64}
        |from p
        || fork (
        |  => s=="a" | yield cast({offset:offset}, marker)
        |  => s=="b" | yield {offset:offset, s:s}
        |)
        || is(<marker>)""".stripMargin,
      { case "p" => (df, Seq("offset")) })
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("offset") == 1L)
  }

  test("the reference's COMPILED etl program (ztests/etl-zed.yaml) agrees with the native Etl compiler") {
    assume(Files.isDirectory(refDir))
    // the golden stdout of `zync etl -zed invoices.yaml` IS the generated Zed
    // program: type decl, per-topic anti-join fork, first-match switch over
    // the four rules, denorm join over a fork, puts, typed done-marker casts
    val program = {
      import scala.jdk.CollectionConverters._
      val root = new org.yaml.snakeyaml.Yaml()
        .load[java.util.Map[String, Object]](ref("ztests/etl-zed.yaml")).asScala
      root("outputs").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.map(_.asScala).find(_.get("name").map(_.toString.trim).contains("stdout")).get
        .apply("data").toString
    }

    // mid-demo state: batches 1-2 processed, 3-4 loaded but not yet run —
    // the program must compute exactly the delta the native compiler would
    val cfg = ZedEtl.parse(ref("demo/invoices.yaml"))
    val raw = Pool.create(spark, Files.createTempDirectory("zed-raw").toString)
    val staging = Pool.create(spark, Files.createTempDirectory("zed-staging").toString)
    for (i <- 1 to 2) {
      raw.append(loadZson(ref(s"demo/batch-$i.zson")).withColumn("_kind", lit("record")))
      Etl.run(spark, raw, staging, cfg.transform)
    }
    for (i <- 3 to 4)
      raw.append(loadZson(ref(s"demo/batch-$i.zson")).withColumn("_kind", lit("record")))

    val state = Etl.outputState(staging)
    val progDf = ZedScript.run(spark, program,
      {
        case "Raw" => (raw.read(), Seq("kafka.offset"))
        case "Staging" => (staging.read(), Seq("kafka.offset"))
        case other => fail(s"program asked for unknown pool $other")
      },
      kindCol = "_kind")
    val out = progDf.collect()

    val native = Etl.compile(spark, raw.read(), state, cfg.transform)
      .collect()

    def valueStr(r: org.apache.spark.sql.Row, field: String): String = {
      val idx = r.fieldIndex(field)
      if (r.isNullAt(idx)) "null" else r.getStruct(idx).toString
    }
    // records compare on (key, value) — the program keeps the SOURCE offset
    // in kafka (offset assignment is the Go layer's job, pipeline.go:127-164)
    // while the native compiler assigns output offsets
    def hasField(r: org.apache.spark.sql.Row, f: String): Boolean =
      r.schema.fieldNames.contains(f)
    val progRecords = out
      .filter(r => hasField(r, "key") && !r.isNullAt(r.fieldIndex("key")))
      .map(r => (valueStr(r, "key"), valueStr(r, "value"))).toSet
    val nativeRecords = native.filter(_.getAs[String]("_kind") == "record")
      .map(r => (valueStr(r, "key"), valueStr(r, "value"))).toSet
    assert(progRecords == nativeRecords)
    assert(progRecords.size == 5) // Dan + closed + collections + paid ×2

    // markers: flat `_kind='done'` rows plus the denorm {left,right} pairs
    def kafkaPair(r: org.apache.spark.sql.Row): (String, Long) = {
      val k = r.getStruct(r.fieldIndex("kafka"))
      (k.getAs[String]("topic"), k.getAs[Long]("offset"))
    }
    val progMarkers =
      out.filter(r => hasField(r, "_kind") && r.getAs[String]("_kind") == "done")
        .map(kafkaPair).toSet ++
        out.filter(r => hasField(r, "left") && !r.isNullAt(r.fieldIndex("left")))
          .flatMap(r => Seq(
            kafkaPair(r.getStruct(r.fieldIndex("left"))),
            kafkaPair(r.getStruct(r.fieldIndex("right"))))).toSet
    val nativeMarkers = native.filter(_.getAs[String]("_kind") == "done")
      .map(kafkaPair).toSet
    assert(progMarkers == nativeMarkers)
    assert(progMarkers == Set(
      ("Invoices", 4L), ("InvoiceStatus", 4L), ("InvoiceStatus", 5L),
      ("InvoiceStatus", 6L), ("InvoiceStatus", 7L), ("InvoiceStatus", 8L)))

    // the Go layer's post-pass (pipeline.go:93-164): finalized, the program's
    // batch equals the native delta EXACTLY — flat done markers (pairs
    // exploded) and assigned output offsets included — i.e. pool-committable
    val finalized = ZedEtl.finalizeProgramOutput(progDf, "NewInvoices",
      state.baseOffsets).collect()
    def full(r: org.apache.spark.sql.Row): (String, String, Long, String, String) = {
      val k = r.getStruct(r.fieldIndex("kafka"))
      (r.getAs[String]("_kind"), k.getAs[String]("topic"), k.getAs[Long]("offset"),
        valueStr(r, "key"), valueStr(r, "value"))
    }
    assert(finalized.map(full).toSet == native.map(full).toSet)
    assert(finalized.length == native.length)
  }

  test("demo/pending.zed verbatim over the invoices pools finds the held-back record") {
    assume(Files.isDirectory(refDir))
    // rebuild the etl-demo state after batch 2: Invoices/4 (Dan) is loaded
    // but unprocessable until its InvoiceStatus partner arrives in batch 3
    val cfg = ZedEtl.parse(ref("demo/invoices.yaml"))
    val raw = Pool.create(spark, Files.createTempDirectory("pending-raw").toString)
    val staging = Pool.create(spark, Files.createTempDirectory("pending-staging").toString)
    for (i <- 1 to 2) {
      raw.append(loadZson(ref(s"demo/batch-$i.zson")).withColumn("_kind", lit("record")))
      Etl.run(spark, raw, staging, cfg.transform)
    }
    val out = ZedScript.run(spark, ref("demo/pending.zed"),
      {
        case "Raw" => (raw.read(), Seq("kafka.offset"))
        case "Staging" => (staging.read(), Seq("kafka.offset"))
        case other => fail(s"script asked for unknown pool $other")
      },
      kindCol = "_kind")
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[org.apache.spark.sql.Row]("kafka").getAs[String]("topic") == "Invoices")
    assert(r.getAs[org.apache.spark.sql.Row]("kafka").getAs[Long]("offset") == 4L)
    assert(r.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("after").getAs[String]("customer") == "Dan")
  }
}
