package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ConfluentFunctions._

class ExpressionSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def wireDF(rows: Array[Byte]*) =
    spark.createDataFrame(rows.map(Row(_)).asJava,
      StructType(Seq(StructField("b", BinaryType))))

  test("confluent_schema_id decodes big-endian ids inside codegen") {
    val df = wireDF(
      Array[Byte](0, 0, 0, 0, 1, 9),
      Array[Byte](0, 0, 1, 0, 0, 9),       // 65536
      Array[Byte](0, 0x12, 0x34, 0x56, 0x78, 9),
      null)
    val got = df.select(confluent_schema_id(col("b")).as("id")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(Some(1), Some(65536), Some(0x12345678), None))
  }

  test("header expressions compile under codegen with fallback disabled") {
    // Guards the regression where the stripMargin template ate a line-leading
    // `|` OR-operator and Janino silently fell back to interpreted eval.
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = wireDF(Array[Byte](0, 0x12, 0x34, 0x56, 0x78, 9, 9))
      val r = df.select(
        confluent_schema_id(col("b")).as("id"),
        octet_length(confluent_body(col("b"))).as("n")).collect()(0)
      assert(r.getInt(0) == 0x12345678 && r.getInt(1) == 2)
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("cosine_sim matches the fold formulation and compiles codegen-only") {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val schema = StructType(Seq(
        StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(DoubleType))))
      val df = spark.createDataFrame(Seq(
        Row(Seq(1.0f, 2.0f, 3.0f), Seq(1.0, 2.0, 3.0)),     // identical → 1.0
        Row(Seq(1.0f, 0.0f), Seq(0.0, 1.0)),                // orthogonal → 0.0
        Row(Seq(1.0f, 2.0f), Seq(1.0, 2.0, 3.0)),           // length mismatch → null
        Row(Seq(1.0f, 2.0f), null),                          // null input → null
        Row(Seq(3.0f, 4.0f), Seq(4.0, 3.0))).asJava, schema)
      val got = df.select(
        graft.ops.Similarity.cosine(col("a"), col("b")).as("c")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(got(0).exists(v => math.abs(v - 1.0) < 1e-12))
      assert(got(1).contains(0.0))
      assert(got(2).isEmpty && got(3).isEmpty)
      assert(got(4).exists(v => math.abs(v - 24.0 / 25.0) < 1e-12))
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("cosine_sim rejects non-numeric arrays at analysis time") {
    val df = spark.createDataFrame(Seq(Row(Seq("x"), Seq("y"))).asJava,
      StructType(Seq(
        StructField("a", ArrayType(StringType)),
        StructField("b", ArrayType(StringType)))))
    val e = intercept[Exception](
      df.select(graft.ops.Similarity.cosine(col("a"), col("b"))).collect())
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("confluent_body strips exactly the 5-byte header") {
    val df = wireDF(Array[Byte](0, 0, 0, 0, 1, 10, 20, 30))
    val body = df.select(confluent_body(col("b"))).collect()(0).getAs[Array[Byte]](0)
    assert(body.toSeq == Seq[Byte](10, 20, 30))
  }

  test("bad magic / short input raise the wire-format error") {
    val bad = wireDF(Array[Byte](1, 0, 0, 0, 1, 9))
    val e = intercept[Exception](bad.select(confluent_schema_id(col("b"))).collect())
    assert(e.getMessage.contains("Confluent wire header") ||
      e.getCause.getMessage.contains("Confluent wire header"))
  }

  test("nearest_centroids: fused top-n matches the declarative ordering") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.graft.{GraftColumnsBridge, NearestCentroids}
    val centType = ArrayType(StructType(Seq(
      StructField("cid", LongType), StructField("cv", ArrayType(DoubleType)))))
    val df = spark.createDataFrame(
      Seq(Row(Seq(1.0, 0.0), Seq(
        Row(10L, Seq(1.0, 0.1)),   // best
        Row(20L, Seq(1.0, 0.1)),   // same vector: cid tiebreak → after 10
        Row(30L, Seq(0.0, 1.0)),   // orthogonal
        Row(40L, Seq(1.0, 0.0, 9.9)) // length mismatch → null cos, sorts last
      ))).asJava,
      StructType(Seq(StructField("v", ArrayType(DoubleType)),
        StructField("cents", centType))))
    def top(n: Int) = df.select(GraftColumnsBridge.of(NearestCentroids(
        GraftColumnsBridge.expr(col("v")), GraftColumnsBridge.expr(col("cents")), n)).as("t"))
      .selectExpr("transform(t, x -> x.cid) AS ids").collect()(0).getSeq[Long](0)
    assert(top(1) == Seq(10L))
    assert(top(3) == Seq(10L, 20L, 30L))
    assert(top(9) == Seq(10L, 20L, 30L, 40L)) // nprobe > K: all, null-cos last
  }

  test("nearest_centroids: same ids with different vectors re-decode; null cid orders without NPE") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.graft.NearestCentroids
    val centType = ArrayType(StructType(Seq(
      StructField("cid", LongType), StructField("cv", ArrayType(DoubleType)))))
    val expr = NearestCentroids(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, centType, nullable = true), 2)
    def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    def cents(rows: (java.lang.Long, Seq[Double])*): ArrayData = new GenericArrayData(
      rows.map { case (id, v) => new GenericInternalRow(Array[Any](id,
        if (v == null) null else ArrayData.toArrayData(v.toArray))) }.toArray[Any])
    def cids(v: Seq[Double], cs: ArrayData): Seq[Any] = {
      val out = expr.eval(InternalRow(ArrayData.toArrayData(v.toArray), cs))
        .asInstanceOf[GenericArrayData]
      (0 until out.numElements()).map { i =>
        val s = out.getStruct(i, 2)
        if (s.isNullAt(1)) null else s.getLong(1)
      }
    }
    // first eval populates the per-instance plane cache
    assert(cids(Seq(1.0, 0.0), cents(jl(10) -> Seq(1.0, 0.0), jl(20) -> Seq(0.0, 1.0)))
      == Seq(10L, 20L))
    // same ids, swapped vectors: a stale cache would still answer 10 first
    assert(cids(Seq(1.0, 0.0), cents(jl(10) -> Seq(0.0, 1.0), jl(20) -> Seq(1.0, 0.0)))
      == Seq(20L, 10L))
    // tied cosines with a null centroid id: cid ASC NULLS FIRST, no NPE
    assert(cids(Seq(1.0, 0.0), cents((null: java.lang.Long) -> Seq(1.0, 0.0),
      jl(10) -> Seq(1.0, 0.0))) == Seq(null, 10L))
  }

  test("SQL names registered via GraftExtensions") {
    wireDF(Array[Byte](0, 0, 0, 0, 7, 1)).createOrReplaceTempView("wire")
    val r = spark.sql("SELECT confluent_schema_id(b) AS id, octet_length(confluent_body(b)) AS n FROM wire")
      .collect()(0)
    assert(r.getInt(0) == 7 && r.getInt(1) == 1)
    val c = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(4.0d, 3.0d)) AS c").collect()(0)
    assert(math.abs(c.getDouble(0) - 24.0 / 25.0) < 1e-12)
    // aggregate registration: top-2 of (score, id) pairs by score desc
    val t = spark.sql(
      "SELECT top_k_by_score(s, id, 2) AS top FROM VALUES (1.0d, 10L), (3.0d, 30L), (2.0d, 20L) AS v(s, id)")
      .selectExpr("transform(top, x -> x.payload) AS ids").collect()(0)
    assert(t.getSeq[Long](0) == Seq(30L, 20L))
    // nearest_centroids: nprobe literal, centroid array<struct<cid,cv>>
    val n = spark.sql(
      """SELECT nearest_centroids(array(1.0d, 0.0d),
        |  array(named_struct('cid', 1L, 'cv', array(0.0d, 1.0d)),
        |        named_struct('cid', 2L, 'cv', array(1.0d, 0.0d))), 1) AS cells""".stripMargin)
      .selectExpr("transform(cells, x -> x.cid) AS cids").collect()(0)
    assert(n.getSeq[Long](0) == Seq(2L))
    val err = intercept[Exception](spark.sql(
      "SELECT nearest_centroids(array(1.0d), array(named_struct('cid', 1L, 'cv', array(1.0d))), id) FROM range(1)"))
    assert(err.getMessage.contains("literal"))
  }

  test("top_k_by_score carries struct payloads through the partial-merge shuffle") {
    // 8 input partitions force real partial buffers + serialized merge;
    // payload carries the id AND a label so no re-join is needed
    val t = spark.range(0, 100, 1, 8)
      .selectExpr("id", "CAST(id % 7 AS DOUBLE) AS s",
        "named_struct('nid', id, 'tag', concat('t', CAST(id % 3 AS STRING))) AS p")
      .groupBy()
      .agg(graft.ops.Similarity.topKByScore(
        org.apache.spark.sql.functions.col("s"),
        org.apache.spark.sql.functions.col("p"), 3).as("top"))
      .selectExpr("transform(top, x -> x.payload.nid) AS ids",
        "transform(top, x -> x.payload.tag) AS tags")
      .collect()(0)
    // score = id % 7, max score 6 at ids 6,13,20,... tie-break payload ASC
    // → struct comparison leads with nid: 6, 13, 20
    assert(t.getSeq[Long](0) == Seq(6L, 13L, 20L))
    assert(t.getSeq[String](1) == Seq("t0", "t1", "t2"))
  }

  test("unicode_normalize compiles codegen-only and composes/decomposes") {
    // Guards the nested-enum reference: the binary type name
    // (java.text.Normalizer$Form) would make Janino reject the generated
    // cast and silently drop the projection to interpreted eval.
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import org.apache.spark.sql.functions.{col, length}
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row("Café"),
          org.apache.spark.sql.Row("é")),
        org.apache.spark.sql.types.StructType.fromDDL("s string"))
      val out = df.select(
        graft.ops.TextOps.unicodeNormalize(col("s"), "NFC").as("c"),
        length(graft.ops.TextOps.unicodeNormalize(col("s"), "NFD")).as("dlen"))
        .collect()
      assert(out(0).getString(0) == "Café" && out(0).getInt(1) == 5)
      assert(out(1).getString(0) == "é" && out(1).getInt(1) == 2)
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

}
