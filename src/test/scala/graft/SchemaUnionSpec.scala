package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.pool.SchemaUnion

class SchemaUnionSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  test("recursive struct merge: by-name, absent fields nullable, widening") {
    val a = StructType.fromDDL("kafka struct<topic:string,offset:long>, value struct<x:int>")
    val b = StructType.fromDDL("kafka struct<topic:string,offset:long>, value struct<y:string>, _kind string")
    val m = SchemaUnion.merge(Seq(a, b))
    assert(m.fieldNames.toSeq == Seq("kafka", "value", "_kind"))
    assert(m("value").dataType == StructType.fromDDL("x int, y string"))
    assert(SchemaUnion.merge(IntegerType, LongType) == LongType)
    assert(SchemaUnion.merge(FloatType, LongType) == FloatType)
    intercept[IllegalArgumentException](SchemaUnion.merge(StringType, LongType))
  }

  test("unionAll aligns heterogeneous batches into the superset") {
    val a = spark.createDataFrame(
      Seq(Row(Row("T", 0L), Row(1))).asJava,
      StructType.fromDDL("kafka struct<topic:string,offset:long>, value struct<x:int>"))
    val b = spark.createDataFrame(
      Seq(Row(Row("T", 1L), "done")).asJava,
      StructType.fromDDL("kafka struct<topic:string,offset:long>, _kind string"))
    val u = SchemaUnion.unionAll(Seq(a, b)).orderBy("kafka.offset").collect()
    assert(u.length == 2)
    assert(u(0).getStruct(1).getInt(0) == 1 && u(0).isNullAt(2))     // record row: value.x=1, _kind null
    assert(u(1).isNullAt(1) && u(1).getString(2) == "done")          // marker row: value null
  }
}
