package graft.pool

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Heterogeneous-pool schema handling (SURVEY §1.1, §7.4.1): a single pool
  * interleaves many record shapes (JDBC records, done markers, per-topic
  * value types — e.g. the reference's Staging pool, etl/pipeline.go:101-115;
  * per-topic outer-type cache, fifo/consumer.go:150-182).
  *
  * Spark tables need one schema, so writers normalize every batch to the
  * evolving superset: struct fields merged recursively by name, absent
  * fields null. Readers filter on `_kind`/topic and project the shape they
  * expect. Merging is plan-time only — the data path stays codegen'd casts.
  */
object SchemaUnion {

  /** Recursive by-name merge of two types. Conflicting primitive types
    * widen to their common type when Spark has one, else error (mirrors the
    * reference failing on incompatible registry schemas).
    */
  def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (x: StructType, y: StructType) =>
      val yFields = y.fields.map(f => f.name -> f).toMap
      val merged = x.fields.map { f =>
        yFields.get(f.name) match {
          case Some(g) => StructField(f.name, merge(f.dataType, g.dataType), nullable = true)
          case None => f.copy(nullable = true)
        }
      }
      val extra = y.fields.filterNot(f => x.fieldNames.contains(f.name)).map(_.copy(nullable = true))
      StructType(merged ++ extra)
    case (ArrayType(x, _), ArrayType(y, _)) => ArrayType(merge(x, y), containsNull = true)
    case (x: NumericType, y: NumericType) =>
      val order = Seq[DataType](ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      val (ix, iy) = (order.indexOf(x), order.indexOf(y))
      if (ix >= 0 && iy >= 0) order(ix max iy)
      else err(x, y)
    case (x, y) => err(x, y)
  }

  private def err(x: DataType, y: DataType): Nothing =
    throw new IllegalArgumentException(s"cannot union types $x and $y")

  def merge(schemas: Seq[StructType]): StructType =
    schemas.map(_.asInstanceOf[DataType]).reduce(merge).asInstanceOf[StructType]

  /** Cast a column to the target type, inserting nulls for absent struct
    * fields (recursive, name-based — positional `cast` would mis-bind).
    */
  def conform(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c
    case (f: StructType, t: StructType) =>
      val parts = t.fields.map { tf =>
        f.fields.find(_.name == tf.name) match {
          case Some(ff) => conform(c.getField(tf.name), ff.dataType, tf.dataType).as(tf.name)
          case None => lit(null).cast(tf.dataType).as(tf.name)
        }
      }
      when(c.isNull, lit(null).cast(t)).otherwise(struct(parts.toIndexedSeq: _*))
    case (ArrayType(f, _), ArrayType(t, _)) =>
      transform(c, x => conform(x, f, t))
    case (_, t) => c.cast(t)
  }

  /** Align a batch to the superset schema (absent columns null). */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val cols = target.fields.map { tf =>
      df.schema.fields.find(_.name == tf.name) match {
        case Some(ff) => conform(col(tf.name), ff.dataType, tf.dataType).as(tf.name)
        case None => lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Union arbitrarily-shaped batches through their merged superset. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    val target = merge(dfs.map(_.schema))
    dfs.map(align(_, target)).reduce(_ unionByName _)
  }
}
