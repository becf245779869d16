package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.{ConfluentBody, ConfluentSchemaId, GraftColumnsBridge}

/** Public surface for the native Confluent wire-header expressions (the
  * expressions themselves live in the sql-package bridge,
  * org.apache.spark.sql.graft, because they use `private[sql]` Catalyst
  * types). See SURVEY §4: header parsing is the one custom Catalyst work
  * item — these run inside whole-stage codegen.
  */
object ConfluentFunctions {
  def confluent_schema_id(c: Column): Column =
    GraftColumnsBridge.of(ConfluentSchemaId(GraftColumnsBridge.expr(c)))
  def confluent_body(c: Column): Column =
    GraftColumnsBridge.of(ConfluentBody(GraftColumnsBridge.expr(c)))

  /** Full-body Avro codec expressions (CodegenFallback: body conversion runs
    * via eval, the surrounding projection stays whole-stage codegen).
    */
  def confluent_avro_decode(c: Column, target: org.apache.spark.sql.types.StructType,
      registry: graft.codec.SchemaRegistry): Column =
    GraftColumnsBridge.of(
      org.apache.spark.sql.graft.ConfluentAvroDecode(GraftColumnsBridge.expr(c), target, registry))
  def confluent_avro_encode(c: Column, schemaJson: String, schemaId: Int): Column =
    GraftColumnsBridge.of(
      org.apache.spark.sql.graft.ConfluentAvroEncode(GraftColumnsBridge.expr(c), schemaJson, schemaId))
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) registers the SQL names
  * `confluent_schema_id` / `confluent_body` / `cosine_sim`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("confluent_schema_id"),
      new ExpressionInfo(classOf[ConfluentSchemaId].getName, "confluent_schema_id"),
      (children: Seq[Expression]) => ConfluentSchemaId(children.head)))
    ext.injectFunction((
      FunctionIdentifier("confluent_body"),
      new ExpressionInfo(classOf[ConfluentBody].getName, "confluent_body"),
      (children: Seq[Expression]) => ConfluentBody(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.graft.CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.TopKByScore].getName, "top_k_by_score"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.graft.TopKByScore(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("nearest_centroids"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.NearestCentroids].getName,
        "nearest_centroids"),
      (children: Seq[Expression]) => {
        if (children.length != 3)
          throw new IllegalArgumentException(
            s"nearest_centroids(vector, centroids, nprobe) takes 3 arguments, got ${children.length}")
        // third arg is the nprobe knob — a plan-time constant by contract
        // (it shapes the output arity), like top_k_by_score's k
        val nprobe = children(2) match {
          case e if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"nearest_centroids: nprobe must be a non-null integer literal, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"nearest_centroids: nprobe must be a literal, got $other")
        }
        org.apache.spark.sql.graft.NearestCentroids(children(0), children(1), nprobe)
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.graft.PqEncode(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_score"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.PqAdcScore].getName, "pq_adc_score"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.graft.PqAdcScore(children(0), children(1), children(2), children(3))))
  }
}
