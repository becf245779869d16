package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User shaper: the reference applies an arbitrary Zed script to every record
  * batch in either sync direction (fifo/lake.go:86-88, 94-106;
  * cmd/zync/from-kafka/command.go:276-282). Spark-natively a shaper is SQL
  * text (or a DataFrame transform) applied to the bound input — Catalyst then
  * optimizes shaper + surrounding pipeline as one plan, unlike the
  * reference's opaque remote execution.
  */
object Shaper {

  /** Run SQL against whatever views are registered in the session. */
  def run(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** Bind `df` as the view `this_` and apply the shaper SQL to it.
    * (`this` is the reference's implicit input; SQL identifiers can't be a
    * Scala keyword-free `this`, so the view is named `this_`.)
    *
    * The SQL's `this_` token is rewritten to a unique per-call view name, so
    * concurrent streams on one SparkSession (the fan-out pattern) can't race
    * on a shared view between micro-batches; the view is dropped right after
    * analysis (spark.sql resolves it eagerly, the returned plan doesn't need
    * it anymore).
    */
  def shape(df: DataFrame, sql: String): DataFrame = {
    val name = "this_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val bound = sql.replaceAll("\\bthis_\\b", name)
    df.createOrReplaceTempView(name)
    try df.sparkSession.sql(bound)
    finally df.sparkSession.catalog.dropTempView(name)
  }

  /** Functional shaper variant — zero-cost composition into the plan. */
  def shape(df: DataFrame, f: DataFrame => DataFrame): DataFrame = f(df)

  /** Zed-program shaper — the reference's native shaper surface
    * (cli/shaper.go:8-22 takes a Zed script, applied per batch in either
    * sync direction). The script is a source-less stage pipeline compiled by
    * [[ZedScript]]; like the SQL form, the compiled stages fuse into the
    * surrounding plan under Catalyst. `order` is the bound input's stream
    * order (envelope batches arrive offset-ordered), needed only by
    * `collect`.
    */
  def shapeZed(df: DataFrame, zed: String,
      order: Seq[String] = Seq("kafka.offset"),
      kindCol: String = "_kind"): DataFrame =
    ZedScript.transform(df, zed, order, kindCol)
}
