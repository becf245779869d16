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
    */
  def shape(df: DataFrame, sql: String): DataFrame = {
    val name = s"this_"
    df.createOrReplaceTempView(name)
    df.sparkSession.sql(sql)
  }

  /** Functional shaper variant — zero-cost composition into the plan. */
  def shape(df: DataFrame, f: DataFrame => DataFrame): DataFrame = f(df)
}
