package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The driver-checked operator inventory (SURVEY.md §2).
  *
  * Each entry is a Spark-first implementation of one reference operator,
  * exercised against the driver's synthetic tables, paired with ANSI/DuckDB
  * SQL computing the identical result (same column names — the driver's
  * compare sorts columns by name and hashes values).
  *
  * Scale notes are inline: every query here must survive a 1000-executor /
  * 100 TB scale-up — filters push to parquet scans, small dims broadcast,
  * aggregations are partial (map-side) by construction.
  */
object Queries {

  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      headline: Boolean = false)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** events with `ts` as raw epoch-NANOSECOND longs, whichever physical
    * type the driver generated: TIMESTAMP(NANOS) parquet loads as ns longs
    * under `nanosAsLong`; TIMESTAMP(MICROS) (the round-8 regeneration)
    * loads as timestamp_ntz and is converted here (µs → ns; the session tz
    * is pinned UTC everywhere, so the ntz→instant cast matches the
    * oracle's `epoch_ns` of DuckDB's naive timestamp). Keeps every
    * downstream window/as-of/range computation on engine-exact integer ns.
    */
  private def eventsNs(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => ev
      case _ => ev.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * 1000)
    }
  }

  // ---------------------------------------------------------------------------
  // §2.3 Q1–Q32: relational / dataflow surface
  // ---------------------------------------------------------------------------

  val relational: Map[String, Q] = Map(

    // Q1 filter equality (fifo/lake.go:65 `kafka.topic=='T'`)
    "q01_filter_eq" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin)),

    // Q2 filter range (fifo/lake.go:85 `kafka.offset >= N`) — pushes to parquet
    // row-group stats; on a pool sorted by the key this prunes most of the scan.
    "q02_filter_range" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") >= 45)
          .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem WHERE l_quantity >= 45""".stripMargin)),

    // Q3 set membership (demo/invoices.yaml:14 `value.op in ["c","r"]`)
    "q03_filter_in" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_returnflag").isin("A", "N"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, count(*) AS cnt
             |FROM lineitem WHERE l_returnflag IN ('A','N')
             |GROUP BY l_returnflag""".stripMargin)),

    // Q4 conjunction (etl/build.go:166-168)
    "q04_filter_and" -> Q(
      (s, d) =>
        t(s, d, "events")
          .filter(col("event_type") === "purchase" && col("value") > 100 && col("user_id") < 50)
          .select("event_id", "user_id", "value"),
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'purchase' AND value > 100 AND user_id < 50""".stripMargin)),

    // Q5 type-test filter `is(<done>)` (etl/build.go:114) — named types become a
    // `_kind` discriminator column (SURVEY §1.1).
    "q05_filter_kind" -> Q(
      (s, d) =>
        t(s, d, "events")
          .withColumn("_kind", when(col("event_type") === "error", "done").otherwise("record"))
          .filter(col("_kind") === "done")
          .select("event_id", "_kind"),
      Some("""SELECT event_id, 'done' AS _kind FROM events WHERE event_type = 'error'""")),

    // Q6 head N (fifo/lake.go:85) — orderBy+limit compiles to TakeOrderedAndProject
    // (distributed top-k heap), not a global sort.
    "q06_head" -> Q(
      (s, d) =>
        t(s, d, "orders").orderBy("o_orderkey").limit(10)
          .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10""")),

    // Q7 tail 1 on the pool key (fifo/lake.go:63-65 resume-offset query)
    "q07_tail1" -> Q(
      (s, d) =>
        t(s, d, "events").orderBy(col("event_id").desc).limit(1)
          .select("event_id", "event_type", "user_id"),
      Some("""SELECT event_id, event_type, user_id FROM events
             |ORDER BY event_id DESC LIMIT 1""".stripMargin)),

    // Q8 per-group top-1 (design.md:145-161 switch/head-1 idiom)
    "q08_top1_per_group" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
        t(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type")
      },
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin)),

    // Q9 sort (fifo/lake.go:87-89) — global range-partitioned sort
    "q09_sort" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate").cast("date").as("ship_date")),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
             |FROM lineitem ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin)),

    // Q10 cut with rename (demo/update.zed:3; design.md:128)
    "q10_cut" -> Q(
      (s, d) =>
        t(s, d, "customer").select(col("c_name").as("name"), col("c_acctbal").as("balance")),
      Some("""SELECT c_name AS name, c_acctbal AS balance FROM customer""")),

    // Q11 yield: wrap as struct, then unwrap (etl/build.go:171 `yield {left:this}`)
    "q11_yield_struct" -> Q(
      (s, d) =>
        t(s, d, "orders")
          .select(struct(col("o_orderkey"), col("o_totalprice")).as("o"))
          .select(col("o.o_orderkey").as("k"), col("o.o_totalprice").as("p")),
      Some("""SELECT o_orderkey AS k, o_totalprice AS p FROM orders""")),

    // Q12 nested field put (etl/build.go:176-178) — Column.withField, no rebuild
    "q12_put_withfield" -> Q(
      (s, d) =>
        t(s, d, "events")
          .select(struct(col("event_id"), col("user_id")).as("kafka"))
          .withColumn("kafka", col("kafka").withField("user_id", col("kafka.user_id") + 1000))
          .select(col("kafka.event_id").as("event_id"), col("kafka.user_id").as("shifted_user")),
      Some("""SELECT event_id, user_id + 1000 AS shifted_user FROM events""")),

    // Q13 record construction (demo/invoices.yaml:18-27 `out:={key:…,value:{…}}`)
    "q13_record_construct" -> Q(
      (s, d) =>
        t(s, d, "orders")
          .select(struct(
            struct(col("o_orderkey")).as("key"),
            struct(col("o_custkey"), col("o_totalprice")).as("value")).as("out"))
          .select(col("out.key.o_orderkey").as("id"), col("out.value.o_totalprice").as("total")),
      Some("""SELECT o_orderkey AS id, o_totalprice AS total FROM orders""")),

    // Q14 cast to named marker type (etl/build.go:181 `cast({kafka:…},done)`)
    "q14_cast_done" -> Q(
      (s, d) =>
        t(s, d, "events")
          .filter(col("event_type") === "error")
          .select(
            struct(col("event_id").as("offset"), lit("topic1").as("topic")).as("kafka"),
            lit("done").as("_kind"))
          .select(col("kafka.offset").as("offset"), col("kafka.topic").as("topic"), col("_kind")),
      Some("""SELECT event_id AS offset, 'topic1' AS topic, 'done' AS _kind
             |FROM events WHERE event_type = 'error'""".stripMargin)),

    // Q15 typed null (demo/invoices.yaml:58-61 `cast(null, typeof(…))`)
    "q15_typed_null" -> Q(
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderkey"),
            lit(null).cast("struct<id:bigint,status:string>").as("before"))
          .select(col("o_orderkey"), col("before.id").as("before_id")),
      Some("""SELECT o_orderkey, CAST(NULL AS BIGINT) AS before_id FROM orders""")),

    // Q16 group-by max (etl/pool.go:60-66 next-offset query) — partial agg
    // map-side, tiny shuffle: one row per group.
    "q16_groupby_max" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("event_type").as("topic"))
          .agg(max("event_id").as("offset")),
      Some("""SELECT event_type AS topic, max(event_id) AS offset
             |FROM events GROUP BY event_type""".stripMargin)),

    // Q17 ordered collect (design.md:259-263) — collect_list is order-
    // nondeterministic in Spark, so sort the collected structs (SURVEY §7.4.3).
    "q17_collect_ordered" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy("user_id")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("event_id"), col("event_type")))),
              x => x.getField("event_type")),
            ",").as("seq")),
      Some("""SELECT user_id, string_agg(event_type, ',' ORDER BY event_id) AS seq
             |FROM events GROUP BY user_id""".stripMargin)),

    // Q18 boolean-or aggregate (design.md:262 `done:=or(value.done)`)
    "q18_bool_or" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(bool_or(col("value") > 150).as("has_big")),
      Some("""SELECT event_type, bool_or(value > 150) AS has_big
             |FROM events GROUP BY event_type""".stripMargin)),

    // Q19 plain max/min (design.md:279,329)
    "q19_max" -> Q(
      (s, d) =>
        t(s, d, "events").agg(max("event_id").as("max_offset"), min("event_id").as("min_offset")),
      Some("""SELECT max(event_id) AS max_offset, min(event_id) AS min_offset FROM events""")),

    // Q20 inner equi-join (etl/build.go:202) — dim side broadcast: no shuffle of
    // the fact table at any scale.
    "q20_join_inner" -> Q(
      (s, d) =>
        t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"),
            // exact decimal sum, then DOUBLE for engine-identical rendering
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total")),
      Some("""SELECT c_mktsegment, count(*) AS cnt,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // Q21 anti join (etl/build.go:111-116 dedup-vs-done) — done-key side is
    // small → broadcast left-anti, the exactly-once workhorse.
    "q21_anti_join" -> Q(
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // Q22 multi-source from(pool A, pool B) (etl/build.go:111-116)
    "q22_multi_source" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, count(*) AS cnt
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY l_returnflag""".stripMargin)),

    // Q23 fork: N branches over one input, merged (etl/build.go:130-138)
    "q23_fork" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        val byType = ev.groupBy("event_type")
          .agg(count(lit(1)).as("cnt"))
          .select(lit("type").as("branch"), col("event_type").as("key"), col("cnt"))
        val byUser = ev.groupBy("user_id")
          .agg(count(lit(1)).as("cnt"))
          .select(lit("user").as("branch"), col("user_id").cast("string").as("key"), col("cnt"))
        byType.unionByName(byUser)
      },
      Some("""SELECT 'type' AS branch, event_type AS key, count(*) AS cnt FROM events GROUP BY event_type
             |UNION ALL
             |SELECT 'user' AS branch, CAST(user_id AS VARCHAR) AS key, count(*) AS cnt FROM events GROUP BY user_id""".stripMargin)),

    // Q24 switch/case routing (etl/build.go:92-107) — disjoint predicate
    // branches + union; Catalyst collapses to a single scan per branch filter.
    "q24_switch" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), (col("value") * 2).as("out"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), lit(-1.0).as("out"))
        val rest = ev.filter(!col("event_type").isin("purchase", "error"))
          .select(col("event_id"), col("value").as("out"))
        purchases.unionByName(errors).unionByName(rest)
      },
      Some("""SELECT event_id,
             |  CASE WHEN event_type = 'purchase' THEN value * 2
             |       WHEN event_type = 'error' THEN -1.0
             |       ELSE value END AS out
             |FROM events""".stripMargin)),

    // Q25 heterogeneous union (etl/build.go:107) — unionByName with missing cols
    "q25_union_hetero" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        val a = ev.filter(col("event_type") === "purchase").select(col("event_id"), col("value"))
        val b = ev.filter(col("event_type") === "error").select(col("event_id"), col("user_id"))
        a.unionByName(b, allowMissingColumns = true)
      },
      Some("""SELECT event_id, value, CAST(NULL AS BIGINT) AS user_id FROM events WHERE event_type = 'purchase'
             |UNION ALL
             |SELECT event_id, CAST(NULL AS DOUBLE) AS value, user_id FROM events WHERE event_type = 'error'""".stripMargin)),

    // Q26 const map literal + index (demo/etl.zed:1-18)
    "q26_const_map" -> Q(
      (s, d) => {
        val codes = typedLit(Map("click" -> 1, "purchase" -> 2, "signup" -> 3, "error" -> 4))
        t(s, d, "events")
          .select(col("event_id"), coalesce(element_at(codes, col("event_type")), lit(0)).as("type_code"))
      },
      Some("""SELECT event_id,
             |  CASE event_type WHEN 'click' THEN 1 WHEN 'purchase' THEN 2
             |       WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE 0 END AS type_code
             |FROM events""".stripMargin)),

    // Q27 array index / nested path (demo/etl.zed:15-17) — 1-based element_at
    "q27_array_index" -> Q(
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            element_at(split(col("text"), " "), 1).as("w1"),
            element_at(split(col("text"), " "), 3).as("w3")),
      Some("""SELECT doc_id, string_split(text, ' ')[1] AS w1, string_split(text, ' ')[3] AS w3
             |FROM documents""".stripMargin)),

    // Q28 scalar string functions (README.md:76-85 to_upper/split)
    "q28_string_funcs" -> Q(
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_custkey"),
            upper(col("c_mktsegment")).as("seg_upper"),
            element_at(split(col("c_name"), "#"), -1).as("name_tail")),
      Some("""SELECT c_custkey, upper(c_mktsegment) AS seg_upper,
             |       string_split(c_name, '#')[-1] AS name_tail
             |FROM customer""".stripMargin)),

    // Q29 typeof (demo/invoices.yaml:60) — schemas are plan-time in Spark, so
    // typeof reflects over the resolved StructType.
    "q29_typeof" -> Q(
      (s, d) => {
        val sch = t(s, d, "lineitem").schema
        val rows = sch.fields.toSeq.map(f => (f.name, f.dataType.simpleString))
        s.createDataFrame(rows).toDF("col_name", "col_type")
      },
      Some("""SELECT * FROM (VALUES
             |  ('l_orderkey','bigint'), ('l_partkey','bigint'), ('l_suppkey','bigint'),
             |  ('l_linenumber','int'), ('l_quantity','double'), ('l_extendedprice','double'),
             |  ('l_discount','double'), ('l_tax','double'), ('l_returnflag','string'),
             |  ('l_linestatus','string'), ('l_shipdate','timestamp_ntz')) AS t(col_name, col_type)""".stripMargin)),

    // Q30 arithmetic (demo/etl.zed:17 qty*price) — decimal casts make the sums
    // exact and engine-independent.
    "q30_arithmetic" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            // exact decimal sums, then DOUBLE so Spark's DECIMAL(28,2) and
            // DuckDB's DECIMAL(38,2) render identically for the hash compare
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
              .cast("double").as("revenue")),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      headline = true),

    // Q31 user shaper: arbitrary SQL applied to the bound input (fifo/lake.go:86-88)
    "q31_shaper" -> Q(
      (s, d) => {
        Tables.registerViews(s, d)
        query.Shaper.run(s,
          """SELECT event_id, upper(event_type) AS op, value * 2 AS doubled
            |FROM events WHERE value > 100""".stripMargin)
      },
      Some("""SELECT event_id, upper(event_type) AS op, value * 2 AS doubled
             |FROM events WHERE value > 100""".stripMargin)),

    // Q32 offset assignment (etl/pipeline.go:127-164): consecutive per-topic
    // offsets continuing from the output pool's max — window row_number + base.
    "q32_offset_assign" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        val base = ev.filter(col("event_id") < 800)
          .groupBy("event_type").agg(max("event_id").as("base"))
        val fresh = ev.filter(col("event_id") >= 800)
          .withColumn("rn",
            row_number().over(Window.partitionBy("event_type").orderBy("event_id")))
        fresh.join(broadcast(base), Seq("event_type"), "left")
          .select(col("event_type").as("topic"), col("event_id"),
            (coalesce(col("base"), lit(-1L)) + col("rn")).as("new_offset"))
      },
      Some("""WITH base AS (
             |  SELECT event_type, max(event_id) AS base FROM events WHERE event_id < 800 GROUP BY event_type),
             |fresh AS (
             |  SELECT event_type, event_id,
             |         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
             |  FROM events WHERE event_id >= 800)
             |SELECT f.event_type AS topic, f.event_id,
             |       coalesce(b.base, -1) + f.rn AS new_offset
             |FROM fresh f LEFT JOIN base b ON f.event_type = b.event_type""".stripMargin))
  )

  /** Beyond-reference streaming extension (SURVEY T8 notes the reference has
    * no event-time windows; Structured Streaming gives them for free): the
    * batch form of a tumbling event-time window. `ts` arrives as raw epoch-ns
    * longs via [[eventsNs]] (whichever physical type the parquet carries),
    * so the hour bucket is integer division — engine-exact.
    */
  val extensions: Map[String, Q] = Map(
    "q33_time_window" -> Q(
      (s, d) =>
        eventsNs(s, d)
          .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total")),
      Some("""SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_bucket,
             |       event_type, count(*) AS cnt,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Sliding windows (1 h length, 30 min slide): every event belongs to
    // exactly two windows — explode the two slide buckets. Integral ns
    // arithmetic end-to-end.
    "q34_sliding_window" -> Q(
      (s, d) => {
        val slide = 1800000000000L // 30 min in ns
        eventsNs(s, d)
          .withColumn("k", explode(array(
            expr(s"ts div ${slide}L - 1"), expr(s"ts div ${slide}L"))))
          .groupBy((col("k") * slide).as("window_start_ns"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT k * 1800000000000 AS window_start_ns, event_type, count(*) AS cnt
             |FROM (SELECT event_type,
             |             unnest([epoch_ns(ts) // 1800000000000 - 1,
             |                     epoch_ns(ts) // 1800000000000]) AS k
             |      FROM events)
             |GROUP BY 1, 2""".stripMargin)),

    // Session windows (30 min inactivity gap) per user: gaps-and-islands —
    // a new session starts where the gap from the previous event exceeds
    // the threshold; session id is the running count of session starts.
    "q35_session_window" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        eventsNs(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull || col("ts") - col("prev_ts") > 1800000000000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("cnt"),
            ((max(col("ts")) - min(col("ts"))) / lit(1000000000L)).cast("long").as("duration_sec"))
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
             |         CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |                OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |                   > 1800000000000
             |              THEN 1 ELSE 0 END AS new_session
             |  FROM events),
             |sess AS (
             |  SELECT user_id, tns,
             |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY tns, event_id
             |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM marked)
             |SELECT user_id, session_id, count(*) AS cnt,
             |       CAST((max(tns) - min(tns)) // 1000000000 AS BIGINT) AS duration_sec
             |FROM sess GROUP BY 1, 2""".stripMargin)),

    // As-of join (extension, like the windows — SURVEY §2.5 absence): each
    // click enriched with the user's most recent preceding error. The Spark
    // side is the single-shuffle union+window formulation (no join blow-up);
    // the oracle is DuckDB's native ASOF JOIN — two independent
    // implementations of the semantics.
    "q36_asof_join" -> Q(
      (s, d) => {
        val ev = eventsNs(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id").as("err_id"))
        graft.ops.AsOf.asofJoin(clicks, errors, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightPayload = Seq("err_id", "ts"),
          joinType = "inner")
          // µs output on both sides: Spark reads the parquet ns, DuckDB's
          // TIMESTAMP truncates to µs — the join itself only uses ordering
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("ts_us"),
            col("asof.err_id").as("err_id"),
            expr("asof.ts div 1000").as("err_ts_us"))
      },
      Some("""SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
             |       e.event_id AS err_id, epoch_us(e.ts) AS err_ts_us
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') e
             |  ON c.user_id = e.user_id AND c.ts >= e.ts""".stripMargin)),

    // Range join (extension): clicks landing inside the 30-minute incident
    // window after each error, per user. Spark side is the bin-bucketed
    // equi-join (a plain non-equi join would be a per-key nested loop); the
    // oracle states the containment condition directly. µs on both sides
    // (Spark reads parquet ns, DuckDB truncates to µs).
    "q37_range_join" -> Q(
      (s, d) => {
        val ev = eventsNs(s, d)
        val win = 1800000000L // 30 min in µs
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"),
            expr("ts div 1000").as("lo"),
            (expr("ts div 1000") + win).as("hi"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            expr("ts div 1000").as("pt"))
        graft.ops.RangeJoin.pointInInterval(errors, clicks,
          Seq("user_id"), "lo", "hi", "pt", binWidth = win)
          .select("user_id", "err_id", "click_id", "pt")
      },
      Some("""SELECT e.user_id, e.event_id AS err_id, c.event_id AS click_id,
             |       epoch_us(c.ts) AS pt
             |FROM (SELECT * FROM events WHERE event_type = 'error') e
             |JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON e.user_id = c.user_id
             | AND epoch_us(c.ts) >= epoch_us(e.ts)
             | AND epoch_us(c.ts) < epoch_us(e.ts) + 1800000000""".stripMargin)))

  /** Full registry; extended by other modules' query packs. */
  def all: Map[String, Q] =
    relational ++ extensions ++ PoolQueries.all ++ CodecQueries.all ++
      EtlQueries.all ++ OpsQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql), _)) => k -> sql }
}
