package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{DenormRule, Etl, StatelessRule, Transform}
import graft.pool.Pool
import graft.Queries.Q

/** The ETL compiler end-to-end, driver-checked: a CDC scenario synthesized
  * from `orders` as two event topics — "Orders" (op = 'u' for every 10th key
  * else 'c') and "Statuses" (one status event per order) — through a 1:1
  * denormalizing join rule + a stateless update rule into output topic
  * "Enriched". This mirrors demo/invoices.yaml exactly: denorm
  * Invoices×InvoiceStatus joined on the event keys, where both joined sides
  * are consumed exactly once (done markers on both, etl/build.go:210-213);
  * unjoined events stay unmarked until their partner arrives
  * (README.md:373-389).
  *
  * The input pool is heterogeneous (two topics with different `after`
  * shapes) — a superset schema with nullable absent fields (SURVEY §7.4.1).
  */
object EtlQueries {

  private[graft] def cdcEnvelopes(s: SparkSession, d: String): DataFrame = {
    val nullL = lit(null).cast("bigint")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def after(o_orderkey: org.apache.spark.sql.Column, o_custkey: org.apache.spark.sql.Column,
        o_totalprice: org.apache.spark.sql.Column, status_orderkey: org.apache.spark.sql.Column,
        status: org.apache.spark.sql.Column) =
      struct(o_orderkey.as("o_orderkey"), o_custkey.as("o_custkey"),
        o_totalprice.as("o_totalprice"), status_orderkey.as("status_orderkey"),
        status.as("status"))

    val orders = Tables.load(s, d, "orders")
    val ord = orders.select(
      struct(lit("Orders").as("topic"), lit(0L).as("partition"),
        col("o_orderkey").cast("long").as("offset")).as("kafka"),
      struct(col("o_orderkey").as("id")).as("key"),
      struct(
        when(col("o_orderkey") % 10 === 0, "u").otherwise("c").as("op"),
        after(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), nullL, nullS).as("after")).as("value"),
      lit("record").as("_kind"))

    val stat = orders.select(
      struct(lit("Statuses").as("topic"), lit(0L).as("partition"),
        col("o_orderkey").cast("long").as("offset")).as("kafka"),
      struct(col("o_orderkey").as("id")).as("key"),
      struct(
        lit("c").as("op"),
        after(nullL, nullL, nullD, col("o_orderkey").cast("bigint"), col("o_orderstatus")).as("after")).as("value"),
      lit("record").as("_kind"))

    // Spread the synthesized CDC stream across the cluster: orders.parquet
    // is a single split at test SFs, so without this the envelope build,
    // its persist, and the pool-append sampling pass all run 2-wide.
    ord.unionByName(stat).repartition(s.sparkContext.defaultParallelism)
  }

  private[graft] val transform = Transform(
    inputTopics = Seq("Orders", "Statuses"),
    outputTopic = "Enriched",
    rules = Seq(
      DenormRule(
        leftTopic = "Orders", rightTopic = "Statuses",
        joinOn = "left.value.after.o_orderkey = right.value.after.status_orderkey",
        where = Some("in.value.op = 'c'"),
        outKey = "named_struct('id', left.value.after.o_orderkey)",
        outValue = "named_struct('id', left.value.after.o_orderkey, 'status', right.value.after.status, 'total', left.value.after.o_totalprice)"),
      StatelessRule(
        inTopic = "Orders",
        where = Some("in.value.op = 'u'"),
        outKey = "named_struct('id', in.value.after.o_orderkey)",
        outValue = "named_struct('id', in.value.after.o_orderkey, 'status', cast(null as string), 'total', in.value.after.o_totalprice)")))

  /** Shared oracle CTE prelude mirroring the scenario. */
  private val oraclePrelude =
    """WITH ord AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus,
      |         CASE WHEN o_orderkey % 10 = 0 THEN 'u' ELSE 'c' END AS op
      |  FROM orders),
      |joined AS (
      |  SELECT o_orderkey AS okey, o_orderstatus AS st, o_totalprice AS total
      |  FROM ord WHERE op = 'c'),
      |upd AS (SELECT o_orderkey AS okey, CAST(NULL AS VARCHAR) AS st,
      |               o_totalprice AS total FROM ord WHERE op = 'u')
      |""".stripMargin

  val all: Map[String, Q] = Map(

    // Single compiled pass (pure plan, empty output state): records get
    // 0-based offsets in source-kafka order; markers carry source meta.
    "etl_compile_pass" -> Q(
      (s, d) => {
        val out = Etl.compile(s, cdcEnvelopes(s, d), Etl.OutputState(None, Map.empty), transform)
        out.select(
          col("_kind"),
          col("kafka.topic").as("topic"),
          col("kafka.offset").as("offset"),
          col("value.id").as("id"),
          col("value.status").as("status"),
          col("value.total").as("total"))
      },
      Some(oraclePrelude +
        """, recs AS (SELECT okey, st, total FROM joined UNION ALL SELECT okey, st, total FROM upd)
          |SELECT 'record' AS _kind, 'Enriched' AS topic,
          |       row_number() OVER (ORDER BY okey) - 1 AS offset,
          |       okey AS id, st AS status, total
          |FROM recs
          |UNION ALL
          |SELECT 'done', 'Orders', okey, NULL, NULL, NULL FROM joined
          |UNION ALL
          |SELECT 'done', 'Statuses', okey, NULL, NULL, NULL FROM joined
          |UNION ALL
          |SELECT 'done', 'Orders', okey, NULL, NULL, NULL FROM upd""".stripMargin)),

    // T7 exactly-once: two full passes through real pools; the second pass
    // must add nothing (anti-join vs committed done markers), mirroring the
    // reprocess-nothing golden of ztests/etl-demo.yaml:37-48.
    "etl_exactly_once" -> Q(
      (s, d) => {
        val inPool = Pool.create(s, TempDirs.create("graft-etl-in-"))
        val outPool = Pool.create(s, TempDirs.create("graft-etl-out-"))
        inPool.append(cdcEnvelopes(s, d))
        Etl.run(s, inPool, outPool, transform)
        Etl.run(s, inPool, outPool, transform) // must be a no-op
        outPool.read()
          .groupBy("_kind")
          .agg(count(lit(1)).as("cnt"), max(col("kafka.offset")).as("max_offset"))
      },
      Some(oraclePrelude +
        """SELECT 'record' AS _kind,
          |       (SELECT count(*) FROM joined) + (SELECT count(*) FROM upd) AS cnt,
          |       (SELECT count(*) FROM joined) + (SELECT count(*) FROM upd) - 1 AS max_offset
          |UNION ALL
          |SELECT 'done',
          |       2 * (SELECT count(*) FROM joined) + (SELECT count(*) FROM upd),
          |       (SELECT max(o_orderkey) FROM orders)""".stripMargin)),

    // Incremental delivery: pass 1 sees all Orders but only even Statuses —
    // odd 'c' Orders find no partner, stay unmarked; pass 2 delivers the odd
    // Statuses and the stragglers join. Two passes must equal one full pass,
    // with offsets continuing where pass 1 stopped.
    "etl_incremental" -> Q(
      (s, d) => {
        // built once, consumed three times (pass-1 filter, pass-2 filter,
        // and each append's internal sampling pass) — persist instead of
        // recomputing the synthesis; the bench harness reclaims leaks
        val env = cdcEnvelopes(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pass1 = env.filter(
          col("kafka.topic") === "Orders" ||
            (col("kafka.topic") === "Statuses" && col("kafka.offset") % 2 === 0))
        val inPool = Pool.create(s, TempDirs.create("graft-etl-in-"))
        val outPool = Pool.create(s, TempDirs.create("graft-etl-out-"))
        inPool.append(pass1)
        Etl.run(s, inPool, outPool, transform)
        inPool.append(env.filter(col("kafka.topic") === "Statuses" && col("kafka.offset") % 2 =!= 0))
        Etl.run(s, inPool, outPool, transform)
        outPool.read()
          .filter(col("_kind") === "record")
          .groupBy()
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("kafka.offset")).as("distinct_offsets"),
            sum(col("value.id")).as("sum_id"))
      },
      Some(oraclePrelude +
        """SELECT (SELECT count(*) FROM joined) + (SELECT count(*) FROM upd) AS cnt,
          |       (SELECT count(*) FROM joined) + (SELECT count(*) FROM upd) AS distinct_offsets,
          |       CAST((SELECT sum(okey) FROM joined) + (SELECT sum(okey) FROM upd) AS BIGINT) AS sum_id""".stripMargin)),

    // The reference's documented multi-operator pipeline (demo/etl.zed:1-18,
    // design.md's pending-transaction walkthrough), composed end-to-end:
    // const ID maps (Q26) + ordered collect(this) by txn (Q17) + or(done)
    // gate + records[0]/records[1] arithmetic (Q27/Q30). Each txn is two CDC
    // records — seqno 1 carries the order row, seqno 2 carries the price row
    // and the done flag; every 7th txn stays pending and must be gated out.
    "etl_demo_menu" -> Q(
      (s, d) => {
        val orders = Tables.load(s, d, "orders")
        val customers = array(lit("jane"), lit("bob"), lit("sarah"))
        val products = array(lit("burrito"), lit("taco"), lit("chips"))
        val rec1 = orders.select(
          col("o_orderkey").as("txn"), lit(1L).as("seqno"), lit(false).as("done"),
          struct(
            element_at(customers, (col("o_custkey") % 3 + 1).cast("int")).as("customer"),
            element_at(products, (col("o_orderkey") % 3 + 1).cast("int")).as("product"),
            (col("o_orderkey") % 5 + 1).cast("long").as("qty"),
            lit(null).cast("double").as("price")).as("row"))
        val rec2 = orders.select(
          col("o_orderkey").as("txn"), lit(2L).as("seqno"),
          (col("o_orderkey") % 7 =!= 0).as("done"),
          struct(
            lit(null).cast("string").as("customer"), lit(null).cast("string").as("product"),
            lit(null).cast("long").as("qty"), col("o_totalprice").as("price")).as("row"))
        // etl.zed's const |{...}| maps as map literals, indexed by name
        val customerIDs = map(lit("jane"), lit(1), lit("bob"), lit(2), lit("sarah"), lit(3))
        val menuIDs = map(lit("burrito"), lit(100), lit("taco"), lit(200), lit("chips"), lit(300))
        val rec = col("records")
        rec1.unionByName(rec2)
          .groupBy(col("txn"))
          .agg(
            // collect(this) ordered by seqno — array_sort on (seqno, row)
            // structs, so records[0]/records[1] are deterministic
            array_sort(collect_list(struct(col("seqno"), col("row")))).as("records"),
            expr("bool_or(done)").as("done"))
          .filter(col("done") === true)
          .select(
            col("txn"),
            element_at(customerIDs, rec(0)("row")("customer")).as("customerID"),
            element_at(menuIDs, rec(0)("row")("product")).as("menuID"),
            rec(0)("row")("qty").as("qty"),
            (rec(0)("row")("qty") * rec(1)("row")("price")).cast("double").as("total"))
      },
      // The oracle states the WHAT: the maps invert the synthesized names
      // (customers[i]→i, products[i]→i*100), so the expected output is a
      // direct per-order projection gated on the done flag.
      Some("""SELECT o_orderkey AS txn,
             |       CAST((o_custkey % 3) + 1 AS INTEGER) AS customerID,
             |       CAST(((o_orderkey % 3) + 1) * 100 AS INTEGER) AS menuID,
             |       CAST((o_orderkey % 5) + 1 AS BIGINT) AS qty,
             |       CAST(((o_orderkey % 5) + 1) * o_totalprice AS DOUBLE) AS total
             |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin)),

    // The Zed SCRIPT compiler driver-checked end-to-end (ZedScript also runs
    // the reference's own demo scripts verbatim in ZedScriptSpec): const map
    // literal, filter, cut, ordered collect-by with subscripted access
    // (docs[0], docs[n-1]), and arithmetic over aggregates.
    "zed_script_pipeline" -> Q(
      (s, d) => graft.query.ZedScript.run(s,
        """const langBoost = |{"en": 2,"fr": 3}|
          |from documents
          || n_chars >= 200
          || cut doc_id, n_chars, lang
          || docs:=collect(this),n:=count(),max_chars:=max(n_chars) by lang
          || yield {
          |    lang: lang,
          |    n: n,
          |    boost: langBoost[lang],
          |    first_doc: docs[0].doc_id,
          |    last_chars: docs[n - 1].n_chars,
          |    score: max_chars * langBoost[lang]
          |  }""".stripMargin,
        { case "documents" => (Tables.load(s, d, "documents"), Seq("doc_id"))
          case other => throw new IllegalArgumentException(s"unknown pool $other") }),
      Some("""WITH f AS (SELECT doc_id, n_chars, lang FROM documents WHERE n_chars >= 200)
             |SELECT lang,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 3 END AS boost,
             |       min(doc_id) AS first_doc,
             |       arg_max(n_chars, doc_id) AS last_chars,
             |       CAST(max(n_chars) * (CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 3 END) AS BIGINT) AS score
             |FROM f GROUP BY lang""".stripMargin)),

    // Script-surface switch/put/head under the driver gate: first-match
    // routing with per-case put stages, re-sorted for a deterministic head
    "zed_script_switch" -> Q(
      (s, d) => graft.query.ZedScript.run(s,
        """from orders
          || o_orderkey % 200 == 0
          || switch (
          |    case o_totalprice >= 150000 => bucket:="high" | score:=o_totalprice * 2
          |    case o_totalprice >= 50000 => bucket:="mid" | score:=o_totalprice
          |    default => bucket:="low" | score:=o_totalprice / 2
          |  )
          || cut o_orderkey, bucket, score
          || sort o_orderkey
          || head 50""".stripMargin,
        { case "orders" => (Tables.load(s, d, "orders"), Seq("o_orderkey"))
          case other => throw new IllegalArgumentException(s"unknown pool $other") }),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice >= 150000 THEN 'high'
             |       WHEN o_totalprice >= 50000 THEN 'mid' ELSE 'low' END AS bucket,
             |  CASE WHEN o_totalprice >= 150000 THEN o_totalprice * 2
             |       WHEN o_totalprice >= 50000 THEN o_totalprice
             |       ELSE o_totalprice / 2 END AS score
             |FROM orders WHERE o_orderkey % 200 = 0
             |ORDER BY o_orderkey LIMIT 50""".stripMargin)),

    // Script-surface inner join over fork legs (the compiled etl program's
    // denorm shape): left/right wrapping via yield, join with the canonical
    // right:=right assignment, projection over both sides
    "zed_script_join" -> Q(
      (s, d) => graft.query.ZedScript.run(s,
        """fork (
          |  => from orders | o_orderkey % 100 == 0 | yield {left:this}
          |  => from customer | yield {right:this}
          |)
          || join on left.o_custkey=right.c_custkey right:=right
          || yield { okey: left.o_orderkey, cust: right.c_name, total: left.o_totalprice }""".stripMargin,
        { case "orders" => (Tables.load(s, d, "orders"), Seq("o_orderkey"))
          case "customer" => (Tables.load(s, d, "customer"), Seq("c_custkey"))
          case other => throw new IllegalArgumentException(s"unknown pool $other") }),
      Some("""SELECT o.o_orderkey AS okey, c.c_name AS cust, o.o_totalprice AS total
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE o.o_orderkey % 100 = 0""".stripMargin))
  )
}
