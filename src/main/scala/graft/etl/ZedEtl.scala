package graft.etl

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pool.Envelope
import graft.query.ZedExpr

/** Reader for the reference's OWN ETL config format (etl/yaml.go:9-29):
  * `inputs`/`output` routes carry `{topic, pool}` pairs and each rule in
  * `transforms` carries a Zed expression surface — a `where` filter over the
  * bare record and a `zed` script assigning `out:={key:…, value:…}` — rather
  * than [[EtlYaml]]'s SQL fields. `demo/invoices.yaml` is the canonical
  * instance.
  *
  * The Zed surface those configs use (op filters, field paths, record
  * literals, `in [...]` membership, `cast(null, typeof(x))` — etl/yaml.go's
  * rules as exercised by demo/invoices.yaml and README.md:268-317) is
  * translated by [[graft.query.ZedExpr]] into the SQL rule model of [[Etl]]:
  * record literals become `named_struct`, `==` becomes `=`, double-quoted
  * strings become SQL strings, bare field paths bind to the rule's input
  * struct (`in`; denorm `join-on` paths already carry `left.`/`right.`).
  * This is a TRANSLATOR for the rule surface, not a general Zed compiler —
  * unsupported constructs raise with a clear message instead of
  * mis-translating. (Full Zed QUERY scripts — demo/etl.zed and friends —
  * compile through [[graft.query.ZedScript]] instead.)
  *
  * Divergence, documented: `cast(null, typeof(x))` (the CDC delete-tombstone
  * idiom, demo/invoices.yaml:57-63) translates to an untyped SQL `NULL`.
  * The reference needs the typed null to keep Zed's per-record types; our
  * pools widen every batch to a nullable superset schema (SchemaUnion), so
  * a typed and an untyped null value are indistinguishable downstream.
  */
object ZedEtl {

  private val ruleEnv = ZedExpr.Env(root = Some("in"))
  private val joinEnv = ZedExpr.Env(root = None) // join-on paths carry left./right.

  /** Parse a reference-format YAML config into the engine's [[EtlConfig]]. */
  def parse(text: String): EtlConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](text).asScala

    def route(m: collection.Map[String, Object]): (String, String) =
      (m.getOrElse("topic", err("route missing topic")).toString,
        m.getOrElse("pool", err("route missing pool")).toString)

    val inputs = root.getOrElse("inputs", err("missing inputs"))
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .map(m => route(m.asScala)).toSeq
    val pools = inputs.map(_._2).distinct
    require(pools.size == 1, s"all inputs must come from one pool, got $pools") // routes.go:66-69

    val (outTopic, outPool) = route(
      root.getOrElse("output", err("missing output"))
        .asInstanceOf[java.util.Map[String, Object]].asScala)

    val rules = root.getOrElse("transforms", err("missing transforms"))
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.map(_.asScala)
      .map { r =>
        def req(k: String): String = r.getOrElse(k, err(s"rule missing $k")).toString
        def opt(k: String): Option[String] = r.get(k).map(_.toString)
        val whereSql = opt("where").map(w => ZedExpr.translate(w, ruleEnv))
        val (outKey, outValue) = translateOutScript(req("zed"))
        req("type") match {
          case "stateless" =>
            StatelessRule(req("in"), whereSql, outKey, outValue)
          case "denorm" =>
            // join-on paths are already left./right.-rooted (yaml.go:24)
            DenormRule(req("left"), req("right"),
              ZedExpr.translate(req("join-on"), joinEnv), whereSql, outKey, outValue)
          case other => err(s"unknown rule type $other")
        }
      }.toSeq
    require(rules.nonEmpty, "no transforms")

    EtlConfig(pools.head, outPool, Transform(inputs.map(_._1).distinct, outTopic, rules))
  }

  /** Translate one Zed `out:={…}` script into (outKey, outValue) SQL. */
  def translateOutScript(zed: String): (String, String) = {
    // scripts open with the Zed pipe continuation: `| out:={…}`
    val c = new ZedExpr.Cursor(zed.trim.stripPrefix("|"))
    c.ws()
    val target = c.ident()
    require(target == "out", s"expected `out:=` assignment, got `$target`")
    c.ws(); c.expect(':'); c.expect('=')
    val e = c.expr(ruleEnv)
    c.ws()
    require(c.eof, s"trailing content after out:= expression: ${c.rest}")
    e match {
      case ZedExpr.Rec(fields) =>
        val f = fields.toMap
        (ZedExpr.sql(f.getOrElse("key", err("out record has no key field"))),
          ZedExpr.sql(f.getOrElse("value", err("out record has no value field"))))
      case _ => err("out:= must assign a record literal {key:…, value:…}")
    }
  }

  /** Generate the Zed program(s) the reference's `zync etl -zed` prints —
    * one per output topic, each the type-decl + per-topic anti-join fork +
    * first-match switch pipeline over that topic's rules
    * (etl/build.go:20-107 `Build`/`buildZed`, :109-137 from/fork, :163-185
    * stateless case, :187-216 denorm case). The emitted text is pinned
    * byte-for-byte against ztests/etl-zed.yaml's golden stdout
    * (ZedEtlGenSpec), and because [[graft.query.ZedScript]] executes this
    * same surface, a generated program runs as-is and its batch commits
    * through [[finalizeProgramOutputPlan]] — the full `etl -zed` loop.
    *
    * Works from the RAW yaml (not [[parse]]'s SQL rule model): the program
    * embeds the user's Zed `zed:` scripts verbatim.
    */
  def generateProgram(yamlText: String): Seq[String] = {
    val root = new Yaml().load[java.util.Map[String, Object]](yamlText).asScala
    def mapSeq(key: String): Seq[collection.Map[String, Object]] =
      root.getOrElse(key, err(s"missing $key"))
        .asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.toSeq.map(_.asScala)
    val inPoolOf = mapSeq("inputs")
      .map(m => m("topic").toString -> m("pool").toString).toMap
    val output = root.getOrElse("output", err("missing output"))
      .asInstanceOf[java.util.Map[String, Object]].asScala
    val outPool = output("pool").toString
    val rules = mapSeq("transforms")
    def field(r: collection.Map[String, Object], k: String): String =
      r.get(k).map(_.toString).getOrElse("")

    def quote(s: String) = "\"" + s + "\"" // Go %q over plain topic/pool names

    // build.go:140-145 indent: bump every line, trim the whole, one trailing \n
    def indent(s: String, tab: Int): String = {
      val bump = " " * tab
      bump + s.split("\n", -1).mkString("\n" + bump).trim + "\n"
    }
    // build.go:147-160: embed the user zed body, with/without its lead pipe
    def formatZedHead(s0: String, tab: Int): String = {
      val s = s0.trim
      "  " + indent(if (s.startsWith("|")) s.drop(1) else s, tab)
    }
    def formatZed(s0: String, tab: Int): String = {
      val s = s0.trim
      indent(if (s.startsWith("|")) s else "| " + s, tab)
    }

    // build.go:109-137: one anti-join from per topic; several fork
    def buildFrom(topics: Seq[String], outputTopic: String): String = topics match {
      case Seq(one) =>
        s"""
           |from (
           |  pool ${quote(inPoolOf(one))} => kafka.topic==${quote(one)}
           |  pool ${quote(outPool)} => is(<done>) kafka.topic==${quote(one)}
           |) | anti join on kafka.offset=kafka.offset
           |""".stripMargin
      case several =>
        val legs = several.map { t =>
          "=> " + buildFrom(Seq(t), outputTopic).dropWhile(_ == '\n') + "\n"
        }.mkString
        s"fork (\n${indent(legs, 2)})\n"
    }

    def buildStateless(r: collection.Map[String, Object]): String = {
      val where = field(r, "where") match {
        case "" => ""
        case w => s"($w) and "
      }
      val b = new StringBuilder
      b ++= s"  case ${where}kafka.topic==${quote(field(r, "in"))} =>\n"
      b ++= "    fork (\n"
      b ++= "      =>\n"
      b ++= "        yield {in:this}\n"
      b ++= "\n    // === user-defined ETL ===\n"
      b ++= formatZed(field(r, "zed"), 8)
      b ++= "\n"
      b ++= "        | out.kafka:=in.kafka\n"
      b ++= "        | yield out\n"
      b ++= s"        | kafka.topic:=${quote(field(r, "out"))}\n"
      b ++= "        \n"
      b ++= "      =>\n"
      b ++= "        yield cast({kafka:{topic:kafka.topic,offset:kafka.offset}},done)\n"
      b ++= "        \n"
      b ++= "      )\n"
      b.toString
    }

    def buildDenorm(r: collection.Map[String, Object]): String = {
      val join = field(r, "join-on")
      val keys = join.split("=", -1)
      require(keys.length == 2, s"join-on syntax error: $join")
      val (leftKey, rightKey) = (keys(0).trim, keys(1).trim)
      val b = new StringBuilder
      b ++= s"  case ${field(r, "where")} =>\n"
      b ++= "    fork (\n"
      b ++= s"      => kafka.topic==${quote(field(r, "left"))} | yield {left:this} | sort $leftKey\n"
      b ++= s"      => kafka.topic==${quote(field(r, "right"))} | yield {right:this} | sort $rightKey\n"
      b ++= "    )\n"
      b ++= s"    | join on $leftKey=$rightKey right:=right\n"
      b ++= "    | fork (\n"
      b ++= "      =>\n"
      b ++= "          // === user-defined ETL ===\n"
      b ++= formatZedHead(field(r, "zed"), 8)
      b ++= "        | out.kafka:=left.kafka\n"
      b ++= "        | yield out\n"
      b ++= s"        | kafka.topic:=${quote(field(r, "out"))}\n"
      b ++= "      =>  yield {\n"
      b ++= "             left:cast({kafka:{topic:left.kafka.topic,offset:left.kafka.offset}},done),\n"
      b ++= "             right:cast({kafka:{topic:right.kafka.topic,offset:right.kafka.offset}},done)\n"
      b ++= "          }\n"
      b ++= "    )\n"
      b.toString
    }

    // output topics in rule order; inputs of each in first-reference order
    val outTopics = rules.map(r => field(r, "out")).distinct
    outTopics.map { ot =>
      val mine = rules.filter(r => field(r, "out") == ot)
      val inTopics = mine.flatMap { r =>
        if (field(r, "type") == "denorm") Seq(field(r, "left"), field(r, "right"))
        else Seq(field(r, "in"))
      }.distinct
      val b = new StringBuilder
      b ++= "type done = {kafka:{topic:string,offset:int64}}\n"
      b ++= buildFrom(inTopics, ot)
      b ++= "| yield this\n"
      b ++= "| switch (\n"
      mine.foreach { r =>
        field(r, "type") match {
          case "stateless" => b ++= buildStateless(r)
          case "denorm" => b ++= buildDenorm(r)
          case other => err(s"unknown ETL type: $other")
        }
      }
      b ++= ")\n| sort kafka.offset\n"
      b.toString
    }
  }

  /** The Go layer's post-pass over a compiled Zed program's batch
    * (etl/pipeline.go:93-125 `writeToOutputPool` + :127-164 `insertOffsets`),
    * Spark-shaped — turns [[graft.query.ZedScript.run]]'s raw output into a
    * pool-committable envelope batch identical to [[Etl.compile]]'s delta:
    *
    *  - denorm `{left,right}` done-marker PAIRS (the program can only yield
    *    them paired — one row per join result) explode into two FLAT `done`
    *    markers each, the reference's left/right `Deref` appends
    *    (pipeline.go:109-115), deduplicated because one input may join
    *    several partners (Etl.compile's own `distinct()` on denorm legs);
    *  - already-flat `done` rows pass through;
    *  - record rows get globally-consecutive output offsets continuing from
    *    the output pool's base, in source-offset order — the order the
    *    program's final `| sort kafka.offset` hands the Go layer, which
    *    numbers the batch in that order (insertOffsets iterates it as
    *    sorted). The reference has no source-topic tie-break here either:
    *    both layers see only the sorted batch.
    *
    * @param out         `ZedScript.run` output for a generated etl program
    * @param outputTopic the transform's output topic ([[EtlConfig]])
    * @param baseOffsets output pool per-topic record offset bases
    *                    ([[Etl.OutputState]].baseOffsets)
    * @return (committable batch, persisted handles to release after commit)
    */
  def finalizeProgramOutputPlan(out: DataFrame, outputTopic: String,
      baseOffsets: Map[String, Long],
      kindCol: String = Envelope.KindCol): (DataFrame, Seq[DataFrame]) = {
    val names = out.schema.fieldNames.toSet
    def colOr(name: String, absent: org.apache.spark.sql.Column) =
      if (names.contains(name)) col(name) else absent
    // one materialization feeds the three splits + the offset count job
    val src = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val isPair = colOr("left", lit(null)).isNotNull ||
      colOr("right", lit(null)).isNotNull
    val isDone = coalesce(colOr(kindCol, lit(null)).cast("string") ===
      Envelope.KindDone, lit(false))

    val pairMarkers =
      if (!names.contains("left")) None
      else Some(Seq("left", "right").filter(names.contains)
        .map(side => src.filter(col(side).isNotNull)
          .select(col(s"$side.kafka").as("kafka")))
        .reduce(_ unionByName _)
        .distinct())
    val flatMarkers = src.filter(isDone && !isPair).select(col("kafka").as("kafka"))
    val markerKafka = pairMarkers.fold(flatMarkers)(p =>
      graft.pool.SchemaUnion.unionAll(Seq(flatMarkers, p)))

    val recordRows = src.filter(!isDone && !isPair)
    // persisted: the offset count job and the output pass must agree on
    // partitioning (Offsets.assignSequential's contract, as in Etl.compile).
    // Tie-break: the program's record rows carry only the source OFFSET
    // (kafka.topic was overwritten to the output topic by the program
    // itself), so when two source topics share an offset the native
    // compiler's (offset, source-topic) order is unavailable — the
    // reference's Go layer has exactly the same blindness (insertOffsets
    // numbers the sorted batch as-is). A content hash makes the order
    // deterministic across runs either way.
    val tieBreak = xxhash64(to_json(struct(col("key"), col("value"))))
    val sorted = recordRows
      .repartitionByRange(col("kafka.offset"), tieBreak)
      .sortWithinPartitions(col("kafka.offset"), tieBreak)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = baseOffsets.getOrElse(outputTopic, -1L)
    val records = Offsets.assignSequential(sorted, base + 1, "_offset")
      .select(
        struct(
          lit(outputTopic).as("topic"),
          lit(0L).as("partition"),
          col("_offset").as("offset")).as("kafka"),
        col("key"), col("value"),
        lit(Envelope.KindRecord).as(Envelope.KindCol))
    val markers = markerKafka.select(
      col("kafka"),
      lit(null).cast(records.schema("key").dataType).as("key"),
      lit(null).cast(records.schema("value").dataType).as("value"),
      lit(Envelope.KindDone).as(Envelope.KindCol))
    (graft.pool.SchemaUnion.unionAll(Seq(records, markers)), Seq(src, sorted))
  }

  /** As [[finalizeProgramOutputPlan]] without the persisted handles — for
    * one-shot use where the session's cache lifecycle is managed elsewhere.
    */
  def finalizeProgramOutput(out: DataFrame, outputTopic: String,
      baseOffsets: Map[String, Long],
      kindCol: String = Envelope.KindCol): DataFrame =
    finalizeProgramOutputPlan(out, outputTopic, baseOffsets, kindCol)._1

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"zed etl: $msg")
}
