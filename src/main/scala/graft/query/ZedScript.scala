package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pool.SchemaUnion
import ZedExpr.{Cursor, Env, err}

/** Zed QUERY scripts → DataFrame plans: the script surface the reference's
  * demo and design doc actually exercise (demo/etl.zed, demo/update.zed,
  * demo/update-etl.zed, demo/pending.zed; design.md's pending-transaction
  * walkthrough), so a zync user's scripts run verbatim.
  *
  * Surface: `const` declarations (including ZSON `|{…}|` map literals),
  * `from <pool>` and multi-leg `from ( pool A => …  pool B => … )`, and the
  * stages: filter expressions (space-juxtaposed terms AND together, Zed
  * search semantics), `sort`, `cut`, `yield {…}` (also `cut yield {…}`),
  * aggregations `x:=agg(e),… by k:=e`, `anti join on l=r`, and `fork (…)`.
  * Expressions go through [[ZedExpr]] (paths, subscripts, arithmetic,
  * `is(<type>)`, const substitution).
  *
  * Semantics notes, Spark-first:
  *  - `collect(e)` preserves STREAM order in Zed (single-threaded). Here
  *    order is explicit metadata: each source carries its pool's natural
  *    order, `sort` replaces it, joins keep the left side's, and `collect`
  *    compiles to `array_sort(collect_list(struct(orderKeys…, payload)))` —
  *    deterministic on any partitioning, which implicit stream order is not
  *    at scale. A `collect` with no defined order is an error, not a silent
  *    nondeterminism.
  *  - Multi-leg `from` followed by `anti join` pairs the legs (left, right)
  *    like Zed's two-legged from; otherwise legs union through the superset
  *    schema (heterogeneous legs widen, absent fields null).
  *  - `fork` legs each see the fork's input (or carry their own `from`) and
  *    union through the superset schema.
  *
  * `put`, `head`/`tail`, inner `join … right:=right` (over fork legs) and
  * first-match `switch` compile natively (see PutS/HeadS/TailS/JoinS/
  * SwitchS below). Constructs outside the implemented grammar still raise
  * with a clear message rather than mis-compiling.
  */
object ZedScript {

  // ---- AST ------------------------------------------------------------------
  sealed trait Stage
  private final case class FilterS(sql: String) extends Stage
  private final case class SortS(keys: Seq[String]) extends Stage
  private final case class CutS(fields: Seq[String]) extends Stage
  private final case class YieldS(fields: Seq[(String, String)]) extends Stage
  /** `yield <record-typed expr>` — the record becomes the top-level row. */
  private final case class YieldExprS(sql: String) extends Stage
  /** `yield cast({…}, name)` — record fields + the type tag in the
    * discriminator column (the engine's convention for `(=name)`).
    */
  private final case class YieldTypedS(fields: Seq[(String, String)], typeName: String) extends Stage
  private final case class AggS(aggs: Seq[(String, String, Option[String])], // (name, fn, argSql)
      by: Seq[(String, String)]) extends Stage
  /** `path := expr, …` — Zed put: set/replace (possibly nested) fields. */
  private final case class PutS(assigns: Seq[(Seq[String], String)]) extends Stage
  private final case class HeadS(n: Int) extends Stage
  private final case class TailS(n: Int) extends Stage
  private final case class AntiJoinS(leftKey: String, rightKey: String) extends Stage
  /** inner `join on l=r name:=expr, …` — left row + assignments (RHS
    * resolves over the joined row; the canonical use is `right:=right`).
    */
  private final case class JoinS(leftKey: String, rightKey: String,
      assigns: Seq[(String, String)]) extends Stage
  private final case class ForkS(legs: Seq[Pipe]) extends Stage
  /** `switch ( case e => … default => … )` — strict first-match routing
    * (build.go:92-107 parity), outputs union through the superset schema.
    */
  private final case class SwitchS(cases: Seq[(Option[String], Pipe)]) extends Stage

  sealed trait From
  private final case class FromPool(name: String) extends From
  private final case class FromLegs(legs: Seq[(String, Seq[Stage])]) extends From

  final case class Pipe private[ZedScript] (source: Option[From], stages: Seq[Stage])
  final case class Script private[ZedScript] (consts: Map[String, String], pipe: Pipe,
      kindCol: String)

  private val aggFns = Map(
    "collect" -> "collect", "max" -> "max", "min" -> "min", "sum" -> "sum",
    "count" -> "count", "avg" -> "avg", "or" -> "bool_or", "and" -> "bool_and",
    "union" -> "collect_set")

  private val stageKw = Set("sort", "cut", "yield", "head", "tail", "anti",
    "join", "fork", "switch", "pool", "case", "default", "const", "from",
    "by", "over", "where")

  // ---- parser ---------------------------------------------------------------

  /** Parse a script. `kindCol` is the named-type discriminator `is(<T>)`
    * compiles against: `_kind` for pool envelope frames, `_type` for
    * ZSON-loaded frames.
    */
  def parse(text: String, kindCol: String = "_kind"): Script = {
    val c = new Cursor(text)
    var consts = Map.empty[String, String]
    var types = Set.empty[String]
    var decls = true
    while (decls) {
      if (c.peek("const")) {
        c.eat("const")
        val name = c.ident()
        c.ws(); c.expect('=')
        c.ws()
        val sql =
          if (c.peekChar == '|') mapLiteral(c)
          else ZedExpr.sql(c.expr(Env(None, consts, kindCol, types)))
        consts += name -> sql
        c.ws()
        if (!c.eof && c.s.charAt(c.i) == ';') c.i += 1
      } else if (c.peek("type")) {
        // `type done = {…}` — the shape is structural metadata the engine
        // derives from data; only the NAME matters (cast targets, is()
        // tests), so the body is skipped as a balanced block — legal Zed
        // type syntax ([string], |{…}|, a?: int64) needs no expression parse
        c.eat("type")
        val name = c.ident()
        c.ws(); c.expect('=')
        c.ws()
        skipBalancedRecord(c)
        types += name
        c.ws()
        if (!c.eof && c.s.charAt(c.i) == ';') c.i += 1
      } else decls = false
    }
    val env = Env(None, consts, kindCol, types)
    val pipe = parsePipe(c, env)
    c.ws()
    if (!c.eof) err(s"trailing content after script: ${c.rest}")
    Script(consts, pipe, kindCol)
  }

  /** Consume a `{…}` block with balanced braces, skipping strings. */
  private def skipBalancedRecord(c: Cursor): Unit = {
    c.expect('{')
    var depth = 1
    while (depth > 0) {
      if (c.i >= c.s.length) err("unterminated type body")
      c.s.charAt(c.i) match {
        case '{' => depth += 1; c.i += 1
        case '}' => depth -= 1; c.i += 1
        case '"' => c.rawString()
        case _ => c.i += 1
      }
    }
  }

  /** ZSON map literal `|{ "k": v, … }|` → SQL `map('k', v, …)`. */
  private def mapLiteral(c: Cursor): String = {
    c.expect('|'); c.expect('{')
    val entries = scala.collection.mutable.ArrayBuffer[(String, String)]()
    c.ws()
    while (c.peekChar != '}') {
      val k = c.stringLit()
      c.ws(); c.expect(':')
      c.ws()
      val v = if (c.peekChar == '"') c.stringLit() else c.number()
      entries += k -> v
      c.ws()
      if (c.peekChar == ',') c.i += 1
      c.ws()
    }
    c.expect('}'); c.expect('|')
    entries.map { case (k, v) => s"$k, $v" }.mkString("map(", ", ", ")")
  }

  private def parsePipe(c: Cursor, env: Env): Pipe = {
    val source = if (c.peek("from")) Some(parseFrom(c, env)) else None
    val stages = scala.collection.mutable.ArrayBuffer[Stage]()
    if (source.isEmpty) stages += parseStage(c, env)
    while (c.eat("|")) stages += parseStage(c, env)
    Pipe(source, stages.toSeq)
  }

  private def poolName(c: Cursor): String = {
    c.ws()
    if (c.peekChar == '"') c.rawString() else c.ident()
  }

  private def parseFrom(c: Cursor, env: Env): From = {
    c.eat("from")
    c.ws()
    if (c.peekChar == '(') {
      c.expect('(')
      val legs = scala.collection.mutable.ArrayBuffer[(String, Seq[Stage])]()
      c.ws()
      while (c.peekChar != ')') {
        if (!c.eat("pool")) err(s"expected `pool` in multi-leg from at …${c.rest}")
        val name = poolName(c)
        val stages = scala.collection.mutable.ArrayBuffer[Stage]()
        if (c.eat("=>")) {
          stages += parseStage(c, env)
          while (c.eat("|")) stages += parseStage(c, env)
        }
        stages.foreach {
          case ForkS(_) | SwitchS(_) | AntiJoinS(_, _) | JoinS(_, _, _) =>
            err("fork/switch/join are not supported inside a from leg — apply them after the from")
          case _ => ()
        }
        legs += name -> stages.toSeq
        c.ws()
      }
      c.expect(')')
      FromLegs(legs.toSeq)
    } else FromPool(poolName(c))
  }

  /** Can the next token begin another juxtaposed filter term? */
  private def startsFilterTerm(c: Cursor): Boolean = {
    c.ws()
    if (c.i >= c.s.length) return false
    val ch = c.s.charAt(c.i)
    if ("|),;=".contains(ch)) return false // incl. `=>` legs
    if (ch.isLetter || ch == '_') {
      val m = c.mark; val id = c.ident(); c.reset(m)
      !stageKw(id)
    } else "\"({!<-".contains(ch) || ch.isDigit
  }

  private def parseStage(c: Cursor, env: Env): Stage = {
    c.ws()
    if (c.eat("sort")) {
      val keys = scala.collection.mutable.ArrayBuffer(c.pathName())
      c.ws()
      while (c.peekChar == ',') { c.i += 1; keys += c.pathName(); c.ws() }
      SortS(keys.toSeq.map(pathSql))
    } else if (c.eat("cut")) {
      if (c.peek("yield")) { c.eat("yield"); parseYield(c, env) }
      else {
        val fields = scala.collection.mutable.ArrayBuffer(c.pathName())
        c.ws()
        while (c.peekChar == ',') { c.i += 1; fields += c.pathName(); c.ws() }
        CutS(fields.toSeq)
      }
    } else if (c.eat("yield")) {
      parseYield(c, env)
    } else if (c.eat("anti")) {
      if (!c.eat("join") || !c.eat("on")) err(s"expected `join on` after anti at …${c.rest}")
      val l = c.pathName(); c.ws(); c.expect('='); val r = c.pathName()
      AntiJoinS(l, r)
    } else if (c.eat("join")) {
      if (!c.eat("on")) err(s"expected `on` after join at …${c.rest}")
      val l = c.pathName(); c.ws(); c.expect('='); val r = c.pathName()
      // trailing assignments: `right:=right`, comma-separated
      val assigns = scala.collection.mutable.ArrayBuffer[(String, String)]()
      var more = true
      while (more) {
        val m = c.mark
        more = try {
          val name = c.ident()
          c.ws()
          if (c.s.startsWith(":=", c.i)) {
            c.i += 2
            assigns += name -> ZedExpr.sql(c.expr(env))
            c.ws()
            if (c.peekChar == ',') { c.i += 1; true } else false
          } else { c.reset(m); false }
        } catch { case _: IllegalArgumentException => c.reset(m); false }
      }
      JoinS(l, r, assigns.toSeq)
    } else if (c.eat("fork")) {
      c.ws(); c.expect('(')
      val legs = scala.collection.mutable.ArrayBuffer[Pipe]()
      c.ws()
      while (c.eat("=>")) { legs += parsePipe(c, env); c.ws() }
      c.expect(')')
      if (legs.isEmpty) err("fork with no legs")
      ForkS(legs.toSeq)
    } else if (c.eat("switch")) {
      c.ws(); c.expect('(')
      val cases = scala.collection.mutable.ArrayBuffer[(Option[String], Pipe)]()
      c.ws()
      var more = true
      while (more) {
        if (c.eat("case")) {
          val pred = ZedExpr.sql(c.expr(env))
          if (!c.eat("=>")) err(s"expected `=>` after case predicate at …${c.rest}")
          cases += Some(pred) -> parsePipe(c, env)
        } else if (c.eat("default")) {
          if (!c.eat("=>")) err(s"expected `=>` after default at …${c.rest}")
          cases += None -> parsePipe(c, env)
        } else more = false
        c.ws()
      }
      c.expect(')')
      if (cases.isEmpty) err("switch with no cases")
      SwitchS(cases.toSeq)
    } else if (c.eat("head")) {
      HeadS(optionalCount(c))
    } else if (c.eat("tail")) {
      TailS(optionalCount(c))
    } else {
      // assignment stage (aggregation or put) or filter expression
      val m = c.mark
      val isAssign = try {
        c.pathName(); c.ws()
        c.s.startsWith(":=", c.i)
      } catch { case _: IllegalArgumentException => false }
      c.reset(m)
      if (isAssign) parseAssign(c, env)
      else {
        var e = c.expr(env)
        while (startsFilterTerm(c))
          e = ZedExpr.Raw(s"(${ZedExpr.sql(e)} AND ${ZedExpr.sql(c.expr(env))})")
        FilterS(ZedExpr.sql(e))
      }
    }
  }

  /** `a:=…, b:=…` — Zed overloads `:=` for aggregation (RHS is an aggregate
    * call, optional `by`) and put (anything else); the first RHS decides,
    * and the whole stage must agree.
    */
  private def parseAssign(c: Cursor, env: Env): Stage = {
    val m = c.mark
    c.pathName(); c.ws(); c.i += 2 // skip to first RHS
    val isAgg = try {
      val fn = c.ident(); c.ws()
      c.i < c.s.length && c.s.charAt(c.i) == '(' && aggFns.contains(fn)
    } catch { case _: IllegalArgumentException => false }
    c.reset(m)
    if (isAgg) parseAgg(c, env)
    else {
      val assigns = scala.collection.mutable.ArrayBuffer[(Seq[String], String)]()
      var more = true
      while (more) {
        val target = c.pathName()
        c.ws()
        if (!c.s.startsWith(":=", c.i)) err(s"expected `:=` in put at …${c.rest}")
        c.i += 2
        assigns += target.split('.').toSeq -> ZedExpr.sql(c.expr(env))
        c.ws()
        if (c.peekChar == ',') c.i += 1 else more = false
      }
      PutS(assigns.toSeq)
    }
  }

  private def optionalCount(c: Cursor): Int = {
    c.ws()
    if (c.i < c.s.length && c.s.charAt(c.i).isDigit) c.number().toInt else 1
  }

  private def parseYield(c: Cursor, env: Env): Stage = {
    c.ws()
    c.expr(env) match {
      case ZedExpr.Rec(fields) => YieldS(fields.map { case (n, e) => n -> ZedExpr.sql(e) })
      case ZedExpr.TypedRec(ZedExpr.Rec(fields), name) =>
        YieldTypedS(fields.map { case (n, e) => n -> ZedExpr.sql(e) }, name)
      case ZedExpr.TypedRec(rec, name) => YieldTypedS(Seq("_y" -> ZedExpr.sql(rec)), name)
      case e => YieldExprS(ZedExpr.sql(e)) // a record-typed expr becomes the row
    }
  }

  /** `a:=agg(e), b:=agg(e) by k:=e, …` — every assignment must be an
    * aggregate call (a non-aggregate `:=` is Zed `put`, outside the
    * surface).
    */
  private def parseAgg(c: Cursor, env: Env): AggS = {
    val aggs = scala.collection.mutable.ArrayBuffer[(String, String, Option[String])]()
    var done = false
    while (!done) {
      val name = c.ident()
      c.ws()
      if (!c.s.startsWith(":=", c.i))
        err(s"`put` assignments are not in the executed script surface (at …${c.rest})")
      c.i += 2
      val fn = c.ident()
      val mapped = aggFns.getOrElse(fn,
        err(s"unsupported aggregate function $fn (supported: ${aggFns.keys.toSeq.sorted.mkString(", ")})"))
      c.ws(); c.expect('(')
      c.ws()
      val arg = if (c.peekChar == ')') None else Some(ZedExpr.sql(c.expr(env)))
      c.ws(); c.expect(')')
      aggs += ((name, mapped, arg))
      c.ws()
      if (c.peekChar == ',') c.i += 1 else done = true
    }
    val by = scala.collection.mutable.ArrayBuffer[(String, String)]()
    if (c.eat("by")) {
      var more = true
      while (more) {
        val m = c.mark
        val first = c.pathName()
        c.ws()
        if (c.s.startsWith(":=", c.i)) {
          val name = first
          if (name.contains(".")) err(s"by-key name cannot be a path: $name")
          c.i += 2
          by += name -> ZedExpr.sql(c.expr(env))
        } else {
          c.reset(m)
          val p = c.pathName()
          by += p.split('.').last -> pathSql(p)
        }
        c.ws()
        if (c.peekChar == ',') c.i += 1 else more = false
      }
    }
    AggS(aggs.toSeq, by.toSeq)
  }

  private def pathSql(p: String): String =
    p.split('.').map(seg => s"`$seg`").mkString(".")

  // ---- compiler -------------------------------------------------------------

  /** A flowing frame plus its defined stream order (SQL exprs), the
    * metadata `collect` needs.
    */
  private final case class Flow(df: DataFrame, order: Seq[String])

  /** Compile and run a script. `pools` resolves a pool/table name to its
    * DataFrame and natural order (e.g. `kafka.offset` for envelope pools,
    * `seqno` for the design-doc pools).
    */
  def run(spark: SparkSession, text: String,
      pools: String => (DataFrame, Seq[String]),
      kindCol: String = "_kind"): DataFrame = {
    val script = parse(text, kindCol)
    runPipe(spark, script.pipe, None, pools, kindCol).df
  }

  /** Apply a source-less Zed pipeline (stages only, no `from`) to a bound
    * input frame — the SHAPER form (the reference applies an arbitrary Zed
    * program per record batch, cli/shaper.go:8-22, fifo/lake.go:86-106).
    * `order` is the input's stream order for `collect`.
    */
  def transform(df: DataFrame, text: String, order: Seq[String] = Seq.empty,
      kindCol: String = "_kind"): DataFrame = {
    val script = parse(text, kindCol)
    if (script.pipe.source.isDefined)
      err("a shaper script shapes its bound input — it cannot open a `from`")
    runPipe(df.sparkSession, script.pipe, Some(Flow(df, order)),
      name => err(s"a shaper script cannot read pool $name"), kindCol).df
  }

  private def source(from: From, pools: String => (DataFrame, Seq[String]),
      kindCol: String): Seq[Flow] =
    from match {
      case FromPool(name) =>
        val (df, ord) = pools(name)
        Seq(Flow(df, ord))
      case FromLegs(legs) =>
        legs.map { case (name, stages) =>
          val (df, ord) = pools(name)
          stages.foldLeft(Flow(df, ord))(applyStage(_, _, kindCol))
        }
    }

  private def runPipe(spark: SparkSession, pipe: Pipe, input: Option[Flow],
      pools: String => (DataFrame, Seq[String]), kindCol: String): Flow = {
    var state: Seq[Flow] = pipe.source match {
      case Some(f) => source(f, pools, kindCol)
      case None => input.toSeq
    }
    def single(): Flow = state match {
      case Seq(one) => one
      case Seq() => err("stage has no input (script without a from?)")
      case many => Flow(unionFlows(many), Seq.empty)
    }
    pipe.stages.foreach {
      case AntiJoinS(l, r) =>
        if (state.length != 2)
          err(s"anti join needs a two-legged input, got ${state.length} leg(s)")
        val Seq(left, right) = state
        val joined = left.df.alias("_zl").join(right.df.alias("_zr"),
          col(s"_zl.$l") === col(s"_zr.$r"), "left_anti")
        state = Seq(Flow(joined, left.order))
      case JoinS(l, r, assigns) =>
        if (state.length != 2)
          err(s"join needs a two-legged input, got ${state.length} leg(s)")
        val Seq(left, right) = state
        val joined = left.df.alias("_zl").join(right.df.alias("_zr"),
          col(s"_zl.$l") === col(s"_zr.$r"), "inner")
        // set/replace semantics: an assignment overwrites a same-named left
        // column rather than duplicating it (ambiguous downstream refs)
        val assigned = assigns.map(_._1).toSet
        val leftCols = left.df.columns.toSeq.filterNot(assigned)
          .map(n => col(s"_zl.$n"))
        val out = joined.select(
          leftCols ++ assigns.map { case (n, sql) => expr(sql).as(n) }: _*)
        state = Seq(Flow(out, left.order))
      case ForkS(legs) =>
        val in = state match {
          case Seq(one) => Some(one)
          case Seq() => None
          case many => Some(Flow(unionFlows(many), Seq.empty))
        }
        // legs stay separate: a following (anti) join pairs them like Zed's
        // two-legged from; any other consumer unions through the superset
        state = legs.map(leg => runPipe(spark, leg, in, pools, kindCol))
      case SwitchS(cases) =>
        val in = single()
        // strict first-match routing: each case's input excludes every
        // earlier case's matches (build.go:92-107 parity)
        val preds = cases.collect { case (Some(p), _) => p }
        var earlier = Seq.empty[String]
        val outs = cases.map { case (pred, leg) =>
          val cond = pred match {
            case Some(p) =>
              val self = expr(p)
              earlier = earlier :+ p
              earlier.init.foldLeft(self)((acc, e) => acc && !coalesce(expr(e), lit(false)))
            case None =>
              preds.map(e => !coalesce(expr(e), lit(false))).reduceOption(_ && _).getOrElse(lit(true))
          }
          runPipe(spark, leg, Some(Flow(in.df.filter(cond), in.order)), pools, kindCol)
        }
        state = Seq(Flow(unionFlows(outs), Seq.empty))
      case st =>
        state = Seq(applyStage(single(), st, kindCol))
    }
    state match {
      case Seq(one) => one
      case many => Flow(unionFlows(many), Seq.empty)
    }
  }

  private def unionFlows(flows: Seq[Flow]): DataFrame =
    SchemaUnion.unionAll(flows.map(_.df))

  private def applyStage(f: Flow, st: Stage, kindCol: String): Flow = st match {
    case FilterS(sql) => Flow(f.df.where(expr(sql)), f.order)
    case SortS(keys) => Flow(f.df.orderBy(keys.map(expr): _*), keys)
    case CutS(fields) =>
      // a cut field's last segment becomes the output column name (Zed cut)
      val cols = fields.map(p => expr(pathSql(p)).as(p.split('.').last))
      // order survives a cut only through TOP-LEVEL fields kept as
      // themselves — `cut seqno` keeps a seqno order, `cut kafka` keeps a
      // kafka.offset order (the whole struct survives intact), but a nested
      // field RENAMED onto an order column's name (`cut value.seqno` over a
      // seqno-ordered pool) is different data and must drop the order
      // rather than silently rebind it
      val kept = fields.filter(!_.contains('.')).toSet
      Flow(f.df.select(cols: _*),
        f.order.filter(o => kept.contains(o.replace("`", "").split('.').head)))
    case YieldS(fields) =>
      Flow(f.df.select(fields.map { case (n, sql) => expr(sql).as(n) }: _*), Seq.empty)
    case YieldTypedS(fields, typeName) =>
      val base = fields match {
        case Seq(("_y", sql)) => f.df.select(expr(sql).as("_y")).select("_y.*")
        case fs => f.df.select(fs.map { case (n, sql) => expr(sql).as(n) }: _*)
      }
      Flow(base.withColumn(kindCol, lit(typeName)), Seq.empty)
    case YieldExprS(sql) =>
      // the record value becomes the top-level row
      Flow(f.df.select(expr(sql).as("_y")).select("_y.*"), Seq.empty)
    case PutS(assigns) =>
      // Zed put evaluates every right-hand side against the INPUT record
      // before any assignment lands (`a:=b, b:=a` swaps) — so build all
      // assignment columns against the incoming frame and apply them in one
      // withColumns, never sequentially. Multiple nested targets under one
      // struct chain withField on the shared base (RHS still bind to input).
      val newCols = assigns.foldLeft(Map.empty[String, Column]) {
        case (m, (Seq(name), sql)) => m + (name -> expr(sql))
        case (m, (head +: rest, sql)) =>
          m + (head -> m.getOrElse(head, col(head))
            .withField(rest.mkString("."), expr(sql)))
        case (m, (Seq(), _)) => m
      }
      // an overwritten order column is different data: drop those entries
      // so head/tail/collect error instead of ordering by the new values
      val liveOrder = f.order.filter(o =>
        !newCols.contains(o.replace("`", "").split('.').head))
      Flow(f.df.withColumns(newCols), liveOrder)
    case HeadS(n) =>
      // first-n IN STREAM ORDER, like tail — a bare limit(n) would return
      // n arbitrary rows under Spark's partitioning (orderBy+limit compiles
      // to TakeOrderedAndProject: per-partition heaps, no global sort)
      if (f.order.isEmpty)
        err("head needs a defined stream order — `sort` upstream or read from an ordered pool")
      Flow(f.df.orderBy(f.order.map(expr): _*).limit(n), f.order)
    case TailS(n) =>
      if (f.order.isEmpty)
        err("tail needs a defined stream order — `sort` upstream or read from an ordered pool")
      val lastN = f.df.orderBy(f.order.map(o => expr(o).desc): _*).limit(n)
      Flow(lastN.orderBy(f.order.map(expr): _*), f.order)
    case AggS(aggs, by) =>
      val aggCols = aggs.map { case (name, fn, arg) => aggColumn(f, fn, arg).as(name) }
      val grouped =
        if (by.isEmpty) f.df.groupBy()
        else f.df.groupBy(by.map { case (n, sql) => expr(sql).as(n) }: _*)
      Flow(grouped.agg(aggCols.head, aggCols.tail: _*), Seq.empty)
    case AntiJoinS(_, _) | JoinS(_, _, _) | ForkS(_) | SwitchS(_) =>
      err("join/fork/switch reached single-flow stage application (parser invariant)")
  }

  private def aggColumn(f: Flow, fn: String, arg: Option[String]): Column = fn match {
    case "collect" =>
      if (f.order.isEmpty)
        err("collect() needs a defined stream order — `sort` upstream or read from an ordered pool")
      val payload = arg match {
        case Some("struct(*)") | None => struct(col("*"))
        case Some(sql) => expr(sql)
      }
      val entry = struct(
        (f.order.zipWithIndex.map { case (o, j) => expr(o).as(s"_o$j") } :+ payload.as("_p")): _*)
      org.apache.spark.sql.functions.transform(
        array_sort(collect_list(entry)), x => x.getField("_p"))
    case "count" => count(arg.map(expr).getOrElse(lit(1)))
    case "collect_set" => collect_set(expr(arg.getOrElse(err("union() needs an argument"))))
    case other =>
      expr(s"$other(${arg.getOrElse(err(s"$other() needs an argument"))})")
  }
}
